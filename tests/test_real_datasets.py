"""Real dataset classes driven with synthetic on-disk fixtures: NFBS-layout
NIfTI volumes and Edinburgh-layout npy volumes+masks (C18)."""
import gzip
import os
import struct

import numpy as np
import pytest

from anoddpm_tpu.data.datasets import (EDINBURGH_SLICES, AnomalousMRIDataset,
                                       MRIDataset, load_image_mask)
from tests.test_data import _write_nifti


@pytest.fixture(scope="module")
def nfbs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nfbs")
    rng = np.random.default_rng(0)
    for name in ("A00001", "A00002"):
        d = os.path.join(root, name)
        os.makedirs(d)
        vol = rng.uniform(0, 800, size=(256, 192, 256)).astype(np.float32)
        _write_nifti(os.path.join(d, f"sub-{name}_ses-NFB3_T1w.nii.gz"), vol)
    return str(root)


def test_mri_dataset_nifti_cache_and_transform(nfbs_root):
    ds = MRIDataset(nfbs_root, img_size=(64, 64), random_slice=True)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (64, 64, 1)
    # NOTE: the reference normalisation divides by (hi - lo) but does not
    # subtract lo (dataset.py:628-630), so values are range-1-wide but NOT
    # anchored to [0, 1]; after Normalize(.5,.5) they can exceed [-1, 1].
    assert np.isfinite(s["image"]).all()
    assert -1.1 <= s["image"].min() <= s["image"].max() <= 2.0
    # the normalised volume must now be cached as npy
    name = sorted(os.listdir(nfbs_root))[0]
    assert os.path.exists(os.path.join(nfbs_root, name, f"{name}.npy"))
    # cached load path
    s2 = ds[0]
    assert s2["image"].shape == (64, 64, 1)


@pytest.fixture(scope="module")
def edinburgh_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("edinburgh")
    os.makedirs(os.path.join(root, "raw_cleaned"))
    os.makedirs(os.path.join(root, "mask"))
    rng = np.random.default_rng(1)
    for name in EDINBURGH_SLICES:
        vol = rng.uniform(0, 1, size=(220, 156, 240)).astype(np.float32)
        mask = (rng.uniform(size=(220, 156, 240)) > 0.99).astype(np.float32)
        np.save(os.path.join(root, "raw_cleaned", f"{name}.npy"), vol)
        np.save(os.path.join(root, "mask", f"{name}.npy"), mask)
    return str(root)


def test_anomalous_dataset_restricted(edinburgh_root):
    ds = AnomalousMRIDataset(edinburgh_root, img_size=(64, 64),
                             slice_selection="iterateKnown_restricted")
    assert len(ds) == 22
    s = ds[0]
    assert s["image"].shape == (4, 64, 64, 1)
    assert s["mask"].shape == (4, 64, 64, 1)
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}
    lo, hi = EDINBURGH_SLICES[sorted(EDINBURGH_SLICES)[0]]
    assert s["slices"].min() >= lo and s["slices"].max() <= hi


def test_anomalous_dataset_random_mode(edinburgh_root):
    ds = AnomalousMRIDataset(edinburgh_root, img_size=(32, 32),
                             slice_selection="random")
    s = ds[3]
    assert s["image"].shape == (1, 32, 32, 1)


def test_load_image_mask(edinburgh_root):
    # the function the reference calls but never defines (SURVEY.md §2.2)
    out = load_image_mask(edinburgh_root, "18582", (32, 32))
    assert out["image"].shape == (4, 32, 32, 1)
    assert out["mask"].shape == (4, 32, 32, 1)

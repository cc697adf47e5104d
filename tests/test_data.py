"""Data layer tests: NIfTI reader, transforms, synthetic datasets, batch
pipeline (reference pipelines: dataset.py:585-594, :620-630, :663-672)."""
import gzip
import os
import struct

import numpy as np
import pytest

from anoddpm_tpu.data import transforms as T
from anoddpm_tpu.data.nifti import read_nifti
from anoddpm_tpu.data.pipeline import batch_iterator, prefetch_to_device
from anoddpm_tpu.data.synthetic import (SyntheticAnomalyDataset,
                                        SyntheticMRIDataset)


def _write_nifti(path, data: np.ndarray):
    """Minimal NIfTI-1 writer for round-trip testing."""
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dims = (data.ndim,) + data.shape + (1,) * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 16)          # float32
    struct.pack_into("<h", hdr, 72, 32)          # bitpix
    struct.pack_into("<f", hdr, 108, 352.0)      # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)        # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)        # scl_inter
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + data.astype("<f4").tobytes(order="F")
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(7, 9, 5)).astype(np.float32)
    p = os.path.join(tmp_path, "vol.nii.gz")
    _write_nifti(p, vol)
    data, hdr = read_nifti(p)
    assert hdr["shape"] == (7, 9, 5)
    np.testing.assert_allclose(data, vol, rtol=1e-6)


def test_clip_normalise_volume():
    rng = np.random.default_rng(1)
    vol = rng.normal(loc=100, scale=20, size=(16, 16, 16))
    out = T.clip_normalise_volume(vol)
    lo = (vol.mean() - vol.std()) / (3 * vol.std())
    assert out.min() >= lo - 1e-6
    assert out.max() <= out.min() + 1.0 + 1e-6  # range == 1 after division


def test_center_crop_pads_and_crops():
    img = np.ones((10, 10), np.float32)
    out = T.center_crop(img, 6)
    assert out.shape == (6, 6)
    out2 = T.center_crop(img, 20)
    assert out2.shape == (20, 20)
    assert out2[0, 0] == 0  # padded corner
    assert out2[10, 10] == 1


def test_mri_train_transform_shape_and_range():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, size=(256, 192)).astype(np.float32)
    out = T.mri_train_transform(img, (64, 64), rng)
    assert out.shape == (64, 64, 1)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_synthetic_datasets_contract():
    ds = SyntheticMRIDataset(img_size=(32, 32), length=5)
    s = ds[0]
    assert s["image"].shape == (32, 32, 1)
    assert s["image"].min() >= -1 and s["image"].max() <= 1
    # deterministic per index
    np.testing.assert_array_equal(ds[3]["image"], ds[3]["image"])

    ano = SyntheticAnomalyDataset(img_size=(32, 32), length=3)
    a = ano[1]
    assert a["image"].shape == (4, 32, 32, 1)
    assert a["mask"].shape == (4, 32, 32, 1)
    assert set(np.unique(a["mask"])) <= {0.0, 1.0}
    assert a["mask"].sum() > 0  # lesions exist


def test_diffuse_lesion_family_is_intensity_matched():
    """The harder lesion regime (VERDICT round-2 item 5): irregular,
    diffuse-margin, intensity-matched lesions.  Unlike the "bump" family
    (a +0.5 bright blob), diffuse lesion pixels must sit INSIDE the healthy
    tissue's own intensity range — detectable by structure, not by a
    brightness threshold."""
    import pytest
    bump_ds = SyntheticAnomalyDataset(img_size=(64, 64), length=3,
                                      lesion_kind="bump")
    diff_ds = SyntheticAnomalyDataset(img_size=(64, 64), length=3,
                                      lesion_kind="diffuse")
    for i in range(3):
        b, d = bump_ds[i], diff_ds[i]
        assert d["image"].shape == (4, 64, 64, 1)
        assert set(np.unique(d["mask"])) <= {0.0, 1.0}
        for s in range(4):
            img = d["image"][s, ..., 0]
            msk = d["mask"][s, ..., 0].astype(bool)
            assert msk.sum() > 10  # lesion exists, nontrivial area
            tissue = img > -0.9
            healthy = tissue & ~msk
            # intensity-matched: lesion pixels within the healthy tissue's
            # own [min, max] envelope (+ small texture slack)
            lo, hi = img[healthy].min(), img[healthy].max()
            assert img[msk].max() <= hi + 0.05
            assert img[msk].min() >= lo - 0.05
            # the bump family, by contrast, saturates at/near the top
            bimg = b["image"][s, ..., 0]
            bmsk = b["mask"][s, ..., 0].astype(bool)
            bhealthy = (bimg > -0.9) & ~bmsk
            assert bimg[bmsk].max() > bimg[bhealthy].max() + 0.05
        # determinism per index
        np.testing.assert_array_equal(d["image"], diff_ds[i]["image"])
    with pytest.raises(ValueError):
        SyntheticAnomalyDataset(lesion_kind="nope")


def test_dataset_inspect_harness(tmp_path):
    """Dataset sanity harness (reference checkDataSet /
    load_datasets_for_test, dataset.py:239-347): volume scan video +
    healthy/anomalous side-by-side sheets."""
    import os
    from anoddpm_tpu.config import defaultdict_from_json
    from anoddpm_tpu.data.inspect import inspect
    args = defaultdict_from_json({
        "arg_num": "inspect", "img_size": (32, 32), "dataset": "synthetic"})
    inspect(args, root_dir=str(tmp_path), mode="all", max_volumes=3)
    out = os.path.join(str(tmp_path), "inspection-outputs", "ARGS=inspect")
    files = os.listdir(out)
    assert any(f.startswith("anomalous-volumes") for f in files)  # video
    assert sum(f.startswith("sheet-") for f in files) == 5


def test_batch_iterator_semantics():
    ds = SyntheticMRIDataset(img_size=(16, 16), length=10)
    it = batch_iterator(ds, batch_size=4, shuffle=False)
    b1 = next(it)
    assert b1["image"].shape == (4, 16, 16, 1)
    assert len(b1["filenames"]) == 4
    # drop_last: 10 // 4 = 2 batches per pass, then cycles
    b2, b3 = next(it), next(it)
    assert b3["image"].shape == (4, 16, 16, 1)


def test_prefetch_to_device():
    ds = SyntheticMRIDataset(img_size=(16, 16), length=8)
    it = prefetch_to_device(batch_iterator(ds, 2, shuffle=False), size=2)
    batches = [next(it) for _ in range(3)]
    assert all(b["image"].shape == (2, 16, 16, 1) for b in batches)


def test_prefetch_substeps_finite_source_ends_gracefully():
    """A finite source exhausting mid-group must terminate the prefetcher
    cleanly (PEP 479: StopIteration inside the stacking generator), dropping
    the partial group."""
    ds = SyntheticMRIDataset(img_size=(16, 16), length=8)

    def finite():
        it = batch_iterator(ds, 2, shuffle=False)
        for _ in range(5):   # 5 batches; substeps=2 -> 2 groups + 1 partial
            yield next(it)

    out = list(prefetch_to_device(finite(), substeps=2))
    assert len(out) == 2
    assert all(b["image"].shape == (2, 2, 16, 16, 1) for b in out)

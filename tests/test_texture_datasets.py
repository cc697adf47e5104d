"""MVTec-leather and DAGM-carpet dataset classes with generated PNG
fixtures (C18; reference dataset.py:373-571)."""
import os

import cv2
import numpy as np
import pytest

from anoddpm_tpu.data.datasets import DAGM, MVTec


@pytest.fixture(scope="module")
def mvtec_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("leather"))
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "train", "good"))
    for i in range(3):
        img = rng.integers(0, 255, size=(300, 300, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(root, "train", "good", f"{i:03d}.png"), img)
    for cls in MVTec.CLASSES:
        os.makedirs(os.path.join(root, "test", cls))
        os.makedirs(os.path.join(root, "ground_truth", cls))
        img = rng.integers(0, 255, size=(300, 300, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(root, "test", cls, "000.png"), img)
        mask = np.zeros((300, 300), np.uint8)
        mask[100:150, 100:150] = 255
        cv2.imwrite(os.path.join(root, "ground_truth", cls, "000_mask.png"),
                    mask)
    return root


def test_mvtec_train_split(mvtec_root):
    ds = MVTec(mvtec_root, anomalous=False, img_size=(256, 256), rgb=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (256, 256, 3)
    assert "mask" not in s
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0


def test_mvtec_anomalous_with_masks(mvtec_root):
    ds = MVTec(mvtec_root, anomalous=True, img_size=(256, 256), rgb=True)
    assert len(ds) == len(MVTec.CLASSES)
    s = ds[0]
    assert s["image"].shape == (256, 256, 3)
    assert s["mask"].shape == (256, 256, 1)
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}


@pytest.fixture(scope="module")
def dagm_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("carpet"))
    d = os.path.join(root, "Class1_def")
    os.makedirs(d)
    rng = np.random.default_rng(1)
    lines = []
    for i in range(1, 4):
        img = rng.integers(0, 255, size=(512, 512), dtype=np.uint8)
        cv2.imwrite(os.path.join(d, f"{i}.png"), img)
        lines.append(f"{i}\t40.0\t20.0\t1.0\t256.0\t256.0")
    with open(os.path.join(d, "labels.txt"), "w") as f:
        f.write("\n".join(lines))
    return os.path.join(root, "Class1")


def test_dagm_anomalous(dagm_root):
    ds = DAGM(dagm_root, anomalous=True, img_size=(256, 256))
    assert len(ds) == 3
    s = ds[1]
    assert s["image"].shape == (256, 256, 1)
    assert s["mask"].shape == (256, 256, 1)
    assert s["mask"].sum() > 0  # rasterised ellipse present (512^2 crop hits centre often)

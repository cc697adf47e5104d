"""Dataset classes: NFBS healthy MRI, Edinburgh anomalous MRI, MVTec
(leather), DAGM (carpet), CIFAR-10 — torch-free NHWC re-implementations of
the reference pipelines (reference: dataset.py:351-806).

Every dataset returns dict samples with float32 NHWC arrays in [-1, 1]:
  healthy:    {"image": (H, W, C), "filenames": str}
  anomalous:  {"image": (S, H, W, C), "mask": (S, H, W, C), "slices", ...}

The reference's missing `load_image_mask` helper (called but never defined,
detection.py:64 etc. — SURVEY.md §2.2) is provided here as a real function.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from . import transforms as T
from .nifti import read_nifti

# Per-patient tumour slice ranges for the 22 Edinburgh volumes
# (dataset.py:676-682).
EDINBURGH_SLICES = {
    "17904": (165, 205), "18428": (177, 213), "18582": (160, 190),
    "18638": (160, 212), "18675": (140, 200), "18716": (135, 190),
    "18756": (150, 205), "18863": (130, 190), "18886": (120, 180),
    "18975": (170, 194), "19015": (158, 195), "19085": (155, 195),
    "19275": (184, 213), "19277": (158, 209), "19357": (158, 210),
    "19398": (164, 200), "19423": (142, 200), "19567": (160, 200),
    "19628": (147, 210), "19691": (155, 200), "19723": (140, 170),
    "19849": (150, 180),
}


class MRIDataset:
    """Healthy NFBS T1 volumes -> random coronal slice, training transform
    (dataset.py:575-643).  Volumes are normalised and cached as .npy on
    first read."""

    def __init__(self, root_dir: str, img_size=(256, 256),
                 random_slice: bool = False, seed: int = 0):
        self.root_dir = root_dir
        self.img_size = tuple(img_size)
        self.random_slice = random_slice
        self.filenames = sorted(
            f for f in os.listdir(root_dir)
            if f != ".DS_Store" and os.path.isdir(os.path.join(root_dir, f)))
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.filenames)

    def _volume(self, name: str) -> np.ndarray:
        cache = os.path.join(self.root_dir, name, f"{name}.npy")
        if os.path.exists(cache):
            return np.load(cache)
        nii = os.path.join(self.root_dir, name, f"sub-{name}_ses-NFB3_T1w.nii.gz")
        volume, _ = read_nifti(nii)
        volume = T.clip_normalise_volume(volume)
        np.save(cache, volume.astype(np.float32))
        return volume.astype(np.float32)

    def __getitem__(self, idx) -> Dict:
        name = self.filenames[idx]
        volume = self._volume(name)
        # random coronal slice 40-100, else the fixed mid slice 80
        # (dataset.py:631-637)
        slice_idx = int(self._rng.integers(40, 101)) if self.random_slice else 80
        img = volume[:, slice_idx, :].reshape(volume.shape[0],
                                              volume.shape[2]).astype(np.float32)
        img = T.mri_train_transform(img, self.img_size, self._rng)
        return {"image": img, "filenames": name}


class AnomalousMRIDataset:
    """Edinburgh anomalous T1 volumes + tumour masks (dataset.py:646-790).

    slice_selection: "random" | "iterateKnown" | "iterateKnown_restricted"
    (4 evenly-spaced tumour slices) | "iterateUnknown".
    """

    def __init__(self, root_dir: str, img_size=(256, 256),
                 slice_selection: str = "iterateKnown_restricted",
                 cleaned: bool = True, seed: int = 0):
        self.root_dir = root_dir
        self.img_size = tuple(img_size)
        self.slice_selection = slice_selection
        sub = "raw_cleaned" if cleaned else "raw"
        self.names = sorted(EDINBURGH_SLICES.keys())
        self.paths = [os.path.join(root_dir, sub, f"{n}.npy") for n in self.names]
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.names)

    def _mask_volume(self, name: str) -> np.ndarray:
        return np.load(os.path.join(self.root_dir, "mask", f"{name}.npy"))

    def _select_slices(self, name: str, n_slices: int) -> np.ndarray:
        lo, hi = EDINBURGH_SLICES[name]
        if self.slice_selection == "random":
            return np.array([int(self._rng.integers(lo, hi + 1))])
        if self.slice_selection == "iterateKnown":
            return np.arange(lo, hi)
        if self.slice_selection == "iterateKnown_restricted":
            # 4 evenly-spaced slices inside the tumour range (dataset.py:760)
            return np.linspace(lo + 5, hi - 5, 4).astype(np.int32)
        return np.arange(n_slices)  # iterateUnknown

    def __getitem__(self, idx) -> Dict:
        name = self.names[idx]
        volume = np.load(self.paths[idx])
        mask_volume = self._mask_volume(name)
        slices = self._select_slices(name, volume.shape[0])
        imgs, masks = [], []
        for s in slices:
            img = volume[s].astype(np.float32)
            msk = mask_volume[s].astype(np.float32)
            imgs.append(T.anomalous_transform(img, self.img_size))
            m = T.anomalous_transform(msk, self.img_size)
            masks.append((m > 0).astype(np.float32))
        return {
            "image": np.stack(imgs),
            "mask": np.stack(masks),
            "filenames": self.paths[idx],
            "slices": slices,
        }


def load_image_mask(root_dir: str, name: str, img_size,
                    slice_selection: str = "iterateKnown_restricted"):
    """Image+mask loader for a single named volume — the function the
    reference calls but never defines (detection.py:64,341,520,...;
    SURVEY.md §2.2).  Applies the anomalous transform to both."""
    ds = AnomalousMRIDataset(root_dir, img_size, slice_selection)
    idx = ds.names.index(str(name))
    return ds[idx]


class MVTec:
    """MVTec leather (color/cut/fold/glue/poke[,good]) with ground-truth
    masks (dataset.py:487-571)."""

    CLASSES = ["color", "cut", "fold", "glue", "poke"]

    def __init__(self, root_dir: str, anomalous: bool = False,
                 img_size=(256, 256), rgb: bool = True,
                 random_crop: bool = True, include_good: bool = False,
                 seed: int = 0):
        import cv2
        self._cv2 = cv2
        self.root_dir = root_dir
        self.anomalous = anomalous
        self.img_size = tuple(img_size)
        self.rgb = rgb
        self.random_crop = random_crop
        self._rng = np.random.default_rng(seed)
        classes = list(self.CLASSES) + (["good"] if include_good else [])
        if anomalous:
            self.filenames = [
                os.path.join(root_dir, "test", c, f)
                for c in classes
                for f in sorted(os.listdir(os.path.join(root_dir, "test", c)))
                if f.endswith(".png")]
        else:
            train_dir = os.path.join(root_dir, "train", "good")
            self.filenames = [os.path.join(train_dir, f)
                              for f in sorted(os.listdir(train_dir))
                              if f.endswith(".png")]

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, idx) -> Dict:
        cv2 = self._cv2
        path = self.filenames[idx]
        if self.rgb:
            img = cv2.cvtColor(cv2.imread(path, 1), cv2.COLOR_BGR2RGB)
        else:
            img = cv2.imread(path, 0)[..., None]
        img = img.astype(np.float32) / 255.0

        mask = None
        if self.anomalous:
            cls = os.path.basename(os.path.dirname(path))
            if cls == "good":
                mask = np.zeros(img.shape[:2] + (1,), np.float32)
            else:
                mpath = os.path.join(self.root_dir, "ground_truth", cls,
                                     os.path.basename(path)[:-4] + "_mask.png")
                mask = (cv2.imread(mpath, 0) > 0).astype(np.float32)[..., None]

        h, w = img.shape[:2]
        th, tw = self.img_size
        if self.random_crop:
            y = int(self._rng.integers(0, h - th + 1))
            x = int(self._rng.integers(0, w - tw + 1))
            img = img[y:y + th, x:x + tw]
            if mask is not None:
                mask = mask[y:y + th, x:x + tw]
        else:
            img = T.resize_bilinear(img, self.img_size)
            img = img if img.ndim == 3 else img[..., None]
            if mask is not None:
                mask = T.resize_bilinear(mask[..., 0], self.img_size)[..., None]
                mask = (mask > 0).astype(np.float32)

        sample = {"image": T.normalize_unit(img), "filenames": path}
        if mask is not None:
            sample["mask"] = mask
        return sample


class DAGM:
    """DAGM carpet (Class1) with elliptical defect masks rasterised from
    labels.txt (dataset.py:373-484)."""

    def __init__(self, root_dir: str, anomalous: bool = False,
                 img_size=(256, 256), rgb: bool = False,
                 random_crop: bool = True, seed: int = 0):
        import cv2
        self._cv2 = cv2
        if anomalous and not root_dir.endswith("_def"):
            root_dir += "_def"
        self.root_dir = root_dir
        self.anomalous = anomalous
        self.img_size = tuple(img_size)
        self.rgb = rgb
        self.random_crop = random_crop
        self._rng = np.random.default_rng(seed)
        self.filenames = sorted(
            (f for f in os.listdir(root_dir) if f.endswith(".png")),
            key=lambda x: int(x[:-4]))
        if anomalous:
            self.coords = self._load_coordinates(
                os.path.join(root_dir, "labels.txt"))

    @staticmethod
    def _load_coordinates(path):
        coords = {}
        with open(path) as f:
            for line in f.read().split("\n"):
                parts = line.split("\t")
                if len(parts) == 6:
                    idx = int(parts[0]) - 1
                    coords[idx] = {
                        "major_axis": round(float(parts[1])),
                        "minor_axis": round(float(parts[2])),
                        "angle": float(parts[3]),
                        "x": round(float(parts[4])),
                        "y": round(float(parts[5])),
                    }
        return coords

    def _make_mask(self, idx, img):
        cv2 = self._cv2
        info = self.coords[idx]
        mask = np.zeros_like(img)
        # reference's angle convention: (angle / 4.7) * 270 degrees
        # (dataset.py:438)
        mask = cv2.ellipse(
            mask, (info["x"], info["y"]),
            (info["major_axis"], info["minor_axis"]),
            (info["angle"] / 4.7) * 270, 0, 360, (255, 255, 255), -1)
        return (mask > 0).astype(np.float32)

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, idx) -> Dict:
        cv2 = self._cv2
        path = os.path.join(self.root_dir, self.filenames[idx])
        img = cv2.imread(path, 1 if self.rgb else 0)
        if not self.rgb:
            pass  # keep HxW for mask rasterisation parity
        mask = None
        if self.anomalous:
            mask = self._make_mask(int(self.filenames[idx][:-4]) - 1, img)
        img = img.astype(np.float32) / 255.0

        h, w = img.shape[:2]
        th, tw = self.img_size
        if self.random_crop:
            y = int(self._rng.integers(0, max(h - th, 0) + 1))
            x = int(self._rng.integers(0, max(w - tw, 0) + 1))
            img = img[y:y + th, x:x + tw]
            if mask is not None:
                mask = mask[y:y + th, x:x + tw]
        else:
            img = T.resize_bilinear(img, self.img_size)
            if mask is not None:
                mask = (T.resize_bilinear(mask, self.img_size) > 0).astype(np.float32)

        if img.ndim == 2:
            img = img[..., None]
        sample = {"image": T.normalize_unit(img), "filenames": self.filenames[idx]}
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[..., None]
            sample["mask"] = mask[..., :1]
        return sample


class CIFAR10:
    """CIFAR-10 from the standard python pickle batches on local disk
    (dataset.py:793-806; no download — zero-egress environment)."""

    def __init__(self, root_dir: str, train: bool = True):
        import pickle
        base = os.path.join(root_dir, "cifar-10-batches-py")
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        images, labels = [], []
        for fn in files:
            with open(os.path.join(base, fn), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            images.append(d[b"data"])
            labels.extend(d[b"labels"])
        data = np.concatenate(images).reshape(-1, 3, 32, 32)
        self.images = (data.transpose(0, 2, 3, 1).astype(np.float32) / 255.0 - 0.5) / 0.5
        self.labels = np.asarray(labels)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return {"image": self.images[idx], "label": int(self.labels[idx]),
                "filenames": f"cifar-{idx}"}


def init_datasets(root_dir: str, args) -> Tuple[object, object]:
    """Train/Test healthy-MRI pair (dataset.py:351-358)."""
    train = MRIDataset(os.path.join(root_dir, "DATASETS", "Train"),
                       img_size=args["img_size"],
                       random_slice=args["random_slice"])
    test = MRIDataset(os.path.join(root_dir, "DATASETS", "Test"),
                      img_size=args["img_size"],
                      random_slice=args["random_slice"])
    return train, test


def dataset_from_args(root_dir: str, args, train: bool = True):
    """Dataset dispatch by args["dataset"] (diffusion_training.py:318-359),
    extended with the dependency-free "synthetic" family."""
    from .synthetic import SyntheticMRIDataset
    name = str(args.get("dataset", "") or "synthetic").lower()
    img_size = args["img_size"]
    if name in ("synthetic", ""):
        return SyntheticMRIDataset(img_size=img_size,
                                   seed=0 if train else 1)
    if name == "mri":
        sub = "Train" if train else "Test"
        return MRIDataset(os.path.join(root_dir, "DATASETS", sub),
                          img_size=img_size,
                          random_slice=bool(args.get("random_slice", True)))
    if name == "leather":
        return MVTec(os.path.join(root_dir, "DATASETS", "leather"),
                     anomalous=not train, img_size=img_size, rgb=True)
    if name == "carpet":
        return DAGM(os.path.join(root_dir, "DATASETS", "CARPET", "Class1"),
                    anomalous=not train, img_size=img_size)
    if name == "cifar":
        return CIFAR10(os.path.join(root_dir, "DATASETS", "CIFAR10"), train=train)
    raise ValueError(f"unknown dataset: {name}")


def anomalous_dataset_from_args(root_dir: str, args):
    """Anomalous evaluation dataset dispatch (detection.py:182-196)."""
    from .synthetic import SyntheticAnomalyDataset
    name = str(args.get("dataset", "") or "synthetic").lower()
    if name in ("synthetic", ""):
        # lesion_kind "bump" (bright ellipsoid, round-2 default) or
        # "diffuse" (low-frequency intensity-matched irregular lesions —
        # the harder regime matching the paper's real-tumour phenomenology)
        kind = str(args.get("lesion_kind") or "bump")
        severity = float(args.get("lesion_severity") or 1.0)
        # anomalous_volumes: optional eval-set size knob (default 22
        # volumes, matching the reference's 22-patient Anomalous-T1 set);
        # reduced-budget protocols set it identically on both sides of a
        # cross-implementation parity cell so the anchor stays valid
        vols = args.get("anomalous_volumes")
        length = 22 if vols is None or vols == "" else int(vols)
        if length <= 0:
            raise ValueError(f"anomalous_volumes must be > 0, got {vols!r}")
        return SyntheticAnomalyDataset(img_size=args["img_size"],
                                       length=length,
                                       lesion_kind=kind,
                                       lesion_severity=severity)
    if name == "carpet":
        return DAGM(os.path.join(root_dir, "DATASETS", "CARPET", "Class1"),
                    anomalous=True, img_size=args["img_size"])
    if name == "leather":
        return MVTec(os.path.join(root_dir, "DATASETS", "leather"),
                     anomalous=True, img_size=args["img_size"], rgb=True)
    return AnomalousMRIDataset(
        os.path.join(root_dir, "DATASETS", "CancerousDataset",
                     "EdinburghDataset", "Anomalous-T1"),
        img_size=args["img_size"], slice_selection="iterateKnown_restricted")

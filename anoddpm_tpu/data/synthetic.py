"""Synthetic MRI-like phantom data for smoke tests, benchmarks and CI.

The reference assumes the NFBS / Edinburgh datasets on disk; this module
provides a drop-in healthy/anomalous pair that needs no downloads: smooth
elliptical "brain" phantoms with low-frequency texture, and an anomalous
variant with a localised lesion blob plus its ground-truth mask.  Same
sample dict contract as the real datasets ({"image", "mask", "filenames"}).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _phantom(rng: np.random.Generator, size: Tuple[int, int]) -> np.ndarray:
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h / 2 + rng.uniform(-h * 0.03, h * 0.03), w / 2 + rng.uniform(-w * 0.03, w * 0.03)
    ry, rx = h * rng.uniform(0.3, 0.38), w * rng.uniform(0.25, 0.33)
    ellipse = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
    # low-frequency texture from a few random cosines
    tex = np.zeros((h, w), np.float32)
    for _ in range(6):
        fy, fx = rng.uniform(1, 4, size=2)
        ph = rng.uniform(0, 2 * np.pi, size=2)
        tex += np.cos(2 * np.pi * fy * yy / h + ph[0]) * np.cos(2 * np.pi * fx * xx / w + ph[1])
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-6)
    img = np.where(ellipse, 0.35 + 0.45 * tex, 0.0).astype(np.float32)
    # inner "ventricle" darker region
    rv = min(ry, rx) * 0.3
    vent = (((yy - cy) / rv) ** 2 + ((xx - cx) / rv) ** 2) < 1.0
    img = np.where(vent, img * 0.4, img)
    return img


def _lesion(rng: np.random.Generator, size: Tuple[int, int]):
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy = rng.uniform(h * 0.3, h * 0.7)
    cx = rng.uniform(w * 0.3, w * 0.7)
    r = rng.uniform(min(h, w) * 0.06, min(h, w) * 0.14)
    d2 = ((yy - cy) ** 2 + (xx - cx) ** 2) / (r * r)
    mask = d2 < 1.0
    bump = np.exp(-2.0 * d2).astype(np.float32)
    return bump, mask.astype(np.float32)


class SyntheticMRIDataset:
    """Healthy phantoms; sample contract of MRIDataset (dataset.py:575-643):
    {"image": HxWx1 float32 in [-1,1], "filenames": str}."""

    def __init__(self, img_size=(64, 64), length: int = 100, seed: int = 0,
                 cache: bool = True):
        self.img_size = tuple(img_size)
        self.length = length
        self.seed = seed
        # samples are deterministic per index, so cache them: phantom
        # synthesis is host-CPU work that would otherwise bottleneck the
        # device input pipeline every epoch
        self._cache = {} if cache else None

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        rng = np.random.default_rng(self.seed * 100003 + idx)
        img = _phantom(rng, self.img_size)
        img = (img - 0.5) / 0.5
        sample = {"image": img[..., None].astype(np.float32),
                  "filenames": f"synthetic-{idx:05d}"}
        if self._cache is not None:
            self._cache[idx] = sample
        return sample


class SyntheticAnomalyDataset:
    """Anomalous phantoms + ground-truth lesion masks; sample contract of
    AnomalousMRIDataset in iterateKnown_restricted mode (dataset.py:731-754):
    {"image": SxHxWx1, "mask": SxHxWx1, "filenames", "slices"}."""

    def __init__(self, img_size=(64, 64), length: int = 22,
                 slices_per_volume: int = 4, seed: int = 1):
        self.img_size = tuple(img_size)
        self.length = length
        self.slices_per_volume = slices_per_volume
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        imgs, masks = [], []
        for s in range(self.slices_per_volume):
            rng = np.random.default_rng(self.seed * 999983 + idx * 131 + s)
            img = _phantom(rng, self.img_size)
            bump, mask = _lesion(rng, self.img_size)
            img = np.clip(img + 0.5 * bump * (img > 0.05), 0, 1)
            img = (img - 0.5) / 0.5
            imgs.append(img[..., None])
            masks.append(mask[..., None])
        return {
            "image": np.stack(imgs).astype(np.float32),
            "mask": np.stack(masks).astype(np.float32),
            "filenames": f"synthetic-anomalous-{idx:05d}",
            "slices": np.arange(self.slices_per_volume),
        }

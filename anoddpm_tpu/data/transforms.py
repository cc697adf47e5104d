"""Host-side image transforms reproducing the reference's torchvision
pipelines in NumPy/OpenCV (reference: dataset.py:585-594 training pipeline,
:663-672 anomalous pipeline).

All functions take/return float32 HxW (or HxWxC) arrays; the final
`normalize_unit` maps [0, 1]-ish intensities to [-1, 1] (Normalize(.5, .5)).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def center_crop(img: np.ndarray, size) -> np.ndarray:
    """CenterCrop with zero padding when the image is smaller (torchvision
    semantics)."""
    if isinstance(size, int):
        size = (size, size)
    th, tw = size
    h, w = img.shape[:2]
    pad_h = max(th - h, 0)
    pad_w = max(tw - w, 0)
    if pad_h or pad_w:
        pads = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
        pads += [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pads)
        h, w = img.shape[:2]
    y = (h - th) // 2
    x = (w - tw) // 2
    return img[y:y + th, x:x + tw]


def resize_bilinear(img: np.ndarray, size) -> np.ndarray:
    if isinstance(size, int):
        size = (size, size)
    return cv2.resize(img.astype(np.float32), (size[1], size[0]),
                      interpolation=cv2.INTER_LINEAR)


def random_affine(img: np.ndarray, rng: np.random.Generator,
                  degrees: float = 3.0,
                  translate: Tuple[float, float] = (0.02, 0.09)) -> np.ndarray:
    """RandomAffine(degrees, translate) a la torchvision: rotation about the
    centre plus fractional translation (dataset.py:587)."""
    h, w = img.shape[:2]
    angle = rng.uniform(-degrees, degrees)
    max_dx = translate[0] * w
    max_dy = translate[1] * h
    tx = round(rng.uniform(-max_dx, max_dx))
    ty = round(rng.uniform(-max_dy, max_dy))
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    m[0, 2] += tx
    m[1, 2] += ty
    return cv2.warpAffine(img.astype(np.float32), m, (w, h),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)


def normalize_unit(img: np.ndarray) -> np.ndarray:
    """Normalize(0.5, 0.5): x -> (x - .5) / .5, i.e. [0,1] -> [-1,1]."""
    return (img.astype(np.float32) - 0.5) / 0.5


def clip_normalise_volume(volume: np.ndarray) -> np.ndarray:
    """The reference's volume intensity normalisation: clip to
    [mean - std, mean + 2*std] then divide by the range
    (dataset.py:620-630)."""
    mean = np.mean(volume)
    std = np.std(volume)
    lo, hi = mean - 1 * std, mean + 2 * std
    out = np.clip(volume, lo, hi)
    return out / (hi - lo)


def mri_train_transform(img: np.ndarray, img_size, rng: np.random.Generator,
                        random_affine_aug: bool = True) -> np.ndarray:
    """Healthy-MRI training pipeline: RandomAffine(3, (.02,.09)) ->
    CenterCrop(235) -> Resize(img_size) -> Normalize(.5,.5)
    (dataset.py:585-594).  Returns HxWx1."""
    if random_affine_aug:
        img = random_affine(img, rng)
    img = center_crop(img, 235)
    img = resize_bilinear(img, img_size)
    img = normalize_unit(img)
    return img[..., None]


def anomalous_transform(img: np.ndarray, img_size) -> np.ndarray:
    """Anomalous-MRI pipeline: CenterCrop((175,240)) -> Resize ->
    Normalize(.5,.5) (dataset.py:663-672).  Returns HxWx1."""
    img = center_crop(img, (175, 240))
    img = resize_bilinear(img, img_size)
    img = normalize_unit(img)
    return img[..., None]

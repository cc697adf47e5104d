"""Output rendering: image grids, training snapshots, diffusion videos.

Torch-free re-implementation of the reference's artifact writers
(helpers.py:9-17 gridify_output, diffusion_training.py:192-252
training_outputs, and the mp4 writers used across evaluation/detection).
Videos are written with imageio (mp4 when ffmpeg is available, else GIF).
All tensors are NHWC float in [-1, 1].
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 (helpers.py:10)."""
    return np.clip((np.asarray(img, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def gridify_output(images: np.ndarray, row_size: int = -1,
                   pad: int = 2) -> np.ndarray:
    """Tile a (N, H, W, C) stack into one uint8 grid image
    (helpers.py:9-17 / torchvision.make_grid semantics: `row_size` images
    per row)."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    n, h, w, c = images.shape
    ncol = n if row_size in (-1, None) else min(row_size, n)
    nrow = math.ceil(n / ncol)
    grid = np.zeros((nrow * h + pad * (nrow + 1),
                     ncol * w + pad * (ncol + 1), c), np.uint8)
    u8 = to_uint8(images)
    for i in range(n):
        r, cidx = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + cidx * (w + pad)
        grid[y:y + h, x:x + w] = u8[i]
    return grid.squeeze(-1) if c == 1 else grid


def save_grid_png(path: str, images: np.ndarray, row_size: int = -1,
                  title: Optional[str] = None) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    grid = gridify_output(images, row_size)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(dpi=150)
    if title:
        plt.title(title)
    plt.grid(False)
    plt.axis("off")
    plt.imshow(grid, cmap="gray")
    plt.savefig(path, bbox_inches="tight")
    plt.close("all")


def save_video(path: str, frames: Sequence[np.ndarray], row_size: int = -1,
               fps: int = 20) -> str:
    """Frames: sequence of (B, H, W, C) arrays -> grid video.  Falls back to
    .gif when an mp4 encoder is unavailable (zero-egress images may lack
    ffmpeg)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import imageio
    grids = [gridify_output(f, row_size) for f in frames]
    try:
        imageio.mimsave(path, grids, fps=fps)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(alt, grids, duration=1.0 / fps)
        return alt


def heatmap_figure(real, recon, mask, path: str) -> None:
    """The reference's 5-panel heatmap figure: real, recon, sq-err map,
    thresholded map, ground truth (evaluation.py:13-22)."""
    real = np.asarray(real)
    recon = np.asarray(recon)
    mask = np.asarray(mask)
    mse = ((recon - real) ** 2 * 2) - 1
    mse_threshold = ((mse > 0).astype(np.float32) * 2) - 1
    panels = np.concatenate([real, recon, mse, mse_threshold, mask], axis=0)
    save_grid_png(path, panels, row_size=5)


def training_snapshot(path: str, x0, x_t, estimate, epoch: int,
                      row_size: int = 8) -> None:
    """Training image dump: real, noisy x_t, eps estimate, sq-err
    (diffusion_training.py:222-235)."""
    x0 = np.asarray(x0)[:row_size]
    x_t = np.asarray(x_t)[:row_size]
    est = np.asarray(estimate)[:row_size]
    err = (est - x_t) ** 2
    save_grid_png(path, np.concatenate([x0, x_t, est, err], axis=0), row_size,
                  title=f"real,noisy,noise prediction,mse-{epoch}epoch")


def sample_snapshot(path: str, x0, sample, pred_x0, epoch: int,
                    row_size: int = 8) -> None:
    """real / sample / x0-prediction grid (diffusion_training.py:212-221)."""
    panels = np.concatenate([np.asarray(x0)[:row_size],
                             np.asarray(sample)[:row_size],
                             np.asarray(pred_x0)[:row_size]], axis=0)
    save_grid_png(path, panels, row_size,
                  title=f"real,sample,prediction x_0-{epoch}epoch")

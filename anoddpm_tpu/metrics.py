"""Anomaly-segmentation metrics (reference: evaluation.py:13-87).

Implemented self-contained (no skimage/sklearn runtime dependency): SSIM
follows skimage.structural_similarity's default algorithm (7x7 uniform
window, K1=.01/K2=.03, data_range=2 for [-1,1] floats, border crop), ROC-AUC
is the exact trapezoidal integral over score thresholds; both are validated
against sklearn in the test suite.

Reference quirks preserved deliberately (SURVEY.md §7): `recall` computes
FN as (real==0 & pred==1) and `FPR` computes FP as (real==1 & pred==0)
(evaluation.py:67-76) — reproduced under their reference names for metric
parity, with honestly-named `recall_correct` / `fpr_correct` alongside.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def square_error(real: np.ndarray, recon: np.ndarray) -> np.ndarray:
    return (np.asarray(real) - np.asarray(recon)) ** 2


def dice_coeff(real, recon, real_mask, smooth: float = 1e-6, mse=None) -> float:
    """Dice of thresholded square-error vs ground-truth mask
    (evaluation.py:26-37).  Arrays are (B, H, W, C) or (H, W, C)."""
    real = np.asarray(real)
    real_mask = np.asarray(real_mask)
    if mse is None:
        mse = (square_error(real, recon) > 0.5).astype(np.float32)
    else:
        mse = np.asarray(mse)
    if real.ndim == 3:
        mse, real_mask = mse[None], real_mask[None]
    axes = tuple(range(1, mse.ndim))
    intersection = np.sum(mse * real_mask, axis=axes)
    union = np.sum(mse, axis=axes) + np.sum(real_mask, axis=axes)
    return float(np.mean((2.0 * intersection + smooth) / (union + smooth)))


def psnr(recon, real) -> float:
    """PSNR with the reference's max(real) peak convention
    (evaluation.py:40-44)."""
    real = np.asarray(real, np.float64)
    recon = np.asarray(recon, np.float64)
    mse = np.mean((real - recon) ** 2)
    return float(20 * np.log10(real.max() / np.sqrt(mse)))


def iou(real_mask, pred_mask) -> float:
    """Intersection-over-union of boolean masks (evaluation.py:51-57)."""
    real_mask = np.asarray(real_mask).astype(bool)
    pred_mask = np.asarray(pred_mask).astype(bool)
    inter = np.logical_and(real_mask, pred_mask).sum()
    union = np.logical_or(real_mask, pred_mask).sum()
    return float(inter / (union + 1e-8))


def precision(real_mask, pred_mask) -> float:
    """TP / (TP + FP) with FP = (real==1 & pred==0) — the reference's
    convention (evaluation.py:60-63; this is actually sensitivity/recall)."""
    real_mask = np.asarray(real_mask)
    pred_mask = np.asarray(pred_mask)
    tp = ((real_mask == 1) & (pred_mask == 1)).sum()
    fp = ((real_mask == 1) & (pred_mask == 0)).sum()
    return float(tp / (tp + fp + 1e-6))


def recall(real_mask, pred_mask) -> float:
    """Reference's `recall` with FN = (real==0 & pred==1)
    (evaluation.py:67-70; this is actually precision)."""
    real_mask = np.asarray(real_mask)
    pred_mask = np.asarray(pred_mask)
    tp = ((real_mask == 1) & (pred_mask == 1)).sum()
    fn = ((real_mask == 0) & (pred_mask == 1)).sum()
    return float(tp / (tp + fn + 1e-6))


def fpr(real_mask, pred_mask) -> float:
    """Reference's `FPR` with FP = (real==1 & pred==0)
    (evaluation.py:73-76; this is actually the miss rate)."""
    real_mask = np.asarray(real_mask)
    pred_mask = np.asarray(pred_mask)
    fp = ((real_mask == 1) & (pred_mask == 0)).sum()
    tn = ((real_mask == 0) & (pred_mask == 0)).sum()
    return float(fp / (fp + tn + 1e-6))


def recall_correct(real_mask, pred_mask) -> float:
    """Textbook recall: TP / (TP + FN), FN = (real==1 & pred==0)."""
    real_mask = np.asarray(real_mask)
    pred_mask = np.asarray(pred_mask)
    tp = ((real_mask == 1) & (pred_mask == 1)).sum()
    fn = ((real_mask == 1) & (pred_mask == 0)).sum()
    return float(tp / (tp + fn + 1e-6))


def fpr_correct(real_mask, pred_mask) -> float:
    """Textbook FPR: FP / (FP + TN), FP = (real==0 & pred==1)."""
    real_mask = np.asarray(real_mask)
    pred_mask = np.asarray(pred_mask)
    fp = ((real_mask == 0) & (pred_mask == 1)).sum()
    tn = ((real_mask == 0) & (pred_mask == 0)).sum()
    return float(fp / (fp + tn + 1e-6))


def roc_curve(labels, scores):
    """ROC curve over flattened pixel scores (evaluation.py:79-83).

    Returns (fpr, tpr, thresholds) with sklearn's convention: thresholds
    descending, curve anchored at (0, 0).
    """
    labels = np.asarray(labels).reshape(-1).astype(bool)
    scores = np.asarray(scores).reshape(-1).astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    scores = scores[order]
    labels = labels[order]
    # indices where the score changes (threshold boundaries)
    distinct = np.where(np.diff(scores))[0]
    idx = np.r_[distinct, labels.size - 1]
    tps = np.cumsum(labels)[idx]
    fps = 1 + idx - tps
    tps = np.r_[0, tps]
    fps = np.r_[0, fps]
    thresholds = np.r_[np.inf, scores[idx]]
    p = max(tps[-1], 1e-12)
    n = max(fps[-1], 1e-12)
    return fps / n, tps / p, thresholds


def auc(x, y) -> float:
    """Trapezoidal AUC (evaluation.py:86-87)."""
    return float(np.trapezoid(y, x))


def roc_auc_score(labels, scores) -> float:
    f, t, _ = roc_curve(labels, scores)
    return auc(f, t)


def batched_roc_auc(labels: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Per-slice ROC-AUC over a (S, ...) stack, vectorised.

    Uses the rank-sum (Mann-Whitney U) identity with average ranks for
    ties — exactly equal to the trapezoidal ROC integral of `roc_auc_score`
    — via scipy's C rankdata, so S slices cost one vectorised pass instead
    of S python-level curve builds."""
    from scipy.stats import rankdata
    s = scores.reshape(scores.shape[0], -1).astype(np.float64)
    l = labels.reshape(labels.shape[0], -1).astype(bool)
    ranks = rankdata(s, method="average", axis=1)
    p = l.sum(axis=1).astype(np.float64)
    n = l.shape[1] - p
    rank_sum = np.where(l, ranks, 0.0).sum(axis=1)
    # degenerate all-negative/all-positive masks: match the scalar path
    # (roc_curve clamps P/N at 1e-12 -> AUC 0.0), never NaN
    return ((rank_sum - p * (p + 1) / 2)
            / (np.maximum(p, 1e-12) * np.maximum(n, 1e-12)))


def batched_ssim(real: np.ndarray, recon: np.ndarray,
                 data_range: float = 2.0, win_size: int = 7,
                 k1: float = 0.01, k2: float = 0.03) -> np.ndarray:
    """Per-slice SSIM over (S, H, W, C) stacks (mean over channels),
    identical algorithm to `ssim` but filtered once across the whole stack
    (uniform window applied over the H/W axes only)."""
    real = np.asarray(real, np.float64)
    recon = np.asarray(recon, np.float64)
    np_win = win_size ** 2
    cov_norm = np_win / (np_win - 1)
    filt = lambda a: uniform_filter(a, size=(1, win_size, win_size, 1))
    ux, uy = filt(real), filt(recon)
    uxx, uyy, uxy = filt(real * real), filt(recon * recon), filt(real * recon)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    return s[:, pad:s.shape[1] - pad, pad:s.shape[2] - pad, :].mean(
        axis=(1, 2, 3))


def batched_anomaly_metrics(real: np.ndarray, recon: np.ndarray,
                            mask: np.ndarray) -> dict:
    """All seven per-slice detection metrics over (S, H, W, C) stacks in one
    vectorised pass — the batched counterpart of the scalar reference-parity
    functions above (same conventions, including the reference's swapped
    recall/FPR quirks).  Returns {name: (S,) float64 array}."""
    real = np.asarray(real, np.float64)
    recon = np.asarray(recon, np.float64)
    mask = np.asarray(mask, np.float64)
    axes = tuple(range(1, real.ndim))
    mse_raw = (real - recon) ** 2
    pred = (mse_raw > 0.5).astype(np.float64)
    m1, p1 = mask == 1, pred == 1
    m0, p0 = mask == 0, pred == 0
    tp = (m1 & p1).sum(axis=axes).astype(np.float64)
    inter = (pred * mask).sum(axis=axes)
    union = pred.sum(axis=axes) + mask.sum(axis=axes)
    return {
        "auc": batched_roc_auc(mask.astype(np.uint8), mse_raw),
        "dice": (2.0 * inter + 1e-6) / (union + 1e-6),
        "ssim": batched_ssim(real, recon),
        "iou": ((m1.astype(bool) & p1).sum(axis=axes)
                / ((m1 | p1).sum(axis=axes) + 1e-8)),
        "precision": tp / (tp + (m1 & p0).sum(axis=axes) + 1e-6),
        "recall": tp / (tp + (m0 & p1).sum(axis=axes) + 1e-6),
        "fpr": ((m1 & p0).sum(axis=axes)
                / ((m1 & p0).sum(axis=axes) + (m0 & p0).sum(axis=axes) + 1e-6)),
    }


def ssim(real: np.ndarray, recon: np.ndarray, data_range: float = 2.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03,
         channel_axis=None) -> float:
    """Structural similarity, skimage-default algorithm (uniform 7x7 window,
    border crop), matching the reference's `SSIM` call on [-1, 1] floats
    (evaluation.py:47-48: data_range 2)."""
    real = np.asarray(real, np.float64)
    recon = np.asarray(recon, np.float64)
    if channel_axis is not None:
        vals = [
            ssim(np.take(real, c, axis=channel_axis),
                 np.take(recon, c, axis=channel_axis),
                 data_range, win_size, k1, k2)
            for c in range(real.shape[channel_axis])
        ]
        return float(np.mean(vals))

    nd = real.ndim
    np_win = win_size ** nd
    cov_norm = np_win / (np_win - 1)
    filt = lambda a: uniform_filter(a, size=win_size)
    ux, uy = filt(real), filt(recon)
    uxx, uyy, uxy = filt(real * real), filt(recon * recon), filt(real * recon)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, dim - pad) for dim in s.shape)
    return float(s[crop].mean())

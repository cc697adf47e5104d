"""Metric functions vs sklearn oracles and closed-form cases
(reference definitions: evaluation.py:26-87)."""
import numpy as np
import pytest

from anoddpm_tpu import metrics as M


def test_dice_perfect_and_empty():
    mask = np.zeros((1, 8, 8, 1))
    mask[0, 2:4, 2:4, 0] = 1
    pred = mask.copy()
    assert M.dice_coeff(None, None, mask, mse=pred) == pytest.approx(1.0, abs=1e-5)
    assert M.dice_coeff(None, None, mask, mse=np.zeros_like(mask)) == pytest.approx(0.0, abs=1e-4)
    # smooth term: empty vs empty -> 1
    z = np.zeros((1, 8, 8, 1))
    assert M.dice_coeff(None, None, z, mse=z) == pytest.approx(1.0, abs=1e-5)


def test_dice_from_square_error_threshold():
    real = np.zeros((1, 4, 4, 1))
    recon = real.copy()
    recon[0, 0, 0, 0] = 1.0  # sq err 1 > 0.5
    mask = np.zeros_like(real)
    mask[0, 0, 0, 0] = 1
    assert M.dice_coeff(real, recon, mask) == pytest.approx(1.0, abs=1e-5)


def test_psnr_known_value():
    real = np.ones((4, 4)) * 1.0
    recon = real - 0.1
    expected = 20 * np.log10(1.0 / 0.1)
    assert M.psnr(recon, real) == pytest.approx(expected, rel=1e-6)


def test_iou_half_overlap():
    a = np.array([[1, 1, 0, 0]])
    b = np.array([[1, 0, 1, 0]])
    assert M.iou(a, b) == pytest.approx(1 / 3, rel=1e-5)


def test_confusion_conventions_match_reference():
    real = np.array([1, 1, 0, 0, 1])
    pred = np.array([1, 0, 1, 0, 1])
    # reference precision = TP/(TP + (real&~pred)) = 2/3
    assert M.precision(real, pred) == pytest.approx(2 / 3, rel=1e-4)
    # reference recall uses FN=(~real&pred): 2/(2+1)
    assert M.recall(real, pred) == pytest.approx(2 / 3, rel=1e-4)
    # reference FPR uses FP=(real&~pred): 1/(1+1)
    assert M.fpr(real, pred) == pytest.approx(1 / 2, rel=1e-4)
    # honest variants
    assert M.recall_correct(real, pred) == pytest.approx(2 / 3, rel=1e-4)
    assert M.fpr_correct(real, pred) == pytest.approx(1 / 2, rel=1e-4)


def test_roc_auc_vs_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, size=2000)
    scores = rng.normal(size=2000) + labels * 1.2
    ours = M.roc_auc_score(labels, scores)
    theirs = sklearn.roc_auc_score(labels, scores)
    assert ours == pytest.approx(theirs, abs=1e-9)
    f1, t1, th1 = M.roc_curve(labels, scores)
    f2, t2, th2 = sklearn.roc_curve(labels, scores, drop_intermediate=False)
    np.testing.assert_allclose(f1, f2, atol=1e-12)
    np.testing.assert_allclose(t1, t2, atol=1e-12)


def test_roc_auc_ties_vs_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    labels = np.array([0, 0, 1, 1, 1, 0, 1, 0])
    scores = np.array([0.1, 0.1, 0.1, 0.9, 0.9, 0.5, 0.5, 0.5])
    assert M.roc_auc_score(labels, scores) == pytest.approx(
        sklearn.roc_auc_score(labels, scores), abs=1e-12)


def test_ssim_identity_and_monotonicity():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(32, 32))
    assert M.ssim(x, x) == pytest.approx(1.0, abs=1e-9)
    a = M.ssim(x, np.clip(x + rng.normal(scale=0.05, size=x.shape), -1, 1))
    b = M.ssim(x, np.clip(x + rng.normal(scale=0.5, size=x.shape), -1, 1))
    assert 0 < b < a < 1


def test_ssim_channel_axis():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, size=(16, 16, 3))
    assert M.ssim(x, x, channel_axis=2) == pytest.approx(1.0, abs=1e-9)


def test_ssim_matches_skimage_formula_small():
    # hand-check: constant images differing by delta
    x = np.zeros((9, 9))
    y = np.full((9, 9), 0.1)
    c1 = (0.01 * 2) ** 2
    expected = (2 * 0 * 0.1 + c1) / (0 + 0.1 ** 2 + c1)  # variance terms cancel
    assert M.ssim(x, y) == pytest.approx(expected, rel=1e-9)

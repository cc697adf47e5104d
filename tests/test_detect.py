"""Detection-driver behaviours: rank-3 sample normalisation, DDIM arg
parsing against defaultdict-str configs, and the full anomalous_validation
recipe (detection.py:17-153)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu.config import defaultdict_from_json
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.ops.noise import make_noise_sampler
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import EvalModel

IMG = 32


@pytest.fixture(scope="module")
def tiny_model():
    model = UNet(img_size=IMG, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, IMG, IMG, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    return em, sched


def test_evaluate_anomaly_batch_rank3(tiny_model):
    """(H, W, C) single samples (MVTec/DAGM shape) are normalised to a batch
    of one — the reference evaluates per-image (detection.py:208-221)."""
    from anoddpm_tpu.detect import evaluate_anomaly_batch
    em, sched = tiny_model
    img = np.random.default_rng(0).normal(size=(IMG, IMG, 1)).astype(np.float32)
    mask = (np.random.default_rng(1).random((IMG, IMG, 1)) > 0.9).astype(np.float32)
    out, recon = evaluate_anomaly_batch(em, sched, img, mask,
                                        jax.random.key(2),
                                        make_noise_sampler("gauss"),
                                        t_distance=5)
    assert recon.shape == (1, IMG, IMG, 1)
    assert len(out["auc"]) == 1 and np.isfinite(out["auc"][0])


def test_metric_calculation_ddim_without_eta(tiny_model, tmp_path):
    """sampler=ddim with no ddim_eta key must not crash: defaultdict .get()
    returns None for absent keys, and float(None) raised before the fix."""
    from anoddpm_tpu.detect import anomalous_metric_calculation
    em, sched = tiny_model
    args = defaultdict_from_json({
        "arg_num": "ddimeta", "img_size": (IMG, IMG), "noise_fn": "gauss",
        "dataset": "synthetic", "sampler": "ddim", "ddim_steps": 3})
    assert args.get("ddim_eta") is None  # the hazard under test
    out = anomalous_metric_calculation(args, root_dir=str(tmp_path),
                                       em=em, sched=sched, t_distance=5,
                                       max_volumes=1)
    assert np.isfinite(out["auc"])


def test_anomalous_validation_full_recipe(tiny_model, tmp_path, monkeypatch):
    """All-volume default, per-slice videos + heatmaps + detection_B, dice
    list returned (detection.py:17-153 semantics)."""
    from anoddpm_tpu.detect import anomalous_validation
    em, sched = tiny_model
    args = defaultdict_from_json({
        "arg_num": "val", "img_size": (IMG, IMG), "noise_fn": "simplex",
        "dataset": "synthetic", "sample_distance": 8, "T": 10})
    dice = anomalous_validation((args, em, sched), root_dir=str(tmp_path),
                                max_volumes=2, max_slices=2,
                                detection_avg=1)
    assert len(dice) == 4  # 2 volumes x 2 slices
    base = os.path.join(str(tmp_path), "diffusion-videos", "ARGS=val",
                        "Anomalous")
    vols = os.listdir(base)
    assert len(vols) == 2
    slice_dirs = os.listdir(os.path.join(base, vols[0]))
    # per-slice artifact dirs + per-slice detection_B dirs
    assert len(slice_dirs) >= 2

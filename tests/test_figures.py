"""Figure generators end-to-end on a tiny checkpoint (reference C19)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu import figures as F
from anoddpm_tpu.checkpoint import save_checkpoint
from anoddpm_tpu.config import defaultdict_from_json
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import EvalModel


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("figroot"))
    img = 32
    model = UNet(img_size=img, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, img, img, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    args = defaultdict_from_json({
        "arg_num": "figtest", "img_size": (img, img), "noise_fn": "gauss",
        "dataset": "synthetic", "sample_distance": 8, "T": 10, "seed": 0})
    return args, em, sched, root


def test_masked_comparison_writes_png(bundle):
    args, em, sched, root = bundle
    F.masked_comparison(args, em, sched, root_dir=root, t_distance=5,
                        n_volumes=2)
    out = os.path.join(root, "final-outputs",
                       "ARGS=figtest-masked-comparison.png")
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_sequence_filmstrip(bundle):
    args, em, sched, root = bundle
    F.denoise_sequence(args, em, sched, root_dir=root, t_distance=4,
                       n_cols=5)
    out = os.path.join(root, "final-outputs", "ARGS=figtest-sequence.png")
    assert os.path.exists(out)


def test_gauss_varying_t(bundle):
    args, em, sched, root = bundle
    F.gauss_varying_t(args, em, sched, root_dir=root, lambdas=(4, 8))
    out = os.path.join(root, "final-outputs",
                       "ARGS=figtest-gauss-varyingT.png")
    assert os.path.exists(out)


def test_make_prediction_panels():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    recon = real + 0.1
    mask = np.zeros_like(real)
    x_t = real * 0.5
    panels, pred = F.make_prediction(real, recon, mask, x_t, threshold=0.5)
    assert panels.shape == (12, 8, 8, 1)  # 6 panel groups x batch 2
    np.testing.assert_array_equal(panels[:2], real)
    np.testing.assert_array_equal(panels[2:4], x_t)
    np.testing.assert_array_equal(panels[4:6], recon)
    # sq-err .01*2-1 < 0 -> below the 0 display threshold everywhere
    assert (pred == -1).all()
    # l1 mode returns the signed difference
    panels_l1, _ = F.make_prediction(real, recon, mask, x_t, error_fn="l1")
    np.testing.assert_allclose(panels_l1[6:8], recon - real, rtol=1e-6)


def test_ano_outputs_writes_sheets(bundle):
    args, em, sched, root = bundle
    F.ano_outputs(args, em, sched, root_dir=root, n_attempts=1, rows=2,
                  t_distance=6)
    d = os.path.join(root, "final-outputs", "ARGS=figtest")
    files = os.listdir(d)
    assert any("predictions.png" in f for f in files)
    assert any("sequence.png" in f for f in files)


def test_test_set_outputs_two_checkpoints(tmp_path):
    """Fig-1 generator drives two checkpoints over the same inputs."""
    root = str(tmp_path)
    img = 32
    model = UNet(img_size=img, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, img, img, 1)),
                                 jnp.zeros((1,), jnp.int32))
    for tok, noise in (("figsx", "simplex"), ("figgs", "gauss")):
        args = {"arg_num": tok, "img_size": (img, img), "noise_fn": noise,
                "dataset": "synthetic", "T": 10, "beta_schedule": "cosine",
                "base_channels": 32, "channel_mults": [1, 2],
                "attention_resolutions": "16", "sample_distance": 8}
        save_checkpoint(root, args, 1, params, params, {}, final=True)
    F.test_set_outputs("figsx", "figgs", root_dir=root, anomalous=True,
                       t_distance=5, n_attempts=1)
    d = os.path.join(root, "final-outputs", "ARGS=figsx")
    assert any("test_set_mixed" in f for f in os.listdir(d))


def test_ce_outputs_sheet(bundle):
    """CE baseline output sheet (generate_images.py:935-1056
    `make_gan_outputs` counterpart, VERDICT r3 #6): renders
    (x_0, recon, sq-err, prediction, mask) rows per attempt from a trained
    context encoder — no diffusion checkpoint involved."""
    from anoddpm_tpu.baselines import train_context_encoder
    args, _, _, root = bundle
    ce_model, ce_params = train_context_encoder(args, root_dir=root,
                                                steps=3, batch_size=4,
                                                base_channels=16)
    F.ce_outputs(args, ce_model, ce_params, root_dir=root, n_attempts=2,
                 rows=2)
    out_dir = os.path.join(root, "final-outputs", "ARGS=figtest")
    sheets = [f for f in os.listdir(out_dir)
              if f.startswith("ce-attempt=") and f.endswith("-predictions.png")]
    assert len(sheets) == 2


def test_sliding_window_inpaint_roundtrip():
    """Inpaint composite: every grid cell gets replaced, output is finite
    and differs from the input for an untrained net."""
    from anoddpm_tpu.data.synthetic import SyntheticAnomalyDataset
    from anoddpm_tpu.models.context_encoder import (ContextEncoder,
                                                    sliding_window_inpaint)
    model = ContextEncoder(base_channels=16, levels=2)
    ano = SyntheticAnomalyDataset(img_size=(32, 32), length=1)
    images = jnp.asarray(ano[0]["image"][:2])
    params = jax.jit(model.init)(jax.random.key(0), images,
                                 jnp.zeros(images.shape[:3] + (1,)))
    recon = np.asarray(sliding_window_inpaint(model, params, images,
                                              window=4))
    assert recon.shape == images.shape
    assert np.isfinite(recon).all()
    assert np.abs(recon - np.asarray(images)).max() > 1e-4

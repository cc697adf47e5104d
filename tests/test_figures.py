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

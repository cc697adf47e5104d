"""UNet structural parity: parameter counts and init behaviour vs goldens
extracted from the reference torch model (UNet.py:220-406), plus shape and
EMA invariants."""
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu.models import UNet, ema_update, init_ema

GOLDENS = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "unet_goldens.json").read_text())


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


@pytest.mark.parametrize("key", list(GOLDENS.keys()))
def test_param_count_parity(key):
    img, base, in_ch, heads, head_ch, attn = key.rsplit("_", 5)
    model = UNet(img_size=int(img), base_channels=int(base),
                 in_channels=int(in_ch), n_heads=int(heads),
                 n_head_channels=int(head_ch), attention_resolutions=attn)
    x = jnp.zeros((1, int(img), int(img), int(in_ch)))
    t = jnp.zeros((1,), jnp.int32)
    # eval_shape: structural check with zero compute/compilation
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, t))
    assert _count(shapes) == GOLDENS[key]["params"]


def test_zero_output_at_init():
    # zero-initialised final conv => output is exactly 0 at init
    # (UNet.py:384-388, zero_module at :414-420)
    model = UNet(img_size=32, base_channels=32, in_channels=1)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    t = jnp.array([3, 7], jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.shape == (2, 32, 32, 1)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_forward_nontrivial_after_perturbation():
    model = UNet(img_size=32, base_channels=32, in_channels=1)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 1))
    t = jnp.array([3], jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(2), p.shape), params)
    apply = jax.jit(model.apply)
    out = apply(params, x, t)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() > 0
    # t-dependence: different timestep must change the output
    out2 = apply(params, x, jnp.array([29], jnp.int32))
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_bf16_compute_path():
    model = UNet(img_size=32, base_channels=32, in_channels=1, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 1))
    t = jnp.array([3], jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.dtype == jnp.float32  # output contract is fp32
    # params stay fp32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))


def test_head_channels_divisibility_error():
    # 128 attention channels (base 64 * mult 2 at ds=2) not divisible by 48
    model = UNet(img_size=32, base_channels=64, in_channels=1,
                 n_head_channels=48, attention_resolutions="16")
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(AssertionError):
        jax.eval_shape(lambda: model.init(jax.random.key(0), x, t))


def test_ema_update_math():
    params = {"w": jnp.ones((3,)) * 2.0}
    ema = init_ema(params)
    new_params = {"w": jnp.ones((3,)) * 4.0}
    ema2 = ema_update(ema, new_params, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema2["w"]), 2.0 * 0.9 + 4.0 * 0.1,
                               rtol=1e-6)


def test_space_to_depth_shapes_and_invertibility():
    # s2d stem: output shape equals input shape; zero-init => zero output
    model = UNet(img_size=64, base_channels=32, in_channels=1,
                 space_to_depth=2, channel_mults=(1, 2),
                 attention_resolutions="16")
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 1))
    t = jnp.array([1, 5], jnp.int32)
    params = jax.jit(model.init)(jax.random.key(1), x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # perturbed params give position-dependent (non-aliased) output
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(2), p.shape),
        params)
    out = jax.jit(model.apply)(params, x, t)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() > 0


def test_bf16_norm_tracks_fp32_norm():
    """The bf16_norm perf knob (GroupNorm elementwise path in activation
    dtype, fp32 statistics) must keep the same parameter tree and produce
    outputs close to the default fp32-norm path."""
    kw = dict(img_size=32, base_channels=32, in_channels=1,
              dtype=jnp.bfloat16)
    ref = UNet(**kw)
    fast = UNet(bf16_norm=True, **kw)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 1))
    t = jnp.array([1, 9], jnp.int32)
    params = ref.init(jax.random.key(0), x, t)
    # same param structure => checkpoints are interchangeable across the knob
    jax.tree_util.tree_map(lambda a, b: None, params,
                           jax.eval_shape(lambda: fast.init(
                               jax.random.key(0), x, t)))
    params = jax.tree_util.tree_map(lambda p: p + 0.02, params)
    out_ref = np.asarray(ref.apply(params, x, t), np.float32)
    out_fast = np.asarray(fast.apply(params, x, t), np.float32)
    scale = np.abs(out_ref).mean() + 1e-6
    assert np.abs(out_fast - out_ref).mean() / scale < 0.05

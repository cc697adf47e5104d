"""Fused Pallas GroupNorm+SiLU (ops/pallas_norm.py): forward and gradient
equivalence against the flax composition (interpret mode on CPU), shape
eligibility gating, and the UNet pallas_norm flag."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu.ops import pallas_norm


def _reference(x, gamma, beta, eps=1e-5):
    gn = nn.GroupNorm(num_groups=32, epsilon=eps, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    out = gn.apply({"params": {"scale": gamma, "bias": beta}},
                   x.astype(jnp.float32))
    return nn.silu(out).astype(x.dtype)


@pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 4, 4, 256)])
def test_fused_forward_matches_flax(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1.0, 0.1, shape[-1]).astype(np.float32))
    beta = jnp.asarray(rng.normal(0.0, 0.1, shape[-1]).astype(np.float32))
    assert pallas_norm.eligible(shape, jnp.float32)
    got = pallas_norm.group_norm_silu(x, gamma, beta)
    want = _reference(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_gradients_match_flax():
    rng = np.random.default_rng(1)
    shape = (2, 4, 4, 128)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1.0, 0.1, shape[-1]).astype(np.float32))
    beta = jnp.asarray(rng.normal(0.0, 0.1, shape[-1]).astype(np.float32))

    def loss_fused(x, g, b):
        return jnp.sum(jnp.square(pallas_norm.group_norm_silu(x, g, b)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.square(_reference(x, g, b)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_, name in zip(gf, gr, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_eligibility_gate():
    f32 = jnp.float32
    assert pallas_norm.eligible((4, 16, 16, 128), f32)
    assert not pallas_norm.eligible((4, 16, 16, 64), f32)     # half lanes
    assert not pallas_norm.eligible((4, 16, 16, 96), f32)     # not /32
    # one sample over the VMEM budget (256*256*128*4B = 32 MiB)
    assert not pallas_norm.eligible((1, 256, 256, 128), f32)
    # at the 2 MiB block budget (scoped-VMEM working set is ~8x block
    # bytes, measured on-chip): 64*64*256*2B = 2 MiB in, 4 MiB out
    assert pallas_norm.eligible((1, 64, 64, 256), jnp.bfloat16)
    assert not pallas_norm.eligible((1, 128, 128, 128), jnp.bfloat16)


def test_unet_pallas_norm_flag_runs_and_trains():
    """UNet(pallas_norm=True) forward + one gradient on a shape where some
    layers take the fused path (C=128 at 16^2/8^2) and others fall back."""
    from anoddpm_tpu.models.unet import UNet
    model = UNet(img_size=16, base_channels=128, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="8",
                 pallas_norm=True)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = "/".join(jax.tree_util.keystr(p) for p, _ in flat)
    assert "_pscale" in names, "no layer took the fused path"

    def loss(p):
        return jnp.mean(jnp.square(model.apply(p, x, t)))

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))

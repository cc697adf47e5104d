"""Fused GroupNorm(32) + SiLU as a single-pass Pallas TPU kernel.

MOTIVATION (round-4 VERDICT weak #8 / item 9): the train-step trace
decomposes the residual MFU gap into conv-backward layout copies and
GroupNorm statistics traffic.  The unfused lowering reads each activation
from HBM at least twice (reduction pass for mean/var, then the
normalise+SiLU elementwise pass) and writes once.  When one sample's whole
(H, W, C) activation fits in VMEM, a Pallas kernel can do the entire
norm+activation in ONE read + ONE write — a 1/3 cut of that op's HBM
traffic, which is what GroupNorm is bound by (the arithmetic is trivial).

Kernel shape: grid over batch; block = one sample (1, H, W, C), C on the
lane axis.  Statistics accumulate in fp32 via channel-wise sum/sum-of-
squares reductions (fast lane-parallel row reductions, then a tiny (G, Cg)
fold); the elementwise path stays in the activation dtype.  The kernel also
emits the per-(sample, group) mean/rstd so the training backward gets its
residuals without re-reading x.

Eligibility (``eligible(shape, dtype)``): C % 32 == 0 (whole groups),
C % 128 == 0 (full lanes — smaller C pads the lane axis and wastes the DMA
bandwidth the kernel exists to save), and one sample <= 4 MiB (VMEM budget
with double-buffered in/out blocks).  Ineligible shapes fall back to the
flax composition in the caller (models/unet.py NormSiLU).

Training: ``group_norm_silu`` carries a custom_vjp whose backward is the
closed-form GroupNorm+SiLU gradient in plain XLA ops (the backward was
already fused reasonably by XLA; the probe targets forward traffic).

Reference counterpart: GroupNorm32 in fp32 (UNet.py:409-411) composed with
SiLU activations (UNet.py:161-171).  Measured on-chip by
scripts/pallas_norm_probe.py -> results/mfu_push.jsonl.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUPS = 32
# Per-sample block budget.  The kernel's scoped-VMEM working set is ~8x the
# block bytes for bf16 inputs (in + out blocks double-buffered, plus the
# fp32 cast and normalised temporaries Mosaic materialises): a 3 MiB
# (64, 64, 384) bf16 block measured 23.98 MiB scoped demand against the
# 16 MiB limit.  2 MiB keeps the demand ~= 8 MiB with headroom; larger
# activations fall back to the flax/XLA composition.
VMEM_SAMPLE_BYTES = 2 * 1024 * 1024


def eligible(shape, dtype) -> bool:
    """True when (B, H, W, C) activations can take the single-pass kernel."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if c % GROUPS or c % 128:
        return False
    return h * w * c * jnp.dtype(dtype).itemsize <= VMEM_SAMPLE_BYTES


def _kernel(x_ref, gamma_ref, beta_ref, o_ref, mean_ref, rstd_ref,
            *, groups: int, eps: float):
    x = x_ref[...]                                   # (1, H, W, C)
    _, h, w, c = x.shape
    cg = c // groups
    xf = x.reshape(h * w, c).astype(jnp.float32)
    # channel-wise moments (lane-parallel row reductions, kept 2-D — Mosaic
    # has no (C,) -> (G, cg) vector reshape), then fold lanes group-wise
    # with a tiny one-hot (C, G) matmul; the expansion back to (1, C) is
    # its transpose.  Both are exact (0/1 weights) and MXU-trivial.
    s = jnp.sum(xf, axis=0, keepdims=True)           # (1, C)
    ss = jnp.sum(xf * xf, axis=0, keepdims=True)     # (1, C)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    fold = (cidx // cg == gidx).astype(jnp.float32)  # (C, G)
    n = jnp.float32(h * w * cg)
    mean_g = jnp.dot(s, fold, preferred_element_type=jnp.float32) / n
    ex2_g = jnp.dot(ss, fold, preferred_element_type=jnp.float32) / n
    rstd_g = jax.lax.rsqrt(ex2_g - mean_g * mean_g + eps)   # (1, G)
    # stats blocks are (1, 1, G): the trailing two block dims must equal the
    # array dims (or be 8/128-tiled) for the Mosaic lowering — a flat (1, G)
    # block on a (B, G) array fails the sublane rule for B > 1
    mean_ref[...] = mean_g.reshape(1, 1, groups)
    rstd_ref[...] = rstd_g.reshape(1, 1, groups)
    mean = jnp.dot(mean_g, fold.T, preferred_element_type=jnp.float32)
    rstd = jnp.dot(rstd_g, fold.T, preferred_element_type=jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32).reshape(1, c)
    beta = beta_ref[...].astype(jnp.float32).reshape(1, c)
    scale = rstd * gamma                             # (1, C)
    shift = beta - mean * scale
    y = xf * scale + shift
    o_ref[...] = (y * jax.nn.sigmoid(y)).astype(x.dtype).reshape(1, h, w, c)


def _fused_call(x, gamma, beta, eps):
    b, h, w, c = x.shape
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_kernel, groups=GROUPS, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GROUPS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GROUPS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, GROUPS), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, GROUPS), jnp.float32),
        ],
        interpret=interpret,
    )(x, gamma, beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_norm_silu(x, gamma, beta, eps: float = 1e-5):
    """silu(group_norm_32(x) * gamma + beta) for NHWC x, fused on TPU.

    Callers must check ``eligible(x.shape, x.dtype)`` first.
    """
    out, _, _ = _fused_call(x, gamma, beta, eps)
    return out


def _fwd(x, gamma, beta, eps):
    out, mean, rstd = _fused_call(x, gamma, beta, eps)
    return out, (x, gamma, beta, mean[:, 0], rstd[:, 0])


def _bwd(eps, res, g_out):
    x, gamma, beta, mean, rstd = res
    b, h, w, c = x.shape
    cg = c // GROUPS
    xf = x.astype(jnp.float32)
    mean_c = jnp.repeat(mean, cg, axis=1)            # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    xhat = (xf - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    z = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    sig = jax.nn.sigmoid(z)
    dz = g_out.astype(jnp.float32) * sig * (1.0 + z * (1.0 - sig))

    dgamma = jnp.sum(dz * xhat, axis=(0, 1, 2)).astype(gamma.dtype)
    dbeta = jnp.sum(dz, axis=(0, 1, 2)).astype(beta.dtype)

    dxhat = dz * gamma.astype(jnp.float32)
    dg = dxhat.reshape(b, h * w, GROUPS, cg)
    xg = xhat.reshape(b, h * w, GROUPS, cg)
    m1 = dg.mean(axis=(1, 3))                        # (B, G)
    m2 = (dg * xg).mean(axis=(1, 3))
    dx = (dxhat
          - jnp.repeat(m1, cg, axis=1)[:, None, None, :]
          - xhat * jnp.repeat(m2, cg, axis=1)[:, None, None, :])
    dx = dx * rstd_c[:, None, None, :]
    return dx.astype(x.dtype), dgamma, dbeta


group_norm_silu.defvjp(_fwd, _bwd)

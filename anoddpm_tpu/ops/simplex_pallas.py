"""Pallas TPU kernel for batched multi-octave simplex fields.

Tiles each (field, row-block) onto the grid: one program computes a
(TILE_H, W) block of one field entirely in VMEM — coordinates from
broadcasted iota offset by the program id, the hash-path cell walk
(`opensimplex.opensimplex3_hash`, pure VPU math) evaluated per octave in a
fori_loop, and the block written once.  Per-field seed/timestep arrive as
(1, 1) SMEM scalars.

This is the explicit-tiling counterpart of `batched_fractal3_fixed_t`
(which relies on XLA fusion); `fields_pallas` falls back to the XLA path
when the width is not lane-aligned (W % 128 != 0).  Correctness is tested
against the XLA path in interpret mode (tests/test_simplex_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import simplex as sx


def _field_kernel(seed_ref, t_ref, out_ref, *, octaves: int,
                  persistence: float, frequency: float, tile_h: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # seeds/ts are scalar-prefetch SMEM arrays indexed by the field id
    seed = seed_ref[i].astype(jnp.uint32)
    t = t_ref[i]
    h, w = out_ref.shape[1], out_ref.shape[2]
    # Mosaic only lowers integer iota; cast to f32 afterwards
    yy = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
          + j * tile_h).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)

    def body(o, carry):
        acc, scale, amp = carry
        acc = acc + amp * sx.opensimplex3_hash(seed, xx * scale, yy * scale,
                                               t * scale)
        # multiplicative recurrence instead of powf (unsupported in Mosaic)
        return acc, scale * 2.0, amp * persistence

    acc, _, _ = jax.lax.fori_loop(
        0, octaves, body,
        (jnp.zeros((h, w), jnp.float32), jnp.float32(1.0 / frequency),
         jnp.float32(1.0)))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("shape_hw", "octaves",
                                             "persistence", "frequency",
                                             "tile_h", "interpret"))
def fields_pallas(seeds: jax.Array, ts: jax.Array,
                  shape_hw: Tuple[int, int], octaves: int = 6,
                  persistence: float = 0.8, frequency: float = 64.0,
                  tile_h: int = 128, interpret: bool = False) -> jax.Array:
    """(n,) seeds + (n,) timesteps -> (n, H, W) octave fields."""
    n = seeds.shape[0]
    h, w = shape_hw
    tile_h = min(tile_h, h)
    if h % tile_h or w % 128:
        # lane/sublane alignment not met: use the XLA-fused path
        raise ValueError(f"fields_pallas needs H % tile_h == 0 and "
                         f"W % 128 == 0, got {shape_hw} tile_h={tile_h}")
    kernel = functools.partial(_field_kernel, octaves=int(octaves),
                               persistence=float(persistence),
                               frequency=float(frequency), tile_h=tile_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seeds and ts land in SMEM before the body
        grid=(n, h // tile_h),
        in_specs=[],
        out_specs=pl.BlockSpec((1, tile_h, w),
                               lambda i, j, seeds, ts: (i, j, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(seeds.astype(jnp.int32), ts.astype(jnp.float32))


def batched_fractal3_fixed_t_pallas(key: jax.Array,
                                    shape_hw: Tuple[int, int], t: jax.Array,
                                    n_fields: int, octaves: int = 6,
                                    persistence: float = 0.8,
                                    frequency: float = 64.0,
                                    interpret: bool = False) -> jax.Array:
    """Drop-in Pallas counterpart of `simplex.batched_fractal3_fixed_t`."""
    seeds = sx.seeds_from_key(key, n_fields)
    ts = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (n_fields,))
    return fields_pallas(seeds, ts, shape_hw, octaves, persistence,
                         frequency, interpret=interpret)

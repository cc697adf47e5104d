"""On-chip timing: Pallas explicit-tiling simplex kernel vs the XLA-fused
hash path, at the production shape (256^2, 6 octaves, batched fields).

VERDICT.md round-1 item 4 — wire the Pallas kernel behind a measured win or
retire it.  Measured on the real TPU chip (2026-08-16):

    n=8:  xla 0.509 ms   pallas 0.982 ms   (xla 1.9x faster)
    n=32: xla 0.537 ms   pallas 2.436 ms   (xla 4.5x faster)
    n=64: xla 0.419 ms   pallas 1.625 ms   (xla 3.9x faster)

The XLA-fused `batched_fractal3_fixed_t` wins at every batch size (the
cell walk is pure VPU elementwise math that XLA already fuses into one
pass; the hand-tiled kernel only adds grid overhead), so the Pallas
variant was RETIRED from the package and `ops/noise.py` keeps the XLA
path as the single production implementation.  The retired kernel is kept
inline below so the comparison stays reproducible.

Usage: python scripts/pallas_vs_xla_noise.py [n_fields ...]
Inputs vary per iteration (the execution relay memoizes identical
dispatches).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anoddpm_tpu.ops import simplex as sx


def _field_kernel(seed_ref, t_ref, out_ref, *, octaves, persistence,
                  frequency, tile_h):
    """One (field, row-block): the hash-path cell walk evaluated per octave
    in a fori_loop, block computed entirely in VMEM."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    seed = seed_ref[i].astype(jnp.uint32)
    t = t_ref[i]
    h, w = out_ref.shape[1], out_ref.shape[2]
    yy = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
          + j * tile_h).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)

    def body(o, carry):
        acc, scale, amp = carry
        acc = acc + amp * sx.opensimplex3_hash(seed, xx * scale, yy * scale,
                                               t * scale)
        return acc, scale * 2.0, amp * persistence

    acc, _, _ = jax.lax.fori_loop(
        0, octaves, body,
        (jnp.zeros((h, w), jnp.float32), jnp.float32(1.0 / frequency),
         jnp.float32(1.0)))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("shape_hw", "octaves",
                                             "persistence", "frequency",
                                             "tile_h"))
def fields_pallas(seeds, ts, shape_hw, octaves=6, persistence=0.8,
                  frequency=64.0, tile_h=128):
    n = seeds.shape[0]
    h, w = shape_hw
    tile_h = min(tile_h, h)
    assert h % tile_h == 0 and w % 128 == 0
    kernel = functools.partial(_field_kernel, octaves=int(octaves),
                               persistence=float(persistence),
                               frequency=float(frequency), tile_h=tile_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, h // tile_h),
        in_specs=[],
        out_specs=pl.BlockSpec((1, tile_h, w),
                               lambda i, j, seeds, ts: (i, j, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
    )(seeds.astype(jnp.int32), ts.astype(jnp.float32))


def time_fn(fn, n_iters=10):
    fn(jax.random.key(999)).block_until_ready()  # compile
    t0 = time.time()
    for i in range(n_iters):
        fn(jax.random.key(i)).block_until_ready()
    return (time.time() - t0) / n_iters


def main():
    hw = (256, 256)
    octaves = 6
    results = {}
    for n in [int(a) for a in sys.argv[1:]] or [8, 32, 64]:
        t = jnp.full((n,), 120.0)

        def xla_path(key):
            return sx.batched_fractal3_fixed_t(key, hw, t, n_fields=n,
                                               octaves=octaves)

        def pallas_path(key):
            seeds = sx.seeds_from_key(key, n)
            return fields_pallas(seeds, t, hw, octaves=octaves)

        ms_xla = time_fn(xla_path) * 1e3
        ms_pal = time_fn(pallas_path) * 1e3
        results[n] = {"xla_ms": round(ms_xla, 3),
                      "pallas_ms": round(ms_pal, 3),
                      "speedup": round(ms_xla / ms_pal, 3)}
        print(f"n={n}: xla {ms_xla:.3f} ms  pallas {ms_pal:.3f} ms  "
              f"speedup {ms_xla / ms_pal:.2f}x", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Keyed, deterministic noise sources for the diffusion process.

The reference binds an impure `noise_fn(x, t)` at model construction
(GaussianDiffusion.py:161-171): Gaussian via `torch.randn_like`, simplex via
host-side Numba with a fresh random seed per channel per call.  Here every
noise source is a pure function `(key, shape, t) -> field`, so it threads
through `jax.lax.scan` carries and `pjit` without host traffic, and runs are
reproducible from a single root key.

Batch semantics: the reference generates ONE simplex field and repeats it
across the batch (GaussianDiffusion.py:125-136), which only behaves at
Batch_Size=1 (every shipped config).  The default here is independent
per-sample fields (`share_batch=False`); `share_batch=True` reproduces the
reference's repeated-field behaviour for parity runs.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from . import simplex as sx

NoiseSampler = Callable[[jax.Array, Tuple[int, ...], jax.Array], jax.Array]

# The reference's 23-entry (octave, persistence, frequency) table for
# "simplex_randParam" (GaussianDiffusion.py:104-110).
RAND_PARAM_TABLE = (
    (2, 0.6, 16), (6, 0.6, 32), (7, 0.7, 32), (10, 0.8, 64), (5, 0.8, 16),
    (4, 0.6, 16), (1, 0.6, 64), (7, 0.8, 128), (6, 0.9, 64), (2, 0.85, 128),
    (2, 0.85, 64), (2, 0.85, 32), (2, 0.85, 16), (2, 0.85, 8), (2, 0.85, 4),
    (2, 0.85, 2), (1, 0.85, 128), (1, 0.85, 64), (1, 0.85, 32), (1, 0.85, 16),
    (1, 0.85, 8), (1, 0.85, 4), (1, 0.85, 2),
)


def gaussian_noise(key: jax.Array, shape: Tuple[int, ...], t: jax.Array) -> jax.Array:
    del t
    return jax.random.normal(key, shape, dtype=jnp.float32)


gaussian_noise.fingerprint = ("gauss",)


def simplex_noise(key: jax.Array, shape: Tuple[int, ...], t: jax.Array,
                  octaves: int = 6, persistence: float = 0.8,
                  frequency: float = 64.0, share_batch: bool = False,
                  table: bool = False) -> jax.Array:
    """Multi-octave simplex field(s), NHWC output.

    shape = (B, H, W, C); t is scalar or (B,) timesteps (the field's fixed
    z-plane, matching `rand_3d_fixed_T_octaves`, simplex.py:75-93).  Each
    (sample, channel) pair gets an independent permutation table derived from
    `key` (the on-device analogue of per-channel `newSeed()`,
    GaussianDiffusion.py:102).

    `table=True` selects the reference-exact permutation-table kernel
    (gathered gradients, the mechanism of simplex.py:174-192) instead of the
    gather-free lattice hash — distribution-exact to the reference's noise
    and used by parity twin cells; the hash path is the production default.
    """
    b, h, w, c = shape
    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
    gen = (sx.batched_fractal3_fixed_t_table if table
           else sx.batched_fractal3_fixed_t)
    if share_batch:
        # One field per channel at t[0], repeated over batch (reference quirk).
        fields = gen(
            key, (h, w), t[0], n_fields=c, octaves=octaves,
            persistence=persistence, frequency=frequency)          # (C, H, W)
        out = jnp.broadcast_to(fields.transpose(1, 2, 0)[None], (b, h, w, c))
        return out
    t_fields = jnp.repeat(t, c)                                    # (B*C,)
    fields = gen(
        key, (h, w), t_fields, n_fields=b * c, octaves=octaves,
        persistence=persistence, frequency=frequency)              # (B*C, H, W)
    return fields.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def simplex2d_noise(key: jax.Array, shape: Tuple[int, ...], t: jax.Array,
                    octaves: int = 6, persistence: float = 0.8,
                    frequency: float = 64.0) -> jax.Array:
    """Timestep-independent 2D octave fields, NHWC output.

    The capability counterpart of the reference noise class's 2D surface
    (`rand_2d_octaves`, simplex.py:56-73) — exposed as noise kind
    "simplex_2d".  The diffusion recipes all use the 3D fixed-t variant
    (the z-plane tracks the timestep); 2D drops that coupling, so `t` is
    ignored.
    """
    del t
    b, h, w, c = shape
    fields = sx.batched_fractal2(key, (h, w), n_fields=b * c,
                                 octaves=octaves, persistence=persistence,
                                 frequency=frequency)
    return fields.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def simplex_volume_noise(key: jax.Array, shape_zhw: Tuple[int, int, int],
                         octaves: int = 1, persistence: float = 0.5,
                         frequency: float = 32.0) -> jax.Array:
    """z-varying (Z, H, W) octave noise volume — the capability counterpart
    of `rand_3d_octaves` (simplex.py:37-54), the reference noise class's
    animated-volume surface.  Not called by any diffusion recipe (the
    training/detection paths use the fixed-t plane), but part of the C8
    public surface: e.g. generating temporally-coherent noise videos.

    One fresh hash seed per call (the on-device analogue of `newSeed()`).
    """
    seed = sx.seeds_from_key(key, 1)[0]
    return sx.fractal3_volume_hash(seed, tuple(shape_zhw), octaves=octaves,
                                   persistence=persistence,
                                   frequency=frequency)


def simplex_rand_param_noise(key: jax.Array, shape: Tuple[int, ...],
                             t: jax.Array) -> jax.Array:
    """Simplex field with per-call random (octave, persistence, frequency)
    drawn from RAND_PARAM_TABLE.

    Note: in the reference this mode is inert — the random-parameter field is
    unconditionally overwritten by the default-parameter field
    (GaussianDiffusion.py:113-136).  We implement it *correctly* here; pass
    noise kind "simplex" for reference-parity behaviour.

    DELIBERATE DEVIATION (PARITY.md): the reference draws a fresh
    (octave, persistence, frequency) triple PER CHANNEL
    (GaussianDiffusion.py:102-111); this draws ONE triple per call shared
    across the whole (B, C) batch — a traced per-channel octave count would
    force `max_octaves` kernel evaluations per channel.  Since every
    shipped config is single-channel MRI and the mode is inert in the
    reference anyway, the observable difference is nil.
    """
    b, h, w, c = shape
    key_param, key_seeds = jax.random.split(key)
    idx = jax.random.randint(key_param, (), 0, len(RAND_PARAM_TABLE))
    table = jnp.asarray(RAND_PARAM_TABLE, jnp.float32)
    octv, pers, freq = table[idx, 0], table[idx, 1], table[idx, 2]

    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
    seeds = sx.seeds_from_key(key_seeds, b * c)
    t_fields = jnp.repeat(t, c)

    fields = jax.vmap(
        lambda s, ti: sx.fractal3_fixed_t_masked(s, (h, w), ti, octv, pers,
                                                 freq))(seeds, t_fields)
    return fields.reshape(b, c, h, w).transpose(0, 2, 3, 1)


simplex_rand_param_noise.fingerprint = ("simplex_randParam",)


def make_noise_sampler(kind: str, octaves: int = 6, persistence: float = 0.8,
                       frequency: float = 64.0,
                       share_batch: bool = False,
                       table: bool = False) -> NoiseSampler:
    """Noise dispatch by config kind (GaussianDiffusion.py:161-171).

    kinds: "gauss" | "simplex" | "simplex_randParam" | "simplex_2d" | "random"
    (anything else falls through to plain simplex, as in the reference).

    Every returned sampler carries a `fingerprint` attribute — the value
    tuple of its construction parameters — so program caches can key on
    sampler SEMANTICS rather than closure identity (two calls with the same
    arguments return distinct closures that compute the same function).
    """
    if kind == "gauss":
        return gaussian_noise
    if kind == "simplex_randParam":
        return simplex_rand_param_noise
    if kind == "simplex_2d":
        def simplex2d_sampler(key, shape, t):
            return simplex2d_noise(key, shape, t, octaves, persistence,
                                   frequency)
        simplex2d_sampler.fingerprint = ("simplex_2d", octaves, persistence,
                                         frequency)
        return simplex2d_sampler
    if kind == "random":
        def random_noise(key, shape, t):
            key_flip, key_noise = jax.random.split(key)
            coin = jax.random.bernoulli(key_flip)
            return jax.lax.cond(
                coin,
                lambda k: gaussian_noise(k, shape, t),
                lambda k: simplex_noise(k, shape, t, octaves, persistence,
                                        frequency, share_batch, table),
                key_noise)
        random_noise.fingerprint = ("random", octaves, persistence,
                                    frequency, share_batch, table)
        return random_noise

    def simplex_sampler(key, shape, t):
        return simplex_noise(key, shape, t, octaves, persistence, frequency,
                             share_batch, table)
    simplex_sampler.fingerprint = ("simplex", octaves, persistence,
                                   frequency, share_batch, table)
    return simplex_sampler


def sampler_from_args(args) -> NoiseSampler:
    return make_noise_sampler(
        str(args.get("noise_fn", "gauss") or "gauss"),
        octaves=int(args.get("simplex_octaves", 6) or 6),
        persistence=float(args.get("simplex_persistence", 0.8) or 0.8),
        frequency=float(args.get("simplex_frequency", 64) or 64),
        table=bool(args.get("simplex_table", False)),
    )

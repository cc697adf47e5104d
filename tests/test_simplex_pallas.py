"""Pallas simplex kernel vs the XLA-fused path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu.ops import simplex as sx
from anoddpm_tpu.ops import simplex_pallas as sp


def test_pallas_matches_xla_path():
    key = jax.random.key(0)
    t = jnp.array([3.0, 9.0])
    xla = sx.batched_fractal3_fixed_t(key, (16, 128), t, n_fields=2,
                                      octaves=3, persistence=0.7,
                                      frequency=16.0)
    pallas = sp.batched_fractal3_fixed_t_pallas(key, (16, 128), t,
                                                n_fields=2, octaves=3,
                                                persistence=0.7,
                                                frequency=16.0,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(pallas),
                               rtol=1e-5, atol=1e-5)


def test_pallas_tiling_multiblock():
    key = jax.random.key(1)
    t = jnp.zeros((1,))
    full = sp.fields_pallas(sx.seeds_from_key(key, 1), t, (256, 128),
                            octaves=2, tile_h=64, interpret=True)
    ref = sp.fields_pallas(sx.seeds_from_key(key, 1), t, (256, 128),
                           octaves=2, tile_h=256, interpret=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_alignment_error():
    with pytest.raises(ValueError):
        sp.fields_pallas(jnp.zeros((1,), jnp.uint32), jnp.zeros((1,)),
                         (16, 64), interpret=True)

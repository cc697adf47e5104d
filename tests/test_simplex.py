"""Simplex kernel tests: bit-level parity of the LCG perm-table init and
numerical parity of the vectorised OpenSimplex3 against golden values
generated from the reference's scalar implementation (simplex.py:174-192,
:321-830) run in pure Python."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu.ops import simplex as sx


@pytest.mark.parametrize("seed", [3, 12345, -9876543210, 9999999999])
def test_perm_table_lcg_parity(golden, seed):
    g = golden(f"golden_perm_{seed}.npz")
    perm, gid = sx.perm_tables_from_seed(seed)
    np.testing.assert_array_equal(perm, g["perm"])
    # reference stores (perm % 24) * 3 as a flat byte offset; we store the id
    np.testing.assert_array_equal(gid * 3, g["perm_grad_index3"])


def test_perm_table_is_permutation_from_key():
    perm, gid = sx.perm_tables_from_key(jax.random.key(0))
    assert sorted(np.asarray(perm).tolist()) == list(range(256))
    np.testing.assert_array_equal(np.asarray(gid), np.asarray(perm) % 24)


def test_noise3_matches_reference_scalar(golden):
    g = golden("golden_noise3.npz")
    perm = jnp.asarray(g["perm"], jnp.int32)
    gid = jnp.asarray(g["pgi"] // 3, jnp.int32)
    pts = g["pts"]
    # float64 reference vs float32 vectorised: points near branch boundaries
    # can fall into a different simplex cell, so compare with a tolerance and
    # allow a tiny fraction of boundary flips.
    vals = sx.opensimplex3(perm, gid,
                           jnp.asarray(pts[:, 0], jnp.float32),
                           jnp.asarray(pts[:, 1], jnp.float32),
                           jnp.asarray(pts[:, 2], jnp.float32))
    vals = np.asarray(vals)
    err = np.abs(vals - g["vals"])
    assert np.median(err) < 1e-6
    assert (err < 1e-4).mean() > 0.99, f"max err {err.max()}"


def test_octave_field_matches_reference(golden):
    g = golden("golden_octave_field.npz")
    perm = jnp.asarray(g["perm"], jnp.int32)
    gid = jnp.asarray(g["pgi"] // 3, jnp.int32)
    field = sx.fractal3_fixed_t(perm, gid, (16, 24), 7.0, octaves=4,
                                persistence=0.8, frequency=8.0)
    ref_field = g["field"][0]
    err = np.abs(np.asarray(field) - ref_field)
    assert np.median(err) < 1e-5
    assert (err < 1e-3).mean() > 0.99, f"max err {err.max()}"


def test_volume_octaves_slice_consistency():
    """`fractal3_volume` (rand_3d_octaves, simplex.py:37-54): each z-slice
    of the volume must equal the fixed-t plane evaluated at t=z with the
    same octave parameters — the volume is the z-stack of the planes."""
    perm, gid = sx.perm_tables_from_seed(3)
    vol = sx.fractal3_volume(perm, gid, (5, 12, 16), octaves=3,
                             persistence=0.6, frequency=8.0)
    assert vol.shape == (5, 12, 16)
    for z in (0, 2, 4):
        plane = sx.fractal3_fixed_t(perm, gid, (12, 16), float(z), octaves=3,
                                    persistence=0.6, frequency=8.0)
        np.testing.assert_allclose(np.asarray(vol[z]), np.asarray(plane),
                                   rtol=1e-5, atol=1e-5)


def test_volume_hash_matches_fixed_t_hash_planes():
    seed = jnp.uint32(99)
    vol = sx.fractal3_volume_hash(seed, (4, 8, 8), octaves=2,
                                  persistence=0.5, frequency=16.0)
    for z in range(4):
        plane = sx.fractal3_fixed_t_hash(seed, (8, 8), float(z), octaves=2,
                                         persistence=0.5, frequency=16.0)
        np.testing.assert_allclose(np.asarray(vol[z]), np.asarray(plane),
                                   rtol=1e-5, atol=1e-5)
    # z must actually vary (not a repeated plane)
    assert np.abs(np.asarray(vol[0]) - np.asarray(vol[3])).max() > 1e-3


def test_simplex_volume_noise_wrapper():
    from anoddpm_tpu.ops import noise as nz
    vol = nz.simplex_volume_noise(jax.random.key(0), (6, 16, 16), octaves=4,
                                  persistence=0.8, frequency=16.0)
    arr = np.asarray(vol)
    assert arr.shape == (6, 16, 16)
    assert np.isfinite(arr).all() and abs(arr.mean()) < 0.3
    # deterministic per key, fresh across keys (newSeed analogue)
    vol2 = nz.simplex_volume_noise(jax.random.key(0), (6, 16, 16), octaves=4,
                                   persistence=0.8, frequency=16.0)
    np.testing.assert_array_equal(arr, np.asarray(vol2))
    vol3 = nz.simplex_volume_noise(jax.random.key(1), (6, 16, 16), octaves=4,
                                   persistence=0.8, frequency=16.0)
    assert np.abs(arr - np.asarray(vol3)).max() > 1e-3


def test_masked_octaves_equals_static():
    seed = jnp.uint32(12345)
    static = sx.fractal3_fixed_t_hash(seed, (8, 8), 3.0, octaves=4,
                                      persistence=0.7, frequency=16.0)
    masked = sx.fractal3_fixed_t_masked(seed, (8, 8), 3.0,
                                        n_active=4, persistence=0.7,
                                        frequency=16.0, max_octaves=10)
    np.testing.assert_allclose(np.asarray(static), np.asarray(masked),
                               rtol=1e-5, atol=1e-5)


def test_hash_path_statistics_match_table_path():
    """The gather-free hash path must be statistically interchangeable with
    the table-exact path (same cell walk, uniform gradient choice)."""
    perm, gid = sx.perm_tables_from_seed(3)
    pts = np.random.default_rng(3).uniform(-30, 30, size=(4000, 3)).astype(np.float32)
    table_vals = np.asarray(sx.opensimplex3(
        jnp.asarray(perm), jnp.asarray(gid),
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2])))
    hash_vals = np.asarray(sx.opensimplex3_hash(
        jnp.uint32(777), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2])))
    # same range, similar spread, both zero-mean-ish
    assert abs(hash_vals.mean()) < 0.03 and abs(table_vals.mean()) < 0.03
    assert 0.5 < hash_vals.std() / table_vals.std() < 2.0
    assert np.abs(hash_vals).max() <= 1.0 + 1e-5
    # deterministic per seed, different across seeds
    hash_vals2 = np.asarray(sx.opensimplex3_hash(
        jnp.uint32(777), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2])))
    np.testing.assert_array_equal(hash_vals, hash_vals2)
    hash_vals3 = np.asarray(sx.opensimplex3_hash(
        jnp.uint32(778), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(pts[:, 2])))
    assert np.abs(hash_vals - hash_vals3).max() > 1e-3


def test_grad_components_match_table():
    gids = jnp.arange(24, dtype=jnp.int32)
    gx, gy, gz = sx._grad_components(gids, jnp.float32)
    got = np.stack([np.asarray(gx), np.asarray(gy), np.asarray(gz)], axis=1)
    np.testing.assert_array_equal(got, sx.GRADIENTS3)


def test_batched_fields_independent_and_deterministic():
    key = jax.random.key(42)
    out1 = sx.batched_fractal3_fixed_t(key, (16, 16), jnp.array([5.0, 5.0]),
                                       n_fields=2, octaves=2)
    out2 = sx.batched_fractal3_fixed_t(key, (16, 16), jnp.array([5.0, 5.0]),
                                       n_fields=2, octaves=2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # different keys per field -> different fields even at the same t
    assert np.abs(np.asarray(out1[0]) - np.asarray(out1[1])).max() > 1e-3


def test_noise_statistics():
    # Simplex noise should be zero-mean-ish and bounded; octave sum of 6
    # octaves with persistence .8 stays in a few-units range.
    out = sx.batched_fractal3_fixed_t(jax.random.key(7), (64, 64),
                                      jnp.zeros((4,)), n_fields=4, octaves=6,
                                      persistence=0.8, frequency=64.0)
    arr = np.asarray(out)
    assert abs(arr.mean()) < 0.2
    assert 0.05 < arr.std() < 2.0
    assert np.isfinite(arr).all()


def test_noise2_matches_reference_scalar(golden):
    """2D kernel vs the reference scalar `_noise2` (simplex.py:211-309)
    evaluated at 2000 random points with the bit-exact seed-3 perm table."""
    g = golden("golden_noise2.npz")
    perm = jnp.asarray(g["perm"], jnp.int32)
    pts = g["pts"]
    vals = np.asarray(sx.opensimplex2(perm,
                                      jnp.asarray(pts[:, 0], jnp.float32),
                                      jnp.asarray(pts[:, 1], jnp.float32)))
    err = np.abs(vals - g["vals"])
    assert np.median(err) < 1e-6
    assert (err < 1e-4).mean() > 0.99, f"max err {err.max()}"


def test_octave2_field_matches_reference(golden):
    """fractal2 vs the reference's rand_2d_octaves (simplex.py:56-73)."""
    g = golden("golden_noise2.npz")
    perm = jnp.asarray(g["perm"], jnp.int32)
    field = sx.fractal2(perm, (16, 16), octaves=4, persistence=0.8,
                        frequency=8.0)
    err = np.abs(np.asarray(field) - g["field"])
    assert np.median(err) < 1e-5
    assert (err < 1e-3).mean() > 0.99, f"max err {err.max()}"


def test_hash2_statistics_match_table2():
    perm, _ = sx.perm_tables_from_seed(3)
    pts = np.random.default_rng(5).uniform(-30, 30, size=(4000, 2)).astype(np.float32)
    table_vals = np.asarray(sx.opensimplex2(
        jnp.asarray(perm), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    hash_vals = np.asarray(sx.opensimplex2_hash(
        jnp.uint32(123), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    assert abs(table_vals.mean()) < 0.02 and abs(hash_vals.mean()) < 0.02
    assert 0.7 < hash_vals.std() / table_vals.std() < 1.3
    assert np.abs(hash_vals).max() <= 1.0 + 1e-5


def test_batched_fractal2_independent_fields():
    # frequency 4 -> ~16x16 lattice cells: enough degrees of freedom for a
    # meaningful sample correlation between fields
    fields = np.asarray(sx.batched_fractal2(jax.random.key(0), (64, 64),
                                            n_fields=3, octaves=4,
                                            persistence=0.8, frequency=4.0))
    assert fields.shape == (3, 64, 64)
    c = np.corrcoef(fields[0].ravel(), fields[1].ravel())[0, 1]
    assert abs(c) < 0.2
    assert np.isfinite(fields).all()


def test_simplex2d_noise_sampler():
    from anoddpm_tpu.ops.noise import make_noise_sampler
    sampler = make_noise_sampler("simplex_2d", octaves=4, frequency=8.0)
    out = np.asarray(sampler(jax.random.key(1), (2, 32, 32, 1),
                             jnp.array([5, 9])))
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(out).all()
    assert abs(out.mean()) < 0.2


def test_batched_table_fields_match_per_field_kernel():
    """batched_fractal3_fixed_t_table == per-field eager fractal3_fixed_t on
    the same key-derived tables, except isolated lattice-boundary pixels
    where jit-level FMA fusion flips a floor() (measured <0.3% of pixels —
    the same boundary sensitivity any fp32 port of the fp64 reference
    kernel has; distribution-irrelevant)."""
    key = jax.random.key(11)
    n = 4
    # frequency 8 on a 64x64 window = 8x8 lattice cells, so a boundary flip
    # contaminates ~1 cell = ~1.5% of pixels at most (at the production
    # frequency 64 a 32x32 window is HALF a cell and one flip can cover it).
    out = sx.batched_fractal3_fixed_t_table(key, (64, 64), jnp.float32(5.0),
                                            n_fields=n, octaves=2,
                                            frequency=8.0)
    keys = jax.random.split(key, n)
    for i in range(n):
        perm, gid = sx.perm_tables_from_key(keys[i])
        ref = sx.fractal3_fixed_t(perm, gid, (64, 64), jnp.float32(5.0),
                                  octaves=2, frequency=8.0)
        d = np.abs(np.asarray(out[i]) - np.asarray(ref))
        assert np.median(d) < 1e-6
        assert (d > 1e-4).mean() < 0.05
    # fields are mutually independent (fresh table per field)
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-3


def test_table_noise_sampler_and_fingerprint():
    """simplex_noise(table=True) rides the perm-table kernel; the flag is
    part of the sampler fingerprint so the detection program cache never
    conflates hash- and table-noise programs."""
    from anoddpm_tpu.ops.noise import make_noise_sampler, sampler_from_args
    s_t = make_noise_sampler("simplex", table=True)
    s_h = make_noise_sampler("simplex")
    assert s_t.fingerprint != s_h.fingerprint
    out = np.asarray(s_t(jax.random.key(2), (2, 16, 16, 1),
                         jnp.array([5, 9])))
    assert out.shape == (2, 16, 16, 1) and np.isfinite(out).all()
    # share_batch parity mode composes with the table path
    out_sb = np.asarray(make_noise_sampler("simplex", table=True,
                                           share_batch=True)(
        jax.random.key(3), (2, 16, 16, 1), jnp.array([5, 5])))
    np.testing.assert_array_equal(out_sb[0], out_sb[1])
    # config-level wiring: simplex_table reaches the fingerprint
    s_cfg = sampler_from_args({"noise_fn": "simplex", "simplex_table": True})
    assert s_cfg.fingerprint[-1] is True

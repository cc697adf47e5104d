"""Native C++ simplex kernel: builds via g++, matches the reference goldens
bit-for-bit on the perm table and to float64 precision on noise values, and
cross-validates the JAX table path."""
import numpy as np
import pytest

native = pytest.importorskip("anoddpm_tpu.ops.native")


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()


@pytest.mark.parametrize("seed", [3, 12345, -9876543210, 9999999999])
def test_native_perm_matches_golden(golden, seed):
    g = golden(f"golden_perm_{seed}.npz")
    perm, grad_id = native.init_perm(seed)
    np.testing.assert_array_equal(perm, g["perm"])
    np.testing.assert_array_equal(grad_id * 3, g["perm_grad_index3"])


def test_native_noise3_matches_golden(golden):
    g = golden("golden_noise3.npz")
    perm = g["perm"].astype(np.int32)
    gid = (g["pgi"] // 3).astype(np.int32)
    vals = native.noise3_batch(g["pts"][:, 0], g["pts"][:, 1], g["pts"][:, 2],
                               perm, gid)
    # both are float64 implementations of the same algorithm
    np.testing.assert_allclose(vals, g["vals"], atol=1e-12)


def test_native_octave_field_matches_golden(golden):
    g = golden("golden_octave_field.npz")
    perm = g["perm"].astype(np.int32)
    gid = (g["pgi"] // 3).astype(np.int32)
    field = native.fractal_fixed_t((16, 24), 7.0, octaves=4, persistence=0.8,
                                   frequency=8.0, perm=perm, grad_id=gid)
    np.testing.assert_allclose(field, g["field"][0], atol=1e-12)


def test_native_oracle_vs_jax_volume_mixer():
    """`fractal3_volume` (rand_3d_octaves, simplex.py:37-54) vs the C++
    float64 oracle: mix octaves over the full (Z, H, W) grid in NumPy from
    oracle noise3 values and compare to the JAX table path."""
    import jax.numpy as jnp
    from anoddpm_tpu.ops import simplex as sx
    perm, gid = native.init_perm(31337)
    Z, H, W = 4, 10, 12
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(H), np.arange(W),
                             indexing="ij")
    ref = np.zeros((Z, H, W))
    amplitude, frequency = 1.0, 8.0
    for _ in range(3):
        vals = native.noise3_batch(xx.ravel() / frequency,
                                   yy.ravel() / frequency,
                                   zz.ravel() / frequency, perm, gid)
        ref += amplitude * vals.reshape(Z, H, W)
        frequency /= 2.0
        amplitude *= 0.6
    vol = np.asarray(sx.fractal3_volume(jnp.asarray(perm), jnp.asarray(gid),
                                        (Z, H, W), octaves=3,
                                        persistence=0.6, frequency=8.0))
    err = np.abs(vol - ref)
    assert np.median(err) < 1e-5
    assert (err < 1e-3).mean() > 0.99, f"max err {err.max()}"


def test_native_vs_jax_table_path():
    import jax.numpy as jnp
    from anoddpm_tpu.ops import simplex as sx
    perm, gid = native.init_perm(424242)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-20, 20, size=(300, 3))
    cpp = native.noise3_batch(pts[:, 0], pts[:, 1], pts[:, 2], perm, gid)
    jx = np.asarray(sx.opensimplex3(
        jnp.asarray(perm), jnp.asarray(gid),
        jnp.asarray(pts[:, 0], jnp.float32), jnp.asarray(pts[:, 1], jnp.float32),
        jnp.asarray(pts[:, 2], jnp.float32)))
    err = np.abs(cpp - jx)
    assert np.median(err) < 1e-6
    assert (err < 1e-4).mean() > 0.99

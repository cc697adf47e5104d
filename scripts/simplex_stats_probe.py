"""Round-5 parity forensics: do the table-exact (reference-equivalent) and
hash (framework production) simplex paths produce the same FIELD DISTRIBUTION
at the parity-cell operating point (32x32, octave 6, persistence 0.8,
frequency 64, t in [0, 800))?

The p32s8 aggregate shows a consistent trained-level gap (fw AUC .589 vs ref
.437, 3 seeds each, no overlap) even though the reverse chain on fixed noise
is function-equivalent (map corr 0.9999999994).  The two sides differ in
exactly one component: the gradient-selection scheme of the simplex field
(LCG perm table vs lattice hash).  This probe measures both distributions.

usage: JAX_PLATFORMS=cpu python scripts/simplex_stats_probe.py [n] [hw]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from anoddpm_tpu.ops import simplex as sx

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 32
OCT, PERS, FREQ = 6, 0.8, 64.0


def table_fields(n, hw, ts, seed0=1234):
    """Reference-equivalent: fresh LCG perm table per field (newSeed)."""
    rng = np.random.RandomState(seed0)
    fn = jax.jit(lambda perm, gid, t: sx.fractal3_fixed_t(
        perm, gid, (hw, hw), t, octaves=OCT, persistence=PERS,
        frequency=FREQ))
    out = np.empty((n, hw, hw), np.float32)
    for i in range(n):
        seed = int(rng.randint(-10_000_000_000, 10_000_000_000))
        perm, gid = sx.perm_tables_from_seed(seed)
        out[i] = np.asarray(fn(jnp.asarray(perm, jnp.int32),
                               jnp.asarray(gid, jnp.int32),
                               jnp.float32(ts[i])))
    return out


def hash_fields(n, hw, ts, seed0=1234):
    """Framework production path: lattice-hash gradients."""
    key = jax.random.PRNGKey(seed0)
    out = sx.batched_fractal3_fixed_t(key, (hw, hw), jnp.asarray(ts, jnp.float32),
                                      n_fields=n, octaves=OCT,
                                      persistence=PERS, frequency=FREQ)
    return np.asarray(out, np.float32)


def stats(fields, ts):
    f = fields.reshape(len(fields), -1)
    per_mean = f.mean(axis=1)            # per-field DC offset
    per_std = f.std(axis=1)              # per-field spatial contrast
    pooled = f.ravel()
    # spatial spectrum: radial energy of the mean power spectrum
    F = np.fft.fftshift(np.abs(np.fft.fft2(fields - fields.mean(axis=(1, 2),
                                                                keepdims=True))) ** 2,
                        axes=(1, 2)).mean(axis=0)
    h = fields.shape[1]
    yy, xx = np.mgrid[0:h, 0:h]
    r = np.hypot(yy - h // 2, xx - h // 2).astype(int)
    radial = np.bincount(r.ravel(), F.ravel()) / np.maximum(
        np.bincount(r.ravel()), 1)
    return {
        "pooled_mean": float(pooled.mean()), "pooled_std": float(pooled.std()),
        "pooled_min": float(pooled.min()), "pooled_max": float(pooled.max()),
        "field_mean_std": float(per_mean.std()),   # spread of DC offsets
        "field_std_mean": float(per_std.mean()),   # avg spatial contrast
        "field_std_std": float(per_std.std()),
        "abs_mean": float(np.abs(pooled).mean()),
        "q01": float(np.quantile(pooled, .01)), "q99": float(np.quantile(pooled, .99)),
        "radial_0_3": [float(x) for x in radial[:4]],
        "radial_4_8": [float(x) for x in radial[4:9]],
    }


def main():
    rng = np.random.RandomState(7)
    ts = rng.randint(0, 800, size=N).astype(np.float32)
    tab = table_fields(N, HW, ts)
    hsh = hash_fields(N, HW, ts)
    res = {"n": N, "hw": HW, "table": stats(tab, ts), "hash": stats(hsh, ts)}
    print(json.dumps(res, indent=1))
    with open("results/simplex_stats_probe.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

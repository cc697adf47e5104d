"""On-device, fully-vectorised OpenSimplex noise.

The reference generates simplex noise on the host CPU with scalar Numba
kernels and ships it to the accelerator every diffusion step (reference:
simplex.py:321-830 `_noise3`, GaussianDiffusion.py:96-137) — its single
biggest performance bottleneck.  This module replaces that with a branchless,
batched JAX implementation that runs on TPU inside the jitted training /
sampling step.

Design notes (how ~500 lines of data-dependent branching become vector math):

OpenSimplex3 evaluates, per point, radial-falloff gradient contributions from
a small set of lattice vertices.  For every vertex the displacement has the
canonical form

    d = d0 - offset - SQUISH3 * (ox + oy + oz)

where (ox, oy, oz) are the vertex's integer lattice offsets relative to the
super-cell origin.  The reference's control flow only ever decides *which*
vertices contribute:

- the 8 cube corners, gated purely by the region of `in_sum` (the sum of the
  stretched in-cell coordinates): corners with coordinate-sum s are active
  when  s==0: in_sum<=1;  s in {1,2}: s-matching region or the middle
  octahedron;  s==3: in_sum>=2;
- two "extra" vertices whose offsets are piecewise-constant integer functions
  of the in-cell coordinates.

Both parts vectorise into `jnp.where` chains; the per-vertex attenuation test
(attn > 0) is a mask instead of a branch.  Gradient lookup is a 3-level
gather through a 256-entry permutation table.

Two permutation-table sources are provided:

- `perm_tables_from_key`: `jax.random.permutation` on device — the idiomatic,
  keyed, deterministic path (statistically identical to the reference's
  freshly-seeded table per call, simplex.py:19-23);
- `perm_tables_from_seed`: bit-exact port of the reference's int64-LCG
  Fisher-Yates init (simplex.py:174-192) for golden-value parity tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

STRETCH3 = -1.0 / 6.0  # (1/sqrt(3+1)-1)/3
SQUISH3 = 1.0 / 3.0    # (sqrt(3+1)-1)/3
NORM3 = 103.0

STRETCH2 = -0.211324865405187
SQUISH2 = 0.366025403784439
NORM2 = 47.0

# 24 gradient directions, approximating directions to the vertices of a
# rhombicuboctahedron (public OpenSimplex constants), stored as a (24, 3)
# table; the reference stores the same values flat (simplex.py:116-127).
GRADIENTS3 = np.array([
    [-11, 4, 4], [-4, 11, 4], [-4, 4, 11],
    [11, 4, 4], [4, 11, 4], [4, 4, 11],
    [-11, -4, 4], [-4, -11, 4], [-4, -4, 11],
    [11, -4, 4], [4, -11, 4], [4, -4, 11],
    [-11, 4, -4], [-4, 11, -4], [-4, 4, -11],
    [11, 4, -4], [4, 11, -4], [4, 4, -11],
    [-11, -4, -4], [-4, -11, -4], [-4, -4, -11],
    [11, -4, -4], [4, -11, -4], [4, -4, -11],
], dtype=np.float32)

# 8 gradient directions for 2D (vertices of an octagon), (8, 2).
GRADIENTS2 = np.array([
    [5, 2], [2, 5], [-5, 2], [-2, 5],
    [5, -2], [2, -5], [-5, -2], [-2, -5],
], dtype=np.float32)

_INT64_MASK = (1 << 64) - 1


def _lcg_next(seed: int) -> int:
    """One step of the reference's 64-bit LCG with c_int64 wraparound
    semantics (simplex.py:166-171, :181-185)."""
    seed = (seed * 6364136223846793005 + 1442695040888963407) & _INT64_MASK
    if seed >= 1 << 63:
        seed -= 1 << 64
    return seed


def perm_tables_from_seed(seed: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Bit-exact permutation-table init matching the reference LCG
    Fisher-Yates (simplex.py:174-192).

    Returns (perm, grad_id3): perm is a permutation of 0..255; grad_id3 is
    perm % 24 (the reference stores (perm % 24) * 3 as a flat-table byte
    offset; we index a (24, 3) table instead).
    """
    perm = np.zeros(256, dtype=np.int32)
    source = np.arange(256)
    for _ in range(3):
        seed = _lcg_next(seed)
    for i in range(255, -1, -1):
        seed = _lcg_next(seed)
        r = int((seed + 31) % (i + 1))  # Python % is already non-negative
        perm[i] = source[r]
        source[r] = source[i]
    return perm, (perm % 24).astype(np.int32)


def perm_tables_from_key(key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Keyed on-device permutation table (replaces per-call `newSeed()`,
    simplex.py:19-23, with a counter-based deterministic source)."""
    perm = jax.random.permutation(key, 256).astype(jnp.int32)
    return perm, perm % 24


def _ext_offsets_region1(xins, yins, zins, in_sum):
    """Extra-vertex offsets for the (0,0,0)-tetrahedron region
    (reference branch: simplex.py:354-435)."""
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    a_pt, a_sc = i32(1), xins
    b_pt, b_sc = i32(2), yins
    cond_b = (xins >= yins) & (zins > yins)
    b_pt = jnp.where(cond_b, 4, b_pt)
    b_sc = jnp.where(cond_b, zins, b_sc)
    cond_a = (~cond_b) & (xins < yins) & (zins > xins)
    a_pt = jnp.where(cond_a, 4, a_pt)
    a_sc = jnp.where(cond_a, zins, a_sc)

    wins = 1.0 - in_sum
    case_a = (wins > a_sc) | (wins > b_sc)  # (0,0,0) among the two closest

    c_a = jnp.where(b_sc > a_sc, b_pt, a_pt)  # single-bit point
    cx = (c_a & 1) != 0
    cy = (c_a & 2) != 0
    cz = (c_a & 4) != 0
    # case A offsets
    ax0 = jnp.where(cx, 1, -1)
    ax1 = jnp.where(cx, 1, 0)
    ay0 = jnp.where(cy, 1, jnp.where(cx, -1, 0))
    ay1 = jnp.where(cy, 1, jnp.where(cx, 0, -1))
    az0 = jnp.where(cz, 1, 0)
    az1 = jnp.where(cz, 1, -1)

    c_b = a_pt | b_pt  # two-bit point
    bx = (c_b & 1) != 0
    by = (c_b & 2) != 0
    bz = (c_b & 4) != 0
    bx0 = jnp.where(bx, 1, 0)
    bx1 = jnp.where(bx, 1, -1)
    by0 = jnp.where(by, 1, 0)
    by1 = jnp.where(by, 1, -1)
    bz0 = jnp.where(bz, 1, 0)
    bz1 = jnp.where(bz, 1, -1)

    pick = lambda a, b: jnp.where(case_a, a, b).astype(jnp.int32)
    return (pick(ax0, bx0), pick(ay0, by0), pick(az0, bz0),
            pick(ax1, bx1), pick(ay1, by1), pick(az1, bz1))


def _ext_offsets_region2(xins, yins, zins, in_sum):
    """Extra-vertex offsets for the (1,1,1)-tetrahedron region
    (reference branch: simplex.py:469-550)."""
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    a_pt, a_sc = i32(6), xins
    b_pt, b_sc = i32(5), yins
    cond_b = (xins <= yins) & (zins < yins)
    b_pt = jnp.where(cond_b, 3, b_pt)
    b_sc = jnp.where(cond_b, zins, b_sc)
    cond_a = (~cond_b) & (xins > yins) & (zins < xins)
    a_pt = jnp.where(cond_a, 3, a_pt)
    a_sc = jnp.where(cond_a, zins, a_sc)

    wins = 3.0 - in_sum
    case_a = (wins < a_sc) | (wins < b_sc)  # (1,1,1) among the two closest

    c_a = jnp.where(b_sc < a_sc, b_pt, a_pt)  # two-bit point
    cx = (c_a & 1) != 0
    cy = (c_a & 2) != 0
    cz = (c_a & 4) != 0
    ax0 = jnp.where(cx, 2, 0)
    ax1 = jnp.where(cx, 1, 0)
    ay0 = jnp.where(cy, jnp.where(cx, 1, 2), 0)
    ay1 = jnp.where(cy, jnp.where(cx, 2, 1), 0)
    az0 = jnp.where(cz, 1, 0)
    az1 = jnp.where(cz, 2, 0)

    c_b = a_pt & b_pt  # single-bit point
    bx = (c_b & 1) != 0
    by = (c_b & 2) != 0
    bz = (c_b & 4) != 0
    bx0 = jnp.where(bx, 1, 0)
    bx1 = jnp.where(bx, 2, 0)
    by0 = jnp.where(by, 1, 0)
    by1 = jnp.where(by, 2, 0)
    bz0 = jnp.where(bz, 1, 0)
    bz1 = jnp.where(bz, 2, 0)

    pick = lambda a, b: jnp.where(case_a, a, b).astype(jnp.int32)
    return (pick(ax0, bx0), pick(ay0, by0), pick(az0, bz0),
            pick(ax1, bx1), pick(ay1, by1), pick(az1, bz1))


def _ext_offsets_region3(xins, yins, zins):
    """Extra-vertex offsets for the middle octahedron region
    (reference branch: simplex.py:587-744)."""
    p1 = xins + yins
    a_fs = p1 > 1.0
    a_sc = jnp.where(a_fs, p1 - 1.0, 1.0 - p1)
    a_pt = jnp.where(a_fs, 3, 4)

    p2 = xins + zins
    b_fs = p2 > 1.0
    b_sc = jnp.where(b_fs, p2 - 1.0, 1.0 - p2)
    b_pt = jnp.where(b_fs, 5, 2)

    p3 = yins + zins
    far = p3 > 1.0
    score = jnp.where(far, p3 - 1.0, 1.0 - p3)
    repl_a = (a_sc <= b_sc) & (a_sc < score)
    repl_b = (~repl_a) & (a_sc > b_sc) & (b_sc < score)
    a_pt = jnp.where(repl_a, jnp.where(far, 6, 1), a_pt)
    # boolean select as logical ops (Mosaic cannot select between i1 vectors)
    a_fs = (repl_a & far) | (~repl_a & a_fs)
    b_pt = jnp.where(repl_b, jnp.where(far, 6, 1), b_pt)
    b_fs = (repl_b & far) | (~repl_b & b_fs)

    same_side = a_fs == b_fs

    # both on the (1,1,1) side: ext0 = (1,1,1), ext1 = 2 along the shared axis
    c_and = a_pt & b_pt
    fx0, fy0, fz0 = 1, 1, 1
    fx1 = jnp.where((c_and & 1) != 0, 2, 0)
    fy1 = jnp.where(((c_and & 1) == 0) & ((c_and & 2) != 0), 2, 0)
    fz1 = jnp.where(((c_and & 1) == 0) & ((c_and & 2) == 0), 2, 0)

    # both on the (0,0,0) side: ext0 = (0,0,0), ext1 = permutation of (1,1,-1)
    # with -1 along the omitted axis
    c_or = a_pt | b_pt
    nx0, ny0, nz0 = 0, 0, 0
    miss_x = (c_or & 1) == 0
    miss_y = (~miss_x) & ((c_or & 2) == 0)
    miss_z = (~miss_x) & (~miss_y)
    nx1 = jnp.where(miss_x, -1, 1)
    ny1 = jnp.where(miss_y, -1, 1)
    nz1 = jnp.where(miss_z, -1, 1)

    sx0 = jnp.where(a_fs, fx0, nx0)
    sy0 = jnp.where(a_fs, fy0, ny0)
    sz0 = jnp.where(a_fs, fz0, nz0)
    sx1 = jnp.where(a_fs, fx1, nx1)
    sy1 = jnp.where(a_fs, fy1, ny1)
    sz1 = jnp.where(a_fs, fz1, nz1)

    # mixed sides: c1 = the further-side point, c2 = the closer-side point
    c1 = jnp.where(a_fs, a_pt, b_pt)
    c2 = jnp.where(a_fs, b_pt, a_pt)
    m1x = (c1 & 1) == 0
    m1y = (~m1x) & ((c1 & 2) == 0)
    m1z = (~m1x) & (~m1y)
    mx0 = jnp.where(m1x, -1, 1)
    my0 = jnp.where(m1y, -1, 1)
    mz0 = jnp.where(m1z, -1, 1)
    mx1 = jnp.where((c2 & 1) != 0, 2, 0)
    my1 = jnp.where(((c2 & 1) == 0) & ((c2 & 2) != 0), 2, 0)
    mz1 = jnp.where(((c2 & 1) == 0) & ((c2 & 2) == 0), 2, 0)

    pick = lambda s, m: jnp.where(same_side, s, m).astype(jnp.int32)
    return (pick(sx0, mx0), pick(sy0, my0), pick(sz0, mz0),
            pick(sx1, mx1), pick(sy1, my1), pick(sz1, mz1))


# The 8 cube corners and their region-activation class:
# sum==0 -> only region 1; sum==3 -> only region 2;
# sum==1 -> regions 1 and 3; sum==2 -> regions 2 and 3.
_CORNERS = [(ox, oy, oz) for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)]


def _hash_grad_id(seed: jax.Array, xi: jax.Array, yi: jax.Array,
                  zi: jax.Array) -> jax.Array:
    """Counter-based lattice hash -> gradient id in [0, 24).

    TPU-native replacement for the 3-level permutation-table gather chain
    (reference: simplex.py:203-208): table gathers lower poorly on TPU
    (verified ~160 ms per 256^2 field), while this murmur3-style integer mix
    is pure VPU arithmetic.  Statistically equivalent — both are just
    deterministic hashes of (lattice point, seed) onto 24 gradients; the
    exact-table path below remains for bit-parity with the reference.
    """
    h = (xi.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
         ^ yi.astype(jnp.uint32) * jnp.uint32(0xD8163841)
         ^ zi.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F)
         ^ seed.astype(jnp.uint32))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(24)).astype(jnp.int32)


def _grad_components(gid: jax.Array, dtype) -> tuple:
    """Gradient vector from its id by ARITHMETIC, no table: the 24
    OpenSimplex gradients are the sign patterns of permutations of
    (+-11, +-4, +-4) — row r has magnitude 11 on axis r%3 with sign pattern
    r//3 (bit0 -> +x, bit1 -> -y, bit2 -> -z of the table layout)."""
    m = gid % 3
    q = gid // 3
    sx = jnp.where((q & 1) != 0, 1.0, -1.0).astype(dtype)
    sy = jnp.where((q & 2) != 0, -1.0, 1.0).astype(dtype)
    sz = jnp.where((q & 4) != 0, -1.0, 1.0).astype(dtype)
    gx = sx * jnp.where(m == 0, 11.0, 4.0).astype(dtype)
    gy = sy * jnp.where(m == 1, 11.0, 4.0).astype(dtype)
    gz = sz * jnp.where(m == 2, 11.0, 4.0).astype(dtype)
    return gx, gy, gz


def _opensimplex3_core(extrapolate, x: jax.Array, y: jax.Array,
                       z: jax.Array) -> jax.Array:
    """Region/vertex logic shared by the table-exact and hash paths.

    `extrapolate(xsv, ysv, zsv, dx, dy, dz)` returns the gradient dot
    product for absolute lattice coords (xsv, ysv, zsv).
    """
    dtype = x.dtype

    stretch = (x + y + z) * STRETCH3
    xs, ys, zs = x + stretch, y + stretch, z + stretch
    xsb_f, ysb_f, zsb_f = jnp.floor(xs), jnp.floor(ys), jnp.floor(zs)
    xsb = xsb_f.astype(jnp.int32)
    ysb = ysb_f.astype(jnp.int32)
    zsb = zsb_f.astype(jnp.int32)

    xins, yins, zins = xs - xsb_f, ys - ysb_f, zs - zsb_f
    in_sum = xins + yins + zins

    squish = (xsb_f + ysb_f + zsb_f) * SQUISH3
    dx0 = x - (xsb_f + squish)
    dy0 = y - (ysb_f + squish)
    dz0 = z - (zsb_f + squish)

    region1 = in_sum <= 1.0
    region2 = in_sum >= 2.0
    region3 = (~region1) & (~region2)

    def contrib(ox, oy, oz, active=None):
        osum = ox + oy + oz
        if isinstance(osum, int):
            sq = SQUISH3 * osum
        else:
            sq = SQUISH3 * osum.astype(dtype)
        dx = dx0 - ox - sq
        dy = dy0 - oy - sq
        dz = dz0 - oz - sq
        attn = 2.0 - dx * dx - dy * dy - dz * dz
        dot = extrapolate(xsb + ox, ysb + oy, zsb + oz, dx, dy, dz)
        attn = jnp.maximum(attn, 0.0)
        if active is not None:
            attn = jnp.where(active, attn, 0.0)
        a2 = attn * attn
        return a2 * a2 * dot

    value = jnp.zeros_like(x)
    for ox, oy, oz in _CORNERS:
        s = ox + oy + oz
        if s == 0:
            active = region1
        elif s == 1:
            active = region1 | region3
        elif s == 2:
            active = region2 | region3
        else:
            active = region2
        value = value + contrib(ox, oy, oz, active)

    e1 = _ext_offsets_region1(xins, yins, zins, in_sum)
    e2 = _ext_offsets_region2(xins, yins, zins, in_sum)
    e3 = _ext_offsets_region3(xins, yins, zins)
    sel = lambda i: jnp.where(region1, e1[i], jnp.where(region2, e2[i], e3[i]))
    ex0, ey0, ez0 = sel(0), sel(1), sel(2)
    ex1, ey1, ez1 = sel(3), sel(4), sel(5)
    value = value + contrib(ex0, ey0, ez0) + contrib(ex1, ey1, ez1)

    return value / NORM3


def opensimplex3(perm: jax.Array, grad_id3: jax.Array,
                 x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Table-exact OpenSimplex 3D noise, elementwise over broadcasted x/y/z.

    Semantics match the reference scalar kernel (simplex.py:321-830)
    evaluated pointwise, including its NORM_CONSTANT3 scaling.  Uses the
    3-level permutation gather chain — keep for parity tests; prefer
    `opensimplex3_hash` on TPU hot paths.
    """
    x, y, z = jnp.broadcast_arrays(x, y, z)
    grads = jnp.asarray(GRADIENTS3, dtype=x.dtype)

    def extrapolate(xsv, ysv, zsv, dx, dy, dz):
        i1 = perm[xsv & 0xFF]
        i2 = perm[(i1 + ysv) & 0xFF]
        gid = grad_id3[(i2 + zsv) & 0xFF]
        g = grads[gid]
        return g[..., 0] * dx + g[..., 1] * dy + g[..., 2] * dz

    return _opensimplex3_core(extrapolate, x, y, z)


def opensimplex3_hash(seed: jax.Array, x: jax.Array, y: jax.Array,
                      z: jax.Array) -> jax.Array:
    """Gather-free OpenSimplex 3D noise: same cell walk, gradient chosen by
    a counter-based lattice hash and reconstructed arithmetically.  The TPU
    hot path (pure VPU ops, no tables)."""
    x, y, z = jnp.broadcast_arrays(x, y, z)
    dtype = x.dtype
    seed = jnp.asarray(seed)

    def extrapolate(xsv, ysv, zsv, dx, dy, dz):
        gid = _hash_grad_id(seed, xsv, ysv, zsv)
        gx, gy, gz = _grad_components(gid, dtype)
        return gx * dx + gy * dy + gz * dz

    return _opensimplex3_core(extrapolate, x, y, z)


def _opensimplex2_core(extrapolate, x: jax.Array, y: jax.Array) -> jax.Array:
    """Branchless 2D OpenSimplex cell walk (reference scalar kernel:
    simplex.py:211-309 `_noise2`).

    2D is simpler than 3D: two always-active vertices (1,0)/(0,1), one
    centre vertex ((0,0) or (1,1) by region), and one extra vertex whose
    offsets are a piecewise-constant function of the in-cell coordinates —
    all four evaluated unconditionally with the attenuation mask replacing
    the reference's `if attn > 0` branches.
    """
    dtype = x.dtype
    two_sq = 2.0 * SQUISH2

    stretch = (x + y) * STRETCH2
    xs, ys = x + stretch, y + stretch
    xsb_f, ysb_f = jnp.floor(xs), jnp.floor(ys)
    xsb = xsb_f.astype(jnp.int32)
    ysb = ysb_f.astype(jnp.int32)

    xins, yins = xs - xsb_f, ys - ysb_f
    in_sum = xins + yins

    squish = (xsb_f + ysb_f) * SQUISH2
    dx0 = x - (xsb_f + squish)
    dy0 = y - (ysb_f + squish)

    def contrib(dx, dy, xsv, ysv):
        attn = jnp.maximum(2.0 - dx * dx - dy * dy, 0.0)
        a2 = attn * attn
        return a2 * a2 * extrapolate(xsv, ysv, dx, dy)

    # (1,0) and (0,1) contribute in every region
    value = contrib(dx0 - 1.0 - SQUISH2, dy0 - SQUISH2, xsb + 1, ysb)
    value = value + contrib(dx0 - SQUISH2, dy0 - 1.0 - SQUISH2, xsb, ysb + 1)

    region1 = in_sum <= 1.0          # inside the (0,0) 2-simplex
    xgty = xins > yins

    # extra vertex, (0,0)-region: (±1, ∓1) when (0,0) is among the two
    # closest vertices, else (1,1)
    zins1 = 1.0 - in_sum
    near0 = (zins1 > xins) | (zins1 > yins)
    ex1 = jnp.where(near0, jnp.where(xgty, xsb + 1, xsb - 1), xsb + 1)
    ey1 = jnp.where(near0, jnp.where(xgty, ysb - 1, ysb + 1), ysb + 1)
    edx1 = jnp.where(near0, jnp.where(xgty, dx0 - 1.0, dx0 + 1.0),
                     dx0 - 1.0 - two_sq)
    edy1 = jnp.where(near0, jnp.where(xgty, dy0 + 1.0, dy0 - 1.0),
                     dy0 - 1.0 - two_sq)

    # extra vertex, (1,1)-region: (2,0)/(0,2) when (0,0) is among the two
    # closest, else (0,0) itself
    zins2 = 2.0 - in_sum
    far0 = (zins2 < xins) | (zins2 < yins)
    ex2 = jnp.where(far0, jnp.where(xgty, xsb + 2, xsb), xsb)
    ey2 = jnp.where(far0, jnp.where(xgty, ysb, ysb + 2), ysb)
    edx2 = jnp.where(far0, jnp.where(xgty, dx0 - 2.0 - two_sq, dx0 - two_sq),
                     dx0)
    edy2 = jnp.where(far0, jnp.where(xgty, dy0 - two_sq, dy0 - 2.0 - two_sq),
                     dy0)

    # centre vertex: (0,0) in region 1, (1,1) in region 2
    cxs = jnp.where(region1, xsb, xsb + 1)
    cys = jnp.where(region1, ysb, ysb + 1)
    cdx = jnp.where(region1, dx0, dx0 - 1.0 - two_sq).astype(dtype)
    cdy = jnp.where(region1, dy0, dy0 - 1.0 - two_sq).astype(dtype)
    value = value + contrib(cdx, cdy, cxs, cys)

    exs = jnp.where(region1, ex1, ex2)
    eys = jnp.where(region1, ey1, ey2)
    edx = jnp.where(region1, edx1, edx2).astype(dtype)
    edy = jnp.where(region1, edy1, edy2).astype(dtype)
    value = value + contrib(edx, edy, exs, eys)

    return value / NORM2


def opensimplex2(perm: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Table-exact OpenSimplex 2D noise, elementwise over broadcasted x/y.

    Gradient selection matches the reference's `_extrapolate2`
    (simplex.py:196-200): the flat-table byte offset `perm[...] & 0x0E`
    becomes an index into the (8, 2) GRADIENTS2 table.
    """
    x, y = jnp.broadcast_arrays(x, y)
    grads = jnp.asarray(GRADIENTS2, dtype=x.dtype)

    def extrapolate(xsv, ysv, dx, dy):
        gid = (perm[(perm[xsv & 0xFF] + ysv) & 0xFF] & 0x0E) >> 1
        g = grads[gid]
        return g[..., 0] * dx + g[..., 1] * dy

    return _opensimplex2_core(extrapolate, x, y)


def _grad_components2(gid: jax.Array, dtype) -> tuple:
    """2D gradient from its id by arithmetic: the 8 octagon gradients are
    sign patterns of (±5, ±2)/(±2, ±5) — row r has magnitudes (5,2) when r
    is even, signs from bits 1 and 2."""
    even = (gid & 1) == 0
    gx = jnp.where(even, 5.0, 2.0).astype(dtype)
    gy = jnp.where(even, 2.0, 5.0).astype(dtype)
    gx = gx * jnp.where((gid & 2) != 0, -1.0, 1.0).astype(dtype)
    gy = gy * jnp.where((gid & 4) != 0, -1.0, 1.0).astype(dtype)
    return gx, gy


def opensimplex2_hash(seed: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Gather-free OpenSimplex 2D noise (the TPU hot path): same cell walk,
    gradient from a counter-based lattice hash — 2D analogue of
    `opensimplex3_hash`."""
    x, y = jnp.broadcast_arrays(x, y)
    dtype = x.dtype
    seed = jnp.asarray(seed)

    def extrapolate(xsv, ysv, dx, dy):
        h = (xsv.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
             ^ ysv.astype(jnp.uint32) * jnp.uint32(0xD8163841)
             ^ seed.astype(jnp.uint32))
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        gid = (h & jnp.uint32(7)).astype(jnp.int32)
        gx, gy = _grad_components2(gid, dtype)
        return gx * dx + gy * dy

    return _opensimplex2_core(extrapolate, x, y)


def fractal2(perm: jax.Array, shape_hw: Tuple[int, int], octaves: int = 1,
             persistence: float = 0.5, frequency: float = 32.0,
             dtype=jnp.float32) -> jax.Array:
    """Multi-octave 2D field — `rand_2d_octaves` semantics
    (simplex.py:56-73): field[h, w] = sum_o persistence^o *
    noise2(w * 2^o / freq, h * 2^o / freq).

    (The reference's `_noise2a` flattens with a y-size stride, so its 2D
    mixer is only self-consistent for square shapes; this version indexes
    correctly for any (H, W).)
    """
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    out = jnp.zeros((h, w), dtype)
    amplitude = 1.0
    scale = 1.0 / frequency
    for _ in range(int(octaves)):
        out = out + amplitude * opensimplex2(perm, xx * scale, yy * scale)
        scale = scale * 2.0
        amplitude = amplitude * persistence
    return out


@functools.partial(jax.jit, static_argnames=("shape_hw", "octaves", "n_fields"))
def batched_fractal2(key: jax.Array, shape_hw: Tuple[int, int],
                     n_fields: int, octaves: int = 6,
                     persistence: float = 0.8, frequency: float = 64.0):
    """n_fields independent 2D octave fields (hash path, one fresh seed
    each): returns (n, H, W) — the 2D counterpart of
    `batched_fractal3_fixed_t` for t-independent corruption fields."""
    seeds = seeds_from_key(key, n_fields)
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(jnp.float32, (n_fields, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (n_fields, h, w), 2)
    seed = seeds[:, None, None]

    def body(o, acc):
        of = o.astype(jnp.float32)
        scale = (2.0 ** of) / frequency
        amp = persistence ** of
        return acc + amp * opensimplex2_hash(seed, xx * scale, yy * scale)

    return jax.lax.fori_loop(0, int(octaves), body,
                             jnp.zeros((n_fields, h, w), jnp.float32))


def fractal3_fixed_t(perm: jax.Array, grad_id3: jax.Array, shape_hw: Tuple[int, int],
                     t, octaves: int = 6, persistence: float = 0.8,
                     frequency: float = 64.0, dtype=jnp.float32) -> jax.Array:
    """Multi-octave 3D simplex field on a fixed z=t plane.

    Matches `rand_3d_fixed_T_octaves` (simplex.py:75-93): field[h, w] =
    sum_o persistence^o * noise3(w * 2^o / freq, h * 2^o / freq, t * 2^o / freq).
    `t` may be a traced scalar (the diffusion timestep).
    """
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    tt = jnp.asarray(t, dtype)
    out = jnp.zeros((h, w), dtype)
    amplitude = 1.0
    scale = 1.0 / frequency
    for _ in range(int(octaves)):
        out = out + amplitude * opensimplex3(
            perm, grad_id3, xx * scale, yy * scale, tt * scale)
        scale = scale * 2.0
        amplitude = amplitude * persistence
    return out


def fractal3_volume(perm: jax.Array, grad_id3: jax.Array,
                    shape_zhw: Tuple[int, int, int], octaves: int = 1,
                    persistence: float = 0.5, frequency: float = 32.0,
                    dtype=jnp.float32) -> jax.Array:
    """z-varying multi-octave 3D simplex volume (table-exact path).

    Matches `rand_3d_octaves` (simplex.py:37-54): field[z, h, w] =
    sum_o persistence^o * noise3(w * 2^o / freq, h * 2^o / freq,
    z * 2^o / freq).  This is the one method of the reference noise
    class's public surface whose z-coordinate is an AXIS of the output
    rather than a fixed timestep plane — e.g. (T, H, W) animated noise
    volumes.
    """
    z, h, w = shape_zhw
    zz = jax.lax.broadcasted_iota(dtype, (z, h, w), 0)
    yy = jax.lax.broadcasted_iota(dtype, (z, h, w), 1)
    xx = jax.lax.broadcasted_iota(dtype, (z, h, w), 2)
    out = jnp.zeros((z, h, w), dtype)
    amplitude = 1.0
    scale = 1.0 / frequency
    for _ in range(int(octaves)):
        out = out + amplitude * opensimplex3(
            perm, grad_id3, xx * scale, yy * scale, zz * scale)
        scale = scale * 2.0
        amplitude = amplitude * persistence
    return out


@functools.partial(jax.jit, static_argnames=("shape_zhw", "octaves"))
def fractal3_volume_hash(seed: jax.Array, shape_zhw: Tuple[int, int, int],
                         octaves: int = 1, persistence: float = 0.5,
                         frequency: float = 32.0,
                         dtype=jnp.float32) -> jax.Array:
    """Hash-path z-varying octave volume (`rand_3d_octaves`,
    simplex.py:37-54) — gather-free counter-based lattice hash, the TPU
    hot path for (T, H, W) noise volumes.  Octave mixer is a
    `lax.fori_loop` for the same compile-size reason as
    `fractal3_fixed_t_hash`."""
    z, h, w = shape_zhw
    zz = jax.lax.broadcasted_iota(dtype, (z, h, w), 0)
    yy = jax.lax.broadcasted_iota(dtype, (z, h, w), 1)
    xx = jax.lax.broadcasted_iota(dtype, (z, h, w), 2)

    def body(o, acc):
        of = o.astype(dtype)
        scale = (2.0 ** of) / frequency
        amp = persistence ** of
        return acc + amp * opensimplex3_hash(seed, xx * scale, yy * scale,
                                             zz * scale)

    return jax.lax.fori_loop(0, int(octaves), body,
                             jnp.zeros((z, h, w), dtype))


def fractal3_fixed_t_hash(seed: jax.Array, shape_hw: Tuple[int, int], t,
                          octaves: int = 6, persistence: float = 0.8,
                          frequency: float = 64.0,
                          dtype=jnp.float32) -> jax.Array:
    """Hash-path octave field on a fixed z=t plane (the TPU hot path).

    The octave mixer is a `lax.fori_loop` so the (large) cell-walk body is
    emitted ONCE in HLO regardless of octave count — an unrolled 6-octave
    version inside a sampling scan blows past this environment's
    remote-compile request limits and slows compilation everywhere.
    """
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    tt = jnp.asarray(t, dtype)

    def body(o, acc):
        of = o.astype(dtype)
        scale = (2.0 ** of) / frequency
        amp = persistence ** of
        return acc + amp * opensimplex3_hash(seed, xx * scale, yy * scale,
                                             tt * scale)

    return jax.lax.fori_loop(0, int(octaves), body,
                             jnp.zeros((h, w), dtype))


def fractal3_fixed_t_masked(seed, shape_hw, t, n_active,
                            persistence, frequency, max_octaves: int = 10,
                            dtype=jnp.float32) -> jax.Array:
    """Octave field where the octave COUNT is a traced value (hash path).

    Used by the "simplex_randParam" noise mode (GaussianDiffusion.py:104-111):
    the (octave, persistence, frequency) triple is drawn per call, so octave
    count cannot be a static unroll bound.  We unroll to `max_octaves` and
    zero the amplitude of inactive octaves — branch-free and jit-stable.
    """
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    tt = jnp.asarray(t, dtype)
    persistence = jnp.asarray(persistence, dtype)
    frequency = jnp.asarray(frequency, dtype)

    def body(o, acc):
        of = o.astype(dtype)
        scale = (2.0 ** of) / frequency
        amp = jnp.where(of < n_active, persistence ** of, 0.0).astype(dtype)
        return acc + amp * opensimplex3_hash(seed, xx * scale, yy * scale,
                                             tt * scale)

    return jax.lax.fori_loop(0, int(max_octaves), body,
                             jnp.zeros((h, w), dtype))


def seeds_from_key(key: jax.Array, n: int) -> jax.Array:
    """n independent uint32 lattice-hash seeds from a PRNG key."""
    return jax.random.bits(key, (n,), jnp.uint32)


@functools.partial(jax.jit, static_argnames=("shape_hw", "octaves", "n_fields"))
def batched_fractal3_fixed_t_table(key: jax.Array, shape_hw: Tuple[int, int],
                                   t: jax.Array, n_fields: int,
                                   octaves: int = 6, persistence: float = 0.8,
                                   frequency: float = 64.0):
    """Table-path counterpart of `batched_fractal3_fixed_t`: each field gets
    a fresh on-device PERMUTATION TABLE (perm_tables_from_key) and evaluates
    the reference-exact gather kernel (`opensimplex3`) instead of the
    counter-based lattice hash.  Returns (n, H, W).

    This is the distribution-exact twin of the reference's per-call
    `newSeed()` + LCG table (simplex.py:19-23, :174-192): same gradient
    selection mechanism (a 256-entry permutation mod 24), differing only in
    how the permutation itself is drawn (threefry vs LCG Fisher-Yates —
    both uniform over permutations).  Used by parity twin cells isolating
    hash-vs-table noise as a cause of trained-level metric deltas; the
    production hot path stays on the gather-free hash kernel.

    jit-level FMA fusion can flip a floor() at lattice-cell boundaries vs
    the eager kernel (<0.3% of pixels at 256x256 — the same boundary
    sensitivity any fp32 port of the fp64 reference kernel carries;
    distribution-irrelevant, see tests/test_simplex.py)."""
    keys = jax.random.split(key, n_fields)
    perms, gids = jax.vmap(perm_tables_from_key)(keys)      # (n, 256) x2
    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (n_fields,))

    def one(perm, gid, ti):
        return fractal3_fixed_t(perm, gid, shape_hw, ti, octaves=octaves,
                                persistence=persistence, frequency=frequency)

    return jax.vmap(one)(perms, gids, t)


@functools.partial(jax.jit, static_argnames=("shape_hw", "octaves", "n_fields"))
def batched_fractal3_fixed_t(key: jax.Array, shape_hw: Tuple[int, int],
                             t: jax.Array, n_fields: int, octaves: int = 6,
                             persistence: float = 0.8, frequency: float = 64.0):
    """n_fields independent octave fields (one fresh hash seed each — the
    on-device analogue of per-call `newSeed()`): returns (n, H, W).

    `t` is either a scalar or shape (n,) per-field timesteps.  Fields are
    generated in ONE vectorised evaluation (seed broadcast over a leading
    axis), not a vmap of table lookups.
    """
    seeds = seeds_from_key(key, n_fields)
    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (n_fields,))
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(jnp.float32, (n_fields, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (n_fields, h, w), 2)
    tt = t[:, None, None]
    seed = seeds[:, None, None]

    def body(o, acc):
        of = o.astype(jnp.float32)
        scale = (2.0 ** of) / frequency
        amp = persistence ** of
        return acc + amp * opensimplex3_hash(seed, xx * scale, yy * scale,
                                             tt * scale)

    return jax.lax.fori_loop(0, int(octaves), body,
                             jnp.zeros((n_fields, h, w), jnp.float32))

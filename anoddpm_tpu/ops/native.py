"""ctypes bindings for the native C++ simplex kernel (csrc/simplex3.cpp).

Builds the shared library on first use (g++ -O3; cached next to the source)
— no pybind11 required.  Used as the independent cross-validation oracle for
the TPU kernel and as a fast host-side noise source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "simplex3.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libanoddpm_simplex3.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if force or (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        # -ffp-contract=off: FMA contraction shifts exact region-boundary
        # cases (in_sum == 2.0) into the wrong simplex region vs the
        # reference's plain float64 arithmetic
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.anoddpm_init_perm.argtypes = [ctypes.c_int64, i32p, i32p]
        lib.anoddpm_noise3.restype = ctypes.c_double
        lib.anoddpm_noise3.argtypes = [ctypes.c_double] * 3 + [i32p, i32p]
        lib.anoddpm_noise3_batch.argtypes = [f64p, f64p, f64p,
                                             ctypes.c_int64, i32p, i32p, f64p]
        lib.anoddpm_fractal_fixed_t.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, i32p, i32p, f64p]
        _lib = lib
    return _lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def init_perm(seed: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    perm = np.zeros(256, np.int32)
    grad_id = np.zeros(256, np.int32)
    lib.anoddpm_init_perm(ctypes.c_int64(seed), _i32p(perm), _i32p(grad_id))
    return perm, grad_id


def noise3(x: float, y: float, z: float, perm: np.ndarray,
           grad_id: np.ndarray) -> float:
    lib = _load()
    return lib.anoddpm_noise3(x, y, z, _i32p(perm), _i32p(grad_id))


def noise3_batch(xs, ys, zs, perm, grad_id) -> np.ndarray:
    lib = _load()
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    zs = np.ascontiguousarray(zs, np.float64)
    out = np.zeros(xs.shape, np.float64)
    lib.anoddpm_noise3_batch(_f64p(xs), _f64p(ys), _f64p(zs), xs.size,
                             _i32p(perm), _i32p(grad_id), _f64p(out))
    return out


def fractal_fixed_t(shape_hw, t: float, octaves: int = 6,
                    persistence: float = 0.8, frequency: float = 64.0,
                    perm: Optional[np.ndarray] = None,
                    grad_id: Optional[np.ndarray] = None,
                    seed: int = 3) -> np.ndarray:
    lib = _load()
    if perm is None:
        perm, grad_id = init_perm(seed)
    h, w = shape_hw
    out = np.zeros((h, w), np.float64)
    lib.anoddpm_fractal_fixed_t(h, w, t, octaves, persistence, frequency,
                                _i32p(perm), _i32p(grad_id), _f64p(out))
    return out

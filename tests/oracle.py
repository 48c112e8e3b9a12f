"""Reference oracles for accuracy evaluation.

Mirrors the role of the reference's double-double GPU oracle (testing/eval.hpp:
194-445): an extended-precision matmul plus exact rational matmul for small sizes.
"""
import ctypes
import os
import subprocess

import numpy as np
from fractions import Fraction

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "native")
_dd_lib = None


def _load_dd():
    """Lazy-build/load the native double-double oracle (native/ddgemm.cpp,
    the analog of the reference's GPU dd oracle testing/eval.hpp). Returns
    None if no C++ toolchain is available."""
    global _dd_lib
    if _dd_lib is not None:
        return _dd_lib if _dd_lib is not False else None
    so = os.path.join(_NATIVE_DIR, "libddgemm.so")
    try:
        # run make unconditionally: it is a no-op when fresh (ddgemm.cpp is
        # a Makefile dependency), and an edited ddgemm.cpp must never be
        # silently judged through a stale .so
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.dd_gemm.argtypes = [ctypes.POINTER(ctypes.c_double)] * 4 \
            + [ctypes.c_int64] * 3
        _dd_lib = lib
        return lib
    except Exception:
        _dd_lib = False
        return None


def matmul_dd(a: np.ndarray, b: np.ndarray):
    """Double-double (~106-bit) oracle via the native library; returns
    (hi, lo) with the product = hi + lo, or None if unavailable."""
    lib = _load_dd()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    m, k = a.shape
    if b.shape[0] != k:
        # the C kernel indexes B[t*n + j] for t < k: a mismatch would read
        # past the buffer (garbage oracle or segfault), not raise
        raise ValueError(f"shape mismatch: A {a.shape} @ B {b.shape}")
    n = b.shape[1]
    hi = np.zeros((m, n))
    lo = np.zeros((m, n))
    pd = lambda x: x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa: E731
    lib.dd_gemm(pd(a), pd(b), pd(hi), pd(lo), m, k, n)
    return hi, lo


def matmul_longdouble(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Extended-precision oracle: the native double-double GEMM (~106-bit)
    when the toolchain is available, else x87 80-bit longdouble (~64-bit)."""
    dd = matmul_dd(a, b)
    if dd is not None:
        return np.asarray(dd[0], np.longdouble) + np.asarray(dd[1], np.longdouble)
    return np.asarray(a, np.longdouble) @ np.asarray(b, np.longdouble)


def matmul_exact(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact rational matmul (float inputs are exact rationals). Object array of
    Fractions; use for small shapes only."""
    af = np.vectorize(Fraction)(a.astype(np.float64))
    bf = np.vectorize(Fraction)(b.astype(np.float64))
    return af @ bf


def max_median_relerr(c, ref):
    """Max and median elementwise relative error, the reference's accuracy metric
    (testing/eval.hpp:452-532)."""
    c = np.asarray(c, np.longdouble)
    ref = np.asarray(ref, np.longdouble)
    denom = np.abs(ref)
    denom = np.where(denom == 0, np.longdouble(1), denom)
    err = np.abs(c - ref) / denom
    return float(np.max(err)), float(np.median(err))


def phi_matrix(rng: np.random.Generator, m: int, n: int, phi: float,
               dtype=np.float64) -> np.ndarray:
    """Difficulty-controlled test matrix (reference: testing/make_matrix.hpp:73-79):
    phi < 0 -> standard normal; else (U-0.5) * exp(N * phi), where phi dials the
    exponent spread."""
    if phi < 0:
        return rng.standard_normal((m, n)).astype(dtype)
    u = rng.random((m, n))
    z = rng.standard_normal((m, n))
    return ((u - 0.5) * np.exp(z * phi)).astype(dtype)

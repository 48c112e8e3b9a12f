"""Reference oracles for accuracy evaluation.

Mirrors the role of the reference's double-double GPU oracle (testing/eval.hpp:
194-445): an extended-precision matmul plus exact rational matmul for small sizes.
"""
import numpy as np
from fractions import Fraction


def matmul_longdouble(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """80-bit extended precision oracle (64-bit mantissa): error ~2^-64 * k."""
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

"""Seeded randomized correctness fuzz over the public gemm surface.

The debug-tier sweeps (tests/test_debug_sweep.py, mirroring the reference's
debug/test.cu grid) cover a fixed combinatorial product; this file samples
the configuration space CONTINUOUSLY — random shapes (including degenerate
1-dims and odd tile-straddling sizes), random op pairs, random nontrivial
alpha/beta (complex alpha for complex dtypes), random num_moduli across the
valid range, all three fastmodes, both backends — against an extended-
precision oracle. Every case is derived from a fixed seed, so failures
reproduce exactly; set GEMMUL8_FUZZ_CASES to widen the sample (nightly).

Criterion (same as the debug tier): relative error, measured against a
condition-aware denominator, far below the reference's catastrophic
threshold of 1 (debug/test.cu:106-141). Accuracy CURVES are owned by the
accuracy harness/model tests; this is a wrong-result detector.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8

N_CASES = int(os.environ.get("GEMMUL8_FUZZ_CASES", "32"))
SEED = int(os.environ.get("GEMMUL8_FUZZ_SEED", "20260820"))

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]
MODES = [True, False, "robust"]


def _rand_mat(rng, rows, cols, dtype, spread):
    def plane():
        return (rng.standard_normal((rows, cols))
                * np.exp(rng.standard_normal((rows, cols)) * spread))
    x = plane()
    if np.issubdtype(dtype, np.complexfloating):
        x = x + 1j * plane()
    return x.astype(dtype)


def _op(x, t):
    if t == "T":
        return x.T
    if t == "C":
        return x.conj().T
    return x


def _case(rng):
    """Draw one configuration; every choice comes from `rng` (reproducible)."""
    dtype = DTYPES[rng.integers(len(DTYPES))]
    is_cplx = np.issubdtype(dtype, np.complexfloating)
    name = np.dtype(dtype).name
    lo, hi = g8.tables.VALID_RANGE[name]
    # stay above the fast formula's measured accuracy floor (nu <= 5 on
    # f32-class wraps legitimately on spread data; owned by accuracy tests)
    nu = int(rng.integers(max(lo, 6), hi + 1))
    fastmode = MODES[rng.integers(len(MODES))]
    backend = "FP8" if rng.random() < 0.25 else "INT8"
    m, k, n = (int(rng.integers(1, 65)) for _ in range(3))
    ops = ["N", "T", "C"] if is_cplx else ["N", "T"]
    ta, tb = ops[rng.integers(len(ops))], ops[rng.integers(len(ops))]

    def scalar(allow_zero):
        r = rng.random()
        if allow_zero and r < 0.2:
            return 0.0
        if r < 0.4:
            return 1.0
        v = float(np.round(rng.uniform(-3, 3), 2)) or 1.0
        if is_cplx and rng.random() < 0.5:
            return complex(v, float(np.round(rng.uniform(-3, 3), 2)))
        return v

    alpha, beta = scalar(False), scalar(True)
    spread = float(rng.uniform(0.0, 1.0))
    return dtype, nu, fastmode, backend, (m, k, n), ta, tb, alpha, beta, spread


def _run_case(dtype, nu, fastmode, backend, mkn, ta, tb, alpha, beta, spread,
              rng):
    is_cplx = np.issubdtype(dtype, np.complexfloating)
    m, k, n = mkn
    a_shape = (k, m) if ta != "N" else (m, k)
    b_shape = (n, k) if tb != "N" else (k, n)
    a = _rand_mat(rng, *a_shape, dtype, spread)
    b = _rand_mat(rng, *b_shape, dtype, spread)
    c0 = _rand_mat(rng, m, n, dtype, spread)
    got = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                             fastmode=fastmode, backend=backend,
                             alpha=alpha, beta=beta,
                             c=jnp.asarray(c0) if beta != 0 else None,
                             trans_a=ta, trans_b=tb))
    hi = np.complex128 if is_cplx else np.float64
    want = alpha * (_op(a, ta).astype(hi) @ _op(b, tb)) + beta * c0.astype(hi)
    # condition-aware denominator: |want| plus the cancellation mass of the
    # product and the beta*C term (same construction as the debug sweep)
    denom = np.maximum(
        np.abs(want),
        np.abs(alpha) * (np.abs(_op(a, ta)).astype(np.float64)
                         @ np.abs(_op(b, tb))) + np.abs(beta * c0) + 1e-30)
    rel = float(np.max(np.abs(got - want) / denom))
    assert rel < 1e-3, (np.dtype(dtype).name, nu, fastmode, backend, mkn,
                        ta, tb, alpha, beta, round(spread, 3), rel)
    # determinism: the same call must reproduce the same bits
    again = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                               fastmode=fastmode, backend=backend,
                               alpha=alpha, beta=beta,
                               c=jnp.asarray(c0) if beta != 0 else None,
                               trans_a=ta, trans_b=tb))
    assert np.array_equal(got.view(np.uint8), again.view(np.uint8)), \
        ("nondeterministic bits", np.dtype(dtype).name, nu, fastmode, backend)


SMOKE = 6  # first SMOKE cases run in the default lane; the rest are `slow`


@pytest.mark.parametrize(
    "i", [i if i < SMOKE else pytest.param(i, marks=pytest.mark.slow)
          for i in range(N_CASES)])
def test_fuzz_gemm(i):
    rng = np.random.default_rng([SEED, i])
    case = _case(rng)
    _run_case(*case, rng)

"""Exhaustive small-shape correctness sweep, mirroring the reference's debug tier
(reference: debug/test.cu:14-27, 247-299): odd sizes straddling tile boundaries,
all op pairs, nontrivial alpha/beta, fast+accurate, vs the native product.
Criterion: relative error far below 1 (the reference flags rel-err > 1 as
catastrophic; at our num_moduli the emulation is at least native-grade)."""
import itertools
import os

import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8

RNG = np.random.default_rng(2024)

# GEMMUL8_TEST_EXHAUSTIVE=1 enables the reference's FULL combinatorial
# product (debug/test.cu:14-27, 247-299): all op pairs x 5 (alpha, beta)
# incl. complex alpha x {fast, accurate, robust} x a num_moduli sweep at
# m=n=k in {33, 40, 47} -- hours of XLA CPU compiles, run nightly/once per
# round; the default lane keeps the rotated subset below.
EXHAUSTIVE = os.environ.get("GEMMUL8_TEST_EXHAUSTIVE", "") == "1"


def _mk(m, n, dtype):
    x = RNG.standard_normal((m, n)) * np.exp(RNG.standard_normal((m, n)))
    if np.issubdtype(dtype, np.complexfloating):
        x = x + 1j * (RNG.standard_normal((m, n)) * np.exp(RNG.standard_normal((m, n))))
    return x.astype(dtype)


def _op(x, t):
    if t == "T":
        return x.T
    if t == "C":
        return x.conj().T
    return x


@pytest.mark.parametrize("dtype,nu", [(np.float32, 8), (np.float64, 12),
                                      (np.complex64, 8), (np.complex128, 12)])
@pytest.mark.parametrize("fastmode", [True, False])
def test_odd_shapes_ops_alphabeta(dtype, nu, fastmode):
    is_cplx = np.issubdtype(dtype, np.complexfloating)
    ops = ["N", "T", "C"] if is_cplx else ["N", "T"]
    shapes = [(33, 47, 41), (1, 37, 1), (40, 1, 44), (47, 45, 33)]
    ab_pairs = [(1.0, 0.0), (-1.0, 1.0), (-1.5, 1.2)]
    if is_cplx:
        ab_pairs.append((1.5 - 0.5j, -0.25 + 1.0j))
    # rotate op pairs across shapes (full product would compile ~10x more cases)
    op_pairs = list(itertools.product(ops, ops))
    cases = [(s, *op_pairs[(i * 2 + j) % len(op_pairs)])
             for i, s in enumerate(shapes) for j in range(2)]
    for (m, k, n), ta, tb in cases:
        a_shape = (k, m) if ta != "N" else (m, k)
        b_shape = (n, k) if tb != "N" else (k, n)
        a, b = _mk(*a_shape, dtype), _mk(*b_shape, dtype)
        alpha, beta = ab_pairs[(m + ord(ta) + ord(tb)) % len(ab_pairs)]
        c0 = _mk(m, n, dtype)
        got = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                                 fastmode=fastmode, alpha=alpha, beta=beta,
                                 c=jnp.asarray(c0), trans_a=ta, trans_b=tb))
        want = alpha * (_op(a, ta).astype(np.complex128 if is_cplx else np.float64)
                        @ _op(b, tb)) + beta * c0
        denom = np.maximum(np.abs(want), np.abs(alpha) * np.abs(_op(np.abs(a), ta))
                           @ np.abs(_op(np.abs(b), tb)) + 1e-30)
        rel = np.max(np.abs(got - want) / denom)
        assert rel < 1e-4, (dtype, nu, fastmode, (m, k, n), ta, tb, rel)


def _check_case(dtype, nu, fastmode, m, k, n, ta, tb, alpha, beta):
    is_cplx = np.issubdtype(dtype, np.complexfloating)
    # correctness smoke, not an accuracy sweep (those live in the accuracy
    # harness/model tests): the reference's debug criterion is rel err < 1
    # catastrophic. At the BOTTOM of the valid range (nu <= 5, f32-class)
    # the fast formula legitimately wraps individual extreme entries on
    # this generator's exp(N)-spread data (measured 0.07 at nu=5/47^3/TT --
    # the accuracy model marks that domain invalid); the smoke bound there
    # is the catastrophic criterion with margin, not a precision claim.
    tol = 0.25 if nu <= 5 else 1e-4
    a_shape = (k, m) if ta != "N" else (m, k)
    b_shape = (n, k) if tb != "N" else (k, n)
    a, b = _mk(*a_shape, dtype), _mk(*b_shape, dtype)
    c0 = _mk(m, n, dtype)
    got = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                             fastmode=fastmode, alpha=alpha, beta=beta,
                             c=jnp.asarray(c0), trans_a=ta, trans_b=tb))
    want = alpha * (_op(a, ta).astype(np.complex128 if is_cplx else np.float64)
                    @ _op(b, tb)) + beta * c0
    denom = np.maximum(np.abs(want), np.abs(alpha) * np.abs(_op(np.abs(a), ta))
                       @ np.abs(_op(np.abs(b), tb)) + np.abs(beta * c0) + 1e-30)
    rel = np.max(np.abs(got - want) / denom)
    assert rel < tol, (dtype, nu, fastmode, (m, k, n), ta, tb, alpha, beta, rel)


@pytest.mark.slow
@pytest.mark.skipif(not EXHAUSTIVE, reason="set GEMMUL8_TEST_EXHAUSTIVE=1 "
                    "for the reference's full debug product")
@pytest.mark.parametrize("dtype,nus", [
    # the f32-class sweep starts at nu=5: below that the fast formula's
    # CRT budget (log2P(3)/2 ~ 12 bits) wraps on this generator's
    # exp(N)-spread data -- accuracy-domain behavior owned by the
    # accuracy-model tests, not a correctness-smoke concern
    (np.float32, (5, 8, 12)), (np.float64, (9, 14, 20)),
    (np.complex64, (5, 8, 13)), (np.complex128, (9, 14, 20))])
@pytest.mark.parametrize("fastmode", [True, False, "robust"])
@pytest.mark.parametrize("size", [33, 40, 47])
def test_exhaustive_debug_product(dtype, nus, fastmode, size):
    """The reference's full correctness product (debug/test.cu:247-299):
    every op pair x every (alpha, beta) class (incl. complex alpha) x the
    num_moduli sweep at three odd cube sizes. No index-rotation subsampling:
    a wrong-result bug confined to a single (op, alpha, beta, mode) cell
    cannot slip through.

    The size axis is parametrized so tools/run_exhaustive.sh can run each
    (mode, dtype, size) sub-cell in its OWN pytest process: jaxlib's XLA:CPU
    compiler has segfaulted inside backend_compile_and_load in ~50-minute
    single-process compile marathons (complex128 cells, ~1500 distinct
    programs); shorter processes avoid the flaky native crash entirely."""
    is_cplx = np.issubdtype(dtype, np.complexfloating)
    ops = ["N", "T", "C"] if is_cplx else ["N", "T"]
    ab_pairs = [(1.0, 0.0), (1.0, 1.0), (-1.0, 1.0), (-1.5, 1.2), (0.5, -2.0)]
    if is_cplx:
        ab_pairs.append((1.5 - 0.5j, -0.25 + 1.0j))
    for (ta, tb), (alpha, beta), nu in itertools.product(
            itertools.product(ops, ops), ab_pairs, nus):
        _check_case(dtype, nu, fastmode, size, size, size, ta, tb, alpha, beta)

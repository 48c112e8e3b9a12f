"""Float-float (f32-expansion) epilogue: the TPU-native CRT path (ff.py).

Run on CPU with epilogue="ff" forced, so these tests validate EXACTLY the
arithmetic the real TPU executes (the ff path uses only f32 + int32 ops,
which behave identically on CPU and TPU; verified empirically on v5e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import core, ff, tables
from oracle import matmul_longdouble, max_median_relerr, phi_matrix

RNG = np.random.default_rng(321)


def test_two_sum_two_prod_exact():
    x = jnp.asarray(RNG.standard_normal(4096), jnp.float32)
    y = jnp.asarray(RNG.standard_normal(4096), jnp.float32)
    s, e = ff.two_sum(x, y)
    exact = np.asarray(x, np.float64) + np.asarray(y, np.float64)
    np.testing.assert_array_equal(np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, pe = ff.two_prod_const(np.float32(np.pi), y)
    exact = np.float64(np.float32(np.pi)) * np.asarray(y, np.float64)
    np.testing.assert_array_equal(np.asarray(p, np.float64) + np.asarray(pe, np.float64), exact)


def _rand_mid(nu, backend, shape):
    mods = tables.moduli(backend)[:nu]
    mid_t = np.int8 if backend == "INT8" else np.int16
    out = []
    for p in mods:
        r = RNG.integers(0, p, shape).astype(np.int64)
        r = np.where(2 * r >= p, r - p, r)
        out.append(r.astype(mid_t))
    return np.stack(out)


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
@pytest.mark.parametrize("nu", [2, 5, 8, 13, 17, 20])
def test_crt_ff_reconstructs_exactly(nu, backend):
    """For residues of a KNOWN integer v (|v| < P/2), the ff CRT must return
    v exactly (v within f64; checked vs exact int arithmetic)."""
    mods = [int(p) for p in tables.moduli(backend)[:nu]]
    P = 1
    for p in mods:
        P *= p
    # v within the CRT range |v| < P/2 and the f64-checkable window ~2^50
    lim = min(2 ** 50, P // 2 - 1)
    v = RNG.integers(-lim, lim, (64,))
    res = np.stack([
        (np.vectorize(lambda t, p=p: ((t % p) - p if 2 * (t % p) >= p else t % p))(v))
        for p in mods]).astype(np.int8 if backend == "INT8" else np.int16)
    # NB: int8 wrap for p=256 maps 128 -> -128, consistent with encode
    limbs, base = ff.crt_limbs(jnp.asarray(res)[:, :, None], nu, backend, 53)
    got = sum(np.asarray(l, np.float64)[:, 0] * 2.0 ** (base + ff.LIMB_BITS * i)
              for i, l in enumerate(limbs))
    # matrix-form production path (exact python-int qPi, 16-bit limbs)
    limbs_m, base_m = ff.crt_limbs_matrix(jnp.asarray(res)[:, :, None], nu,
                                          backend, 53)
    got_m = sum(np.asarray(l, np.float64)[:, 0] * 2.0 ** (base_m + 16 * i)
                for i, l in enumerate(limbs_m))
    err_m = np.abs(got_m - v.astype(np.float64))
    if float(P) * 2.0 ** -78 < 0.5:
        np.testing.assert_array_equal(got_m, v.astype(np.float64))
    else:
        assert err_m.max() <= float(P) * 2.0 ** -78
    # the limb accumulation is EXACT; the only error source is the ~96-bit
    # truncation of the qPi tables plus the sub-base piece cutoff:
    # absolute error <= P * 2^-78 (measured ~P * 2^-86). Exact whenever the
    # bound is < 1/2.
    err = np.abs(got - v.astype(np.float64))
    if float(P) * 2.0 ** -78 < 0.5:
        np.testing.assert_array_equal(got, v.astype(np.float64))
    else:
        assert err.max() <= float(P) * 2.0 ** -78


@pytest.mark.parametrize("fastmode", [True, False])
def test_dgemm_ff_accuracy_curve(fastmode):
    m, k, n = 48, 256, 40
    a = phi_matrix(RNG, m, k, 0.5)
    b = phi_matrix(RNG, k, n, 0.5)
    ref = matmul_longdouble(a, b)
    native_err, _ = max_median_relerr(a @ b, ref)
    errs = {}
    for nu in (8, 12, 16, 20):
        c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                               fastmode=fastmode, epilogue="ff"))
        errs[nu], _ = max_median_relerr(c, ref)
    assert errs[12] < errs[8] / 100
    assert errs[16] <= native_err * 2
    assert errs[20] <= native_err * 2


@pytest.mark.parametrize("backend", ["INT8", "FP8"])
def test_ff_matches_f64_path_closely(backend):
    """Same quantization, two epilogues: results must agree to ~2^-49 relative
    (the ff path is at least as accurate as the dd path)."""
    a = jnp.asarray(phi_matrix(RNG, 32, 200, 1.0))
    b = jnp.asarray(phi_matrix(RNG, 200, 24, 1.0))
    for nu in (6, 10) if backend == "FP8" else (8, 14, 20):
        c_ff = np.asarray(g8.gemm(a, b, num_moduli=nu, backend=backend,
                                  epilogue="ff"))
        c_f64 = np.asarray(g8.gemm(a, b, num_moduli=nu, backend=backend,
                                   epilogue="f64"))
        # matrix-scale comparison: individual elements may sit far below the
        # CRT's absolute-error floor after cancellation
        scale = np.max(np.abs(c_f64))
        assert np.max(np.abs(c_ff - c_f64)) / scale < 2.0 ** -48


def test_sgemm_ff():
    m, k, n = 64, 512, 64
    a = phi_matrix(RNG, m, k, 0.5, np.float32)
    b = phi_matrix(RNG, k, n, 0.5, np.float32)
    ref = matmul_longdouble(a, b)
    native_err, _ = max_median_relerr(
        np.asarray(a, np.float32) @ np.asarray(b, np.float32), ref)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8,
                           epilogue="ff"))
    err, _ = max_median_relerr(c, ref)
    assert err < native_err


def test_exact_recovery_ff():
    a = RNG.integers(-2 ** 15, 2 ** 15, (16, 48)).astype(np.float64) / 2.0 ** 8
    b = RNG.integers(-2 ** 15, 2 ** 15, (48, 12)).astype(np.float64) / 2.0 ** 8
    ref = a @ b
    for nu in (14, 20):
        c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                               epilogue="ff"))
        np.testing.assert_array_equal(c, ref)


def test_zgemm_ff():
    m, k, n = 20, 64, 17
    a = jnp.asarray(phi_matrix(RNG, k, m, 0.0) + 1j * phi_matrix(RNG, k, m, 0.0))
    b = jnp.asarray(phi_matrix(RNG, k, n, 0.0) + 1j * phi_matrix(RNG, k, n, 0.0))
    c = np.asarray(g8.gemm(a, b, num_moduli=16, trans_a="C", epilogue="ff"))
    ref = np.asarray(a).conj().T @ np.asarray(b)
    assert np.max(np.abs(c - ref)) < 1e-12


def test_ff_bit_reproducible():
    a = jnp.asarray(phi_matrix(RNG, 40, 300, 1.0))
    b = jnp.asarray(phi_matrix(RNG, 300, 36, 1.0))
    c1 = np.asarray(g8.gemm(a, b, num_moduli=16, epilogue="ff"))
    c2 = np.asarray(g8.gemm(a, b, num_moduli=16, epilogue="ff"))
    np.testing.assert_array_equal(c1, c2)


def test_extreme_exponents_ff():
    """Large/small magnitudes: the three-way pow2 splits must keep every
    factor in range. Uses accurate mode: fast mode's norm-based shift formula
    (faithful to the reference, scaling_fast_real.hpp:6-22) allocates the CRT
    budget unevenly for mis-scaled operands -- verified identical between the
    ff and f64 epilogues -- while accurate mode's product-magnitude shifts
    recover full precision."""
    a = jnp.asarray(phi_matrix(RNG, 8, 64, 0.0) * 2.0 ** 30)
    b = jnp.asarray(phi_matrix(RNG, 64, 8, 0.0) * 2.0 ** -32)
    c = np.asarray(g8.gemm(a, b, num_moduli=16, epilogue="ff", fastmode=False))
    ref = np.asarray(a) @ np.asarray(b)
    assert np.max(np.abs(c - ref) / np.abs(ref)) < 1e-13
    # fast mode: both epilogues agree far below the ~4.6e-8 quantization
    # error that dominates here (fast-mode shifts leave v well under P/2, so
    # the CRT floor is relatively larger than in the well-scaled case)
    c_ff = np.asarray(g8.gemm(a, b, num_moduli=16, epilogue="ff"))
    c_64 = np.asarray(g8.gemm(a, b, num_moduli=16, epilogue="f64"))
    assert np.max(np.abs(c_ff - c_64)) / np.max(np.abs(c_64)) < 2.0 ** -30

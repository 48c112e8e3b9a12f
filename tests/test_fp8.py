"""FP8 backend: e4m3-exact plane splits, error-free 3-GEMM recombination,
end-to-end accuracy, complex (9-GEMM) path, K-chunking, reproducibility.
(Reference behaviors: src/mod.hpp:106-189, src/matmult.hpp:180-389,
src/table.hpp:34-75; the TPU carrier is bf16, see gemmul8_tpu/fp8.py.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import fp8, quantize, tables
from oracle import matmul_longdouble, max_median_relerr, phi_matrix

RNG = np.random.default_rng(54321)


def _rand_residues(num_moduli, shape):
    mods = tables.moduli("FP8")[:num_moduli]
    out = []
    for p in mods:
        r = RNG.integers(0, p, shape).astype(np.int32)
        r = np.where(2 * r >= p, r - p, r)
        out.append(r)
    return jnp.asarray(np.stack(out))


@pytest.mark.parametrize("nu", [2, 6, 9, 13, 20])
def test_split_planes_error_free_and_e4m3_exact(nu):
    """r == q*x + y (square p) / r == 16*x + y, z == x + y (Karatsuba p),
    and every plane value must be exactly representable in float8_e4m3."""
    res = _rand_residues(nu, (5, 7))
    planes = np.asarray(fp8.split_planes(res, nu), np.float64)
    sqrts = fp8._sqrt_moduli()
    for i in range(nu):
        x, y, z = planes[i]
        if i < tables.NOT_KARATSUBA:
            np.testing.assert_array_equal(sqrts[i] * x + y, np.asarray(res[i]))
        else:
            np.testing.assert_array_equal(16 * x + y, np.asarray(res[i]))
            np.testing.assert_array_equal(z, x + y)
        assert np.abs(planes[i]).max() <= 16
        # e4m3 exactness: round-trip through the fp8 dtype is lossless
        rt = planes[i].astype(jnp.float8_e4m3fn).astype(np.float64)
        np.testing.assert_array_equal(rt, planes[i])


@pytest.mark.parametrize("nu", [3, 8, 12])
def test_residue_gemm_fp8_matches_exact_integer_products(nu):
    """C_mid must equal wrap((sum_k res_a * res_b) mod p) computed exactly."""
    m, k, n = 9, 33, 11
    ra = _rand_residues(nu, (m, k))
    rb = _rand_residues(nu, (k, n))
    pa = fp8.split_planes(ra, nu)
    pb = fp8.split_planes(rb, nu)
    got = np.asarray(fp8.residue_gemm_fp8(pa, pb, nu))
    mods = tables.moduli("FP8")[:nu]
    for i, p in enumerate(mods):
        exact = (np.asarray(ra[i], np.int64) @ np.asarray(rb[i], np.int64)) % p
        exact = np.where(2 * exact >= p, exact - p, exact)
        np.testing.assert_array_equal(got[i], exact)


def test_residue_gemm_fp8_k_chunking():
    """K crossing K_CHUNK_FP8 must stay exact (residue-space partial sums)."""
    nu, m, n = 4, 3, 4
    k = fp8.K_CHUNK_FP8 + 257
    mods = tables.moduli("FP8")[:nu]
    ra = _rand_residues(nu, (m, k))
    rb = _rand_residues(nu, (k, n))
    got = np.asarray(fp8.residue_gemm_fp8(
        fp8.split_planes(ra, nu), fp8.split_planes(rb, nu), nu))
    for i, p in enumerate(mods):
        exact = (np.asarray(ra[i], np.int64) @ np.asarray(rb[i], np.int64)) % p
        exact = np.where(2 * exact >= p, exact - p, exact)
        np.testing.assert_array_equal(got[i], exact)


@pytest.mark.parametrize("fastmode", [True, False])
def test_dgemm_fp8_accuracy_curve(fastmode):
    m, k, n = 48, 256, 40
    a = phi_matrix(RNG, m, k, 0.5)
    b = phi_matrix(RNG, k, n, 0.5)
    ref = matmul_longdouble(a, b)
    native_err, _ = max_median_relerr(a @ b, ref)
    errs = {}
    for nu in (4, 6, 8, 10, 13):
        c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu,
                               fastmode=fastmode, backend="FP8"))
        errs[nu], _ = max_median_relerr(c, ref)
    # FP8 moduli are ~2^10 wide: each step of 2 moduli adds ~19 bits of CRT
    # capacity (vs ~16 for INT8); nu=13 (log2P ~ 60) reaches native-f64 quality
    assert errs[6] < errs[4] / 100
    assert errs[10] < errs[8] / 100
    assert errs[13] <= max(native_err * 2, 1e-15)


def test_sgemm_fp8_beats_native_f32():
    m, k, n = 64, 512, 64
    a = phi_matrix(RNG, m, k, 0.5, np.float32)
    b = phi_matrix(RNG, k, n, 0.5, np.float32)
    ref = matmul_longdouble(a, b)
    native_err, _ = max_median_relerr(
        np.asarray(a, np.float32) @ np.asarray(b, np.float32), ref)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=7,
                           backend="FP8"))
    err, _ = max_median_relerr(c, ref)
    # nu=7 -> log2P ~ 33 bits of CRT capacity: comfortably below f32's 24
    assert err < native_err


def test_exact_recovery_fp8():
    a = RNG.integers(-2 ** 15, 2 ** 15, (16, 48)).astype(np.float64) / 2.0 ** 8
    b = RNG.integers(-2 ** 15, 2 ** 15, (48, 12)).astype(np.float64) / 2.0 ** 8
    ref = a @ b
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8,
                           backend="FP8"))
    np.testing.assert_array_equal(c, ref)


def _op(x, op):
    return x.conj().T if op == "C" else (x.T if op == "T" else x)


@pytest.mark.parametrize("ops", [("N", "N"), ("T", "N"), ("N", "C"), ("C", "T")])
def test_zgemm_fp8(ops):
    m, k, n = 20, 64, 17
    op_a, op_b = ops
    a = (phi_matrix(RNG, *((m, k) if op_a == "N" else (k, m)), 0.0)
         + 1j * phi_matrix(RNG, *((m, k) if op_a == "N" else (k, m)), 0.0))
    b = (phi_matrix(RNG, *((k, n) if op_b == "N" else (n, k)), 0.0)
         + 1j * phi_matrix(RNG, *((k, n) if op_b == "N" else (n, k)), 0.0))
    ref = _op(a, op_a) @ _op(b, op_b)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=12,
                           backend="FP8", trans_a=op_a, trans_b=op_b))
    err, _ = max_median_relerr(np.real(c), np.real(ref))
    err_i, _ = max_median_relerr(np.imag(c), np.imag(ref))
    # nu=12 -> log2P ~ 55: past native-f64 quality for this k
    assert max(err, err_i) < 1e-12


def test_bit_reproducibility_fp8():
    a = jnp.asarray(phi_matrix(RNG, 40, 300, 1.0))
    b = jnp.asarray(phi_matrix(RNG, 300, 36, 1.0))
    c1 = np.asarray(g8.gemm(a, b, num_moduli=7, backend="FP8"))
    c2 = np.asarray(g8.gemm(a, b, num_moduli=7, backend="FP8"))
    np.testing.assert_array_equal(c1, c2)


def test_precompute_fp8_matches_direct():
    a = jnp.asarray(phi_matrix(RNG, 24, 128, 0.5))
    b = jnp.asarray(phi_matrix(RNG, 128, 20, 0.5))
    qa = g8.precompute(a, "A", num_moduli=6, backend="FP8")
    qb = g8.precompute(b, "B", num_moduli=6, backend="FP8")
    c_pre = np.asarray(g8.gemm_quantized(qa, qb, out_dtype=jnp.float64))
    c_dir = np.asarray(g8.gemm(a, b, num_moduli=6, backend="FP8"))
    np.testing.assert_array_equal(c_pre, c_dir)


def test_estimate_gemm_fp8_is_upper_bound_carrier():
    """The FP8 accurate-mode estimation GEMM must inflate for f32 round-off."""
    ub_a = jnp.full((4, 2000), 129.0, jnp.bfloat16)
    ub_b = jnp.full((2000, 4), 129.0, jnp.bfloat16)
    c = np.asarray(quantize.estimate_gemm(ub_a, ub_b, "FP8"))
    assert (c >= 129.0 * 129.0 * 2000).all()


def test_hook_fp8_backend(monkeypatch):
    monkeypatch.setenv("GEMMUL8_NUM_MOD_D", "8")
    monkeypatch.setenv("GEMMUL8_BACKEND", "FP8")
    a = jnp.asarray(phi_matrix(RNG, 16, 64, 0.0))
    b = jnp.asarray(phi_matrix(RNG, 64, 12, 0.0))
    with g8.emulate():
        c_hook = np.asarray(a @ b)
    c_dir = np.asarray(g8.gemm(a, b, num_moduli=8, backend="FP8"))
    np.testing.assert_array_equal(c_hook, c_dir)

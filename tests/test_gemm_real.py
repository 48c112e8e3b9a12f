"""End-to-end real GEMM emulation: accuracy vs extended-precision oracle,
exact recovery, alpha/beta/transpose semantics, bit-reproducibility.
(Mirrors the reference test strategy: debug/test.cu + testing/test_accuracy.hpp.)"""
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from oracle import matmul_longdouble, max_median_relerr, phi_matrix


RNG = np.random.default_rng(12345)


def test_exact_recovery_short_mantissa():
    """With 16-bit input mantissas and high nu, emulation must be EXACT."""
    a = RNG.integers(-2 ** 15, 2 ** 15, (32, 96)).astype(np.float64) / 2.0 ** 8
    b = RNG.integers(-2 ** 15, 2 ** 15, (96, 24)).astype(np.float64) / 2.0 ** 8
    ref = a @ b  # exact in f64
    for nu in (14, 20):
        c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu))
        np.testing.assert_array_equal(c, ref)


@pytest.mark.parametrize("fastmode", [True, False])
def test_dgemm_accuracy_curve(fastmode):
    """Error must decrease monotonically-ish with nu and beat native f64 matmul
    accuracy at high nu (vs 80-bit oracle)."""
    m, k, n = 48, 256, 40
    a = phi_matrix(RNG, m, k, 0.5)
    b = phi_matrix(RNG, k, n, 0.5)
    ref = matmul_longdouble(a, b)
    native_err, _ = max_median_relerr(a @ b, ref)
    errs = {}
    for nu in (6, 8, 10, 12, 14, 16):
        c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b),
                               num_moduli=nu, fastmode=fastmode))
        errs[nu], _ = max_median_relerr(c, ref)
    assert errs[8] < errs[6] / 4
    assert errs[12] < errs[8] / 100
    assert errs[16] <= native_err * 2  # at nu=16, at least native-f64 quality
    assert errs[16] < 1e-13


def test_sgemm_accuracy_beats_native_f32():
    m, k, n = 64, 512, 64
    a = phi_matrix(RNG, m, k, 0.5, np.float32)
    b = phi_matrix(RNG, k, n, 0.5, np.float32)
    ref = matmul_longdouble(a, b)
    native_err, _ = max_median_relerr(
        (a.astype(np.float32) @ b.astype(np.float32)), ref)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8))
    err8, _ = max_median_relerr(c, ref)
    assert c.dtype == np.float32
    assert err8 < native_err / 4


def test_alpha_beta_and_transposes():
    m, k, n = 24, 64, 16
    a = phi_matrix(RNG, m, k, 0.0)
    b = phi_matrix(RNG, k, n, 0.0)
    c0 = phi_matrix(RNG, m, n, 0.0)
    base = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=14))
    # alpha/beta epilogue
    out = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=14,
                             alpha=-1.5, beta=1.2, c=jnp.asarray(c0)))
    # XLA may fuse the epilogue into fma -> one-ulp difference vs numpy
    np.testing.assert_allclose(out, -1.5 * base + 1.2 * c0, rtol=1e-12, atol=1e-15)
    # transposes
    t = np.asarray(g8.gemm(jnp.asarray(a.T.copy()), jnp.asarray(b.T.copy()),
                           num_moduli=14, trans_a=True, trans_b=True))
    np.testing.assert_array_equal(t, base)


def test_bitwise_reproducibility():
    a = phi_matrix(RNG, 32, 128, 1.0)
    b = phi_matrix(RNG, 128, 32, 1.0)
    c1 = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=9))
    c2 = np.asarray(g8.gemm(jnp.asarray(a.copy()), jnp.asarray(b.copy()), num_moduli=9))
    assert np.array_equal(c1.view(np.int64), c2.view(np.int64))


def test_difficulty_sweep_phi():
    """Accuracy degrades gracefully with exponent spread (phi), like the
    reference's accuracy protocol (testing/test_accuracy.hpp)."""
    m, k, n = 32, 256, 32
    for phi in (-1, 0, 1, 2):
        a = phi_matrix(RNG, m, k, phi)
        b = phi_matrix(RNG, k, n, phi)
        ref = matmul_longdouble(a, b)
        c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=17))
        err, _ = max_median_relerr(c, ref)
        native, _ = max_median_relerr(a @ b, ref)
        assert err <= max(native * 4, 1e-12), (phi, err, native)


def test_long_k_chunking():
    """K beyond the reference's 2^17 limit must stay exact (residue-space sums)."""
    k = (1 << 17) + 4096
    a = RNG.integers(-50, 50, (4, k)).astype(np.float64)
    b = RNG.integers(-50, 50, (k, 4)).astype(np.float64)
    ref = a @ b  # exact (fits ~30 bits)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=12))
    np.testing.assert_array_equal(c, ref)


def test_invalid_num_moduli_raises():
    a = jnp.ones((4, 4), jnp.float32)
    with pytest.raises(ValueError):
        g8.gemm(a, a, num_moduli=14)  # f32 caps at 13
    with pytest.raises(ValueError):
        g8.gemm(a.astype(jnp.float64), a.astype(jnp.float64), num_moduli=21)


def test_one_sided_precompute():
    """One-sided skip-scal: a precomputed A against raw B (and vice versa)
    must match the fully-precomputed result bit-for-bit (reference analog:
    skip_scalA XOR skip_scalB, gemmul8_real.hpp:123-139)."""
    a = jnp.asarray(phi_matrix(RNG, 24, 100, 0.5))
    b = jnp.asarray(phi_matrix(RNG, 100, 20, 0.5))
    qa = g8.precompute(a, "A", num_moduli=9)
    qb = g8.precompute(b, "B", num_moduli=9)
    full = np.asarray(g8.gemm_quantized(qa, qb))
    np.testing.assert_array_equal(np.asarray(g8.gemm_quantized(qa, b)), full)
    np.testing.assert_array_equal(np.asarray(g8.gemm_quantized(a, qb)), full)
    with pytest.raises(TypeError):
        g8.gemm_quantized(a, b)

"""Complex GEMM emulation (3M residue scheme): accuracy, ops N/T/C, alpha/beta,
reproducibility. (Reference strategy: debug/test.cu complex sweeps.)"""
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from oracle import max_median_relerr, phi_matrix

RNG = np.random.default_rng(54321)


def cplx(m, n, phi, dtype=np.complex128):
    re = phi_matrix(RNG, m, n, phi)
    im = phi_matrix(RNG, m, n, phi)
    return (re + 1j * im).astype(dtype)


def ld_matmul(a, b):
    ar, ai = np.real(a).astype(np.longdouble), np.imag(a).astype(np.longdouble)
    br, bi = np.real(b).astype(np.longdouble), np.imag(b).astype(np.longdouble)
    return (ar @ br - ai @ bi) + 1j * (ar @ bi + ai @ br)


def relerr(c, ref):
    num = np.abs(np.asarray(c, np.clongdouble) - ref)
    den = np.maximum(np.abs(ref), np.longdouble(1e-300))
    return float(np.max(num / den))


def test_zgemm_accuracy_curve():
    m, k, n = 32, 256, 24
    a, b = cplx(m, k, 0.5), cplx(k, n, 0.5)
    ref = ld_matmul(a, b)
    native = relerr(a @ b, ref)
    errs = {}
    for nu in (8, 12, 16):
        c = g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=nu)
        assert c.dtype == jnp.complex128
        errs[nu] = relerr(np.asarray(c), ref)
    assert errs[12] < errs[8] / 100
    assert errs[16] <= native * 4


def test_cgemm_accuracy():
    m, k, n = 32, 256, 24
    a = cplx(m, k, 0.0, np.complex64)
    b = cplx(k, n, 0.0, np.complex64)
    ref = ld_matmul(a, b)
    native = relerr(a @ b, ref)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8))
    assert c.dtype == np.complex64
    assert relerr(c, ref) < native / 2


def test_ops_n_t_c():
    m, k, n = 16, 48, 12
    a, b = cplx(m, k, 0.0), cplx(k, n, 0.0)
    base = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=16))
    t = np.asarray(g8.gemm(jnp.asarray(a.T.copy()), jnp.asarray(b.T.copy()),
                           num_moduli=16, trans_a="T", trans_b="T"))
    np.testing.assert_array_equal(t, base)
    # conjugate-transpose: op(A) = A^H
    ch = np.asarray(g8.gemm(jnp.asarray(a.conj().T.copy()),
                            jnp.asarray(b.conj().T.copy()),
                            num_moduli=16, trans_a="C", trans_b="C"))
    np.testing.assert_array_equal(ch, base)


def test_complex_alpha_beta():
    m, k, n = 16, 64, 16
    a, b, c0 = cplx(m, k, 0.0), cplx(k, n, 0.0), cplx(m, n, 0.0)
    alpha, beta = 1.5 - 0.5j, -0.25 + 2.0j
    base = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=16))
    out = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=16,
                             alpha=alpha, beta=beta, c=jnp.asarray(c0)))
    np.testing.assert_allclose(out, alpha * base + beta * c0, rtol=1e-12, atol=1e-14)


def test_complex_exact_short_mantissa():
    a = (RNG.integers(-2**10, 2**10, (8, 32)) +
         1j * RNG.integers(-2**10, 2**10, (8, 32))).astype(np.complex128)
    b = (RNG.integers(-2**10, 2**10, (32, 8)) +
         1j * RNG.integers(-2**10, 2**10, (32, 8))).astype(np.complex128)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=10))
    np.testing.assert_array_equal(c, a @ b)


def test_complex_reproducibility_and_accu():
    a, b = cplx(16, 128, 1.0), cplx(128, 16, 1.0)
    c1 = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=9))
    c2 = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=9))
    assert np.array_equal(c1.view(np.int64), c2.view(np.int64))
    ref = ld_matmul(a, b)
    cacc = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=9,
                              fastmode=False))
    # accurate mode beats fast mode at equal num_moduli
    assert relerr(cacc, ref) < relerr(c1, ref) / 2


def test_planar_matches_complex_bitwise():
    """gemm_planar (the device-native complex entry for runtimes without
    complex dtypes) must produce bit-identical results to gemm() on complex
    arrays, for every op combination."""
    rng = np.random.default_rng(17)
    a = rng.standard_normal((24, 40)) + 1j * rng.standard_normal((24, 40))
    b = rng.standard_normal((24, 18)) + 1j * rng.standard_normal((24, 18))
    c = g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=10, trans_a="C")
    cr, ci = g8.gemm_planar(jnp.asarray(a.real), jnp.asarray(a.imag),
                            jnp.asarray(b.real), jnp.asarray(b.imag),
                            num_moduli=10, trans_a="C")
    np.testing.assert_array_equal(np.asarray(cr), np.real(np.asarray(c)))
    np.testing.assert_array_equal(np.asarray(ci), np.imag(np.asarray(c)))


def test_accu_mode_3m_bounds_beat_fast():
    """Accurate-mode complex shifts use the reference's 3M product bounds
    (scaling_accu_complex.hpp:128-226, find_max.hpp:99-251): on
    exponent-spread (phi=2) inputs, accu-mode ZGEMM error must beat fast
    mode by a large factor, mirroring the real-path accu gain."""
    rng = np.random.default_rng(55)
    m = n = 64
    k = 256
    phi = 2.0
    ar, ai = phi_matrix(rng, m, k, phi), phi_matrix(rng, m, k, phi)
    br, bi = phi_matrix(rng, k, n, phi), phi_matrix(rng, k, n, phi)
    a = jnp.asarray(ar + 1j * ai)
    b = jnp.asarray(br + 1j * bi)
    ref = (np.asarray(ar, np.longdouble) + 1j * np.asarray(ai, np.longdouble)) \
        @ (np.asarray(br, np.longdouble) + 1j * np.asarray(bi, np.longdouble))

    def err(c):
        c = np.asarray(c)
        return max(
            float(np.max(np.abs(c.real - ref.real)
                         / np.maximum(np.abs(ref.real), 1e-300))),
            float(np.max(np.abs(c.imag - ref.imag)
                         / np.maximum(np.abs(ref.imag), 1e-300))))

    e_fast = err(g8.gemm(a, b, num_moduli=12))
    e_accu = err(g8.gemm(a, b, num_moduli=12, fastmode=False))
    assert e_accu * 50 < e_fast, (e_accu, e_fast)

    # the complex accu gain mirrors the real-path accu gain on the same
    # difficulty (within an order of magnitude)
    ra = jnp.asarray(phi_matrix(rng, m, k, phi))
    rb = jnp.asarray(phi_matrix(rng, k, n, phi))
    rref = np.asarray(ra, np.longdouble) @ np.asarray(rb, np.longdouble)
    rf = np.asarray(g8.gemm(ra, rb, num_moduli=12))
    rc = np.asarray(g8.gemm(ra, rb, num_moduli=12, fastmode=False))
    gain_real = (np.max(np.abs(rf - rref) / np.abs(rref))
                 / np.max(np.abs(rc - rref) / np.abs(rref)))
    gain_cplx = e_fast / e_accu
    assert gain_cplx > gain_real / 30, (gain_cplx, gain_real)

"""Hermitian rank-k update (herk): plane-reuse complex Gram products.
(Capability beyond the reference -- its complex lane algebra is
gemmul8_complex.hpp:52-226; herk derives A^H's lanes from A's.)"""
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from oracle import phi_matrix

RNG = np.random.default_rng(777)


def cplx(m, n, phi, dtype=np.complex128):
    re = phi_matrix(RNG, m, n, phi)
    im = phi_matrix(RNG, m, n, phi)
    return (re + 1j * im).astype(dtype)


def relerr(c, ref):
    num = np.abs(np.asarray(c, np.clongdouble) - np.asarray(ref, np.clongdouble))
    den = np.maximum(np.abs(np.asarray(ref, np.clongdouble)), 1e-300)
    return float(np.max(num / den))


def ld_gram(a, trans):
    ar = np.asarray(a.real, np.longdouble)
    ai = np.asarray(a.imag, np.longdouble)
    if trans:   # A^H @ A
        return (ar.T @ ar + ai.T @ ai) + 1j * (ar.T @ ai - ai.T @ ar)
    return (ar @ ar.T + ai @ ai.T) + 1j * (ai @ ar.T - ar @ ai.T)


@pytest.mark.parametrize("dtype,nu", [(np.complex64, 8), (np.complex128, 16)])
@pytest.mark.parametrize("trans", [False, True])
def test_herk_matches_native(dtype, nu, trans):
    a = cplx(40, 72, 0.5, dtype)
    ref = ld_gram(a, trans)          # extended-precision oracle
    h = np.asarray(g8.herk(jnp.asarray(a), trans=trans, num_moduli=nu))
    native = relerr((a.conj().T @ a) if trans else (a @ a.conj().T), ref)
    assert relerr(h, ref) <= native * 16 + 1e-30
    # Hermitian up to emulation error: diag imag ~ 0
    assert np.max(np.abs(np.imag(np.diag(h)))) <= 1e-10 * np.max(np.abs(h))


def test_herk_plane_reuse_matches_gemm_quality():
    """herk's derived rhs lanes give the same quality class as encoding
    A^H separately through gemm (shared shifts make them nearly equal)."""
    a = cplx(32, 64, 1.0)
    h = np.asarray(g8.herk(jnp.asarray(a), num_moduli=14))
    g = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(a).conj().T,
                           num_moduli=14, fastmode="robust"))
    ref = a @ a.conj().T
    assert relerr(h, ref) <= relerr(g, ref) * 16 + 1e-30


def test_herk_accurate_mode():
    a = cplx(24, 48, 2.0)          # hard spread
    ref = a @ a.conj().T
    h = np.asarray(g8.herk(jnp.asarray(a), num_moduli=16, fastmode=False))
    assert relerr(h, ref) <= 1e-12


def test_herk_alpha_beta_and_planar():
    a = cplx(24, 40, 0.0)
    c0 = cplx(24, 24, 0.0)
    ref = 2.5 * (a @ a.conj().T) - 0.5 * c0
    h = np.asarray(g8.herk(jnp.asarray(a), num_moduli=14, alpha=2.5,
                           beta=-0.5, c=jnp.asarray(c0)))
    assert relerr(h, ref) < 1e-11
    base = np.asarray(g8.herk(jnp.asarray(a), num_moduli=14))
    hr, hi = g8.herk_planar(jnp.asarray(a.real), jnp.asarray(a.imag),
                            num_moduli=14)
    assert np.array_equal(np.asarray(hr), base.real)
    assert np.array_equal(np.asarray(hi), base.imag)


def test_herk_reproducible_and_validation():
    a = jnp.asarray(cplx(16, 32, 0.0))
    h1 = np.asarray(g8.herk(a, num_moduli=10))
    h2 = np.asarray(g8.herk(a, num_moduli=10))
    assert np.array_equal(h1.view(np.int64), h2.view(np.int64))
    with pytest.raises(TypeError):
        g8.herk(jnp.asarray(np.ones((4, 4))))
    with pytest.raises(NotImplementedError):
        g8.herk(a, backend="FP8")
    with pytest.raises(ValueError):
        g8.herk(a, num_moduli=21)

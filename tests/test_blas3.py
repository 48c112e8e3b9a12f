"""Level-3 BLAS completion: syr2k/her2k, symm/hemm, trtri.

Every routine builds on the emulated GEMM, so the oracle is numpy float64
(the nu=16 f64 emulator is more accurate than the oracle's own rounding;
tolerances are relative to problem magnitude). Structural guarantees are
checked BITWISE: syr2k output exactly symmetric, her2k exactly Hermitian
with an exactly-real diagonal, symm/hemm never read the unstored triangle
(NaN-poisoned), trtri's masked triangle exactly zero.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gemmul8_tpu as g8

NU = 16


def _rng(seed):
    return np.random.default_rng(seed)


def _relerr(got, want):
    got = np.asarray(got)
    want = np.asarray(want)
    scale = max(np.max(np.abs(want)), 1e-300)
    return np.max(np.abs(got - want)) / scale


# --------------------------------------------------------------------------
# syr2k / her2k
# --------------------------------------------------------------------------

@pytest.mark.parametrize("trans", [False, True])
def test_syr2k_f64(trans):
    rng = _rng(0)
    n, k = 96, 72
    sh = (k, n) if trans else (n, k)
    a = rng.standard_normal(sh)
    b = rng.standard_normal(sh)
    out = np.asarray(g8.syr2k(jnp.asarray(a), jnp.asarray(b), trans=trans,
                              num_moduli=NU, alpha=1.5))
    if trans:
        want = 1.5 * (a.T @ b + b.T @ a)
    else:
        want = 1.5 * (a @ b.T + b @ a.T)
    assert _relerr(out, want) < 5e-14
    # exactly symmetric bit-for-bit: (i,j) and (j,i) sum the same addends
    assert np.array_equal(out, out.T)


def test_syr2k_beta_c():
    rng = _rng(1)
    n, k = 64, 48
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((n, k))
    c = rng.standard_normal((n, n))
    c = c + c.T
    out = np.asarray(g8.syr2k(jnp.asarray(a), jnp.asarray(b), num_moduli=NU,
                              alpha=-0.5, beta=1.25, c=jnp.asarray(c)))
    want = -0.5 * (a @ b.T + b @ a.T) + 1.25 * c
    assert _relerr(out, want) < 5e-14


def test_syr2k_complex_raises():
    z = jnp.ones((4, 4), jnp.complex128)
    with pytest.raises(TypeError):
        g8.syr2k(z, z)


@pytest.mark.parametrize("trans", [False, True])
def test_her2k_c128(trans):
    rng = _rng(2)
    n, k = 80, 56
    sh = (k, n) if trans else (n, k)
    a = rng.standard_normal(sh) + 1j * rng.standard_normal(sh)
    b = rng.standard_normal(sh) + 1j * rng.standard_normal(sh)
    alpha = 0.75 - 0.5j
    out = np.asarray(g8.her2k(jnp.asarray(a), jnp.asarray(b), trans=trans,
                              num_moduli=NU, alpha=alpha))
    if trans:
        want = alpha * (a.conj().T @ b) + np.conj(alpha) * (b.conj().T @ a)
    else:
        want = alpha * (a @ b.conj().T) + np.conj(alpha) * (b @ a.conj().T)
    assert _relerr(out, want) < 5e-14
    # exactly Hermitian bit-for-bit, diagonal exactly real
    assert np.array_equal(out, out.conj().T)
    assert np.all(np.imag(np.diagonal(out)) == 0.0)


def test_her2k_beta_real_contract():
    rng = _rng(3)
    n, k = 48, 40
    a = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    b = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    c = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    c = c + c.conj().T
    out = np.asarray(g8.her2k(jnp.asarray(a), jnp.asarray(b), num_moduli=NU,
                              beta=0.5, c=jnp.asarray(c)))
    want = a @ b.conj().T + b @ a.conj().T + 0.5 * c
    assert _relerr(out, want) < 5e-14
    with pytest.raises(ValueError):
        g8.her2k(jnp.asarray(a), jnp.asarray(b), beta=1.0 + 2.0j,
                 c=jnp.asarray(c))


def test_her2k_real_raises():
    x = jnp.ones((4, 4), jnp.float64)
    with pytest.raises(TypeError):
        g8.her2k(x, x)


# --------------------------------------------------------------------------
# symm / hemm
# --------------------------------------------------------------------------

@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("lower", [True, False])
def test_symm_f64(side, lower):
    rng = _rng(4)
    n, m = 72, 56
    full = rng.standard_normal((n, n))
    full = full + full.T
    stored = np.array(full)
    # poison the UNstored triangle: symm must never read it
    ii, jj = np.tril_indices(n, -1) if not lower else np.triu_indices(n, 1)
    stored[ii, jj] = np.nan
    bsh = (n, m) if side == "left" else (m, n)
    b = rng.standard_normal(bsh)
    out = np.asarray(g8.symm(jnp.asarray(stored), jnp.asarray(b), side=side,
                             lower=lower, num_moduli=NU, alpha=2.0))
    want = 2.0 * (full @ b if side == "left" else b @ full)
    assert np.all(np.isfinite(out))
    assert _relerr(out, want) < 5e-14


def test_symm_complex_symmetric():
    # csymm/zsymm mirror WITHOUT conjugation (complex-symmetric operand)
    rng = _rng(5)
    n, m = 40, 32
    full = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    full = full + full.T  # complex-symmetric, NOT Hermitian
    b = rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m))
    out = np.asarray(g8.symm(jnp.asarray(np.tril(full)), jnp.asarray(b),
                             num_moduli=NU))
    assert _relerr(out, full @ b) < 5e-14


@pytest.mark.parametrize("side", ["left", "right"])
def test_hemm_c128(side):
    rng = _rng(6)
    n, m = 64, 40
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    full = h + h.conj().T  # Hermitian, real diagonal
    stored = np.array(full)
    ii, jj = np.triu_indices(n, 1)
    stored[ii, jj] = np.nan + 1j * np.nan  # unread triangle poisoned
    # BLAS contract: the diagonal's imaginary part is ASSUMED zero (ignored)
    stored[np.arange(n), np.arange(n)] += 7j
    bsh = (n, m) if side == "left" else (m, n)
    b = rng.standard_normal(bsh) + 1j * rng.standard_normal(bsh)
    alpha = 1.0 - 0.25j
    out = np.asarray(g8.hemm(jnp.asarray(stored), jnp.asarray(b), side=side,
                             lower=True, num_moduli=NU, alpha=alpha))
    want = alpha * (full @ b if side == "left" else b @ full)
    assert np.all(np.isfinite(out))
    assert _relerr(out, want) < 5e-14


def test_hemm_real_raises():
    x = jnp.ones((4, 4), jnp.float64)
    with pytest.raises(TypeError):
        g8.hemm(x, x)


# --------------------------------------------------------------------------
# trtri
# --------------------------------------------------------------------------

def _tri_wellcond(rng, n, lower, dtype=np.float64):
    a = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(dtype)
    a = np.tril(a) if lower else np.triu(a)
    a[np.arange(n), np.arange(n)] = (1.0 + rng.random(n)).astype(dtype)
    return a


@pytest.mark.parametrize("lower", [True, False])
def test_trtri_f64(lower):
    rng = _rng(7)
    n = 96
    a = _tri_wellcond(rng, n, lower)
    x = np.asarray(g8.trtri(jnp.asarray(a), lower=lower, num_moduli=NU))
    resid = np.max(np.abs(a @ x - np.eye(n))) / n
    assert resid < 1e-13
    # complementary triangle exactly zero
    mask = np.triu(np.ones((n, n)), 1) if lower else np.tril(np.ones((n, n)), -1)
    assert np.all(x[mask.astype(bool)] == 0.0)


def test_trtri_unit_diag():
    rng = _rng(8)
    n = 64
    a = _tri_wellcond(rng, n, True)
    a[np.arange(n), np.arange(n)] = rng.standard_normal(n)  # ignored
    au = np.tril(a, -1) + np.eye(n)
    x = np.asarray(g8.trtri(jnp.asarray(a), lower=True, unit_diag=True,
                            num_moduli=NU))
    resid = np.max(np.abs(au @ x - np.eye(n))) / n
    assert resid < 1e-13
    assert np.all(np.diagonal(x) == 1.0)


def test_trtri_c128():
    rng = _rng(9)
    n = 48
    a = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    a = np.tril(a) / np.sqrt(n)
    a[np.arange(n), np.arange(n)] = 1.0 + rng.random(n)
    x = np.asarray(g8.trtri(jnp.asarray(a), num_moduli=NU))
    resid = np.max(np.abs(a @ x - np.eye(n))) / n
    assert resid < 1e-13


# --------------------------------------------------------------------------
# planar entries (device-native complex for runtimes without complex dtypes)
# --------------------------------------------------------------------------

def test_her2k_planar_bit_identity():
    rng = _rng(10)
    n, k = 56, 40
    ar, ai = rng.standard_normal((n, k)), rng.standard_normal((n, k))
    br, bi = rng.standard_normal((n, k)), rng.standard_normal((n, k))
    z = np.asarray(g8.her2k(jnp.asarray(ar + 1j * ai),
                            jnp.asarray(br + 1j * bi), num_moduli=NU))
    cr, ci = g8.her2k_planar(*(jnp.asarray(x) for x in (ar, ai, br, bi)),
                             num_moduli=NU)
    assert np.array_equal(np.asarray(cr), z.real)
    assert np.array_equal(np.asarray(ci), z.imag)
    # planar structure: real plane exactly symmetric, imag antisymmetric
    assert np.array_equal(np.asarray(cr), np.asarray(cr).T)
    assert np.array_equal(np.asarray(ci), -np.asarray(ci).T)
    assert np.all(np.diagonal(np.asarray(ci)) == 0.0)


def test_her2k_planar_alpha():
    rng = _rng(11)
    n, k = 48, 32
    ar, ai = rng.standard_normal((n, k)), rng.standard_normal((n, k))
    br, bi = rng.standard_normal((n, k)), rng.standard_normal((n, k))
    alpha = 0.5 - 1.5j
    cr, ci = g8.her2k_planar(*(jnp.asarray(x) for x in (ar, ai, br, bi)),
                             num_moduli=NU, alpha=alpha)
    a = ar + 1j * ai
    b = br + 1j * bi
    want = alpha * (a @ b.conj().T) + np.conj(alpha) * (b @ a.conj().T)
    got = np.asarray(cr) + 1j * np.asarray(ci)
    assert _relerr(got, want) < 5e-14


@pytest.mark.parametrize("routine,hermitian", [("hemm_planar", True),
                                               ("symm_planar", False)])
def test_symm_hemm_planar(routine, hermitian):
    rng = _rng(12)
    n, m = 48, 32
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    full = h + (h.conj().T if hermitian else h.T)
    br = rng.standard_normal((n, m))
    bi = rng.standard_normal((n, m))
    fn = getattr(g8, routine)
    cr, ci = fn(jnp.asarray(np.tril(full.real)), jnp.asarray(np.tril(full.imag)),
                jnp.asarray(br), jnp.asarray(bi), num_moduli=NU)
    want = full @ (br + 1j * bi)
    got = np.asarray(cr) + 1j * np.asarray(ci)
    assert _relerr(got, want) < 5e-14
    # bit-identity with the complex entry on complex views
    cplx_fn = g8.hemm if hermitian else g8.symm
    z = np.asarray(cplx_fn(jnp.asarray(np.tril(full)),
                           jnp.asarray(br + 1j * bi), num_moduli=NU))
    assert np.array_equal(np.asarray(cr), z.real)
    assert np.array_equal(np.asarray(ci), z.imag)

"""Complex (ZGEMM-workload) solver layer: the blocked trsm/trmm/LU/Cholesky
skeletons are dtype-generic over the emulated GEMM's complex dispatch
(VERDICT round-3 item 5). References checked against numpy's full-precision
complex solves."""
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from oracle import phi_matrix

pytestmark = pytest.mark.slow  # full-lane family; default lane: -m 'not slow'

RNG = np.random.default_rng(31415)
NU = 16          # ~f64-grade emulation for the c128 tests


def cplx(m, n, phi=0.0):
    re = phi_matrix(RNG, m, n, phi)
    im = phi_matrix(RNG, m, n, phi)
    return (re + 1j * im).astype(np.complex128)


def tri(n, lower=True):
    t = cplx(n, n)
    t = np.tril(t) if lower else np.triu(t)
    # well-conditioned diagonal
    np.fill_diagonal(t, np.diag(t) + 4.0 + 0j)
    return t


def relerr(x, ref):
    return float(np.max(np.abs(x - ref)) / np.max(np.abs(ref)))


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", ["N", "T", "C"])
def test_trsm_complex(side, lower, trans):
    n, nrhs = 96, 32
    t = tri(n, lower)
    b = cplx(n, nrhs) if side == "left" else cplx(nrhs, n)
    x = np.asarray(g8.trsm(jnp.asarray(t), jnp.asarray(b), side=side,
                           lower=lower, trans_a=trans, num_moduli=NU,
                           block=32))
    op = {"N": t, "T": t.T, "C": t.conj().T}[trans]
    got = op @ x if side == "left" else x @ op
    assert relerr(got, b) < 1e-10, (side, lower, trans)


@pytest.mark.parametrize("trans", ["N", "C"])
def test_trmm_complex(trans):
    n, nrhs = 96, 32
    t = tri(n, True)
    b = cplx(n, nrhs)
    out = np.asarray(g8.trmm(jnp.asarray(t), jnp.asarray(b), lower=True,
                             trans_a=trans, num_moduli=NU, block=32))
    op = t.conj().T if trans == "C" else t
    assert relerr(out, op @ b) < 1e-11


def test_getrf_solve_complex():
    n = 128
    a = cplx(n, n)
    a += n * np.eye(n)        # comfortably invertible
    b = cplx(n, 8)
    x = np.asarray(g8.solve(jnp.asarray(a), jnp.asarray(b), num_moduli=NU,
                            block=32))
    assert relerr(a @ x, b) < 1e-10
    # lu matches native residual quality
    lu, perm = g8.getrf(jnp.asarray(a), num_moduli=NU, block=32)
    l = np.tril(np.asarray(lu), -1) + np.eye(n)
    u = np.triu(np.asarray(lu))
    assert relerr(l @ u, a[np.asarray(perm)]) < 1e-10


def test_inv_complex():
    n = 64
    a = cplx(n, n) + n * np.eye(n)
    ainv = np.asarray(g8.inv(jnp.asarray(a), num_moduli=NU, block=32))
    assert relerr(a @ ainv, np.eye(n)) < 1e-10


@pytest.mark.parametrize("lower", [True, False])
def test_potrf_potrs_posv_hermitian(lower):
    n = 96
    g = cplx(n, n)
    a = g @ g.conj().T + n * np.eye(n)       # HPD
    ch = np.asarray(g8.potrf(jnp.asarray(a), lower=lower, num_moduli=NU,
                             block=32))
    rebuilt = ch @ ch.conj().T if lower else ch.conj().T @ ch
    assert relerr(rebuilt, a) < 1e-11
    # triangular structure
    assert np.allclose(ch, np.tril(ch) if lower else np.triu(ch))
    b = cplx(n, 4)
    x = np.asarray(g8.potrs(jnp.asarray(ch), jnp.asarray(b), lower=lower,
                            num_moduli=NU, block=32))
    assert relerr(a @ x, b) < 1e-9
    x2 = np.asarray(g8.posv(jnp.asarray(a), jnp.asarray(b), lower=lower,
                            num_moduli=NU, block=32))
    assert np.array_equal(x.view(np.float64), x2.view(np.float64))


def test_solve_complex_iterative_refinement():
    n = 96
    a = cplx(n, n) + n * np.eye(n)
    b = cplx(n, 1)[:, 0]
    # cheap factorization + high-accuracy residuals recovers full precision
    x0 = np.asarray(g8.solve(jnp.asarray(a), jnp.asarray(b), num_moduli=9,
                             block=32))
    x2 = np.asarray(g8.solve(jnp.asarray(a), jnp.asarray(b), num_moduli=9,
                             block=32, refine_steps=2))
    r0 = relerr(a @ x0, b)
    r2 = relerr(a @ x2, b)
    assert r2 < r0 / 16 or r2 < 1e-13


def test_qr_complex():
    m, n = 96, 64
    a = cplx(m, n)
    q, r = g8.qr(jnp.asarray(a), num_moduli=NU, block=32)
    q, r = np.asarray(q), np.asarray(r)
    assert relerr(q @ r, a) < 1e-11
    # Q has orthonormal columns (Q^H Q = I)
    assert np.max(np.abs(q.conj().T @ q - np.eye(n))) < 1e-11
    assert np.allclose(r, np.triu(r))


def test_lstsq_complex():
    m, n = 96, 48
    a = cplx(m, n)
    x_true = cplx(n, 2)
    b = a @ x_true
    x = np.asarray(g8.lstsq(jnp.asarray(a), jnp.asarray(b), num_moduli=NU,
                            block=32))
    assert relerr(x, x_true) < 1e-9


def test_ormqr_complex_roundtrip():
    m, n = 64, 64
    a = cplx(m, n)
    packed, taus = g8.geqrf(jnp.asarray(a), num_moduli=NU, block=32)
    eye = jnp.eye(m, dtype=jnp.complex128)
    q = np.asarray(g8.ormqr(packed, taus, eye, num_moduli=NU, block=32))
    qh_q = np.asarray(g8.ormqr(packed, taus, jnp.asarray(q), trans=True,
                               num_moduli=NU, block=32))
    assert np.max(np.abs(qh_q - np.eye(m))) < 1e-11


def test_eig_complex_supported():
    # complex svd/eigh are SUPPORTED since the zheev/zgesvd analogs landed
    # (deep coverage in test_eig.py); pin the capability here where the old
    # raises-NotImplementedError assertion lived.
    a = cplx(16, 16)
    herm = (a + a.conj().T) / 2
    w, _ = g8.eigh(jnp.asarray(herm))
    wref = np.linalg.eigvalsh(herm)
    assert np.max(np.abs(np.sort(np.asarray(w)) - wref)) < 1e-11
    s = np.asarray(g8.svd(jnp.asarray(a), compute_uv=False))
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(np.sort(s)[::-1] - sref)) < 1e-11

"""Solver layer: blocked trsm/trmm/LU over the emulated GEMM.

Oracle strategy: NumPy/SciPy-free -- reference solves are computed with
numpy in float64 (tests run on CPU with x64 on, so the emulator's nu=14+
f64 path is strictly more accurate than the f64 oracle's own rounding;
tolerances are relative residuals, the standard metric for solvers).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gemmul8_tpu import solvers


def _rng(seed):
    return np.random.default_rng(seed)


def _tri(rng, n, lower, unit_diag, dtype=np.float64):
    # off-diagonals damped by 1/sqrt(n): a dense random triangular matrix is
    # EXPONENTIALLY ill-conditioned, which would swamp any forward-error
    # check with the oracle's own rounding
    a = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(dtype)
    a = np.tril(a) if lower else np.triu(a)
    d = (1.0 + rng.random(n)).astype(dtype)
    a[np.arange(n), np.arange(n)] = d
    if unit_diag:
        # off-triangle junk must be ignored; diagonal is implicit
        a[np.arange(n), np.arange(n)] = rng.standard_normal(n)
    return a


def _residual(t_canon, x, b, side):
    """Condition-number-free solver metric: |op residual| scaled by the
    problem's natural magnitude."""
    r = t_canon @ x - b if side == "left" else x @ t_canon - b
    scale = max(np.max(np.abs(t_canon)) * np.max(np.abs(x)), np.max(np.abs(b)))
    return np.max(np.abs(r)) / (scale * t_canon.shape[0])


def _canon_np(a, lower, trans, unit_diag):
    t = a.T if trans else a
    t = np.tril(t) if (lower != trans) else np.triu(t)
    if unit_diag:
        t = t - np.diag(np.diag(t)) + np.eye(t.shape[0])
    return t


def _np_trsm(a, b, side, lower, trans, unit_diag):
    t = a.T if trans else a
    t = np.tril(t) if (lower != trans) else np.triu(t)
    if unit_diag:
        t = t - np.diag(np.diag(t)) + np.eye(t.shape[0])
    if side == "left":
        return np.linalg.solve(t, b)
    return np.linalg.solve(t.T, b.T).T


def _np_trmm(a, b, side, lower, trans, unit_diag):
    t = a.T if trans else a
    t = np.tril(t) if (lower != trans) else np.triu(t)
    if unit_diag:
        t = t - np.diag(np.diag(t)) + np.eye(t.shape[0])
    return t @ b if side == "left" else b @ t


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", [False, True])
def test_trsm_variants(side, lower, trans):
    rng = _rng(1000 + 4 * (side == "left") + 2 * lower + trans)
    m, n = (96, 37) if side == "left" else (37, 96)
    na = m if side == "left" else n
    a = _tri(rng, na, lower, False)
    b = rng.standard_normal((m, n))
    x = np.asarray(solvers.trsm(jnp.asarray(a), jnp.asarray(b), side=side,
                                lower=lower, trans_a=trans,
                                num_moduli=14, block=32))
    t = _canon_np(a, lower, trans, False)
    # a wrong triangle/side/trans produces an O(1/n) residual here
    assert _residual(t, x, b, side) < 1e-14
    ref = _np_trsm(a, b, side, lower, trans, False)
    assert np.max(np.abs(x - ref)) / np.max(np.abs(ref)) < 1e-11


def test_trsm_unit_diag_ignores_stored_diagonal():
    rng = _rng(7)
    a = _tri(rng, 64, True, True)
    b = rng.standard_normal((64, 8))
    x = np.asarray(solvers.trsm(jnp.asarray(a), jnp.asarray(b),
                                unit_diag=True, num_moduli=14, block=16))
    t = _canon_np(a, True, False, True)
    assert _residual(t, x, b, "left") < 1e-14


def test_trsm_alpha_and_single_block():
    rng = _rng(8)
    a = _tri(rng, 48, True, False)
    b = rng.standard_normal((48, 5))
    # block >= n: pure native path, exercises the no-update branch
    x = np.asarray(solvers.trsm(jnp.asarray(a), jnp.asarray(b), alpha=-2.5,
                                num_moduli=14, block=64))
    t = _canon_np(a, True, False, False)
    assert _residual(t, x, -2.5 * b, "left") < 1e-14


def test_trsm_f32():
    rng = _rng(9)
    a = _tri(rng, 80, True, False, np.float32)
    b = rng.standard_normal((80, 9)).astype(np.float32)
    x = np.asarray(solvers.trsm(jnp.asarray(a), jnp.asarray(b),
                                num_moduli=9, block=32))
    t = _canon_np(a.astype(np.float64), True, False, False)
    assert _residual(t, x.astype(np.float64), b.astype(np.float64),
                     "left") < 1e-7


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", [False, True])
def test_trmm_variants(side, lower, trans):
    rng = _rng(2000 + 4 * (side == "left") + 2 * lower + trans)
    m, n = (96, 41) if side == "left" else (41, 96)
    na = m if side == "left" else n
    a = _tri(rng, na, lower, False)
    b = rng.standard_normal((m, n))
    y = np.asarray(solvers.trmm(jnp.asarray(a), jnp.asarray(b), side=side,
                                lower=lower, trans_a=trans,
                                num_moduli=14, block=32))
    ref = _np_trmm(a, b, side, lower, trans, False)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-13


def test_trmm_unit_diag_and_alpha():
    rng = _rng(11)
    a = _tri(rng, 64, True, True)
    b = rng.standard_normal((64, 7))
    y = np.asarray(solvers.trmm(jnp.asarray(a), jnp.asarray(b),
                                unit_diag=True, alpha=0.5,
                                num_moduli=14, block=16))
    ref = 0.5 * _np_trmm(a, b, "left", True, False, True)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-13


@pytest.mark.parametrize("shape", [(96, 96), (96, 64), (64, 96)])
def test_getrf_reconstructs(shape):
    rng = _rng(sum(shape))
    m, n = shape
    a = rng.standard_normal((m, n))
    lu, perm = solvers.getrf(jnp.asarray(a), num_moduli=14, block=32)
    lu = np.asarray(lu)
    perm = np.asarray(perm)
    kmin = min(m, n)
    el = np.tril(lu[:, :kmin], -1) + np.eye(m, kmin)
    u = np.triu(lu[:kmin])
    pa = a[perm]
    assert np.max(np.abs(el @ u - pa)) / np.max(np.abs(a)) < 1e-12
    assert sorted(perm.tolist()) == list(range(m))


def test_lu_solve_and_solve():
    rng = _rng(21)
    n = 120
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal((n, 3))
    lu, perm = solvers.getrf(jnp.asarray(a), num_moduli=14, block=32)
    x = np.asarray(solvers.lu_solve(lu, perm, jnp.asarray(b),
                                    num_moduli=14, block=32))
    res = np.max(np.abs(a @ x - b)) / np.max(np.abs(b))
    assert res < 1e-11
    # 1-D rhs via the top-level driver
    x1 = np.asarray(solvers.solve(jnp.asarray(a), jnp.asarray(b[:, 0]),
                                  num_moduli=14, block=32))
    assert x1.shape == (n,)
    assert np.max(np.abs(a @ x1 - b[:, 0])) / np.max(np.abs(b)) < 1e-11


def test_solve_refinement_rescues_low_nu():
    """Iterative refinement with low-accuracy LU: the canonical
    mixed-precision pattern -- nu=8 factors, refinement drives the
    residual to f64 level."""
    rng = _rng(22)
    n = 96
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal((n,))
    x0 = np.asarray(solvers.solve(jnp.asarray(a), jnp.asarray(b),
                                  num_moduli=6, block=32, refine_steps=0))
    x2 = np.asarray(solvers.solve(jnp.asarray(a), jnp.asarray(b),
                                  num_moduli=6, block=32, refine_steps=2))
    r0 = np.max(np.abs(a @ x0 - b))
    r2 = np.max(np.abs(a @ x2 - b))
    assert r2 < r0 * 1e-2
    assert r2 / np.max(np.abs(b)) < 1e-12


def test_trsm_bit_reproducible():
    rng = _rng(33)
    a = _tri(rng, 64, True, False)
    b = rng.standard_normal((64, 16))
    x1 = np.asarray(solvers.trsm(jnp.asarray(a), jnp.asarray(b),
                                 num_moduli=10, block=16))
    x2 = np.asarray(solvers.trsm(jnp.asarray(a), jnp.asarray(b),
                                 num_moduli=10, block=16))
    assert np.array_equal(x1, x2)


def test_solvers_reject_complex_and_bad_shapes():
    a = jnp.ones((4, 4), jnp.complex64)
    with pytest.raises(NotImplementedError):
        solvers.trsm(a, jnp.ones((4, 2), jnp.complex64))
    with pytest.raises(ValueError):
        solvers.trsm(jnp.ones((4, 3)), jnp.ones((4, 2)))
    with pytest.raises(ValueError):
        solvers.trsm(jnp.ones((4, 4)), jnp.ones((5, 2)))
    with pytest.raises(ValueError):
        solvers.trsm(jnp.ones((4, 4)), jnp.ones((4, 2)), side="up")
    with pytest.raises(TypeError):
        solvers.trsm(jnp.ones((4, 4), jnp.float32), jnp.ones((4, 2)))

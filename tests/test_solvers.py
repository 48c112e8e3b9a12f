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

pytestmark = pytest.mark.slow  # full-lane family; default lane: -m 'not slow'


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


def test_solvers_reject_bad_shapes():
    # complex operands are SUPPORTED since round 4 (tests/test_solvers_complex.py)
    with pytest.raises(ValueError):
        solvers.trsm(jnp.ones((4, 3)), jnp.ones((4, 2)))
    with pytest.raises(ValueError):
        solvers.trsm(jnp.ones((4, 4)), jnp.ones((5, 2)))
    with pytest.raises(ValueError):
        solvers.trsm(jnp.ones((4, 4)), jnp.ones((4, 2)), side="up")
    with pytest.raises(TypeError):
        solvers.trsm(jnp.ones((4, 4), jnp.float32), jnp.ones((4, 2)))


# ---------------------------------------------------------------------------
# potrf
# ---------------------------------------------------------------------------

def _spd(rng, n, dtype=np.float64):
    g = rng.standard_normal((n, n)).astype(dtype)
    return (g @ g.T) / n + np.eye(n, dtype=dtype) * 2


@pytest.mark.parametrize("n,block", [(96, 32), (120, 32), (64, 64)])
def test_potrf_reconstructs(n, block):
    rng = _rng(11)
    a = _spd(rng, n)
    l = np.asarray(solvers.potrf(jnp.asarray(a), num_moduli=14, block=block))
    assert np.allclose(np.triu(l, 1), 0)
    err = np.max(np.abs(l @ l.T - a)) / np.max(np.abs(a))
    assert err < 1e-13, err


def test_potrf_upper():
    rng = _rng(12)
    a = _spd(rng, 96)
    r = np.asarray(solvers.potrf(jnp.asarray(a), lower=False,
                                 num_moduli=14, block=32))
    assert np.allclose(np.tril(r, -1), 0)
    err = np.max(np.abs(r.T @ r - a)) / np.max(np.abs(a))
    assert err < 1e-13, err


def test_potrf_matches_native_cholesky():
    rng = _rng(13)
    a = _spd(rng, 96)
    l = np.asarray(solvers.potrf(jnp.asarray(a), num_moduli=14, block=32))
    ref = np.linalg.cholesky(a)
    assert np.max(np.abs(l - ref)) / np.max(np.abs(ref)) < 1e-12


def test_potrf_solve_roundtrip():
    # potrf + two trsm = an SPD solve entirely on the emulated engine
    rng = _rng(14)
    n = 96
    a = _spd(rng, n)
    b = rng.standard_normal((n, 5))
    l = solvers.potrf(jnp.asarray(a), num_moduli=14, block=32)
    y = solvers.trsm(l, jnp.asarray(b), lower=True, num_moduli=14, block=32)
    x = np.asarray(solvers.trsm(l, y, lower=True, trans_a=True,
                                num_moduli=14, block=32))
    resid = np.max(np.abs(a @ x - b)) / np.max(np.abs(b))
    assert resid < 1e-12, resid


def test_potrf_nu_dial_and_reproducible():
    rng = _rng(15)
    a = _spd(rng, 96)
    l6 = np.asarray(solvers.potrf(jnp.asarray(a), num_moduli=6, block=32))
    l14 = np.asarray(solvers.potrf(jnp.asarray(a), num_moduli=14, block=32))
    e6 = np.max(np.abs(l6 @ l6.T - a))
    e14 = np.max(np.abs(l14 @ l14.T - a))
    assert e14 < e6  # accuracy dial carries through the factorization
    again = np.asarray(solvers.potrf(jnp.asarray(a), num_moduli=6, block=32))
    assert np.array_equal(l6, again)


def test_potrf_rejects_nonsquare():
    with pytest.raises(ValueError):
        solvers.potrf(jnp.ones((4, 3)))


def test_gram_products_wrap_reference_fastmode():
    """Why the solver layer defaults fastmode="robust": Gram products
    (L @ L.T) hit Cauchy-Schwarz with equality on the diagonal, where the
    reference fast-shift formula's probabilistic slack wraps the CRT at
    specific num_moduli. Verified by exact integer arithmetic: at nu=14 the
    quantized diagonal product reaches ~1.4x P/2. Robust shifts bound
    |C| <= P/16 rigorously and stay exact."""
    from gemmul8_tpu import gemm
    rng = _rng(11)
    n = 96
    a = _spd(rng, n)
    left = np.linalg.cholesky(a)[64:, :64]
    ref = left @ left.T
    lj = jnp.asarray(left)
    bad = np.max(np.abs(np.asarray(
        gemm(lj, lj, trans_b=True, num_moduli=14, fastmode=True)) - ref))
    good = np.max(np.abs(np.asarray(
        gemm(lj, lj, trans_b=True, num_moduli=14, fastmode="robust")) - ref))
    assert bad > 1e-4          # the reference formula wraps (parity behavior)
    assert good < 1e-13        # robust does not


# ---------------------------------------------------------------------------
# distributed Schur updates (mesh=)
# ---------------------------------------------------------------------------

def _mesh_of(x, y):
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[: x * y]).reshape(x, y)
    return Mesh(devs, ("x", "y"))


def test_getrf_distributed_bit_identical_across_meshes():
    """LU with Schur updates through SUMMA: same bits on every mesh shape
    (order-free residue reduction), and the same quality as local getrf."""
    rng = _rng(31)
    n = 128
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    aj = jnp.asarray(a)
    lu11, p11 = solvers.getrf(aj, num_moduli=12, block=32, mesh=_mesh_of(1, 1))
    lu24, p24 = solvers.getrf(aj, num_moduli=12, block=32, mesh=_mesh_of(2, 4))
    lu42, p42 = solvers.getrf(aj, num_moduli=12, block=32, mesh=_mesh_of(4, 2))
    np.testing.assert_array_equal(np.asarray(lu11), np.asarray(lu24))
    np.testing.assert_array_equal(np.asarray(lu11), np.asarray(lu42))
    np.testing.assert_array_equal(np.asarray(p11), np.asarray(p24))
    # reconstruction quality matches the local path's
    lu, perm = np.asarray(lu24), np.asarray(p24)
    L = np.tril(lu, -1) + np.eye(n)
    U = np.triu(lu)
    assert np.max(np.abs(a[perm] - L @ U)) / np.max(np.abs(a)) < 1e-13


def test_potrf_distributed_bit_identical_across_meshes():
    rng = _rng(32)
    n = 128
    a = _spd(rng, n)
    aj = jnp.asarray(a)
    l11 = np.asarray(solvers.potrf(aj, num_moduli=12, block=32,
                                   mesh=_mesh_of(1, 1)))
    l24 = np.asarray(solvers.potrf(aj, num_moduli=12, block=32,
                                   mesh=_mesh_of(2, 4)))
    np.testing.assert_array_equal(l11, l24)
    assert np.max(np.abs(l24 @ l24.T - a)) / np.max(np.abs(a)) < 1e-13


def test_distributed_solvers_reject_bad_blocking():
    with pytest.raises(ValueError):  # block not divisible by mesh axis y=4
        solvers.getrf(jnp.ones((100, 100)), block=10, mesh=_mesh_of(2, 4))
    with pytest.raises(ValueError):  # dims not divisible by block
        solvers.potrf(jnp.ones((100, 100)), block=32, mesh=_mesh_of(2, 4))
    with pytest.raises(ValueError):  # RHS cols not divisible by mesh.y
        solvers.trsm(jnp.eye(64), jnp.ones((64, 3)), block=32,
                     mesh=_mesh_of(2, 4))


def test_trsm_trmm_distributed_bit_identical_across_meshes():
    """trsm/trmm with mesh=: substitution/panel update GEMMs through SUMMA,
    bit-identical across mesh shapes, correct vs the solve contract."""
    rng = _rng(33)
    n, nrhs = 128, 8
    t = np.tril(rng.standard_normal((n, n))) + n * np.eye(n)
    b = rng.standard_normal((n, nrhs))
    tj, bj = jnp.asarray(t), jnp.asarray(b)
    x11 = np.asarray(solvers.trsm(tj, bj, num_moduli=12, block=32,
                                  mesh=_mesh_of(1, 1)))
    x24 = np.asarray(solvers.trsm(tj, bj, num_moduli=12, block=32,
                                  mesh=_mesh_of(2, 4)))
    np.testing.assert_array_equal(x11, x24)
    assert np.max(np.abs(t @ x24 - b)) / np.max(np.abs(b)) < 1e-12
    # trmm (sign=+1 accumulation path)
    m11 = np.asarray(solvers.trmm(tj, bj, num_moduli=12, block=32,
                                  mesh=_mesh_of(1, 1)))
    m24 = np.asarray(solvers.trmm(tj, bj, num_moduli=12, block=32,
                                  mesh=_mesh_of(4, 2)))
    np.testing.assert_array_equal(m11, m24)
    assert np.max(np.abs(m24 - t @ b)) / np.max(np.abs(t @ b)) < 1e-12
    # upper/right variants route through the same canonicalized path
    xu = np.asarray(solvers.trsm(jnp.asarray(t.T), bj, lower=False,
                                 num_moduli=12, block=32,
                                 mesh=_mesh_of(2, 4)))
    assert np.max(np.abs(t.T @ xu - b)) / np.max(np.abs(b)) < 1e-12


def test_solve_distributed_end_to_end():
    """solve(mesh=): distributed factorization + local solves + IR,
    including a vector RHS (which a mesh.y>1 trsm would reject)."""
    rng = _rng(34)
    n = 128
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    x = np.asarray(solvers.solve(jnp.asarray(a), jnp.asarray(b),
                                 num_moduli=6, refine_steps=2, block=32,
                                 mesh=_mesh_of(2, 4)))
    assert np.max(np.abs(a @ x - b)) / np.max(np.abs(b)) < 1e-13
    # lu_solve with a wide RHS can itself go distributed
    lu, perm = solvers.getrf(jnp.asarray(a), num_moduli=12, block=32,
                             mesh=_mesh_of(2, 4))
    bb = rng.standard_normal((n, 8))
    xd = np.asarray(solvers.lu_solve(lu, perm, jnp.asarray(bb),
                                     num_moduli=12, block=32,
                                     mesh=_mesh_of(2, 4)))
    assert np.max(np.abs(a @ xd - bb)) / np.max(np.abs(bb)) < 1e-12


def test_inv_matches_numpy_and_distributes():
    rng = _rng(35)
    n = 96
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    ainv = np.asarray(solvers.inv(jnp.asarray(a), num_moduli=14, block=32))
    assert np.max(np.abs(ainv @ a - np.eye(n))) < 1e-12
    assert np.max(np.abs(ainv - np.linalg.inv(a))) / np.max(
        np.abs(ainv)) < 1e-12
    # distributed: factorization + substitution updates through SUMMA,
    # bit-identical across mesh shapes
    n = 128
    a = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    i24 = solvers.inv(a, num_moduli=12, block=32, mesh=_mesh_of(2, 4))
    i42 = solvers.inv(a, num_moduli=12, block=32, mesh=_mesh_of(4, 2))
    np.testing.assert_array_equal(np.asarray(i24), np.asarray(i42))
    assert np.max(np.abs(np.asarray(i24) @ np.asarray(a) - np.eye(n))) < 1e-11


def test_inv_rejects_nonsquare():
    with pytest.raises(ValueError):
        solvers.inv(jnp.ones((4, 6)))


@pytest.mark.parametrize("lower", [True, False])
def test_potrs_solves_from_factor(lower):
    rng = _rng(40)
    n = 96
    a = _spd(rng, n)
    b = rng.standard_normal((n, 5))
    chol = solvers.potrf(jnp.asarray(a), lower=lower, num_moduli=14, block=32)
    x = np.asarray(solvers.potrs(chol, jnp.asarray(b), lower=lower,
                                 num_moduli=14, block=32))
    resid = np.max(np.abs(a @ x - b)) / np.max(np.abs(b))
    assert resid < 1e-12, resid


def test_potrs_vector_rhs_squeezes():
    rng = _rng(41)
    n = 64
    a = _spd(rng, n)
    b = rng.standard_normal(n)
    chol = solvers.potrf(jnp.asarray(a), num_moduli=14, block=32)
    x = solvers.potrs(chol, jnp.asarray(b), num_moduli=14, block=32)
    assert x.ndim == 1
    resid = np.max(np.abs(a @ np.asarray(x) - b)) / np.max(np.abs(b))
    assert resid < 1e-12, resid


def test_posv_refinement_rescues_low_nu():
    """SPD variant of the HPL-MxP pattern: nu=6 Cholesky + high-accuracy
    emulated residuals recover an f64-level solution."""
    rng = _rng(42)
    n = 96
    a = _spd(rng, n)
    b = rng.standard_normal((n,))
    x0 = np.asarray(solvers.posv(jnp.asarray(a), jnp.asarray(b),
                                 num_moduli=6, block=32, refine_steps=0))
    x2 = np.asarray(solvers.posv(jnp.asarray(a), jnp.asarray(b),
                                 num_moduli=6, block=32, refine_steps=2))
    r0 = np.max(np.abs(a @ x0 - b))
    r2 = np.max(np.abs(a @ x2 - b))
    assert r2 < r0 * 1e-2
    assert r2 / np.max(np.abs(b)) < 1e-12


def test_posv_matches_lu_solve_quality_and_rejects_nonsquare():
    rng = _rng(43)
    n = 64
    a = _spd(rng, n)
    b = rng.standard_normal((n, 3))
    x_po = np.asarray(solvers.posv(jnp.asarray(a), jnp.asarray(b),
                                   num_moduli=14, block=32))
    x_lu = np.asarray(solvers.solve(jnp.asarray(a), jnp.asarray(b),
                                    num_moduli=14, block=32))
    want = np.linalg.solve(a, b)
    assert np.max(np.abs(x_po - want)) < 1e-10
    assert np.max(np.abs(x_lu - want)) < 1e-10
    with pytest.raises(ValueError):
        solvers.posv(jnp.ones((4, 3)), jnp.ones(4))


def test_potrf_upper_triangle_only_storage():
    """dpotrf uplo='U' convention: with lower=False only the UPPER triangle
    is read, so LAPACK-style upper-only storage must factor correctly
    (previously the zero subdiagonal silently produced a wrong factor)."""
    rng = _rng(44)
    a = _spd(rng, 96)
    a_upper_only = np.triu(a)
    r = np.asarray(solvers.potrf(jnp.asarray(a_upper_only), lower=False,
                                 num_moduli=14, block=32))
    err = np.max(np.abs(r.T @ r - a)) / np.max(np.abs(a))
    assert err < 1e-13, err
    # and a full symmetric input gives the same bits (a.T == a)
    r_full = np.asarray(solvers.potrf(jnp.asarray(a), lower=False,
                                      num_moduli=14, block=32))
    np.testing.assert_array_equal(r, r_full)


def test_vector_rhs_stays_local_with_mesh():
    """lu_solve/potrs with a 1-D RHS and mesh= must run (docstring contract:
    vector RHS stays local); previously the mesh blocking check raised on
    the width-1 column."""
    rng = _rng(45)
    n = 128
    mesh = _mesh_of(2, 4)
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    lu, perm = solvers.getrf(jnp.asarray(a), num_moduli=12, block=32,
                             mesh=mesh)
    x = np.asarray(solvers.lu_solve(lu, perm, jnp.asarray(b), num_moduli=12,
                                    block=32, mesh=mesh))
    assert np.max(np.abs(a @ x - b)) / np.max(np.abs(b)) < 1e-12
    spd = _spd(rng, n)
    chol = solvers.potrf(jnp.asarray(spd), num_moduli=12, block=32, mesh=mesh)
    xs = np.asarray(solvers.potrs(chol, jnp.asarray(b), num_moduli=12,
                                  block=32, mesh=mesh))
    assert np.max(np.abs(spd @ xs - b)) / np.max(np.abs(b)) < 1e-12

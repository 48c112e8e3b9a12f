"""Eigensolver layer: block-Jacobi svd/eigh over the batched emulated GEMM.

Oracle strategy mirrors test_solvers/test_qr: numpy f64 references; at
nu=14 the emulated Gram/rotation products are more accurate than the
oracle's own rounding, so plain tolerances verify both the algorithm and
the GEMM routing. The nu-dial tests verify the accuracy knob carries
through the iteration (the framework's defining contract).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import eig as eigmod

pytestmark = pytest.mark.slow  # full-lane family; default lane: -m 'not slow'


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(96, 64), (64, 64), (48, 96)])
def test_svd_reconstructs_and_orthogonal(shape):
    rng = _rng(sum(shape))
    a = rng.standard_normal(shape)
    u, s, vt = (np.asarray(x) for x in g8.svd(jnp.asarray(a)))
    m, n = shape
    kmin = min(m, n)
    assert u.shape == (m, kmin) and s.shape == (kmin,) and vt.shape == (kmin, n)
    assert np.all(np.diff(s) <= 0)
    assert np.max(np.abs(u @ np.diag(s) @ vt - a)) / np.max(np.abs(a)) < 1e-11
    assert np.max(np.abs(u.T @ u - np.eye(kmin))) < 1e-11
    assert np.max(np.abs(vt @ vt.T - np.eye(kmin))) < 1e-11


def test_svd_values_match_numpy():
    rng = _rng(2)
    a = rng.standard_normal((80, 48))
    s = np.asarray(g8.svd(jnp.asarray(a), compute_uv=False))
    sref = np.linalg.svd(a, compute_uv=False)
    assert s.shape == sref.shape
    assert np.max(np.abs(s - sref) / sref) < 1e-12


def test_svd_rank_deficient():
    rng = _rng(3)
    a = rng.standard_normal((96, 12)) @ rng.standard_normal((12, 64))
    u, s, vt = (np.asarray(x) for x in g8.svd(jnp.asarray(a)))
    assert np.max(np.abs(u @ np.diag(s) @ vt - a)) / np.max(np.abs(a)) < 1e-11
    # trailing singular values collapse to (near) zero
    assert np.max(s[12:]) < s[0] * 1e-8


def test_svd_f32():
    rng = _rng(4)
    a = rng.standard_normal((64, 64)).astype(np.float32)
    s = np.asarray(g8.svd(jnp.asarray(a), compute_uv=False))
    sref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    assert np.max(np.abs(s - sref) / sref) < 1e-4


def test_svd_nu_dial_carries_through():
    """num_moduli bounds the rotation accuracy and thus the final sigmas."""
    rng = _rng(5)
    a = rng.standard_normal((64, 64))
    sref = np.linalg.svd(a, compute_uv=False)
    e8 = np.max(np.abs(np.asarray(
        g8.svd(jnp.asarray(a), num_moduli=8, compute_uv=False)) - sref) / sref)
    e14 = np.max(np.abs(np.asarray(
        g8.svd(jnp.asarray(a), num_moduli=14, compute_uv=False)) - sref) / sref)
    assert e14 < e8 * 1e-3


def test_eigh_matches_numpy():
    rng = _rng(6)
    m = rng.standard_normal((80, 80))
    sym = (m + m.T) / 2
    w, v = (np.asarray(x) for x in g8.eigh(jnp.asarray(sym)))
    wref = np.linalg.eigvalsh(sym)
    scale = np.max(np.abs(wref))
    assert np.all(np.diff(w) >= 0)
    assert np.max(np.abs(w - wref)) / scale < 1e-12
    assert np.max(np.abs(sym @ v - v * w[None, :])) / scale < 1e-12
    assert np.max(np.abs(v.T @ v - np.eye(80))) < 1e-12


def test_eigh_indefinite_and_clustered():
    """Sign-indefinite spectrum with a repeated eigenvalue."""
    rng = _rng(7)
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    wtrue = np.concatenate([np.full(8, -3.0), np.linspace(-1, 1, 48),
                            np.full(8, 5.0)])
    sym = (q * wtrue[None, :]) @ q.T
    sym = (sym + sym.T) / 2
    w, v = (np.asarray(x) for x in g8.eigh(jnp.asarray(sym)))
    assert np.max(np.abs(w - np.sort(wtrue))) < 1e-12
    assert np.max(np.abs(sym @ v - v * w[None, :])) < 1e-11


def test_eigh_bit_reproducible():
    rng = _rng(8)
    m = rng.standard_normal((48, 48))
    sym = jnp.asarray((m + m.T) / 2)
    w1, v1 = g8.eigh(sym, num_moduli=12)
    w2, v2 = g8.eigh(sym, num_moduli=12)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))


def test_eig_rejects_bad_inputs():
    with pytest.raises(ValueError):
        g8.eigh(jnp.ones((4, 6)))
    with pytest.raises(ValueError):  # block must divide n
        g8.svd(jnp.ones((32, 30)), block=7)


# ---------------------------------------------------------------------------
# complex dtypes (zheev/zgesvd analogs): same schedules, conjugate algebra
# ---------------------------------------------------------------------------

def _crandn(rng, shape, dtype):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(dtype)


@pytest.mark.parametrize("shape", [(96, 64), (64, 64), (48, 96)])
def test_zsvd_reconstructs_and_unitary(shape):
    rng = _rng(sum(shape) + 1000)
    a = _crandn(rng, shape, np.complex128)
    u, s, vt = (np.asarray(x) for x in g8.svd(jnp.asarray(a)))
    m, n = shape
    kmin = min(m, n)
    assert u.shape == (m, kmin) and s.shape == (kmin,) and vt.shape == (kmin, n)
    assert s.dtype == np.float64          # singular values are real
    assert np.all(np.diff(s) <= 0)
    assert np.max(np.abs(u @ np.diag(s) @ vt - a)) / np.max(np.abs(a)) < 1e-11
    assert np.max(np.abs(u.conj().T @ u - np.eye(kmin))) < 1e-11
    assert np.max(np.abs(vt @ vt.conj().T - np.eye(kmin))) < 1e-11


def test_zsvd_values_match_numpy():
    rng = _rng(1002)
    a = _crandn(rng, (80, 48), np.complex128)
    s = np.asarray(g8.svd(jnp.asarray(a), compute_uv=False))
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.max(np.abs(s - sref) / sref) < 1e-12


def test_zheev_matches_numpy():
    rng = _rng(1003)
    m = _crandn(rng, (80, 80), np.complex128)
    herm = (m + m.conj().T) / 2
    w, v = (np.asarray(x) for x in g8.eigh(jnp.asarray(herm)))
    assert w.dtype == np.float64          # Hermitian: eigenvalues are real
    wref = np.linalg.eigvalsh(herm)
    assert np.max(np.abs(w - wref)) / np.max(np.abs(wref)) < 1e-13
    resid = np.max(np.abs(herm @ v - v * w[None, :]))
    assert resid / np.max(np.abs(wref)) < 1e-12
    assert np.max(np.abs(v.conj().T @ v - np.eye(80))) < 1e-11


def test_cheev_csvd_f32():
    rng = _rng(1004)
    a = _crandn(rng, (64, 64), np.complex64)
    s = np.asarray(g8.svd(jnp.asarray(a), compute_uv=False))
    sref = np.linalg.svd(a.astype(np.complex128), compute_uv=False)
    assert np.max(np.abs(s - sref) / sref) < 1e-4
    herm = ((a + a.conj().T) / 2).astype(np.complex64)
    w, _ = g8.eigh(jnp.asarray(herm))
    wref = np.linalg.eigvalsh(herm.astype(np.complex128))
    assert np.max(np.abs(np.asarray(w) - wref)) / np.max(np.abs(wref)) < 1e-4


def test_zsvd_distributed_bit_identical_across_meshes():
    rng = _rng(1005)
    a = jnp.asarray(_crandn(rng, (160, 128), np.complex128))
    s1 = g8.svd(a, block=8, compute_uv=False, mesh=_mesh_of(1, 1))
    s8 = g8.svd(a, block=8, compute_uv=False, mesh=_mesh_of(2, 4))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s8))
    sref = np.linalg.svd(np.asarray(a), compute_uv=False)
    assert np.max(np.abs(np.asarray(s8) - sref) / sref) < 1e-11


def test_round_robin_covers_all_pairs():
    for nb in (2, 3, 4, 5, 8):
        rounds = eigmod._round_robin(nb)
        seen = set()
        for pairs in rounds:
            ids = [i for p in pairs for i in p]
            assert len(ids) == len(set(ids))  # disjoint within a round
            seen |= set(pairs)
        want = {(i, j) for i in range(nb) for j in range(i + 1, nb)}
        assert seen == want


# ---------------------------------------------------------------------------
# distributed (mesh=): pair-batch sharding
# ---------------------------------------------------------------------------

def _mesh_of(x, y):
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[: x * y]).reshape(x, y)
    return Mesh(devs, ("x", "y"))


def test_svd_distributed_bit_identical_across_meshes():
    """mesh= shards the round's independent pair GEMMs over devices
    (no collectives); every mesh shape computes identical bits."""
    rng = _rng(20)
    a = jnp.asarray(rng.standard_normal((160, 128)))
    # block=8 -> 16 column blocks -> 8 pairs/round: divisible by 1/4/8
    s1 = g8.svd(a, block=8, compute_uv=False, mesh=_mesh_of(1, 1))
    s4 = g8.svd(a, block=8, compute_uv=False, mesh=_mesh_of(2, 2))
    s8 = g8.svd(a, block=8, compute_uv=False, mesh=_mesh_of(2, 4))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s4))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s8))
    sref = np.linalg.svd(np.asarray(a), compute_uv=False)
    assert np.max(np.abs(np.asarray(s8) - sref) / sref) < 1e-11


def test_eigh_distributed_matches_local():
    rng = _rng(21)
    m = rng.standard_normal((64, 64))
    sym = jnp.asarray((m + m.T) / 2)
    w_loc, v_loc = g8.eigh(sym, block=8)            # 8 blocks -> 4 pairs
    w_dis, v_dis = g8.eigh(sym, block=8, mesh=_mesh_of(2, 2))
    np.testing.assert_array_equal(np.asarray(w_loc), np.asarray(w_dis))
    np.testing.assert_array_equal(np.asarray(v_loc), np.asarray(v_dis))


def test_eig_distributed_rejects_indivisible_pairs():
    with pytest.raises(ValueError):  # 4 pairs/round, 8 devices
        g8.svd(jnp.ones((64, 64)), block=8, mesh=_mesh_of(2, 4))


def test_small_n_default_block_correct():
    """n <= 8 with the default block previously picked block == n (a single
    block, zero rotation pairs): eigh silently returned the sorted diagonal
    and svd crashed. The block picker must always give >= 2 blocks."""
    rng = np.random.default_rng(48)
    g = rng.standard_normal((8, 8))
    sym = (g + g.T) / 2
    w, v = eigmod.eigh(jnp.asarray(sym), num_moduli=14)
    want = np.linalg.eigvalsh(sym)
    assert np.max(np.abs(np.asarray(w) - want)) < 1e-10
    resid = np.max(np.abs(sym @ np.asarray(v) - np.asarray(v) * np.asarray(w)))
    assert resid < 1e-9
    u, s, vt = eigmod.svd(jnp.asarray(g), num_moduli=14)
    assert np.max(np.abs(np.asarray(s) - np.linalg.svd(g, compute_uv=False))) < 1e-10


def test_single_block_raises_and_n1_exact():
    rng = np.random.default_rng(49)
    g = rng.standard_normal((8, 8))
    with pytest.raises(ValueError):
        eigmod.eigh(jnp.asarray((g + g.T) / 2), block=8)
    w, v = eigmod.eigh(jnp.asarray([[3.5]]))
    assert float(w[0]) == 3.5 and float(v[0, 0]) == 1.0
    u, s, vt = eigmod.svd(jnp.asarray([[-2.0]]))
    assert float(s[0]) == 2.0
    np.testing.assert_allclose(np.asarray(u) * s @ np.asarray(vt),
                               [[-2.0]], atol=0)


def test_f32_zero_matrix_converges_immediately():
    """f32 eigh of the zero matrix: the old 1e-300 guard underflowed to 0
    in f32, 0/0 = NaN never met the stop test, and all max_sweeps ran."""
    w, v = eigmod.eigh(jnp.zeros((64, 64), jnp.float32), max_sweeps=3)
    assert np.all(np.asarray(w) == 0)
    assert np.all(np.isfinite(np.asarray(v)))

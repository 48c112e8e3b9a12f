"""QR layer: blocked Householder / compact-WY over the emulated GEMM.

Oracle strategy mirrors test_solvers.py: numpy f64 references; the
emulator at nu=14 is strictly more accurate than the oracle's own
rounding, so plain relative-error tolerances at the 1e-12 level verify
both the algorithm and the GEMM routing.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import importlib

pytestmark = pytest.mark.slow  # full-lane family; default lane: -m 'not slow'

# the package re-exports the qr() FUNCTION under the same name as the
# submodule, so fetch the module through the import system
qrmod = importlib.import_module("gemmul8_tpu.qr")


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape,block", [
    ((96, 64), 32),    # tall, multi-block
    ((128, 128), 48),  # square, ragged last block
    ((64, 96), 32),    # wide (kmin = m)
    ((48, 32), 64),    # single block: pure native panel, no update GEMM
])
def test_qr_reconstructs_and_orthogonal(shape, block):
    rng = _rng(sum(shape))
    m, n = shape
    a = rng.standard_normal((m, n))
    q, r = qrmod.qr(jnp.asarray(a), num_moduli=14, block=block)
    q, r = np.asarray(q), np.asarray(r)
    kmin = min(m, n)
    assert q.shape == (m, kmin) and r.shape == (kmin, n)
    assert np.allclose(np.tril(r[:, :kmin], -1), 0)
    assert np.max(np.abs(q @ r - a)) / np.max(np.abs(a)) < 1e-13
    assert np.max(np.abs(q.T @ q - np.eye(kmin))) < 1e-13


def test_geqrf_packed_layout_matches_contract():
    """R in the upper triangle; ormqr(eye) rebuilds the same Q that
    reconstructs A (the packed format is self-consistent, LAPACK-style)."""
    rng = _rng(5)
    m, n = 96, 96
    a = rng.standard_normal((m, n))
    packed, taus = qrmod.geqrf(jnp.asarray(a), num_moduli=14, block=32)
    assert np.asarray(taus).shape == (n,)
    r = np.triu(np.asarray(packed))
    q = np.asarray(qrmod.ormqr(packed, taus, jnp.eye(m), num_moduli=14,
                               block=32))
    assert np.max(np.abs(q @ r - a)) / np.max(np.abs(a)) < 1e-13


def test_ormqr_trans_roundtrip():
    """Q^T (Q C) == C: the two application orders invert each other."""
    rng = _rng(6)
    m = 96
    a = rng.standard_normal((m, 64))
    c = rng.standard_normal((m, 8))
    packed, taus = qrmod.geqrf(jnp.asarray(a), num_moduli=14, block=32)
    qc = qrmod.ormqr(packed, taus, jnp.asarray(c), trans=False,
                     num_moduli=14, block=32)
    back = np.asarray(qrmod.ormqr(packed, taus, qc, trans=True,
                                  num_moduli=14, block=32))
    assert np.max(np.abs(back - c)) / np.max(np.abs(c)) < 1e-13


@pytest.mark.parametrize("nrhs", [None, 3])
def test_lstsq_matches_numpy(nrhs):
    rng = _rng(7)
    m, n = 120, 40
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m if nrhs is None else (m, nrhs))
    x = np.asarray(qrmod.lstsq(jnp.asarray(a), jnp.asarray(b),
                               num_moduli=14, block=16))
    ref = np.linalg.lstsq(a, b, rcond=None)[0]
    assert x.shape == ref.shape
    assert np.max(np.abs(x - ref)) / np.max(np.abs(ref)) < 1e-11


def test_qr_f32():
    rng = _rng(8)
    a = rng.standard_normal((96, 48)).astype(np.float32)
    q, r = qrmod.qr(jnp.asarray(a), num_moduli=9, block=32)
    q64 = np.asarray(q).astype(np.float64)
    err = np.max(np.abs(q64 @ np.asarray(r) - a)) / np.max(np.abs(a))
    assert err < 1e-6
    assert np.max(np.abs(q64.T @ q64 - np.eye(48))) < 1e-6


def test_qr_nu_dial_carries_through():
    """num_moduli dials the trailing-update accuracy end to end."""
    rng = _rng(9)
    a = rng.standard_normal((128, 128))
    aj = jnp.asarray(a)
    q4, r4 = (np.asarray(x) for x in qrmod.qr(aj, num_moduli=4, block=32))
    q14, r14 = (np.asarray(x) for x in qrmod.qr(aj, num_moduli=14, block=32))
    e4 = np.max(np.abs(q4 @ r4 - a))
    e14 = np.max(np.abs(q14 @ r14 - a))
    assert e14 < e4 * 1e-3


def test_qr_bit_reproducible():
    rng = _rng(10)
    a = jnp.asarray(rng.standard_normal((96, 64)))
    q1, r1 = qrmod.qr(a, num_moduli=10, block=32)
    q2, r2 = qrmod.qr(a, num_moduli=10, block=32)
    assert np.array_equal(np.asarray(q1), np.asarray(q2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))


def test_qr_accepts_complex_and_rejects_bad_shapes():
    # complex geqrf is SUPPORTED since the zgeqrf-analog landed (full
    # correctness coverage in test_solvers_complex.py::test_zgeqrf_*)
    packed_c, taus_c = qrmod.geqrf(jnp.eye(4, dtype=jnp.complex64) * 2)
    assert packed_c.dtype == jnp.complex64 and taus_c.shape == (4,)
    with pytest.raises(ValueError):
        qrmod.geqrf(jnp.ones(4))
    with pytest.raises(ValueError):  # lstsq needs m >= n
        qrmod.lstsq(jnp.ones((3, 5)), jnp.ones(3))
    with pytest.raises(ValueError):  # C row mismatch
        packed, taus = qrmod.geqrf(jnp.ones((8, 4)) + jnp.eye(8, 4))
        qrmod.ormqr(packed, taus, jnp.ones((9, 2)))


# ---------------------------------------------------------------------------
# distributed (mesh=)
# ---------------------------------------------------------------------------

def _mesh_of(x, y):
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[: x * y]).reshape(x, y)
    return Mesh(devs, ("x", "y"))


def test_qr_distributed_bit_identical_across_meshes():
    """geqrf/qr with mesh=: block-reflector Gram products and trailing
    updates through SUMMA, same bits on every mesh shape."""
    rng = _rng(31)
    a = jnp.asarray(rng.standard_normal((128, 128)))
    q11, r11 = qrmod.qr(a, num_moduli=12, block=32, mesh=_mesh_of(1, 1))
    q24, r24 = qrmod.qr(a, num_moduli=12, block=32, mesh=_mesh_of(2, 4))
    q42, r42 = qrmod.qr(a, num_moduli=12, block=32, mesh=_mesh_of(4, 2))
    np.testing.assert_array_equal(np.asarray(q11), np.asarray(q24))
    np.testing.assert_array_equal(np.asarray(q11), np.asarray(q42))
    np.testing.assert_array_equal(np.asarray(r11), np.asarray(r24))
    qn, rn = np.asarray(q24), np.asarray(r24)
    an = np.asarray(a)
    # nu=12 trailing updates carry ~1e-13-level emulation error (the local
    # tests use nu=14 with 1e-13 bounds; the dial test covers the scaling)
    assert np.max(np.abs(qn @ rn - an)) / np.max(np.abs(an)) < 1e-11
    assert np.max(np.abs(qn.T @ qn - np.eye(128))) < 1e-11


def test_qr_distributed_rejects_bad_blocking():
    with pytest.raises(ValueError):  # dims not divisible by block
        qrmod.geqrf(jnp.ones((100, 100)), block=32, mesh=_mesh_of(2, 4))
    with pytest.raises(ValueError):  # RHS cols not divisible by mesh.y
        packed, taus = qrmod.geqrf(jnp.eye(64) * 2, num_moduli=12, block=32)
        qrmod.ormqr(packed, taus, jnp.ones((64, 3)), block=32,
                    mesh=_mesh_of(2, 4))


def test_lstsq_distributed_factorization():
    """lstsq(mesh=): distributed geqrf, local Q^T b + triangular solve."""
    rng = _rng(32)
    m, n = 128, 64
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    x = np.asarray(qrmod.lstsq(jnp.asarray(a), jnp.asarray(b),
                               num_moduli=12, block=32, mesh=_mesh_of(2, 4)))
    ref = np.linalg.lstsq(a, b, rcond=None)[0]
    assert np.max(np.abs(x - ref)) / np.max(np.abs(ref)) < 1e-11


def test_square_qr_tau_zero_exact_limit():
    """Every square matrix's final reflector has tau == 0 (dlarfg with an
    empty tail => H = I); the closed-form T must take the exact limit
    (zero row/column) with no inf/NaN on any backend. An already-upper-
    triangular input drives tau == 0 for EVERY reflector: Q must be
    exactly I and R exactly A."""
    import gemmul8_tpu as g8
    rng = np.random.default_rng(46)
    n = 64
    a = np.triu(rng.standard_normal((n, n))) + n * np.eye(n)
    q, r = g8.qr(jnp.asarray(a), num_moduli=14, block=32)
    q, r = np.asarray(q), np.asarray(r)
    assert np.array_equal(q, np.eye(n)), "all-tau-zero Q must be exactly I"
    assert np.array_equal(r, a)
    # generic square matrix: finite everywhere, accurate reconstruction
    a2 = rng.standard_normal((n, n))
    q2, r2 = g8.qr(jnp.asarray(a2), num_moduli=14, block=32)
    q2, r2 = np.asarray(q2), np.asarray(r2)
    assert np.all(np.isfinite(q2))
    assert np.max(np.abs(q2 @ r2 - a2)) / np.max(np.abs(a2)) < 1e-13


def test_ormqr_ts_mismatch_raises():
    import gemmul8_tpu as g8
    rng = np.random.default_rng(47)
    a = rng.standard_normal((64, 64))
    packed, taus = g8.geqrf(jnp.asarray(a), num_moduli=10, block=32)
    with pytest.raises(ValueError):
        g8.ormqr(packed, taus, jnp.eye(64), num_moduli=10, block=16,
                 ts=[None, None])

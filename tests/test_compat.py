"""Reference-signature compat layer (gemmul8_tpu.compat vs include/gemmul8.hpp).

Checks cuBLAS column-major ld-strided buffer semantics, in-place C update,
op chars, alpha/beta, the FP8 entry split (gemm rejects / gemmLt accepts),
skip-scal handle caching, and bit-identity with the functional core API.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import gemmul8_tpu as g8
from gemmul8_tpu import compat


def _colmajor_buf(mat: np.ndarray, ld: int) -> np.ndarray:
    """Pack a logical (rows, cols) matrix into a 1-D column-major buffer
    with leading dimension ld >= rows (padding poisoned with a sentinel)."""
    rows, cols = mat.shape
    assert ld >= rows
    buf = np.full(ld * cols, 7777.0, mat.dtype)
    view = buf.reshape(cols, ld).T[:rows]
    np.copyto(view, mat)
    return buf


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_worksize_positive_and_split():
    total, wa, wb = compat.workSize(128, 96, 64, 8, return_split=True)
    assert total > 0 and wa > 0 and wb > 0
    # skip-enabled sides reserve an extra plane set (gemmul8_real.hpp:28-29)
    assert compat.workSize(128, 96, 64, 8, True, False) == total + wa
    assert compat.workSize(128, 96, 64, 8, False, True) == total + wb
    with pytest.raises(ValueError):
        compat.workSize(0, 8, 8, 8)
    with pytest.raises(ValueError):
        compat.workSize(8, 8, 8, 99)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_gemm_strided_matches_core(dtype):
    m, n, k = 33, 21, 40
    r = _rng(1)
    a = r.standard_normal((m, k)).astype(dtype)
    b = r.standard_normal((k, n)).astype(dtype)
    lda, ldb, ldc = m + 3, k + 5, m + 2
    abuf = _colmajor_buf(a, lda)
    bbuf = _colmajor_buf(b, ldb)
    cbuf = _colmajor_buf(np.zeros((m, n), dtype), ldc)
    times = compat.gemm(None, "N", "N", m, n, k, 1.0, abuf, lda, bbuf, ldb,
                        0.0, cbuf, ldc, num_moduli=8, fastmode=True)
    assert times == [0.0, 0.0, 0.0, 0.0]
    got = cbuf.reshape(n, ldc).T[:m]
    want = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8))
    np.testing.assert_array_equal(got, want)  # bitwise: same compute path
    # ld padding rows must be untouched
    assert np.all(cbuf.reshape(n, ldc).T[m:] == 7777.0)


@pytest.mark.parametrize("op_a,op_b", [("T", "N"), ("N", "T"), ("T", "T")])
def test_gemm_ops_alpha_beta(op_a, op_b):
    m, n, k = 17, 19, 23
    r = _rng(2)
    a_log = r.standard_normal((m, k))
    b_log = r.standard_normal((k, n))
    c0 = r.standard_normal((m, n))
    a_stored = a_log.T.copy() if op_a == "T" else a_log
    b_stored = b_log.T.copy() if op_b == "T" else b_log
    c = c0.copy()
    compat.gemm(None, op_a, op_b, m, n, k, -1.5, a_stored, a_stored.shape[0],
                b_stored, b_stored.shape[0], 1.2, c, m,
                num_moduli=12, fastmode=True)
    want = np.asarray(g8.gemm(jnp.asarray(a_log), jnp.asarray(b_log),
                              num_moduli=12, alpha=-1.5, beta=1.2,
                              c=jnp.asarray(c0)))
    np.testing.assert_array_equal(c, want)


def test_gemm_complex_conjugate_op():
    m = n = k = 12
    r = _rng(3)
    a = (r.standard_normal((k, m)) + 1j * r.standard_normal((k, m)))
    b = (r.standard_normal((k, n)) + 1j * r.standard_normal((k, n)))
    c = np.zeros((m, n), np.complex128)
    compat.gemm(None, "C", "N", m, n, k, 1.0, a, k, b, k, 0.0, c, m,
                num_moduli=14, fastmode=True)
    want = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=14,
                              trans_a="C"))
    np.testing.assert_array_equal(c, want)
    ref = a.conj().T @ b
    assert np.max(np.abs(c - ref)) / np.max(np.abs(ref)) < 1e-12


def test_gemm_rejects_fp8_gemmlt_accepts():
    m = n = k = 16
    r = _rng(4)
    a = r.standard_normal((m, k))
    b = r.standard_normal((k, n))
    c = np.zeros((m, n))
    with pytest.raises(ValueError, match="FP8"):
        compat.gemm(None, "N", "N", m, n, k, 1.0, a, m, b, k, 0.0, c, m,
                    num_moduli=8, fastmode=True, backend="FP8")
    compat.gemmLt(None, "N", "N", m, n, k, 1.0, a, m, b, k, 0.0, c, m,
                  num_moduli=8, fastmode=True, backend="FP8")
    ref = a @ b
    # nu=8 on FP8 is a mid-accuracy setting; this test checks the entry
    # split (gemm rejects FP8, gemmLt drives it), not the accuracy dial
    assert np.max(np.abs(c - ref)) / np.max(np.abs(ref)) < 1e-6


def test_gemm_requires_writable_numpy_c():
    a = np.zeros((4, 4))
    with pytest.raises(TypeError, match="writable numpy"):
        compat.gemm(None, "N", "N", 4, 4, 4, 1.0, a, 4, a, 4, 0.0,
                    jnp.zeros((4, 4)), 4, num_moduli=8, fastmode=True)
    ro = np.zeros((4, 4))
    ro.flags.writeable = False
    with pytest.raises(TypeError, match="writable numpy"):
        compat.gemm(None, "N", "N", 4, 4, 4, 1.0, a, 4, a, 4, 0.0,
                    ro, 4, num_moduli=8, fastmode=True)


def test_skip_scal_cache_reuse_bitwise():
    m, n, k = 24, 18, 32
    r = _rng(5)
    a = r.standard_normal((m, k))
    b1 = r.standard_normal((k, n))
    b2 = r.standard_normal((k, n))
    h = compat.create()
    c_ref = np.zeros((m, n))
    compat.gemm(h, "N", "N", m, n, k, 1.0, a, m, b1, k, 0.0, c_ref, m,
                num_moduli=8, fastmode=True, enable_skip_scalA=True)
    assert len(h._cache) >= 1  # A planes cached for reuse
    # second call with a different B, skipping A preprocessing
    c1 = np.zeros((m, n))
    compat.gemm(h, "N", "N", m, n, k, 1.0, a, m, b2, k, 0.0, c1, m,
                num_moduli=8, fastmode=True, enable_skip_scalA=True,
                skip_scalA=True)
    # must equal the non-skip quantized-path result bitwise
    c2 = np.zeros((m, n))
    h2 = compat.create()
    compat.gemm(h2, "N", "N", m, n, k, 1.0, a, m, b2, k, 0.0, c2, m,
                num_moduli=8, fastmode=True, enable_skip_scalA=True)
    np.testing.assert_array_equal(c1, c2)
    compat.destroy(h)
    assert len(h._cache) == 0


def test_with_timing_phase_vector():
    m = n = k = 64
    r = _rng(6)
    a = r.standard_normal((m, k))
    b = r.standard_normal((k, n))
    c = np.zeros((m, n))
    times = compat.gemm(None, "N", "N", m, n, k, 1.0, a, m, b, k, 0.0, c, m,
                        num_moduli=14, fastmode=True, with_timing=True)
    assert len(times) == 4 and all(t > 0 for t in times)
    ref = a @ b
    assert np.max(np.abs(c - ref)) / np.max(np.abs(ref)) < 1e-12


def test_1d_and_2d_buffers_agree():
    m, n, k = 9, 11, 13
    r = _rng(7)
    a = r.standard_normal((m, k))
    b = r.standard_normal((k, n))
    c_2d = np.zeros((m, n))
    compat.gemm(None, "N", "N", m, n, k, 1.0, a, m, b, k, 0.0, c_2d, m,
                num_moduli=8, fastmode=True)
    c_1d = np.zeros(m * n)
    compat.gemm(None, "N", "N", m, n, k, 1.0,
                _colmajor_buf(a, m), m, _colmajor_buf(b, k), k,
                0.0, c_1d, m, num_moduli=8, fastmode=True)
    np.testing.assert_array_equal(c_1d.reshape(n, m).T, c_2d)


def test_accurate_mode_and_validation():
    m = n = k = 20
    r = _rng(8)
    a = r.standard_normal((m, k))
    b = r.standard_normal((k, n))
    c = np.zeros((m, n))
    compat.gemm(None, "N", "N", m, n, k, 1.0, a, m, b, k, 0.0, c, m,
                num_moduli=10, fastmode=False)
    want = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=10,
                              fastmode=False))
    np.testing.assert_array_equal(c, want)
    with pytest.raises(ValueError, match="num_moduli"):
        compat.gemm(None, "N", "N", m, n, k, 1.0, a, m, b, k, 0.0, c, m,
                    num_moduli=25, fastmode=True)
    with pytest.raises(ValueError, match="ops"):
        compat.gemm(None, "X", "N", m, n, k, 1.0, a, m, b, k, 0.0, c, m,
                    num_moduli=8, fastmode=True)
    with pytest.raises(ValueError, match="ld"):
        compat.gemm(None, "N", "N", m, n, k, 1.0, a.ravel(), m - 1, b, k,
                    0.0, c, m, num_moduli=8, fastmode=True)

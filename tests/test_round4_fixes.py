"""Round-4 hardening: complex accurate-shift estimation overflow past the
int32-exact k bound, and the TPU panel-LU fallback (the tested TPU stack
implements LuDecomposition only for F32/C64 -- f64 getrf needs its own
panel factorization)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import complex_gemm, quantize, solvers, tables

RNG = np.random.default_rng(44)


def test_complex_accu_estimation_large_k_no_overflow():
    """The 3M product-bound estimation dots at k past ~5e5 overflowed a
    plain int32 dot (uAr@uBr + uAi@uBi <= 2 * 65^2 * k wraps from k ~ 2.5e5
    with adversarial extracts); routed through estimate_gemm's chunking +
    the f32 combine, the shifts stay true upper bounds for any k."""
    k = 600_000
    # adversarial: every extract hits the 65 maximum -> values just below
    # amax with the worst mantissa; plain sign-mixed data also covered below
    ar = np.full((2, k), 0.999999)
    ai = np.full((2, k), 0.999999)
    br = np.full((k, 2), 0.999999)
    bi = np.full((k, 2), 0.999999)
    sft_a, sft_b = complex_gemm._shift_complex_accu(
        jnp.asarray(ar), jnp.asarray(ai), jnp.asarray(br), jnp.asarray(bi),
        16, tables.Backend.INT8)
    # true |C| bound: 2 * k * 1 = 1.2e6 ~ 2^20.2; the shift must leave
    # log2P - margin minus ~>= 20 bits of headroom. An int32 wrap would have
    # produced a bogus small bound -> a much LARGER sft.
    log2p = tables.log2P(16, tables.Backend.INT8)
    max_allowed = int(np.floor(log2p - 0.5 * np.log2(2 * k)))
    assert int(np.max(np.asarray(sft_a))) <= max_allowed
    assert int(np.max(np.asarray(sft_b))) <= max_allowed
    # end-to-end: the product is exact for small-integer complex data even
    # at this k (residue chunking) -- shifts must not wrap the CRT
    m = 4
    a = (RNG.integers(-2, 3, (m, k)) + 1j * RNG.integers(-2, 3, (m, k))
         ).astype(np.complex128)
    b = (RNG.integers(-2, 3, (k, m)) + 1j * RNG.integers(-2, 3, (k, m))
         ).astype(np.complex128)
    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=18,
                           fastmode=False))
    np.testing.assert_array_equal(c, a @ b)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_panel_lu_unblocked_matches_native(dtype):
    m, b = 96, 48
    a = RNG.standard_normal((m, b))
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * RNG.standard_normal((m, b))
    a = jnp.asarray(a.astype(dtype))
    lu_u, perm_u = solvers._panel_lu_unblocked(a)
    lu_u, perm_u = np.asarray(lu_u), np.asarray(perm_u)
    # reconstruct: L (m,b unit-lower trapezoid) @ U (b,b upper) == P A
    lfull = np.tril(lu_u, -1)
    np.fill_diagonal(lfull, 1.0)
    u = np.triu(lu_u[:b])
    pa = np.asarray(a)[perm_u]
    err = np.max(np.abs(lfull @ u - pa)) / np.max(np.abs(pa))
    assert err < 1e-13
    # pivot growth sanity: |L| <= 1 off-diagonal (partial pivoting held)
    assert np.max(np.abs(lfull)) <= 1.0 + 1e-12


def test_panel_lu_recursive_matches_quality():
    """The TPU-path recursion (emulated-GEMM updates + unblocked base) on a
    tall panel, run here on CPU: residual quality matches native lu."""
    m, b = 320, 160
    a = jnp.asarray(RNG.standard_normal((m, b)))
    lu_r, perm_r = solvers._panel_lu_rec(a, 14, "robust",
                                         tables.Backend.INT8)
    lu_r, perm_r = np.asarray(lu_r), np.asarray(perm_r)
    lfull = np.tril(lu_r, -1)
    np.fill_diagonal(lfull, 1.0)
    u = np.triu(lu_r[:b])
    pa = np.asarray(a)[perm_r]
    err = np.max(np.abs(lfull @ u - pa)) / np.max(np.abs(pa))
    assert err < 1e-12
    assert sorted(perm_r.tolist()) == list(range(m))


def test_panel_lu_zero_column():
    """A structurally singular panel must not produce NaN/Inf."""
    a = np.asarray(RNG.standard_normal((16, 8)))
    a[:, 3] = 0.0
    lu_u, perm_u = solvers._panel_lu_unblocked(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(lu_u)))

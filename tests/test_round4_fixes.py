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
def test_panel_lu_tpu_path_matches_quality(dtype):
    """The TPU-path panel LU (f32/c64 pivot order + unpivoted full-precision
    block recursion with emulated-GEMM updates), run here on CPU: the
    reconstruction P A = L U must hold to full precision and the pivots
    must bound |L| (partial-pivoting growth)."""
    m, b = 320, 160
    a = RNG.standard_normal((m, b))
    if np.issubdtype(dtype, np.complexfloating):
        a = a + 1j * RNG.standard_normal((m, b))
    a = jnp.asarray(a.astype(dtype))
    lu_r, perm_r = solvers._panel_lu_tpu(a, 14, "robust",
                                         tables.Backend.INT8)
    lu_r, perm_r = np.asarray(lu_r), np.asarray(perm_r)
    lfull = np.tril(lu_r, -1)
    np.fill_diagonal(lfull, 1.0)
    u = np.triu(lu_r[:b])
    pa = np.asarray(a)[perm_r]
    err = np.max(np.abs(lfull @ u - pa)) / np.max(np.abs(pa))
    assert err < 1e-12
    assert sorted(perm_r.tolist()) == list(range(m))
    # f32-selected pivots give THRESHOLD-pivoting-grade |L| (strict partial
    # pivoting would give <= 1; f32-vs-f64 trailing-update divergence at
    # cancellation-heavy entries measured ~1.4 max on random panels)
    assert np.max(np.abs(lfull)) <= 4.0


def test_panel_lu_base_zero_column():
    """A structurally singular square base must not produce NaN/Inf
    (safe-divide guard)."""
    a = np.asarray(RNG.standard_normal((16, 16)))
    a[:, 3] = 0.0
    lu_u = solvers._panel_lu_nopiv_base(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(lu_u)))

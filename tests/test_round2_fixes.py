"""Regression tests for the round-2 correctness fixes (ADVICE.md + VERDICT.md):

  * eager plane-cache keyed on dimension_numbers (wrong-canonicalization reuse)
  * shift_fast overflow guard for f64 |x| > f32max
  * beta=0 never reads C (NaN-in-C safe); beta=1 exact add
  * gemm rejects non-2D operands
  * GEMMUL8_* env changes take effect without manual refresh()
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import core, hook, quantize


@pytest.fixture
def hooked():
    hook.install()
    hook.clear_plane_cache()
    yield
    hook.uninstall()
    for k in list(os.environ):
        if k.startswith("GEMMUL8_"):
            del os.environ[k]


def test_eager_cache_different_dimension_numbers(hooked):
    """ADVICE high: two eager dot_generals on the same array object with
    different contraction axes must not share cached planes."""
    os.environ["GEMMUL8_NUM_MOD_D"] = "12"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 48)))
    y = jnp.asarray(rng.standard_normal((48, 32)))
    y2 = jnp.asarray(rng.standard_normal((64, 32)))
    r1 = jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())))
    r2 = jax.lax.dot_general(x, y2, (((0,), (0,)), ((), ())))  # x.T @ y2
    ref1 = np.asarray(x) @ np.asarray(y)
    ref2 = np.asarray(x).T @ np.asarray(y2)
    assert np.max(np.abs(np.asarray(r1) - ref1)) < 1e-9
    assert np.max(np.abs(np.asarray(r2) - ref2)) < 1e-9


def test_eager_cache_still_hits(hooked):
    os.environ["GEMMUL8_NUM_MOD_D"] = "12"
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 48)))
    y = jnp.asarray(rng.standard_normal((48, 32)))
    dn = (((1,), (0,)), ((), ()))
    before = hook.cache_hits
    jax.lax.dot_general(x, y, dn)
    jax.lax.dot_general(x, y, dn)
    assert hook.cache_hits >= before + 2  # both operands reused on 2nd call


def test_shift_fast_huge_f64():
    """ADVICE medium: f64 inputs with |x| > f32max must not produce garbage.

    Semantics note (verified against the reference formula,
    scaling_fast_real.hpp:6-22, and against the pre-f32 round-1 code): FAST
    mode's shift formula is scale-SENSITIVE by design -- rows with
    amax*norm above ~2^log2P quantize toward zero even in the reference (its
    own Tilogb<float>(amax) saturates for |x| > f32max). The bug was that
    the f32 downcast turned amax into inf and the shift into an overflowed
    int (2147483520), producing silently-wrong values; the fix restores the
    formula's graceful degradation. ACCURATE mode (product-magnitude
    estimation) is the robust path for extreme scales and must be exact."""
    if jax.default_backend() != "cpu":
        pytest.skip("true-f64 regime is CPU-only")
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((32, 40)) * 1e60)
    b = jnp.asarray(rng.standard_normal((40, 24)) * 1e-30)
    ref = np.asarray(a) @ np.asarray(b)

    # fast mode: finite output, graceful formula degradation (underflows to
    # zero at this magnitude -- same as the reference formula yields)
    s = quantize.shift_fast(a, 14, "INT8", reduce_axis=1)
    assert np.all(np.abs(np.asarray(s)) < 1000)      # not the overflowed int
    out_fast = core.gemm(a, b, num_moduli=14)
    assert np.all(np.isfinite(np.asarray(out_fast)))

    # accurate mode: full accuracy at any scale
    out_accu = core.gemm(a, b, num_moduli=14, fastmode=False)
    rel = np.max(np.abs(np.asarray(out_accu) - ref) / np.abs(ref))
    assert rel < 1e-12

    # mixed-scale: one huge row must not corrupt the OTHER rows (fast mode)
    a2 = np.asarray(rng.standard_normal((16, 40)))
    a2[3] *= 1e60
    out2 = np.asarray(core.gemm(jnp.asarray(a2), b, num_moduli=14))
    ref2 = a2 @ np.asarray(b)
    keep = [i for i in range(16) if i != 3]
    rel2 = np.max(np.abs(out2[keep] - ref2[keep]) / np.abs(ref2[keep]))
    assert rel2 < 1e-10
    assert np.all(np.isfinite(out2))


def test_shift_fast_normal_rows_bitwise_unchanged():
    """The overflow guard must leave in-range rows bit-identical."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((32, 40)))
    s = quantize.shift_fast(x, 8, "INT8", reduce_axis=1)
    # prescale path disabled entirely for f32
    s32 = quantize.shift_fast(x.astype(jnp.float32), 8, "INT8", reduce_axis=1)
    assert s.shape == s32.shape == (32,)


def test_beta_zero_never_reads_c():
    """VERDICT: beta=0 with NaN/Inf-filled C must not corrupt the output
    (reference compile-time-specializes beta=0, inverse_scaling_real.hpp)."""
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.standard_normal((24, 32)))
    b = jnp.asarray(rng.standard_normal((32, 16)))
    c_bad = jnp.full((24, 16), np.nan)
    out = core.gemm(a, b, c=c_bad, beta=0.0, num_moduli=12)
    assert np.all(np.isfinite(np.asarray(out)))
    ref = core.gemm(a, b, num_moduli=12)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # complex path too
    ac = jnp.asarray(rng.standard_normal((8, 12))
                     + 1j * rng.standard_normal((8, 12)))
    bc = jnp.asarray(rng.standard_normal((12, 10))
                     + 1j * rng.standard_normal((12, 10)))
    cc_bad = jnp.full((8, 10), np.nan + 1j * np.nan, jnp.complex128)
    outc = core.gemm(ac, bc, c=cc_bad, beta=0, num_moduli=12)
    assert np.all(np.isfinite(np.asarray(outc).view(np.float64)))


def test_beta_one_exact_add():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((24, 32)))
    b = jnp.asarray(rng.standard_normal((32, 16)))
    c = jnp.asarray(rng.standard_normal((24, 16)))
    out = core.gemm(a, b, c=c, beta=1, num_moduli=12)
    ref = core.gemm(a, b, num_moduli=12) + c
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gemm_rejects_non_2d():
    a3 = jnp.zeros((2, 3, 4))
    b = jnp.zeros((4, 5))
    with pytest.raises(ValueError, match="2-D"):
        core.gemm(a3, b, num_moduli=8)
    with pytest.raises(ValueError, match="2-D"):
        core.gemm(jnp.zeros((3, 4), jnp.complex128),
                  jnp.zeros((4,), jnp.complex128), num_moduli=8)


def test_env_change_without_refresh(hooked):
    """VERDICT: setenv between GEMMs must take effect automatically (the
    reference re-reads GEMMUL8_* every call, hook.cu:283-310)."""
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((48, 64)))
    b = jnp.asarray(rng.standard_normal((64, 32)))
    ref = np.asarray(a) @ np.asarray(b)
    nat0 = np.asarray(jnp.matmul(a, b))       # no env var -> native fallthrough

    os.environ["GEMMUL8_NUM_MOD_D"] = "3"     # very coarse
    err_coarse = np.max(np.abs(np.asarray(jnp.matmul(a, b)) - ref))
    os.environ["GEMMUL8_NUM_MOD_D"] = "16"    # accurate -- NO refresh() call
    err_fine = np.max(np.abs(np.asarray(jnp.matmul(a, b)) - ref))
    assert err_fine < 1e-12
    assert err_coarse > 100 * max(err_fine, 1e-18)

    # deleting the var restores native behavior (bit-identical to the
    # pre-config native fallthrough), again without refresh()
    del os.environ["GEMMUL8_NUM_MOD_D"]
    np.testing.assert_array_equal(np.asarray(jnp.matmul(a, b)), nat0)


def test_fused_epilogue_bit_identity():
    """The Pallas fused mod+CRT+descale consumer must be bit-identical to the
    unfused chain (mod_reduce -> crt_limbs_matrix -> accelerator descale),
    for both out_bits regimes (interpret mode on CPU)."""
    from gemmul8_tpu import ff
    from gemmul8_tpu import pallas_kernels as pk

    rng = np.random.default_rng(11)
    for nu, out_bits, dt in [(16, 53, jnp.float64), (8, 24, jnp.float32),
                             (20, 53, jnp.float64), (2, 24, jnp.float32)]:
        m = n = k = 256
        a = jnp.asarray(rng.standard_normal((m, k)), dt)
        b = jnp.asarray(rng.standard_normal((k, n)), dt)
        sa = quantize.shift_fast(a, nu, "INT8", reduce_axis=1)
        sb = quantize.shift_fast(b, nu, "INT8", reduce_axis=0)
        pa = quantize.encode_planes(a, sa, 0, nu, "INT8")
        pb = quantize.encode_planes(b, sb, 1, nu, "INT8")
        c_hi = core.residue_matmul(pa, pb)
        hi, lo = pk.fused_epilogue(c_hi, sa, sb, nu, "INT8", out_bits)
        if out_bits == 24:
            fused = (hi + lo).astype(dt)
        else:
            fused = hi.astype(dt) + lo.astype(dt)
        c_mid = core.mod_reduce(c_hi, nu, "INT8")
        limbs, base = ff.crt_limbs_matrix(c_mid, nu, "INT8", out_bits)
        ref = ff.descale_accel(limbs, base, 16, sa, sb, out_bits, dt)
        iv = jnp.int64 if out_bits == 53 else jnp.int32
        assert bool(jnp.all(fused.view(iv) == ref.view(iv))), (nu, out_bits)


def test_padded_gemm_matches_exact():
    """Misaligned shapes (pad-and-slice path) must stay accurate; padding is
    exactness-preserving so CPU (unpadded) and the formula agree."""
    rng = np.random.default_rng(12)
    a = jnp.asarray(rng.standard_normal((197, 301)))
    b = jnp.asarray(rng.standard_normal((301, 133)))
    out = core.gemm(a, b, num_moduli=16)
    ref = np.asarray(a) @ np.asarray(b)
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-11


def test_syrk_matches_gemm_bitwise():
    """syrk (one encode + transpose view) must equal gemm(a, a.T) bit-for-bit
    in both modes -- the residue-plane reuse is exact, not approximate."""
    rng = np.random.default_rng(21)
    a = jnp.asarray(rng.standard_normal((48, 96)))
    for fast in (True, False, "robust"):
        s = np.asarray(core.syrk(a, num_moduli=12, fastmode=fast))
        g = np.asarray(core.gemm(a, a.T, num_moduli=12, fastmode=fast))
        np.testing.assert_array_equal(s, g)
    # trans=True: A.T @ A (syrk defaults to "robust" -- Gram safety)
    st = np.asarray(core.syrk(a, trans=True, num_moduli=12))
    gt = np.asarray(core.gemm(a.T, a, num_moduli=12, fastmode="robust"))
    np.testing.assert_array_equal(st, gt)
    # alpha/beta epilogue
    c = jnp.asarray(rng.standard_normal((48, 48)))
    sab = np.asarray(core.syrk(a, num_moduli=12, alpha=-1.5, beta=2.0, c=c))
    ref = -1.5 * np.asarray(core.gemm(a, a.T, num_moduli=12,
                                      fastmode="robust")) + 2.0 * np.asarray(c)
    assert np.max(np.abs(sab - ref)) < 1e-12
    # validation
    with pytest.raises(NotImplementedError):
        core.syrk(jnp.zeros((4, 4), jnp.complex128), num_moduli=8)
    with pytest.raises(ValueError):
        core.syrk(jnp.zeros((4, 4, 4)), num_moduli=8)


def test_eager_cache_covers_operator_and_module_calls(hooked):
    """The reference Info_t cache covers every hooked call (hook.cu:87-107);
    here a @ b / jnp.matmul / jnp.dot on concrete arrays must all hit the
    plane cache (install() patches the operator's captured PjitFunction),
    bit-matching the direct API."""
    os.environ["GEMMUL8_NUM_MOD_D"] = "12"
    rng = np.random.default_rng(31)
    a = jnp.asarray(rng.standard_normal((64, 96)))
    b = jnp.asarray(rng.standard_normal((96, 48)))
    direct = np.asarray(g8.gemm(a, b, num_moduli=12))
    h0 = hook.cache_hits
    outs = [a @ b, a @ b, jnp.matmul(a, b), jnp.dot(a, b)]
    assert hook.cache_hits - h0 >= 6      # 3 repeat calls x 2 operands
    for r in outs:
        np.testing.assert_array_equal(np.asarray(r), direct)
    # jit path still works (primitive hook), batched shapes fall through
    rj = jax.jit(lambda x, y: x @ y)(a, b)
    np.testing.assert_array_equal(np.asarray(rj), direct)
    z = jnp.ones((2, 3, 4)) @ jnp.ones((2, 4, 5))
    assert z.shape == (2, 3, 5)


def test_fused_complex_epilogue_bit_identity():
    """The Pallas fused complex epilogue (wrap + 3M recombine + dual CRT +
    descale) must be bit-identical to the unfused chain, and the int8-lane
    _quantize_complex must match the residues_wrapped formulation."""
    from gemmul8_tpu import complex_gemm, ff
    from gemmul8_tpu import pallas_kernels as pk

    rng = np.random.default_rng(41)
    for nu, out_bits, dt in [(12, 53, jnp.float64), (8, 24, jnp.float32),
                             (20, 53, jnp.float64)]:
        m = n = k = 128
        ar = jnp.asarray(rng.standard_normal((m, k)), dt)
        ai = jnp.asarray(rng.standard_normal((m, k)), dt)
        br = jnp.asarray(rng.standard_normal((k, n)), dt)
        bi = jnp.asarray(rng.standard_normal((k, n)), dt)
        sa = complex_gemm._shift_complex_fast(ar, ai, nu, "INT8", 1)
        sb = complex_gemm._shift_complex_fast(br, bi, nu, "INT8", 0)
        pa = complex_gemm._quantize_complex(ar, ai, sa, 0, nu, "INT8", False)
        pb = complex_gemm._quantize_complex(br, bi, sb, 1, nu, "INT8", False)

        c3 = core.residue_matmul(pa.reshape(3 * nu, m, k),
                                 pb.reshape(3 * nu, k, n))
        hire, lore, hiim, loim = pk.fused_epilogue_complex(
            c3, sa, sb, nu, "INT8", out_bits)
        mids = jax.vmap(lambda x, y: core.residue_gemm(x, y, nu, "INT8"))(
            pa, pb)
        mid_r, mid_i = complex_gemm._recombine_3m(mids, nu, "INT8")
        for (hi, lo), mid in (((hire, lore), mid_r), ((hiim, loim), mid_i)):
            limbs, base = ff.crt_limbs_matrix(mid, nu, "INT8", out_bits)
            ref = ff.descale_accel(limbs, base, 16, sa, sb, out_bits, dt)
            if out_bits == 24:
                fused = (hi + lo).astype(dt)
            else:
                fused = hi.astype(dt) + lo.astype(dt)
            iv = jnp.int64 if out_bits == 53 else jnp.int32
            assert bool(jnp.all(fused.view(iv) == ref.view(iv))), (nu, out_bits)


def test_fused_fp8_epilogue_bit_identity():
    """The FP8 fused epilogue (lane reassembly + CRT + descale in one
    kernel) must be bit-identical to fp8._reassemble + the unfused chain."""
    from gemmul8_tpu import ff, fp8
    from gemmul8_tpu import pallas_kernels as pk

    rng = np.random.default_rng(51)
    for nu, out_bits, dt in [(10, 53, jnp.float64), (6, 24, jnp.float32),
                             (13, 53, jnp.float64)]:
        m = n = k = 128
        a = jnp.asarray(rng.standard_normal((m, k)), dt)
        b = jnp.asarray(rng.standard_normal((k, n)), dt)
        sa = quantize.shift_fast(a, nu, "FP8", reduce_axis=1)
        sb = quantize.shift_fast(b, nu, "FP8", reduce_axis=0)
        pa = quantize.encode_planes(a, sa, 0, nu, "FP8")
        pb = quantize.encode_planes(b, sb, 1, nu, "FP8")
        a3 = pa if pa.ndim == 3 else fp8._gemm_stack(pa, nu, "lhs")
        b3 = pb if pb.ndim == 3 else fp8._gemm_stack(pb, nu, "rhs")
        c3 = fp8._batched_dot(a3, b3)
        hi, lo = pk.fused_epilogue_fp8(c3, sa, sb, nu, out_bits)
        fused = ((hi + lo).astype(dt) if out_bits == 24
                 else hi.astype(dt) + lo.astype(dt))
        c_mid = fp8._reassemble(c3.astype(jnp.int32), nu).astype(jnp.int16)
        limbs, base = ff.crt_limbs_matrix(c_mid, nu, "FP8", out_bits)
        ref = ff.descale_accel(limbs, base, 16, sa, sb, out_bits, dt)
        iv = jnp.int64 if out_bits == 53 else jnp.int32
        assert bool(jnp.all(fused.view(iv) == ref.view(iv))), (nu, out_bits)


def test_fp8_big_k_chunked_acc():
    """FP8 K > 2^16: the chunked residue accumulator path must stay exact."""
    rng = np.random.default_rng(52)
    k = (1 << 16) + 512
    a = jnp.asarray(rng.standard_normal((8, k)))
    b = jnp.asarray(rng.standard_normal((k, 8)))
    c = core.gemm(a, b, num_moduli=12, backend="FP8")
    ref = np.asarray(a) @ np.asarray(b)
    assert np.max(np.abs(np.asarray(c) - ref) / np.abs(ref)) < 1e-9


def test_empty_k_blas_semantics():
    """k = 0 must return the zero product (BLAS semantics), not an opaque
    empty-reduction error; empty m/n dims pass through."""
    c = core.gemm(jnp.zeros((3, 0)), jnp.zeros((0, 2)), num_moduli=8)
    np.testing.assert_array_equal(np.asarray(c), np.zeros((3, 2)))
    cz = core.gemm(jnp.zeros((3, 0), jnp.complex128),
                   jnp.zeros((0, 2), jnp.complex128), num_moduli=8)
    np.testing.assert_array_equal(np.asarray(cz), np.zeros((3, 2)))
    c0 = core.gemm(jnp.zeros((0, 4)), jnp.zeros((4, 3)), num_moduli=8)
    assert c0.shape == (0, 3)


def test_robust_fastmode():
    """fastmode="robust": the scale-invariant fast shift. Must (a) fix the
    reference formula's catastrophic corners (all-positive small-scale and
    large-scale operands overflow the CRT budget and wrap silently -- a
    failure the reference shares), (b) beat reference fast mode on
    exponent-spread (phi) data, (c) stay bit-reproducible and available on
    the distributed path."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import phi_matrix

    rng = np.random.default_rng(61)
    k = 1024
    # (a) catastrophic corner: all-positive * 1e-6
    A = rng.random((24, k)) * 1e-6
    B = rng.random((k, 24)) * 1e-6
    a, b = jnp.asarray(A), jnp.asarray(B)
    ref = A @ B
    e_ref = np.max(np.abs(np.asarray(core.gemm(a, b, num_moduli=12)) - ref)
                   / np.abs(ref))
    e_rob = np.max(np.abs(np.asarray(core.gemm(a, b, num_moduli=12,
                                               fastmode="robust")) - ref)
                   / np.abs(ref))
    assert e_ref > 1e-2          # the reference formula really does fail here
    assert e_rob < 1e-9

    # (b) phi-spread data: robust at least as accurate
    A = phi_matrix(rng, 48, k, 2.0)
    B = phi_matrix(rng, k, 48, 2.0)
    a, b = jnp.asarray(A), jnp.asarray(B)
    ref = np.asarray(A, np.longdouble) @ np.asarray(B, np.longdouble)
    e_ref = np.max(np.abs(np.asarray(core.gemm(a, b, num_moduli=12)) - ref)
                   / np.abs(ref))
    e_rob = np.max(np.abs(np.asarray(core.gemm(a, b, num_moduli=12,
                                               fastmode="robust")) - ref)
                   / np.abs(ref))
    assert e_rob <= e_ref

    # (c) reproducible; distributed path bit-identical across meshes
    c1 = np.asarray(core.gemm(a, b, num_moduli=12, fastmode="robust"))
    c2 = np.asarray(core.gemm(a, b, num_moduli=12, fastmode="robust"))
    np.testing.assert_array_equal(c1, c2)
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices())
    if len(devs) >= 8:
        from gemmul8_tpu.parallel import summa_gemm
        m24 = Mesh(devs[:8].reshape(2, 4), ("x", "y"))
        m11 = Mesh(devs[:1].reshape(1, 1), ("x", "y"))
        d24 = np.asarray(summa_gemm(a, b, mesh=m24, num_moduli=12,
                                    fastmode="robust"))
        d11 = np.asarray(summa_gemm(a, b, mesh=m11, num_moduli=12,
                                    fastmode="robust"))
        np.testing.assert_array_equal(d24, d11)

    # env plumbing: GEMMUL8_FASTMODE_D=robust parses
    from gemmul8_tpu import config
    os.environ["GEMMUL8_NUM_MOD_D"] = "12"
    os.environ["GEMMUL8_FASTMODE_D"] = "robust"
    try:
        cfg = config.env_config("float64")
        assert cfg.fastmode == "robust"
    finally:
        del os.environ["GEMMUL8_NUM_MOD_D"]
        del os.environ["GEMMUL8_FASTMODE_D"]


def test_gemm_batched():
    """Strided-batched entry: each batch element equals the 2-D gemm
    bit-for-bit (vmap of the same pipeline)."""
    rng = np.random.default_rng(71)
    a = jnp.asarray(rng.standard_normal((3, 24, 40)))
    b = jnp.asarray(rng.standard_normal((3, 40, 16)))
    out = np.asarray(g8.gemm_batched(a, b, num_moduli=12))
    for i in range(3):
        ref = np.asarray(core.gemm(a[i], b[i], num_moduli=12))
        np.testing.assert_array_equal(out[i], ref)
    with pytest.raises(ValueError, match="gemm_batched"):
        g8.gemm_batched(jnp.zeros((2, 3, 4)), jnp.zeros((3, 4, 5)),
                        num_moduli=8)
    # batched complex is now a real path (round 3): see
    # tests/test_round3_fixes.py::test_gemm_batched_complex_matches_per_slice
    out_c = g8.gemm_batched(jnp.zeros((2, 3, 4), jnp.complex128),
                            jnp.zeros((2, 4, 5), jnp.complex128), num_moduli=8)
    assert out_c.shape == (2, 3, 5) and out_c.dtype == jnp.complex128

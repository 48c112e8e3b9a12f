"""Round-3 VERDICT/ADVICE item tests: SKIP_SCALE env parity, batched complex,
gemm_batched dtype checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu import complex_gemm, core


# ---------------------------------------------------------------------------
# GEMMUL8_SKIP_SCALE_A / _B env parity (reference: hook.cu:20-38, 287-309)
# ---------------------------------------------------------------------------

def test_skip_scale_env_per_side(monkeypatch):
    """SKIP_SCALE_A/B gate the per-side operand-plane cache: with A enabled
    and B disabled, only the A side registers cache hits; results stay
    bit-identical either way."""
    from gemmul8_tpu import hook as hook_mod
    dn = (((1,), (0,)), ((), ()))
    rng = np.random.default_rng(31)
    a = jnp.asarray(rng.standard_normal((24, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96, 16)), jnp.float32)

    monkeypatch.setenv("GEMMUL8_EAGER_CACHE", "0")
    with g8.emulate(num_moduli=9):
        ref = np.asarray(jax.lax.dot_general(a, b, dn))

    monkeypatch.delenv("GEMMUL8_EAGER_CACHE", raising=False)
    monkeypatch.setenv("GEMMUL8_SKIP_SCALE_A", "1")
    monkeypatch.setenv("GEMMUL8_SKIP_SCALE_B", "0")
    hook_mod.clear_plane_cache()
    h0 = hook_mod.cache_hits
    with g8.emulate(num_moduli=9):
        c1 = np.asarray(jax.lax.dot_general(a, b, dn))
        c2 = np.asarray(jax.lax.dot_general(a, b, dn))
    # second call: A planes hit the cache, B was requantized (no B entry)
    assert hook_mod.cache_hits - h0 == 1
    assert not any(key[1] == "B" for key in hook_mod._plane_cache)
    np.testing.assert_array_equal(c1, ref)
    np.testing.assert_array_equal(c2, ref)
    hook_mod.clear_plane_cache()


def test_skip_scale_env_both_disabled(monkeypatch):
    """SKIP_SCALE_A=0 and _B=0 disables plane reuse entirely even when the
    master EAGER_CACHE default (on) would allow it."""
    from gemmul8_tpu import hook as hook_mod
    dn = (((1,), (0,)), ((), ()))
    rng = np.random.default_rng(32)
    a = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    monkeypatch.delenv("GEMMUL8_EAGER_CACHE", raising=False)
    monkeypatch.setenv("GEMMUL8_SKIP_SCALE_A", "0")
    monkeypatch.setenv("GEMMUL8_SKIP_SCALE_B", "0")
    hook_mod.clear_plane_cache()
    h0 = hook_mod.cache_hits
    with g8.emulate(num_moduli=8):
        np.asarray(jax.lax.dot_general(a, b, dn))
        np.asarray(jax.lax.dot_general(a, b, dn))
    assert hook_mod.cache_hits == h0
    assert not hook_mod._plane_cache


# ---------------------------------------------------------------------------
# batched complex GEMM (VERDICT round-2 missing item 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype,nu", [("complex64", 8), ("complex128", 12)])
def test_gemm_batched_complex_matches_per_slice(dtype, nu):
    rng = np.random.default_rng(7)
    B, m, k, n = 3, 24, 40, 16
    a = (rng.standard_normal((B, m, k)) + 1j * rng.standard_normal((B, m, k))
         ).astype(dtype)
    b = (rng.standard_normal((B, k, n)) + 1j * rng.standard_normal((B, k, n))
         ).astype(dtype)
    out = np.asarray(core.gemm_batched(jnp.asarray(a), jnp.asarray(b),
                                       num_moduli=nu))
    assert out.shape == (B, m, n) and out.dtype == np.dtype(dtype)
    for i in range(B):
        ref = np.asarray(g8.gemm(jnp.asarray(a[i]), jnp.asarray(b[i]),
                                 num_moduli=nu))
        np.testing.assert_array_equal(out[i], ref)


def test_gemm_batched_planar_matches_complex():
    rng = np.random.default_rng(8)
    B, m, k, n = 2, 16, 32, 24
    a = rng.standard_normal((B, m, k)) + 1j * rng.standard_normal((B, m, k))
    b = rng.standard_normal((B, k, n)) + 1j * rng.standard_normal((B, k, n))
    cr, ci = complex_gemm.gemm_batched_planar(
        jnp.asarray(a.real), jnp.asarray(a.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag), num_moduli=10)
    ref = np.asarray(core.gemm_batched(jnp.asarray(a), jnp.asarray(b),
                                       num_moduli=10))
    np.testing.assert_array_equal(np.asarray(cr), ref.real)
    np.testing.assert_array_equal(np.asarray(ci), ref.imag)


# ---------------------------------------------------------------------------
# memory-gated M/N blocking (VERDICT round-2 missing item 3;
# reference: matmult.hpp:68-75, 129-175)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fastmode", [True, "robust", False])
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_blocked_gemm_bit_identical(fastmode, dtype):
    """N/M-striped driver == unblocked driver bitwise, for fast / robust /
    accurate modes, odd shapes and stripe tails included."""
    rng = np.random.default_rng(41)
    m, k, n = 52, 96, 72
    a = jnp.asarray(rng.standard_normal((m, k)), dtype)
    b = jnp.asarray(rng.standard_normal((k, n)), dtype)
    ref = np.asarray(g8.gemm(a, b, num_moduli=9, fastmode=fastmode))
    for mb, nb in [(None, 32), (24, 32), (16, 24)]:
        out = np.asarray(g8.gemm(a, b, num_moduli=9, fastmode=fastmode,
                                 m_block=mb, n_block=nb))
        np.testing.assert_array_equal(out, ref)


def test_blocked_gemm_alpha_beta_and_trans():
    rng = np.random.default_rng(42)
    a = jnp.asarray(rng.standard_normal((40, 64)))
    b = jnp.asarray(rng.standard_normal((24, 64)))   # used transposed
    c = jnp.asarray(rng.standard_normal((40, 24)))
    ref = np.asarray(g8.gemm(a, b, num_moduli=10, trans_b=True,
                             alpha=-1.5, beta=1.25, c=c))
    out = np.asarray(g8.gemm(a, b, num_moduli=10, trans_b=True,
                             alpha=-1.5, beta=1.25, c=c, n_block=8))
    np.testing.assert_array_equal(out, ref)


def test_pick_blocking_model():
    """pick_blocking: small shapes stay unblocked; 16384^3 f64 nu=16 must
    block to fit a 12-GiB budget; chosen stripes actually fit."""
    from gemmul8_tpu.core import pick_blocking, work_bytes
    budget = 12 * (1 << 30)
    assert pick_blocking(8192, 8192, 8192, 16, jnp.float64,
                         budget_bytes=budget) == (None, None)
    mb, nb = pick_blocking(16384, 16384, 16384, 16, jnp.float64,
                           budget_bytes=budget)
    assert nb is not None
    assert work_bytes(mb or 16384, nb, 16384, 16) <= budget
    # 32768^3: m must block too
    mb2, nb2 = pick_blocking(32768, 32768, 32768, 16, jnp.float64,
                             budget_bytes=budget)
    assert mb2 is not None and nb2 is not None
    assert work_bytes(mb2, nb2, 32768, 16) <= budget


def test_split_complex_epilogue_bit_identity():
    """The SPLIT complex epilogue for nu > 16 (fused wrap+3M-recombine ->
    two real CRT epilogue passes) is bit-identical to the single-kernel
    fused complex epilogue AND to the unfused chain -- the wrap in the real
    epilogue is value-identity on already-wrapped residues."""
    from gemmul8_tpu import complex_gemm, ff
    from gemmul8_tpu import pallas_kernels as pk

    rng = np.random.default_rng(61)
    for nu, out_bits, dt in [(20, 53, jnp.float64), (17, 53, jnp.float64),
                             (10, 53, jnp.float64)]:
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
        # split path
        re_mid, im_mid = pk.fused_recombine_3m(c3, nu, "INT8")
        hire, lore = pk.fused_epilogue(re_mid, sa, sb, nu, "INT8", out_bits)
        hiim, loim = pk.fused_epilogue(im_mid, sa, sb, nu, "INT8", out_bits)
        # single-kernel fused path
        shire, slore, shiim, sloim = pk.fused_epilogue_complex(
            c3, sa, sb, nu, "INT8", out_bits)
        for x, y in [(hire, shire), (lore, slore), (hiim, shiim),
                     (loim, sloim)]:
            np.testing.assert_array_equal(
                np.asarray(x).view(np.int32), np.asarray(y).view(np.int32))
        # unfused chain
        mids = jax.vmap(lambda x, y: core.residue_gemm(x, y, nu, "INT8"))(
            pa, pb)
        mid_r, mid_i = complex_gemm._recombine_3m(mids, nu, "INT8")
        np.testing.assert_array_equal(np.asarray(re_mid),
                                      np.asarray(mid_r))
        np.testing.assert_array_equal(np.asarray(im_mid),
                                      np.asarray(mid_i))
        for (hi, lo), mid in (((hire, lore), mid_r), ((hiim, loim), mid_i)):
            limbs, base = ff.crt_limbs_matrix(mid, nu, "INT8", out_bits)
            ref = ff.descale_accel(limbs, base, 16, sa, sb, out_bits, dt)
            fused = hi.astype(dt) + lo.astype(dt)
            iv = jnp.int64 if out_bits == 53 else jnp.int32
            assert bool(jnp.all(fused.view(iv) == ref.view(iv))), (nu,)


def test_gemm_batched_dtype_mismatch_raises():
    a = jnp.zeros((2, 4, 4), jnp.float32)
    b = jnp.zeros((2, 4, 4), jnp.float64)
    with pytest.raises(TypeError, match="dtype mismatch"):
        core.gemm_batched(a, b, num_moduli=8)


# ---------------------------------------------------------------------------
# round-3 code-review fixes (core/complex/fp8/quantize)
# ---------------------------------------------------------------------------

def test_fp8_lhs_to_rhs_stack_matches_canonical_rhs():
    """syrk FP8 fix: a transposed LHS-slot-order stack must be slot-permuted
    before use as the rhs -- the square moduli pair CROSS slots (ax*by,
    ay*bx); the raw transpose pairs ax*bx/ay*by, silently wrong."""
    from gemmul8_tpu import fp8, tables
    nu = 10
    rng = np.random.default_rng(50)
    mods = tables.moduli(tables.Backend.FP8)[:nu]
    res = np.stack([rng.integers(-(p // 2), (p - 1) // 2 + 1, (32, 48))
                    for p in mods]).astype(np.int32)
    pa = fp8.split_planes(jnp.asarray(res), nu)            # (nu, 3, 32, 48)
    stack_lhs = fp8._gemm_stack(pa, nu, "lhs")             # (3nu, 32, 48)
    got = fp8.lhs_to_rhs_stack(jnp.swapaxes(stack_lhs, 1, 2), nu)
    want = fp8._gemm_stack(jnp.swapaxes(pa, 2, 3), nu, "rhs")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the raw transposed lhs stack is NOT rhs-valid (the bug existed)
    assert not np.array_equal(np.asarray(jnp.swapaxes(stack_lhs, 1, 2)),
                              np.asarray(want))


def test_trans_flags_numpy_bool_and_bad_string():
    rng = np.random.default_rng(51)
    a = jnp.asarray(rng.standard_normal((24, 24)))
    b = jnp.asarray(rng.standard_normal((24, 24)))
    want = np.asarray(g8.gemm(a, b, trans_a=True, num_moduli=10))
    got = np.asarray(g8.gemm(a, b, trans_a=np.bool_(True), num_moduli=10))
    np.testing.assert_array_equal(got, want)  # np.bool_ used to mean "N"!
    with pytest.raises(ValueError):
        g8.gemm(a, b, trans_a="X", num_moduli=10)


def test_epilogue_and_backend_typos_raise():
    rng = np.random.default_rng(52)
    a = jnp.asarray(rng.standard_normal((8, 8)))
    with pytest.raises(ValueError):
        g8.gemm(a, a, epilogue="FF")   # typo used to silently pick f64
    with pytest.raises(ValueError):
        g8.gemm(a.astype(jnp.complex128), a.astype(jnp.complex128),
                backend="INT4")        # used to AttributeError in tables
    with pytest.raises(ValueError):
        complex_gemm.gemm_planar(a, a, a, a, backend="int8")


def test_estimate_gemm_huge_k_no_int32_overflow():
    """Accurate-mode estimation beyond k ~ 1.97e6: the int32 dot would wrap
    negative; the chunked float accumulation stays exact (integer partials
    below 2^48)."""
    from gemmul8_tpu import quantize, tables
    k = ((2 ** 31 - 1) // 1089) + 1017   # just past the exact-int32 bound
    ub_a = jnp.full((2, k), 33, jnp.int8)
    ub_b = jnp.full((k, 2), 33, jnp.int8)
    c = np.asarray(quantize.estimate_gemm(ub_a, ub_b, tables.Backend.INT8))
    assert float(c[0, 0]) == float(33 * 33 * k)  # exact, and > 2^31


def test_gemm_with_phases_chunks_big_k():
    """gemm_with_phases used to run the raw dot past the int32-exact K bound
    and return garbage; it must now match gemm() (which chunks)."""
    rng = np.random.default_rng(53)
    k = core.K_CHUNK + 256
    a = jnp.asarray(rng.standard_normal((16, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, 16)), jnp.float32)
    out, times = core.gemm_with_phases(a, b, num_moduli=8)
    want = np.asarray(g8.gemm(a, b, num_moduli=8))
    np.testing.assert_array_equal(np.asarray(out), want)
    assert set(times) == {"quantize", "matmul", "mod_reduce", "crt_inverse"}


def test_hook_bwd_does_not_reintercept_internal_dots(monkeypatch):
    """The custom-VJP backward traces OUTSIDE _hook_bind's depth guard; the
    emulator's internal exactness-critical f32 CRT dot must not be re-routed
    through the emulator there (it would silently corrupt gradients)."""
    monkeypatch.setenv("GEMMUL8_NUM_MOD_S", "8")
    monkeypatch.setenv("GEMMUL8_EPILOGUE", "ff")   # the eligible-f32-dot path
    rng = np.random.default_rng(60)
    b = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    import gemmul8_tpu as g8mod
    g8mod.install()
    try:
        grad_a = np.asarray(jax.grad(lambda x: jnp.sum(x @ b))(a))
    finally:
        g8mod.uninstall()
    want = np.asarray(core.emulate_matmul(
        jnp.ones((32, 32), jnp.float32), b.T, num_moduli=8, fastmode=True,
        epilogue="ff"))
    np.testing.assert_array_equal(grad_a, want)


def test_install_override_applies_across_threads():
    """install(num_moduli=...) is documented as a GLOBAL override; a matmul
    traced on a worker thread must be emulated too (it used to silently run
    native: the override lived in thread-local state)."""
    import threading
    rng = np.random.default_rng(61)
    a = jnp.asarray(rng.standard_normal((24, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96, 16)), jnp.float32)
    import gemmul8_tpu as g8mod
    dn = (((1,), (0,)), ((), ()))
    g8mod.install(num_moduli=9)
    try:
        res = {}
        t = threading.Thread(target=lambda: res.__setitem__(
            "c", np.asarray(jax.lax.dot_general(a, b, dn))))
        t.start(); t.join()
        want = np.asarray(jax.lax.dot_general(a, b, dn))
    finally:
        g8mod.uninstall()
    np.testing.assert_array_equal(res["c"], want)
    # and it really was emulated, not native
    native = np.asarray(jax.lax.dot_general(a, b, dn))
    assert not np.array_equal(res["c"], native)


def test_eager_hook_k0_returns_zeros():
    import gemmul8_tpu as g8mod
    with g8mod.emulate(num_moduli=8):
        z = jnp.zeros((4, 0), jnp.float32) @ jnp.zeros((0, 5), jnp.float32)
    assert z.shape == (4, 5) and np.all(np.asarray(z) == 0)


def test_descale_accel_large_shift_underflows_to_zero():
    """|sft| beyond 252 used to overflow the half-split pow2_f32 exponent
    assembly into the sign bit (garbage instead of underflow-to-zero)."""
    from gemmul8_tpu import ff
    limbs = [jnp.ones((2, 2), jnp.int32)]
    sa = jnp.asarray([260, 0], jnp.int32)
    sb = jnp.asarray([40, 0], jnp.int32)
    out = np.asarray(ff.descale_accel(limbs, 0, 16, sa, sb, 24, jnp.float32))
    assert out[0, 0] == 0.0            # 2^-300: underflow, NOT garbage
    assert out[0, 1] == 0.0            # 2^-260
    assert out[1, 0] == 2.0 ** -40
    assert out[1, 1] == 1.0


def test_estimate_gemm_true_ub_bound_65():
    """The extract plane reaches 65, so int32 exactness ends at 4225k >= 2^31
    (~508k), not the 1089k bound of max-value 33."""
    from gemmul8_tpu import quantize, tables
    k = ((2 ** 31 - 1) // 4225) + 991    # int32 dot would wrap negative
    ub_a = jnp.full((2, k), 65, jnp.int8)
    ub_b = jnp.full((k, 2), 65, jnp.int8)
    c = np.asarray(quantize.estimate_gemm(ub_a, ub_b, tables.Backend.INT8))
    assert float(c[0, 0]) == float(65 * 65 * k)


def test_dot_emit_mid_value_identity():
    """GEMMUL8_DOT_EMIT=mid feeds the fused epilogue mod_reduce's int8 c_mid
    instead of the int32 C_hi (4x less HBM read on device); the kernel's
    wrap is a value-identity on wrapped residues, so (hi, lo) must be
    BIT-identical (int32-view compare: synthetic random residues can
    legitimately descale to inf/NaN, where value compare lies)."""
    from gemmul8_tpu import pallas_kernels as pk
    rng = np.random.default_rng(70)
    nu = 16   # headline setting, includes the p=256 mask-wrap modulus
    pa = jnp.asarray(rng.integers(-128, 128, (nu, 128, 96)), jnp.int8)
    pb = jnp.asarray(rng.integers(-128, 128, (nu, 96, 128)), jnp.int8)
    c_hi = core.residue_matmul(pa, pb)
    c_mid = core.mod_reduce(c_hi, nu, "INT8")
    sfta = jnp.asarray(rng.integers(-30, 30, 128), jnp.int32)
    sftb = jnp.asarray(rng.integers(-30, 30, 128), jnp.int32)
    h1, l1 = pk.fused_epilogue(c_hi, sfta, sftb, nu, "INT8", 53)
    h2, l2 = pk.fused_epilogue(c_mid, sfta, sftb, nu, "INT8", 53)
    bits = lambda x: np.asarray(x).view(np.int32)  # noqa: E731
    np.testing.assert_array_equal(bits(h1), bits(h2))
    np.testing.assert_array_equal(bits(l1), bits(l2))
    # real quantized operands: finite everywhere and still identical
    a = jnp.asarray(rng.standard_normal((128, 128)))
    b = jnp.asarray(rng.standard_normal((128, 128)))
    qa = g8.precompute(a, "A", num_moduli=nu)
    qb = g8.precompute(b, "B", num_moduli=nu)
    ch = core.residue_matmul(qa.planes, qb.planes)
    cm = core.mod_reduce(ch, nu, "INT8")
    H1, L1 = pk.fused_epilogue(ch, qa.sft, qb.sft, nu, "INT8", 53)
    H2, L2 = pk.fused_epilogue(cm, qa.sft, qb.sft, nu, "INT8", 53)
    assert np.all(np.isfinite(np.asarray(H1)))
    np.testing.assert_array_equal(bits(H1), bits(H2))
    np.testing.assert_array_equal(bits(L1), bits(L2))

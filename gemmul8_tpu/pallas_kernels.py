"""Pallas (Mosaic TPU) kernels for the hot elementwise stages.

The encode stage (quantize + residue-plane emission) is VPU-compute-bound:
~250 int/float ops per element across the f32-component decomposition, limb
assembly and per-modulus residue dots. One fused Pallas kernel keeps the whole
chain in VMEM/registers per tile -- no intermediate HBM traffic and no fusion
boundaries -- and writes the int8 planes directly in the layout the batched
MXU dot consumes.

Used for the INT8 backend on TPU when shapes are tile-aligned; the jnp path
(quantize.residues_wrapped) remains the reference implementation and the
fallback, and the two are bit-identical (tested via interpret mode on CPU).

Reference analog: the fused scalingA/scalingB + ModUnroll kernels
(scaling_fast_real.hpp:54-164, mod.hpp:557-877).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables

# int8 output tiling: sublane x lane = (32, 128) minimum
_BM = 256
_BK = 512


def _pow2_f32(e):
    return jax.lax.bitcast_convert_type(
        ((e.astype(jnp.int32) + 127) << 23), jnp.float32)


def _limbs_from_components(sft_ref, c0_ref, c1_ref, n_limbs):
    """Shared encoder preamble: scale the exact f32 components by 2^sft and
    accumulate them into balanced 20-bit limbs (the INT8 and FP8 encode
    kernels differ only in the residue emission that follows -- this is ONE
    code path so a decomposition fix can never apply to only one backend).

    NB: every scalar is wrapped in np.int32/np.float32 -- under x64, python
    int literals are weak int64, which Mosaic cannot convert (it recurses);
    integer floor_divide/remainder are likewise absent and replaced by
    multiply-shift / float-reciprocal-with-correction.
    """
    i32 = np.int32
    sft = sft_ref[:]
    h1 = jnp.right_shift(sft * i32(21846), i32(16))        # ~sft/3
    rm = sft - h1
    h2 = jnp.right_shift(rm, i32(1))
    h3 = rm - h2
    f = (_pow2_f32(h1), _pow2_f32(h2), _pow2_f32(h3))

    comps = [c0_ref[:]] + ([c1_ref[:]] if c1_ref is not None else [])
    limbs = [jnp.zeros(comps[0].shape, jnp.int32) for _ in range(n_limbs)]
    g_frac = jnp.zeros(comps[0].shape, jnp.float32)

    for c in comps:
        y = ((c * f[0]) * f[1]) * f[2]     # exact power-of-two scaling
        bits = jax.lax.bitcast_convert_type(y, jnp.int32)
        sign = jnp.where(bits < i32(0), i32(-1), i32(1))
        expf = jnp.right_shift(bits, i32(23)) & i32(0xFF)
        frac = bits & i32(0x7FFFFF)
        is_norm = expf > i32(0)
        mant = jnp.where(is_norm, frac | i32(1 << 23), frac)
        e = jnp.where(is_norm, expf - i32(127), i32(-126))
        d = e - i32(23)
        sig = jnp.clip(-d, i32(0), i32(31))
        m_int = jnp.right_shift(mant, sig)
        dpos = jnp.maximum(d, i32(0))
        mfrac = mant - jnp.left_shift(m_int, sig)
        fr = mfrac.astype(jnp.float32) * _pow2_f32(jnp.maximum(d, i32(-30)))
        fr = jnp.where(-d > i32(30), jnp.abs(y), fr)
        g_frac = g_frac + sign.astype(jnp.float32) * fr
        # place m_int * 2^dpos into 20-bit limbs; dpos in [0, ~96]:
        # exact floor(dpos/20) via multiply-shift (no integer div in Mosaic)
        li = jnp.right_shift(dpos * i32(3277), i32(16))
        off = dpos - li * i32(20)
        sh = i32(20) - off
        mhi = jnp.right_shift(m_int, sh)
        mlo = m_int - jnp.left_shift(mhi, sh)
        c_lo = sign * jnp.left_shift(mlo, off)
        c_hi = sign * mhi
        for lv in range(n_limbs):
            limbs[lv] = (limbs[lv]
                         + jnp.where(li == i32(lv), c_lo, i32(0))
                         + jnp.where(li == i32(lv - 1), c_hi, i32(0)))
    limbs[0] = limbs[0] + jnp.floor(g_frac).astype(jnp.int32)

    half = i32(1 << 19)
    for lv in range(n_limbs - 1):
        cr = jnp.right_shift(limbs[lv] + half, i32(20))
        limbs[lv] = limbs[lv] - jnp.left_shift(cr, i32(20))
        limbs[lv + 1] = limbs[lv + 1] + cr
    return limbs


def _encode_kernel(sft_ref, c0_ref, c1_ref, out_ref, *, num_moduli, n_limbs,
                   weights):
    """One (BM, BK) tile: scale -> decompose -> limbs -> residue planes.

    sft_ref: (BM, 1) [scale_axis=0] or (1, BK) [scale_axis=1] int32
    c0/c1:   (BM, BK) f32 exact components of the input
    out_ref: (num_moduli, BM, BK) int8
    weights: static tuple of per-modulus tuples (w_0 .. w_{n_limbs-1}, p)
    """
    i32 = np.int32
    limbs = _limbs_from_components(sft_ref, c0_ref, c1_ref, n_limbs)

    for i in range(num_moduli):
        ws = weights[i]
        p = i32(ws[-1])
        if ws[-1] == 256:
            # p = 2^8: every 2^(20*lv) weight is 0 mod p -- the residue is
            # just the low byte of limb 0, balanced by mask arithmetic
            r = ((limbs[0] + i32(128)) & i32(0xFF)) - i32(128)
            out_ref[i, :, :] = r.astype(jnp.int8)
            continue
        acc = limbs[0]
        for lv in range(1, n_limbs):
            if ws[lv]:
                acc = acc + limbs[lv] * i32(ws[lv])
        # acc mod p without integer division: |acc| <= n_limbs*2^19*p/2 < 2^28,
        # f32 rounds acc by <= 16, so q = rint(acc/p) is within ~0.6 of the
        # real quotient => |acc - q*p| <= ~1.1p; two BALANCED corrections
        # land the unique representative in [-p/2, p/2) directly
        q = jnp.rint(acc.astype(jnp.float32) * np.float32(1.0 / ws[-1])
                     ).astype(jnp.int32)
        r = acc - q * p
        r = jnp.where(i32(2) * r >= p, r - p, r)
        r = jnp.where(i32(2) * r < -p, r + p, r)
        out_ref[i, :, :] = r.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("scale_axis", "num_moduli",
                                             "backend"))
def encode_planes_tiles(c0, c1, sft, scale_axis: int, num_moduli: int,
                        backend: str):
    """Pallas-fused residue-plane encoder for tile-aligned INT8 operands.

    c0, c1: exact f32 components of x (c1 may be None for f32 inputs).
    sft: int32 shifts along scale_axis. Returns (nu, m, k) int8 planes,
    bit-identical to quantize.residues_wrapped(...).astype(int8).
    """
    mods = tables.moduli(backend)[:num_moduli]
    dpos_max = int(tables.log2P(num_moduli, backend)) + 3
    n_limbs = dpos_max // 20 + 2
    weights = []
    for p in mods:
        ws = [1]
        for lv in range(1, n_limbs):
            w = pow(2, 20 * lv, p)
            ws.append(w - p if 2 * w >= p else w)
        weights.append(tuple(ws) + (int(p),))
    weights = tuple(weights)

    m, k = c0.shape
    bm = _pick_tile(m, (_BM, 128, 64, 32))
    bk = _pick_tile(k, (_BK, 256, 128))
    grid = (m // bm, k // bk)
    if scale_axis == 0:
        sft2 = sft.reshape(m, 1)
        # NB: literal index-map constants are weak i64 under x64 and fail
        # Mosaic legalization; derive zeros from the grid indices instead
        sft_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, j * 0),
                                memory_space=pltpu.VMEM)
    else:
        sft2 = sft.reshape(1, k)
        sft_spec = pl.BlockSpec((1, bk), lambda i, j: (i * 0, j),
                                memory_space=pltpu.VMEM)

    tile = pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((num_moduli, bm, bk), lambda i, j: (i * 0, i, j),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _encode_kernel, num_moduli=num_moduli, n_limbs=n_limbs,
        weights=weights)
    if c1 is None:
        def kernel1(sft_ref, c0_ref, out_ref):
            kernel(sft_ref, c0_ref, None, out_ref)
        return pl.pallas_call(
            kernel1,
            out_shape=jax.ShapeDtypeStruct((num_moduli, m, k), jnp.int8),
            grid=grid, in_specs=[sft_spec, tile], out_specs=out_spec,
            interpret=jax.default_backend() == "cpu",
        )(sft2, c0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_moduli, m, k), jnp.int8),
        grid=grid, in_specs=[sft_spec, tile, tile], out_specs=out_spec,
        interpret=jax.default_backend() == "cpu",
    )(sft2, c0, c1)


def _pick_tile(dim: int, candidates) -> int:
    """Largest candidate tile size that divides dim (0 if none)."""
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def encode_supported(x, num_moduli: int, backend: str) -> bool:
    """Tile-alignment gate for the Pallas encoders (INT8 and FP8): any shape
    whose dims are multiples of the minimal int8 tile (32 sublanes x 128
    lanes). core.emulate_matmul pads every operand to multiples of 128, so in
    the driver path this is always true (reference pads to 256 similarly,
    common.hpp:32, gemmul8_real.hpp:73-78)."""
    m, k = x.shape
    return m % 32 == 0 and k % 128 == 0


# ---------------------------------------------------------------------------
# fused epilogue: mod-reduce + CRT limb accumulation + inverse scaling in ONE
# pass over C_hi (the int8 dot's int32 output). Replaces the XLA chain
# mod_reduce -> crt_limbs_matrix -> reconstruct_scale_ff, which materializes
# c_mid (nu,m,n), the (m,n,n_cols) f32 column tensor and the limb arrays in
# HBM; here everything after the dot stays in VMEM and only the final f32
# output pair is written. Bit-identical to the unfused path (the limb values
# are exact integers either way, and the descale replicates the two_sum chain
# order op-for-op).
#
# Reference analog: the one-buffer GEMM + conv_hi2mid interleave and the
# inverse_scaling kernel (gemmul8_real.hpp:144-191, conv_hi2mid_real.hpp:51-86,
# inverse_scaling_real.hpp:56-89).
# ---------------------------------------------------------------------------


def _wrap_full(acc, p_int, w2, inv, shift=16):
    """wrap(acc mod p) for |acc| < 2^31 into [-p/2, p/2): fold the top bits
    via wrap(2^shift mod p) so the residual magnitude is f32-exact, then one
    rint division (Mosaic has no integer div/mod). shift = 16 for p <= 256
    (|t| < 2^23); the FP8 moduli (p <= 1089) use shift = 20 (|t| < 2^22).
    Powers of two reduce to mask arithmetic. Any correct route yields the
    same unique representative, so fold choices never affect results."""
    i32 = np.int32
    p = i32(p_int)
    if p_int & (p_int - 1) == 0:
        h = i32(p_int // 2)
        return ((acc + h) & i32(p_int - 1)) - h
    acc_hi = jnp.right_shift(acc, i32(shift))
    acc_lo = acc - jnp.left_shift(acc_hi, i32(shift))      # in [0, 2^shift)
    t = acc_hi * i32(w2) + acc_lo                          # f32-exact range
    q = jnp.rint(t.astype(jnp.float32) * np.float32(inv)).astype(jnp.int32)
    r = t - q * p                                          # |r| <= ~1.1p
    # two BALANCED corrections land the unique representative in
    # [-p/2, p/2) directly (one fewer select than the positive-range route;
    # same value -- the representative is unique)
    r = jnp.where(i32(2) * r >= p, r - p, r)
    r = jnp.where(i32(2) * r < -p, r + p, r)
    return r


def _crt_limbs_from_res(rs, w16, p16, L, invp_top, num_moduli):
    """Wrapped residues (list of nu (BM, BN) int32) -> carry-normalized
    16-bit limbs after the P*quot fold. Exact int32 throughout; identical
    limb values to ff.crt_limbs_matrix."""
    i32 = np.int32
    f32 = np.float32
    limbs = [jnp.zeros(rs[0].shape, jnp.int32) for _ in range(L)]
    for i in range(num_moduli):
        r = rs[i]
        for li in range(L):
            if w16[i][li]:
                # |r * w16| <= (p/2) * 65535 < 2^26; nu-term sums < 2^31
                limbs[li] = limbs[li] + r * i32(w16[i][li])
    half = i32(1 << 15)
    for li in range(L - 1):
        c = jnp.right_shift(limbs[li] + half, i32(16))
        limbs[li] = limbs[li] - jnp.left_shift(c, i32(16))
        limbs[li + 1] = limbs[li + 1] + c
    t_top = limbs[L - 1].astype(jnp.float32)
    for i in range(2, min(3, L) + 1):
        t_top = t_top * f32(65536.0) + limbs[L - i].astype(jnp.float32)
    quot = jnp.rint(t_top * f32(invp_top)).astype(jnp.int32)
    for li in range(L):
        if p16[li]:
            limbs[li] = limbs[li] - quot * i32(p16[li])
    for li in range(L - 1):
        c = jnp.right_shift(limbs[li] + half, i32(16))
        limbs[li] = limbs[li] - jnp.left_shift(c, i32(16))
        limbs[li + 1] = limbs[li + 1] + c
    return limbs


def _descale_factors(sfta, sftb):
    """Rank-1 power-of-two factor triples from the shift tiles: split in
    THREE so every factor's exponent stays in f32's normal range for
    |sft| up to ~378 (a half-split caps at 252, which high-nu shifts on
    tiny-magnitude rows exceed -- the assembled exponent field would
    overflow into the sign bit and emit garbage, not zero). Must stay
    op-for-op identical to ff.descale_accel's split (bit-identity)."""
    i32 = np.int32
    outs = []
    for s in (sfta, sftb):
        t = -s
        h1 = jnp.right_shift(t * i32(21846), i32(16))      # ~t/3
        rm = t - h1
        h2 = jnp.right_shift(rm, i32(1))
        h3 = rm - h2
        outs += [_pow2_f32(h1), _pow2_f32(h2), _pow2_f32(h3)]
    return tuple(outs)


def _descale_emit(limbs, factors, descale, L):
    """Compensated smallest-first limb merge -- op-for-op the same order as
    ff.reconstruct_scale_ff's accelerator path. Returns (hi, lo) f32."""
    f32 = np.float32
    fa1, fa2, fa3, fb1, fb2, fb3 = factors
    hi = None
    lo = None
    for li in range(L):
        s1, s2 = descale[li]
        term = limbs[li].astype(jnp.float32) * f32(s1)
        term = ((term * fa1) * fb1) * f32(s2)
        term = (term * fa2) * fb2
        term = (term * fa3) * fb3
        if hi is None:
            hi = term
            lo = jnp.zeros_like(term)
        else:
            s = hi + term                                  # two_sum (Knuth)
            tt = s - hi
            err = (hi - (s - tt)) + (term - tt)
            hi = s
            lo = lo + err
    return hi, lo


def _epilogue_kernel(sfta_ref, sftb_ref, chi_ref, hi_ref, lo_ref, *,
                     num_moduli, mods, w2_16, w16, p16, L, invp_top,
                     base, descale, shift=16):
    """One (BM, BN) tile: per-modulus wrap -> limb MACs -> carry -> quotient
    fold -> compensated descale. All integer steps exact in int32.

    w2_16[i] = wrap(2^16 mod p_i); w16[i][li] = 16-bit slice li of qPi >> base;
    p16[li] = 16-bit slice of P >> base; descale = (s1, s2) static per-limb
    power-of-two factor pair.
    """
    # chi may be int32 C_hi (wrap needed) or already-wrapped int8/int16
    # residues from fused_recombine_3m (the wrap is then value-identical:
    # _wrap_full returns the unique representative in [-p/2, p/2))
    rs = [_wrap_full(chi_ref[i, :, :].astype(jnp.int32), mods[i], w2_16[i],
                     1.0 / mods[i], shift) for i in range(num_moduli)]
    limbs = _crt_limbs_from_res(rs, w16, p16, L, invp_top, num_moduli)
    factors = _descale_factors(sfta_ref[:], sftb_ref[:])
    hi, lo = _descale_emit(limbs, factors, descale, L)
    hi_ref[:, :] = hi
    lo_ref[:, :] = lo


@functools.lru_cache(maxsize=None)
def _epilogue_plan(num_moduli: int, backend: str, out_bits: int):
    """Static constants for the fused epilogue, derived from the SAME matrix
    plan as the unfused path (ff._crt_matrix_plan) so limb values agree
    bit-for-bit, plus the per-limb descale factor splits."""
    from . import ff
    base, n_cols, C, pcols, invp_top = ff._crt_matrix_plan(
        num_moduli, backend, out_bits)
    mods = tuple(int(p) for p in tables.moduli(backend)[:num_moduli])
    L = (n_cols + 1) // 2
    w16 = []
    for i in range(num_moduli):
        row = []
        for li in range(L):
            v = int(C[i, 2 * li])
            if 2 * li + 1 < n_cols:
                v += int(C[i, 2 * li + 1]) << 8
            row.append(v)
        w16.append(tuple(row))
    p16 = []
    for li in range(L):
        v = int(pcols[2 * li])
        if 2 * li + 1 < n_cols:
            v += int(pcols[2 * li + 1]) << 8
        p16.append(v)
    shift = 16 if backend == tables.Backend.INT8 else 20
    w2_16 = []
    for p in mods:
        w = pow(2, shift, p)
        w2_16.append(w - p if 2 * w >= p else w)
    descale = []
    for li in range(L):
        e = base + 16 * li
        descale.append((float(np.float32(2.0 ** (e // 2))),
                        float(np.float32(2.0 ** (e - e // 2)))))
    return (mods, tuple(w2_16), tuple(map(tuple, w16)), tuple(p16), L,
            float(invp_top), base, tuple(descale), shift)


@functools.partial(jax.jit, static_argnames=("num_moduli", "backend",
                                             "out_bits"))
def fused_epilogue(c_hi, sft_a, sft_b, num_moduli: int, backend: str,
                   out_bits: int):
    """Pallas-fused mod+CRT+descale: (nu, m, n) int32 C_hi -> (hi, lo) f32
    pair with hi+lo == the emulated product (combine in the output dtype).
    Bit-identical to mod_reduce -> ff.reconstruct_scale_ff.

    m, n must be multiples of 128 (callers pad-and-slice; core.emulate_matmul
    does this automatically)."""
    mods, w2_16, w16, p16, L, invp_top, base, descale, shift = _epilogue_plan(
        num_moduli, backend, out_bits)
    m, n = c_hi.shape[1], c_hi.shape[2]
    # VMEM budget: double-buffered (nu, BM, BN) i32 input + L limb arrays
    bm = bn = 256
    while bm > 128 and (2 * num_moduli + L + 6) * bm * bn * 4 > 11 << 20:
        bm //= 2
    bm = min(bm, m)
    bn = min(bn, n)
    if m % bm or n % bn:
        bm = min(128, m)
        bn = min(128, n)
    grid = (m // bm, n // bn)

    kernel = functools.partial(
        _epilogue_kernel, num_moduli=num_moduli, mods=mods, w2_16=w2_16,
        w16=w16, p16=p16, L=L, invp_top=invp_top, base=base,
        descale=descale, shift=shift)
    sfta_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, j * 0),
                             memory_space=pltpu.VMEM)
    sftb_spec = pl.BlockSpec((1, bn), lambda i, j: (i * 0, j),
                             memory_space=pltpu.VMEM)
    chi_spec = pl.BlockSpec((num_moduli, bm, bn), lambda i, j: (i * 0, i, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sfta_spec, sftb_spec, chi_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((m, n), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(sft_a.reshape(m, 1), sft_b.reshape(1, n), c_hi)


def _wrap_bal(x, p_int, inv):
    """Balanced wrap of an f32-exact-range int32 (|x| < 2^23) into
    [-p/2, p/2): one rint division + two corrections."""
    i32 = np.int32
    p = i32(p_int)
    q = jnp.rint(x.astype(jnp.float32) * np.float32(inv)).astype(jnp.int32)
    r = x - q * p
    r = jnp.where(i32(2) * r >= p, r - p, r)
    r = jnp.where(i32(2) * r < -p, r + p, r)
    return r


def _epilogue_kernel_fp8(sfta_ref, sftb_ref, c3_ref, hi_ref, lo_ref, *,
                         num_moduli, mods, w2_16, w16, p16, L, invp_top,
                         base, descale, shift, sqrts, nk):
    """FP8-backend variant: c3 is the (3*nu, BM, BN) f32 stack of the
    e4m3-split lane products (exact integers, |.| <= 2^24). Per modulus,
    the split products reassemble in residue space (sqrt pairing
    q*(C0+C1)+C2 or Karatsuba 256*C0+16*(C2-C0-C1)+C1, reference:
    mod.hpp:106-153) and the wrapped residues feed the same CRT limb
    pipeline. Intermediates are wrapped balanced at every step so all
    magnitudes stay f32-exact; residue classes are preserved, so the result
    is bit-identical to fp8._reassemble + the unfused CRT chain."""
    i32 = np.int32
    rs = []
    for i in range(num_moduli):
        p = mods[i]
        inv = 1.0 / p
        c0 = c3_ref[3 * i + 0, :, :].astype(jnp.int32)
        c1 = c3_ref[3 * i + 1, :, :].astype(jnp.int32)
        c2 = c3_ref[3 * i + 2, :, :].astype(jnp.int32)
        if i < nk:
            # |c0 + c1| < 2^25: fold via _wrap_full, then the small combine
            u = _wrap_full(c0 + c1, p, w2_16[i], inv, shift)
            c2w = _wrap_full(c2, p, w2_16[i], inv, shift)
            t0 = i32(sqrts[i]) * u + c2w          # |t0| < 2^15
        else:
            r0 = _wrap_full(c0, p, w2_16[i], inv, shift)
            r1 = _wrap_full(c1, p, w2_16[i], inv, shift)
            r2 = _wrap_full(c2, p, w2_16[i], inv, shift)
            t0 = i32(256) * r0 + i32(16) * (r2 - r0 - r1) + r1  # |t0| < 2^18
        rs.append(_wrap_bal(t0, p, inv))
    limbs = _crt_limbs_from_res(rs, w16, p16, L, invp_top, num_moduli)
    factors = _descale_factors(sfta_ref[:], sftb_ref[:])
    hi, lo = _descale_emit(limbs, factors, descale, L)
    hi_ref[:, :] = hi
    lo_ref[:, :] = lo


@functools.partial(jax.jit, static_argnames=("num_moduli", "out_bits"))
def fused_epilogue_fp8(c3, sft_a, sft_b, num_moduli: int, out_bits: int):
    """Pallas-fused FP8 epilogue: (3*nu, m, n) f32 lane products ->
    (hi, lo) f32 pair. Bit-identical to fp8._reassemble -> mod_reduce ->
    ff.reconstruct_scale_ff."""
    from . import fp8 as fp8mod
    backend = tables.Backend.FP8
    mods, w2_16, w16, p16, L, invp_top, base, descale, shift = _epilogue_plan(
        num_moduli, backend, out_bits)
    sqrts = fp8mod._sqrt_moduli()[:min(num_moduli, tables.NOT_KARATSUBA)]
    nk = min(num_moduli, tables.NOT_KARATSUBA)
    m, n = c3.shape[1], c3.shape[2]
    bm = bn = 256
    bytes_per = (2 * 3 * num_moduli + L + 8) * 4
    while bm * bn * bytes_per > 11 << 20 and (bm > 64 or bn > 128):
        if bm >= bn and bm > 64:
            bm //= 2
        elif bn > 128:
            bn //= 2
        else:
            break
    bm = min(bm, m)
    bn = min(bn, n)
    if m % bm or n % bn:
        bm = min(64, m)
        bn = min(128, n)
    grid = (m // bm, n // bn)
    kernel = functools.partial(
        _epilogue_kernel_fp8, num_moduli=num_moduli, mods=mods, w2_16=w2_16,
        w16=w16, p16=p16, L=L, invp_top=invp_top, base=base, descale=descale,
        shift=shift, sqrts=tuple(int(q) for q in sqrts), nk=nk)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, 1), lambda i, j: (i, j * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn), lambda i, j: (i * 0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3 * num_moduli, bm, bn),
                               lambda i, j: (i * 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((m, n), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(sft_a.reshape(m, 1), sft_b.reshape(1, n), c3)


def _lane_recombine_3m(chi_ref, i, *, num_moduli, mods, w2_16, shift):
    """Per-modulus 3M lane wrap + residue-space recombine shared by the
    single-kernel and split complex epilogues (their bit-identity contract
    REQUIRES one code path): Re = Crr - Cii, Im = Crii - Crr - Cii, mod p
    (reference: conv_hi2mid_complex.hpp:9-40). Wrapped lanes sit in
    [-p/2, p/2), so re is in (-p, p) and im in (-3p/2, 3p/2): ONE
    correction each way suffices for both (a value >= p/2 drops below
    p/2 after a single subtract because it started below 3p/2)."""
    i32 = np.int32
    p = i32(mods[i])
    inv = 1.0 / mods[i]
    crr = _wrap_full(chi_ref[i, :, :], mods[i], w2_16[i], inv, shift)
    cii = _wrap_full(chi_ref[num_moduli + i, :, :], mods[i], w2_16[i],
                     inv, shift)
    cri = _wrap_full(chi_ref[2 * num_moduli + i, :, :], mods[i],
                     w2_16[i], inv, shift)
    re = crr - cii                                    # in (-p, p)
    re = jnp.where(i32(2) * re >= p, re - p, re)
    re = jnp.where(i32(2) * re < -p, re + p, re)
    im = cri - crr - cii                              # in (-3p/2, 3p/2)
    im = jnp.where(i32(2) * im >= p, im - p, im)
    im = jnp.where(i32(2) * im < -p, im + p, im)
    return re, im


def _epilogue_kernel_cplx(sfta_ref, sftb_ref, chi_ref, hire_ref, lore_ref,
                          hiim_ref, loim_ref, *, num_moduli, mods, w2_16,
                          w16, p16, L, invp_top, base, descale, shift=16):
    """Complex 3M variant: chi is the (3*nu, BM, BN) stack of lane products
    (Crr planes, then Cii, then Crii). Per modulus, wrap the three lane
    sums, recombine in residue space (_lane_recombine_3m), then run TWO CRT
    limb pipelines sharing the shift factors."""
    rs_re = []
    rs_im = []
    for i in range(num_moduli):
        re, im = _lane_recombine_3m(chi_ref, i, num_moduli=num_moduli,
                                    mods=mods, w2_16=w2_16, shift=shift)
        rs_re.append(re)
        rs_im.append(im)
    factors = _descale_factors(sfta_ref[:], sftb_ref[:])
    limbs = _crt_limbs_from_res(rs_re, w16, p16, L, invp_top, num_moduli)
    hi, lo = _descale_emit(limbs, factors, descale, L)
    hire_ref[:, :] = hi
    lore_ref[:, :] = lo
    limbs = _crt_limbs_from_res(rs_im, w16, p16, L, invp_top, num_moduli)
    hi, lo = _descale_emit(limbs, factors, descale, L)
    hiim_ref[:, :] = hi
    loim_ref[:, :] = lo


@functools.partial(jax.jit, static_argnames=("num_moduli", "backend",
                                             "out_bits"))
def fused_epilogue_complex(c_hi3, sft_a, sft_b, num_moduli: int, backend: str,
                           out_bits: int):
    """Pallas-fused complex epilogue: (3*nu, m, n) int32 lane products
    (Crr | Cii | Crii blocks) -> (hi_re, lo_re, hi_im, lo_im) f32.
    Bit-identical to mod_reduce + _recombine_3m + 2x reconstruct_scale_ff."""
    mods, w2_16, w16, p16, L, invp_top, base, descale, shift = _epilogue_plan(
        num_moduli, backend, out_bits)
    m, n = c_hi3.shape[1], c_hi3.shape[2]
    bm = bn = 256
    bytes_per = (2 * 3 * num_moduli + 2 * L + 10) * 4
    while bm * bn * bytes_per > 11 << 20 and (bm > 64 or bn > 128):
        if bm >= bn and bm > 64:
            bm //= 2
        elif bn > 128:
            bn //= 2
        else:
            break
    bm = min(bm, m)
    bn = min(bn, n)
    if m % bm or n % bn:
        bm = min(64, m)
        bn = min(128, n)
    grid = (m // bm, n // bn)
    kernel = functools.partial(
        _epilogue_kernel_cplx, num_moduli=num_moduli, mods=mods,
        w2_16=w2_16, w16=w16, p16=p16, L=L, invp_top=invp_top, base=base,
        descale=descale, shift=shift)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, 1), lambda i, j: (i, j * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn), lambda i, j: (i * 0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3 * num_moduli, bm, bn),
                               lambda i, j: (i * 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32)] * 4,
        interpret=jax.default_backend() == "cpu",
    )(sft_a.reshape(m, 1), sft_b.reshape(1, n), c_hi3)


def _recombine_kernel_cplx(chi_ref, re_ref, im_ref, *, num_moduli, mods,
                           w2_16, shift):
    """Wrap the 3 lane products and 3M-recombine in residue space, emitting
    wrapped int8 (Re, Im) residue planes. The lane math is op-for-op the
    same as _epilogue_kernel_cplx's, so feeding these planes through the
    REAL fused_epilogue (whose wrap is value-identity on wrapped inputs)
    reproduces the single-kernel complex epilogue bit-for-bit."""
    for i in range(num_moduli):
        re, im = _lane_recombine_3m(chi_ref, i, num_moduli=num_moduli,
                                    mods=mods, w2_16=w2_16, shift=shift)
        re_ref[i, :, :] = re.astype(jnp.int8)
        im_ref[i, :, :] = im.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("num_moduli", "backend"))
def fused_recombine_3m(c_hi3, num_moduli: int, backend: str):
    """Pallas-fused wrap + 3M recombine: (3*nu, m, n) int32 lane products ->
    (re, im) wrapped int8 residue planes, each (nu, m, n).

    First stage of the SPLIT complex epilogue used for nu > 16, where the
    single 3*nu-wrap dual-CRT kernel body makes Mosaic compile time
    pathological: this kernel keeps only the wraps + recombine, and the two
    CRT+descale passes reuse the real fused_epilogue (reference analog:
    conv_hi2mid_complex.hpp:9-40 as a separate kernel from
    inverse_scaling_complex.hpp)."""
    mods, w2_16, _w16, _p16, _L, _invp, _base, _desc, shift = _epilogue_plan(
        num_moduli, backend, 53)
    m, n = c_hi3.shape[1], c_hi3.shape[2]
    bm = bn = 256
    bytes_per = (2 * 3 * num_moduli * 4 + 2 * 2 * num_moduli + 24)
    while bm * bn * bytes_per > 11 << 20 and (bm > 64 or bn > 128):
        if bm >= bn and bm > 64:
            bm //= 2
        elif bn > 128:
            bn //= 2
        else:
            break
    bm = min(bm, m)
    bn = min(bn, n)
    if m % bm or n % bn:
        bm = min(64, m)
        bn = min(128, n)
    grid = (m // bm, n // bn)
    kernel = functools.partial(_recombine_kernel_cplx, num_moduli=num_moduli,
                               mods=mods, w2_16=w2_16, shift=shift)
    out_spec = pl.BlockSpec((num_moduli, bm, bn), lambda i, j: (i * 0, i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((3 * num_moduli, bm, bn),
                               lambda i, j: (i * 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((num_moduli, m, n), jnp.int8)] * 2,
        interpret=jax.default_backend() == "cpu",
    )(c_hi3)


# ---------------------------------------------------------------------------
# FP8 backend: fused encode emitting GEMM-ready bf16 plane stacks
# ---------------------------------------------------------------------------

def _encode_kernel_fp8(sft_ref, c0_ref, c1_ref, out_ref, *, num_moduli,
                       n_limbs, weights, sqrts, slot_orders):
    """Like _encode_kernel, but emits the FP8 backend's e4m3-exact split
    planes (sqrt pair / Karatsuba triple, fp8.py) directly in the (3*nu)
    batched-GEMM order for this operand side -- no separate split or
    stacking pass, no canonical-plane materialization."""
    i32 = np.int32
    f32 = np.float32
    limbs = _limbs_from_components(sft_ref, c0_ref, c1_ref, n_limbs)

    nk = len(sqrts)
    for i in range(num_moduli):
        ws = weights[i]
        p = i32(ws[-1])
        acc = limbs[0]
        for lv in range(1, n_limbs):
            acc = acc + limbs[lv] * i32(ws[lv])
        # |acc| <= n_limbs * 2^19 * p_max/2 < 2^31; f32 rounds acc by <= 128,
        # so q is within ~0.8 of the truth: one correction each side
        q = jnp.rint(acc.astype(jnp.float32) * f32(1.0 / ws[-1])
                     ).astype(jnp.int32)
        r = acc - q * p
        r = jnp.where(r < i32(0), r + p, r)
        r = jnp.where(r >= p, r - p, r)
        r = jnp.where(i32(2) * r >= p, r - p, r)
        if i < nk:           # perfect-square modulus: r = q*bx + by
            qi = sqrts[i]
            rf = r.astype(jnp.float32)
            bx = jnp.rint(rf * f32(1.0 / qi))
            by = rf - f32(qi) * bx
            bz = jnp.zeros_like(bx)
        else:                # Karatsuba: r = 16*bx + by, bz = bx + by
            absr = jnp.abs(r)
            mag = jnp.right_shift(absr + i32(15), i32(4))
            bx_i = jnp.where(r < i32(0), -mag, mag)
            by_i = r - i32(16) * bx_i
            bx = bx_i.astype(jnp.float32)
            by = by_i.astype(jnp.float32)
            bz = (bx_i + by_i).astype(jnp.float32)
        planes = (bx, by, bz)
        order = slot_orders[0] if i < nk else slot_orders[1]
        for s, slot in enumerate(order):
            out_ref[3 * i + s, :, :] = planes[slot].astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("scale_axis", "num_moduli"))
def encode_planes_fp8_tiles(c0, c1, sft, scale_axis: int, num_moduli: int):
    """Pallas-fused FP8 encoder: returns (3*num_moduli, m, k) bf16 planes in
    the batched-GEMM order for this side (scale_axis=0: lhs, =1: rhs),
    numerically identical to fp8 split of quantize.residues_wrapped."""
    from . import fp8 as fp8mod
    backend = tables.Backend.FP8
    mods = tables.moduli(backend)[:num_moduli]
    dpos_max = int(tables.log2P(num_moduli, backend)) + 3
    n_limbs = dpos_max // 20 + 2
    weights = []
    for p in mods:
        ws = [1]
        for lv in range(1, n_limbs):
            w = pow(2, 20 * lv, p)
            ws.append(w - p if 2 * w >= p else w)
        weights.append(tuple(ws) + (int(p),))
    sqrts = fp8mod._sqrt_moduli()[:min(num_moduli, tables.NOT_KARATSUBA)]
    side = "lhs" if scale_axis == 0 else "rhs"
    slot_orders = (fp8mod._LHS_SLOTS["sqrt"] if side == "lhs"
                   else fp8mod._RHS_SLOTS["sqrt"],
                   fp8mod._LHS_SLOTS["kar"] if side == "lhs"
                   else fp8mod._RHS_SLOTS["kar"])

    m, k = c0.shape
    # VMEM budget: the (3*nu, bm, bk) bf16 output tile double-buffers against
    # a 16 MB VMEM; shrink tiles with nu (e.g. nu=10 -> 128x512, nu=20 ->
    # 128x256)
    bm = min(128, m)
    bk = min(_BK, k)
    while bk > 128 and (3 * num_moduli * 2 + 8 + 8) * bm * bk * 2 > 11 << 20:
        bk //= 2
    if m % bm or k % bk:
        # fall back to whatever divides (encode_supported gated on 32/128)
        bm = min(32, m)
        bk = min(128, k)
    grid = (m // bm, k // bk)
    if scale_axis == 0:
        sft2 = sft.reshape(m, 1)
        sft_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, j * 0),
                                memory_space=pltpu.VMEM)
    else:
        sft2 = sft.reshape(1, k)
        sft_spec = pl.BlockSpec((1, bk), lambda i, j: (i * 0, j),
                                memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * num_moduli, bm, bk),
                            lambda i, j: (i * 0, i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _encode_kernel_fp8, num_moduli=num_moduli, n_limbs=n_limbs,
        weights=tuple(weights), sqrts=tuple(sqrts), slot_orders=slot_orders)
    out_shape = jax.ShapeDtypeStruct((3 * num_moduli, m, k), jnp.bfloat16)
    if c1 is None:
        def kernel1(sft_ref, c0_ref, out_ref):
            kernel(sft_ref, c0_ref, None, out_ref)
        return pl.pallas_call(
            kernel1, out_shape=out_shape, grid=grid,
            in_specs=[sft_spec, tile], out_specs=out_spec,
            interpret=jax.default_backend() == "cpu")(sft2, c0)
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid,
        in_specs=[sft_spec, tile, tile], out_specs=out_spec,
        interpret=jax.default_backend() == "cpu")(sft2, c0, c1)

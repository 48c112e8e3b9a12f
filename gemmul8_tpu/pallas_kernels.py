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


def _encode_kernel(sft_ref, c0_ref, c1_ref, out_ref, *, num_moduli, n_limbs,
                   weights):
    """One (BM, BK) tile: scale -> decompose -> limbs -> residue planes.

    sft_ref: (BM, 1) [scale_axis=0] or (1, BK) [scale_axis=1] int32
    c0/c1:   (BM, BK) f32 exact components of the input
    out_ref: (num_moduli, BM, BK) int8
    weights: static tuple of per-modulus tuples (w_0 .. w_{n_limbs-1}, p)

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

    for i in range(num_moduli):
        ws = weights[i]
        p = i32(ws[-1])
        acc = limbs[0]
        for lv in range(1, n_limbs):
            acc = acc + limbs[lv] * i32(ws[lv])
        # acc mod p without integer division: |acc| <= n_limbs*2^19*p/2 < 2^28,
        # f32 rounds acc by <= 16, so q = rint(acc/p) is within ~0.6 of the
        # real quotient; one correction each side lands r in [0, p)
        q = jnp.rint(acc.astype(jnp.float32) * np.float32(1.0 / ws[-1])
                     ).astype(jnp.int32)
        r = acc - q * p
        r = jnp.where(r < i32(0), r + p, r)
        r = jnp.where(r >= p, r - p, r)
        r = jnp.where(i32(2) * r >= p, r - p, r)
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
    bm = min(_BM, m)
    bk = min(_BK, k)
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


def encode_supported(x, num_moduli: int, backend: str) -> bool:
    """Tile-alignment gate for the Pallas encoders (INT8 and FP8)."""
    m, k = x.shape
    bm = min(_BM, m)
    bk = min(_BK, k)
    return (m % bm == 0 and k % bk == 0 and bm % 32 == 0 and bk % 128 == 0)


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
    sft = sft_ref[:]
    h1 = jnp.right_shift(sft * i32(21846), i32(16))
    rm = sft - h1
    h2 = jnp.right_shift(rm, i32(1))
    h3 = rm - h2
    f = (_pow2_f32(h1), _pow2_f32(h2), _pow2_f32(h3))

    comps = [c0_ref[:]] + ([c1_ref[:]] if c1_ref is not None else [])
    limbs = [jnp.zeros(comps[0].shape, jnp.int32) for _ in range(n_limbs)]
    g_frac = jnp.zeros(comps[0].shape, jnp.float32)
    for c in comps:
        y = ((c * f[0]) * f[1]) * f[2]
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

"""Complex GEMM emulation (CGEMM/ZGEMM) via the 3M scheme in residue space.

TPU-native analog of the reference complex path (reference: src/gemmul8_complex.hpp,
src/scaling_fast_complex.hpp, src/conv_hi2mid_complex.hpp,
src/inverse_scaling_complex.hpp):

  * each operand emits THREE residue plane sets per modulus -- Re, Im and
    (Re+Im) mod p -- with a SHARED per-row/col shift computed from
    max(|Re|, |Im|) and the norm sum |Re|^2+|Im|^2 (mod.hpp:315-326,
    template_math.hpp:106-107);
  * 3 integer GEMMs per modulus (batched here as one 3*nu-batch dot_general):
    Crr = Ar.Br, Cii = Ai.Bi, Crii = (Ar+Ai).(Br+Bi);
  * 3M recombination in residue space: Re = Crr - Cii, Im = Crii - Crr - Cii
    (all mod p) -- conv_hi2mid_complex.hpp:9-40;
  * conjugation ('C' op) is folded into quantization by negating the imaginary
    lane (scaling_fast_complex.hpp:33, conj<T,CONJ>).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import core, quantize, tables

_REAL_DTYPE = {np.dtype("complex64"): jnp.float32, np.dtype("complex128"): jnp.float64}


def _quantize_complex(re, im, sft, scale_axis, num_moduli, backend, conj):
    """Emit the 3 lane plane-sets (Re, Im, (Re+Im) mod p) for one operand.

    Returns (3, nu, r, c) int8 for INT8, (3, nu, 3, r, c) bf16 for FP8
    (reference: mod.hpp:315-326 complex ModUnroll; fp8 lanes mirror f8x9).

    INT8 lanes route through quantize.encode_planes (the fused Pallas
    encoder on TPU); the (Re+Im) lane is derived from the two wrapped lane
    planes with one cheap elementwise wrap -- bit-identical to encoding
    Re+Im directly in residue space."""
    if conj:
        im = -im
    mods = tables.moduli(backend)[:num_moduli]
    if backend == tables.Backend.INT8:
        rr = quantize.encode_planes(re, sft, scale_axis, num_moduli, backend)
        ri = quantize.encode_planes(im, sft, scale_axis, num_moduli, backend)
        p_arr = jnp.asarray(mods, jnp.int32).reshape(num_moduli, 1, 1)
        s = rr.astype(jnp.int32) + ri.astype(jnp.int32)   # in (-p, p)
        s = jnp.where(2 * s >= p_arr, s - p_arr, s)
        s = jnp.where(2 * s < -p_arr, s + p_arr, s)
        return jnp.stack([rr, ri, s.astype(jnp.int8)])
    rr = quantize.residues_wrapped(re, sft, scale_axis, num_moduli, backend)
    ri = quantize.residues_wrapped(im, sft, scale_axis, num_moduli, backend)
    rri = []
    for i, p in enumerate(mods):
        s = (rr[i] + ri[i]) % p
        rri.append(jnp.where(2 * s >= p, s - p, s))
    lanes = jnp.stack([rr, ri, jnp.stack(rri)])     # (3, nu, ...) int32
    from . import fp8
    return jax.vmap(lambda r: fp8.split_planes(r, num_moduli))(lanes)


def _shift_complex_fast(re, im, num_moduli, backend, reduce_axis,
                        variant="reference"):
    """Shared shift from the lane-stacked array: amax = max(|re|,|im|) and
    norm^2 = sum(re^2 + im^2), exactly the reference's complex reduction."""
    stacked = jnp.concatenate([re, im], axis=reduce_axis)
    return quantize.shift_fast(stacked, num_moduli, backend, reduce_axis,
                               variant=variant)


def _recombine_3m(mids, num_moduli, backend):
    """(3, nu, m, n) wrapped lane-product residues -> (2, nu, m, n) wrapped
    residues of (Re, Im): Re = Crr - Cii, Im = Crii - Crr - Cii, all mod p
    (reference: conv_hi2mid_complex.hpp:9-40)."""
    mods = tables.moduli(backend)[:num_moduli]
    mid_t = jnp.int8 if backend == tables.Backend.INT8 else jnp.int16
    out_r, out_i = [], []
    for i, p in enumerate(mods):
        crr = mids[0, i].astype(jnp.int32)
        cii = mids[1, i].astype(jnp.int32)
        cri = mids[2, i].astype(jnp.int32)
        re = (crr - cii) % p
        im = (cri - crr - cii) % p
        re = jnp.where(2 * re >= p, re - p, re)
        im = jnp.where(2 * im >= p, im - p, im)
        out_r.append(re.astype(mid_t))
        out_i.append(im.astype(mid_t))
    return jnp.stack(out_r), jnp.stack(out_i)


def _extract_ub_lanes(re, im, scale_axis, backend):
    """Upper-bound extract of the three 3M estimation lanes with ONE shared
    pre-shift per row/col from amax(max(|Re|,|Im|)): ub|Re|, ub|Im|, and the
    SIGNED difference ub|Re| - ub|Im| (the reference's sub_ru_8bit lane,
    scaling_accu_complex.hpp:6-50,100-126) -- the difference of the ub planes
    (not an extraction of Re-Im), so the 3M identity holds exactly on the
    extracted integers."""
    reduce_axis = 1 - scale_axis
    ar_, ai_ = jnp.abs(re), jnp.abs(im)
    amax = jnp.max(jnp.maximum(ar_, ai_), axis=reduce_axis)
    E = quantize.ilogb(jnp.where(amax > 0, amax, jnp.ones_like(amax)))
    pre = np.int32(quantize.MAX_UFP[backend]) - E
    ub_r = quantize.extract_ub_with_pre(ar_, pre, reduce_axis, backend)
    ub_i = quantize.extract_ub_with_pre(ai_, pre, reduce_axis, backend)
    ub_ri = ub_r - ub_i            # |.| <= 2^maxUFP+1: exact in int8 / bf16
    return ub_r, ub_i, ub_ri, pre


def _combine_3m_bound(d, backend):
    """max(|Re|,|Im|) product-magnitude upper bound from the three estimation
    lane products d = (C0, uAr@uBi, uAi@uBr) (each already an upper bound of
    its exact lane product -- quantize.estimate_gemm inflates float paths).

    Combines in f32 with explicit inflations so the result stays a true
    upper bound for ANY k: the lane sums can exceed both int32 and the
    f32-exact integer range (c0 + c1 = uAr@uBr + uAi@uBi <= 2 * 65^2 * k for
    INT8 -- an int32 combine overflows from k ~ 2.5e5, and the previous
    int-typed combine silently wrapped there). The 2^-20 final inflation
    dominates the <= 3 f32 roundings relative to (|c0| + c1), including the
    cancellation case c0 ~ -c1 where bound falls back to c1 >= the true
    max. Costs at most one shift bit at a log2 boundary."""
    del backend  # same combine for INT8/FP8 (per-lane inflation upstream)
    one_ulp = np.float32(1.0 + 2.0 ** -22)
    c0 = d[0].astype(jnp.float32)
    c1 = (d[1].astype(jnp.float32) + d[2].astype(jnp.float32)) * one_ulp
    return jnp.maximum(c0 + c1, c1) * np.float32(1.0 + 2.0 ** -20)


def _shift_complex_accu(ar, ai, br, bi, num_moduli, backend):
    """Accurate mode with the reference's 3M product bounds
    (scaling_accu_complex.hpp:128-226, find_max.hpp:99-251): three estimation
    GEMMs of the lane extracts, recombined through the 3M identity on the
    extracted ub integers u = ub|.|:

      C0 = (uAr-uAi) @ (uBr-uBi)
      C1 = uAr @ uBi + uAi @ uBr            >= |Im(C)| * 2^(preA+preB)
      C0 + C1 = uAr@uBr + uAi@uBi           >= |Re(C)| * 2^(preA+preB)
      amax = max(C0 + C1, C1)               (C0 may be negative)

    This recovers the shift bits the previous single (|Re|+|Im|)-GEMM bound
    gave away (it overestimates both parts by up to the cross-term ratio,
    costing ~1-2 quantization bits on accu-mode CGEMM/ZGEMM)."""
    ua_r, ua_i, ua_ri, pre_a = _extract_ub_lanes(ar, ai, 0, backend)
    ub_r, ub_i, ub_ri, pre_b = _extract_ub_lanes(br, bi, 1, backend)
    # three estimation dots (3, m, k) x (3, k, n), each through
    # quantize.estimate_gemm: its K-chunking keeps the INT8 path exact past
    # k ~ 5e5 (a plain int32 dot wraps there -- the same latent overflow the
    # round-3 real-path fix closed) and its FP8 path carries the (k+1)*2^-24
    # round-off inflation
    lhs = jnp.stack([ua_ri, ua_r, ua_i])
    rhs = jnp.stack([ub_ri, ub_i, ub_r])
    d = jax.vmap(lambda l, r: quantize.estimate_gemm(l, r, backend))(lhs, rhs)
    bound = _combine_3m_bound(d, backend)
    sft_a = quantize.shift_accu_from_chi(
        jnp.max(bound, axis=1), pre_a, num_moduli, backend)
    sft_b = quantize.shift_accu_from_chi(
        jnp.max(bound, axis=0), pre_b, num_moduli, backend)
    return sft_a, sft_b


def emulate_matmul_complex_planar(ar: jax.Array, ai: jax.Array,
                                  br: jax.Array, bi: jax.Array, *,
                                  num_moduli: int, fastmode: bool = True,
                                  backend: str = tables.Backend.INT8,
                                  conj_a: bool = False, conj_b: bool = False,
                                  epilogue: str = "auto"):
    """Planar-complex emulated op(A) @ op(B): takes and returns separate
    (real, imag) arrays, never materializing a complex dtype.

    This IS the TPU-native complex path: the tested v5e PJRT stack does not
    implement complex64/128 at all (UNIMPLEMENTED at transfer time), and the
    3M residue pipeline is planar internally anyway. The complex-dtype
    wrapper below delegates here (CPU and other platforms).

    On accelerators, operands are zero-padded to multiples of 128 (fused
    encode + epilogue alignment) and the whole lane-product dot feeds ONE
    fused Pallas epilogue (wrap + 3M recombine + dual CRT + descale) --
    bit-identical to the unfused chain."""
    real_dt = ar.dtype
    m, n = ar.shape[0], br.shape[1]
    if ar.shape[1] == 0:
        # BLAS k=0 semantics: the product is zero
        return jnp.zeros((m, n), real_dt), jnp.zeros((m, n), real_dt)
    if jax.default_backend() != "cpu":
        ar = core._pad128(ar, (0, 1))
        ai = core._pad128(ai, (0, 1))
        br = core._pad128(br, (0, 1))
        bi = core._pad128(bi, (0, 1))

    if fastmode:
        var = "invariant" if fastmode == "robust" else "reference"
        sft_a = _shift_complex_fast(ar, ai, num_moduli, backend,
                                    reduce_axis=1, variant=var)
        sft_b = _shift_complex_fast(br, bi, num_moduli, backend,
                                    reduce_axis=0, variant=var)
    else:
        sft_a, sft_b = _shift_complex_accu(ar, ai, br, bi, num_moduli, backend)

    pa = _quantize_complex(ar, ai, sft_a, 0, num_moduli, backend, conj=conj_a)
    pb = _quantize_complex(br, bi, sft_b, 1, num_moduli, backend, conj=conj_b)
    ab_r, ab_i = _complex_product(pa, pb, sft_a, sft_b, num_moduli, backend,
                                  real_dt, epilogue)
    if ab_r.shape != (m, n):
        ab_r = ab_r[:m, :n]
        ab_i = ab_i[:m, :n]
    return ab_r, ab_i


def _complex_product(pa, pb, sft_a, sft_b, num_moduli, backend, real_dt,
                     epilogue):
    """Lane-product residue GEMMs + 3M recombine + dual CRT from encoded
    (3, nu, ...) lane plane sets (shared by the planar GEMM above and herk's
    plane-reuse path). On accelerators with aligned INT8 planes the whole
    epilogue runs as one fused Pallas consumer of the batched int8 dot."""
    m, k = pa.shape[-2], pa.shape[-1]
    n = pb.shape[-1]
    use_fused = (core.resolve_epilogue(epilogue) == "ff"
                 and jax.default_backend() != "cpu"
                 and backend == tables.Backend.INT8
                 and k <= core.K_CHUNK
                 and m % 128 == 0 and n % 128 == 0)
    if use_fused:
        from . import pallas_kernels as pk
        nu = num_moduli
        c_hi3 = core.residue_matmul(pa.reshape(3 * nu, *pa.shape[2:]),
                                    pb.reshape(3 * nu, *pb.shape[2:]))
        out_bits = 53 if np.dtype(real_dt).itemsize == 8 else 24
        if nu <= 16:
            # single kernel: wrap + 3M recombine + dual CRT + descale
            hire, lore, hiim, loim = pk.fused_epilogue_complex(
                c_hi3, sft_a, sft_b, nu, backend, out_bits)
        else:
            # nu > 16 (ZGEMM accuracy settings 17..20): the 3*nu-wrap
            # dual-CRT single body is pathological for Mosaic's compiler, so
            # SPLIT: fused wrap+recombine emitting wrapped int8 residues,
            # then two passes of the real CRT epilogue (bit-identical --
            # its wrap is value-identity on wrapped inputs)
            re_mid, im_mid = pk.fused_recombine_3m(c_hi3, nu, backend)
            hire, lore = pk.fused_epilogue(re_mid, sft_a, sft_b, nu,
                                           backend, out_bits)
            hiim, loim = pk.fused_epilogue(im_mid, sft_a, sft_b, nu,
                                           backend, out_bits)
        if out_bits == 24:
            ab_r = (hire + lore).astype(real_dt)
            ab_i = (hiim + loim).astype(real_dt)
        else:
            ab_r = hire.astype(real_dt) + lore.astype(real_dt)
            ab_i = hiim.astype(real_dt) + loim.astype(real_dt)
    else:
        # one residue GEMM per lane product (Crr, Cii, Crii), vmapped so XLA
        # fuses all 3*nu (INT8) / 9*nu (FP8) MXU matmuls into one batched
        # dot; K-chunking inside residue_gemm keeps accumulation exact for
        # any k.
        mids = jax.vmap(
            lambda x, y: core.residue_gemm(x, y, num_moduli, backend))(pa, pb)
        mid_r, mid_i = _recombine_3m(mids, num_moduli, backend)
        ab_r = core.reconstruct_scale(mid_r, sft_a, sft_b, num_moduli,
                                      backend, real_dt, epilogue)
        ab_i = core.reconstruct_scale(mid_i, sft_a, sft_b, num_moduli,
                                      backend, real_dt, epilogue)
    return ab_r, ab_i


def emulate_matmul_complex(a: jax.Array, b: jax.Array, *, num_moduli: int,
                           fastmode: bool = True,
                           backend: str = tables.Backend.INT8,
                           conj_a: bool = False, conj_b: bool = False,
                           epilogue: str = "auto") -> jax.Array:
    """Pure traceable emulated op(A) @ op(B) for complex operands (no epilogue)."""
    out_dtype = a.dtype
    ab_r, ab_i = emulate_matmul_complex_planar(
        jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b),
        num_moduli=num_moduli, fastmode=fastmode, backend=backend,
        conj_a=conj_a, conj_b=conj_b, epilogue=epilogue)
    return jax.lax.complex(ab_r, ab_i).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "op_a", "op_b", "has_c", "epilogue",
    "trivial_alpha", "beta_kind"))
def _gemm_cplx(a, b, c, alpha, beta, *, num_moduli, fastmode, backend,
               op_a, op_b, has_c, epilogue, trivial_alpha, beta_kind):
    if op_a in ("T", "C"):
        a = a.T
    if op_b in ("T", "C"):
        b = b.T
    out_dtype = a.dtype
    ab = emulate_matmul_complex(a, b, num_moduli=num_moduli, fastmode=fastmode,
                                backend=backend, conj_a=(op_a == "C"),
                                conj_b=(op_b == "C"), epilogue=epilogue)
    out = ab if trivial_alpha else alpha.astype(out_dtype) * ab
    # beta_kind == "zero" never touches C (reference: compile-time beta
    # specialization, inverse_scaling_complex.hpp)
    if has_c and beta_kind != "zero":
        out = out + (c if beta_kind == "one" else beta.astype(out_dtype) * c)
    return out


def _norm_op(t):
    """BLAS op flag -> 'N'/'T'/'C'; accepts python/numpy bools ('C' stays
    distinct from 'T': conjugate transpose)."""
    if isinstance(t, (bool, np.bool_)):
        return "T" if t else "N"
    if t is None:
        return "N"
    t = str(t).upper()
    if t not in ("N", "T", "C"):
        raise ValueError(f"bad op {t!r}")
    return t


def gemm_complex(a: jax.Array, b: jax.Array, *, num_moduli: int = 8,
                 fastmode: bool = True, backend: str = tables.Backend.INT8,
                 alpha=1.0, beta=0.0, c: Optional[jax.Array] = None,
                 trans_a="N", trans_b="N", epilogue: str = "auto") -> jax.Array:
    """Emulated complex GEMM: C = alpha * op(A) @ op(B) + beta * C with
    op in {N, T, C} (C = conjugate transpose). Public analog of the reference's
    cgemm/zgemm entry points (gemmul8.cu:126-134)."""
    op_a, op_b = _norm_op(trans_a), _norm_op(trans_b)
    if backend not in (tables.Backend.INT8, tables.Backend.FP8):
        raise ValueError(f"backend must be 'INT8' or 'FP8', got {backend!r}")
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(
            f"gemm expects 2-D operands, got A.ndim={a.ndim}, B.ndim={b.ndim}")
    name = np.dtype(a.dtype).name
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}] for {name}")
    has_c = c is not None
    trivial_alpha = isinstance(alpha, (int, complex, float)) and alpha == 1
    beta_kind = ("zero" if isinstance(beta, (int, complex, float)) and beta == 0
                 else "one" if isinstance(beta, (int, complex, float)) and beta == 1
                 else "general")
    if not has_c or beta_kind == "zero":
        c = jnp.zeros((), a.dtype)
    return _gemm_cplx(a, b, c, jnp.asarray(alpha), jnp.asarray(beta),
                      num_moduli=num_moduli, fastmode=fastmode, backend=backend,
                      op_a=op_a, op_b=op_b, has_c=has_c, epilogue=epilogue,
                      trivial_alpha=trivial_alpha, beta_kind=beta_kind)


def _herk_rhs_lanes(pa, num_moduli, backend):
    """Derive A^H's rhs lane plane sets from A's lhs lanes by transpose views
    plus two cheap elementwise rewraps -- no second quantization pass (the
    complex analog of syrk's plane reuse). With lhs lanes (rr, ri, rr+ri) of
    A, the rhs operand conj(A).T needs lanes (rr, -ri, rr-ri), each
    transposed: negation and the difference are residue-exact, with the
    wrap recomputed in int32 (p=256's asymmetric range makes -(-128) = 128
    overflow int8 and fall out of [-p/2, p/2))."""
    mods = tables.moduli(backend)[:num_moduli]
    p_arr = jnp.asarray(mods, jnp.int32).reshape(num_moduli, 1, 1)
    rr = pa[0].astype(jnp.int32)
    ri = pa[1].astype(jnp.int32)

    def wrap(s):
        s = jnp.where(2 * s >= p_arr, s - p_arr, s)
        return jnp.where(2 * s < -p_arr, s + p_arr, s)

    neg_i = wrap(-ri)
    diff = wrap(rr - ri)
    mid_t = pa.dtype
    lanes = jnp.stack([pa[0].astype(mid_t), neg_i.astype(mid_t),
                       diff.astype(mid_t)])
    return jnp.swapaxes(lanes, lanes.ndim - 2, lanes.ndim - 1)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "trans", "epilogue"))
def _herk(ar, ai, *, num_moduli, fastmode, backend, trans, epilogue):
    if trans:
        # A^H @ A = B @ B^H with B = A^H = conj(A).T
        ar, ai = ar.T, -ai.T
    real_dt = ar.dtype
    mdim = ar.shape[0]
    if jax.default_backend() != "cpu":
        ar = core._pad128(ar, (0, 1))
        ai = core._pad128(ai, (0, 1))
    # ONE shift serves both sides: rows of A and columns of A^H carry the
    # same (|Re|, |Im|) populations, so sft_rhs == sft_lhs
    if fastmode:
        var = "invariant" if fastmode == "robust" else "reference"
        sft = _shift_complex_fast(ar, ai, num_moduli, backend,
                                  reduce_axis=1, variant=var)
    else:
        # 3M product-bound estimation with rhs extracts = transposed lhs
        # extracts; the bound matrix is symmetric, so row max == col max
        ua_r, ua_i, ua_ri, pre = _extract_ub_lanes(ar, ai, 0, backend)
        lhs = jnp.stack([ua_ri, ua_r, ua_i])
        rhs = jnp.stack([jnp.swapaxes(ua_ri, 0, 1), jnp.swapaxes(ua_i, 0, 1),
                         jnp.swapaxes(ua_r, 0, 1)])
        d = jax.vmap(lambda l, r: quantize.estimate_gemm(l, r, backend))(
            lhs, rhs)
        bound = _combine_3m_bound(d, backend)
        sft = quantize.shift_accu_from_chi(jnp.max(bound, axis=1), pre,
                                           num_moduli, backend)
    pa = _quantize_complex(ar, ai, sft, 0, num_moduli, backend, conj=False)
    pb = _herk_rhs_lanes(pa, num_moduli, backend)
    out_r, out_i = _complex_product(pa, pb, sft, sft, num_moduli, backend,
                                    real_dt, epilogue)
    if out_r.shape != (mdim, mdim):
        out_r = out_r[:mdim, :mdim]
        out_i = out_i[:mdim, :mdim]
    return out_r, out_i


def herk(a: jax.Array, *, trans: bool = False, num_moduli: int = 8,
         fastmode="robust", backend: str = tables.Backend.INT8,
         alpha=1.0, beta=0.0, c: Optional[jax.Array] = None,
         epilogue: str = "auto") -> jax.Array:
    """Emulated Hermitian rank-k update: C = alpha * A @ A^H + beta * C
    (trans=True: alpha * A^H @ A + beta * C), alpha/beta REAL per BLAS zherk.

    Complex counterpart of core.syrk and a capability beyond the reference
    (which is GEMM-only): the 3M lane plane sets of A^H are transpose views
    plus two elementwise rewraps of A's lanes (reference lane structure:
    gemmul8_complex.hpp:52-226), so the encode cost is HALF of
    gemm(a, a.conj().T). fastmode defaults to "robust" for the same
    Gram-diagonal Cauchy-Schwarz-equality reason as syrk. INT8 backend
    (FP8's split planes cannot derive the difference lane from carriers;
    use gemm for FP8 Hermitian products).
    """
    a = jnp.asarray(a)
    if a.ndim != 2:
        raise ValueError(f"herk expects a 2-D operand, got ndim={a.ndim}")
    if not jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise TypeError("herk is complex-only; use syrk for real operands")
    if backend != tables.Backend.INT8:
        raise NotImplementedError(
            "herk supports the INT8 backend (FP8 split planes cannot "
            "derive the 3M difference lane); use gemm for FP8")
    name = np.dtype(a.dtype).name
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}] "
                         f"for {name}")
    out_r, out_i = _herk(jnp.real(a), jnp.imag(a), num_moduli=num_moduli,
                         fastmode=fastmode, backend=backend,
                         trans=bool(trans), epilogue=epilogue)
    out = jax.lax.complex(out_r, out_i).astype(a.dtype)
    if not (isinstance(alpha, (int, float)) and alpha == 1):
        out = jnp.asarray(alpha).real.astype(out_r.dtype) * out
    if c is not None and not (isinstance(beta, (int, float)) and beta == 0):
        out = out + (c if isinstance(beta, (int, float)) and beta == 1
                     else jnp.asarray(beta).real.astype(out_r.dtype) * c)
    return out


def herk_planar(ar: jax.Array, ai: jax.Array, *, trans: bool = False,
                num_moduli: int = 8, fastmode="robust",
                backend: str = tables.Backend.INT8, epilogue: str = "auto"):
    """Planar herk: (Ar, Ai) -> (Cr, Ci) = A @ A^H on separate real planes,
    for accelerators whose runtimes lack complex dtypes (see gemm_planar).
    Bit-identical to herk() on complex views of the same data."""
    name = {"float32": "complex64", "float64": "complex128"}[
        np.dtype(ar.dtype).name]
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}] "
                         f"for {name}")
    if backend != tables.Backend.INT8:
        raise NotImplementedError(
            "herk supports the INT8 backend (FP8 split planes cannot "
            "derive the 3M difference lane); use gemm_planar for FP8")
    return _herk(ar, ai, num_moduli=num_moduli, fastmode=fastmode,
                 backend=backend, trans=bool(trans), epilogue=epilogue)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "epilogue"))
def _gemm_batched_cplx(a, b, *, num_moduli, fastmode, backend, epilogue):
    return jax.vmap(functools.partial(
        emulate_matmul_complex, num_moduli=num_moduli, fastmode=fastmode,
        backend=backend, epilogue=epilogue))(a, b)


def gemm_batched_complex(a: jax.Array, b: jax.Array, *, num_moduli: int = 8,
                         fastmode=True, backend: str = tables.Backend.INT8,
                         epilogue: str = "auto") -> jax.Array:
    """Emulated batched complex GEMM: (B, m, k) @ (B, k, n) -> (B, m, n).

    Complex counterpart of core.gemm_batched (the strided-batched entry;
    the reference's gemm is stream-callable for any dtype and its hook
    handles batched complex dims, hook.cu:609-730). Each batch element runs
    the full 3M residue pipeline, vmapped so XLA batches the MXU dots."""
    name = np.dtype(a.dtype).name
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}] for {name}")
    return _gemm_batched_cplx(a, b, num_moduli=num_moduli, fastmode=fastmode,
                              backend=backend, epilogue=epilogue)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "epilogue"))
def _gemm_batched_planar(ar, ai, br, bi, *, num_moduli, fastmode, backend,
                         epilogue):
    return jax.vmap(functools.partial(
        emulate_matmul_complex_planar, num_moduli=num_moduli,
        fastmode=fastmode, backend=backend, epilogue=epilogue))(ar, ai, br, bi)


def gemm_batched_planar(ar, ai, br, bi, *, num_moduli: int = 8, fastmode=True,
                        backend: str = tables.Backend.INT8,
                        epilogue: str = "auto"):
    """Batched planar-complex GEMM: (B,m,k)+(B,m,k) x (B,k,n)+(B,k,n) ->
    ((B,m,n), (B,m,n)). The batched complex entry for accelerators whose
    runtimes lack complex dtypes (e.g. the v5e PJRT stack); bit-identical to
    gemm_batched_complex on complex views of the same data."""
    name = {"float32": "complex64", "float64": "complex128"}[
        np.dtype(ar.dtype).name]
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}] for {name}")
    return _gemm_batched_planar(ar, ai, br, bi, num_moduli=num_moduli,
                                fastmode=fastmode, backend=backend,
                                epilogue=epilogue)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "op_a", "op_b", "epilogue"))
def _gemm_planar(ar, ai, br, bi, *, num_moduli, fastmode, backend,
                 op_a, op_b, epilogue):
    if op_a in ("T", "C"):
        ar, ai = ar.T, ai.T
    if op_b in ("T", "C"):
        br, bi = br.T, bi.T
    return emulate_matmul_complex_planar(
        ar, ai, br, bi, num_moduli=num_moduli, fastmode=fastmode,
        backend=backend, conj_a=(op_a == "C"), conj_b=(op_b == "C"),
        epilogue=epilogue)


def gemm_planar(ar: jax.Array, ai: jax.Array, br: jax.Array, bi: jax.Array,
                *, num_moduli: int = 8, fastmode: bool = True,
                backend: str = tables.Backend.INT8, trans_a="N", trans_b="N",
                epilogue: str = "auto"):
    """Emulated complex GEMM on PLANAR operands: (Ar, Ai) x (Br, Bi) ->
    (Cr, Ci), with op in {N, T, C}. The device-native complex entry point for
    accelerators whose runtimes lack complex dtypes (e.g. the v5e PJRT stack);
    bit-identical to gemm() on complex arrays."""
    name = {"float32": "complex64", "float64": "complex128"}[
        np.dtype(ar.dtype).name]
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}] for {name}")
    if backend not in (tables.Backend.INT8, tables.Backend.FP8):
        raise ValueError(f"backend must be 'INT8' or 'FP8', got {backend!r}")
    return _gemm_planar(ar, ai, br, bi, num_moduli=num_moduli,
                        fastmode=fastmode, backend=backend,
                        op_a=_norm_op(trans_a), op_b=_norm_op(trans_b),
                        epilogue=epilogue)

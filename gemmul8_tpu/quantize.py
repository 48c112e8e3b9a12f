"""Power-of-two scaling + exact modular residue encoding (Ozaki scheme II).

This is the TPU-native re-design of the reference's scaling/mod kernel family
(reference: src/scaling.hpp, src/scaling_fast_real.hpp, src/scaling_accu_real.hpp,
src/mod.hpp). Differences driven by TPU hardware:

  * TPUs have no IEEE float64 ALU (XLA emulates f64 as a float32 double-word), no
    64-bit bitcasts, and no directed-rounding modes. The residue encoder therefore
    never touches 64-bit bit patterns: the scaled value y = x * 2^sft is peeled
    into exact float32 components, each component is decomposed via a 32-bit
    bitcast into (sign, 24-bit mantissa, exponent), and the residues of the
    quantized integer v are assembled purely in int32 modular arithmetic using the
    precomputed 2^j mod p table. This runs bit-identically on CPU and TPU.
  * Directed roundings (__fadd_ru & co.) used by the reference's shift heuristics
    are replaced by deterministic epsilon inflations that are conservative by at
    least the platform's rounding error, so the anti-overflow guarantees hold.

The quantized integer is v = floor(sum_j w_j) where w_j are the exact f32
components of y; v differs from the reference's trunc(y) by at most 1 (deterministic),
which only perturbs the quantization error term, never correctness: every modular
plane is derived from the same v, so CRT reconstruction is exact for v.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables

# round-up-biased half used by the reference for log2 terms (0x1.000006p-1)
LOG2_HALF_RU = float.fromhex("0x1.000006p-1")
# deterministic safety margin replacing CUDA directed roundings in shift formulas
SFT_MARGIN = 2.0 ** -14
# upper-bound extraction bit budget for accurate mode (reference template_type.hpp:147)
MAX_UFP = {"INT8": 5, "FP8": 7}


# ---------------------------------------------------------------------------
# exact float helpers
# ---------------------------------------------------------------------------

def pow2(e: jax.Array, dtype) -> jax.Array:
    """Exact 2^e by exponent-field bit assembly. XLA's exp2 is NOT exact (it
    lowers to exp(x*ln2)), so it must never be used where exactness matters.
    e must be within the normal exponent range of dtype."""
    e = e.astype(jnp.int32)
    if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        return jax.lax.bitcast_convert_type(((e + 127) << 23), jnp.float32)
    hi = (e + 1023) << 20
    lo = jnp.zeros_like(hi)
    pair = jnp.stack([lo, hi], axis=-1)  # little-endian (lo, hi) int32 -> f64
    return jax.lax.bitcast_convert_type(pair, jnp.float64)


def pow2_scale(x: jax.Array, sft: jax.Array) -> jax.Array:
    """x * 2^sft exactly (sft: int32, broadcastable). Split into three
    multiplies so each 2^h stays in the normal range even when |sft| far
    exceeds it (covers |sft| <= 378 for f32 -- needed by the ff epilogue --
    and ~3000 for f64); every factor is a power of two, so exact."""
    h1 = sft // 3
    h2 = (sft - h1) // 2
    h3 = sft - h1 - h2
    return ((x * pow2(h1, x.dtype)) * pow2(h2, x.dtype)) * pow2(h3, x.dtype)


def f32_components(y: jax.Array, n_comp: int) -> list[jax.Array]:
    """Peel y into exact float32 components c_0 >> c_1 >> ...; sum equals y
    exactly for IEEE f64 when n_comp >= 3 (24*3 > 53), and reproduces the device
    value exactly on TPU where f64 storage is already a float32 pair."""
    if y.dtype == jnp.float32:
        return [y]
    comps = []
    r = y
    for j in range(n_comp):
        c = r.astype(jnp.float32)
        comps.append(c)
        if j + 1 < n_comp:
            r = r - c.astype(y.dtype)
    return comps


def f32_decompose(c: jax.Array):
    """(sign ±1, mantissa int32 in [0, 2^24), unbiased exp) with value
    sign * mant * 2^(exp-23). Subnormals: no implicit bit, exp = -126."""
    bits = jax.lax.bitcast_convert_type(c, jnp.int32)
    sign = jnp.where(bits < 0, jnp.int32(-1), jnp.int32(1))
    expf = (bits >> 23) & 0xFF
    frac = bits & 0x7FFFFF
    is_norm = expf > 0
    mant = jnp.where(is_norm, frac | (1 << 23), frac)
    e = jnp.where(is_norm, expf - 127, jnp.int32(-126))
    return sign, mant, e


def ilogb(a: jax.Array) -> jax.Array:
    """floor(log2(a)) for a > 0, exact via f32 bitcast when a is f32-normal;
    f64-log2 fallback (with a conservative nudge) outside the f32 range.
    Reference analog: Tilogb<float> (template_math.hpp)."""
    a32 = a.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(a32, jnp.int32)
    e32 = ((bits >> 23) & 0xFF) - 127
    if a.dtype == jnp.float32:
        return e32.astype(jnp.int32)
    in_range = (a32 >= np.float32(2.0 ** -126)) & jnp.isfinite(a32) & (a32 > 0)
    # fallback for f64 magnitudes outside f32's exponent range (CPU-only regime:
    # TPU f64 emulation shares f32's exponent range anyway)
    ef = jnp.floor(jnp.log2(jnp.maximum(a, jnp.asarray(np.finfo(a.dtype).tiny, a.dtype)))
                   + 2.0 ** -32)
    return jnp.where(in_range, e32, ef.astype(jnp.int32)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# shift computation (fast mode)  [reference: scaling_fast_real.hpp:6-22]
# ---------------------------------------------------------------------------

def shift_fast(x: jax.Array, num_moduli: int, backend: str, reduce_axis: int,
               variant: str = "reference") -> jax.Array:
    """Per-row (reduce_axis=1) or per-column (reduce_axis=0) quantization shift.

    variant="reference" (default): the reference formula
    (scaling_fast_real.hpp:6-22),
        sft = floor(log2P - 1.5 - max(1, ~0.5*log2(sum x^2))) - ilogb(amax).
    Its -ilogb(amax) term makes the quantized-norm budget SCALE-DEPENDENT:
    ||v|| = 2^(log2P' - 1.5 - ilogb(amax)), which over-captures for
    sub-unit-amax rows. For adversarial inputs (e.g. all-positive operands
    uniformly scaled by 1e-6) the k-sum then exceeds P/2 and the CRT wraps
    -- a catastrophic silent failure the reference shares.

    variant="invariant" (fastmode="robust" at the API): drop the amax term,
        sft = floor(log2P' - 1.5 - ~0.5*log2(sum x^2)),
    giving ||v|| <= 2^(log2P' - 1.5) for ANY data, so by Cauchy-Schwarz
    |sum v_a v_b| <= 2^(2*log2P' - 3) <= P/16 rigorously, at every scale --
    and it captures ilogb(amax) MORE bits than the reference on rows with
    amax > 1. Single pass, same cost. (The spirit of the literature's
    "improved scaling for fast mode of Ozaki scheme II".)

    Returns int32 of shape x.shape without reduce_axis; zero rows get sft=0."""
    # The norm/amax math runs in f32 on the leading f32 component of x plus a
    # conservative inflation covering the discarded tail: the shift only
    # needs a handful of correct bits, f32 ops are fast and bit-identical on
    # CPU and TPU, and f64 reductions would run through XLA's slow
    # emulated-f64 on TPU. Values below f32's range (CPU-only f64 inputs)
    # quantize to zero rows exactly as amax==0 rows do in the reference.
    if x.dtype != jnp.float32 and jax.default_backend() == "cpu":
        # True-IEEE-f64 host: |x| may exceed f32's max (~3.4e38), where the
        # f32 downcast below would turn amax into inf and silently wreck the
        # shift. Pre-scale ONLY the overflowing rows by an exact power of two
        # (native-dtype ilogb), fold the exponent back in afterwards; rows in
        # the f32-finite regime keep bit-identical behavior. (On TPU, f64 is
        # an f32 pair sharing f32's exponent range -- no such rows exist.)
        amax_nat = jnp.max(jnp.abs(x), axis=reduce_axis)
        E0 = jnp.where(amax_nat > jnp.asarray(2.0 ** 126, x.dtype),
                       ilogb(jnp.where(amax_nat > 0, amax_nat,
                                       jnp.ones_like(amax_nat))),
                       jnp.int32(0))
        x = pow2_scale(x, -jnp.expand_dims(E0, reduce_axis))
    else:
        E0 = None
    c0 = jnp.abs(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)
    amax0 = jnp.max(c0, axis=reduce_axis)
    safe = jnp.where(amax0 > 0, amax0, jnp.ones_like(amax0))
    # inflation keeps E an upper bound when the |c1| tail pushes |x| across a
    # power of two (a larger E only shrinks sft: the safe side)
    E = ilogb(safe * np.float32(1.0 + 2.0 ** -22))
    if E0 is not None:
        E = E + E0          # total exponent of the un-prescaled amax
    # overflow-safe norm: scale the row to ~[0,1] first (improves on the
    # reference, whose f32 norm overflows for large-magnitude rows)
    z = pow2_scale(c0, -jnp.expand_dims(E - E0 if E0 is not None else E,
                                        reduce_axis))
    s2 = jnp.sum(z * z, axis=reduce_axis)
    log2vsum = (jnp.log2(jnp.maximum(s2, np.float32(2.0 ** -120)))
                + np.float32(2.0) * E.astype(jnp.float32)
                + np.float32(2.0 ** -18))   # round-up analog for the tail
    log2vnrm = np.float32(LOG2_HALF_RU) * log2vsum
    log2p = np.float32(tables.log2P(num_moduli, backend))
    if variant == "invariant":
        exp1 = (log2p - np.float32(1.5) - log2vnrm - np.float32(SFT_MARGIN))
        sft = jnp.floor(exp1).astype(jnp.int32)
    else:
        exp1 = (log2p - np.float32(1.5)
                - jnp.maximum(np.float32(1.0), log2vnrm)
                - np.float32(SFT_MARGIN))
        sft = jnp.floor(exp1).astype(jnp.int32) - E
    return jnp.where(amax0 > 0, sft, jnp.int32(0))


# ---------------------------------------------------------------------------
# accurate mode: 6-bit upper-bound extraction + post-GEMM shifts
# [reference: scaling_accu_real.hpp]
# ---------------------------------------------------------------------------

def extract_ub_with_pre(ax: jax.Array, sft_pre: jax.Array, reduce_axis: int,
                        backend: str):
    """ceil(ax * 2^sft_pre) as an upper-bound extract plane with a GIVEN
    pre-shift (shared across complex lanes). INT8: int8 (exact estimation
    GEMM); FP8: bf16 with round-UP conversion so the bound survives values
    above bf16's 8-bit integer-exact range."""
    y = pow2_scale(ax, jnp.expand_dims(sft_pre, reduce_axis))
    c1 = y.astype(jnp.float32)
    tail = (y - c1.astype(y.dtype)) if y.dtype != jnp.float32 \
        else jnp.zeros_like(c1)
    ub = jnp.ceil(c1) + (tail.astype(jnp.float32) > 0)
    ub = jnp.where(ax > 0, jnp.maximum(ub, 1.0), 0.0)
    if backend == tables.Backend.INT8:
        return ub.astype(jnp.int8)
    # Round-down detection must use lax.reduce_precision (bf16's 8/7-bit
    # grid, RNE, staying in f32), NOT a b.astype(f32) round-trip of the
    # bf16 cast: XLA:TPU's excess-precision pass elides convert
    # round-trips, which made `low` constant-False on device and let the
    # "upper bound" silently round DOWN past bf16's integer-exact range
    # (found via tools/probe_bf16x9.py; CPU was never affected).
    bf = jax.lax.reduce_precision(ub, 8, 7)
    b = bf.astype(jnp.bfloat16)  # exact: bf already sits on bf16's grid
    # round up: if RNE rounded down, bump one ulp (values are >= 0)
    low = bf < ub
    bumped = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(b, jnp.int16) + jnp.int16(1),
        jnp.bfloat16)
    return jnp.where(low, bumped, b)


def extract_ub_plane(x: jax.Array, backend: str, scale_axis: int):
    """ceil(|x| * 2^(maxUFP - ilogb(amax))) plus the pre-shift. Upper bound
    of the reference's round-up extraction (scaling_accu_real.hpp:46-74);
    the +tail term keeps it a true upper bound without bit-exact f64 ceil.

    amax scales into [2^maxUFP, 2^(maxUFP+1)), so values reach
    2^(maxUFP+1) + 1. INT8: <= 65, fits int8 (exact int32 estimation GEMM,
    chunked past 4225k >= 2^31). FP8: <= 257, carried in bf16 and estimated
    via an f32-accumulating GEMM, like the reference's fp8 extract
    (template_type.hpp:30-55).
    """
    reduce_axis = 1 - scale_axis
    ax = jnp.abs(x)
    amax = jnp.max(ax, axis=reduce_axis)
    E = ilogb(jnp.where(amax > 0, amax, jnp.ones_like(amax)))
    sft_pre = np.int32(MAX_UFP[backend]) - E
    return extract_ub_with_pre(ax, sft_pre, reduce_axis, backend), sft_pre


def estimate_gemm(ub_a: jax.Array, ub_b: jax.Array, backend: str) -> jax.Array:
    """Upper-bound magnitude estimation GEMM for accurate mode
    (reference: scaling_accu_real.hpp:415-432). INT8: exact int32 path. FP8:
    f32 accumulation whose round-off is compensated by inflating the result by
    (k+1)*2^-24, keeping it a true upper bound (reference: find_max.hpp:82-96)."""
    dn = (((1,), (0,)), ((), ()))
    if backend == tables.Backend.INT8:
        k = ub_a.shape[1]
        # extract values reach 2^(maxUFP+1) + 1 = 65 (amax scales into
        # [2^5, 2^6), then ceil + tail bump -- test_quantize.py pins this),
        # so the int32 dot is exact only while 65^2 * k = 4225k < 2^31; the
        # "K is unlimited" contract means larger k must chunk: int32-exact
        # partial dots summed EXACTLY in float (every partial is an integer
        # <= 4225 * 2^18 and the running sum stays far below 2^48, exact
        # even in TPU's f32-pair f64) -- bit-stable across platforms
        k_safe = (2 ** 31 - 1) // (65 * 65)
        if k <= k_safe:
            return jax.lax.dot_general(ub_a, ub_b, dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
        step = 1 << 18
        acc_t = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        tot = jnp.zeros((ub_a.shape[0], ub_b.shape[1]), acc_t)
        n_chunks = -(-k // step)
        for ci in range(n_chunks):
            sl = slice(ci * step, min((ci + 1) * step, k))
            part = jax.lax.dot_general(ub_a[:, sl], ub_b[sl],
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
            tot = tot + part.astype(acc_t)
        if acc_t == jnp.float32:
            # f32 additions round; inflate so the estimate stays an upper
            # bound (mirrors the FP8 compensation below)
            tot = tot * np.float32(1.0 + (n_chunks + 1) * 2.0 ** -23)
        return tot
    k = ub_a.shape[1]
    c = jax.lax.dot_general(
        ub_a, ub_b, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return c * np.float32(1.0 + (k + 1) * 2.0 ** -24)


def shift_accu_from_chi(c_hi_max: jax.Array, sft_pre: jax.Array,
                        num_moduli: int, backend: str) -> jax.Array:
    """Combine the upper-bound product magnitude with the pre-shift:
    sft = sft_pre + floor(log2P - ~0.5*log2(max C_hi))
    (reference: scaling_accu_real.hpp:6-11, 142-226; sign convention here is the
    quantization shift, i.e. the negation of the reference's stored sft)."""
    log2p = np.float32(tables.log2P(num_moduli, backend))
    safe = jnp.maximum(c_hi_max, 1).astype(jnp.float32)
    add = jnp.floor(log2p - np.float32(LOG2_HALF_RU) * jnp.log2(safe)
                    - np.float32(SFT_MARGIN)).astype(jnp.int32)
    return sft_pre + add


# ---------------------------------------------------------------------------
# residue-plane encoding
# ---------------------------------------------------------------------------

def _n_comp(dtype) -> int:
    if dtype == jnp.float32:
        return 1
    # on accelerators f64 is stored as an f32 pair: the third component is
    # structurally zero, so two components capture the full stored value
    return 3 if jax.default_backend() == "cpu" else 2


def residues_wrapped(x: jax.Array, sft: jax.Array, scale_axis: int,
                     num_moduli: int, backend: str) -> jax.Array:
    """Quantize x with per-row/col shifts and emit all wrapped residues.

    Args:
      x: (m, k) [scale_axis=0: shift per row] or (k, n) [scale_axis=1: per col].
      sft: int32 quantization shifts, shape = x.shape[scale_axis].
    Returns:
      int32 residues of shape (num_moduli, *x.shape): plane i = wrap(v mod p_i)
      in [-p_i/2, p_i/2), where v = floor-quantized x * 2^sft (see module
      docstring).
    """
    mods = tables.moduli(backend)[:num_moduli]
    reduce_axis = 1 - scale_axis
    y = pow2_scale(x, jnp.expand_dims(sft, reduce_axis))
    comps = f32_components(y, _n_comp(x.dtype))

    # per-component integer/fraction split (shared across all moduli)
    parts = []
    G = jnp.zeros(y.shape, jnp.float32)
    for c in comps:
        s, m, e = f32_decompose(c)
        d = e - 23                      # value = s * m * 2^d
        sig = jnp.clip(-d, 0, 31)
        m_int = m >> sig                # integer magnitude contribution
        dpos = jnp.minimum(jnp.maximum(d, 0), tables.MAX_EXP)
        mfrac = m - (m_int << sig)
        frac = mfrac.astype(jnp.float32) * pow2(jnp.maximum(d, -30), jnp.float32)
        frac = jnp.where(-d > 30, jnp.abs(c), frac)  # whole component below 2^-6
        G = G + s.astype(jnp.float32) * frac
        parts.append((s, m_int, dpos))
    g = jnp.floor(G).astype(jnp.int32)   # joint carry of the fractional parts

    # Build the quantized integer v = g + sum_c s*m_int*2^dpos in 20-bit
    # int32 LIMBS on a static grid (the same trick as the ff epilogue, ff.py):
    # each component's 24-bit mantissa is split across two adjacent limbs by
    # a dynamic in-limb shift + static limb selects -- all cheap exact VPU int
    # ops, no per-element gathers, no one-hot matmuls, no big intermediates.
    # After one balanced carry pass (|limb| < 2^19), each modulus costs only
    # a tiny dot with the STATIC scalars 2^(20*li) mod p.
    dpos_max = int(tables.log2P(num_moduli, backend)) + 3
    n_limbs = dpos_max // 20 + 2
    limbs = [g] + [jnp.zeros_like(g) for _ in range(n_limbs - 1)]
    for s, m_int, dpos in parts:
        off = dpos % 20
        li = dpos // 20
        sh = 20 - off
        mhi = jnp.right_shift(m_int, sh)
        mlo = m_int - jnp.left_shift(mhi, sh)
        c_lo = s * jnp.left_shift(mlo, off)          # < 2^20
        c_hi = s * mhi                                    # < 2^23
        for lv in range(n_limbs):
            sel_lo = jnp.where(li == lv, c_lo, 0)
            sel_hi = jnp.where(li == lv - 1, c_hi, 0)
            limbs[lv] = limbs[lv] + sel_lo + sel_hi
    # balanced carry: every limb into [-2^19, 2^19), top limb keeps the rest
    half = jnp.int32(1 << 19)
    for lv in range(n_limbs - 1):
        c = (limbs[lv] + half) >> 20
        limbs[lv] = limbs[lv] - jnp.left_shift(c, 20)
        limbs[lv + 1] = limbs[lv + 1] + c

    # Residues of v for all moduli: a tiny per-modulus dot against the STATIC
    # scalars wrap(2^(20*lv) mod p) -- the limbs stay in registers and the
    # only output is the int8 plane itself. (An MXU matrix form was tried and
    # measured SLOWER here: the (elems, 2L) f32 operand and (elems, nu) f32
    # result materialize ~2 GB of intermediates at 4096^2 that the fused VPU
    # loop never touches.)
    planes = []
    for i, p in enumerate(mods):
        # |limb * w| <= 2^19 * p/2 and the n_limbs-term sum fits int32
        acc = limbs[0]
        for lv in range(1, n_limbs):
            w = pow(2, 20 * lv, p)
            w = w - p if 2 * w >= p else w
            acc = acc + limbs[lv] * jnp.int32(w)
        r = acc % p                       # in [0, p)
        r = jnp.where(2 * r >= p, r - p, r)  # wrap to [-p/2, p/2); 128 -> -128 for p=256
        planes.append(r)
    return jnp.stack(planes)


def encode_planes(x: jax.Array, sft: jax.Array, scale_axis: int,
                  num_moduli: int, backend: str) -> jax.Array:
    """Quantize + emit the low-precision residue planes for one operand.

    INT8 backend: (num_moduli, *x.shape) int8 -- one MXU-ready plane per
    modulus (reference: scaling_fast_real.hpp ModUnroll emit).
    FP8 backend: (num_moduli, 3, *x.shape) bfloat16 -- e4m3-exact split pairs/
    triples per modulus (reference: mod.hpp make_fp8x2/make_fp8x3); see fp8.py.
    """
    if jax.default_backend() not in ("cpu",):
        from . import pallas_kernels as pk
        if pk.encode_supported(x, num_moduli, backend):
            comps = f32_components(x, _n_comp(x.dtype))
            c1 = comps[1] if len(comps) > 1 else None
            # (a third component exists only on true-f64 hosts, which take
            # the jnp path below)
            if len(comps) <= 2:
                if backend == tables.Backend.INT8:
                    return pk.encode_planes_tiles(comps[0], c1, sft,
                                                  scale_axis, num_moduli,
                                                  backend)
                # FP8: emits the (3*nu) batched-GEMM stack for this side
                return pk.encode_planes_fp8_tiles(comps[0], c1, sft,
                                                  scale_axis, num_moduli)
    res = residues_wrapped(x, sft, scale_axis, num_moduli, backend)
    if backend == tables.Backend.INT8:
        return res.astype(jnp.int8)
    from . import fp8
    return fp8.split_planes(res, num_moduli)

"""TPU-native CRT epilogue: exact int32 fixed-point limb accumulation.

Why this exists: TPU has no IEEE float64 ALU. XLA's X64 rewrite stores f64 as
an f32 pair (~48-bit mantissa, f32 exponent range), so the reference's
double/double-double CRT reconstruction (inverse_scaling_real.hpp:8-89) -- which
relies on exact 53-bit products and f64 FMA -- silently loses the quotient bits
on TPU. The TPU-native equivalent avoids wide floats entirely: the CRT sum
t = sum_i qPi * r_i is accumulated in a vector of int32 LIMBS (20 bits each)
on a static power-of-two grid, using only int32 multiplies/shifts/adds, which
are exact and bit-identical on every backend (CPU, TPU v5e VPU, ...).

Production path -- crt_limbs_matrix (all structure static at trace time):
  * the CRT sum t = sum_i qPi * r_i is LINEAR in the residues, so the limb
    accumulation is ONE small MXU matmul: each qPi -- recomputed as an EXACT
    python integer at plan time, no table truncation -- is sliced into 8-bit
    columns on a static grid; residue x column products (< 2^18) and their
    nu-term column sums (< 2^23) are exact in f32 MXU accumulation;
  * 8-bit column pairs merge into 16-bit int32 limbs; a balanced carry pass
    normalizes them BEFORE the wrap quotient rint(t * invP) is estimated from
    the top limbs in f32 (normalization first is essential: raw column sums
    carry up to 2^-8 of a quotient unit in the truncated tail);
  * P * quot folds into the same limbs exactly (16-bit pieces of P times
    |quot| < 2^14 stay inside int32), a second carry pass renormalizes;
  * each limb converts to f32/f64 exactly; the output assembles largest-first
    with the inverse power-of-two scaling folded in per limb (rank-1 row/col
    pow2 factors on accelerators; full-exponent-range f64 path on CPU).

The only approximations anywhere are the static sub-base cutoff (absolute
error <= nu * 2^(base+11) ~ P * 2^-80, below the reference's double-double
floor) and the final rounding into the output dtype. Everything else is exact
integer arithmetic => bit-identical across platforms, trivially reproducible.

crt_limbs (20-bit piece-wise variant) is kept as an independently-tested
cross-check; two_sum / two_prod_const serve tests and future kernels.
"""
from __future__ import annotations

import contextlib
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from . import tables


@contextlib.contextmanager
def _no_hook():
    """Exactness-critical region: the CRT column product below is an
    ELIGIBLE f32 dot_general, so with the hook installed it would be
    re-routed through the emulator -- whose quantization error breaks the
    exact-integer-columns invariant (silently wrong results, e.g. in a
    hooked matmul's custom-VJP backward, which traces outside the hook's
    own re-entrancy guard). Bump the hook's depth while tracing it."""
    h = sys.modules.get("gemmul8_tpu.hook")
    if h is None:
        yield
        return
    st = h._st()
    st.depth += 1
    try:
        yield
    finally:
        st.depth -= 1

_SPLIT = np.float32((1 << 12) + 1)
LIMB_BITS = 20
_LIMB = 1 << LIMB_BITS


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth; 6 flops, branch-free)."""
    s = a + b
    t = s - a
    e = (a - (s - t)) + (b - t)
    return s, e


def two_prod_const(c_np, x):
    """Error-free c * x = p + e for an f32 CONSTANT c (host-side Veltkamp
    split) times an f32 array x (runtime Dekker split)."""
    c_np = np.float32(c_np)
    ch, cl = _split12_const(c_np)
    cx = _SPLIT * x
    xh = cx - (cx - x)
    xl = x - xh
    p = c_np * x
    e = ((ch * xh - p) + ch * xl + cl * xh) + cl * xl
    return p, e


def _split12_const(v):
    """Veltkamp split of an f32 constant into (hi, lo), each with <= 12
    significant bits, computed in exact f32 host arithmetic."""
    v = np.float32(v)
    c = np.float32(_SPLIT * v)
    hi = np.float32(c - np.float32(c - v))
    lo = np.float32(v - hi)
    return hi, lo


def _int_pieces(value_f64: float, max_bits: int = 12):
    """Decompose an exact f64 (24-bit-mantissa component) into signed integer
    pieces m * 2^g with |m| < 2^max_bits. Exact."""
    pieces = []
    v = np.float64(value_f64)
    while v != 0.0:
        g = int(np.floor(np.log2(abs(v)))) - (max_bits - 1)
        m = v * (2.0 ** -g)
        m_int = int(np.floor(m))  # may leave a remainder piece
        pieces.append((m_int, g))
        v = v - m_int * (2.0 ** g)
    return pieces


@functools.lru_cache(maxsize=None)
def _crt_matrix_plan(num_moduli: int, backend: str, out_bits: int):
    """Matrix-form CRT plan (the production path).

    The CRT sum t = sum_i qPi * r_i + P * quot is LINEAR in the residues, so
    the limb accumulation is a matmul: decompose each EXACT integer qPi
    (recomputed here with pure python ints -- no table truncation at all)
    into 8-bit column coefficients on a static grid, and contract
    (nu, elems) residues with the (nu, n_cols) coefficient matrix on the MXU.
    Products are <= 255 * p_max/2 < 2^18 and column sums <= nu * 2^18 < 2^23:
    exact in f32 accumulation.

    Returns (base, n_cols, C, pcols, invp_top):
      base    -- bit position of column 0 (column j has unit 2^(base+8j))
      C       -- (nu, n_cols) f32 of 8-bit slices of qPi (>> base)
      pcols   -- (n_cols,) f32 of 8-bit slices of P (positive)
      invp_top-- f32 of 1/P * 2^(base + 8*(n_cols-4)) for the quotient
    """
    mods = [int(p) for p in tables.moduli(backend)[:num_moduli]]
    P = 1
    for p in mods:
        P *= p
    qpis = []
    for p in mods:
        Pi = P // p
        q = pow(Pi % p, -1, p)
        qpis.append(q * Pi)                      # exact integer q_i * P / p_i
    ptop = P.bit_length() - 1
    lo_bits = 95 if out_bits == 53 else 56
    base = max(ptop - lo_bits, 0)
    top = ptop + 16
    n_cols = -(-(top - base) // 8)
    C = np.zeros((num_moduli, n_cols), np.float32)
    for i, v in enumerate(qpis):
        v >>= base
        for j in range(n_cols):
            C[i, j] = np.float32(v & 0xFF)
            v >>= 8
    pcols = np.zeros((n_cols,), np.float32)
    v = P >> base
    for j in range(n_cols):
        pcols[j] = np.float32(v & 0xFF)
        v >>= 8
    L = (n_cols + 1) // 2
    n_est = min(3, L)
    invp_top = np.float32(2.0 ** (base + 16 * (L - n_est)) / P)
    return base, n_cols, C, pcols, invp_top


def crt_limbs_matrix(c_mid: jax.Array, num_moduli: int, backend: str,
                     out_bits: int):
    """Exact CRT accumulate + wrap via one MXU matmul over the modulus axis.

    c_mid: (nu, m, n) wrapped residues. Returns (limbs, base): L int32 arrays
    of 16-bit balanced limbs (unit 2^(base+16*li)), summing to the
    reconstructed integer t, |t| < P/2. The ONLY inexactness anywhere is the
    static sub-base cutoff (absolute error <= nu * 2^(base+11), ~P * 2^-84).
    """
    base, n_cols, C, pcols, invp_top = _crt_matrix_plan(
        num_moduli, backend, out_bits)
    res_f = c_mid.astype(jnp.float32)            # (nu, m, n), |r| <= p/2
    with _no_hook():
        cols = jax.lax.dot_general(
            res_f, jnp.asarray(C), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (m, n, n_cols) exact ints

    # merge 8-bit column pairs into 16-bit limbs (int32)
    L = (n_cols + 1) // 2
    limbs = []
    for li in range(L):
        v = cols[..., 2 * li].astype(jnp.int32)
        if 2 * li + 1 < n_cols:
            v = v + (cols[..., 2 * li + 1].astype(jnp.int32) << 8)
        limbs.append(v)

    half = jnp.int32(1 << 15)

    def carry(limbs):
        for li in range(L - 1):
            c = (limbs[li] + half) >> 16
            limbs[li] = limbs[li] - (c << 16)
            limbs[li + 1] = limbs[li + 1] + c
        return limbs

    # NORMALIZE FIRST, then estimate the wrap quotient from the top three
    # balanced limbs (|limb| < 2^15 means the discarded lower limbs
    # contribute < 2^-17 relatively -- estimating from raw column sums would
    # be off by up to 2^-8 of a quotient unit and wrap by whole multiples
    # of P). |quot| <= nu*p_max/2 < 2^14: exact in f32; P's 16-bit pieces
    # times quot stay below 2^30.
    limbs = carry(limbs)
    t_top = limbs[L - 1].astype(jnp.float32)
    for i in range(2, min(3, L) + 1):
        t_top = t_top * np.float32(65536.0) + limbs[L - i].astype(jnp.float32)
    quot = jnp.rint(t_top * invp_top).astype(jnp.int32)
    for li in range(L):
        p16 = int(pcols[2 * li]) + (int(pcols[2 * li + 1]) << 8
                                    if 2 * li + 1 < n_cols else 0)
        if p16:
            limbs[li] = limbs[li] - quot * np.int32(p16)
    limbs = carry(limbs)
    return limbs, base


@functools.lru_cache(maxsize=None)
def _crt_plan(num_moduli: int, backend: str, out_bits: int):
    """Static limb-accumulation plan.

    Returns (base, L, terms, invp_top, p_terms):
      base     -- exponent of limb 0's unit (limb li has unit 2^(base+20*li))
      L        -- number of limbs
      terms    -- ((plane_index, m_int, limb_idx, offset), ...): for each
                  12-bit qPi piece, where its (m*r) product lands
      invp_top -- f32 constant: invP * 2^(base + 20*(L-3)) for the quotient
                  estimate from the top three limbs
      p_terms  -- ((m_int, limb_idx, offset), ...) integer pieces of P
                  (stored negative) for folding P*quot into the limbs
    """
    qp = np.asarray(tables.qPi_f32x(num_moduli, backend), np.float64)  # (nu,4)
    p_hi = abs(tables.P_dd(num_moduli, backend)[0])
    ptop = int(np.floor(np.log2(p_hi)))
    # window: pieces cut below `base` contribute error <= 2^(base+11) each
    # (piece remainder x residue), so base sits 11 bits under the target
    # floor; the qPi tables' own ~96-bit truncation then bounds the total
    # absolute error by ~P * 2^-80 (f64 outputs)
    lo_bits = 95 if out_bits == 53 else 56
    base = ptop - lo_bits
    top = ptop + 16
    L = -(-(top - base) // LIMB_BITS) + 1

    def place(m_int, g):
        d = g - base
        li, off = divmod(d, LIMB_BITS)
        return (m_int, li, off)

    terms = []
    for i in range(num_moduli):
        for j in range(qp.shape[1]):
            for m_int, g in _int_pieces(qp[i, j]):
                if g + 23 < base or m_int == 0:
                    continue
                if g < base:      # partial: fold what remains above base
                    # shift the piece up to the base grid, dropping sub-base
                    # bits (error <= 2^base per piece, inside the budget)
                    m_int = m_int >> (base - g)
                    g = base
                if m_int:
                    terms.append((i,) + place(m_int, g))
    pexp = np.asarray(tables.P_f32x(num_moduli, backend), np.float64)
    p_terms = []
    for v in pexp:
        for m_int, g in _int_pieces(v):
            if g + 26 < base or m_int == 0:
                continue
            if g < base:
                m_int = m_int >> (base - g)
                g = base
            if m_int:
                p_terms.append(place(m_int, g))
    invp_top = np.float32(np.float64(tables.invP(num_moduli, backend))
                          * 2.0 ** (base + LIMB_BITS * (L - 3)))
    return base, L, tuple(terms), invp_top, tuple(p_terms)


def _add_to_limbs(limbs: list, prod, li: int, off: int):
    """Fold an int32 product (|prod| < 2^26) into limbs li/li+1 at bit offset
    off (static). Floor-division split keeps the low part non-negative."""
    if off == 0:
        limbs[li] = limbs[li] + prod
        return
    hi = prod >> (LIMB_BITS - off)                    # arithmetic shift: floor
    lo = prod - (hi << (LIMB_BITS - off))
    limbs[li] = limbs[li] + (lo << off)
    if li + 1 < len(limbs):
        limbs[li + 1] = limbs[li + 1] + hi


def crt_limbs(c_mid: jax.Array, num_moduli: int, backend: str, out_bits: int):
    """Exact CRT accumulate + wrap into carry-normalized int32 limbs.

    c_mid: (nu, m, n) wrapped residues. Returns (limbs, base): limbs is a
    list of L int32 arrays with t = sum_li limbs[li] * 2^(base + 20*li),
    |t| < P/2, every limb in [0, 2^20) except the (signed) top limb.
    """
    base, L, terms, invp_top, p_terms = _crt_plan(num_moduli, backend, out_bits)
    planes = [c_mid[i].astype(jnp.int32) for i in range(num_moduli)]

    shape = c_mid.shape[1:]
    limbs = [jnp.zeros(shape, jnp.int32) for _ in range(L)]
    for i, m_int, li, off in terms:
        _add_to_limbs(limbs, np.int32(m_int) * planes[i], li, off)

    # wrap: quot = rint(t * invP) from the top three limbs (f32; |quot|<2^14)
    t_top = (limbs[L - 1].astype(jnp.float32) * np.float32(_LIMB)
             + limbs[L - 2].astype(jnp.float32)) * np.float32(_LIMB) \
        + limbs[L - 3].astype(jnp.float32)
    quot = jnp.rint(t_top * invp_top).astype(jnp.int32)
    for m_int, li, off in p_terms:
        _add_to_limbs(limbs, np.int32(m_int) * quot, li, off)

    # one BALANCED carry pass, low -> high: limbs in [-2^19, 2^19). Balanced
    # (not [0, 2^20)) so a small-magnitude t leaves the high limbs at zero --
    # the output assembly then never cancels large limb terms (which would
    # round catastrophically in the output dtype for negative t).
    half = 1 << (LIMB_BITS - 1)
    for li in range(L - 1):
        c = (limbs[li] + half) >> LIMB_BITS
        limbs[li] = limbs[li] - (c << LIMB_BITS)
        limbs[li + 1] = limbs[li + 1] + c
    return limbs, base


def pow2_f32(e: jax.Array) -> jax.Array:
    """Exact 2^e f32 by exponent-field assembly; e must be in [-126, 127]."""
    return jax.lax.bitcast_convert_type(
        ((e.astype(jnp.int32) + 127) << 23), jnp.float32)


def reconstruct_scale_ff(c_mid: jax.Array, sft_a: jax.Array, sft_b: jax.Array,
                         num_moduli: int, backend: str, out_dtype) -> jax.Array:
    """Full TPU-native epilogue: exact limb CRT + inverse power-of-two scaling
    + output assembly. Replaces crt_reconstruct + inverse_scale
    (reference: inverse_scaling_real.hpp:56-89) on platforms without IEEE f64.

    Each limb is scaled by its exact power of two in the output dtype and the
    limbs are summed highest-first: the only roundings are the final additions
    in the output dtype (<= L-1 of them, each correctly rounded).
    """
    from . import quantize
    out_bits = 53 if np.dtype(out_dtype).itemsize == 8 else 24
    limbs, base = crt_limbs_matrix(c_mid, num_moduli, backend, out_bits)
    lb = 16                                      # matrix-path limb width
    sft_sum = sft_a[:, None] + sft_b[None, :]

    if jax.default_backend() == "cpu" and out_bits == 53:
        # true-IEEE-f64 platform: scale each limb in f64 (full exponent range)
        out = None
        for li in range(len(limbs) - 1, -1, -1):
            term = quantize.pow2_scale(
                limbs[li].astype(out_dtype), base + lb * li - sft_sum)
            out = term if out is None else out + term
        return out

    return descale_accel(limbs, base, lb, sft_a, sft_b, out_bits, out_dtype)


def descale_accel(limbs, base, lb, sft_a, sft_b, out_bits, out_dtype):
    # accelerator path: f64 is an emulated f32 pair (both storage and every
    # op), so all values live in f32's exponent range anyway. The descale
    # factor 2^(base+20li-sftA[i]-sftB[j]) factorizes: per-limb STATIC scalar
    # x rank-1 row/column pow2 vectors (each split in half to stay in f32's
    # exponent range). All multiplies are exact powers of two; limbs merge
    # smallest-first through a compensated two_sum chain, costing ONE
    # emulated-f64 add at the very end. (Split out so the fused Pallas
    # epilogue's bit-identity can be tested against it on CPU.)
    # three-way split: each factor's exponent stays f32-normal for |sft| up
    # to ~378 (a half-split caps at 252, exceeded by high-nu shifts on
    # tiny-magnitude rows); op-for-op identical to the fused kernel's
    # pallas_kernels._descale_factors (bit-identity contract)
    i32 = np.int32
    ta = -sft_a
    ha1 = jnp.right_shift(ta * i32(21846), i32(16))        # ~ta/3
    ra = ta - ha1
    ha2 = jnp.right_shift(ra, i32(1))
    fa1 = pow2_f32(ha1)[:, None]
    fa2 = pow2_f32(ha2)[:, None]
    fa3 = pow2_f32(ra - ha2)[:, None]
    tb = -sft_b
    hb1 = jnp.right_shift(tb * i32(21846), i32(16))
    rb = tb - hb1
    hb2 = jnp.right_shift(rb, i32(1))
    fb1 = pow2_f32(hb1)[None, :]
    fb2 = pow2_f32(hb2)[None, :]
    fb3 = pow2_f32(rb - hb2)[None, :]
    hi = None
    lo = None
    for li in range(len(limbs)):          # smallest-first
        e_static = base + lb * li
        s1 = np.float32(2.0 ** (e_static // 2))
        s2 = np.float32(2.0 ** (e_static - e_static // 2))
        term = limbs[li].astype(jnp.float32) * s1
        term = ((term * fa1) * fb1) * s2
        term = (term * fa2) * fb2
        term = (term * fa3) * fb3
        if hi is None:
            hi = term
            lo = jnp.zeros_like(term)
        else:
            hi, err = two_sum(hi, term)
            lo = lo + err
    if out_bits == 24:
        return (hi + lo).astype(out_dtype)
    return hi.astype(out_dtype) + lo.astype(out_dtype)

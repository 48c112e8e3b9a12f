"""Ozaki-scheme-II GEMM emulation driver: quantize -> batched int8 MXU matmuls ->
modular reduce -> CRT reconstruction -> inverse scaling + alpha/beta epilogue.

TPU-native re-design of the reference driver (reference: src/gemmul8_real.hpp:52-211,
src/matmult.hpp, src/conv_hi2mid_real.hpp, src/inverse_scaling_real.hpp):

  * the reference's per-modulus cublasGemmEx loop + N-column blocking becomes ONE
    batched `lax.dot_general` (int8 x int8 -> int32) with the modulus axis as the
    batch dimension -- XLA/Mosaic tiles it onto the MXU;
  * workspace carve-up / handle machinery disappears (XLA manages buffers);
  * K is unlimited (reference caps k <= 2^17, gemmul8.hpp:29): longer K is split
    into chunks whose int32 products are reduced in residue space, which is exact
    because residues add mod p;
  * the CRT wrap uses an exact 26-bit split of P instead of CUDA fma (XLA exposes
    no scalar fma), preserving the error-free cancellation structure.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import quantize, tables

# int32 accumulation of int8 residue products is exact up to this K
# (|r| <= 128 -> product <= 2^14; 2^14 * 2^17 = 2^31)
K_CHUNK = 1 << 17

def residue_matmul(a_planes: jax.Array, b_planes: jax.Array) -> jax.Array:
    """(nu, m, k) int8 @ (nu, k, n) int8 -> (nu, m, n) int32, exact.
    This is the MXU-native analog of the reference's cublasGemmEx INT8 loop
    (matmult.hpp:120-175): one error-free integer GEMM per modulus, batched."""
    return jax.lax.dot_general(
        a_planes, b_planes,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def mod_reduce(c_hi: jax.Array, num_moduli: int, backend: str) -> jax.Array:
    """C_mid[i] = wrap(C_hi[i] mod p_i) -> int8 (reference: conv_hi2mid_real.hpp)."""
    mods = tables.moduli(backend)[:num_moduli]
    outs = []
    for i, p in enumerate(mods):
        r = c_hi[i] % p
        r = jnp.where(2 * r >= p, r - p, r)
        outs.append(r.astype(jnp.int8))
    return jnp.stack(outs)


def _chunked_residue_acc(a_planes, b_planes, num_moduli, backend):
    """K-chunked int32 residue accumulator: sum of per-chunk [0, p) partial
    residues (exact; <= n_chunks * p < 2^31). Feeds either the XLA wrap
    below or the fused Pallas epilogue directly (whose wrap accepts any
    int32 magnitude)."""
    mods = tables.moduli(backend)[:num_moduli]
    k = a_planes.shape[2]
    n_chunks = -(-k // K_CHUNK)
    acc = None
    for ci in range(n_chunks):
        sl = slice(ci * K_CHUNK, min((ci + 1) * K_CHUNK, k))
        c_hi = residue_matmul(a_planes[:, :, sl], b_planes[:, sl, :])
        part = jnp.stack([c_hi[i] % p for i, p in enumerate(mods)])
        acc = part if acc is None else acc + part
    return acc


def residue_gemm(a_planes: jax.Array, b_planes: jax.Array,
                 num_moduli: int, backend: str) -> jax.Array:
    """Full-K exact residue GEMM -> wrapped C_mid (nu, m, n); int8 for the
    INT8 backend, int16 for FP8 (moduli up to 1089).

    K > K_CHUNK is handled by chunking and summing partial products in residue
    space (exact: residues are closed under addition mod p), lifting the
    reference's k <= 2^17 limit."""
    if backend == tables.Backend.FP8:
        from . import fp8
        return fp8.residue_gemm_fp8(a_planes, b_planes, num_moduli)
    k = a_planes.shape[2]
    if k <= K_CHUNK:
        return mod_reduce(residue_matmul(a_planes, b_planes), num_moduli, backend)
    mods = tables.moduli(backend)[:num_moduli]
    acc = _chunked_residue_acc(a_planes, b_planes, num_moduli, backend)
    outs = []
    for i, p in enumerate(mods):
        r = acc[i] % p
        r = jnp.where(2 * r >= p, r - p, r)
        outs.append(r.astype(jnp.int8))
    return jnp.stack(outs)


def crt_reconstruct(c_mid: jax.Array, num_moduli: int, backend: str,
                    out_dtype) -> jax.Array:
    """Fixed-order CRT accumulation + wrap (reference: inverse_scaling_real.hpp:8-89).

    Returns f64 values of the reconstructed integers t, |t| < P/2 (before inverse
    scaling). Uses double-double accumulation when the product of moduli exceeds
    f64 (num_moduli > p_is_double and 64-bit output), exactly like the reference.
    """
    use_dd = (np.dtype(out_dtype).itemsize == 8) and \
        (num_moduli > tables.p_is_double(backend))
    invp = tables.invP(num_moduli, backend)
    pa, pb, pc = tables.P_q26(num_moduli, backend)
    planes = [c_mid[i].astype(jnp.float64) for i in range(num_moduli)]

    if not use_dd:
        qp = tables.qPi_f64(num_moduli, backend)
        acc = qp[0] * planes[0]
        for i in range(1, num_moduli):
            acc = acc + qp[i] * planes[i]
        quot = jnp.rint(invp * acc)
        # t = P*quot + acc with Pa*quot exact (26-bit chunk x small int)
        return ((pa * quot + acc) + pb * quot) + pc * quot

    qp = tables.qPi_dd(num_moduli, backend)
    hi = qp[0, 0] * planes[0]   # error-free: common-grid hi parts x int8 residues
    lo = qp[0, 1] * planes[0]
    for i in range(1, num_moduli):
        hi = hi + qp[i, 0] * planes[i]
        lo = lo + qp[i, 1] * planes[i]
    quot = jnp.rint(invp * hi)
    # ((Pa*q + hi) + Pb*q): exact cancellation on the common power-of-two grid;
    # the low parts fold in with ordinary roundings (reference: fma(P.y, q, ...))
    return ((pa * quot + hi) + pb * quot) + (lo + pc * quot)


def inverse_scale(t: jax.Array, sft_a: jax.Array, sft_b: jax.Array,
                  out_dtype) -> jax.Array:
    """Undo the power-of-two scaling: C = t * 2^-(sftA[i]+sftB[j]), computed in the
    output dtype like the reference (inverse_scaling_real.hpp:72)."""
    sft_sum = sft_a[:, None] + sft_b[None, :]
    return quantize.pow2_scale(t.astype(out_dtype), -sft_sum)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _quantize_operands(a, b, num_moduli, fastmode, backend):
    """Fast mode: independent norm-based shifts (scaling_fast_real.hpp).
    fastmode="robust": the scale-invariant fast shift (safe at any operand
    scale; see quantize.shift_fast). Accurate mode: one extra int8 GEMM of
    6-bit upper-bound extracts to estimate the product magnitude per
    row/col (scaling_accu_real.hpp)."""
    if fastmode:
        var = "invariant" if fastmode == "robust" else "reference"
        sft_a = quantize.shift_fast(a, num_moduli, backend, reduce_axis=1,
                                    variant=var)
        sft_b = quantize.shift_fast(b, num_moduli, backend, reduce_axis=0,
                                    variant=var)
    else:
        ub_a, pre_a = quantize.extract_ub_plane(a, backend, scale_axis=0)
        ub_b, pre_b = quantize.extract_ub_plane(b, backend, scale_axis=1)
        c_hi = quantize.estimate_gemm(ub_a, ub_b, backend)
        sft_a = quantize.shift_accu_from_chi(
            jnp.max(c_hi, axis=1), pre_a, num_moduli, backend)
        sft_b = quantize.shift_accu_from_chi(
            jnp.max(c_hi, axis=0), pre_b, num_moduli, backend)
    a_planes = quantize.encode_planes(a, sft_a, 0, num_moduli, backend)
    b_planes = quantize.encode_planes(b, sft_b, 1, num_moduli, backend)
    return a_planes, sft_a, b_planes, sft_b


def _norm_trans(t, name: str) -> bool:
    """BLAS trans flag -> bool ("C" == "T" for reals). Accepts python AND
    numpy bools/ints plus the strings N/T/C (any case); anything else
    raises -- silently mapping an unknown spelling (e.g. np.bool_(True)'s
    str 'TRUE') to no-transpose would compute the wrong product."""
    if isinstance(t, (bool, np.bool_, int, np.integer)):
        return bool(t)
    if t is None:
        return False
    s = str(t).upper()
    if s not in ("N", "T", "C"):
        raise ValueError(
            f"{name} must be a bool or one of 'N'/'T'/'C', got {t!r}")
    return s in ("T", "C")


def resolve_epilogue(epilogue: str = "auto") -> str:
    """Pick the CRT reconstruction arithmetic.

    "f64": double/double-double accumulation like the reference
    (inverse_scaling_real.hpp) -- requires true IEEE f64 (CPU).
    "ff": exact int32 limb arithmetic (ff.py) -- the TPU-native path; XLA's
    X64 rewrite emulates f64 as an f32 pair whose ~48-bit products silently
    break the dd path's exactness on TPU. Same results on every platform.
    """
    if epilogue != "auto":
        if epilogue not in ("ff", "f64"):
            # a typo must not silently select the f64 path, which loses
            # bits on TPU's f32-pair f64 emulation
            raise ValueError(
                f"epilogue must be 'auto', 'ff' or 'f64', got {epilogue!r}")
        return epilogue
    return "f64" if jax.default_backend() == "cpu" else "ff"


def reconstruct_scale(c_mid, sft_a, sft_b, num_moduli, backend, out_dtype,
                      epilogue: str):
    if resolve_epilogue(epilogue) == "ff":
        from . import ff
        return ff.reconstruct_scale_ff(c_mid, sft_a, sft_b, num_moduli,
                                       backend, out_dtype)
    t = crt_reconstruct(c_mid, num_moduli, backend, out_dtype)
    return inverse_scale(t, sft_a, sft_b, out_dtype)


def _emulated_product(a_planes, sft_a, b_planes, sft_b, num_moduli, backend,
                      out_dtype, epilogue):
    """Residue GEMM + epilogue from encoded planes. On TPU with aligned INT8
    planes, the mod+CRT+descale chain runs as ONE fused Pallas consumer of
    the int8 dot (pallas_kernels.fused_epilogue) -- no c_mid / CRT-column /
    limb HBM round-trips, bit-identical to the unfused path. The analog of
    the reference's one-buffer GEMM + conv_hi2mid interleave
    (gemmul8_real.hpp:144-191)."""
    out_dtype = jnp.dtype(out_dtype)
    # BOTH operands must be GEMM-ready 3-D stacks: precompute/gemm_quantized
    # can legally mix a Pallas stack with canonical 4-D FP8 planes (layout
    # depends on each operand's own tile alignment); the fallback
    # residue_gemm handles the mix, the fused path cannot
    fused_ok = (resolve_epilogue(epilogue) == "ff"
                and jax.default_backend() != "cpu"
                and a_planes.ndim == 3 and b_planes.ndim == 3)
    if (fused_ok and backend == tables.Backend.FP8
            and a_planes.dtype == jnp.bfloat16):
        from . import fp8
        from . import pallas_kernels as pk
        m, k = a_planes.shape[1], a_planes.shape[2]
        n = b_planes.shape[2]
        if m % 128 == 0 and n % 128 == 0:
            out_bits = 53 if out_dtype.itemsize == 8 else 24
            if k <= fp8.K_CHUNK_FP8:
                c3 = fp8._batched_dot(a_planes, b_planes)   # (3nu, m, n) f32
                hi, lo = pk.fused_epilogue_fp8(c3, sft_a, sft_b, num_moduli,
                                               out_bits)
            else:
                acc = fp8._chunked_residue_acc(a_planes, b_planes, num_moduli)
                hi, lo = pk.fused_epilogue(acc, sft_a, sft_b, num_moduli,
                                           backend, out_bits)
            if out_bits == 24:
                return (hi + lo).astype(out_dtype)
            return hi.astype(out_dtype) + lo.astype(out_dtype)
    if (fused_ok
            and backend == tables.Backend.INT8
            and a_planes.dtype == jnp.int8):
        from . import pallas_kernels as pk
        m, k = a_planes.shape[1], a_planes.shape[2]
        n = b_planes.shape[2]
        if m % 128 == 0 and n % 128 == 0:
            if k <= K_CHUNK:
                emit = os.environ.get("GEMMUL8_DOT_EMIT", "hi").lower()
                if emit not in ("hi", "mid"):
                    raise ValueError(
                        f"GEMMUL8_DOT_EMIT={emit!r}: use 'hi' or 'mid'")
                if emit == "mid":
                    # A/B lever: let XLA fuse the per-modulus wrap into the
                    # dot's consumer so only the INT8 c_mid (1 byte/elem, 4x
                    # less HBM than the int32 C_hi) is materialized for the
                    # epilogue to read. The dot itself runs ~3% slower with
                    # a fused consumer (261 vs 269 TOPS probe) -- whether
                    # the traffic saving wins is hardware-measured, hence
                    # env-gated. Bit-identical: the epilogue's wrap is a
                    # value-identity on wrapped residues.
                    c_hi = mod_reduce(residue_matmul(a_planes, b_planes),
                                      num_moduli, backend)
                else:
                    c_hi = residue_matmul(a_planes, b_planes)
            else:
                # the fused kernel's wrap accepts any int32 magnitude, so
                # the K-chunked residue accumulator feeds it directly
                c_hi = _chunked_residue_acc(a_planes, b_planes, num_moduli,
                                            backend)
            out_bits = 53 if out_dtype.itemsize == 8 else 24
            hi, lo = pk.fused_epilogue(c_hi, sft_a, sft_b, num_moduli,
                                       backend, out_bits)
            if out_bits == 24:
                return (hi + lo).astype(out_dtype)
            return hi.astype(out_dtype) + lo.astype(out_dtype)
    c_mid = residue_gemm(a_planes, b_planes, num_moduli, backend)
    return reconstruct_scale(c_mid, sft_a, sft_b, num_moduli, backend,
                             out_dtype, epilogue)


def _pad128(x: jax.Array, axes) -> jax.Array:
    """Zero-pad the given axes up to multiples of 128 (exactness-preserving:
    zero rows/cols produce zero planes, zero dot contributions and sft=0).
    The TPU analog of the reference's pad-to-256 (common.hpp:32)."""
    pads = [(0, 0)] * x.ndim
    needed = False
    for ax in axes:
        r = (-x.shape[ax]) % 128
        if r:
            pads[ax] = (0, r)
            needed = True
    return jnp.pad(x, pads) if needed else x


def emulate_matmul(a: jax.Array, b: jax.Array, *, num_moduli: int,
                   fastmode: bool = True,
                   backend: str = tables.Backend.INT8,
                   epilogue: str = "auto") -> jax.Array:
    """Pure traceable emulated A @ B (no epilogue): the composable building block
    used by gemm(), the dot_general hook (vmap-able) and the distributed layer.

    On accelerators, operands are zero-padded to multiples of 128 so every
    shape takes the fused Pallas encode + epilogue path, then the output is
    sliced back -- bit-identical to the unpadded math."""
    out_dtype = a.dtype
    m, n = a.shape[0], b.shape[1]
    if a.shape[1] == 0:
        # BLAS k=0 semantics: the product is zero (the shift/encode
        # reductions have no identity over an empty axis)
        return jnp.zeros((m, n), out_dtype)
    if jax.default_backend() != "cpu":
        a = _pad128(a, (0, 1))
        b = _pad128(b, (0, 1))
    a_planes, sft_a, b_planes, sft_b = _quantize_operands(
        a, b, num_moduli, fastmode, backend)
    out = _emulated_product(a_planes, sft_a, b_planes, sft_b, num_moduli,
                            backend, out_dtype, epilogue)
    if out.shape != (m, n):
        out = out[:m, :n]
    return out


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "trans_a", "trans_b", "has_c",
    "epilogue", "trivial_alpha", "beta_kind"))
def _gemm_real(a, b, c, alpha, beta, *, num_moduli, fastmode, backend,
               trans_a, trans_b, has_c, epilogue, trivial_alpha, beta_kind):
    if trans_a:
        a = a.T
    if trans_b:
        b = b.T
    out_dtype = a.dtype
    ab = emulate_matmul(a, b, num_moduli=num_moduli, fastmode=fastmode,
                        backend=backend, epilogue=epilogue)
    # trace-time alpha/beta special cases keep the common paths untouched by
    # extra (possibly emulated-f64) multiplies; analog of the reference's
    # compile-time alpha in {1,-1} / beta in {0,1} kernels
    # (inverse_scaling_real.hpp:149-187). beta_kind == "zero" never touches
    # C: a NaN/Inf-filled dont-care C cannot corrupt the output.
    out = ab if trivial_alpha else alpha.astype(out_dtype) * ab
    if has_c and beta_kind != "zero":
        out = out + (c if beta_kind == "one" else beta.astype(out_dtype) * c)
    return out


@functools.partial(jax.jit, static_argnames=("trivial_alpha", "beta_kind"))
def _ab_epilogue(ab, alpha, beta, c, *, trivial_alpha, beta_kind):
    out = ab if trivial_alpha else alpha.astype(ab.dtype) * ab
    if beta_kind != "zero":
        out = out + (c if beta_kind == "one" else beta.astype(ab.dtype) * c)
    return out


def gemm(a: jax.Array, b: jax.Array, *, num_moduli: int = 8,
         fastmode: bool = True, backend: str = tables.Backend.INT8,
         alpha=1.0, beta=0.0, c: Optional[jax.Array] = None,
         trans_a: bool = False, trans_b: bool = False,
         epilogue: str = "auto", m_block: Optional[int] = None,
         n_block: Optional[int] = None) -> jax.Array:
    """Emulated high-precision GEMM: C = alpha * op(A) @ op(B) + beta * C.

    Public analog of gemmul8::gemm (reference: include/gemmul8.hpp:41-94).
    `num_moduli` dials accuracy vs speed (2..13 for f32, 2..20 for f64).
    Results are bit-wise reproducible for fixed shapes/config on a platform.

    Big shapes are automatically M/N-striped when their workspace would
    exceed the device budget (pick_blocking; the reference's 8192-column
    N-blocking, matmult.hpp:68-75) -- bit-identical to the unblocked path.
    m_block/n_block force explicit stripe widths.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(
            f"gemm expects 2-D operands, got A.ndim={a.ndim}, B.ndim={b.ndim}"
            " (for batched contractions use the hook or vmap emulate_matmul)")
    if a.dtype != b.dtype:
        raise TypeError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
    if backend not in (tables.Backend.INT8, tables.Backend.FP8):
        # checked BEFORE the complex dispatch so a bad backend string gets
        # this ValueError instead of an AttributeError deep inside tables
        raise ValueError(f"backend must be 'INT8' or 'FP8', got {backend!r}")
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        from . import complex_gemm
        return complex_gemm.gemm_complex(
            a, b, num_moduli=num_moduli, fastmode=fastmode, backend=backend,
            alpha=alpha, beta=beta, c=c, trans_a=trans_a, trans_b=trans_b,
            epilogue=epilogue)
    lo, hi = tables.VALID_RANGE[np.dtype(a.dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(
            f"num_moduli={num_moduli} out of range [{lo},{hi}] for {a.dtype}")
    # accept BLAS-style "N"/"T"/"C" ops as well as bools ("C" == "T" for reals)
    trans_a = _norm_trans(trans_a, "trans_a")
    trans_b = _norm_trans(trans_b, "trans_b")
    has_c = c is not None
    trivial_alpha = isinstance(alpha, (int, float)) and alpha == 1
    # trace-time beta specialization (reference: beta in {0,1} kernels);
    # a python-scalar beta == 0 means C is never read at all
    beta_kind = ("zero" if isinstance(beta, (int, float)) and beta == 0
                 else "one" if isinstance(beta, (int, float)) and beta == 1
                 else "general")
    # memory-gated M/N blocking (auto on accelerators via pick_blocking;
    # explicit m_block/n_block force it)
    m_eff = a.shape[1] if trans_a else a.shape[0]
    k_eff = a.shape[0] if trans_a else a.shape[1]
    n_eff = b.shape[0] if trans_b else b.shape[1]
    if m_block is None and n_block is None and k_eff > 0:
        m_block, n_block = pick_blocking(m_eff, n_eff, k_eff, num_moduli,
                                         a.dtype, backend)
    if (m_block is not None or n_block is not None) and k_eff > 0:
        at = a.T if trans_a else a
        bt = b.T if trans_b else b
        ab = emulate_matmul_blocked(
            at, bt, num_moduli=num_moduli, fastmode=fastmode, backend=backend,
            epilogue=epilogue, n_block=n_block or n_eff, m_block=m_block)
        if trivial_alpha and (not has_c or beta_kind == "zero"):
            return ab
        # jitted: XLA contracts mul+add to fma exactly as inside _gemm_real,
        # keeping the blocked path bit-identical to the unblocked one
        return _ab_epilogue(ab, jnp.asarray(alpha), jnp.asarray(beta),
                            c if has_c and beta_kind != "zero"
                            else jnp.zeros((), ab.dtype),
                            trivial_alpha=trivial_alpha,
                            beta_kind="zero" if not has_c else beta_kind)
    if not has_c or beta_kind == "zero":
        c = jnp.zeros((), a.dtype)  # placeholder, never read
    return _gemm_real(a, b, c, jnp.asarray(alpha), jnp.asarray(beta),
                      num_moduli=num_moduli, fastmode=fastmode, backend=backend,
                      trans_a=trans_a, trans_b=trans_b, has_c=has_c,
                      epilogue=epilogue, trivial_alpha=trivial_alpha,
                      beta_kind=beta_kind)


def matmul(a: jax.Array, b: jax.Array, **kw) -> jax.Array:
    """NumPy-style convenience wrapper around :func:`gemm`."""
    return gemm(a, b, **kw)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "epilogue"))
def _gemm_batched(a, b, *, num_moduli, fastmode, backend, epilogue):
    return jax.vmap(functools.partial(
        emulate_matmul, num_moduli=num_moduli, fastmode=fastmode,
        backend=backend, epilogue=epilogue))(a, b)


def gemm_batched(a: jax.Array, b: jax.Array, *, num_moduli: int = 8,
                 fastmode=True, backend: str = tables.Backend.INT8,
                 epilogue: str = "auto") -> jax.Array:
    """Emulated batched GEMM: (B, m, k) @ (B, k, n) -> (B, m, n).

    The strided-batched entry users of cublasGemmStridedBatched expect;
    each batch element runs the full emulation pipeline (vmapped -- XLA
    batches the int8 MXU dots). For batched contractions inside larger
    programs, the hook intercepts lax.dot_general batch dims directly.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != 3 or b.ndim != 3 or a.shape[0] != b.shape[0]:
        raise ValueError(
            f"gemm_batched expects (B, m, k) and (B, k, n); got {a.shape} "
            f"and {b.shape}")
    if a.dtype != b.dtype:
        raise TypeError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        from . import complex_gemm
        return complex_gemm.gemm_batched_complex(
            a, b, num_moduli=num_moduli, fastmode=fastmode, backend=backend,
            epilogue=epilogue)
    lo, hi = tables.VALID_RANGE[np.dtype(a.dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(
            f"num_moduli={num_moduli} out of range [{lo},{hi}] for {a.dtype}")
    return _gemm_batched(a, b, num_moduli=num_moduli, fastmode=fastmode,
                         backend=backend, epilogue=epilogue)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "trans", "epilogue"))
def _syrk(a, *, num_moduli, fastmode, backend, trans, epilogue):
    if trans:
        a = a.T
    out_dtype = a.dtype
    mdim = a.shape[0]
    if jax.default_backend() != "cpu":
        a = _pad128(a, (0, 1))
    # one encode serves both sides: rows of A and columns of A.T carry the
    # SAME shifts and the same quantized integers, so the rhs planes are a
    # transpose view of the lhs planes (no second quantization pass)
    if fastmode:
        sft = quantize.shift_fast(
            a, num_moduli, backend, reduce_axis=1,
            variant="invariant" if fastmode == "robust" else "reference")
    else:
        ub, pre = quantize.extract_ub_plane(a, backend, scale_axis=0)
        ub_t = jnp.swapaxes(ub, 0, 1)
        c_est = quantize.estimate_gemm(ub, ub_t, backend)
        sft = quantize.shift_accu_from_chi(
            jnp.max(c_est, axis=1), pre, num_moduli, backend)
    pa = quantize.encode_planes(a, sft, 0, num_moduli, backend)
    pb = jnp.swapaxes(pa, pa.ndim - 2, pa.ndim - 1)
    if backend == tables.Backend.FP8 and pa.ndim == 3:
        # the Pallas-encoded stack is in LHS slot order; the rhs needs the
        # cross-slot order for the square moduli (see fp8.lhs_to_rhs_stack)
        from . import fp8
        pb = fp8.lhs_to_rhs_stack(pb, num_moduli)
    out = _emulated_product(pa, sft, pb, sft, num_moduli, backend,
                            out_dtype, epilogue)
    if out.shape != (mdim, mdim):
        out = out[:mdim, :mdim]
    return out


def syrk(a: jax.Array, *, trans: bool = False, num_moduli: int = 8,
         fastmode="robust", backend: str = tables.Backend.INT8,
         alpha=1.0, beta=0.0, c: Optional[jax.Array] = None,
         epilogue: str = "auto") -> jax.Array:
    """Emulated symmetric rank-k update: C = alpha * A @ A.T + beta * C
    (trans=True: alpha * A.T @ A + beta * C).

    Capability beyond the reference (which is GEMM-only): the residue-plane
    representation makes syrk nearly free of quantization cost -- the two
    operand plane sets are one encode plus a transpose view, halving the
    encode phase versus gemm(a, a.T). Exactly equal to gemm(a, a.T, ...)
    with shared row/col shifts; bit-reproducible like gemm.

    fastmode defaults to "robust" (unlike gemm): a Gram product's diagonal
    hits the Cauchy-Schwarz bound with equality (a_i . a_i = ||a_i||^2), the
    exact case where the reference fast formula's probabilistic slack can
    silently wrap the CRT at specific num_moduli. The robust shifts bound
    the product rigorously at the same speed (see solvers module docstring).
    """
    a = jnp.asarray(a)
    if a.ndim != 2:
        raise ValueError(f"syrk expects a 2-D operand, got ndim={a.ndim}")
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise NotImplementedError(
            "syrk is real-only; use herk (A @ A^H) or gemm for complex")
    lo, hi = tables.VALID_RANGE[np.dtype(a.dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(
            f"num_moduli={num_moduli} out of range [{lo},{hi}] for {a.dtype}")
    out = _syrk(a, num_moduli=num_moduli, fastmode=fastmode, backend=backend,
                trans=bool(trans), epilogue=epilogue)
    if not (isinstance(alpha, (int, float)) and alpha == 1):
        out = jnp.asarray(alpha).astype(out.dtype) * out
    if c is not None and not (isinstance(beta, (int, float)) and beta == 0):
        out = out + (c if isinstance(beta, (int, float)) and beta == 1
                     else jnp.asarray(beta).astype(out.dtype) * c)
    return out


# ---------------------------------------------------------------------------
# memory-bounded M/N-blocked driver (big single-chip shapes)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_moduli", "fastmode",
                                             "backend"))
def _blk_encode_a(a, *, num_moduli, fastmode, backend):
    if jax.default_backend() != "cpu":
        a = _pad128(a, (0, 1))
    var = "invariant" if fastmode == "robust" else "reference"
    sft = quantize.shift_fast(a, num_moduli, backend, reduce_axis=1,
                              variant=var)
    return quantize.encode_planes(a, sft, 0, num_moduli, backend), sft


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "fastmode", "backend", "out_dtype", "epilogue", "m_out"))
def _blk_stripe_fast(a_planes, sft_a, b_stripe, *, num_moduli, fastmode,
                     backend, out_dtype, epilogue, m_out):
    n_out = b_stripe.shape[1]
    if jax.default_backend() != "cpu":
        b_stripe = _pad128(b_stripe, (0, 1))
    var = "invariant" if fastmode == "robust" else "reference"
    sft_b = quantize.shift_fast(b_stripe, num_moduli, backend, reduce_axis=0,
                                variant=var)
    b_planes = quantize.encode_planes(b_stripe, sft_b, 1, num_moduli, backend)
    out = _emulated_product(a_planes, sft_a, b_planes, sft_b, num_moduli,
                            backend, jnp.dtype(out_dtype), epilogue)
    return out[:m_out, :n_out]


@functools.partial(jax.jit, static_argnames=("backend",))
def _blk_extract_a(a_s, *, backend):
    return quantize.extract_ub_plane(a_s, backend, scale_axis=0)


@functools.partial(jax.jit, static_argnames=("backend",))
def _blk_est_tile(ub_a, b_s, *, backend):
    ub_b, pre_b = quantize.extract_ub_plane(b_s, backend, scale_axis=1)
    c_est = quantize.estimate_gemm(ub_a, ub_b, backend)
    return jnp.max(c_est, axis=1), jnp.max(c_est, axis=0), pre_b


@functools.partial(jax.jit, static_argnames=("num_moduli", "backend"))
def _blk_encode_a_accu(a_s, row_max, pre_a, *, num_moduli, backend):
    sft = quantize.shift_accu_from_chi(row_max, pre_a, num_moduli, backend)
    if jax.default_backend() != "cpu":
        a_s = _pad128(a_s, (0, 1))
        sft = jnp.pad(sft, (0, a_s.shape[0] - sft.shape[0]))
    return quantize.encode_planes(a_s, sft, 0, num_moduli, backend), sft


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "backend", "out_dtype", "epilogue", "m_out"))
def _blk_stripe_accu(a_planes, sft_a, b_stripe, col_max, pre_b, *,
                     num_moduli, backend, out_dtype, epilogue, m_out):
    n_out = b_stripe.shape[1]
    sft_b = quantize.shift_accu_from_chi(col_max, pre_b, num_moduli, backend)
    if jax.default_backend() != "cpu":
        b_stripe = _pad128(b_stripe, (0, 1))
        sft_b = jnp.pad(sft_b, (0, b_stripe.shape[1] - sft_b.shape[0]))
    b_planes = quantize.encode_planes(b_stripe, sft_b, 1, num_moduli, backend)
    out = _emulated_product(a_planes, sft_a, b_planes, sft_b, num_moduli,
                            backend, jnp.dtype(out_dtype), epilogue)
    return out[:m_out, :n_out]


def emulate_matmul_blocked(a: jax.Array, b: jax.Array, *, num_moduli: int,
                           fastmode=True, backend: str = tables.Backend.INT8,
                           epilogue: str = "auto", n_block: int = 8192,
                           m_block: Optional[int] = None) -> jax.Array:
    """Memory-bounded emulated A @ B: N (and optionally M) is processed in
    stripes so peak temporary memory is ~work_bytes(m_block, n_block, k)
    instead of work_bytes(m, n, k) -- the TPU analog of the reference's
    bounded-workspace N-column blocking (matmult.hpp:68-75, 129-175), which
    lets shapes like 16384^3 f64 run inside a v5e's 16-GB HBM.

    Bit-identical to emulate_matmul: per-row shifts/planes depend only on
    that row of A, per-column only on that column of B, and in accurate mode
    the estimation row/col maxima are reduced exactly (max is order-free)
    across the tile grid before any encode. Each stripe runs as its own XLA
    program; equal stripe widths share one compiled executable. Real
    operands only (complex big shapes: compose with the distributed layer).
    """
    m, k = a.shape
    n = b.shape[1]
    out_dtype = a.dtype
    m_block = m if m_block is None else m_block
    m_starts = list(range(0, m, m_block))
    n_starts = list(range(0, n, n_block))

    if fastmode:
        outs_m = []
        for mi in m_starts:
            a_s = a[mi:mi + m_block]
            a_planes, sft_a = _blk_encode_a(
                a_s, num_moduli=num_moduli, fastmode=fastmode, backend=backend)
            outs_n = [
                _blk_stripe_fast(
                    a_planes, sft_a, b[:, ni:ni + n_block],
                    num_moduli=num_moduli, fastmode=fastmode, backend=backend,
                    out_dtype=out_dtype.name, epilogue=epilogue,
                    m_out=a_s.shape[0])
                for ni in n_starts]
            outs_m.append(outs_n[0] if len(outs_n) == 1
                          else jnp.concatenate(outs_n, axis=1))
        return outs_m[0] if len(outs_m) == 1 else jnp.concatenate(outs_m, 0)

    # accurate mode: phase 1 -- estimation GEMM over the whole tile grid,
    # exact row/col maxima (rowmax spans all N stripes, colmax all M stripes:
    # scaling_accu_real.hpp:142-226 semantics at blocked scale)
    ub_pre_a = [_blk_extract_a(a[mi:mi + m_block], backend=backend)
                for mi in m_starts]
    row_maxes = [None] * len(m_starts)
    col_maxes = [None] * len(n_starts)
    pre_bs = [None] * len(n_starts)
    for i, mi in enumerate(m_starts):
        for j, ni in enumerate(n_starts):
            rm, cm, pre_b = _blk_est_tile(ub_pre_a[i][0],
                                          b[:, ni:ni + n_block],
                                          backend=backend)
            row_maxes[i] = rm if row_maxes[i] is None \
                else jnp.maximum(row_maxes[i], rm)
            col_maxes[j] = cm if col_maxes[j] is None \
                else jnp.maximum(col_maxes[j], cm)
            pre_bs[j] = pre_b
    # phase 2: encode + per-tile product
    outs_m = []
    for i, mi in enumerate(m_starts):
        a_s = a[mi:mi + m_block]
        a_planes, sft_a = _blk_encode_a_accu(
            a_s, row_maxes[i], ub_pre_a[i][1], num_moduli=num_moduli,
            backend=backend)
        outs_n = [
            _blk_stripe_accu(
                a_planes, sft_a, b[:, ni:ni + n_block], col_maxes[j],
                pre_bs[j], num_moduli=num_moduli, backend=backend,
                out_dtype=out_dtype.name, epilogue=epilogue,
                m_out=a_s.shape[0])
            for j, ni in enumerate(n_starts)]
        outs_m.append(outs_n[0] if len(outs_n) == 1
                      else jnp.concatenate(outs_n, axis=1))
    return outs_m[0] if len(outs_m) == 1 else jnp.concatenate(outs_m, 0)


def pick_blocking(m: int, n: int, k: int, num_moduli: int, dtype,
                  backend: str = tables.Backend.INT8,
                  budget_bytes: Optional[int] = None):
    """(m_block, n_block) or (None, None): choose reference-style stripe
    widths (8192 halving to 1024; matmult.hpp:68-75 uses fixed 8192) so one
    stripe's work_bytes fits the budget. Budget default: 12 GiB on
    accelerators (v5e HBM minus residents), unbounded on CPU; override via
    GEMMUL8_HBM_BUDGET_GB."""
    import os
    if budget_bytes is None:
        env = os.environ.get("GEMMUL8_HBM_BUDGET_GB")
        if env is not None:
            budget_bytes = int(float(env) * (1 << 30))
        elif jax.default_backend() == "cpu":
            return None, None
        else:
            budget_bytes = 12 * (1 << 30)
    if work_bytes(m, n, k, num_moduli, dtype, backend) <= budget_bytes:
        return None, None
    for m_blk in (m, 8192, 4096, 2048, 1024):
        if m_blk > m:
            continue
        for n_blk in (8192, 4096, 2048, 1024):
            if n_blk > n:
                continue
            if work_bytes(min(m, m_blk), min(n, n_blk), k, num_moduli,
                          dtype, backend) <= budget_bytes:
                return (None if m_blk == m else m_blk), n_blk
    return 1024, 1024


def work_bytes(m: int, n: int, k: int, num_moduli: int,
               dtype=jnp.float64, backend: str = tables.Backend.INT8) -> int:
    """Planning estimate of peak temporary device memory (bytes) for one emulated
    GEMM. Analog of gemmul8::workSize (reference: gemmul8_real.hpp:8-47) -- here
    XLA owns allocation, so this is an estimate for job sizing, not a contract:
    A/B residue planes (int8) + C_hi (int32) + C_mid (int8) + shift vectors."""
    is_cplx = jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)
    lanes = 3 if is_cplx else 1
    # FP8: 3 bf16 slot planes per modulus (2 bytes), 3 GEMM products per
    # modulus (f32 C_hi), int16 C_mid; INT8: 1 int8 plane / int32 C_hi / int8.
    plane_b = 6 if backend == tables.Backend.FP8 else 1
    prod = 3 if backend == tables.Backend.FP8 else 1
    mid_b = 2 if backend == tables.Backend.FP8 else 1
    planes_a = num_moduli * lanes * m * k * plane_b
    planes_b = num_moduli * lanes * k * n * plane_b
    c_hi = num_moduli * lanes * prod * m * n * 4
    c_mid = num_moduli * (2 if is_cplx else 1) * m * n * mid_b
    sft = 4 * (m + n)
    return planes_a + planes_b + c_hi + c_mid + sft


def gemm_with_phases(a: jax.Array, b: jax.Array, *, num_moduli: int = 8,
                     fastmode: bool = True, backend: str = tables.Backend.INT8,
                     iters: int = 1, epilogue: str = "auto"):
    """Run the emulation in 4 separately-timed phases and return
    (C, {"quantize": s, "matmul": s, "mod_reduce": s, "crt_inverse": s}).

    Mirrors the reference's returned timer vector {scaling, low-prec GEMM,
    conv_hi2mid, inverse scaling} (gemmul8_real.hpp:67-68,122-204). Unlike the
    reference -- which stream-syncs inside the production path -- instrumentation
    here is a separate entry point; gemm() itself never synchronizes.

    Note: this entry times the UNFUSED stage decomposition for phase
    introspection; the production TPU path fuses mod_reduce + crt_inverse
    into one Pallas consumer of the matmul (faster than the sum of the
    separated phases -- see BASELINE.md)."""
    import time

    q = jax.jit(functools.partial(_quantize_operands, num_moduli=num_moduli,
                                  fastmode=fastmode, backend=backend))
    k_eff = a.shape[1]
    if backend == tables.Backend.FP8:
        from . import fp8
        chunked = k_eff > fp8.K_CHUNK_FP8

        @jax.jit
        def mm(pa, pb):
            # the Pallas FP8 encoder already emits the (3*nu, m, k) GEMM-ready
            # stack (ndim == 3); only canonical (nu, 3, m, k) planes need the
            # slot gather (mirrors residue_gemm_fp8's passthrough)
            sa = pa if pa.ndim == 3 else fp8._gemm_stack(pa, num_moduli, "lhs")
            sb = pb if pb.ndim == 3 else fp8._gemm_stack(pb, num_moduli, "rhs")
            if chunked:   # beyond the exact-dot K bound: residue-space acc
                return fp8._chunked_residue_acc(sa, sb, num_moduli)
            return fp8._batched_dot(sa, sb)

        @jax.jit
        def mr(c3):
            if chunked:   # final wrap of the accumulated residues
                mods = tables.moduli(backend)[:num_moduli]
                r = jnp.stack([c3[i] % p for i, p in enumerate(mods)])
                pcol = jnp.asarray(mods, jnp.int32).reshape(-1, 1, 1)
                return jnp.where(2 * r >= pcol, r - pcol, r).astype(jnp.int16)
            return fp8._reassemble(c3.astype(jnp.int32),
                                   num_moduli).astype(jnp.int16)
    else:
        chunked = k_eff > K_CHUNK
        # raw residue_matmul is int32-exact only to K_CHUNK; the chunked
        # accumulator keeps the returned C correct for any k (the matmul
        # phase then includes the per-chunk [0,p) wraps, like production)
        mm = jax.jit(functools.partial(_chunked_residue_acc,
                                       num_moduli=num_moduli,
                                       backend=backend)) if chunked \
            else jax.jit(residue_matmul)
        mr = jax.jit(functools.partial(mod_reduce, num_moduli=num_moduli,
                                       backend=backend))

    @jax.jit
    def ci(c_mid, sft_a, sft_b):
        return reconstruct_scale(c_mid, sft_a, sft_b, num_moduli, backend,
                                 a.dtype, epilogue)

    # Timing is anchored on a device->host scalar fetch: on tunneled PJRT
    # transports block_until_ready() returns at dispatch-ack, so each phase is
    # forced by fetching a tiny reduction of its output; the measured dispatch
    # ping is subtracted from every phase.
    def force(x):
        leaves = jax.tree_util.tree_leaves(x)
        for leaf in leaves:
            np.asarray(jnp.sum(leaf.astype(jnp.float32)))
        return x

    @jax.jit
    def _ping(x):
        return jnp.sum(x[:2, :2])
    np.asarray(_ping(a))
    t0 = time.perf_counter()
    np.asarray(_ping(a))
    ping = time.perf_counter() - t0

    # warmup/compile
    pa, sa, pb, sb = force(q(a, b))
    c_hi = force(mm(pa, pb))
    c_mid = force(mr(c_hi))
    out = force(ci(c_mid, sa, sb))

    times = dict.fromkeys(("quantize", "matmul", "mod_reduce", "crt_inverse"), 0.0)
    for _ in range(iters):
        t0 = time.perf_counter()
        pa, sa, pb, sb = force(q(a, b))
        t1 = time.perf_counter()
        c_hi = force(mm(pa, pb))
        t2 = time.perf_counter()
        c_mid = force(mr(c_hi))
        t3 = time.perf_counter()
        out = force(ci(c_mid, sa, sb))
        t4 = time.perf_counter()
        times["quantize"] += max(t1 - t0 - 4 * ping, 0.0)
        times["matmul"] += max(t2 - t1 - ping, 0.0)
        times["mod_reduce"] += max(t3 - t2 - ping, 0.0)
        times["crt_inverse"] += max(t4 - t3 - ping, 0.0)
    return out, {k: v / iters for k, v in times.items()}


# ---------------------------------------------------------------------------
# precomputed operands: the skip-scal analog
# ---------------------------------------------------------------------------

class QuantizedOperand:
    """Precomputed residue planes + shifts for one operand; reuse across many
    GEMMs with the other side varying. JAX-native analog of the reference's
    enable_skip_scal / workA/workB reuse and the hook's pointer-identity
    skip-cache (reference: README.md:216-256, hook.cu:87-107).

    A pytree: flows through jit/vmap boundaries."""

    def __init__(self, planes, sft, side, num_moduli, fastmode, backend,
                 dims=None):
        self.planes = planes          # (nu, m, k) or (nu, k, n) int8
        self.sft = sft                # int32 shifts
        self.side = side              # "A" (row-scaled) or "B" (col-scaled)
        self.num_moduli = num_moduli
        self.fastmode = fastmode
        self.backend = backend
        self.dims = dims              # original (pre-pad128) operand shape

    def tree_flatten(self):
        return (self.planes, self.sft), (self.side, self.num_moduli,
                                         self.fastmode, self.backend,
                                         self.dims)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    QuantizedOperand, QuantizedOperand.tree_flatten, QuantizedOperand.tree_unflatten)


def precompute(x: jax.Array, side: str, *, num_moduli: int = 8,
               backend: str = tables.Backend.INT8) -> QuantizedOperand:
    """Quantize one operand once (fast-mode shifts) for reuse. side="A" scales
    rows of an (m, k) operand; side="B" scales columns of a (k, n) operand.

    On accelerators the operand is zero-padded to multiples of 128 like
    emulate_matmul (zero rows/cols encode to zero planes with sft=0 --
    exactness-preserving), so gemm_quantized keeps the fused Pallas
    encode/epilogue path; gemm_quantized slices the output back."""
    dims = tuple(x.shape)
    if jax.default_backend() != "cpu":
        x = _pad128(x, (0, 1))
    scale_axis = 0 if side == "A" else 1
    sft = quantize.shift_fast(x, num_moduli, backend, reduce_axis=1 - scale_axis)
    planes = quantize.encode_planes(x, sft, scale_axis, num_moduli, backend)
    return QuantizedOperand(planes, sft, side, num_moduli, True, backend,
                            dims=dims)


@functools.partial(jax.jit, static_argnames=(
    "num_moduli", "backend", "out_dtype", "epilogue"))
def _gemm_q(pa, sa, pb, sb, *, num_moduli, backend, out_dtype, epilogue):
    return _emulated_product(pa, sa, pb, sb, num_moduli, backend,
                             jnp.dtype(out_dtype), epilogue)


def gemm_quantized(qa, qb, out_dtype=jnp.float64,
                   epilogue: str = "auto") -> jax.Array:
    """GEMM from precomputed operands; either side may instead be a raw
    array, which is quantized on the fly (fast-mode shifts) -- the analog of
    the reference's one-sided skip_scalA / skip_scalB reuse
    (gemmul8_real.hpp:123-139, README.md:216-256).

    qa: QuantizedOperand(side="A") or a raw (m, k) array.
    qb: QuantizedOperand(side="B") or a raw (k, n) array.
    """
    if not isinstance(qa, QuantizedOperand) and not isinstance(qb, QuantizedOperand):
        raise TypeError("at least one side must be a precomputed "
                        "QuantizedOperand; use gemm() otherwise")
    ref = qa if isinstance(qa, QuantizedOperand) else qb
    if not isinstance(qa, QuantizedOperand):
        qa = precompute(qa, "A", num_moduli=ref.num_moduli, backend=ref.backend)
    if not isinstance(qb, QuantizedOperand):
        qb = precompute(qb, "B", num_moduli=ref.num_moduli, backend=ref.backend)
    assert qa.side == "A" and qb.side == "B"
    assert qa.num_moduli == qb.num_moduli and qa.backend == qb.backend
    out = _gemm_q(qa.planes, qa.sft, qb.planes, qb.sft,
                  num_moduli=qa.num_moduli, backend=qa.backend,
                  out_dtype=jnp.dtype(out_dtype).name, epilogue=epilogue)
    m = qa.dims[0] if qa.dims is not None else out.shape[0]
    n = qb.dims[1] if qb.dims is not None else out.shape[1]
    if out.shape != (m, n):
        out = out[:m, :n]
    return out

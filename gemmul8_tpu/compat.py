"""Reference-signature compatibility layer (drop-in for gemmul8::gemm).

Mirrors the reference's public C++ surface — ``gemmul8::workSize``,
``gemmul8::gemm`` and ``gemmul8::gemmLt`` (reference:
include/gemmul8.hpp:19-94, src/gemmul8.cu:95-157) — with cuBLAS semantics:
column-major, ld-strided host buffers, explicit op chars, in-place C update,
and a returned 4-entry phase-time vector. Code written against the
reference's API maps argument-for-argument; see MIGRATION.md for the full
symbol table.

Semantics preserved from the reference:
  * A/B/C are column-major buffers with leading dimensions lda/ldb/ldc;
    1-D buffers are ld-strided exactly like cuBLAS device pointers, 2-D
    Fortran/C arrays are accepted as the stored (ld-free) matrices.
  * op in {"N", "T", "C"} per operand ("C" == conjugate-transpose; equal to
    "T" for real dtypes, as in cuBLAS).
  * C is updated IN PLACE (it must be a writable host numpy buffer) and the
    call returns the phase-time vector [scaling, low_prec_gemm,
    conv_hi2mid, inverse_scaling] like the reference's
    ``std::vector<double>`` (gemmul8_real.hpp:67-68). By default the vector
    is zeros — the reference's always-on timers force stream syncs in the
    production path, which this framework deliberately avoids; pass
    ``with_timing=True`` for real per-phase seconds (separately-timed
    unfused stages, see ``core.gemm_with_phases``).
  * ``gemm`` rejects the FP8 backend exactly like the reference's
    plain-cuBLAS entry (gemmul8.cu:136-139); ``gemmLt`` accepts INT8 + FP8.
  * skip_scal A/B reuse: a ``Handle`` carries the pointer-identity plane
    cache of the reference's hook/Info_t mechanism (hook.cu:87-107). Reuse
    requires fastmode=True and a real dtype (the precompute path); other
    configs fall back to fresh quantization — correct, just not faster.

Differences (by design — XLA owns memory and scheduling):
  * ``work``/``workA``/``workB`` are accepted and ignored; workSize reports
    this framework's planning estimate (``core.work_bytes``), not a byte
    contract the caller must honor.
  * No streams; dispatch order is XLA's. ``stream`` on gemmLt is ignored.
  * k ≤ 2^17 is NOT required here (residue-space K-chunking lifts it);
    workSize still validates m/n/k > 0 only.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import core, tables

OP_N, OP_T, OP_C = "N", "T", "C"
Backend = tables.Backend

_PHASE_KEYS = ("quantize", "matmul", "mod_reduce", "crt_inverse")


class Handle:
    """Analog of the cuBLAS handle: owns the skip-scal plane cache.

    The reference caches preprocessed planes per handle keyed on pointer
    identity + {num_moduli, k, dtype, fastmode, backend} + per-side
    {ptr, rows, ld, op} (hook.cu:87-107). Here the key is
    (id(buffer), shape, op, side, num_moduli, backend) — the same
    pointer-identity hazard applies: mutating a buffer in place and passing
    skip_scal=True reuses the STALE planes, exactly like the reference.
    """

    def __init__(self):
        self._cache = {}

    def clear(self):
        self._cache.clear()


_DEFAULT_HANDLE = Handle()


def create() -> Handle:
    """cublasCreate analog: a fresh handle with an empty skip-scal cache."""
    return Handle()


def destroy(handle: Handle) -> None:
    """cublasDestroy_v2 analog: drop the handle's cached planes
    (reference: hook.cu:376-462 frees per-handle state)."""
    if handle is not None:
        handle.clear()


def workSize(m: int, n: int, k: int, num_moduli: int,
             enable_skip_scalA: bool = False,
             enable_skip_scalB: bool = False, *,
             is_complex: bool = False,
             backend: str = Backend.INT8,
             return_split: bool = False):
    """Workspace planning estimate in bytes (gemmul8::workSize analog;
    reference: include/gemmul8.hpp:25-35, src/gemmul8_real.hpp:8-47).

    Returns an int, or (total, sizeA, sizeB) with ``return_split=True``
    (the reference's optional workSizeA/workSizeB output pointers).
    XLA owns allocation, so this is a job-sizing estimate, not a contract.
    """
    if min(m, n, k) <= 0:
        raise ValueError(f"m, n, k must be positive, got {(m, n, k)}")
    dtype = jnp.complex128 if is_complex else jnp.float64
    lo, hi = tables.VALID_RANGE[np.dtype(dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}]")
    lanes = 3 if is_complex else 1
    plane_b = 6 if backend == Backend.FP8 else 1
    a_planes = num_moduli * lanes * m * k * plane_b + 4 * m
    b_planes = num_moduli * lanes * k * n * plane_b + 4 * n
    total = core.work_bytes(m, n, k, num_moduli, dtype=dtype, backend=backend)
    # the reference reserves one extra plane set per skip-enabled side in
    # accurate mode (gemmul8_real.hpp:28-29); mirror that headroom
    total += (a_planes if enable_skip_scalA else 0)
    total += (b_planes if enable_skip_scalB else 0)
    if return_split:
        return total, a_planes, b_planes
    return total


def _as_logical(buf, ld: int, rows: int, cols: int, name: str) -> np.ndarray:
    """Materialize the logical (rows, cols) matrix from a column-major
    ld-strided buffer (cuBLAS convention: element (i,j) at buf[j*ld+i]),
    or from a 2-D array storing the matrix directly."""
    arr = np.asarray(buf)
    if arr.ndim == 2:
        if arr.shape != (rows, cols):
            raise ValueError(
                f"{name}: 2-D buffer must be the stored ({rows}, {cols}) "
                f"matrix, got {arr.shape}")
        return arr
    if arr.ndim != 1:
        raise ValueError(f"{name}: expected a 1-D ld-strided or 2-D buffer, "
                         f"got ndim={arr.ndim}")
    if ld < rows:
        raise ValueError(f"{name}: ld={ld} < number of stored rows {rows}")
    if arr.size < ld * cols:
        raise ValueError(f"{name}: buffer holds {arr.size} elements, "
                         f"ld*cols needs {ld * cols}")
    return arr[:ld * cols].reshape(cols, ld).T[:rows]


def _x64_guard(dtype):
    if (np.dtype(dtype) in (np.float64, np.complex128)
            and not jax.config.jax_enable_x64):
        raise RuntimeError(
            "float64/complex128 compat calls need jax_enable_x64=True "
            "(otherwise jnp.asarray silently truncates to f32); run "
            "jax.config.update('jax_enable_x64', True) first")


def _scalar(x, dtype):
    a = np.asarray(x)
    if a.size != 1:
        raise ValueError(f"alpha/beta must be scalar, got shape {a.shape}")
    return complex(a.reshape(())) if np.iscomplexobj(np.zeros((), dtype)) \
        else float(a.reshape(()).real)


def _trivial(x, value) -> bool:
    return isinstance(x, (int, float, complex)) and x == value


def _cached_quantized(handle, buf, logical, op, side, num_moduli, backend,
                      enable_skip, skip):
    """Reference skip-scal semantics: on skip=True reuse the cached planes
    for this (pointer, shape, op, config); on enable=True refresh the cache
    after quantizing (hook.cu:87-107, 687-728)."""
    key = (id(buf), logical.shape, op, side, num_moduli, backend)
    if skip and key in handle._cache:
        return handle._cache[key]
    # side="A" expects (m, k) row-scaled; side="B" (k, n) col-scaled.
    mat = jnp.asarray(logical)
    if op != OP_N:
        mat = mat.T
    q = core.precompute(mat, side, num_moduli=num_moduli, backend=backend)
    if enable_skip or skip:
        handle._cache[key] = q
    return q


def gemm(handle, op_A: str, op_B: str, m: int, n: int, k: int,
         alpha, A, lda: int, B, ldb: int, beta, C, ldc: int,
         num_moduli: int, fastmode: bool,
         work=None, workA=None, workB=None,
         enable_skip_scalA: bool = False, enable_skip_scalB: bool = False,
         skip_scalA: bool = False, skip_scalB: bool = False, *,
         backend: str = Backend.INT8, with_timing: bool = False):
    """gemmul8::gemm analog (reference: include/gemmul8.hpp:41-67):
    C = alpha * op(A) @ op(B) + beta * C, C updated IN PLACE.

    C must be a writable numpy buffer (1-D ld-strided column-major or the
    2-D (m, n) stored matrix). Returns the 4-phase time vector
    [scaling, low_prec_gemm, conv_hi2mid, inverse_scaling] in seconds
    (zeros unless with_timing=True — see module docstring).
    """
    if backend == Backend.FP8:
        # the reference's plain-cuBLAS entry cannot drive FP8 tensor cores
        # (gemmul8.cu:136-139); keep the same contract so misroutes surface
        raise ValueError("gemm does not support the FP8 backend "
                         "(reference parity: FP8 requires the Lt entry); "
                         "use gemmLt(..., backend='FP8')")
    return _gemm_impl(handle, op_A, op_B, m, n, k, alpha, A, lda, B, ldb,
                      beta, C, ldc, num_moduli, fastmode, backend,
                      enable_skip_scalA, enable_skip_scalB,
                      skip_scalA, skip_scalB, with_timing)


def gemmLt(handle, op_A: str, op_B: str, m: int, n: int, k: int,
           alpha, A, lda: int, B, ldb: int, beta, C, ldc: int,
           num_moduli: int, fastmode: bool,
           work=None, workA=None, workB=None,
           enable_skip_scalA: bool = False, enable_skip_scalB: bool = False,
           skip_scalA: bool = False, skip_scalB: bool = False,
           stream=None, *, backend: str = Backend.INT8,
           with_timing: bool = False):
    """gemmul8::gemmLt analog (include/gemmul8.hpp:69-94): identical to
    gemm() but accepts both backends (INT8 and FP8), like the cuBLASLt
    entry. ``stream`` is accepted and ignored (XLA schedules)."""
    return _gemm_impl(handle, op_A, op_B, m, n, k, alpha, A, lda, B, ldb,
                      beta, C, ldc, num_moduli, fastmode, backend,
                      enable_skip_scalA, enable_skip_scalB,
                      skip_scalA, skip_scalB, with_timing)


def _gemm_impl(handle, op_A, op_B, m, n, k, alpha, A, lda, B, ldb, beta,
               C, ldc, num_moduli, fastmode, backend,
               enable_skip_scalA, enable_skip_scalB, skip_scalA, skip_scalB,
               with_timing):
    if handle is None:
        handle = _DEFAULT_HANDLE
    op_A, op_B = str(op_A).upper(), str(op_B).upper()
    if op_A not in "NTC" or op_B not in "NTC":
        raise ValueError(f"ops must be 'N'/'T'/'C', got {op_A!r}, {op_B!r}")
    c_arr = np.asarray(C)
    if not isinstance(C, np.ndarray) or not C.flags.writeable:
        raise TypeError(
            "C must be a writable numpy buffer (the reference updates C in "
            "place; JAX arrays are immutable — use gemmul8_tpu.gemm for the "
            "functional API)")
    dtype = c_arr.dtype
    _x64_guard(dtype)
    is_cplx = np.issubdtype(dtype, np.complexfloating)
    lo, hi = tables.VALID_RANGE[np.dtype(dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(
            f"num_moduli={num_moduli} out of [{lo},{hi}] for {dtype}")

    # stored shapes per cuBLAS column-major convention
    a_rows, a_cols = (m, k) if op_A == OP_N else (k, m)
    b_rows, b_cols = (k, n) if op_B == OP_N else (n, k)
    a_log = _as_logical(A, lda, a_rows, a_cols, "A").astype(dtype, copy=False)
    b_log = _as_logical(B, ldb, b_rows, b_cols, "B").astype(dtype, copy=False)
    c_log = _as_logical(C, ldc, m, n, "C")

    alpha_s = _scalar(alpha, dtype)
    beta_s = _scalar(beta, dtype)

    times = [0.0, 0.0, 0.0, 0.0]
    want_skip = ((skip_scalA or skip_scalB or enable_skip_scalA
                  or enable_skip_scalB)
                 and fastmode and not is_cplx and not with_timing)
    if want_skip:
        qa = _cached_quantized(handle, A, a_log, op_A, "A", num_moduli,
                               backend, enable_skip_scalA, skip_scalA)
        qb = _cached_quantized(handle, B, b_log, op_B, "B", num_moduli,
                               backend, enable_skip_scalB, skip_scalB)
        ab = core.gemm_quantized(qa, qb, out_dtype=dtype)
        out = ab if _trivial(alpha_s, 1) else jnp.asarray(alpha_s,
                                                          dtype) * ab
        if not _trivial(beta_s, 0):
            out = out + jnp.asarray(beta_s, dtype) * jnp.asarray(c_log)
    elif with_timing and not is_cplx and _trivial(alpha_s, 1) \
            and _trivial(beta_s, 0) and op_A == OP_N and op_B == OP_N:
        out, phases = core.gemm_with_phases(
            jnp.asarray(a_log), jnp.asarray(b_log), num_moduli=num_moduli,
            fastmode=fastmode, backend=backend)
        times = [float(phases[p]) for p in _PHASE_KEYS]
    else:
        if with_timing:
            raise ValueError(
                "with_timing=True supports the op_N/op_N, alpha=1, beta=0 "
                "real path (core.gemm_with_phases); time other configs "
                "with benchmarks/flops.py")
        out = core.gemm(jnp.asarray(a_log), jnp.asarray(b_log),
                        num_moduli=num_moduli, fastmode=fastmode,
                        backend=backend, alpha=alpha_s, beta=beta_s,
                        c=(jnp.asarray(np.ascontiguousarray(c_log))
                           if not _trivial(beta_s, 0) else None),
                        trans_a=(op_A if op_A != OP_N else False),
                        trans_b=(op_B if op_B != OP_N else False))
    np.copyto(c_log, np.asarray(out))  # writes through the ld-strided view
    return times

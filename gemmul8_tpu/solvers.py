"""Triangular solves and LU factorization over the emulated GEMM.

Capability layer beyond the reference (RIKEN-RCCS/GEMMul8 is GEMM-only;
its README positions the library as the building block for exactly this
kind of mixed-precision dense linear algebra). Every O(n^3) flop here --
the trailing-matrix Schur updates in LU and the off-diagonal update GEMMs
in the blocked substitutions -- runs on the int8 MXU through
:func:`gemmul8_tpu.gemm`; only the O(n * block^2) diagonal-block work uses
the native (f64 = f32-pair on TPU) path.

Algorithms are the textbook blocked ones (right-looking LU, blocked
forward/backward substitution), organized for XLA: static shapes per step,
Python-level block loops unrolled at trace time, all heavy ops batched
MXU-friendly GEMMs. Upper-triangular cases are reduced to the lower case by
the exact reversal-permutation trick (flip rows/cols), so there is ONE
substitution code path.

Numerical contract: with num_moduli at the dtype's f64/f32-equivalent
setting, results match a full-precision blocked solver to the emulator's
accuracy; all paths are bit-reproducible for fixed shapes/config like gemm.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .core import gemm

__all__ = ["trsm", "trmm", "getrf", "lu_solve", "solve"]


def _check_real_2d(x, name):
    if x.ndim != 2:
        raise ValueError(f"{name} must be 2-D, got ndim={x.ndim}")
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise NotImplementedError("solvers are real-only (f32/f64)")


def _blocks(n: int, block: int):
    """Static block partition [0, b, 2b, ..., n] (last block ragged)."""
    cuts = list(range(0, n, block)) + [n]
    return list(zip(cuts[:-1], cuts[1:]))


def _default_block(n: int) -> int:
    # large enough that the update GEMMs dominate, small enough that the
    # native diagonal solves stay O(n * block^2) noise
    return max(32, min(512, n))


def _tri_solve_native(t, rhs, *, unit_diag: bool):
    """Native lower-triangular solve of the small diagonal block.

    tril() makes the contract explicit when t is a packed-LU block whose
    upper triangle holds U values (getrf/lu_solve pass those in).
    """
    return jax.lax.linalg.triangular_solve(
        jnp.tril(t), rhs, left_side=True, lower=True, transpose_a=False,
        unit_diagonal=unit_diag)


def _trsm_lower_left(t, b, *, unit_diag, num_moduli, fastmode, backend,
                     block):
    """X with T @ X = B, T lower-triangular (m, m), B (m, n).

    Blocked forward substitution: the diagonal solves are native, the
    off-diagonal update B_i -= T[i,:i] @ X[:i] is ONE emulated GEMM per
    block row (alpha=-1, beta=1 fused epilogue).
    """
    m = t.shape[0]
    spans = _blocks(m, block)
    xs = []
    for (lo, hi) in spans:
        rhs = b[lo:hi]
        if lo > 0:
            x_prev = jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
            rhs = gemm(t[lo:hi, :lo], x_prev, num_moduli=num_moduli,
                       fastmode=fastmode, backend=backend,
                       alpha=-1.0, beta=1.0, c=rhs)
        xs.append(_tri_solve_native(t[lo:hi, lo:hi], rhs,
                                    unit_diag=unit_diag))
    return jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]


def _trmm_lower_left(t, b, *, unit_diag, num_moduli, fastmode, backend,
                     block):
    """T @ B with T lower-triangular: per block row, one emulated GEMM over
    the strictly-lower panel plus a native small triangular product --
    half the MXU flops of a dense masked GEMM."""
    m = t.shape[0]
    spans = _blocks(m, block)
    out = []
    for (lo, hi) in spans:
        tdiag = jnp.tril(t[lo:hi, lo:hi])
        if unit_diag:
            tdiag = tdiag - jnp.diag(jnp.diag(tdiag)) + jnp.eye(
                hi - lo, dtype=t.dtype)
        row = tdiag @ b[lo:hi]
        if lo > 0:
            row = gemm(t[lo:hi, :lo], b[:lo], num_moduli=num_moduli,
                       fastmode=fastmode, backend=backend,
                       alpha=1.0, beta=1.0, c=row)
        out.append(row)
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _canon_tri(a, lower, trans_a):
    """Materialize op(A) and report whether it is lower-triangular."""
    trans_a = trans_a if isinstance(trans_a, bool) else (
        str(trans_a).upper() in ("T", "C"))
    t = a.T if trans_a else a
    return t, (lower != trans_a)


def _flip2(x):
    return jnp.flip(jnp.flip(x, 0), 1)


def trsm(a: jax.Array, b: jax.Array, *, side: str = "left",
         lower: bool = True, trans_a=False, unit_diag: bool = False,
         alpha=1.0, num_moduli: int = 8, fastmode=True,
         backend: str = tables.Backend.INT8,
         block: Optional[int] = None) -> jax.Array:
    """Triangular solve with the O(n^3) updates on the int8 MXU.

    side="left":  solve op(A) @ X = alpha * B   (A is (m, m), B is (m, n))
    side="right": solve X @ op(A) = alpha * B   (A is (n, n), B is (m, n))

    BLAS-trsm surface (cublasDtrsm analog); `num_moduli`/`fastmode`/`backend`
    dial the update GEMMs exactly like :func:`gemmul8_tpu.gemm`. The
    diagonal blocks (`block` wide, default <=512) solve natively; everything
    else is blocked substitution whose updates are emulated GEMMs.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    _check_real_2d(a, "A")
    _check_real_2d(b, "B")
    if a.dtype != b.dtype:
        raise TypeError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"A must be square, got {a.shape}")
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    nd = b.shape[0] if side == "left" else b.shape[1]
    if a.shape[0] != nd:
        raise ValueError(f"A {a.shape} does not match B {b.shape} "
                         f"for side={side!r}")
    if not (isinstance(alpha, (int, float)) and alpha == 1):
        b = jnp.asarray(alpha).astype(b.dtype) * b
    t, is_lower = _canon_tri(a, bool(lower), trans_a)
    if side == "right":
        # X @ T = B  <=>  T' @ X' = B'
        t, b, is_lower = t.T, b.T, not is_lower
    if not is_lower:
        # reversal trick: P @ U @ P is lower for the exchange permutation P;
        # flips are exact, so this costs two copies and zero accuracy
        t, b = _flip2(t), jnp.flip(b, 0)
    blk = block or _default_block(t.shape[0])
    x = _trsm_lower_left(t, b, unit_diag=unit_diag, num_moduli=num_moduli,
                         fastmode=fastmode, backend=backend, block=blk)
    if not is_lower:
        x = jnp.flip(x, 0)
    return x.T if side == "right" else x


def trmm(a: jax.Array, b: jax.Array, *, side: str = "left",
         lower: bool = True, trans_a=False, unit_diag: bool = False,
         alpha=1.0, num_moduli: int = 8, fastmode=True,
         backend: str = tables.Backend.INT8,
         block: Optional[int] = None) -> jax.Array:
    """Triangular matrix product alpha * op(A) @ B (or B @ op(A)).

    Exploits the triangular structure: each block row multiplies only its
    strictly-lower panel through the emulated GEMM (half the MXU work of
    gemm with a masked A) plus a native small diagonal product.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    _check_real_2d(a, "A")
    _check_real_2d(b, "B")
    if a.dtype != b.dtype:
        raise TypeError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"A must be square, got {a.shape}")
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    nd = b.shape[0] if side == "left" else b.shape[1]
    if a.shape[0] != nd:
        raise ValueError(f"A {a.shape} does not match B {b.shape} "
                         f"for side={side!r}")
    t, is_lower = _canon_tri(a, bool(lower), trans_a)
    if side == "right":
        t, b, is_lower = t.T, b.T, not is_lower
    if not is_lower:
        t, b = _flip2(t), jnp.flip(b, 0)
    blk = block or _default_block(t.shape[0])
    out = _trmm_lower_left(t, b, unit_diag=unit_diag, num_moduli=num_moduli,
                           fastmode=fastmode, backend=backend, block=blk)
    if not is_lower:
        out = jnp.flip(out, 0)
    if side == "right":
        out = out.T
    if not (isinstance(alpha, (int, float)) and alpha == 1):
        out = jnp.asarray(alpha).astype(out.dtype) * out
    return out


def getrf(a: jax.Array, *, num_moduli: int = 8, fastmode=True,
          backend: str = tables.Backend.INT8,
          block: Optional[int] = None):
    """Blocked right-looking LU with partial pivoting, PA = LU.

    Returns (lu, perm): `lu` packs L (unit lower) and U like LAPACK dgetrf;
    `perm` is the length-m int32 row permutation as absolute row indices
    (jax.lax.linalg.lu convention: (PA)[i] == A[perm[i]], so
    lu_solve permutes b with b.take(perm)).

    The panel factorizations (m_rem x block) run natively; the U12 row
    solves and every trailing Schur update A22 -= L21 @ U12 -- the O(n^3)
    bulk -- run through the emulated GEMM. This is the HPL-MxP-style
    mixed-precision LU mapped onto the int8 MXU.
    """
    a = jnp.asarray(a)
    _check_real_2d(a, "A")
    m, n = a.shape
    kmin = min(m, n)
    blk = block or _default_block(kmin)
    # absolute permutation carried as perm[i] = original row index now at i
    perm = jnp.arange(m, dtype=jnp.int32)
    for lo in range(0, kmin, blk):
        hi = min(lo + blk, kmin)
        # native pivoted LU of the current panel (rows lo:m, cols lo:hi)
        panel = a[lo:, lo:hi]
        p_lu, _, p_perm = jax.lax.linalg.lu(panel)
        # apply the panel's row permutation to the WHOLE trailing rows
        # (already-factored L columns < lo AND unfactored columns >= hi),
        # then drop the factored panel in
        rows = a[lo:].take(p_perm, axis=0).at[:, lo:hi].set(p_lu)
        a = a.at[lo:].set(rows)
        perm = perm.at[lo:].set(perm[lo:].take(p_perm))
        if hi < n:
            # U12 = L11^{-1} A12 : unit-lower solve; emulated update GEMMs
            u12 = _trsm_lower_left(
                a[lo:hi, lo:hi], a[lo:hi, hi:], unit_diag=True,
                num_moduli=num_moduli, fastmode=fastmode, backend=backend,
                block=blk)
            a = a.at[lo:hi, hi:].set(u12)
            if hi < m:
                # Schur: A22 -= L21 @ U12 (the emulated O(n^3) bulk)
                upd = gemm(a[hi:, lo:hi], u12, num_moduli=num_moduli,
                           fastmode=fastmode, backend=backend,
                           alpha=-1.0, beta=1.0, c=a[hi:, hi:])
                a = a.at[hi:, hi:].set(upd)
    return a, perm


def lu_solve(lu: jax.Array, perm: jax.Array, b: jax.Array, *,
             num_moduli: int = 8, fastmode=True,
             backend: str = tables.Backend.INT8,
             block: Optional[int] = None) -> jax.Array:
    """Solve A @ X = B from getrf's (lu, perm): permute, then two trsm."""
    lu = jnp.asarray(lu)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    pb = b.take(jnp.asarray(perm), axis=0)
    y = trsm(lu, pb, lower=True, unit_diag=True, num_moduli=num_moduli,
             fastmode=fastmode, backend=backend, block=block)
    x = trsm(lu, y, lower=False, unit_diag=False, num_moduli=num_moduli,
             fastmode=fastmode, backend=backend, block=block)
    return x[:, 0] if squeeze else x


def solve(a: jax.Array, b: jax.Array, *, num_moduli: int = 8, fastmode=True,
          backend: str = tables.Backend.INT8, block: Optional[int] = None,
          refine_steps: int = 0,
          residual_moduli: Optional[int] = None) -> jax.Array:
    """Dense solve A @ X = B via emulated-GEMM LU, with optional iterative
    refinement -- the end-to-end mixed-precision-solver story of the
    Ozaki-scheme literature: a CHEAP factorization (low num_moduli) plus
    residuals computed at HIGH emulated accuracy recover a full-precision
    solution.

    `residual_moduli` sets the accuracy of the refinement residual GEMMs;
    IR converges only if the residual is computed more accurately than the
    factorization, so it defaults to the dtype's native-precision setting
    from :func:`choose_moduli` (never below num_moduli).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if refine_steps and residual_moduli is None:
        from .accuracy_model import choose_moduli
        residual_moduli = max(num_moduli, choose_moduli(dtype=a.dtype))
    lu, perm = getrf(a, num_moduli=num_moduli, fastmode=fastmode,
                     backend=backend, block=block)
    x = lu_solve(lu, perm, b, num_moduli=num_moduli, fastmode=fastmode,
                 backend=backend, block=block)
    for _ in range(refine_steps):
        bx = x[:, None] if x.ndim == 1 else x
        bb = b[:, None] if b.ndim == 1 else b
        r = gemm(a, bx, num_moduli=residual_moduli, fastmode=fastmode,
                 backend=backend, alpha=-1.0, beta=1.0, c=bb)
        if x.ndim == 1:
            r = r[:, 0]
        x = x + lu_solve(lu, perm, r, num_moduli=num_moduli,
                         fastmode=fastmode, backend=backend, block=block)
    return x

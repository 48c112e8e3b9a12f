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

fastmode defaults to "robust" here (NOT the reference fast formula that
gemm defaults to): factorization updates are Gram-type products
(L @ L.T in potrf; Schur complements correlate as the factorization
proceeds) that hit the Cauchy-Schwarz bound with EQUALITY, where the
reference formula's probabilistic slack can silently wrap the CRT at
specific num_moduli (measured: a Cholesky-factor Gram product at nu=14
wraps |C| to 1.4x P/2 -> rel err 0.28). The "robust" scale-invariant
shifts bound |C| <= P/16 rigorously at any scale (NUMERICS.md par.3b) at
identical speed. Pass fastmode=True to get reference-parity shifts.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .core import gemm

__all__ = ["trsm", "trmm", "getrf", "lu_solve", "solve", "potrf", "potrs",
           "posv", "inv", "trtri"]


def _check_2d(x, name):
    """Complex-capable entries (the skeletons are dtype-generic: every
    O(n^3) update routes through gemm, which dispatches the 3M complex
    pipeline). On accelerators whose runtimes lack complex dtypes (the
    tested v5e PJRT stack) complex solvers run on CPU; the planar entry
    points cover on-device complex GEMM itself."""
    if x.ndim != 2:
        raise ValueError(f"{name} must be 2-D, got ndim={x.ndim}")


def _blocks(n: int, block: int):
    """Static block partition [0, b, 2b, ..., n] (last block ragged)."""
    cuts = list(range(0, n, block)) + [n]
    return list(zip(cuts[:-1], cuts[1:]))


def _default_block(n: int) -> int:
    # large enough that the update GEMMs dominate, small enough that the
    # native diagonal solves stay O(n * block^2) noise
    return max(32, min(512, n))


def _check_mesh_blocking(mesh, n_or_shape, blk, name, rhs_cols=None):
    """Distributed updates route through SUMMA, which shards every GEMM dim
    over the mesh: block and every block boundary must divide both mesh
    axes (and the RHS column count must divide mesh.y, for the substitution
    updates whose n dimension is the RHS width). Enforced upfront so
    failures name the constraint, not a shape."""
    if mesh is None:
        return
    mx, my = mesh.devices.shape
    dims = (n_or_shape,) if isinstance(n_or_shape, int) else tuple(n_or_shape)
    bad = blk % mx or blk % my or any(d % blk for d in dims)
    if bad:
        raise ValueError(
            f"{name} with mesh {mx}x{my} needs block divisible by both mesh "
            f"axes and dims divisible by block; got block={blk}, dims={dims}")
    if rhs_cols is not None and rhs_cols % my:
        raise ValueError(
            f"{name} with mesh {mx}x{my} needs the RHS column count "
            f"divisible by mesh.y; got {rhs_cols}")


def _dist_gemm(a_blk, b_blk, *, mesh, num_moduli, fastmode, backend):
    """Plain emulated product a_blk @ b_blk, distributed through SUMMA when
    `mesh` is given -- the one local/distributed dispatch point shared by
    the solver and QR layers."""
    if mesh is None:
        return gemm(a_blk, b_blk, num_moduli=num_moduli, fastmode=fastmode,
                    backend=backend)
    from .parallel import summa_gemm
    return summa_gemm(a_blk, b_blk, mesh=mesh, num_moduli=num_moduli,
                      fastmode=fastmode, backend=backend)


def _schur_update(a_blk, b_blk, c_blk, *, mesh, num_moduli, fastmode,
                  backend, sign=-1.0):
    """c_blk + sign * a_blk @ b_blk, emulated; distributed over `mesh` when
    given (sign=-1: Schur complement / substitution update; +1: trmm row
    accumulation).

    The SUMMA product is bit-identical ACROSS MESH SHAPES (order-free
    shift/reduction design, tests/test_parallel.py) and the trailing
    subtraction is elementwise, so the factorization is bit-reproducible
    across mesh shapes. It is NOT bit-identical to the mesh=None path:
    local updates use gemm's fused alpha=-1/beta=1 epilogue while SUMMA's
    distributed shift computation rounds the last bit differently (same
    quality class -- tests/test_parallel.py:30-33).
    """
    if mesh is None:
        return gemm(a_blk, b_blk, num_moduli=num_moduli, fastmode=fastmode,
                    backend=backend, alpha=sign, beta=1.0, c=c_blk)
    prod = _dist_gemm(a_blk, b_blk, mesh=mesh, num_moduli=num_moduli,
                      fastmode=fastmode, backend=backend)
    return c_blk - prod if sign == -1.0 else c_blk + prod


def _tri_solve_native(t, rhs, *, unit_diag: bool):
    """Native lower-triangular solve of the small diagonal block.

    tril() makes the contract explicit when t is a packed-LU block whose
    upper triangle holds U values (getrf/lu_solve pass those in).
    """
    return jax.lax.linalg.triangular_solve(
        jnp.tril(t), rhs, left_side=True, lower=True, transpose_a=False,
        unit_diagonal=unit_diag)


def _trsm_lower_left(t, b, *, unit_diag, num_moduli, fastmode, backend,
                     block, mesh=None):
    """X with T @ X = B, T lower-triangular (m, m), B (m, n).

    Blocked forward substitution: the diagonal solves are native, the
    off-diagonal update B_i -= T[i,:i] @ X[:i] is ONE emulated GEMM per
    block row (alpha=-1, beta=1 fused epilogue; distributed through SUMMA
    when `mesh` is given).
    """
    m = t.shape[0]
    spans = _blocks(m, block)
    xs = []
    for (lo, hi) in spans:
        rhs = b[lo:hi]
        if lo > 0:
            x_prev = jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
            rhs = _schur_update(t[lo:hi, :lo], x_prev, rhs, mesh=mesh,
                                num_moduli=num_moduli, fastmode=fastmode,
                                backend=backend)
        xs.append(_tri_solve_native(t[lo:hi, lo:hi], rhs,
                                    unit_diag=unit_diag))
    return jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]


def _trmm_lower_left(t, b, *, unit_diag, num_moduli, fastmode, backend,
                     block, mesh=None):
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
            row = _schur_update(t[lo:hi, :lo], b[:lo], row, mesh=mesh,
                                num_moduli=num_moduli, fastmode=fastmode,
                                backend=backend, sign=1.0)
        out.append(row)
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _panel_lu(a, num_moduli, fastmode, backend):
    """Pivoted LU of an (m, b) panel, m >= b.

    Uses the native LuDecomposition where the backend implements the dtype
    (CPU: all dtypes; TPU: f32/c64 only -- the tested stack aborts compiles
    with 'Only F32 and C64 types are implemented in LuDecomposition' for
    f64). Otherwise `_panel_lu_tpu`: pivot ORDER from the hardware f32 LU,
    unpivoted block recursion in full precision."""
    if jax.default_backend() == "cpu" or a.dtype == jnp.float32:
        lu_, _, perm = jax.lax.linalg.lu(a)
        return lu_, perm
    return _panel_lu_tpu(a, num_moduli, fastmode, backend)


def _panel_lu_tpu(a, num_moduli, fastmode, backend):
    """Panel LU for backends without the dtype's native LuDecomposition.

    Phase 1: the PIVOT ORDER comes from the native f32 (c64 for complex)
    LU. Pivot quality is f32-grade: where the f32 and full-precision
    trailing updates diverge (cancellation-heavy entries), the chosen pivot
    can be modestly smaller than the true column max -- measured
    |L|_max ~ 1.4 on random 320x160 panels, i.e. THRESHOLD-pivoting-grade
    stability rather than strict partial pivoting (the growth is monitored
    by the factorization-residual tests, and solve() layers iterative
    refinement on top). Deterministic for fixed input. Phase 2: unpivoted
    right-looking block recursion on the permuted panel in FULL precision
    -- native triangular solves + ONE emulated GEMM per node, bottoming
    out in a b<=64 fori_loop on the SQUARE top block only plus one trsm
    for the rows below (the round-4 first cut ran the elimination loop
    over the whole m-row panel and dominated getrf 4096 at ~107 s on
    hardware).

    An exactly-singular pivot (a zero column in full precision) produces
    inf/nan like LAPACK's unpivoted routines; partial pivoting in phase 1
    makes that reachable only for structurally singular panels."""
    return _panel_lu_tpu_jitted(num_moduli, fastmode, backend)(a)


@functools.lru_cache(maxsize=None)
def _panel_lu_tpu_jitted(num_moduli, fastmode, backend):
    """One jitted program per (config) x (shape via jit's own cache).

    Eager execution of the panel recursion is pathological on the tunneled
    transport: each eager primitive dispatch costs ~100-150 ms of transport
    round-trip, and the recursion's 8 unjitted base cases per 512-wide
    panel measured ~1 s EACH (tools/probe_getrf_phases.py: recursion
    7.8 s/panel eager while every component jitted is ~10 ms -> getrf 4096
    at 73 s). Fusing the f32-pivot pass, the row gather, and the whole
    full-precision block recursion into one XLA program removes the
    per-primitive transport cost entirely."""

    def run(a):
        lp = (jnp.complex64 if jnp.issubdtype(a.dtype, jnp.complexfloating)
              else jnp.float32)
        _, _, perm = jax.lax.linalg.lu(a.astype(lp))
        ap = a.take(perm, axis=0)
        return _panel_lu_nopiv(ap, num_moduli, fastmode, backend), perm

    return jax.jit(run)


def _panel_lu_nopiv(a, num_moduli, fastmode, backend):
    m, b = a.shape
    if b <= 64:
        return _panel_lu_nopiv_base(a)
    b1 = b // 2
    lu1 = _panel_lu_nopiv(a[:, :b1], num_moduli, fastmode, backend)
    u12 = _tri_solve_native(lu1[:b1], a[:b1, b1:], unit_diag=True)
    a22 = _schur_update(lu1[b1:, :b1], u12, a[b1:, b1:], mesh=None,
                        num_moduli=num_moduli, fastmode=fastmode,
                        backend=backend)
    lu2 = _panel_lu_nopiv(a22, num_moduli, fastmode, backend)
    top = jnp.concatenate([lu1[:b1], u12], axis=1)
    bot = jnp.concatenate([lu1[b1:, :b1], lu2], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _panel_lu_nopiv_base(a):
    """Unpivoted LU of an (m, b) panel, b <= 64: a b-step masked fori_loop
    on the SQUARE top block (tiny), then L21 = A21 U11^{-1} as one native
    triangular solve for all remaining rows."""
    b = a.shape[1]
    a11 = a[:b]
    idx = jnp.arange(b)

    def body(j, x):
        piv = x[j, j]
        safe = jnp.where(piv == 0, jnp.ones_like(piv), piv)  # zero column
        below = idx > j
        l = jnp.where(below, x[:, j] / safe, jnp.zeros_like(x[:, j]))
        x = x.at[:, j].set(jnp.where(below, l, x[:, j]))
        urow = jnp.where(idx > j, x[j], jnp.zeros_like(x[j]))
        return x - l[:, None] * urow[None, :]

    lu11 = jax.lax.fori_loop(0, b, body, a11)
    if a.shape[0] == b:
        return lu11
    l21 = jax.lax.linalg.triangular_solve(
        jnp.triu(lu11), a[b:], left_side=False, lower=False)
    return jnp.concatenate([lu11, l21], axis=0)


def _canon_tri(a, lower, trans_a):
    """Materialize op(A) and report whether it is lower-triangular.
    op 'C' (conjugate transpose) conjugates complex operands; on real ones
    it is identical to 'T'."""
    if isinstance(trans_a, bool):
        t_flag, conj = trans_a, False
    else:
        s = str(trans_a).upper()
        if s not in ("N", "T", "C"):
            raise ValueError(f"bad op {trans_a!r}")
        t_flag, conj = s in ("T", "C"), s == "C"
    t = a.T if t_flag else a
    if conj and jnp.issubdtype(a.dtype, jnp.complexfloating):
        t = t.conj()
    return t, (lower != t_flag)


def _flip2(x):
    return jnp.flip(jnp.flip(x, 0), 1)


def trsm(a: jax.Array, b: jax.Array, *, side: str = "left",
         lower: bool = True, trans_a=False, unit_diag: bool = False,
         alpha=1.0, num_moduli: int = 8, fastmode="robust",
         backend: str = tables.Backend.INT8,
         block: Optional[int] = None, mesh=None) -> jax.Array:
    """Triangular solve with the O(n^3) updates on the int8 MXU.

    side="left":  solve op(A) @ X = alpha * B   (A is (m, m), B is (m, n))
    side="right": solve X @ op(A) = alpha * B   (A is (n, n), B is (m, n))

    BLAS-trsm surface (cublasDtrsm analog); `num_moduli`/`fastmode`/`backend`
    dial the update GEMMs exactly like :func:`gemmul8_tpu.gemm`. The
    diagonal blocks (`block` wide, default <=512) solve natively; everything
    else is blocked substitution whose updates are emulated GEMMs.

    With `mesh` (a 2-D jax.sharding.Mesh) the update GEMMs run distributed
    through :func:`summa_gemm`; results are bit-identical across mesh
    shapes (worthwhile when the RHS is wide -- the updates are
    O(m^2 * n_rhs); the native diagonal solves stay local).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    _check_2d(a, "A")
    _check_2d(b, "B")
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
    _check_mesh_blocking(mesh, t.shape[0], blk, "trsm", rhs_cols=b.shape[1])
    x = _trsm_lower_left(t, b, unit_diag=unit_diag, num_moduli=num_moduli,
                         fastmode=fastmode, backend=backend, block=blk,
                         mesh=mesh)
    if not is_lower:
        x = jnp.flip(x, 0)
    return x.T if side == "right" else x


def trmm(a: jax.Array, b: jax.Array, *, side: str = "left",
         lower: bool = True, trans_a=False, unit_diag: bool = False,
         alpha=1.0, num_moduli: int = 8, fastmode="robust",
         backend: str = tables.Backend.INT8,
         block: Optional[int] = None, mesh=None) -> jax.Array:
    """Triangular matrix product alpha * op(A) @ B (or B @ op(A)).

    Exploits the triangular structure: each block row multiplies only its
    strictly-lower panel through the emulated GEMM (half the MXU work of
    gemm with a masked A) plus a native small diagonal product. `mesh`
    distributes the panel GEMMs through :func:`summa_gemm` (see trsm).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    _check_2d(a, "A")
    _check_2d(b, "B")
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
    _check_mesh_blocking(mesh, t.shape[0], blk, "trmm", rhs_cols=b.shape[1])
    out = _trmm_lower_left(t, b, unit_diag=unit_diag, num_moduli=num_moduli,
                           fastmode=fastmode, backend=backend, block=blk,
                           mesh=mesh)
    if not is_lower:
        out = jnp.flip(out, 0)
    if side == "right":
        out = out.T
    if not (isinstance(alpha, (int, float)) and alpha == 1):
        out = jnp.asarray(alpha).astype(out.dtype) * out
    return out


def potrf(a: jax.Array, *, lower: bool = True, num_moduli: int = 8,
          fastmode="robust", backend: str = tables.Backend.INT8,
          block: Optional[int] = None, mesh=None) -> jax.Array:
    """Blocked Cholesky factorization A = L @ L^H of an SPD/HPD matrix.

    Returns L lower-triangular (upper R = L^H when lower=False; A = R^H R).
    Complex (Hermitian positive-definite) inputs take the same blocked path
    with conjugated panel transposes (zpotrf analog); conj is a no-op on
    real operands.
    With `mesh` (a 2-D jax.sharding.Mesh), every block-column update GEMM --
    the O(n^3) bulk -- runs distributed through :func:`summa_gemm` (int8
    residue planes over ICI); results are bit-identical across mesh shapes.
    Left-looking blocked algorithm: the O(n^3) bulk -- the update of each
    block column against ALL finished columns, done as ONE emulated GEMM
    L[lo:, :lo] @ L[lo:hi, :lo].T covering the diagonal block and the
    subdiagonal panel together -- runs on the int8 MXU; only the
    block-diagonal Cholesky factorizations (O(n * block^2)) run natively.
    The subdiagonal panels come from the emulated substitution (trsm core).
    LAPACK dpotrf analog on the emulated engine.
    """
    a = jnp.asarray(a)
    _check_2d(a, "A")
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"A must be square, got {a.shape}")
    is_cplx = jnp.issubdtype(a.dtype, jnp.complexfloating)
    if not lower:
        # dpotrf uplo='U' reads ONLY the upper triangle; the factorization
        # below reads only the lower, so run it on A^T (a no-op for a full
        # symmetric input, and correct for upper-triangle-only storage).
        # Complex: chol_lower(A^T) = conj(L), and the final .T returns
        # conj(L).T = L^H = R with A = R^H R -- the zpotrf uplo='U' contract.
        a = a.T
    blk = block or _default_block(n)
    _check_mesh_blocking(mesh, n, blk, "potrf")
    cols = []  # finished L block columns, each (n - lo, width)
    for (lo, hi) in _blocks(n, blk):
        # symmetric + panel update against all finished columns, as ONE
        # GEMM over the concatenated panel: rows lo:, columns :lo of L
        blk_col = a[lo:, lo:hi]
        if lo > 0:
            left = jnp.concatenate(
                [c[lo - s:] for (s, c) in cols], axis=1) if len(cols) > 1 \
                else cols[0][1][lo - cols[0][0]:]
            # rows lo:hi of L(:, :lo) for the conj-transposed side
            top = left[:hi - lo]
            blk_col = _schur_update(left, top.conj().T if is_cplx else top.T,
                                    blk_col, mesh=mesh,
                                    num_moduli=num_moduli, fastmode=fastmode,
                                    backend=backend)
        strict = jnp.tril(blk_col[:hi - lo], -1)
        diag = jax.lax.linalg.cholesky(
            jnp.tril(blk_col[:hi - lo]) +
            (strict.conj().T if is_cplx else strict.T))
        if hi < n:
            # L21 = A21 @ L11^{-H}: right-sided lower-conj-transposed solve
            # via the ONE lower-left substitution path (X L11^H = B  <=>
            # L11 X^H = B^H, already lower => no flips, no extra emulation)
            a21h = (blk_col[hi - lo:].conj().T if is_cplx
                    else blk_col[hi - lo:].T)
            l21 = _trsm_lower_left(
                diag, a21h, unit_diag=False,
                num_moduli=num_moduli, fastmode=fastmode, backend=backend,
                block=blk)
            l21 = l21.conj().T if is_cplx else l21.T
            colblk = jnp.concatenate([jnp.tril(diag), l21], axis=0)
        else:
            colblk = jnp.tril(diag)
        cols.append((lo, colblk))
    out = jnp.zeros((n, n), a.dtype)
    for (lo, c) in cols:
        out = out.at[lo:, lo:lo + c.shape[1]].set(c)
    return out.T if not lower else out


def getrf(a: jax.Array, *, num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8,
          block: Optional[int] = None, mesh=None):
    """Blocked right-looking LU with partial pivoting, PA = LU.

    Returns (lu, perm): `lu` packs L (unit lower) and U like LAPACK dgetrf;
    `perm` is the length-m int32 row permutation as absolute row indices
    (jax.lax.linalg.lu convention: (PA)[i] == A[perm[i]], so
    lu_solve permutes b with b.take(perm)).

    The panel factorizations (m_rem x block) run natively; the U12 row
    solves and every trailing Schur update A22 -= L21 @ U12 -- the O(n^3)
    bulk -- run through the emulated GEMM. This is the HPL-MxP-style
    mixed-precision LU mapped onto the int8 MXU.

    With `mesh` (a 2-D jax.sharding.Mesh), the Schur updates run distributed
    through :func:`summa_gemm` (int8 residue planes over ICI, order-free
    exact reduction); factorizations are bit-identical across mesh shapes.
    Panel LU and the O(n^2 * block) substitutions stay local.
    """
    a = jnp.asarray(a)
    _check_2d(a, "A")
    m, n = a.shape
    kmin = min(m, n)
    blk = block or _default_block(kmin)
    _check_mesh_blocking(mesh, (m, n), blk, "getrf")
    # absolute permutation carried as perm[i] = original row index now at i
    perm = jnp.arange(m, dtype=jnp.int32)
    for lo in range(0, kmin, blk):
        hi = min(lo + blk, kmin)
        # pivoted LU of the current panel (rows lo:m, cols lo:hi); native
        # where the backend supports the dtype, emulated-GEMM recursion
        # where it does not (TPU f64 -- see _panel_lu)
        panel = a[lo:, lo:hi]
        p_lu, p_perm = _panel_lu(panel, num_moduli, fastmode, backend)
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
                upd = _schur_update(a[hi:, lo:hi], u12, a[hi:, hi:],
                                    mesh=mesh, num_moduli=num_moduli,
                                    fastmode=fastmode, backend=backend)
                a = a.at[hi:, hi:].set(upd)
    return a, perm


def lu_solve(lu: jax.Array, perm: jax.Array, b: jax.Array, *,
             num_moduli: int = 8, fastmode="robust",
             backend: str = tables.Backend.INT8,
             block: Optional[int] = None, mesh=None) -> jax.Array:
    """Solve A @ X = B from getrf's (lu, perm): permute, then two trsm.

    `mesh` distributes the substitution update GEMMs (requires a 2-D B
    whose column count divides mesh.y -- vector RHS stays local).
    """
    lu = jnp.asarray(lu)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
        mesh = None  # vector RHS stays local (docstring contract; a width-1
        #              column can never satisfy the mesh.y divisibility)
    pb = b.take(jnp.asarray(perm), axis=0)
    y = trsm(lu, pb, lower=True, unit_diag=True, num_moduli=num_moduli,
             fastmode=fastmode, backend=backend, block=block, mesh=mesh)
    x = trsm(lu, y, lower=False, unit_diag=False, num_moduli=num_moduli,
             fastmode=fastmode, backend=backend, block=block, mesh=mesh)
    return x[:, 0] if squeeze else x


def inv(a: jax.Array, *, num_moduli: int = 8, fastmode="robust",
        backend: str = tables.Backend.INT8, block: Optional[int] = None,
        mesh=None) -> jax.Array:
    """Matrix inverse via emulated-GEMM LU (LAPACK getrf+getri analog):
    A^{-1} = lu_solve(I). The two n-RHS blocked triangular solves route
    their O(n^3) update GEMMs through the emulator; `mesh` distributes
    the factorization's Schur updates AND the substitution updates
    (n columns of RHS satisfy the mesh divisibility checks whenever the
    factorization's do)."""
    a = jnp.asarray(a)
    _check_2d(a, "A")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"inv needs a square matrix, got {a.shape}")
    lu, perm = getrf(a, num_moduli=num_moduli, fastmode=fastmode,
                     backend=backend, block=block, mesh=mesh)
    eye = jnp.eye(a.shape[0], dtype=a.dtype)
    return lu_solve(lu, perm, eye, num_moduli=num_moduli, fastmode=fastmode,
                    backend=backend, block=block, mesh=mesh)


def trtri(a: jax.Array, *, lower: bool = True, unit_diag: bool = False,
          num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8, block: Optional[int] = None,
          mesh=None) -> jax.Array:
    """Triangular matrix inverse (LAPACK dtrtri/ztrtri analog).

    Solves A @ X = I through the blocked :func:`trsm` (whose O(n^3)
    substitution updates are emulated GEMMs), then re-masks to the input's
    triangle: the complementary triangle of the computed X is exactly zero
    mathematically, and masking keeps it exactly zero bit-for-bit
    regardless of rounding in the updates. `unit_diag` inverts the
    unit-diagonal interpretation of A (the result is then unit-diagonal
    too, with the stored diagonal never read). `mesh` distributes the
    update GEMMs like :func:`trsm` (n RHS columns satisfy the mesh
    divisibility whenever the factorization's do).
    """
    a = jnp.asarray(a)
    _check_2d(a, "A")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"trtri needs a square matrix, got {a.shape}")
    eye = jnp.eye(a.shape[0], dtype=a.dtype)
    x = trsm(a, eye, side="left", lower=lower, unit_diag=unit_diag,
             num_moduli=num_moduli, fastmode=fastmode, backend=backend,
             block=block, mesh=mesh)
    x = jnp.tril(x) if lower else jnp.triu(x)
    if unit_diag:
        n = a.shape[0]
        x = x - jnp.diag(jnp.diagonal(x)) + jnp.eye(n, dtype=a.dtype)
    return x


def solve(a: jax.Array, b: jax.Array, *, num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8, block: Optional[int] = None,
          refine_steps: int = 0,
          residual_moduli: Optional[int] = None, mesh=None) -> jax.Array:
    """Dense solve A @ X = B via emulated-GEMM LU, with optional iterative
    refinement -- the end-to-end mixed-precision-solver story of the
    Ozaki-scheme literature: a CHEAP factorization (low num_moduli) plus
    residuals computed at HIGH emulated accuracy recover a full-precision
    solution.

    `residual_moduli` sets the accuracy of the refinement residual GEMMs;
    IR converges only if the residual is computed more accurately than the
    factorization, so it defaults to the dtype's native-precision setting
    from :func:`choose_moduli` (never below num_moduli).

    `mesh` distributes the FACTORIZATION's Schur updates -- the O(n^3)
    bulk, HPL-style -- through :func:`summa_gemm`; the triangular solves
    and refinement residuals (O(n^2 * n_rhs)) stay local so vector RHS
    works on any mesh.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if refine_steps and residual_moduli is None:
        from .accuracy_model import choose_moduli
        residual_moduli = max(num_moduli,
                              choose_moduli(dtype=a.dtype).num_moduli)
    lu, perm = getrf(a, num_moduli=num_moduli, fastmode=fastmode,
                     backend=backend, block=block, mesh=mesh)
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


def potrs(chol: jax.Array, b: jax.Array, *, lower: bool = True,
          num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8,
          block: Optional[int] = None, mesh=None) -> jax.Array:
    """Solve A @ X = B from potrf's Cholesky factor (LAPACK dpotrs analog):
    two emulated-GEMM triangular solves, L y = B then L^H x = y (or the
    upper-factor pair when ``lower=False``; zpotrs on complex factors).

    `mesh` distributes the substitution update GEMMs like :func:`trsm`
    (needs a 2-D B whose column count divides mesh.y -- vector RHS local).
    """
    chol = jnp.asarray(chol)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
        mesh = None  # vector RHS stays local (see lu_solve)
    # Hermitian factors solve against the CONJUGATE transpose; on real
    # operands 'C' degrades to plain T inside _canon_tri
    y = trsm(chol, b, lower=lower, trans_a=(False if lower else "C"),
             num_moduli=num_moduli,
             fastmode=fastmode, backend=backend, block=block, mesh=mesh)
    x = trsm(chol, y, lower=lower, trans_a=("C" if lower else False),
             num_moduli=num_moduli,
             fastmode=fastmode, backend=backend, block=block, mesh=mesh)
    return x[:, 0] if squeeze else x


def posv(a: jax.Array, b: jax.Array, *, lower: bool = True,
         num_moduli: int = 8, fastmode="robust",
         backend: str = tables.Backend.INT8, block: Optional[int] = None,
         refine_steps: int = 0, residual_moduli: Optional[int] = None,
         mesh=None) -> jax.Array:
    """SPD solve A @ X = B via emulated-GEMM Cholesky (LAPACK dposv analog),
    with the same optional iterative refinement as :func:`solve`: a cheap
    low-num_moduli factorization plus high-accuracy emulated residuals
    recovers the full-precision solution at a fraction of the native-f64
    factorization cost (the HPL-MxP protocol, SPD variant).

    `mesh` distributes the factorization's syrk/Schur updates through
    :func:`summa_gemm`; refinement residuals are O(n^2 * n_rhs) and local.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    _check_2d(a, "A")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"posv needs a square matrix, got {a.shape}")
    if refine_steps and residual_moduli is None:
        from .accuracy_model import choose_moduli
        residual_moduli = max(num_moduli,
                              choose_moduli(dtype=a.dtype).num_moduli)
    chol = potrf(a, lower=lower, num_moduli=num_moduli, fastmode=fastmode,
                 backend=backend, block=block, mesh=mesh)
    x = potrs(chol, b, lower=lower, num_moduli=num_moduli, fastmode=fastmode,
              backend=backend, block=block)
    for _ in range(refine_steps):
        bx = x[:, None] if x.ndim == 1 else x
        bb = b[:, None] if b.ndim == 1 else b
        r = gemm(a, bx, num_moduli=residual_moduli, fastmode=fastmode,
                 backend=backend, alpha=-1.0, beta=1.0, c=bb)
        if x.ndim == 1:
            r = r[:, 0]
        x = x + potrs(chol, r, lower=lower, num_moduli=num_moduli,
                      fastmode=fastmode, backend=backend, block=block)
    return x

"""Blocked Householder QR and least-squares over the emulated GEMM.

Capability layer beyond the reference (GEMMul8 is GEMM-only; its README
positions the library as the building block for mixed-precision dense
linear algebra -- QR/least-squares is the other half of that story next
to LU/Cholesky in solvers.py).

Algorithm: blocked Householder with compact-WY block reflectors
(Q = I - V T V^T per block, LAPACK dgeqrf/dlarft/dlarfb structure):

- the PANEL factorization (m_rem x block) is native
  ``jnp.linalg.qr(mode="raw")`` -- O(m * block^2) work, like the native
  diagonal blocks in solvers.py;
- the triangular block factor uses the closed form
  ``T = inv(diag(1/tau) + striu(V^T V))`` (equivalent to the dlarft
  recurrence T[:j,j] = -tau_j T[:j,:j] (V^T V)[:j,j], verified by direct
  multiplication), where V^T V is ONE emulated syrk and the bw x bw
  triangular inverse is native;
- every TRAILING update C -= V (T^T (V^T C)) -- the O(m n^2) bulk -- runs
  its two large GEMMs through :func:`gemmul8_tpu.gemm` (distributed via
  :func:`summa_gemm` when ``mesh`` is given); the bw x bw * (bw, n_rem)
  middle product is native (O(n^2 * block), panel-class work).

fastmode defaults to "robust" like solvers.py: V^T V is a Gram product
(Cauchy-Schwarz equality on the diagonal -- exactly the case where the
reference fast-shift formula can silently wrap the CRT; see the solvers
module docstring and tests/test_solvers.py::test_gram_products_wrap_...).

Numerical contract: tau_j == 0 reflectors (H_j = I -- LAPACK dlarfg's
convention for an already-reduced column, which EVERY square matrix hits
on its final reflector) take the exact closed-form limit: T's j-th row
and column are zero (see _block_t). lstsq additionally requires full
column rank for the final R solve, the standard least-squares assumption.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from . import tables
from .core import gemm, syrk
from .solvers import (_blocks, _check_2d, _check_mesh_blocking,
                      _default_block, _dist_gemm, _schur_update, trsm)

__all__ = ["geqrf", "ormqr", "qr", "lstsq"]


def _panel_vt(packed_panel, bw):
    """Unit-lower-trapezoidal V (m_rem, bw) from a packed QR panel."""
    v = jnp.tril(packed_panel[:, :bw], -1)
    return v.at[jnp.arange(bw), jnp.arange(bw)].set(1)


def _gram(v, *, num_moduli, fastmode, backend, mesh):
    """V^H V (V^T V for real) with plane reuse where available: syrk for
    real, herk for complex INT8; FP8-complex falls back to the generic
    gemm (its split planes cannot derive the 3M difference lane)."""
    is_c = jnp.issubdtype(v.dtype, jnp.complexfloating)
    if mesh is None:
        if not is_c:
            return syrk(v, trans=True, num_moduli=num_moduli,
                        fastmode=fastmode, backend=backend)
        if backend == tables.Backend.INT8:
            from .complex_gemm import herk
            return herk(v, trans=True, num_moduli=num_moduli,
                        fastmode=fastmode, backend=backend)
        return gemm(v.conj().T, v, num_moduli=num_moduli,
                    fastmode=fastmode, backend=backend)
    vh = v.conj().T if is_c else v.T
    return _dist_gemm(vh, v, mesh=mesh, num_moduli=num_moduli,
                      fastmode=fastmode, backend=backend)


def _block_t(v, tau, *, num_moduli, fastmode, backend, mesh):
    """Compact-WY T for one block: T = inv(diag(1/tau) + striu(V^H V)).

    V^H V is the emulated Gram product (the O(m * bw^2) panel-class GEMM);
    the bw x bw triangular inverse is native.
    """
    w = _gram(v, num_moduli=num_moduli, fastmode=fastmode, backend=backend,
              mesh=mesh)
    # tau_j == 0 means H_j = I (LAPACK dlarfg with an empty tail -- EVERY
    # square matrix hits it on its final reflector; not rank deficiency).
    # The exact limit of T = inv(diag(1/tau) + striu(V'V)) as 1/tau_j -> inf
    # is T with row j and column j identically zero (row j of striu(V'V) is
    # zero because v_k[j] = 0 for k > j), so: solve with a finite dummy
    # diagonal there, then mask those rows/columns to the exact limit --
    # no inf on the device (TPU triangular_solve can turn inf into NaN).
    good = tau != 0
    safe_inv = jnp.where(good, 1.0 / jnp.where(good, tau, 1.0), 1.0)
    m = jnp.triu(w, 1) + jnp.diag(safe_inv)
    eye = jnp.eye(v.shape[1], dtype=v.dtype)
    t = jax.lax.linalg.triangular_solve(m, eye, left_side=True, lower=False)
    return jnp.where(good[:, None] & good[None, :], t, 0.0)


def _apply_block(v, t, c, *, trans, num_moduli, fastmode, backend, mesh):
    """(I - V T^H V^H) C when trans else (I - V T V^H) C, bulk GEMMs
    emulated (^H degrades to ^T on real operands)."""
    is_c = jnp.issubdtype(v.dtype, jnp.complexfloating)
    vh = v.conj().T if is_c else v.T
    y = _dist_gemm(vh, c, mesh=mesh, num_moduli=num_moduli,
                   fastmode=fastmode, backend=backend)
    th = (t.conj().T if is_c else t.T) if trans else t
    z = th @ y
    return _schur_update(v, z, c, mesh=mesh, num_moduli=num_moduli,
                         fastmode=fastmode, backend=backend)


def geqrf(a: jax.Array, *, num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8,
          block: Optional[int] = None, mesh=None):
    """Blocked Householder QR, LAPACK dgeqrf convention.

    Returns (packed, taus): R in the upper triangle of `packed`, the
    Householder vectors below the diagonal (implicit unit diagonal),
    `taus` the (min(m, n),) scalar factors. The trailing-matrix updates
    -- the O(m n^2) bulk -- run through the emulated GEMM; with `mesh`
    they run distributed through SUMMA (bit-identical across mesh shapes,
    see solvers._schur_update).
    """
    a = jnp.asarray(a)
    packed, taus, _ = _geqrf_t(a, num_moduli=num_moduli, fastmode=fastmode,
                               backend=backend, block=block, mesh=mesh)
    return packed, taus


def _geqrf_t(a, *, num_moduli, fastmode, backend, block, mesh):
    """geqrf body that also returns the per-block compact-WY T factors
    (None for the last block when no trailing update needed it), so
    qr()/lstsq() can hand them to ormqr instead of re-running one emulated
    Gram product per block."""
    _check_2d(a, "A")
    m, n = a.shape
    kmin = min(m, n)
    blk = block or _default_block(kmin)
    _check_mesh_blocking(mesh, (m, n), blk, "geqrf")
    taus = []
    ts = []
    for (lo, hi) in _blocks(kmin, blk):
        bw = hi - lo
        h, tau = jnp.linalg.qr(a[lo:, lo:hi], mode="raw")
        packed_panel = h.T
        a = a.at[lo:, lo:hi].set(packed_panel)
        taus.append(tau)
        if hi < n:
            v = _panel_vt(packed_panel, bw)
            t = _block_t(v, tau, num_moduli=num_moduli, fastmode=fastmode,
                         backend=backend, mesh=mesh)
            ts.append(t)
            # trailing: C <- Q' C = (I - V T' V') C
            upd = _apply_block(v, t, a[lo:, hi:], trans=True,
                               num_moduli=num_moduli, fastmode=fastmode,
                               backend=backend, mesh=mesh)
            a = a.at[lo:, hi:].set(upd)
        else:
            ts.append(None)
    return a, (jnp.concatenate(taus) if len(taus) > 1 else taus[0]), ts


def ormqr(packed: jax.Array, taus: jax.Array, c: jax.Array, *,
          trans: bool = False, num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8,
          block: Optional[int] = None, mesh=None, ts=None) -> jax.Array:
    """Apply Q (or Q^T with trans=True) from geqrf to C, LAPACK dormqr
    (side="L") analog. Block reflectors are re-derived from (packed, taus)
    like LAPACK; the two large GEMMs per block are emulated.

    `ts` optionally supplies the per-block compact-WY T factors already
    computed during the factorization (same `block`!) so they are not
    re-derived -- one emulated Gram product saved per block; qr()/lstsq()
    pass them automatically."""
    packed = jnp.asarray(packed)
    c = jnp.asarray(c)
    _check_2d(packed, "packed")
    _check_2d(c, "C")
    m, n = packed.shape
    kmin = min(m, n)
    if c.shape[0] != m:
        raise ValueError(f"C rows {c.shape[0]} != {m}")
    blk = block or _default_block(kmin)
    _check_mesh_blocking(mesh, (m, kmin), blk, "ormqr",
                         rhs_cols=c.shape[1])
    spans = _blocks(kmin, blk)
    if ts is not None and len(ts) != len(spans):
        raise ValueError(f"ts has {len(ts)} block factors for {len(spans)} "
                         f"blocks -- was geqrf run with the same block?")
    # Q = (I - V1 T1 V1') ... (I - Vp Tp Vp'): apply blocks in
    # factorization order for Q', reverse for Q
    order = range(len(spans)) if trans else range(len(spans) - 1, -1, -1)
    for i in order:
        lo, hi = spans[i]
        bw = hi - lo
        v = _panel_vt(packed[lo:, lo:hi], bw)
        t = ts[i] if ts is not None and ts[i] is not None else _block_t(
            v, taus[lo:hi], num_moduli=num_moduli,
            fastmode=fastmode, backend=backend, mesh=mesh)
        upd = _apply_block(v, t, c[lo:], trans=trans,
                           num_moduli=num_moduli, fastmode=fastmode,
                           backend=backend, mesh=mesh)
        c = c.at[lo:].set(upd)
    return c


def qr(a: jax.Array, *, num_moduli: int = 8, fastmode="robust",
       backend: str = tables.Backend.INT8,
       block: Optional[int] = None, mesh=None):
    """Reduced QR: returns (Q (m, kmin), R (kmin, n)) with A = Q @ R.

    Q is formed by applying the block reflectors to the identity (blocked
    orgqr), so the O(m^2 kmin) formation also runs on the emulated engine.
    """
    a = jnp.asarray(a)
    _check_2d(a, "A")
    m, n = a.shape
    kmin = min(m, n)
    packed, taus, ts = _geqrf_t(a, num_moduli=num_moduli, fastmode=fastmode,
                                backend=backend, block=block, mesh=mesh)
    eye = jnp.eye(m, kmin, dtype=a.dtype)
    q = ormqr(packed, taus, eye, trans=False, num_moduli=num_moduli,
              fastmode=fastmode, backend=backend, block=block, mesh=mesh,
              ts=ts)
    return q, jnp.triu(packed[:kmin])


def lstsq(a: jax.Array, b: jax.Array, *, num_moduli: int = 8,
          fastmode="robust", backend: str = tables.Backend.INT8,
          block: Optional[int] = None, mesh=None) -> jax.Array:
    """Least-squares solution of A @ X = B (m >= n, full column rank)
    via blocked Householder QR on the emulated engine: X = R^{-1} (Q^H B)
    with the R solve through :func:`gemmul8_tpu.trsm`.

    `mesh` distributes the factorization; the Q^T B application and the
    triangular solve stay local for vector RHS (like solve())."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    m, n = a.shape
    if m < n:
        raise ValueError(f"lstsq needs m >= n, got {a.shape}")
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    if b.shape[0] != m:
        raise ValueError(f"B rows {b.shape[0]} != {m}")
    packed, taus, ts = _geqrf_t(a, num_moduli=num_moduli, fastmode=fastmode,
                                backend=backend, block=block, mesh=mesh)
    qtb = ormqr(packed, taus, b, trans=True, num_moduli=num_moduli,
                fastmode=fastmode, backend=backend, block=block, ts=ts)
    x = trsm(jnp.triu(packed[:n]), qtb[:n], lower=False,
             num_moduli=num_moduli, fastmode=fastmode, backend=backend,
             block=block)
    return x[:, 0] if squeeze else x

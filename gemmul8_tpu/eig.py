"""Block-Jacobi SVD and symmetric eigendecomposition over the emulated GEMM.

Capability layer beyond the reference (GEMMul8 is GEMM-only): together
with solvers.py (LU/Cholesky/triangular) and qr.py (QR/least-squares)
this completes the dense mixed-precision linear-algebra story the
reference positions itself as the building block for.

Why Jacobi and not reduction-based (sytrd/gebrd) algorithms: block-Jacobi
is the TPU-shaped choice. A sweep is a fixed round-robin schedule of
block-pair rotations; every round's work is TWO BATCHED GEMMs (the pair
Gram/subblock products and the block-column rotation applications) plus
one tiny batched native eigh for the 2b x 2b rotation subproblems --
static shapes, no data-dependent control flow inside any compiled
program, and the O(n^3) bulk rides the int8 MXU through
:func:`gemmul8_tpu.gemm_batched`. Householder reduction to tridiagonal/
bidiagonal form spends half its flops in panel-bound symmetric matvecs
that cannot batch onto the MXU.

Accuracy contract: the rotations are computed from EMULATED Gram /
subblock products, so the achievable off-diagonal floor tracks
``num_moduli`` (the framework's accuracy dial, reference Fig. 4 law).
Convergence stops at ``tol`` or when the off-diagonal stagnates at the
emulation noise floor; sweeps converge quadratically once pairs decouple
(classic Jacobi theory), so the floor costs at most one extra sweep.

svd:  one-sided (Hestenes) block Jacobi -- orthogonalizes column blocks
      of W = A V; at convergence sigma = column norms, U = W / sigma.
eigh: two-sided block Jacobi -- batched native eigh of the 2b x 2b
      pair subblocks drives A <- J^H A J to diagonal form.

Complex dtypes (zheev/zgesvd analogs): the SAME schedules and update
shapes carry over with conjugate-transpose algebra -- the pair Gram
products are Hermitian (X^H X), the batched native eigh returns complex
unitary rotations, and every O(n^3) rotation application routes through
``gemm_batched``'s complex (3M) dispatch. Eigen-/singular values stay
real; ``conj()`` is a no-op on real inputs so one code path serves all
four dtypes.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import tables
from .core import gemm_batched

__all__ = ["svd", "eigh"]


def _check_2d(x, name):
    if x.ndim != 2:
        raise ValueError(f"{name} must be 2-D, got ndim={x.ndim}")


def _ct(x):
    """Batched conjugate transpose (B, r, c) -> (B, c, r)."""
    return x.conj().transpose(0, 2, 1)


def _pick_block(n: int, block: Optional[int]) -> int:
    """Block width: must divide n (uniform 2b-wide batched gathers) AND
    give at least two blocks -- a single n-wide block yields zero rotation
    pairs, so the sweep would silently do nothing. (n == 1 is the only
    unavoidable single-block case and is exact with zero rotations.)"""
    if block is not None:
        if n % block:
            raise ValueError(f"block {block} must divide n={n}")
        if block == n and n > 1:
            raise ValueError(
                f"block {block} == n gives a single block and no rotation "
                f"pairs; need block <= n//2")
        return block
    target = max(8, min(128, n // 8))
    for b in range(min(target, n // 2), 0, -1):
        if n % b == 0:
            return b
    return 1


def _round_robin(nb: int):
    """Round-robin tournament: nb-1 (nb even) or nb (odd) rounds of
    disjoint block pairs covering every pair exactly once per sweep."""
    ids = list(range(nb)) + ([None] if nb % 2 else [])
    nn = len(ids)
    rounds = []
    for _ in range(nn - 1):
        pairs = [(min(ids[k], ids[nn - 1 - k]), max(ids[k], ids[nn - 1 - k]))
                 for k in range(nn // 2)
                 if ids[k] is not None and ids[nn - 1 - k] is not None]
        rounds.append(sorted(pairs))
        ids = [ids[0], ids[-1]] + ids[1:-1]
    return rounds


def _pair_cols(pairs, b: int):
    """(P, 2b) int32 column indices for a round's block pairs."""
    out = np.empty((len(pairs), 2 * b), np.int32)
    for p, (i, j) in enumerate(pairs):
        out[p, :b] = np.arange(i * b, (i + 1) * b)
        out[p, b:] = np.arange(j * b, (j + 1) * b)
    return jnp.asarray(out)


def _gather_cols(x, cols):
    """x (r, n) -> (P, r, 2b) block-column batch for the round."""
    p, w = cols.shape
    return x.take(cols.reshape(-1), axis=1).reshape(x.shape[0], p, w).transpose(1, 0, 2)


def _scatter_cols(x, cols, upd):
    """Inverse of _gather_cols (disjoint pairs: pure permutation)."""
    p, w = cols.shape
    return x.at[:, cols.reshape(-1)].set(
        upd.transpose(1, 0, 2).reshape(x.shape[0], p * w))


def _default_nu(dtype) -> int:
    # iterative orthogonalization needs near-dtype-accurate rotations;
    # these hit the dtype's native-precision settings (choose_moduli law)
    return 14 if np.dtype(dtype) in (np.float64, np.complex128) else 9


def _pair_sharding(mesh, pairs_per_round: int):
    """Batch sharding over the round's independent pair subproblems.

    Jacobi distribution differs from the factorizations' (SUMMA inside
    each GEMM): a round's pairs are INDEPENDENT, so the batched pair
    GEMMs shard over the batch axis -- every device runs whole pair
    subproblems, no collectives at all inside a round. Returns a
    device_put-able sharding for (P, ., .) batches, or None."""
    if mesh is None:
        return None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    devs = mesh.devices.reshape(-1)
    if pairs_per_round % devs.size:
        raise ValueError(
            f"mesh with {devs.size} devices needs the pairs-per-round "
            f"({pairs_per_round}) divisible by it; pairs-per-round is "
            f"floor(nb/2) for nb = n/block blocks -- pick a block width "
            f"making that a multiple of n_devices")
    flat = Mesh(devs, ("pairs",))
    return NamedSharding(flat, PartitionSpec("pairs", None, None))


def _shard(x, sharding):
    return x if sharding is None else jax.device_put(x, sharding)


def _tolerances(a, tol):
    eps = float(jnp.finfo(a.dtype).eps)
    return (32 * eps) if tol is None else float(tol)


def svd(a: jax.Array, *, num_moduli: Optional[int] = None,
        fastmode="robust", backend: str = tables.Backend.INT8,
        block: Optional[int] = None, max_sweeps: int = 24,
        tol: Optional[float] = None, compute_uv: bool = True, mesh=None):
    """SVD by one-sided block Jacobi on the emulated engine.

    Returns (u, s, vt) with a == u @ diag(s) @ vt (reduced: u is
    (m, kmin), vt (kmin, n), s descending), or s alone when
    ``compute_uv=False``. Every Gram product and rotation application --
    the O(m n^2) bulk -- is a batched emulated GEMM; only the 2b x 2b
    rotation eigenproblems are native.

    Columns with sigma == 0 (exact rank deficiency) get zero columns in
    u rather than an arbitrary orthonormal completion.
    """
    a = jnp.asarray(a)
    _check_2d(a, "A")
    if a.shape[0] < a.shape[1]:
        # run on A^H: A = (V') S (U')^H  =>  u = vt'^H, vt = u'^H
        res = svd(a.conj().T, num_moduli=num_moduli, fastmode=fastmode,
                  backend=backend, block=block, max_sweeps=max_sweeps,
                  tol=tol, compute_uv=compute_uv, mesh=mesh)
        if not compute_uv:
            return res
        ut, s, vtt = res
        return vtt.conj().T, s, ut.conj().T
    m, n = a.shape
    nu = num_moduli if num_moduli is not None else _default_nu(a.dtype)
    b = _pick_block(n, block)
    rounds = _round_robin(n // b)
    shd = _pair_sharding(mesh, len(rounds[0]))
    stop = _tolerances(a, tol)
    tiny = float(jnp.finfo(a.dtype).tiny)

    w = a
    v = jnp.eye(n, dtype=a.dtype)
    prev_off = None
    for sweep in range(max_sweeps):
        off = jnp.zeros((), jnp.finfo(a.dtype).dtype)  # real component dtype
        for pairs in rounds:
            if not pairs:           # nb == 1 (n == 1): nothing to rotate
                continue
            cols = _pair_cols(pairs, b)
            x = _shard(_gather_cols(w, cols), shd)          # (P, m, 2b)
            g = gemm_batched(_ct(x), x, num_moduli=nu,
                             fastmode=fastmode, backend=backend)
            d = jnp.diagonal(g, axis1=1, axis2=2).real      # (P, 2b)
            denom = jnp.sqrt(jnp.maximum(
                d[:, :b, None] * d[:, None, b:], tiny))
            off = jnp.maximum(off, jnp.max(jnp.abs(g[:, :b, b:]) / denom))
            _, j = jnp.linalg.eigh(g)
            j = j[:, :, ::-1]                               # descending
            w = _scatter_cols(w, cols, gemm_batched(
                x, j, num_moduli=nu, fastmode=fastmode, backend=backend))
            if compute_uv:
                xv = _shard(_gather_cols(v, cols), shd)
                v = _scatter_cols(v, cols, gemm_batched(
                    xv, j, num_moduli=nu, fastmode=fastmode,
                    backend=backend))
        off_h = float(off)
        if off_h <= stop:
            break
        # early sweeps shrink off slowly (coupling), late ones
        # quadratically; a literal non-improvement after warmup means the
        # emulation noise floor (num_moduli) has been reached
        if sweep >= 4 and prev_off is not None and off_h >= prev_off:
            break
        prev_off = off_h
    s2 = jnp.sum((w * w.conj()).real, axis=0)
    order = jnp.argsort(-s2)
    s = jnp.sqrt(s2[order])
    kmin = min(m, n)
    s = s[:kmin]
    if not compute_uv:
        return s
    wk = w[:, order[:kmin]]
    u = jnp.where(s[None, :] > 0, wk / jnp.maximum(s[None, :], tiny),
                  jnp.zeros((), wk.dtype))
    return u, s, v[:, order[:kmin]].conj().T


def eigh(a: jax.Array, *, num_moduli: Optional[int] = None,
         fastmode="robust", backend: str = tables.Backend.INT8,
         block: Optional[int] = None, max_sweeps: int = 24,
         tol: Optional[float] = None, mesh=None):
    """Symmetric eigendecomposition by two-sided block Jacobi.

    Returns (w, v) like jnp.linalg.eigh: eigenvalues ascending,
    a @ v == v @ diag(w). The input is symmetrized ((a + a.T)/2, LAPACK
    lower/upper convention analog). Rotations come from batched native
    eigh of the 2b x 2b pair subblocks; the O(n^3) row/column rotation
    applications run through the batched emulated GEMM.
    """
    a = jnp.asarray(a)
    _check_2d(a, "A")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"eigh needs a square matrix, got {a.shape}")
    n = a.shape[0]
    nu = num_moduli if num_moduli is not None else _default_nu(a.dtype)
    b = _pick_block(n, block)
    rounds = _round_robin(n // b)
    shd = _pair_sharding(mesh, len(rounds[0]))
    stop = _tolerances(a, tol)

    a = (a + a.conj().T) * 0.5            # Hermitian part (zheev analog)
    fro = jnp.sqrt(jnp.sum((a * a.conj()).real))
    v = jnp.eye(n, dtype=a.dtype)
    prev_off = None
    for sweep in range(max_sweeps):
        off2 = jnp.zeros((), fro.dtype)
        for pairs in rounds:
            if not pairs:           # nb == 1 (n == 1): nothing to rotate
                continue
            cols = _pair_cols(pairs, b)
            rows = a.take(cols.reshape(-1), axis=0).reshape(
                cols.shape[0], 2 * b, n)
            s = jnp.take_along_axis(rows, cols[:, None, :], axis=2)
            sob = s[:, :b, b:]
            off2 = off2 + 2.0 * jnp.sum((sob * sob.conj()).real)
            _, j = jnp.linalg.eigh(s)                       # ascending
            a = _scatter_cols(a, cols, gemm_batched(
                _shard(_gather_cols(a, cols), shd), j, num_moduli=nu,
                fastmode=fastmode, backend=backend))
            rows = a.take(cols.reshape(-1), axis=0).reshape(
                cols.shape[0], 2 * b, n)
            a = a.at[cols.reshape(-1), :].set(
                gemm_batched(_ct(j), _shard(rows, shd),
                             num_moduli=nu, fastmode=fastmode,
                             backend=backend).reshape(-1, n))
            v = _scatter_cols(v, cols, gemm_batched(
                _shard(_gather_cols(v, cols), shd), j, num_moduli=nu,
                fastmode=fastmode, backend=backend))
        a = (a + a.conj().T) * 0.5
        # finfo.tiny, not a float64 literal: 1e-300 underflows to 0.0 in
        # f32, which would make the zero-matrix guard a no-op (0/0 = NaN
        # never compares <= stop, burning all max_sweeps)
        off_h = float(jnp.sqrt(off2) /
                      jnp.maximum(fro, float(jnp.finfo(a.dtype).tiny)))
        if off_h <= stop:
            break
        if sweep >= 4 and prev_off is not None and off_h >= prev_off:
            break                     # stagnated at the emulation floor
        prev_off = off_h
    wdiag = jnp.diagonal(a).real          # Hermitian: eigenvalues are real
    order = jnp.argsort(wdiag)
    return wdiag[order], v[:, order]

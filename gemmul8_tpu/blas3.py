"""Level-3 BLAS completion on the residue emulator: syr2k/her2k, symm/hemm.

Together with gemm (core.py), syrk (core.py), herk (complex_gemm.py) and
trmm/trsm (solvers.py), these complete the BLAS Level-3 surface so that
emulated-precision users never have to leave the library for an O(n^3)
primitive. The reference is GEMM-only (include/gemmul8.hpp:41-94 declares
nothing but gemm/gemmLt/workSize) -- every routine here is a capability
beyond it, built ON the emulated GEMM so accuracy/speed dial through the
same `num_moduli`/`fastmode`/`backend` knobs and results stay bit-wise
reproducible.

Structure exploitation (why these are not just convenience wrappers):

- syr2k/her2k need only ONE emulated product, not two: the second term is
  exactly the (conjugate-)transpose of the first (B @ op(A) == (A @ op(B))^T
  elementwise in any rounding, because it is literally the same matrix), so
  C = G + G^T with G = alpha * A @ op(B). Half the encode AND half the MXU
  work of the naive two-GEMM formulation; the result is exactly
  (conjugate-)symmetric bit-for-bit since element (i,j) and (j,i) sum the
  same two addends.
- symm/hemm materialize the full operand from its stored triangle with two
  exact elementwise copies (mirroring is value-exact; hemm takes the real
  part of the diagonal per BLAS, which ASSUMES the imaginary diagonal is
  zero), then run one emulated GEMM -- the MXU sees a full dense product,
  which on TPU is faster than any triangle-masked variant at half-utilization.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .complex_gemm import gemm_planar
from .core import gemm

__all__ = ["syr2k", "her2k", "symm", "hemm",
           "her2k_planar", "hemm_planar", "symm_planar"]


def _check_real_scalar(x, name):
    if isinstance(x, complex) and x.imag != 0:
        raise ValueError(f"{name} must be real (BLAS *her2k/*herk take a "
                         f"real {name}), got {x!r}")


def syr2k(a: jax.Array, b: jax.Array, *, trans: bool = False,
          num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8, alpha=1.0, beta=0.0,
          c: Optional[jax.Array] = None,
          epilogue: str = "auto") -> jax.Array:
    """Emulated symmetric rank-2k update (dsyr2k analog):

      C = alpha * (A @ B^T + B @ A^T) + beta * C          (trans=False)
      C = alpha * (A^T @ B + B^T @ A) + beta * C          (trans=True)

    Costs ONE emulated GEMM: B @ A^T is elementwise the transpose of
    A @ B^T, so C = G + G^T with G = alpha * A @ B^T. The returned matrix
    is exactly symmetric bit-for-bit. Real dtypes; use her2k for complex.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise TypeError("syr2k is real-only; use her2k for complex operands")
    g = gemm(a, b, trans_a=bool(trans), trans_b=not trans,
             num_moduli=num_moduli, fastmode=fastmode, backend=backend,
             alpha=alpha, epilogue=epilogue)
    out = g + g.T
    if c is not None and not (isinstance(beta, (int, float)) and beta == 0):
        out = out + (c if isinstance(beta, (int, float)) and beta == 1
                     else jnp.asarray(beta).astype(out.dtype) * c)
    return out


def her2k(a: jax.Array, b: jax.Array, *, trans: bool = False,
          num_moduli: int = 8, fastmode="robust",
          backend: str = tables.Backend.INT8, alpha=1.0, beta=0.0,
          c: Optional[jax.Array] = None,
          epilogue: str = "auto") -> jax.Array:
    """Emulated Hermitian rank-2k update (zher2k analog; beta REAL per BLAS):

      C = alpha * A @ B^H + conj(alpha) * B @ A^H + beta * C   (trans=False)
      C = alpha * A^H @ B + conj(alpha) * B^H @ A + beta * C   (trans=True)

    Costs ONE emulated complex (3M) GEMM: the second term equals
    (alpha * A @ B^H)^H elementwise, so C = G + G^H with
    G = alpha * A @ op(B). The diagonal comes out exactly real
    (g_ii + conj(g_ii)) and the matrix exactly Hermitian bit-for-bit.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise TypeError("her2k is complex-only; use syr2k for real operands")
    _check_real_scalar(beta, "beta")
    g = gemm(a, b, trans_a="C" if trans else "N",
             trans_b="N" if trans else "C",
             num_moduli=num_moduli, fastmode=fastmode, backend=backend,
             alpha=alpha, epilogue=epilogue)
    out = g + g.conj().T
    if c is not None and not (isinstance(beta, (int, float)) and beta == 0):
        beta_r = jnp.real(jnp.asarray(beta)).astype(jnp.real(out).dtype)
        out = out + (c if isinstance(beta, (int, float)) and beta == 1
                     else beta_r * c)
    return out


def _full_from_triangle(a, lower, hermitian):
    """Mirror the stored triangle into a full (conjugate-)symmetric matrix.

    Exact: both copies carry the stored values unchanged; for hermitian the
    diagonal's imaginary part is dropped per the BLAS *hemm contract (the
    routine ASSUMES it is zero and never reads it).
    """
    if lower:
        strict = jnp.tril(a, -1)
    else:
        strict = jnp.triu(a, 1)
    mirror = strict.conj().T if hermitian else strict.T
    d = jnp.diagonal(a)
    if hermitian:
        d = jnp.real(d).astype(a.dtype)
    return strict + mirror + jnp.diag(d)


def _symm_hemm(a, b, side, lower, hermitian, num_moduli, fastmode, backend,
               alpha, beta, c, epilogue, name):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"{name} expects 2-D operands, got A.ndim={a.ndim}, "
                         f"B.ndim={b.ndim}")
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"A must be square, got {a.shape}")
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    nd = b.shape[0] if side == "left" else b.shape[1]
    if a.shape[0] != nd:
        raise ValueError(f"A {a.shape} does not match B {b.shape} for "
                         f"side={side!r}")
    full = _full_from_triangle(a, bool(lower), hermitian)
    lhs, rhs = (full, b) if side == "left" else (b, full)
    return gemm(lhs, rhs, num_moduli=num_moduli, fastmode=fastmode,
                backend=backend, alpha=alpha, beta=beta, c=c,
                epilogue=epilogue)


def symm(a: jax.Array, b: jax.Array, *, side: str = "left",
         lower: bool = True, num_moduli: int = 8, fastmode="robust",
         backend: str = tables.Backend.INT8, alpha=1.0, beta=0.0,
         c: Optional[jax.Array] = None, epilogue: str = "auto") -> jax.Array:
    """Emulated symmetric matrix product (dsymm analog):

      C = alpha * sym(A) @ B + beta * C    (side="left";  A is (m, m))
      C = alpha * B @ sym(A) + beta * C    (side="right"; A is (n, n))

    Only the `lower`/upper triangle of A is read; the other triangle is
    mirrored exactly before one emulated GEMM. Works for every dtype the
    emulator supports (complex inputs mirror WITHOUT conjugation --
    complex-symmetric, per BLAS csymm/zsymm; use hemm for Hermitian A).
    """
    return _symm_hemm(a, b, side, lower, False, num_moduli, fastmode,
                      backend, alpha, beta, c, epilogue, "symm")


def her2k_planar(ar: jax.Array, ai: jax.Array, br: jax.Array, bi: jax.Array,
                 *, trans: bool = False, num_moduli: int = 8,
                 fastmode="robust", backend: str = tables.Backend.INT8,
                 alpha=1.0, epilogue: str = "auto"):
    """Planar her2k: (Ar, Ai), (Br, Bi) -> (Cr, Ci) = alpha A B^H +
    conj(alpha) B A^H, for accelerators whose runtimes lack complex dtypes
    (see gemm_planar). Bit-identical to her2k() on complex views at
    alpha=1 (general alpha applies the same complex-multiply formula on
    the planes; a separately compiled program may contract it differently
    by an ulp). Complex `alpha` on the planes: with G the one product,
    Cr = P + P^T and Ci = Q - Q^T where P + iQ = alpha * G -- the real
    plane exactly symmetric and the imaginary plane exactly antisymmetric
    (zero diagonal) bit-for-bit.
    """
    gr, gi = gemm_planar(ar, ai, br, bi,
                         trans_a="C" if trans else "N",
                         trans_b="N" if trans else "C",
                         num_moduli=num_moduli, fastmode=fastmode,
                         backend=backend, epilogue=epilogue)
    al = complex(alpha)
    if al != 1:
        a_r = jnp.asarray(al.real).astype(gr.dtype)
        a_i = jnp.asarray(al.imag).astype(gr.dtype)
        gr, gi = a_r * gr - a_i * gi, a_r * gi + a_i * gr
    return gr + gr.T, gi - gi.T


def _full_planar(ar, ai, lower, hermitian):
    """Planar triangle mirror: real plane symmetric; imaginary plane
    symmetric (complex-symmetric) or antisymmetric with a zero diagonal
    (Hermitian -- the stored diagonal imaginary part is ignored per BLAS)."""
    strict_r = jnp.tril(ar, -1) if lower else jnp.triu(ar, 1)
    strict_i = jnp.tril(ai, -1) if lower else jnp.triu(ai, 1)
    full_r = strict_r + strict_r.T + jnp.diag(jnp.diagonal(ar))
    if hermitian:
        full_i = strict_i - strict_i.T
    else:
        full_i = strict_i + strict_i.T + jnp.diag(jnp.diagonal(ai))
    return full_r, full_i


def _symm_hemm_planar(ar, ai, br, bi, side, lower, hermitian, num_moduli,
                      fastmode, backend, epilogue):
    if ar.shape[0] != ar.shape[1]:
        raise ValueError(f"A must be square, got {ar.shape}")
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    full_r, full_i = _full_planar(jnp.asarray(ar), jnp.asarray(ai),
                                  bool(lower), hermitian)
    br = jnp.asarray(br)
    bi = jnp.asarray(bi)
    args = ((full_r, full_i, br, bi) if side == "left"
            else (br, bi, full_r, full_i))
    return gemm_planar(*args, num_moduli=num_moduli, fastmode=fastmode,
                       backend=backend, epilogue=epilogue)


def hemm_planar(ar, ai, br, bi, *, side: str = "left", lower: bool = True,
                num_moduli: int = 8, fastmode="robust",
                backend: str = tables.Backend.INT8, epilogue: str = "auto"):
    """Planar hemm: herm(A) @ B (or B @ herm(A)) on separate real planes;
    bit-identical to hemm() on complex views. Only the `lower` triangle of
    (Ar, Ai) is read; the imaginary diagonal is ignored per BLAS."""
    return _symm_hemm_planar(ar, ai, br, bi, side, lower, True, num_moduli,
                             fastmode, backend, epilogue)


def symm_planar(ar, ai, br, bi, *, side: str = "left", lower: bool = True,
                num_moduli: int = 8, fastmode="robust",
                backend: str = tables.Backend.INT8, epilogue: str = "auto"):
    """Planar complex-symmetric symm (zsymm analog): sym(A) @ B with the
    triangle mirrored WITHOUT conjugation; bit-identical to symm() on
    complex views."""
    return _symm_hemm_planar(ar, ai, br, bi, side, lower, False, num_moduli,
                             fastmode, backend, epilogue)


def hemm(a: jax.Array, b: jax.Array, *, side: str = "left",
         lower: bool = True, num_moduli: int = 8, fastmode="robust",
         backend: str = tables.Backend.INT8, alpha=1.0, beta=0.0,
         c: Optional[jax.Array] = None, epilogue: str = "auto") -> jax.Array:
    """Emulated Hermitian matrix product (zhemm analog):

      C = alpha * herm(A) @ B + beta * C    (side="left")
      C = alpha * B @ herm(A) + beta * C    (side="right")

    Only the `lower`/upper triangle of A is read; the mirror is conjugated
    and the diagonal's imaginary part dropped (assumed zero per BLAS).
    Complex-only; use symm for real or complex-symmetric A.
    """
    a = jnp.asarray(a)
    if not jnp.issubdtype(jnp.asarray(a).dtype, jnp.complexfloating):
        raise TypeError("hemm is complex-only; use symm for real operands")
    return _symm_hemm(a, b, side, lower, True, num_moduli, fastmode,
                      backend, alpha, beta, c, epilogue, "hemm")

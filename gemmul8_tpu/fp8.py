"""FP8 backend: residue planes split into fp8-e4m3-valued pairs/triples.

TPU-native re-design of the reference FP8 path (reference: src/mod.hpp:106-189
``make_fp8x2``/``make_fp8x3``/``mod_f32x3_2_i32``, src/matmult.hpp:180-389
``gemm_low_prec_f8x1/f8x3/f8x9``, src/table.hpp:34-75 FP8 moduli):

  * the FP8 moduli are large (up to 1089), so one residue does not fit a single
    8-bit value; each wrapped residue ``r`` is split error-free into small
    integers that ARE exact fp8-e4m3 values (all in [-16, 16]):
      - perfect-square moduli p = q^2 (the first ``NOT_KARATSUBA`` = 6):
        r = q*bx + by with bx = rint(r/q), by = r - q*bx      (make_fp8x2)
        => r_a*r_b mod p needs 3 products: C0 = ax*by, C1 = ay*bx, C2 = ay*by
        (the q^2*ax*bx term vanishes mod p), recombined q*(C0+C1) + C2;
      - remaining (prime) moduli: r = 16*bx + by with bx = sign(r)*ceil(|r|/16)
        (so |by| <= 15, |bz = bx+by| <= 16), Karatsuba triple (bx, by, bz)
        => C0 = ax*bx, C1 = ay*by, C2 = az*bz,
        recombined 256*C0 + 16*(C2 - C0 - C1) + C1            (mod.hpp:150).
  * on TPU the planes ride the MXU as **bfloat16** carriers: every e4m3 value
    is exactly representable in bf16, bf16 x bf16 products of these small
    integers are exact, and the MXU's float32 accumulation of integer partial
    sums is error-free while |sum| < 2^24 -- giving the same error-free-GEMM
    guarantee as FP8 tensor cores with FP32 accumulation, with K chunked at
    2^16 (256 * 2^16 = 2^24). Native-fp8 MXU paths (v6e+) can adopt this code
    unchanged by casting the planes to float8_e4m3fn.
  * the reference runs 3 GEMMs per modulus (9 for complex) through cuBLASLt;
    here all products form ONE batched ``lax.dot_general`` with batch 3*nu.

Plane storage layout: ``(nu, 3, rows, cols)`` bf16 with canonical slots
(x, y, z) -- z is bx+by for Karatsuba moduli and 0 (unused) for square moduli;
the per-GEMM lhs/rhs stacks are gathered from the slot axis at trace time.
On TPU the fused Pallas encoder (pallas_kernels.encode_planes_fp8_tiles)
emits the ``(3*nu, rows, cols)`` GEMM-ready stack directly instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import tables

#: K chunk bound for exact f32 accumulation of fp8-plane products
#: (max |plane| = 16 -> max product 256; 256 * 2^16 = 2^24)
K_CHUNK_FP8 = 1 << 16


def _sqrt_moduli() -> tuple[int, ...]:
    """Integer square roots of the perfect-square FP8 moduli
    (reference: table.hpp:56-62 sqrt_moduli)."""
    mods = tables.moduli(tables.Backend.FP8)[: tables.NOT_KARATSUBA]
    return tuple(int(np.sqrt(p) + 0.5) for p in mods)


def split_planes(res: jax.Array, num_moduli: int) -> jax.Array:
    """Split wrapped int32 residues (nu, r, c) into e4m3-exact plane triples.

    Returns (nu, 3, r, c) bfloat16 with slots (x, y, z); see module docstring.
    Error-free: r == q*x + y (square moduli) and r == 16*x + y, z == x + y
    (Karatsuba moduli), with every value in [-16, 16].
    """
    mods = tables.moduli(tables.Backend.FP8)[:num_moduli]
    sqrts = _sqrt_moduli()
    nk = tables.NOT_KARATSUBA
    outs = []
    for i in range(num_moduli):
        r = res[i]
        if i < nk:
            q = sqrts[i]
            rf = r.astype(jnp.float32)
            bx = jnp.rint(rf * np.float32(1.0 / q))
            by = rf - np.float32(q) * bx
            bz = jnp.zeros_like(bx)
        else:
            absr = jnp.abs(r)
            mag = (absr + 15) >> 4                     # ceil(|r|/16)
            bx_i = jnp.where(r < 0, -mag, mag)
            by_i = r - 16 * bx_i
            bx = bx_i.astype(jnp.float32)
            by = by_i.astype(jnp.float32)
            bz = (bx_i + by_i).astype(jnp.float32)
        outs.append(jnp.stack([bx, by, bz]).astype(jnp.bfloat16))
    return jnp.stack(outs)


# slot gather orders per modulus kind: products for square moduli are
# (ax*by, ay*bx, ay*by); for Karatsuba (ax*bx, ay*by, az*bz)
_LHS_SLOTS = {"sqrt": (0, 1, 1), "kar": (0, 1, 2)}
_RHS_SLOTS = {"sqrt": (1, 0, 1), "kar": (0, 1, 2)}


def _gemm_stack(planes: jax.Array, num_moduli: int, side: str) -> jax.Array:
    """(nu, 3, r, c) canonical planes -> (3*nu, r, c) batched-GEMM operand."""
    table = _LHS_SLOTS if side == "lhs" else _RHS_SLOTS
    nk = min(num_moduli, tables.NOT_KARATSUBA)
    rows = []
    for i in range(num_moduli):
        for s in table["sqrt" if i < nk else "kar"]:
            rows.append(planes[i, s])
    return jnp.stack(rows)


def lhs_to_rhs_stack(stack3: jax.Array, num_moduli: int) -> jax.Array:
    """Reorder a (3nu, r, c) LHS-slot-order stack into RHS slot order.

    The square-moduli products pair cross slots (ax*by, ay*bx, ay*by), so
    an lhs stack -- group rows (x, y, y) -- reused as the rhs (e.g. syrk's
    transpose view) must permute each group to (y, x, y) = rows (1, 0, 2);
    Karatsuba groups are symmetric (x, y, z) on both sides. Using the raw
    transposed lhs stack as rhs would compute ax*bx + ay*by residues --
    silently wrong for every square modulus."""
    nk = min(num_moduli, tables.NOT_KARATSUBA)
    idx = []
    for i in range(num_moduli):
        idx += ([3 * i + 1, 3 * i, 3 * i + 2] if i < nk
                else [3 * i, 3 * i + 1, 3 * i + 2])
    return stack3[np.asarray(idx)]


def _batched_dot(a3: jax.Array, b3: jax.Array) -> jax.Array:
    """(3nu, m, k) bf16 @ (3nu, k, n) bf16 -> (3nu, m, n) f32: the FP8-analog
    MXU path (reference: matmult.hpp gemm_low_prec_f8x*). Accumulation is
    exact for integer operands while partial sums stay below 2^24."""
    return jax.lax.dot_general(
        a3, b3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _reassemble(c3: jax.Array, num_moduli: int) -> jax.Array:
    """(3nu, m, n) int32 exact products -> (nu, m, n) int32 wrapped residues
    of the per-modulus product (reference: mod.hpp:106-153 mod_f32x3_2_i32)."""
    mods = tables.moduli(tables.Backend.FP8)[:num_moduli]
    sqrts = _sqrt_moduli()
    nk = tables.NOT_KARATSUBA
    outs = []
    for i, p in enumerate(mods):
        c0 = c3[3 * i + 0]
        c1 = c3[3 * i + 1]
        c2 = c3[3 * i + 2]
        if i < nk:
            u = (c0 + c1) % p                         # |c0+c1| < 2^25: safe
            t = (sqrts[i] * u + c2 % p) % p
        else:
            r0, r1, r2 = c0 % p, c1 % p, c2 % p       # each in [0, p)
            t = (256 * r0 + 16 * (r2 - r0 - r1) + r1) % p
        t = jnp.where(2 * t >= p, t - p, t)
        outs.append(t)
    return jnp.stack(outs)


def residue_gemm_fp8(a_planes: jax.Array, b_planes: jax.Array,
                     num_moduli: int) -> jax.Array:
    """Full-K exact FP8-backend residue GEMM -> wrapped int16 C_mid (nu, m, n).

    a_planes: (nu, 3, m, k) bf16; b_planes: (nu, 3, k, n) bf16.
    K beyond K_CHUNK_FP8 is chunked; chunk partials are mod-reduced to int32
    residues and summed exactly in residue space (same scheme as the INT8
    path, lifting any K limit)."""
    # canonical (nu, 3, r, c) planes are gathered into the batched-GEMM
    # order; a 3-D input is ALREADY such a stack (the Pallas FP8 encoder
    # emits it directly, skipping the canonical materialization)
    a3 = a_planes if a_planes.ndim == 3 else _gemm_stack(a_planes, num_moduli, "lhs")
    b3 = b_planes if b_planes.ndim == 3 else _gemm_stack(b_planes, num_moduli, "rhs")
    k = a3.shape[2]
    mods = tables.moduli(tables.Backend.FP8)[:num_moduli]
    if k <= K_CHUNK_FP8:
        c3 = _batched_dot(a3, b3).astype(jnp.int32)
        return _reassemble(c3, num_moduli).astype(jnp.int16)
    acc = _chunked_residue_acc(a3, b3, num_moduli)
    outs = []
    for i, p in enumerate(mods):
        r = acc[i] % p
        r = jnp.where(2 * r >= p, r - p, r)
        outs.append(r.astype(jnp.int16))
    return jnp.stack(outs)


def _chunked_residue_acc(a3: jax.Array, b3: jax.Array,
                         num_moduli: int) -> jax.Array:
    """K-chunked int32 residue accumulator for the FP8 backend: sums of
    per-chunk wrapped residues (|part| <= p/2; <= n_chunks*p/2 < 2^31).
    Feeds the final wrap in residue_gemm_fp8 or the fused Pallas epilogue
    (whose wrap accepts any int32 magnitude). a3/b3 are the (3nu, ...)
    GEMM-ready stacks."""
    k = a3.shape[2]
    n_chunks = -(-k // K_CHUNK_FP8)
    acc = None
    for ci in range(n_chunks):
        sl = slice(ci * K_CHUNK_FP8, min((ci + 1) * K_CHUNK_FP8, k))
        c3 = _batched_dot(a3[:, :, sl], b3[:, sl, :]).astype(jnp.int32)
        part = _reassemble(c3, num_moduli)            # wrapped, |part| <= p/2
        acc = part if acc is None else acc + part
    return acc

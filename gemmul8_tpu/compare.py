"""TPU-native alternative-emulation baselines for the benchmark comparison set.

The reference benchmarks competing emulations for context (reference:
testing/test_accuracy.hpp:84-156 rows "cuBLAS BF16x9" and the cuBLAS 13.1
fixed-point FP64 "Ozaki-1" shim, testing/ozaki1.hpp:8-50). These are their
TPU-native analogs, built on the same MXU paths the emulator uses:

  * matmul_bf16x9 -- f32 GEMM via the 3-way bfloat16 split (9 bf16 MXU
    GEMMs with f32 accumulation), the standard bf16x9 technique cuBLAS
    exposes as CUBLAS_MATH_MODE BF16x9. Error ~ f32-faithful.
  * matmul_os1_int8 -- f64 GEMM via Ozaki scheme I on the int8 MXU:
    row/col power-of-two scaling, 7-bit mantissa slices, one exact int32
    GEMM per slice pair (s+t < d, the standard truncated triangle),
    accumulated largest-first in the output dtype. This is the *scheme-1*
    fixed-point emulation the reference compares against -- d(d+1)/2 GEMMs
    versus scheme II's num_moduli, which is the entire point of the
    comparison row.

Both are deterministic (bit-reproducible for fixed shapes) and run on the
same hardware paths, so accuracy/throughput rows are directly comparable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import quantize

_W = 7                       # slice width (bits) for OS1: products 2^14 * k <= 2^31


def _bf16_split3(x: jax.Array):
    """Exact 3-way bfloat16 split: x == hi + mid + lo + O(2^-48) residual.

    The rounding must be `lax.reduce_precision` (8 exponent / 7 mantissa
    bits == bf16's grid, round-to-nearest-even, staying in f32), NOT an
    f32->bf16->f32 convert round-trip: XLA:TPU's excess-precision pass
    elides convert round-trips, which silently zeroed the mid/lo planes and
    collapsed bf16x9 to single-bf16-pass quality ON DEVICE while the CPU
    path stayed correct (measured: tools/probe_bf16x9.py). The final casts
    to bf16 are exact (the values already sit on bf16's grid)."""
    hi_f = jax.lax.reduce_precision(x, 8, 7)
    r1 = x - hi_f
    mid_f = jax.lax.reduce_precision(r1, 8, 7)
    r2 = r1 - mid_f
    lo_f = jax.lax.reduce_precision(r2, 8, 7)
    return (hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
            lo_f.astype(jnp.bfloat16))


@jax.jit
def matmul_bf16x9(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 matmul via 9 bf16 MXU GEMMs with f32 accumulation (BF16x9 analog).

    Terms are summed smallest-magnitude-first so the f32 combine loses as
    little as possible; one batched dot issues all 9 products.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a3 = _bf16_split3(a)
    b3 = _bf16_split3(b)
    lhs = jnp.stack([a3[i] for i in range(3) for _ in range(3)])
    rhs = jnp.stack([b3[j] for _ in range(3) for j in range(3)])
    prods = jax.lax.dot_general(
        lhs, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (9, m, n)
    order = sorted(range(9), key=lambda t: -(t // 3 + t % 3))
    out = prods[order[0]]
    for t in order[1:]:
        out = out + prods[t]
    return out


def _row_scale_exp(x: jax.Array, axis: int) -> jax.Array:
    """Per-row/col exponent E with |x| * 2^-E-1 < 1 (amax-normalizing)."""
    amax = jnp.max(jnp.abs(x), axis=axis)
    safe = jnp.where(amax > 0, amax, jnp.ones_like(amax))
    return quantize.ilogb(safe) + jnp.int32(1)


def _slices_int8(x: jax.Array, E: jax.Array, axis: int, d: int) -> jax.Array:
    """d exact 7-bit mantissa slices of x * 2^-E: (d, *x.shape) int8 with
    x * 2^-E == sum_s slice_s * 2^-(7(s+1)) + residual(|.| < 2^-7d)."""
    y = quantize.pow2_scale(x, -jnp.expand_dims(E, axis))
    outs = []
    rem = y
    for s in range(d):
        v = jnp.trunc(quantize.pow2_scale(rem, jnp.int32(_W * (s + 1))))
        outs.append(v.astype(jnp.int8))
        rem = rem - quantize.pow2_scale(v, jnp.int32(-_W * (s + 1)))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("d",))
def matmul_os1_int8(a: jax.Array, b: jax.Array, d: int = 8) -> jax.Array:
    """f64 matmul via Ozaki scheme I on the int8 MXU: d 7-bit slices per
    operand, d(d+1)/2 exact int32 GEMMs over the truncated triangle
    s + t < d, combined smallest-first in the output dtype.

    The TPU-native analog of the cuBLAS fixed-point FP64 emulation row
    (reference: testing/ozaki1.hpp:8-50). k <= 2^17 (int32 exactness of
    7-bit slice products).
    """
    out_dtype = a.dtype
    if a.shape[1] > (1 << 17):
        raise ValueError("matmul_os1_int8 supports k <= 2^17")
    Ea = _row_scale_exp(a, 1)
    Eb = _row_scale_exp(b, 0)
    sa = _slices_int8(a, Ea, 1, d)                  # (d, m, k)
    sb = _slices_int8(b, Eb, 0, d)                  # (d, k, n)
    # pairs with s + t < d, batched PER ANTI-DIAGONAL (s + t = tot): bounds
    # peak int32 product memory at d * m * n * 4 instead of materializing
    # all d(d+1)/2 products at once (which OOMs large shapes); the combine
    # stays smallest-magnitude-first and deterministic
    out = None
    for tot in range(d - 1, -1, -1):                # smallest first
        lhs = jnp.stack([sa[s] for s in range(tot + 1)])
        rhs = jnp.stack([sb[tot - s] for s in range(tot + 1)])
        prods = jax.lax.dot_general(
            lhs, rhs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)       # (tot+1, m, n), exact
        # same total => same scale: combine the diagonal in the output
        # dtype in a fixed order (int32 would overflow for k near 2^17)
        group = None
        for s in range(tot + 1):
            g = prods[s].astype(out_dtype)
            group = g if group is None else group + g
        term = quantize.pow2_scale(group, jnp.int32(-_W * (tot + 2)))
        out = term if out is None else out + term
    scale = Ea[:, None] + Eb[None, :]
    return quantize.pow2_scale(out, scale)

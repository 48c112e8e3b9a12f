"""Distributed 2D-sharded SUMMA-style emulated GEMM over a device mesh.

NEW DESIGN (no reference counterpart: the reference is single-GPU by construction,
SURVEY.md section 2.3). Key ideas:

  * quantize BEFORE communicating: the collectives move int8 residue planes, 8x
    fewer bytes than f64 operands (4x vs f32), riding ICI;
  * shift computation is made ORDER-FREE so every mesh shape produces identical
    bits: row/col abs-max via pmax (exact) and the norm accumulated in fixed-point
    int64 (integer psum is associative), so the per-row shift -- and hence every
    residue plane -- is identical on 1 chip, 1 host, or N hosts;
  * cross-device reduction of partial products happens in int32/residue space,
    which is exact and reduction-order-invariant (sums of residues mod p), so
    bit-reproducibility survives resharding -- an invariant the single-GPU
    reference cannot even express;
  * the CRT reconstruction and inverse scaling run locally on each C shard.

Layout (mesh axes ("x", "y")):
  A: P("x", "y") -- (m/X, k/Y) local blocks
  B: P("x", "y") -- (k/X, n/Y) local blocks
  C: P("x", "y") -- (m/X, n/Y) local blocks
A-planes are all-gathered along "y" (K panels), B-planes along "x"; XLA lowers
these to ICI ring all-gathers and overlaps them with the MXU matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import core, quantize, tables

# fixed-point scale for the order-free norm accumulation (z^2 <= ~1 scaled by
# 2^F as int32 per element; the reduction accumulates in int64, leaving room
# for k up to 2^33)
_NORM_FIX_BITS = 30


def make_mesh(shape=None, axis_names=("x", "y")) -> Mesh:
    """Create a 2D mesh over all available devices (largest near-square grid)."""
    devs = np.asarray(jax.devices())
    n = len(devs)
    if shape is None:
        x = int(np.floor(np.sqrt(n)))
        while n % x:
            x -= 1
        shape = (x, n // x)
    return Mesh(devs.reshape(shape), axis_names)


def _ilogb_pmax(ax, reduce_axis, axis_name):
    amax_loc = jnp.max(ax, axis=reduce_axis)
    amax = jax.lax.pmax(amax_loc, axis_name)
    safe = jnp.where(amax > 0, amax, jnp.ones_like(amax))
    return quantize.ilogb(safe), amax


def _shift_fast_dist(x, num_moduli, backend, reduce_axis, axis_name):
    """Distributed fast-mode shift: identical bits for ANY sharding of the
    reduced axis. amax via pmax (exact); norm via fixed-point integer psum
    (associative, order-free), replacing the float sum of quantize.shift_fast.
    Like quantize.shift_fast, the norm math runs in f32 on the leading f32
    component (fast + bit-identical everywhere), with conservative tail
    inflation so the anti-overflow guarantee holds."""
    if x.dtype != jnp.float32 and jax.default_backend() == "cpu":
        # guard the f32 downcast against |x| > f32max (same fix as
        # quantize.shift_fast): prescale overflowing rows by an exact power
        # of two from the GLOBAL (pmax) native-dtype amax, so every shard
        # prescales identically and the order-free-bits invariant holds
        amax_nat = jax.lax.pmax(
            jnp.max(jnp.abs(x), axis=reduce_axis), axis_name)
        E0 = jnp.where(amax_nat > jnp.asarray(2.0 ** 126, x.dtype),
                       quantize.ilogb(jnp.where(amax_nat > 0, amax_nat,
                                                jnp.ones_like(amax_nat))),
                       jnp.int32(0))
        x = quantize.pow2_scale(x, -jnp.expand_dims(E0, reduce_axis))
    else:
        E0 = jnp.int32(0)
    c0 = jnp.abs(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)
    E, amax0 = _ilogb_pmax(c0 * np.float32(1.0 + 2.0 ** -22), reduce_axis,
                           axis_name)
    E = E + E0          # total exponent; z below uses the LOCAL exponent
    z = quantize.pow2_scale(c0, -jnp.expand_dims(E - E0, reduce_axis))
    fx = jnp.floor((z * z) * np.float32(2.0 ** _NORM_FIX_BITS)).astype(jnp.int32)
    s2_int = jax.lax.psum(
        jnp.sum(fx, axis=reduce_axis, dtype=jnp.int64), axis_name)
    # +1 makes it a (tiny) upper bias and guards log2(0)
    s2 = (s2_int + 1).astype(jnp.float32)
    log2vsum = (jnp.log2(s2) - np.float32(_NORM_FIX_BITS)
                + np.float32(2.0) * E.astype(jnp.float32)
                + np.float32(2.0 ** -18))   # tail inflation
    log2vnrm = np.float32(quantize.LOG2_HALF_RU) * log2vsum
    log2p = np.float32(tables.log2P(num_moduli, backend))
    exp1 = (log2p - np.float32(1.5) - jnp.maximum(np.float32(1.0), log2vnrm)
            - np.float32(quantize.SFT_MARGIN))
    sft = jnp.floor(exp1).astype(jnp.int32) - E
    return jnp.where(amax0 > 0, sft, jnp.int32(0))


def _summa_local(a_blk, b_blk, num_moduli, fastmode, backend, epilogue):
    """shard_map body: local quantize -> int8 plane all-gathers -> local exact
    residue GEMM -> local CRT + inverse scaling."""
    del fastmode  # distributed path currently uses (distributed) fast shifts
    # A rows live on this device; norms span the k axis sharded over "y"
    sft_a = _shift_fast_dist(a_blk, num_moduli, backend, 1, "y")
    sft_b = _shift_fast_dist(b_blk, num_moduli, backend, 0, "x")
    pa = quantize.encode_planes(a_blk, sft_a, 0, num_moduli, backend)
    pb = quantize.encode_planes(b_blk, sft_b, 1, num_moduli, backend)
    # int8 K-panel all-gathers (the cheap collectives; 8x fewer bytes than f64)
    # K-axis positions are backend-dependent: INT8 planes are (nu, m, k) /
    # (nu, k, n); FP8 planes carry an extra slot axis (nu, 3, m, k) /
    # (nu, 3, k, n) -- gather A along its last axis, B along the one before
    ag = jax.lax.all_gather(pa, "y", axis=pa.ndim - 1, tiled=True)
    bg = jax.lax.all_gather(pb, "x", axis=pb.ndim - 2, tiled=True)
    c_mid = core.residue_gemm(ag, bg, num_moduli, backend)
    return core.reconstruct_scale(c_mid, sft_a, sft_b, num_moduli, backend,
                                  a_blk.dtype, epilogue)


def summa_gemm(a: jax.Array, b: jax.Array, *, mesh: Mesh | None = None,
               num_moduli: int = 8, fastmode: bool = True,
               backend: str = tables.Backend.INT8,
               epilogue: str = "auto") -> jax.Array:
    """Distributed emulated GEMM: C = A @ B over a 2D mesh.

    a: (m, k), b: (k, n); m, k divisible by mesh.x and k, n by mesh.y.
    Returns C (m, n) sharded P("x", "y"). Bit-identical results for any mesh
    shape (including 1x1) thanks to order-free shift/reduction design.
    """
    if mesh is None:
        mesh = make_mesh()
    lo, hi = tables.VALID_RANGE[np.dtype(a.dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}]")

    spec = P("x", "y")
    a = jax.device_put(a, NamedSharding(mesh, spec))
    b = jax.device_put(b, NamedSharding(mesh, spec))
    # check_vma=False: the Pallas encode kernel's ShapeDtypeStruct outputs
    # carry no varying-mesh-axes annotation, which the vma checker rejects
    # inside shard_map; every output here varies over both axes anyway
    fn = jax.shard_map(
        functools.partial(_summa_local, num_moduli=num_moduli,
                          fastmode=fastmode, backend=backend,
                          epilogue=epilogue),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec, check_vma=False)
    return jax.jit(fn)(a, b)

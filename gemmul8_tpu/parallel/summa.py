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
    """Create a 2D mesh over all available devices (largest near-square grid).

    Multi-process safe: jax.devices() enumerates the GLOBAL device list under
    jax.distributed.initialize, so every process builds the same
    process-spanning mesh (deterministic device order)."""
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


def _shift_fast_dist(x, num_moduli, backend, reduce_axis, axis_name,
                     variant="reference"):
    """Distributed fast-mode shift: identical bits for ANY sharding of the
    reduced axis. amax via pmax (exact); norm via fixed-point integer psum
    (associative, order-free), replacing the float sum of quantize.shift_fast.
    Like quantize.shift_fast, the norm math runs in f32 on the leading f32
    component (fast + bit-identical everywhere), with conservative tail
    inflation so the anti-overflow guarantee holds. variant="invariant" is
    the scale-invariant robust fast shift (see quantize.shift_fast)."""
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
    # Exact order-free accumulation WITHOUT int64 (unavailable when x64 is
    # off -- the usual TPU config, where jnp.sum(dtype=int64) silently
    # truncates to int32 and overflows): split each 31-bit sample into three
    # 13-bit pieces and accumulate each piece with a TWO-TIER int32 scheme:
    #   tier 1: per-chunk sums over <= 2^17 local samples (exact: < 2^30);
    #   tier 2: each chunk sum split at bit 15 into (lo, hi) int32
    #           accumulators, summed locally then psum'd (exact while
    #           #global-chunks * 2^15 < 2^31, i.e. global k <= 2^33).
    # The (lo, hi) pair is then CARRY-PROPAGATED to the canonical form
    # (total mod 2^15, total >> 15) -- a function of the exact global sum
    # only, independent of chunk/shard boundaries -- so the f32 recombination
    # below rounds identically on every mesh shape and the bit-identity
    # invariant holds for any k.
    _CHUNK = 1 << 17
    k_loc = fx.shape[reduce_axis]
    n_ch = max(1, -(-k_loc // _CHUNK))
    pieces = []
    for shift in (0, 13, 26):
        p = jnp.right_shift(fx, jnp.int32(shift)) & jnp.int32(0x1FFF)
        lo_acc = hi_acc = None
        for ci in range(n_ch):
            sl = [slice(None)] * fx.ndim
            sl[reduce_axis] = slice(ci * _CHUNK, min((ci + 1) * _CHUNK, k_loc))
            s = jnp.sum(p[tuple(sl)], axis=reduce_axis, dtype=jnp.int32)
            lo = s & jnp.int32(0x7FFF)
            hi = jnp.right_shift(s, jnp.int32(15))
            lo_acc = lo if lo_acc is None else lo_acc + lo
            hi_acc = hi if hi_acc is None else hi_acc + hi
        lo_acc = jax.lax.psum(lo_acc, axis_name)
        hi_acc = jax.lax.psum(hi_acc, axis_name)
        hi_c = hi_acc + jnp.right_shift(lo_acc, jnp.int32(15))
        lo_c = lo_acc & jnp.int32(0x7FFF)
        pieces.append(lo_c.astype(jnp.float32)
                      + hi_c.astype(jnp.float32) * np.float32(2.0 ** 15))
    # +1 makes it a (tiny) upper bias and guards log2(0)
    s2 = (pieces[0]
          + pieces[1] * np.float32(2.0 ** 13)
          + pieces[2] * np.float32(2.0 ** 26)
          + np.float32(1.0))
    log2vsum = (jnp.log2(s2) - np.float32(_NORM_FIX_BITS)
                + np.float32(2.0) * E.astype(jnp.float32)
                + np.float32(2.0 ** -18))   # tail inflation
    log2vnrm = np.float32(quantize.LOG2_HALF_RU) * log2vsum
    log2p = np.float32(tables.log2P(num_moduli, backend))
    if variant == "invariant":
        exp1 = (log2p - np.float32(1.5) - log2vnrm
                - np.float32(quantize.SFT_MARGIN))
        sft = jnp.floor(exp1).astype(jnp.int32)
    else:
        exp1 = (log2p - np.float32(1.5)
                - jnp.maximum(np.float32(1.0), log2vnrm)
                - np.float32(quantize.SFT_MARGIN))
        sft = jnp.floor(exp1).astype(jnp.int32) - E
    return jnp.where(amax0 > 0, sft, jnp.int32(0))


def _extract_ub_dist(x, backend, scale_axis, axis_name):
    """Distributed analog of quantize.extract_ub_plane: the amax reduction
    spans the sharded axis via pmax (order-free), everything else is
    elementwise -- bit-identical to the single-device extraction for any
    sharding. (reference: scaling_accu_real.hpp:23-136)"""
    reduce_axis = 1 - scale_axis
    ax = jnp.abs(x)
    if x.dtype != jnp.float32 and jax.default_backend() != "cpu":
        # accelerator: f64 cross-device MAX cannot lower under the f32-pair
        # x64 rewrite ("Supported lowering only of Sum all reduce"); the
        # amax only feeds ilogb, whose in-range path reads the f32 exponent
        # anyway, and f64-pair storage cannot exceed f32's range -- so the
        # pmax rides f32 exactly (order-free, mesh-shape-invariant)
        amax = jax.lax.pmax(
            jnp.max(ax, axis=reduce_axis).astype(jnp.float32),
            axis_name).astype(x.dtype)
    else:
        amax = jax.lax.pmax(jnp.max(ax, axis=reduce_axis), axis_name)
    E = quantize.ilogb(jnp.where(amax > 0, amax, jnp.ones_like(amax)))
    sft_pre = np.int32(quantize.MAX_UFP[backend]) - E
    # the extraction itself is the single-device one (incl. the FP8 bf16
    # round-UP bump); only the amax reduction above is distributed
    return quantize.extract_ub_with_pre(ax, sft_pre, reduce_axis,
                                        backend), sft_pre


def _shift_accu_dist(a_blk, b_blk, num_moduli, backend):
    """Distributed ACCURATE-mode shifts (VERDICT item 3): the two-phase
    product-magnitude estimation with the extract GEMM sharded over the same
    mesh. The estimation operands are single int8 planes (1/nu of the
    residue-plane bytes), gathered with the same cheap int8 collectives; the
    row/col maxima of the estimate are pmax-reduced (order-free), so the
    resulting shifts -- and every residue plane -- are bit-identical on any
    mesh shape. (reference: scaling_accu_real.hpp:380-457)"""
    ub_a, pre_a = _extract_ub_dist(a_blk, backend, 0, "y")
    ub_b, pre_b = _extract_ub_dist(b_blk, backend, 1, "x")
    ag = jax.lax.all_gather(ub_a, "y", axis=1, tiled=True)
    bg = jax.lax.all_gather(ub_b, "x", axis=0, tiled=True)
    c_hi = quantize.estimate_gemm(ag, bg, backend)
    row_max = jax.lax.pmax(jnp.max(c_hi, axis=1), "y")
    col_max = jax.lax.pmax(jnp.max(c_hi, axis=0), "x")
    sft_a = quantize.shift_accu_from_chi(row_max, pre_a, num_moduli, backend)
    sft_b = quantize.shift_accu_from_chi(col_max, pre_b, num_moduli, backend)
    return sft_a, sft_b


def _dist_shifts(a_blk, b_blk, num_moduli, fastmode, backend):
    if fastmode:
        var = "invariant" if fastmode == "robust" else "reference"
        sft_a = _shift_fast_dist(a_blk, num_moduli, backend, 1, "y",
                                 variant=var)
        sft_b = _shift_fast_dist(b_blk, num_moduli, backend, 0, "x",
                                 variant=var)
        return sft_a, sft_b
    return _shift_accu_dist(a_blk, b_blk, num_moduli, backend)


def _extract_ub_lanes_dist(re, im, scale_axis, axis_name, backend):
    """Distributed analog of complex_gemm._extract_ub_lanes: ONE shared
    pre-shift per row/col from the GLOBAL amax(max(|Re|,|Im|)) via pmax
    (order-free), then the local per-lane ub extraction -- bit-identical
    lane extracts for any sharding of the reduced axis."""
    reduce_axis = 1 - scale_axis
    ar_, ai_ = jnp.abs(re), jnp.abs(im)
    loc = jnp.max(jnp.maximum(ar_, ai_), axis=reduce_axis)
    if re.dtype != jnp.float32 and jax.default_backend() != "cpu":
        # f64 cross-device MAX cannot lower under the f32-pair x64 rewrite;
        # the amax only feeds ilogb and f64-pair storage cannot exceed f32's
        # range, so the pmax rides f32 exactly (see _extract_ub_dist)
        amax = jax.lax.pmax(loc.astype(jnp.float32),
                            axis_name).astype(re.dtype)
    else:
        amax = jax.lax.pmax(loc, axis_name)
    E = quantize.ilogb(jnp.where(amax > 0, amax, jnp.ones_like(amax)))
    pre = np.int32(quantize.MAX_UFP[backend]) - E
    ub_r = quantize.extract_ub_with_pre(ar_, pre, reduce_axis, backend)
    ub_i = quantize.extract_ub_with_pre(ai_, pre, reduce_axis, backend)
    return ub_r, ub_i, ub_r - ub_i, pre


def _shift_accu_dist_cplx(ar, ai, br, bi, num_moduli, backend):
    """Distributed ACCURATE-mode complex shifts: the 3M product-bound
    estimation (complex_gemm._shift_complex_accu) with the three lane
    estimation GEMMs sharded over the mesh. Lane extracts are single
    int8/bf16 planes gathered with the same cheap collectives as the real
    path; the row/col bound maxima are pmax-reduced (order-free), so the
    shifts are bit-identical on any mesh shape."""
    from .. import complex_gemm as cg
    ua_r, ua_i, ua_ri, pre_a = _extract_ub_lanes_dist(ar, ai, 0, "y", backend)
    ub_r, ub_i, ub_ri, pre_b = _extract_ub_lanes_dist(br, bi, 1, "x", backend)
    lhs = jnp.stack([ua_ri, ua_r, ua_i])        # (3, m_loc, k/Y)
    rhs = jnp.stack([ub_ri, ub_i, ub_r])        # (3, k/X, n_loc)
    lg = jax.lax.all_gather(lhs, "y", axis=2, tiled=True)
    bg = jax.lax.all_gather(rhs, "x", axis=1, tiled=True)
    d = jax.vmap(lambda l, r: quantize.estimate_gemm(l, r, backend))(lg, bg)
    bound = cg._combine_3m_bound(d, backend)
    row_max = jax.lax.pmax(jnp.max(bound, axis=1), "y")
    col_max = jax.lax.pmax(jnp.max(bound, axis=0), "x")
    sft_a = quantize.shift_accu_from_chi(row_max, pre_a, num_moduli, backend)
    sft_b = quantize.shift_accu_from_chi(col_max, pre_b, num_moduli, backend)
    return sft_a, sft_b


def _dist_shifts_cplx(ar, ai, br, bi, num_moduli, fastmode, backend):
    """Distributed shared complex shifts: fast mode concatenates the (Re, Im)
    planes along the reduced axis -- amax = max(|Re|,|Im|) via pmax and
    norm^2 = sum(Re^2 + Im^2) via the order-free two-tier reduction, exactly
    the reference's complex reduction (scaling_fast_complex.hpp) made
    mesh-shape-invariant."""
    if fastmode:
        var = "invariant" if fastmode == "robust" else "reference"
        sft_a = _shift_fast_dist(jnp.concatenate([ar, ai], axis=1),
                                 num_moduli, backend, 1, "y", variant=var)
        sft_b = _shift_fast_dist(jnp.concatenate([br, bi], axis=0),
                                 num_moduli, backend, 0, "x", variant=var)
        return sft_a, sft_b
    return _shift_accu_dist_cplx(ar, ai, br, bi, num_moduli, backend)


def _summa_local_cplx(ar_blk, ai_blk, br_blk, bi_blk, num_moduli, fastmode,
                      backend, epilogue):
    """shard_map body for the PLANAR-COMPLEX SUMMA (gather path): shared
    order-free shifts -> local 3-lane quantization (Re, Im, (Re+Im) mod p;
    reference: gemmul8_complex.hpp:52-226 lane structure) -> int8 lane-plane
    all-gathers (3x the real path's collective bytes, still 8x cheaper than
    gathering c128 operands) -> local exact lane-product residue GEMMs ->
    local 3M recombine + dual CRT per C shard."""
    from .. import complex_gemm as cg
    sft_a, sft_b = _dist_shifts_cplx(ar_blk, ai_blk, br_blk, bi_blk,
                                     num_moduli, fastmode, backend)
    pa = cg._quantize_complex(ar_blk, ai_blk, sft_a, 0, num_moduli, backend,
                              conj=False)
    pb = cg._quantize_complex(br_blk, bi_blk, sft_b, 1, num_moduli, backend,
                              conj=False)
    # lane plane sets shard exactly like real planes: K-panel all-gathers of
    # the (3, nu, ...) stacks along the same axes (FP8 lanes carry the extra
    # slot axis; A's k is always last, B's is second-to-last)
    ag = jax.lax.all_gather(pa, "y", axis=pa.ndim - 1, tiled=True)
    bg = jax.lax.all_gather(pb, "x", axis=pb.ndim - 2, tiled=True)
    mids = jax.vmap(
        lambda x, y: core.residue_gemm(x, y, num_moduli, backend))(ag, bg)
    mid_r, mid_i = cg._recombine_3m(mids, num_moduli, backend)
    cr = core.reconstruct_scale(mid_r, sft_a, sft_b, num_moduli, backend,
                                ar_blk.dtype, epilogue)
    ci = core.reconstruct_scale(mid_i, sft_a, sft_b, num_moduli, backend,
                                ar_blk.dtype, epilogue)
    return cr, ci


def _summa_stream_local_cplx(ar_blk, ai_blk, br_blk, bi_blk, num_moduli,
                             fastmode, backend, epilogue, k_panel, k,
                             x_size, y_size, bcast="ring"):
    """K-panel-STREAMING planar-complex SUMMA body (INT8): the 3*nu lane
    planes stream through the same ring/psum panel broadcasts as the real
    path (lane i of A pairs with lane i of B -- the lane axis is just more
    batch), accumulating the three lane products in residue space; the 3M
    recombine and dual CRT run once at the end, locally per C shard.
    Bit-identical to the gather path and to every mesh shape."""
    from .. import complex_gemm as cg
    sft_a, sft_b = _dist_shifts_cplx(ar_blk, ai_blk, br_blk, bi_blk,
                                     num_moduli, fastmode, backend)
    pa = cg._quantize_complex(ar_blk, ai_blk, sft_a, 0, num_moduli, backend,
                              conj=False)
    pb = cg._quantize_complex(br_blk, bi_blk, sft_b, 1, num_moduli, backend,
                              conj=False)
    planes = 3 * num_moduli
    m_loc, n_loc = pa.shape[-2], pb.shape[-1]
    pa = pa.reshape(planes, m_loc, pa.shape[-1])
    pb = pb.reshape(planes, pb.shape[-2], n_loc)
    k_y = k // y_size
    k_x = k // x_size
    w = k_panel
    steps = k // w
    p_max = int(max(tables.moduli(backend)[:num_moduli]))
    acc_bound = steps * p_max            # per-step residues in [0, p)
    if acc_bound >= 2 ** 31:
        raise ValueError(
            f"streamed residue accumulator would overflow int32: {steps} "
            f"steps x p_max={p_max}; raise k_panel or use the gather path")
    mods = jnp.asarray(tables.moduli(backend)[:num_moduli], jnp.int32)
    mods3 = jnp.tile(mods, 3).reshape(planes, 1, 1)

    def bcast_fn(t):
        a_pan = _bcast_panel(pa, "y", (t * w) // k_y,
                             t * w - ((t * w) // k_y) * k_y,
                             (planes, m_loc, w), 2, y_size, bcast)
        b_pan = _bcast_panel(pb, "x", (t * w) // k_x,
                             t * w - ((t * w) // k_x) * k_x,
                             (planes, w, n_loc), 1, x_size, bcast)
        return a_pan, b_pan

    def step_acc(acc, ap, bp):
        part = core.residue_matmul(ap, bp)          # exact: w <= 2^17
        return acc + part % mods3                   # residues add mod p

    def body(t, carry):
        acc, ap, bp = carry
        nxt = bcast_fn(t + 1)
        return (step_acc(acc, ap, bp), *nxt)

    a0, b0 = bcast_fn(jnp.int32(0))
    acc0 = jnp.zeros((planes, m_loc, n_loc), jnp.int32)
    acc, ap, bp = jax.lax.fori_loop(0, steps - 1, body, (acc0, a0, b0))
    acc = step_acc(acc, ap, bp)
    r = acc % mods3
    c_mid3 = jnp.where(2 * r >= mods3, r - mods3, r).astype(jnp.int8)
    mid_r, mid_i = cg._recombine_3m(
        c_mid3.reshape(3, num_moduli, m_loc, n_loc), num_moduli, backend)
    cr = core.reconstruct_scale(mid_r, sft_a, sft_b, num_moduli, backend,
                                ar_blk.dtype, epilogue)
    ci = core.reconstruct_scale(mid_i, sft_a, sft_b, num_moduli, backend,
                                ar_blk.dtype, epilogue)
    return cr, ci


def _summa_local(a_blk, b_blk, num_moduli, fastmode, backend, epilogue):
    """shard_map body: local quantize -> int8 plane all-gathers -> local exact
    residue GEMM -> local CRT + inverse scaling."""
    # A rows live on this device; norms span the k axis sharded over "y"
    sft_a, sft_b = _dist_shifts(a_blk, b_blk, num_moduli, fastmode, backend)
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


def _ring_bcast_from(window, axis_name, o, team):
    """Pipelined bidirectional-ring broadcast from STATIC owner `o`: the
    panel hops neighbor-to-neighbor via single-pair ppermutes, so each ICI
    link carries the panel at most ONCE (a masked psum's ring all-reduce
    moves ~2x the bytes). ceil((team-1)/2) rounds; the hop latency hides
    under the streaming loop's prefetch overlap. `window` must be the
    panel on the owner and zeros elsewhere; arrivals combine by addition
    (exact: one nonzero contributor per member)."""
    if team == 1:
        return window
    cur = window
    n_fwd = team // 2                  # owner+1 .. owner+n_fwd
    n_bwd = team - 1 - n_fwd           # owner-1 .. owner-n_bwd
    # the backward chain starts one round late: ppermute requires unique
    # sources per call, and at round 0 only the owner holds the panel
    for r in range(max(n_fwd, n_bwd + 1)):
        pairs = []
        if r < n_fwd:
            pairs.append(((o + r) % team, (o + r + 1) % team))
        if 1 <= r <= n_bwd:
            pairs.append(((o - (r - 1)) % team, (o - r) % team))
        if pairs:
            cur = cur + jax.lax.ppermute(cur, axis_name, pairs)
    return cur


def _bcast_panel(planes, axis_name, owner, off, sizes, slice_axis, team,
                 method="ring"):
    """Deliver one k-panel to every member of a mesh-axis team: the owner
    extracts its local window, everyone else contributes zeros, then either
    a pipelined ppermute ring (method="ring", default: 1x panel bytes per
    link) or a masked integer psum (method="psum": simpler, ~2x bytes)
    broadcasts it. Both are order-free with a single nonzero contributor,
    so the delivered integers -- and hence the residue accumulation -- are
    bit-identical between methods and across mesh shapes. SPMD-uniform:
    the dynamic_slice start is clamped to 0 on non-owners, and the ring's
    static per-owner ppermute chains are selected by lax.switch on the
    (dynamic) owner index."""
    me = jax.lax.axis_index(axis_name)
    is_owner = (me == owner)
    starts = [jnp.int32(0)] * planes.ndim
    starts[slice_axis] = jnp.where(is_owner, off, 0).astype(jnp.int32)
    window = jax.lax.dynamic_slice(planes, starts, sizes)
    window = jnp.where(is_owner, window, jnp.zeros_like(window))
    if method == "psum" or team == 1:
        return jax.lax.psum(window, axis_name)
    return jax.lax.switch(
        jnp.clip(owner.astype(jnp.int32), 0, team - 1),
        [functools.partial(_ring_bcast_from, axis_name=axis_name, o=o,
                           team=team) for o in range(team)],
        window)


def _summa_stream_local(a_blk, b_blk, num_moduli, fastmode, backend,
                        epilogue, k_panel, k, x_size, y_size, bcast="ring"):
    """shard_map body for the K-panel-STREAMING SUMMA (VERDICT item 2): no
    full-K gather is ever materialized. Per step t, the int8 residue planes
    of k-panel t are broadcast to the row team (A, along "y") and column
    team (B, along "x"); the panel's exact int32 dot is wrapped per modulus
    and accumulated in residue space (order-free => bit-identical to the
    gather path and to every mesh shape). Per-device peak memory is
    O(nu * m_loc * k_panel) for the in-flight panels -- the analog of the
    reference's bounded-workspace N-blocking (matmult.hpp:68-75) at
    distributed scale. The next panel's broadcast is issued before the
    current dot so XLA can overlap collectives with MXU work."""
    sft_a, sft_b = _dist_shifts(a_blk, b_blk, num_moduli, fastmode, backend)
    pa = quantize.encode_planes(a_blk, sft_a, 0, num_moduli, backend)
    pb = quantize.encode_planes(b_blk, sft_b, 1, num_moduli, backend)
    if backend == tables.Backend.FP8:
        # normalize to the (3*nu, ..) GEMM-ready stacks (the Pallas FP8
        # encoder emits them directly; the jnp path gives canonical 4-D)
        from .. import fp8
        if pa.ndim == 4:
            pa = fp8._gemm_stack(pa, num_moduli, "lhs")
            pb = fp8._gemm_stack(pb, num_moduli, "rhs")
    planes = pa.shape[0]                   # nu (INT8) or 3*nu (FP8)
    m_loc = pa.shape[1]
    n_loc = pb.shape[2]
    k_y = k // y_size                      # local A panel width
    k_x = k // x_size                      # local B panel height
    w = k_panel
    steps = k // w
    p_max = int(max(tables.moduli(backend)[:num_moduli]))
    # INT8 accumulates per-step residues in [0, p) -> |acc| < steps * p;
    # FP8 accumulates wrapped residues in [-p/2, p/2] -> |acc| <= steps * p/2.
    acc_bound = steps * p_max if backend == tables.Backend.INT8 \
        else steps * p_max // 2
    if acc_bound >= 2 ** 31:   # raise, not assert: must survive python -O
        raise ValueError(
            f"streamed residue accumulator would overflow int32: {steps} "
            f"steps x p_max={p_max}; raise k_panel or use the gather path")
    mods = jnp.asarray(tables.moduli(backend)[:num_moduli],
                       jnp.int32).reshape(num_moduli, 1, 1)

    def bcast_fn(t):
        a_pan = _bcast_panel(pa, "y", (t * w) // k_y,
                             t * w - ((t * w) // k_y) * k_y,
                             (planes, m_loc, w), 2, y_size, bcast)
        b_pan = _bcast_panel(pb, "x", (t * w) // k_x,
                             t * w - ((t * w) // k_x) * k_x,
                             (planes, w, n_loc), 1, x_size, bcast)
        return a_pan, b_pan

    def step_acc(acc, ap, bp):
        if backend == tables.Backend.FP8:
            from .. import fp8
            c3 = fp8._batched_dot(ap, bp).astype(jnp.int32)
            part = fp8._reassemble(c3, num_moduli)  # wrapped, |.| <= p/2
            return acc + part                       # <= steps*p/2: exact
        part = core.residue_matmul(ap, bp)          # exact: w <= 2^17
        return acc + part % mods                    # residues add mod p

    def body(t, carry):
        acc, ap, bp = carry
        # prefetch the next panel first: independent of this step's dot, so
        # the compiler is free to overlap the collectives with the MXU work
        nxt = bcast_fn(t + 1)
        return (step_acc(acc, ap, bp), *nxt)

    a0, b0 = bcast_fn(jnp.int32(0))
    acc0 = jnp.zeros((num_moduli, m_loc, n_loc), jnp.int32)
    # the LAST step is peeled out of the loop so no (steps+1)-th broadcast
    # is ever issued: measured ICI traffic == summa_bytes_moved's model
    acc, ap, bp = jax.lax.fori_loop(0, steps - 1, body, (acc0, a0, b0))
    acc = step_acc(acc, ap, bp)
    r = acc % mods                   # exact: acc_bound < 2^31 asserted above
    mid_t = jnp.int8 if backend == tables.Backend.INT8 else jnp.int16
    c_mid = jnp.where(2 * r >= mods, r - mods, r).astype(mid_t)
    return core.reconstruct_scale(c_mid, sft_a, sft_b, num_moduli, backend,
                                  a_blk.dtype, epilogue)


def summa_gemm(a: jax.Array, b: jax.Array, *, mesh: Mesh | None = None,
               num_moduli: int = 8, fastmode: bool | str = True,
               backend: str = tables.Backend.INT8,
               epilogue: str = "auto", k_panel: int | None = None,
               bcast: str = "ring") -> jax.Array:
    """Distributed emulated GEMM: C = A @ B over a 2D mesh.

    a: (m, k), b: (k, n); m, k divisible by mesh.x and k, n by mesh.y.
    Returns C (m, n) sharded P("x", "y"). Bit-identical results for any mesh
    shape (including 1x1) thanks to order-free shift/reduction design.

    fastmode=False runs the distributed two-phase accurate-mode estimation
    (the extract GEMM sharded over the same mesh); fastmode="robust" uses
    the scale-invariant fast shifts (see quantize.shift_fast) -- same cost
    as True, rigorous CRT budget for adversarial operand scales.

    k_panel selects the K-panel-STREAMING algorithm with per-device panel
    memory O(nu * m_loc * k_panel) instead of the full-K gather -- required
    for huge problems (e.g. 65536^3) whose gathered planes exceed HBM.
    k_panel must divide k/mesh.x and k/mesh.y and be <= 2^17.

    bcast picks the streaming panel-broadcast algorithm: "ring" (default,
    pipelined single-pair ppermute hops -- each ICI link carries each panel
    once) or "psum" (masked all-reduce, ~2x the bytes, fewer sequential
    hops). Bit-identical outputs either way.
    """
    if bcast not in ("ring", "psum"):
        raise ValueError(f"bcast must be 'ring' or 'psum', got {bcast!r}")
    if mesh is None:
        mesh = make_mesh()
    if jnp.issubdtype(jnp.dtype(a.dtype), jnp.complexfloating):
        # complex-dtype convenience wrapper over the planar distributed path
        # (the device-native complex entry -- some TPU runtimes lack complex
        # dtypes entirely; CPU/virtual meshes take this path fine)
        cr, ci = summa_gemm_planar(
            jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b), mesh=mesh,
            num_moduli=num_moduli, fastmode=fastmode, backend=backend,
            epilogue=epilogue, k_panel=k_panel, bcast=bcast)
        return jax.lax.complex(cr, ci).astype(a.dtype)
    lo, hi = tables.VALID_RANGE[np.dtype(a.dtype).name]
    if not lo <= num_moduli <= hi:
        raise ValueError(f"num_moduli={num_moduli} out of [{lo},{hi}]")
    if fastmode and a.shape[1] > (1 << 33):
        raise ValueError(
            "fast-mode distributed shifts support k <= 2^33 (two-tier exact "
            "int32 norm pieces); use fastmode=False for larger k")

    tgt = NamedSharding(mesh, P("x", "y"))
    a = _ensure_sharded(a, tgt)
    b = _ensure_sharded(b, tgt)
    x_size, y_size = mesh.devices.shape
    k = a.shape[1]
    if k_panel is not None:
        if k % k_panel or (k // x_size) % k_panel or (k // y_size) % k_panel:
            raise ValueError(
                f"k_panel={k_panel} must divide k/mesh.x={k // x_size} "
                f"and k/mesh.y={k // y_size}")
        k_lim = 17 if backend == tables.Backend.INT8 else 16
        if k_panel > (1 << k_lim):
            raise ValueError(
                f"k_panel must be <= 2^{k_lim} for {backend} "
                "(exact accumulation of panel products)")
    fn = _summa_jit(mesh, num_moduli, fastmode, backend, epilogue,
                    k_panel, bcast, k)
    return fn(a, b)


def summa_gemm_planar(ar: jax.Array, ai: jax.Array, br: jax.Array,
                      bi: jax.Array, *, mesh: Mesh | None = None,
                      num_moduli: int = 8, fastmode: bool | str = True,
                      backend: str = tables.Backend.INT8,
                      epilogue: str = "auto", k_panel: int | None = None,
                      bcast: str = "ring"):
    """Distributed emulated COMPLEX GEMM on planar operands:
    (Ar, Ai) x (Br, Bi) -> (Cr, Ci) over a 2D mesh (the device-native
    complex entry; summa_gemm on complex dtypes delegates here).

    The 3-lane residue plane sets (Re, Im, (Re+Im) mod p; reference:
    gemmul8_complex.hpp:52-226) shard exactly like real planes -- int8
    collectives x3 lanes -- and the 3M recombine + dual CRT run locally per
    C shard. Shifts are shared per row/col from max(|Re|,|Im|) and the joint
    norm, via the same order-free pmax + two-tier-psum reductions as the
    real path, so results are bit-identical for ANY mesh shape and between
    the gather and k_panel-streaming algorithms.

    k_panel (K-panel streaming, bounded memory) supports the INT8 backend;
    FP8 lane planes take the gather path.
    """
    if bcast not in ("ring", "psum"):
        raise ValueError(f"bcast must be 'ring' or 'psum', got {bcast!r}")
    if mesh is None:
        mesh = make_mesh()
    if not (ar.dtype == ai.dtype == br.dtype == bi.dtype):
        raise TypeError(
            f"planar components must share one real dtype, got "
            f"{ar.dtype}/{ai.dtype}/{br.dtype}/{bi.dtype}")
    if ar.shape != ai.shape or br.shape != bi.shape:
        raise ValueError(
            f"planar component shapes differ: A {ar.shape} vs {ai.shape}, "
            f"B {br.shape} vs {bi.shape}")
    if np.dtype(ar.dtype).name not in ("float32", "float64"):
        raise TypeError(f"planar components must be f32/f64 real planes, "
                        f"got {ar.dtype}")
    name = {"float32": "complex64", "float64": "complex128"}[
        np.dtype(ar.dtype).name]
    lo, hi = tables.VALID_RANGE[name]
    if not lo <= num_moduli <= hi:
        raise ValueError(
            f"num_moduli={num_moduli} out of [{lo},{hi}] for {name}")
    if backend not in (tables.Backend.INT8, tables.Backend.FP8):
        raise ValueError(f"backend must be 'INT8' or 'FP8', got {backend!r}")
    if fastmode and ar.shape[1] > (1 << 32):
        raise ValueError(
            "fast-mode distributed complex shifts support k <= 2^32 (the "
            "Re/Im lane concat doubles the two-tier norm sample count); use "
            "fastmode=False for larger k")
    tgt = NamedSharding(mesh, P("x", "y"))
    ar = _ensure_sharded(ar, tgt)
    ai = _ensure_sharded(ai, tgt)
    br = _ensure_sharded(br, tgt)
    bi = _ensure_sharded(bi, tgt)
    x_size, y_size = mesh.devices.shape
    k = ar.shape[1]
    if k_panel is not None:
        if backend != tables.Backend.INT8:
            raise ValueError(
                "k_panel streaming supports the INT8 backend only for "
                "complex operands; use the gather path (k_panel=None) "
                "for FP8")
        if k % k_panel or (k // x_size) % k_panel or (k // y_size) % k_panel:
            raise ValueError(
                f"k_panel={k_panel} must divide k/mesh.x={k // x_size} "
                f"and k/mesh.y={k // y_size}")
        if k_panel > (1 << 17):
            raise ValueError("k_panel must be <= 2^17 for INT8 "
                             "(exact accumulation of panel products)")
    fn = _summa_jit_cplx(mesh, num_moduli, fastmode, backend, epilogue,
                         k_panel, bcast, k)
    return fn(ar, ai, br, bi)


@functools.lru_cache(maxsize=None)
def _summa_jit_cplx(mesh, num_moduli, fastmode, backend, epilogue, k_panel,
                    bcast, k):
    """One jitted planar-complex SUMMA program per config (see _summa_jit)."""
    spec = P("x", "y")
    x_size, y_size = mesh.devices.shape
    if k_panel is not None:
        body = functools.partial(
            _summa_stream_local_cplx, num_moduli=num_moduli,
            fastmode=fastmode, backend=backend, epilogue=epilogue,
            k_panel=k_panel, k=k, x_size=x_size, y_size=y_size, bcast=bcast)
    else:
        body = functools.partial(_summa_local_cplx, num_moduli=num_moduli,
                                 fastmode=fastmode, backend=backend,
                                 epilogue=epilogue)
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec), check_vma=False))


def _ensure_sharded(x, tgt):
    """Accept already-sharded global arrays as-is; reshard mismatched
    GLOBAL arrays with a jitted identity (a collective relayout, legal
    across processes -- e.g. transposed-sharding slices coming out of
    the solver/QR layers); device_put covers single-process inputs.
    Host (non-jax) arrays on a multi-process mesh cannot be sharded
    here -- build them with jax.make_array_from_callback."""
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        try:
            if x.sharding.is_equivalent_to(tgt, x.ndim):
                return x
        except Exception:
            if x.sharding == tgt:
                return x
        if not x.is_fully_addressable:
            return _reshard_jit(tgt)(x)
    return jax.device_put(x, tgt)


@functools.lru_cache(maxsize=None)
def _reshard_jit(tgt):
    """One jitted identity-relayout per target sharding (see _summa_jit for
    why the wrapper must be cached)."""
    return jax.jit(lambda y: y, out_shardings=tgt)


@functools.lru_cache(maxsize=None)
def _summa_jit(mesh, num_moduli, fastmode, backend, epilogue, k_panel,
               bcast, k):
    """One jitted SUMMA program per config: without this cache every
    summa_gemm call would build a fresh shard_map + jit wrapper, whose
    identity keys jax's own trace cache -- i.e. a full XLA recompile per
    call, catastrophic for the solver/QR layers issuing O(n/block) calls
    per factorization. (jax.jit caches on fn identity + shapes; returning
    the same wrapper here lets its shape-level cache work.)"""
    spec = P("x", "y")
    x_size, y_size = mesh.devices.shape
    if k_panel is not None:
        body = functools.partial(
            _summa_stream_local, num_moduli=num_moduli, fastmode=fastmode,
            backend=backend, epilogue=epilogue, k_panel=k_panel, k=k,
            x_size=x_size, y_size=y_size, bcast=bcast)
    else:
        body = functools.partial(_summa_local, num_moduli=num_moduli,
                                 fastmode=fastmode, backend=backend,
                                 epilogue=epilogue)
    # check_vma=False: the Pallas encode kernel's ShapeDtypeStruct outputs
    # carry no varying-mesh-axes annotation, which the vma checker rejects
    # inside shard_map; every output here varies over both axes anyway
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                                 out_specs=spec, check_vma=False))


def summa_work_bytes(m: int, n: int, k: int, mesh_shape: tuple[int, int],
                     num_moduli: int, dtype=jnp.float64,
                     k_panel: int | None = None,
                     backend: str = tables.Backend.INT8) -> int:
    """Per-device peak memory model (bytes) for summa_gemm: inputs + residue
    planes + (gathered K panels | 2 streamed panels) + residue accumulator +
    epilogue buffers + output. The planning analog of gemmul8::workSize for
    the distributed layer; with k_panel it proves the 65536^3 (config 5)
    footprint fits a pod-slice HBM.

    FP8 planes carry 3 bf16 slots per element (6 B vs INT8's 1 B) and an
    int16 c_mid -- mirroring core.work_bytes' per-backend sizes.

    Complex dtypes (summa_gemm_planar) triple the plane/panel/accumulator
    terms (the 3M lane sets) and double the epilogue term (dual CRT); the
    complex itemsize already covers both input planes."""
    X, Y = mesh_shape
    dt = jnp.dtype(dtype)
    lanes = 3 if jnp.issubdtype(dt, jnp.complexfloating) else 1
    it = dt.itemsize
    plane_b = 6 if backend == tables.Backend.FP8 else 1
    mid_b = 2 if backend == tables.Backend.FP8 else 1
    m_l, n_l, k_y, k_x = m // X, n // Y, k // Y, k // X
    nu = num_moduli
    inputs = (m_l * k_y + k_x * n_l) * it
    planes = lanes * nu * plane_b * (m_l * k_y + k_x * n_l)
    if k_panel is None:
        panels = lanes * nu * plane_b * (m_l * k + k * n_l)  # full-K gathers
        # gathered k beyond the exact-dot bound runs the chunked residue
        # accumulation inside core.residue_gemm (int32 accumulator)
        k_lim = core.K_CHUNK if backend == tables.Backend.INT8 else (1 << 16)
        acc = 4 * lanes * nu * m_l * n_l if k > k_lim else 0
    else:
        panels = 2 * lanes * nu * plane_b * k_panel * (m_l + n_l)  # dbl-buf
        acc = 4 * lanes * nu * m_l * n_l               # int32 residue acc
    c_mid = lanes * nu * mid_b * m_l * n_l
    epilogue = (2 if lanes == 3 else 1) * 2 * 4 * m_l * n_l  # hi/lo f32 pair
    out = m_l * n_l * it
    return inputs + planes + panels + acc + c_mid + epilogue + out


def summa_bytes_moved(m: int, n: int, k: int, mesh_shape: tuple[int, int],
                      num_moduli: int, k_panel: int | None = None,
                      bcast: str = "ring",
                      backend: str = tables.Backend.INT8,
                      fastmode: bool | str = True,
                      complex_lanes: bool = False) -> int:
    """Total collective plane bytes CROSSING LINKS per device (send side) for
    one summa_gemm -- the ICI traffic model that motivates quantize-before-
    communicate and the ring broadcast:

      * gather path: ring all-gather moves (team-1)/team of the full gathered
        planes per device on each axis;
      * streaming "psum": a masked all-reduce moves ~2x the panel per device
        (reduce-scatter + all-gather) per step;
      * streaming "ring": each panel crosses each link exactly once --
        (team-1)/team panel bytes per device per step, half of psum.

    Fast-mode shift/norm collectives (O(m+n) scalars) are negligible and
    excluded; ACCURATE mode (fastmode=False) additionally all-gathers one
    full ub plane per operand for the estimation GEMM (int8/bf16 -- the
    same ring cost as one of the nu residue planes), which IS counted.

    complex_lanes=True models summa_gemm_planar: 3x the residue plane and
    panel bytes (the 3M lane sets) and 3x the accurate-mode estimation
    lanes.
    """
    X, Y = mesh_shape
    nu = num_moduli
    lanes = 3 if complex_lanes else 1
    plane_b = 6 if backend == tables.Backend.FP8 else 1
    m_l, n_l = m // X, n // Y
    accu = 0
    if fastmode is False:
        ub_b = 2 if backend == tables.Backend.FP8 else 1   # bf16 | int8
        accu = int(lanes * ((Y - 1) / Y * m_l * k * ub_b
                            + (X - 1) / X * k * n_l * ub_b))
    if k_panel is None:
        ag_a = (Y - 1) / Y * lanes * nu * m_l * k * plane_b
        ag_b = (X - 1) / X * lanes * nu * k * n_l * plane_b
        return int(ag_a + ag_b) + accu
    steps = k // k_panel
    pan_a = lanes * nu * m_l * k_panel * plane_b
    pan_b = lanes * nu * k_panel * n_l * plane_b
    fac = 2.0 if bcast == "psum" else 1.0
    return int(steps * fac
               * ((Y - 1) / Y * pan_a + (X - 1) / X * pan_b)) + accu

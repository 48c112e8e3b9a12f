"""Round-5 hardening regressions.

The XLA:TPU excess-precision pass elides f32->bf16->f32 convert round-trips.
Two sites depended on the round-trip actually rounding (measured broken on
the v5e via tools/probe_bf16x9.py, correct on CPU where no elision happens):

  * compare._bf16_split3 — the mid/lo correction planes came out ZERO on
    device, silently collapsing the bf16x9 comparison baseline to native
    single-bf16-pass quality.
  * quantize.extract_ub_with_pre (FP8 branch) — the round-down detector
    `b.astype(f32) < ub` was constant-False on device, so the FP8
    accurate-mode extraction bound could silently round DOWN past bf16's
    integer-exact range.

Both now round via lax.reduce_precision (bf16's 8/7 grid, RNE, staying in
f32 — an explicit HLO op the elision pass must respect). These tests pin
the rounding semantics themselves, so they catch a regression to the
elidable pattern on ANY backend where the elision fires, and document the
intended values everywhere else.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gemmul8_tpu import compare, quantize, tables


def test_bf16_split3_planes_are_nonzero_and_reconstruct():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    hi, mid, lo = jax.jit(compare._bf16_split3)(x)
    # hi must be the RNE bf16 rounding of x (ml_dtypes does the reference cast)
    np.testing.assert_array_equal(np.asarray(hi),
                                  np.asarray(x).astype(np.asarray(hi).dtype))
    # the correction planes carry real mass (the elision bug zeroed them)
    assert float(jnp.max(jnp.abs(mid.astype(jnp.float32)))) > 0
    assert float(jnp.max(jnp.abs(lo.astype(jnp.float32)))) > 0
    # and the split reconstructs x to ~2^-24 relative (3 x 8-bit mantissas)
    rec = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
           + lo.astype(jnp.float32))
    rel = float(jnp.max(jnp.abs(rec - x) / jnp.maximum(jnp.abs(x), 1e-30)))
    assert rel < 2.0 ** -22, rel


def test_bf16x9_is_f32_faithful():
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((96, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 80)), jnp.float32)
    got = np.asarray(compare.matmul_bf16x9(a, b), np.float64)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    rel = np.max(np.abs(got - ref)
                 / (np.abs(np.asarray(a, np.float64)) @
                    np.abs(np.asarray(b, np.float64)) + 1e-30))
    # f32-faithful territory; the single-bf16-pass failure mode sits ~2e-3
    assert rel < 1e-6, rel


def test_extract_ub_fp8_bump_fires_past_bf16_exact_range():
    # engineered so ub = ceil(ax * 2^0) = 257: bf16 RNE rounds 257 -> 256
    # (below the true bound); the bump must push it to 258 >= 257.
    ax = jnp.asarray([[256.5, 100.25, 1.0, 0.0]], jnp.float32)
    sft = jnp.zeros((1,), jnp.int32)
    out = quantize.extract_ub_with_pre(ax, sft, 1, tables.Backend.FP8)
    vals = np.asarray(out.astype(jnp.float32))[0]
    ubs = np.ceil(np.asarray(ax)[0])
    # every emitted extract must stay an UPPER bound of the exact ceil
    assert (vals[:3] >= ubs[:3]).all(), (vals, ubs)
    assert vals[3] == 0.0
    # and the 257 lane specifically must have bumped past bf16's RNE-down
    assert vals[0] >= 257.0, vals[0]


def test_extract_ub_int8_unchanged():
    ax = jnp.asarray([[4.5, 63.0, 0.0]], jnp.float32)
    sft = jnp.zeros((1,), jnp.int32)
    out = quantize.extract_ub_with_pre(ax, sft, 1, tables.Backend.INT8)
    np.testing.assert_array_equal(np.asarray(out), [[5, 63, 0]])

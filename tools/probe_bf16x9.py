"""Round-5 probe: why does matmul_bf16x9 return the SAME BITS as the native
f32 matmul on the tunneled TPU (oz2_results_INT8_f32_accuracy_TPUv5lite_
20260820 CSV), when on CPU it is f32-faithful (~1e-7) and native-TPU-f32 is a
single bf16 pass (~2e-3 median)?

Hypotheses:
  H1 XLA:TPU algebraically folds the 3-way bf16 split (x - f32(bf16(x)) -> 0
     or the 9-term sum -> one dot), collapsing bf16x9 to the native pass.
  H2 The split itself computes degenerate mid/lo planes on this stack.
  H3 The 9 products are computed but the smallest-first f32 combine loses
     the correction terms (would NOT give bit-equality with native).

Evidence gathered: elementwise medians vs a longdouble oracle for native /
HIGHEST-precision / bf16x9 / manual-unfused-bf16x9, bitwise comparisons,
split-plane magnitudes, and the compiled HLO dot count for bf16x9.
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np
import jax
import jax.numpy as jnp

from gemmul8_tpu import compare


def med_max(c, ref):
    e = np.abs(np.asarray(c, np.longdouble) - ref) / np.maximum(
        np.abs(ref), np.finfo(np.longdouble).tiny)
    return float(np.median(e)), float(np.max(e))


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(12345)
    m = k = n = 512
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    # oracle on the stored values
    ref = np.asarray(aj).astype(np.longdouble) @ np.asarray(bj)

    c_nat = np.asarray(jnp.matmul(aj, bj))
    c_hi = np.asarray(jnp.matmul(aj, bj, precision=jax.lax.Precision.HIGHEST))
    c_9 = np.asarray(compare.matmul_bf16x9(aj, bj))
    print("native   med/max:", med_max(c_nat, ref))
    print("HIGHEST  med/max:", med_max(c_hi, ref))
    print("bf16x9   med/max:", med_max(c_9, ref))
    print("bf16x9 == native bitwise:", np.array_equal(c_9, c_nat))
    print("bf16x9 == HIGHEST bitwise:", np.array_equal(c_9, c_hi))

    # split-plane magnitudes (H2): mid/lo should be ~2^-8, ~2^-16 of hi
    hi, mid, lo = jax.jit(compare._bf16_split3)(aj)
    for nm, p in (("hi", hi), ("mid", mid), ("lo", lo)):
        print(f"split {nm}: max|.| = {float(jnp.max(jnp.abs(p.astype(jnp.float32)))):.3e}")

    # manual unfused 9-term combine entirely outside one jit (H1 check):
    # 9 separate device dots, summed on the HOST in f64 -- XLA cannot fold
    a3 = [np.asarray(x).astype(np.float32) for x in (hi, mid, lo)]
    b3 = [np.asarray(x).astype(np.float32)
          for x in jax.jit(compare._bf16_split3)(bj)]
    dot = jax.jit(lambda x, y: jax.lax.dot_general(
        x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    acc = np.zeros((m, n), np.float64)
    for i in range(3):
        for j in range(3):
            acc += np.asarray(dot(jnp.asarray(a3[i]), jnp.asarray(b3[j])),
                              np.float64)
    print("manual 9-dot host-f64 combine med/max:", med_max(acc, ref))

    # compiled HLO of the jitted bf16x9 (H1): how many dots survive?
    try:
        txt = jax.jit(compare.matmul_bf16x9).lower(aj, bj).compile().as_text()
        dots = [l.strip() for l in txt.splitlines()
                if ("dot(" in l or "convolution(" in l) and "=" in l]
        print(f"compiled HLO dot-ish ops: {len(dots)}")
        for l in dots[:12]:
            print("  ", l[:160])
    except Exception as e:
        print("HLO dump unavailable:", repr(e))


if __name__ == "__main__":
    main()

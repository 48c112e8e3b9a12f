#!/usr/bin/env python3
"""Measure the rank-2k one-product win on hardware: syr2k/her2k vs the
naive two-GEMM formulation at matched num_moduli.

syr2k computes C = alpha(A B^T + B A^T) as G + G^T with ONE emulated
product (gemmul8_tpu/blas3.py); the naive form runs gemm(a,b,trans_b=T)
plus gemm(b,a,trans_b=T). Expected: ~2x on the product phase, i.e. the
syr2k time approaches a single gemm's. her2k likewise on the 3M complex
path (planar operands: the tested PJRT stack has no complex dtypes).

Usage: python tools/probe_blas3_perf.py [n] [k] [nu]   (defaults 4096 4096 16)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import gemmul8_tpu as g8
    from benchmarks._timing import ping_seconds, timed_loop

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    nu = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(os.environ.get("G8_PROBE_ITERS", "8"))

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}  n={n} k={k} nu={nu} iters={iters}",
          flush=True)

    rng = np.random.default_rng(0)
    # generate f32-and-widen: f64 threefry needs huge u64-emulation
    # temporaries on the 16-GiB chip (see BASELINE.md big_flops note)
    def randn(*sh):
        return jnp.asarray(rng.standard_normal(sh).astype(np.float32),
                           jnp.float64)

    a = randn(n, k)
    b = randn(n, k)
    ping = ping_seconds()
    print(f"ping {ping*1e3:.2f} ms", flush=True)

    # same fastmode on both sides so the comparison isolates the
    # one-product-vs-two structure, not the shift variant
    def syr2k_fn(a, b):
        return g8.syr2k(a, b, num_moduli=nu, fastmode="robust")

    def naive2(a, b):
        g1 = g8.gemm(a, b, trans_b=True, num_moduli=nu, fastmode="robust")
        g2 = g8.gemm(b, a, trans_b=True, num_moduli=nu, fastmode="robust")
        return g1 + g2

    def one_gemm(a, b):
        return g8.gemm(a, b, trans_b=True, num_moduli=nu, fastmode="robust")

    # correctness first: expected EXACTLY 0 -- the naive second product
    # reconstructs the same exact residue integers under the same shifts,
    # so g2 == g1^T bitwise and both formulations add identical addends
    d = float(np.asarray(jnp.max(jnp.abs(syr2k_fn(a[:256], b[:256])
                                         - naive2(a[:256], b[:256])))))
    print(f"syr2k vs naive two-GEMM max abs diff (256^2): {d:.3e}", flush=True)

    flops = 2.0 * n * n * k  # rank-2k FLOP convention: 2*n^2*k per product
    for name, fn, nflops in [("one gemm (A B^T)", one_gemm, flops),
                             ("syr2k (G + G^T)", syr2k_fn, 2 * flops),
                             ("naive 2-GEMM", naive2, 2 * flops)]:
        t = timed_loop(fn, a, b, iters, ping)
        print(f"{name:18s} {t*1e3:9.2f} ms  {nflops/t/1e12:7.2f} TF/s",
              flush=True)

    # her2k through the same comparison (complex device arrays -- the
    # tested axon PJRT stack has none, hence the guard; CPU runs it)
    def her2k_fn(az, bz):
        return g8.her2k(az, bz, num_moduli=nu, fastmode="robust")

    def naive2_c(az, bz):
        g1 = g8.gemm(az, bz, trans_b="C", num_moduli=nu, fastmode="robust")
        g2 = g8.gemm(bz, az, trans_b="C", num_moduli=nu, fastmode="robust")
        return g1 + g2

    try:
        az = jax.lax.complex(randn(n, k), randn(n, k))
        bz = jax.lax.complex(randn(n, k), randn(n, k))
        az.block_until_ready()
        zflops = 8.0 * n * n * k
        for name, fn, nflops in [("her2k (G + G^H)", her2k_fn, 2 * zflops),
                                 ("naive 2-ZGEMM", naive2_c, 2 * zflops)]:
            t = timed_loop(fn, az, bz, iters, ping)
            print(f"{name:18s} {t*1e3:9.2f} ms  {nflops/t/1e12:7.2f} TF/s",
                  flush=True)
    except Exception as e:  # complex dtypes absent on some PJRT stacks
        print(f"her2k leg skipped (complex dtype unsupported here): "
              f"{str(e)[:120]}")


if __name__ == "__main__":
    main()

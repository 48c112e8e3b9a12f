#!/usr/bin/env python3
"""Memory-gated big-shape flops rows: sizes beyond one-program HBM capacity,
run through the M/N-striped blocked driver (core.emulate_matmul_blocked --
the TPU analog of the reference's bounded-workspace N-blocking,
matmult.hpp:68-75; protocol memory gate: testing/test_flops.hpp:38-56).

Operands are generated ON DEVICE (threefry) -- a 16384^2 f64 push over the
tunneled transport would take minutes. The blocked driver is a host-level
loop of per-stripe XLA programs, so timing wraps the whole eager sequence
and anchors on a scalar fetch of the result (dispatch-ack caveat, see
_timing.py).

Usage: python benchmarks/big_flops.py [--sizes 16384] [--nu 16] [--budget-gb 8]
"""
import argparse
import csv
import datetime
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16384")
    ap.add_argument("--nu", default="16")
    ap.add_argument("--budget-gb", type=float, default=8.0,
                    help="workspace budget for pick_blocking (HBM minus "
                         "resident inputs/outputs)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from _timing import ping_seconds
    from gemmul8_tpu import core

    dev = jax.devices()[0].device_kind.replace(" ", "")
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                       f"oz2_results_INT8_f64_bigflops_{dev}_{stamp}.csv")
    budget = int(args.budget_gb * (1 << 30))
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", file=sys.stderr)
    rows = []

    for s in [int(x) for x in args.sizes.split(",")]:
        m = n = k = s
        # Generate in f32 and widen: f64 threefry at 16384^2 needs several
        # 2-GiB u64-emulation temporaries and RESOURCE_EXHAUSTs the 16-GiB
        # chip (this, not a worker-side leak, was the round-3/4 big_flops
        # blocker -- tools/probe_hbm.py measured 12 GiB allocatable right
        # before the f64 generator OOMed). Mantissa content does not affect
        # a flops row; f32-grade values exercise the identical int8 path.
        # NOTE a RESOURCE_EXHAUSTED wedges this client process permanently
        # (measured: after one OOM even a 4-byte PRNGKey transfer fails),
        # so there is no point retrying in-process -- fail fast and re-run.
        try:
            gen = jax.jit(lambda key: jax.random.normal(
                key, (m, k), jnp.float32).astype(jnp.float64))
            a = gen(jax.random.PRNGKey(0))
            b = gen(jax.random.PRNGKey(1))
            a.block_until_ready()
            b.block_until_ready()
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e):
                print("operand generation OOMed; the client is now wedged "
                      "(one RESOURCE_EXHAUSTED poisons the process) -- "
                      "re-run in a fresh process with a smaller size",
                      file=sys.stderr)
            raise
        for nu in [int(x) for x in args.nu.split(",")]:
            mb, nb = core.pick_blocking(m, n, k, nu, jnp.float64,
                                        budget_bytes=budget)
            print(f"{s}^3 nu={nu}: blocking m_block={mb} n_block={nb} "
                  f"(workspace budget {args.budget_gb} GiB)", file=sys.stderr)

            def run():
                c = core.emulate_matmul_blocked(
                    a, b, num_moduli=nu, fastmode=True,
                    n_block=nb or n, m_block=mb)
                # anchor: scalar fetch cannot complete before the math does
                return float(np.asarray(jnp.sum(c[::257, ::257],
                                                dtype=jnp.float64)))

            run()                                  # compile all stripe shapes
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            t = max(ts[len(ts) // 2] - ping, 1e-9)
            tflops = 2.0 * m * n * k / t / 1e12
            rows.append([s, "oz2-fast-blocked", nu, t, tflops, mb or "", nb])
            print(f"{s}^3 nu={nu} blocked: {t*1e3:.1f} ms = {tflops:.2f} "
                  f"TFLOP/s", file=sys.stderr)
        del a, b

    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["size", "method", "num_moduli", "sec", "tflops",
                    "m_block", "n_block"])
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

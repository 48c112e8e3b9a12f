#!/usr/bin/env python3
"""Factorization throughput rows: getrf / potrf / geqrf TFLOP/s on the
emulated engine vs the device's native-f64 path.

The end-to-end mixed-precision-solver story (HPL-MxP style): the O(n^3)
bulk of each factorization runs through the int8-MXU emulated GEMM, so
factorization throughput should track the emulated GEMM's advantage over
the native f64 path (reference positions GEMMul8 as the building block
for exactly this; this harness measures the delivered end-to-end gain).

Solvers are eager host-level block loops (many XLA programs), so timing
wraps the whole sequence and anchors on a scalar fetch (dispatch-ack
caveat, benchmarks/_timing.py); operands are generated on device.

Usage: python benchmarks/solver_flops.py [--ops getrf,potrf,geqrf]
           [--sizes 4096] [--nu 14] [--block 1024] [--cpu]
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


def flops_of(op: str, n: int) -> float:
    return {"getrf": 2 / 3 * n**3, "potrf": 1 / 3 * n**3,
            "geqrf": 4 / 3 * n**3}[op]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="getrf,potrf,geqrf")
    ap.add_argument("--sizes", default="4096")
    ap.add_argument("--nu", type=int, default=14)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-native", action="store_true",
                    help="skip the native-f64 comparison rows")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from _timing import ping_seconds
    import gemmul8_tpu as g8

    dev = jax.devices()[0].device_kind.replace(" ", "")
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                       f"oz2_results_INT8_f64_solvers_{dev}_{stamp}.csv")
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", file=sys.stderr)
    rows = []

    def timed(run):
        run()                                   # compile every step shape
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        if med - ping < ping:
            # inside the dispatch-ping noise floor: NaN, never a clamped
            # absurd throughput (the _timing.timed_loop protocol)
            return float("nan")
        return med - ping

    def anchor(x):
        return float(np.asarray(jnp.sum(x[::257, ::257], dtype=jnp.float64)))

    for n in [int(x) for x in args.sizes.split(",")]:
        blk = args.block or min(1024, max(256, n // 8))
        a = jax.jit(lambda key: jax.random.normal(
            key, (n, n), jnp.float64))(jax.random.PRNGKey(0))
        a = a + n * jnp.eye(n, dtype=jnp.float64)      # well-conditioned
        spd = jax.jit(lambda x: x @ x.T / n + n * jnp.eye(
            n, dtype=jnp.float64))(a)
        a.block_until_ready(); spd.block_until_ready()

        for op in args.ops.split(","):
            emulated = {
                "getrf": lambda: anchor(g8.getrf(
                    a, num_moduli=args.nu, block=blk)[0]),
                "potrf": lambda: anchor(g8.potrf(
                    spd, num_moduli=args.nu, block=blk)),
                "geqrf": lambda: anchor(g8.geqrf(
                    a, num_moduli=args.nu, block=blk)[0]),
            }[op]
            t = timed(emulated)
            tf = flops_of(op, n) / t / 1e12
            print(f"{op} n={n} nu={args.nu} block={blk}: {t*1e3:.1f} ms = "
                  f"{tf:.2f} TFLOP/s", file=sys.stderr)
            nat_t = nat_tf = float("nan")
            if not args.no_native:
                native = {
                    "getrf": lambda: anchor(jax.lax.linalg.lu(a)[0]),
                    "potrf": lambda: anchor(jnp.linalg.cholesky(spd)),
                    "geqrf": lambda: anchor(
                        jnp.linalg.qr(a, mode="raw")[0]),
                }[op]
                try:
                    nat_t = timed(native)
                    nat_tf = flops_of(op, n) / nat_t / 1e12
                    print(f"{op} n={n} native: {nat_t*1e3:.1f} ms = "
                          f"{nat_tf:.2f} TFLOP/s", file=sys.stderr)
                except Exception as e:       # native f64 may not lower
                    print(f"{op} n={n} native failed: {e}", file=sys.stderr)
            rows.append([op, n, args.nu, blk, t, tf, nat_t, nat_tf,
                         (nat_t / t) if nat_t == nat_t else ""])
        del a, spd

    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["op", "n", "num_moduli", "block", "sec", "tflops",
                    "native_sec", "native_tflops", "speedup"])
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

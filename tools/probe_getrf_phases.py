#!/usr/bin/env python3
"""Phase-level timing of getrf's panel path on the real TPU.

getrf 4096 (block=512) measured 107 s (round-4 first cut) -> 73 s (panel
v2) while potrf runs at native parity with the same eager skeleton -- so
something getrf-specific dominates. Candidates, timed here separately:

  p1: native f32 LuDecomposition on the (m, 512) panel (pivot-order source)
  p2: the row gather a.take(perm, axis=0)
  p3: _panel_lu_nopiv full-precision block recursion (emulated GEMMs
      + native trisolves + 64-step masked fori_loop bases)
  p4: one outer-step trailing update: trsm(512 rows) + schur GEMM
  p5: native f32 LU on the FULL 4096x4096 (scaling reference)

Timing: median of --iters, scalar-fetch anchored, ping-subtracted
(the tunneled transport acks at dispatch; see benchmarks/_timing.py).

Usage: python tools/probe_getrf_phases.py [--n 4096] [--block 512] [--nu 14]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "benchmarks"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--nu", type=int, default=14)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from _timing import ping_seconds
    from gemmul8_tpu import solvers

    n, b = args.n, args.block
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", file=sys.stderr)

    a = jax.jit(lambda key: jax.random.normal(
        key, (n, n), jnp.float64))(jax.random.PRNGKey(0))
    a = a + n * jnp.eye(n, dtype=jnp.float64)
    a.block_until_ready()
    panel = a[:, :b]

    def timed(label, run):
        run()                                   # compile
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = max(ts[len(ts) // 2] - ping, 0.0)
        print(f"{label:50s} {med*1e3:10.1f} ms")
        return med

    def anchor(x):
        return float(np.asarray(jnp.sum(
            x.reshape(-1)[::257], dtype=jnp.float64)))

    lu_f32 = jax.jit(lambda p: jax.lax.linalg.lu(p.astype(jnp.float32)))

    timed("p1  f32 LU (4096, 512) pivot-order source",
          lambda: anchor(lu_f32(panel)[0]))
    timed("p1b f32 LU (2048, 512)",
          lambda: anchor(lu_f32(panel[:2048])[0]))
    timed("p1c f32 LU (512, 512)",
          lambda: anchor(lu_f32(panel[:512])[0]))

    perm = lu_f32(panel)[2]
    perm.block_until_ready()
    gather = jax.jit(lambda p, q: p.take(q, axis=0))
    timed("p2  row gather take(perm) (4096, 512)",
          lambda: anchor(gather(panel, perm)))

    ap_ = gather(panel, perm)
    ap_.block_until_ready()
    timed("p3  _panel_lu_nopiv recursion (4096, 512) f64",
          lambda: anchor(solvers._panel_lu_nopiv(
              ap_, args.nu, "robust", "INT8")))
    timed("p3b base case (4096, 64) fori_loop+trisolve",
          lambda: anchor(solvers._panel_lu_nopiv_base(ap_[:, :64])))

    lu_p = solvers._panel_lu_nopiv(ap_, args.nu, "robust", "INT8")
    lu_p.block_until_ready()
    rest = a[:, b:]

    def outer_step():
        u12 = solvers._tri_solve_native(lu_p[:b], rest[:b], unit_diag=True)
        a22 = solvers._schur_update(lu_p[b:], u12, rest[b:], mesh=None,
                                    num_moduli=args.nu, fastmode="robust",
                                    backend="INT8")
        return anchor(a22)

    timed("p4  outer trailing update (trsm + schur GEMM)", outer_step)

    lu_full = jax.jit(lambda p: jax.lax.linalg.lu(p.astype(jnp.float32)))
    timed("p5  f32 LU FULL (4096, 4096)",
          lambda: anchor(lu_full(a)[0]))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Randomized stress sweep on the CURRENT device (the CI suite runs on CPU;
this drives the same surfaces on real hardware).

Each trial draws shape/dtype/nu/mode/backend/ops/alpha-beta at random, runs
the public API, and checks against the native product of the same on-device
operands with a tolerance derived from the num_moduli error model
(NUMERICS.md §2). Catastrophic failures (wraps, wrong quotients, layout bugs)
show up as O(1) relative errors and are caught regardless of the dial.

Usage: python tools/device_stress.py [--trials 40] [--seed 0]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import gemmul8_tpu as g8
    from gemmul8_tpu import tables

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(args.seed)
    failures = 0
    for t in range(args.trials):
        dtype = rng.choice([np.float32, np.float64])
        name = np.dtype(dtype).name
        lo, hi = tables.VALID_RANGE[name]
        backend = str(rng.choice(["INT8", "INT8", "INT8", "FP8"]))
        nu = int(rng.integers(max(lo, 4), hi + 1))
        fast = [True, False, "robust"][int(rng.integers(0, 3))]
        m, k, n = (int(rng.integers(8, 400)) for _ in range(3))
        op_a = str(rng.choice(["N", "T"]))
        op_b = str(rng.choice(["N", "T"]))
        alpha = float(rng.choice([1.0, -1.5, 0.5]))
        beta = float(rng.choice([0.0, 1.0, 1.2]))
        phi = float(rng.choice([0.0, 0.5, 1.0]))

        z = rng.standard_normal
        mk = (m, k) if op_a == "N" else (k, m)
        kn = (k, n) if op_b == "N" else (n, k)
        a = ((z(mk) * np.exp(z(mk) * phi))).astype(dtype)
        b = ((z(kn) * np.exp(z(kn) * phi))).astype(dtype)
        cin = z((m, n)).astype(dtype)

        aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(cin)
        out = np.asarray(g8.gemm(aj, bj, num_moduli=nu, fastmode=fast,
                                 backend=backend, alpha=alpha, beta=beta,
                                 c=cj, trans_a=op_a, trans_b=op_b))
        aa = a.T if op_a == "T" else a
        bb = b.T if op_b == "T" else b
        ref = alpha * (aa.astype(np.float64) @ bb.astype(np.float64)) \
            + beta * cin.astype(np.float64)
        scale = np.max(np.abs(ref)) + 1e-30
        err = np.max(np.abs(out - ref)) / scale
        # tolerance: quantization error ~2^-(captured bits); captured ~
        # log2P - 4 - phi-spread slop; f32 inputs floor at ~2^-24 * k
        log2p = tables.log2P(nu, backend)
        # floor: f32 inputs ~2^-22; f64 floors at the device storage
        # precision (TPU f64 is an f32 pair, ~2^-48) plus epilogue roundings
        tol = max(2.0 ** (-(log2p - 6 - 8 * phi)),
                  2.0 ** -22 if dtype == np.float32 else 0.0) * 50 \
            + 2.0 ** -46
        ok = err < tol and np.isfinite(out).all()
        status = "ok " if ok else "FAIL"
        print(f"[{t:03d}] {status} {name} {backend} nu={nu:2d} "
              f"fast={fast} ({m},{k},{n}) {op_a}{op_b} "
              f"a={alpha} b={beta} phi={phi}: err={err:.2e} tol={tol:.2e}",
              file=sys.stderr)
        failures += not ok

    # planar-complex trials (the device-native complex path)
    for t in range(max(args.trials // 5, 3)):
        nu = int(rng.integers(8, 17))
        m, k, n = (int(rng.integers(8, 200)) for _ in range(3))
        op_a = str(rng.choice(["N", "T", "C"]))
        mk = (m, k) if op_a == "N" else (k, m)
        ar, ai = rng.standard_normal(mk), rng.standard_normal(mk)
        br, bi = rng.standard_normal((k, n)), rng.standard_normal((k, n))
        cr, ci = g8.gemm_planar(jnp.asarray(ar), jnp.asarray(ai),
                                jnp.asarray(br), jnp.asarray(bi),
                                num_moduli=nu, trans_a=op_a)
        az = ar + 1j * ai
        az = az.T if op_a == "T" else (az.conj().T if op_a == "C" else az)
        ref = az @ (br + 1j * bi)
        scale = np.max(np.abs(ref)) + 1e-30
        err = max(np.max(np.abs(np.asarray(cr) - ref.real)),
                  np.max(np.abs(np.asarray(ci) - ref.imag))) / scale
        tol = 2.0 ** (-(tables.log2P(nu, "INT8") - 8)) * 50 + 2.0 ** -46
        ok = err < tol
        print(f"[z{t:02d}] {'ok ' if ok else 'FAIL'} planar nu={nu:2d} "
              f"({m},{k},{n}) {op_a}N: err={err:.2e} tol={tol:.2e}",
              file=sys.stderr)
        failures += not ok

    print(f"stress passed" if not failures else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

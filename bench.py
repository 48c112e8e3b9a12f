#!/usr/bin/env python3
"""Headline benchmark: emulated DGEMM throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": <emulated DGEMM TFLOP/s>, "unit": "TFLOP/s",
   "vs_baseline": <speedup over the device's native f64 matmul>}

Protocol follows the reference's flops test (median of timed iterations after
warmup, TFLOPS = 2*m*n*k/t; reference: testing/test_flops.hpp:109,216). Timing
loops run INSIDE one jit (lax.fori_loop with a forced data dependency) so remote
dispatch latency does not pollute device time. Diagnostics go to stderr.
"""
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(fn, a, b, iters):
    """Median-free single measurement of `iters` chained executions inside one
    jit; returns seconds per call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(a, b):
        def body(i, carry):
            s, a = carry
            # force a loop-carried dependency so XLA cannot hoist the GEMM,
            # and consume ALL of c so it cannot slice-propagate (computing
            # c[0,0] alone only needs one dot product!)
            a = a.at[0, 0].set(a[0, 0] + s * 1e-300)
            c = fn(a, b)
            return (jnp.sum(c).astype(jnp.float64), a)
        s, _ = jax.lax.fori_loop(0, iters, body, (jnp.float64(0), a))
        return s

    loop(a, b).block_until_ready()  # compile + warm up
    t0 = time.perf_counter()
    loop(a, b).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from gemmul8_tpu import core

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    on_tpu = "TPU" in dev.device_kind or dev.platform in ("tpu", "axon")

    if on_tpu:
        m = k = n = 4096
        iters = 8
    else:  # CPU fallback (driver safety)
        m = k = n = 512
        iters = 2

    nu = 16
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)))
    b = jnp.asarray(rng.standard_normal((k, n)))

    emul = functools.partial(core.emulate_matmul, num_moduli=nu, fastmode=True)
    t_emul = timed_loop(emul, a, b, iters)
    tflops = 2.0 * m * n * k / t_emul / 1e12
    log(f"emulated DGEMM {m}^3 nu={nu}: {t_emul*1e3:.2f} ms -> {tflops:.2f} TFLOP/s")

    t_native = timed_loop(lambda x, y: x @ y, a, b, iters)
    native_tflops = 2.0 * m * n * k / t_native / 1e12
    log(f"native f64 matmul: {t_native*1e3:.2f} ms -> {native_tflops:.2f} TFLOP/s")

    # quick accuracy spot check (vs host f64 reference on a slice)
    c = np.asarray(emul(a[:256], b))
    ref = np.asarray(a[:256], np.float64) @ np.asarray(b, np.float64)
    err = float(np.max(np.abs(c - ref) / np.maximum(np.abs(ref), 1e-30)))
    log(f"max rel err vs host-f64 oracle (256-row slice): {err:.3e}")

    print(json.dumps({
        "metric": f"emulated DGEMM TFLOP/s ({m}^3, num_moduli={nu}, fast mode, "
                  f"single chip)",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / native_tflops, 3),
    }))


if __name__ == "__main__":
    main()

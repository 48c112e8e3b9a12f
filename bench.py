#!/usr/bin/env python3
"""Headline benchmark: emulated DGEMM throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": <emulated DGEMM TFLOP/s>, "unit": "TFLOP/s",
   "vs_baseline": <speedup over the device's native-path f64 matmul>}

Protocol follows the reference's flops test (timed loop after warmup,
TFLOPS = 2*m*n*k/t; reference: testing/test_flops.hpp:109,216), adapted to a
remote/tunneled device: all iterations are chained INSIDE one jit (lax.fori_loop
with a loop-carried data dependency) and each iteration's output is reduced to a
scalar, so the only host<->device traffic is one scalar fetch. Dispatch latency
(measured by a ping kernel) is subtracted. Note: on some PJRT transports
block_until_ready() returns at dispatch-ack, so timing relies on the scalar
device->host fetch, which cannot complete before the computation does.
Diagnostics go to stderr.
"""
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _ping_seconds():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ping(x):
        return jnp.sum(x[:4, :4])

    import numpy as _np
    x = jnp.ones((8, 8), jnp.float32)
    _np.asarray(ping(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _np.asarray(ping(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_loop(fn, a, b, iters, ping):
    """Seconds per call of fn(a, b): `iters` chained executions inside one jit,
    scalar-reduced, timed around a scalar device->host fetch; dispatch ping
    subtracted."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(a, b):
        def body(i, carry):
            s, a = carry
            # loop-carried dependency: XLA cannot hoist the GEMM out of the
            # loop, and the full-output reduction prevents slice propagation
            a = a.at[0, 0].set(a[0, 0] + s * 1e-300)
            c = fn(a, b)
            return (jnp.sum(c.real if jnp.iscomplexobj(c) else c)
                    .astype(a.dtype), a)
        s, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros((), a.dtype), a))
        return s

    np.asarray(loop(a, b))  # compile + warm up
    # median of 3 timed loop runs: one transport hiccup must not become the
    # headline number (each run already amortizes `iters` chained GEMMs, so
    # this guards the tail, not the mean). Kept self-contained rather than
    # importing benchmarks/_timing (same chained-in-jit protocol): the
    # driver runs bench.py standalone and its JSON line must always carry a
    # number, so the noise floor warns loudly instead of returning NaN.
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(a, b))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[1] - ping
    if dt < 2 * ping:
        log(f"WARNING: measurement ({ts[1]*1e3:.2f} ms) is within the "
            f"dispatch-ping noise floor ({ping*1e3:.2f} ms); the reported "
            f"throughput is unreliable")
        dt = max(dt, ping)   # bounded distortion, never an absurd clamp
    return dt / iters


def main():
    import os

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from gemmul8_tpu import core

    # the tunneled TPU worker admits one client at a time and can take
    # minutes to come back after a previous client exits; retry first
    # contact before giving up (each attempt itself blocks until the
    # backend answers or errors)
    dev = None
    for attempt in range(int(os.environ.get("G8_BENCH_INIT_RETRIES", "3"))):
        try:
            dev = jax.devices()[0]
            break
        except RuntimeError as e:
            log(f"backend not ready (attempt {attempt}): {str(e)[:100]}")
            # a failed init is cached on xla_bridge globals; clear so the
            # next attempt really retries instead of re-raising
            from jax._src import xla_bridge
            xla_bridge._clear_backends()
            time.sleep(90)
    if dev is None:
        dev = jax.devices()[0]  # raise the real error
    log(f"device: {dev.device_kind}")
    on_tpu = "TPU" in dev.device_kind or dev.platform in ("tpu", "axon")

    if on_tpu:
        m = k = n = 8192
        iters = 8
    else:  # CPU fallback (driver safety)
        m = k = n = 512
        iters = 2

    nu = 16
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)))
    b = jnp.asarray(rng.standard_normal((k, n)))

    ping = _ping_seconds()
    log(f"dispatch ping: {ping*1e3:.2f} ms")

    emul = functools.partial(core.emulate_matmul, num_moduli=nu, fastmode=True)
    t_emul = timed_loop(emul, a, b, iters, ping)
    tflops = 2.0 * m * n * k / t_emul / 1e12
    log(f"emulated DGEMM {m}^3 nu={nu}: {t_emul*1e3:.2f} ms -> {tflops:.2f} TFLOP/s")

    t_native = timed_loop(lambda x, y: x @ y, a, b, iters, ping)
    native_tflops = 2.0 * m * n * k / t_native / 1e12
    log(f"native-path f64 matmul: {t_native*1e3:.2f} ms -> {native_tflops:.2f} TFLOP/s")

    # accuracy spot check fully on device: emulated vs the native f64 path,
    # only the scalar max-rel-err crosses the wire
    @jax.jit
    def spot_err(a, b):
        c = emul(a[:256], b)
        ref = a[:256] @ b
        return jnp.max(jnp.abs(c - ref) / jnp.maximum(jnp.abs(ref), 1e-300))
    err = float(np.asarray(spot_err(a, b)))
    log(f"max rel err vs device-native f64 (256-row slice): {err:.3e}")

    print(json.dumps({
        "metric": f"emulated DGEMM TFLOP/s ({m}^3, num_moduli={nu}, fast mode, "
                  f"single chip)",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / native_tflops, 3),
    }))


def watchdog():
    """Run main() in a child process and kill/retry it if it hangs.

    On the tunneled TPU, first contact (`jax.devices()`) can BLOCK for tens
    of minutes (observed >25 min) when the worker still holds a previous
    client's state — it hangs rather than raising, so an in-process retry
    loop never gets control back. The only reliable recovery is: kill the
    exact child PID, leave the worker a fully-quiet window, try again.
    """
    import os
    import subprocess

    tries = int(os.environ.get("G8_BENCH_TRIES", "3"))
    try_timeout = float(os.environ.get("G8_BENCH_TRY_TIMEOUT", "1500"))
    retry_sleep = float(os.environ.get("G8_BENCH_RETRY_SLEEP", "300"))
    env = dict(os.environ, G8_BENCH_CHILD="1")
    # test hook: run this argv instead of re-execing bench.py
    child_cmd = os.environ.get("G8_BENCH_CHILD_CMD")
    argv = (child_cmd.split("\x1f") if child_cmd
            else [sys.executable, os.path.abspath(__file__)])
    for attempt in range(tries):
        try:
            # stderr inherited (diagnostics stream live); stdout captured so
            # the parent re-emits exactly one JSON line on success
            res = subprocess.run(
                argv, env=env, stdout=subprocess.PIPE, timeout=try_timeout)
        except subprocess.TimeoutExpired as e:
            log(f"bench child hung >{try_timeout:.0f}s (attempt {attempt}); "
                f"killed; sleeping {retry_sleep:.0f}s for worker release")
            if e.stdout:
                sys.stdout.buffer.write(e.stdout)
            time.sleep(retry_sleep)
            continue
        sys.stdout.buffer.write(res.stdout or b"")
        sys.stdout.flush()
        if res.returncode == 0:
            return 0
        log(f"bench child exited rc={res.returncode} (attempt {attempt}); "
            f"sleeping {retry_sleep:.0f}s")
        time.sleep(retry_sleep)
    log("bench: all attempts failed")
    return 1


if __name__ == "__main__":
    import os
    if os.environ.get("G8_BENCH_CHILD") or os.environ.get(
            "G8_BENCH_NO_WATCHDOG"):
        main()
    else:
        sys.exit(watchdog())

"""Shared device-timing helpers for the benchmark harnesses.

On tunneled PJRT transports (the axon TPU terminal) `block_until_ready()`
returns at dispatch-ack, not completion, so wall-clock timing must be anchored
on a device->host SCALAR fetch, which cannot complete before the computation
does. All iterations chain inside one jit (loop-carried dependency) and only
one scalar crosses the wire; the dispatch ping is measured and subtracted.
"""
import time

import numpy as np


def ping_seconds() -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ping(x):
        return jnp.sum(x[:4, :4])

    x = jnp.ones((8, 8), jnp.float32)
    np.asarray(ping(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(ping(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_loop(fn, a, b, iters, ping=None, reps=3, _depth=0):
    """Median over `reps` measurements of seconds-per-call for fn(a, b).

    If the measured loop time is within the dispatch-ping noise floor
    (median - ping <= 3 * ping jitter), the measurement is meaningless:
    iters is quadrupled and the loop re-measured (up to 2 times), and if
    still unresolvable the result is NaN with a warning -- never a clamped
    absurd throughput."""
    import warnings

    import jax
    import jax.numpy as jnp

    if ping is None:
        ping = ping_seconds()

    @jax.jit
    def loop(a, b):
        def body(i, carry):
            s, a = carry
            # loop-carried dependency: the GEMM cannot be hoisted; the full
            # reduction prevents slice propagation
            a = a.at[(0,) * a.ndim].set(a[(0,) * a.ndim] + s * 1e-30)
            c = fn(a, b)
            return (jnp.sum(jnp.real(c)).astype(a.real.dtype
                    if jnp.iscomplexobj(a) else a.dtype), a)
        z = jnp.zeros((), a.real.dtype if jnp.iscomplexobj(a) else a.dtype)
        s, _ = jax.lax.fori_loop(0, iters, body, (z, a))
        return s

    np.asarray(loop(a, b))        # compile + warm up
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(a, b))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    mid = len(ts) // 2
    dt = ts[mid] - ping
    # noise estimate: spread of the LOWER half only (median-to-min), floored
    # at 5% of the ping. Using the full spread would let ONE transport
    # hiccup in the top rep -- exactly what the median is there to reject --
    # trigger minutes of pointless iters-escalation (or a bogus NaN) for a
    # perfectly resolvable measurement.
    jitter = max(ts[mid] - ts[0], 0.05 * ping)
    if dt <= 3.0 * jitter:
        if _depth < 2:
            return timed_loop(fn, a, b, iters * 4, ping, reps, _depth + 1)
        warnings.warn(
            f"timed_loop: measurement ({dt * 1e3:.3f} ms over {iters} iters) "
            f"is inside the dispatch-ping noise floor; reporting NaN")
        return float("nan")
    return dt / iters

"""Round-3 probe: does the v5e MXU expose an int4 fast path through XLA?

If int4 x int4 -> int32 batched dots beat the measured 269-TOPS int8
ceiling (int4 spec would be ~2x), a 4-bit-limb residue scheme becomes the
next headline lever: ~2x the planes at half the per-plane cost plus the
CRT rework. If int4 lowers to the int8 path (same TOPS) or fails, the
lever is closed -- record either way.

Run on TPU: python tools/probe_int4.py [m]
"""
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "benchmarks"))
from _timing import ping_seconds, timed_loop  # noqa: E402


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", flush=True)
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = n = m
    nu = 8

    @jax.jit
    def gen():
        ka, kb = jax.random.split(jax.random.PRNGKey(0))
        a8 = jax.random.randint(ka, (nu, m, k), -8, 8, jnp.int8)
        b8 = jax.random.randint(kb, (nu, k, n), -8, 8, jnp.int8)
        return a8, b8
    a8, b8 = gen()
    a8.block_until_ready(); b8.block_until_ready()

    # correctness first, tiny shapes (int4 semantics through dot_general).
    # Everything inside ONE jit: the tunneled backend's EAGER dispatch of
    # int4 casts recurses into its remote-compile jit (round-3 queue run
    # died with 'Recursively calling jit' here).
    try:
        sa = np.arange(-8, 8, dtype=np.int8).reshape(4, 4)
        sb = (np.arange(16, dtype=np.int8) % 15 - 7).reshape(4, 4)

        @jax.jit
        def small_dot():
            a = jnp.asarray(sa).astype(jnp.int4)
            b = jnp.asarray(sb).astype(jnp.int4)
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        got = np.asarray(small_dot())
        want = sa.astype(np.int32) @ sb.astype(np.int32)
        print("int4 small-dot correct:", np.array_equal(got, want), flush=True)
    except Exception as e:
        print("int4 small dot FAIL:", type(e).__name__, str(e)[:200],
              flush=True)
        return

    ops = 2.0 * nu * m * n * k
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)

    def report(name, f, x, y):
        try:
            t = timed_loop(f, x, y, iters=4, ping=ping)
            print(f"{name}: {t*1e3:8.2f} ms  {ops / t / 1e12:6.1f} TOPS",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    report("int8 x int8 (baseline)", jax.jit(dot), a8, b8)

    # cast fused INTO the timed program: timed_loop's loop-carried float
    # perturbation cannot live on int4 arrays (no implicit promotion -- the
    # round-4 queue run failed exactly there), and an int4-plane encoder
    # would emit the casts inline anyway (VPU-cheap next to the dot)
    report("int4 x int4 (cast fused)",
           jax.jit(lambda x, y: dot(x.astype(jnp.int4),
                                    y.astype(jnp.int4))), a8, b8)
    report("int4 x int8 (mixed, cast fused)",
           jax.jit(lambda x, y: dot(x.astype(jnp.int4), y)), a8, b8)


if __name__ == "__main__":
    main()

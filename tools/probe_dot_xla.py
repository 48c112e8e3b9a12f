"""Round-3 probe: is 267 TOPS really XLA's int8 batched-dot ceiling on v5e?

Times layout/structure variants of the (nu, m, k) x (nu, k, n) int8->int32
dot at the headline shape, plus the phase split of the full emulated GEMM.
All operands are generated ON DEVICE (threefry inside jit) -- no tunnel
transfers. Evidence for the BASELINE.md floor decomposition (VERDICT round-2
item 1's alternative done-criterion).

Run: python tools/probe_dot_xla.py [nu m]
"""
import functools
import sys

import os

import jax

# x64 stays OFF for the dot probes: timed_loop's forcing jnp.sum would
# otherwise promote int32->int64 (emulated on this TPU) and inflate every
# measurement by a 4-GiB 64-bit reduction. Enabled just before the f64
# phase split at the end.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "benchmarks"))
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from _timing import ping_seconds, timed_loop  # noqa: E402


def make_operands(nu, m, k, n):
    @jax.jit
    def gen():
        ka, kb = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.randint(ka, (nu, m, k), -127, 128, jnp.int8)
        b = jax.random.randint(kb, (nu, k, n), -127, 128, jnp.int8)
        return a, b
    a, b = gen()
    a.block_until_ready()
    b.block_until_ready()
    return a, b


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", flush=True)
    nu = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    k = n = m
    a, b = make_operands(nu, m, k, n)

    def report(name, f, x, y, ops):
        try:
            t = timed_loop(f, x, y, iters=4, ping=ping)
            print(f"{name}: {t*1e3:8.2f} ms  {ops / t / 1e12:6.1f} TOPS",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    ops = 2.0 * nu * m * n * k

    # 1) the production batched dot
    report("batched (nu,m,k)x(nu,k,n)", jax.jit(functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)), a, b, ops)

    # 2) B transposed layout (contract on B's minor dim)
    bt = jax.jit(lambda x: jnp.swapaxes(x, 1, 2))(b)
    bt.block_until_ready()
    report("batched, B pre-T (nu,n,k)", jax.jit(functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)), a, bt, ops)

    # 3) single-plane 2D dot (no batch dim) -- per-plane ceiling
    report("single plane 2D", jax.jit(functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)), a[0], b[0], ops / nu)

    # 4) unrolled loop of nu 2D dots inside one jit
    @jax.jit
    def unrolled(x, y):
        return jnp.stack([
            jax.lax.dot_general(x[i], y[i], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for i in range(nu)])
    report("unrolled nu x 2D dots", unrolled, a, b, ops)

    # 5) grouped: 4 batched dots of nu/4 planes
    @jax.jit
    def grouped(x, y):
        outs = []
        for g in range(4):
            s = slice(g * (nu // 4), (g + 1) * (nu // 4))
            outs.append(jax.lax.dot_general(
                x[s], y[s], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32))
        return jnp.concatenate(outs)
    report("4 groups of nu/4", grouped, a, b, ops)

    # 6) bf16 reference MFU (peak sanity: ~197 TF/s spec)
    ab = jax.jit(lambda x: x.astype(jnp.bfloat16))(a[0])
    bb = jax.jit(lambda x: x.astype(jnp.bfloat16))(b[0])
    ab.block_until_ready()
    bb.block_until_ready()
    report("bf16 single plane (TF/s)", jax.jit(functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)), ab, bb, ops / nu)

    # 6b) dot with the reduction FUSED (XLA may avoid materializing the
    # 4-GiB C_hi write -- upper bound on "dot compute only")
    @jax.jit
    def dot_reduced(x, y):
        c = jax.lax.dot_general(x, y, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        return jnp.sum(c, dtype=jnp.float32)[None, None] * jnp.ones((8, 8))
    report("batched dot, fused f32 reduce", dot_reduced, a, b, ops)

    # 7) phase split of the production pipeline at the headline shape
    jax.config.update("jax_enable_x64", True)
    from gemmul8_tpu import core
    ga = jax.jit(lambda s: jax.random.normal(s, (m, k), jnp.float64))(
        jax.random.PRNGKey(2))
    gb = jax.jit(lambda s: jax.random.normal(s, (k, n), jnp.float64))(
        jax.random.PRNGKey(3))
    ga.block_until_ready()
    gb.block_until_ready()
    try:
        phases = core.gemm_with_phases(ga, gb, num_moduli=nu)
        print("phases (s):", {p: round(float(v), 5)
                              for p, v in phases[1].items()}, flush=True)
    except Exception as e:
        print("phases: FAIL", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()

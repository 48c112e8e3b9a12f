"""Round-4 probe: is XLA's int8 batched-dot throughput SHAPE-dependent?

The round-3 floor decomposition pinned the headline dot at 269 TOPS
(nu=16, 8192^3); the round-4 int4 probe's int8 BASELINE row measured
358 TOPS at nu=8, 4096^3 -- 33% higher. If 4096-class tiles sustain that
rate, re-tiling the production residue GEMM is worth ~10 ms at the
headline shape (65 ms -> ~49 ms, 12.6 -> ~15 TF/s).

Times, all inside one jit per variant (tiling slices/concat included):
  - one-shot (nu, m, k) x (nu, k, n) at the headline shape
  - M/N 2x2, M-only, N-only tilings into 4096-wide blocks
  - K-split into 4096 halves with int32 adds
  - nu-split into two nu/2 dots
  - reference points: 4096^3 at nu in {8, 16}, 2048^3 at nu=8
Run: python tools/probe_dot_shapes.py [nu m]
"""
import functools
import os
import sys

import jax

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "benchmarks"))
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from _timing import ping_seconds, timed_loop  # noqa: E402

DN = (((2,), (1,)), ((0,), (0,)))
dot = functools.partial(jax.lax.dot_general, dimension_numbers=DN,
                        preferred_element_type=jnp.int32)


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
    ops = 2.0 * nu * m * n * k

    def report(name, f, x, y, o=None):
        try:
            t = timed_loop(f, x, y, iters=4, ping=ping)
            print(f"{name}: {t*1e3:8.2f} ms  {(o or ops) / t / 1e12:6.1f} "
                  f"TOPS", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    report(f"one-shot nu={nu} {m}^3", jax.jit(dot), a, b)

    h = m // 2

    def mn_2x2(a, b):
        rows = []
        for i in range(2):
            cols = [dot(a[:, i*h:(i+1)*h, :], b[:, :, j*h:(j+1)*h])
                    for j in range(2)]
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)

    report("M/N 2x2 tiles of %d" % h, jax.jit(mn_2x2), a, b)

    def m_only(a, b):
        return jnp.concatenate(
            [dot(a[:, i*h:(i+1)*h, :], b) for i in range(2)], axis=1)

    report("M-only 2 tiles", jax.jit(m_only), a, b)

    def n_only(a, b):
        return jnp.concatenate(
            [dot(a, b[:, :, j*h:(j+1)*h]) for j in range(2)], axis=2)

    report("N-only 2 tiles", jax.jit(n_only), a, b)

    def k_split(a, b):
        return (dot(a[:, :, :h], b[:, :h, :])
                + dot(a[:, :, h:], b[:, h:, :]))

    report("K-split 2 halves", jax.jit(k_split), a, b)

    def nu_split(a, b):
        g = nu // 2
        return jnp.concatenate([dot(a[:g], b[:g]), dot(a[g:], b[g:])])

    report("nu-split 2 groups", jax.jit(nu_split), a, b)

    def mn_4x4(a, b):
        q = m // 4
        rows = []
        for i in range(4):
            cols = [dot(a[:, i*q:(i+1)*q, :], b[:, :, j*q:(j+1)*q])
                    for j in range(4)]
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)

    report("M/N 4x4 tiles of %d" % (m // 4), jax.jit(mn_4x4), a, b)

    # reference points at smaller shapes (fresh operands)
    for (nu2, m2) in ((8, 4096), (16, 4096), (8, 2048), (16, 2048)):
        a2, b2 = make_operands(nu2, m2, m2, m2)
        report(f"one-shot nu={nu2} {m2}^3", jax.jit(dot), a2, b2,
               o=2.0 * nu2 * m2**3)
        del a2, b2


if __name__ == "__main__":
    main()

"""Round-3 probe: can a Mosaic int8 matmul reach >= 240 TOPS on v5e?

Round-2 probes (probe_fused.py) stopped at 191 TOPS (A-stationary) vs XLA's
267 for the batched (nu, m, k) x (nu, k, n) int8 dot.  This probe widens the
search before deciding the fused dot+epilogue architecture (VERDICT round-2
item 1):

  * 2-D flattened plane layouts -- planes stored (nu*m, k) / (nu*k, n) so
    every BlockSpec is a plain 2-D tile (no leading singleton dim that can
    force a Mosaic relayout);
  * bigger blocks (up to 1024 x 1024 x full-K) to amortize per-grid-cell
    overhead;
  * single-dot cells (full-K resident) vs K-loop accumulation cells;
  * nu folded into the M grid axis vs its own sequential axis.

Run on the real TPU:  python tools/probe_matmul3.py [nu m]
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "benchmarks")
from _timing import ping_seconds, timed_loop  # noqa: E402


def mm_flat_kloop(a2, b2, *, nu, m, k, n, bm, bn, bk):
    """A: (nu*m, k), B: (nu*k, n) -> C: (nu*m, n).  Grid (nu, m/bm, n/bn,
    k/bk), K innermost with an int32 VMEM accumulator; all specs 2-D."""

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(ki == k // bk - 1)
        def _():
            o_ref[...] = acc_ref[...]

    grid = (nu, m // bm, n // bn, k // bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda u, i, j, ki: (u * (m // bm) + i, ki)),
            pl.BlockSpec((bk, bn), lambda u, i, j, ki: (u * (k // bk) + ki, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda u, i, j, ki: (u * (m // bm) + i, j)),
        out_shape=jax.ShapeDtypeStruct((nu * m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel",
                                 "arbitrary")),
    )(a2, b2)


def mm_flat_fullk(a2, b2, *, nu, m, k, n, bm, bn):
    """Full-K cells: one dot per grid cell, no accumulator."""

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    grid = (nu, m // bm, n // bn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda u, i, j: (u * (m // bm) + i, j * 0)),
            pl.BlockSpec((k, bn), lambda u, i, j: (u, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda u, i, j: (u * (m // bm) + i, j)),
        out_shape=jax.ShapeDtypeStruct((nu * m, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(a2, b2)


def mm_flat_kloop_multidot(a2, b2, *, nu, m, k, n, bm, bn, bk, nd):
    """K-loop cells doing `nd` sequential dots per cell over a (bm, nd*bk)
    A block (halves grid-cell count without growing the B block)."""

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc = acc_ref[...]
        for d in range(nd):
            acc += jax.lax.dot_general(
                a_ref[:, d * bk:(d + 1) * bk], b_ref[d * bk:(d + 1) * bk, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc_ref[...] = acc

        @pl.when(ki == k // (nd * bk) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    grid = (nu, m // bm, n // bn, k // (nd * bk))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, nd * bk),
                         lambda u, i, j, ki: (u * (m // bm) + i, ki)),
            pl.BlockSpec((nd * bk, bn),
                         lambda u, i, j, ki: (u * (k // (nd * bk)) + ki, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn),
                               lambda u, i, j, ki: (u * (m // bm) + i, j)),
        out_shape=jax.ShapeDtypeStruct((nu * m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "parallel",
                                 "arbitrary")),
    )(a2, b2)


def main():
    print("device:", jax.devices()[0].device_kind)
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    nu = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    k = n = m
    a3 = rng.integers(-127, 128, (nu, m, k)).astype(np.int8)
    b3 = rng.integers(-127, 128, (nu, k, n)).astype(np.int8)
    a2 = jnp.asarray(a3.reshape(nu * m, k))
    b2 = jnp.asarray(b3.reshape(nu * k, n))
    a3 = jnp.asarray(a3)
    b3 = jnp.asarray(b3)

    ref_slice = jax.jit(lambda x, y: jax.lax.dot_general(
        x[:, :256], y, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32))(a3, b3)

    def report(name, f, flat):
        try:
            out = f(a2, b2) if flat else f(a3, b3)
            got = (out.reshape(nu, m, n)[:, :256] if flat
                   else out[:, :256])
            ok = bool(jnp.all(got == ref_slice))
            x, y = (a2, b2) if flat else (a3, b3)
            t = timed_loop(f, x, y, iters=4, ping=ping)
            tops = 2 * nu * m * n * k / t / 1e12
            print(f"{name}: {t*1e3:8.2f} ms  {tops:6.1f} TOPS  ok={ok}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    report("XLA batched dot", jax.jit(functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)), flat=False)

    for bm, bn, bk in [(512, 512, 2048), (512, 1024, 2048), (1024, 512, 2048),
                       (1024, 1024, 2048), (1024, 1024, 4096),
                       (512, 512, 4096), (2048, 1024, 2048)]:
        if bk <= k:
            report(f"flat-kloop bm{bm} bn{bn} bk{bk}",
                   jax.jit(functools.partial(mm_flat_kloop, nu=nu, m=m, k=k,
                                             n=n, bm=bm, bn=bn, bk=bk)),
                   flat=True)

    for bm, bn in [(256, 256), (512, 256), (256, 512), (512, 512),
                   (1024, 512), (512, 1024)]:
        report(f"flat-fullk bm{bm} bn{bn}",
               jax.jit(functools.partial(mm_flat_fullk, nu=nu, m=m, k=k, n=n,
                                         bm=bm, bn=bn)),
               flat=True)

    for bm, bn, bk, nd in [(512, 512, 1024, 4), (1024, 1024, 1024, 2),
                           (512, 1024, 512, 8)]:
        report(f"flat-multidot bm{bm} bn{bn} bk{bk} nd{nd}",
               jax.jit(functools.partial(mm_flat_kloop_multidot, nu=nu, m=m,
                                         k=k, n=n, bm=bm, bn=bn, bk=bk,
                                         nd=nd)),
               flat=True)


if __name__ == "__main__":
    main()

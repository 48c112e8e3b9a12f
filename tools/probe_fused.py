"""Probe: Mosaic int8-dot MXU efficiency vs XLA's batched dot_general.

Decides the architecture of the fused GEMM+epilogue kernel (VERDICT item 1).
Design under test: grid (M/BM, N/BN, nu, K/BK) with the modulus axis
SEQUENTIAL -- the CRT sum is linear in the residues, so per-modulus wrapped
residues fold into L limb accumulators in VMEM scratch and only the final
f32 output pair ever reaches HBM.

Run on the real TPU: python tools/probe_fused.py
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


def pallas_matmul_i8_seq(a, b, bm=256, bn=256, bk=512):
    """(nu, m, k) i8 x (nu, k, n) i8 -> (nu, m, n) i32; nu sequential in grid."""
    nu, m, k = a.shape
    n = b.shape[2]

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(ki == k // bk - 1)
        def _():
            o_ref[0] = acc_ref[...]

    grid = (m // bm, n // bn, nu, k // bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda i, j, u, ki: (u, i, ki)),
            pl.BlockSpec((1, bk, bn), lambda i, j, u, ki: (u, ki, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda i, j, u, ki: (u, i, j)),
        out_shape=jax.ShapeDtypeStruct((nu, m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
    )(a, b)


def main():
    print("device:", jax.devices()[0].device_kind)
    ping = ping_seconds()
    print(f"ping {ping*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    nu, m = 16, 4096
    a = jnp.asarray(rng.integers(-127, 128, (nu, m, m)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (nu, m, m)), jnp.int8)

    def report(name, f):
        try:
            out = f(a, b)
            ref = jax.lax.dot_general(
                a[:, :256], b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            ok = bool(jnp.all(out[:, :256] == ref))
            t = timed_loop(f, a, b, iters=4, ping=ping)
            tops = 2 * nu * m**3 / t / 1e12
            print(f"{name}: {t*1e3:7.2f} ms  {tops:6.1f} TOPS  ok={ok}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    report("XLA batched dot", jax.jit(functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)))

    for bm, bn, bk in [(256, 256, 512), (256, 512, 512), (512, 512, 512),
                       (512, 512, 1024), (256, 256, 2048), (512, 1024, 512)]:
        report(f"pallas-seq bm{bm} bn{bn} bk{bk}",
               jax.jit(functools.partial(pallas_matmul_i8_seq,
                                         bm=bm, bn=bn, bk=bk)))


if __name__ == "__main__":
    main()


def pallas_matmul_i8_astat(a, b, bm=512, bn=512):
    """A-stationary: full-K A block resident across the innermost j sweep."""
    nu, m, k = a.shape
    n = b.shape[2]

    def kernel(a_ref, b_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    grid = (m // bm, nu, n // bn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda i, u, j: (u, i, j * 0)),
            pl.BlockSpec((1, k, bn), lambda i, u, j: (u, i * 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda i, u, j: (u, i, j)),
        out_shape=jax.ShapeDtypeStruct((nu, m, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(a, b)


def main2():
    print("device:", jax.devices()[0].device_kind)
    ping = ping_seconds()
    rng = np.random.default_rng(0)
    nu, m = 16, 4096
    a = jnp.asarray(rng.integers(-127, 128, (nu, m, m)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (nu, m, m)), jnp.int8)

    def report(name, f):
        try:
            out = f(a, b)
            ref = jax.lax.dot_general(
                a[:, :256], b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            ok = bool(jnp.all(out[:, :256] == ref))
            t = timed_loop(f, a, b, iters=4, ping=ping)
            tops = 2 * nu * m**3 / t / 1e12
            print(f"{name}: {t*1e3:7.2f} ms  {tops:6.1f} TOPS  ok={ok}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    for bm, bn, bk in [(1024, 1024, 512), (1024, 512, 1024),
                       (1024, 1024, 1024), (2048, 512, 512)]:
        report(f"pallas-seq bm{bm} bn{bn} bk{bk}",
               jax.jit(functools.partial(pallas_matmul_i8_seq,
                                         bm=bm, bn=bn, bk=bk)))
    for bm, bn in [(512, 512), (256, 512), (512, 1024), (1024, 512)]:
        report(f"pallas-astat bm{bm} bn{bn}",
               jax.jit(functools.partial(pallas_matmul_i8_astat,
                                         bm=bm, bn=bn)))

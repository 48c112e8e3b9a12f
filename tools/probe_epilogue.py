"""Probe: fused-epilogue variants at 8192^2 nu=16 (standalone, HBM-resident
C_hi). Variant A = shipped kernel (int32 limb MACs). Variant B = per-modulus
wrap in f32 + MXU dot_general for the 8-bit column contraction.

Run on the real TPU: python tools/probe_epilogue.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from _timing import ping_seconds, timed_loop  # noqa: E402

from gemmul8_tpu import ff, tables  # noqa: E402
from gemmul8_tpu import pallas_kernels as pk  # noqa: E402


def _epilogue_kernel_mxu(sfta_ref, sftb_ref, chi_ref, c8_ref, hi_ref,
                         lo_ref, *, num_moduli, mods, w2_16, n_cols, L,
                         invp_top, p16, base, descale, bm, bn):
    i32 = np.int32
    f32 = np.float32

    rs = []
    for i in range(num_moduli):
        p = f32(mods[i])
        acc = chi_ref[i, :, :]
        acc_hi = jnp.right_shift(acc, i32(16))
        acc_lo = acc - jnp.left_shift(acc_hi, i32(16))
        t = acc_hi.astype(jnp.float32) * f32(w2_16[i]) \
            + acc_lo.astype(jnp.float32)                  # exact, |t| < 2^23
        q = jnp.rint(t * f32(1.0 / mods[i]))
        r = t - q * p
        r = jnp.where(f32(2.0) * r >= p, r - p, r)
        r = jnp.where(f32(2.0) * r < -p, r + p, r)
        rs.append(r)
    r_stack = jnp.stack(rs)                               # (nu, bm, bn) f32
    cols = jax.lax.dot_general(
        c8_ref[:], r_stack, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (n_cols, bm, bn)

    limbs = []
    for li in range(L):
        v = cols[2 * li].astype(jnp.int32)
        if 2 * li + 1 < n_cols:
            v = v + jnp.left_shift(cols[2 * li + 1].astype(jnp.int32),
                                   i32(8))
        limbs.append(v)
    half = i32(1 << 15)
    for li in range(L - 1):
        c = jnp.right_shift(limbs[li] + half, i32(16))
        limbs[li] = limbs[li] - jnp.left_shift(c, i32(16))
        limbs[li + 1] = limbs[li + 1] + c
    t_top = limbs[L - 1].astype(jnp.float32)
    for i in range(2, min(3, L) + 1):
        t_top = t_top * f32(65536.0) + limbs[L - i].astype(jnp.float32)
    quot = jnp.rint(t_top * f32(invp_top)).astype(jnp.int32)
    for li in range(L):
        if p16[li]:
            limbs[li] = limbs[li] - quot * i32(p16[li])
    for li in range(L - 1):
        c = jnp.right_shift(limbs[li] + half, i32(16))
        limbs[li] = limbs[li] - jnp.left_shift(c, i32(16))
        limbs[li + 1] = limbs[li + 1] + c

    sfta = sfta_ref[:]
    sftb = sftb_ref[:]
    ha = jnp.right_shift(-sfta, i32(1))
    fa1 = pk._pow2_f32(ha)
    fa2 = pk._pow2_f32(-sfta - ha)
    hb = jnp.right_shift(-sftb, i32(1))
    fb1 = pk._pow2_f32(hb)
    fb2 = pk._pow2_f32(-sftb - hb)
    hi = None
    lo = None
    for li in range(L):
        s1, s2 = descale[li]
        term = limbs[li].astype(jnp.float32) * f32(s1)
        term = ((term * fa1) * fb1) * f32(s2)
        term = (term * fa2) * fb2
        if hi is None:
            hi = term
            lo = jnp.zeros_like(term)
        else:
            s = hi + term
            tt = s - hi
            err = (hi - (s - tt)) + (term - tt)
            hi = s
            lo = lo + err
    hi_ref[:, :] = hi
    lo_ref[:, :] = lo


@functools.partial(jax.jit, static_argnames=("num_moduli", "backend",
                                             "out_bits", "bm", "bn"))
def fused_epilogue_mxu(c_hi, sft_a, sft_b, num_moduli, backend, out_bits,
                       bm=128, bn=256):
    base, n_cols, C, pcols, invp_top = ff._crt_matrix_plan(
        num_moduli, backend, out_bits)
    mods = tuple(int(p) for p in tables.moduli(backend)[:num_moduli])
    L = (n_cols + 1) // 2
    p16 = []
    for li in range(L):
        v = int(pcols[2 * li])
        if 2 * li + 1 < n_cols:
            v += int(pcols[2 * li + 1]) << 8
        p16.append(v)
    w2_16 = []
    for p in mods:
        w = pow(2, 16, p)
        w2_16.append(w - p if 2 * w >= p else w)
    descale = []
    for li in range(L):
        e = base + 16 * li
        descale.append((float(np.float32(2.0 ** (e // 2))),
                        float(np.float32(2.0 ** (e - e // 2)))))
    m, n = c_hi.shape[1], c_hi.shape[2]
    grid = (m // bm, n // bn)
    kernel = functools.partial(
        _epilogue_kernel_mxu, num_moduli=num_moduli, mods=mods,
        w2_16=tuple(w2_16), n_cols=n_cols, L=L,
        invp_top=float(invp_top), p16=tuple(p16), base=base,
        descale=tuple(descale), bm=bm, bn=bn)
    c8 = jnp.asarray(np.ascontiguousarray(C.T), jnp.float32)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, 1), lambda i, j: (i, j * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn), lambda i, j: (i * 0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((num_moduli, bm, bn),
                               lambda i, j: (i * 0, i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_cols, num_moduli),
                               lambda i, j: (i * 0, j * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((m, n), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(sft_a.reshape(m, 1), sft_b.reshape(1, n), c_hi, c8)


def main():
    print("device:", jax.devices()[0].device_kind)
    ping = ping_seconds()
    rng = np.random.default_rng(0)
    nu, m = 16, 8192
    c_hi = jnp.asarray(rng.integers(-2**30, 2**30, (nu, m, m)), jnp.int32)
    sft = jnp.zeros((m,), jnp.int32)

    fA = jax.jit(lambda s, c: pk.fused_epilogue(c, s, s, nu, "INT8", 53)[0])
    outA = fA(sft, c_hi)
    tA = timed_loop(fA, sft, c_hi, iters=4, ping=ping)
    print(f"A (int MAC):  {tA*1e3:7.2f} ms")

    for bm, bn in [(128, 256), (256, 256), (128, 512), (64, 512)]:
        try:
            fB = jax.jit(lambda s, c, bm=bm, bn=bn: fused_epilogue_mxu(
                c, s, s, nu, "INT8", 53, bm=bm, bn=bn)[0])
            outB = fB(sft, c_hi)
            ok = bool(jnp.all(outA.view(jnp.int32) == outB.view(jnp.int32)))
            tB = timed_loop(fB, sft, c_hi, iters=4, ping=ping)
            print(f"B mxu bm{bm} bn{bn}: {tB*1e3:7.2f} ms  bit-ok={ok}")
        except Exception as e:
            print(f"B mxu bm{bm} bn{bn}: FAIL {type(e).__name__} "
                  f"{str(e)[:150]}")


if __name__ == "__main__":
    main()

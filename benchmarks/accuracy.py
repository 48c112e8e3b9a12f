#!/usr/bin/env python3
"""Accuracy benchmark, mirroring the reference protocol (testing/test_accuracy.hpp):
m=n=128, k swept in powers of two, phi in {-1, 0, 0.5, 1, 2, 4}, num_moduli sweep,
max/median elementwise relative error vs an extended-precision oracle, CSV output
named like the reference's (test_flops.hpp:5).

Usage: python benchmarks/accuracy.py [--dtype f64] [--kmax 16384] [--fast 1]
"""
import argparse
import csv
import datetime
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64", "c64", "c128"])
    ap.add_argument("--kmax", type=int, default=16384)
    ap.add_argument("--fast", type=int, default=1)
    ap.add_argument("--backend", default="INT8", choices=["INT8", "FP8"])
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--out", default=None)
    ap.add_argument("--phis", default=None,
                    help="comma list overriding the phi sweep (TPU subsets)")
    ap.add_argument("--nus", default=None,
                    help="comma list overriding the num_moduli sweep")
    ap.add_argument("--ks", default=None,
                    help="comma list overriding the k sweep")
    ap.add_argument("--no-robust", action="store_true",
                    help="skip the oz2-robust comparison rows")
    ap.add_argument("--oracle-stored", action="store_true",
                    help="evaluate the oracle on the DEVICE-STORED operand "
                         "values (round-trip a/b through the device first). "
                         "Required for a faithful error metric on TPUs whose "
                         "f64 is an f32 pair (~48-bit mantissa): the emulator "
                         "is exact w.r.t. stored values (NUMERICS.md §3)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import gemmul8_tpu as g8

    np_dtype = {"f32": np.float32, "f64": np.float64,
                "c64": np.complex64, "c128": np.complex128}[args.dtype]
    is_cplx = args.dtype.startswith("c")
    nu_range = {"f32": range(3, 14), "f64": range(9, 21),
                "c64": range(3, 14), "c128": range(9, 21)}[args.dtype]

    m = n = 128
    phis = ([float(x) for x in args.phis.split(",")] if args.phis
            else [-1.0, 0.0, 0.5, 1.0, 2.0, 4.0])
    ks = ([int(x) for x in args.ks.split(",")] if args.ks
          else [1 << p for p in range(10, 24) if (1 << p) <= args.kmax])
    if args.nus:
        nu_range = [int(x) for x in args.nus.split(",")]

    dev = jax.devices()[0].device_kind.replace(" ", "")
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        f"oz2_results_{args.backend}_{args.dtype}_accuracy_{dev}_{stamp}.csv")

    def gen(rng, rows, cols, phi):
        def real(seed_rng):
            if phi < 0:
                return seed_rng.standard_normal((rows, cols))
            u = seed_rng.random((rows, cols))
            z = seed_rng.standard_normal((rows, cols))
            return (u - 0.5) * np.exp(z * phi)
        if is_cplx:
            return (real(rng) + 1j * real(rng)).astype(np_dtype)
        return real(rng).astype(np_dtype)

    def oracle(a, b):
        if is_cplx:
            ar, ai = a.real.astype(np.longdouble), a.imag.astype(np.longdouble)
            br, bi = b.real.astype(np.longdouble), b.imag.astype(np.longdouble)
            return (ar @ br - ai @ bi) + 1j * (ar @ bi + ai @ br)
        return a.astype(np.longdouble) @ b.astype(np.longdouble)

    def errs(c, ref):
        d = np.abs(np.asarray(c, ref.dtype) - ref)
        den = np.maximum(np.abs(ref), np.finfo(np.longdouble).tiny)
        e = (d / den).astype(np.float64)
        return float(np.max(e)), float(np.median(e))

    # complex device arrays are UNSUPPORTED on some TPU runtimes (the axon
    # PJRT stack: c64 transfer errors, c128 transfer CRASHES the worker --
    # probing is unsafe). Never materialize one off-CPU: run the emulated
    # rows through the planar (re, im) entry and round-trip components
    # separately. Same policy as flops.py's complex_ok gate.
    cplx_planar = is_cplx and jax.default_backend() != "cpu"

    def emulated_c(a_np, b_np, nu, fm):
        if not cplx_planar:
            return np.asarray(g8.gemm(jnp.asarray(a_np), jnp.asarray(b_np),
                                      num_moduli=nu, fastmode=fm,
                                      backend=args.backend))
        cr, ci = g8.gemm_planar(
            jnp.asarray(np.ascontiguousarray(a_np.real)),
            jnp.asarray(np.ascontiguousarray(a_np.imag)),
            jnp.asarray(np.ascontiguousarray(b_np.real)),
            jnp.asarray(np.ascontiguousarray(b_np.imag)),
            num_moduli=nu, fastmode=fm, backend=args.backend)
        return (np.asarray(cr) + 1j * np.asarray(ci)).astype(np_dtype)

    def roundtrip(x):
        if not is_cplx:
            return np.asarray(jnp.asarray(x)).astype(np_dtype)
        if not cplx_planar:
            return np.asarray(jnp.asarray(x)).astype(np_dtype)
        re = np.asarray(jnp.asarray(np.ascontiguousarray(x.real)))
        im = np.asarray(jnp.asarray(np.ascontiguousarray(x.imag)))
        return (re + 1j * im).astype(np_dtype)

    rows_out = []
    for k in ks:
        for phi in phis:
            rng = np.random.default_rng(12345 + k)
            a = gen(rng, m, k, phi)
            rng2 = np.random.default_rng(54321 + k)
            b = gen(rng2, k, n, phi)
            if args.oracle_stored:
                # round-trip through the device: on f32-pair-f64 TPUs the
                # stored mantissa is ~48 bits; the oracle must see exactly
                # what the emulator sees
                a = roundtrip(a)
                b = roundtrip(b)
            ref = oracle(a, b)
            if jax.default_backend() == "cpu" or is_cplx:
                c_nat = a @ b
            else:
                # the device's own native-path matmul is the comparison row
                c_nat = np.asarray(jnp.asarray(a) @ jnp.asarray(b))
            nat_max, nat_med = errs(c_nat, ref)
            rows_out.append([k, phi, "native", "", nat_max, nat_med])
            print(f"k={k} phi={phi} native: {nat_max:.3e}", file=sys.stderr)
            # alternative-emulation comparison rows (reference:
            # test_accuracy.hpp:84-156 BF16x9 / ozaki1.hpp "OS1")
            if not is_cplx:
                from gemmul8_tpu import compare
                if args.dtype == "f32":
                    alt = compare.matmul_bf16x9(jnp.asarray(a), jnp.asarray(b))
                    amax_, amed_ = errs(np.asarray(alt), ref)
                    rows_out.append([k, phi, "bf16x9", "", amax_, amed_])
                elif k <= (1 << 17):
                    alt = compare.matmul_os1_int8(jnp.asarray(a),
                                                  jnp.asarray(b), d=8)
                    amax_, amed_ = errs(np.asarray(alt), ref)
                    rows_out.append([k, phi, "os1-int8", 8, amax_, amed_])
                else:
                    # OS1's exact-accumulation bound is k <= 2^17 -- record
                    # the skip instead of crashing the sweep (no silent caps)
                    rows_out.append([k, phi, "os1-int8", 8,
                                     "skipped (k > 2^17)", ""])
            for nu in nu_range:
                c = emulated_c(a, b, nu, bool(args.fast))
                emax, emed = errs(c, ref)
                tag = "fast" if args.fast else "accu"
                if args.backend != "INT8":
                    tag += "-" + args.backend.lower()
                rows_out.append([k, phi, f"oz2-{tag}", nu, emax, emed])
                print(f"k={k} phi={phi} nu={nu}: {emax:.3e}", file=sys.stderr)
                if args.fast and not args.no_robust:
                    # the scale-invariant fast variant next to the
                    # reference-formula row
                    cr = emulated_c(a, b, nu, "robust")
                    rmax, rmed = errs(cr, ref)
                    rtag = "oz2-robust" if args.backend == "INT8" \
                        else "oz2-robust-" + args.backend.lower()
                    rows_out.append([k, phi, rtag, nu, rmax, rmed])

    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["k", "phi", "method", "num_moduli", "err_max", "err_median"])
        w.writerows(rows_out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Reference-API (compat-layer) samples with golden expected values.

Analogs of the reference's cuBLASLt samples (sample/dgemm_cuBLASLt_int8.cu,
sample/dgemm_cuBLASLt_fp8.cu): the same tiny exactly-representable DGEMM as
examples/dgemm_int8.py, driven through the argument-for-argument
``gemmul8_tpu.compat`` surface — column-major ld-strided 1-D buffers,
in-place C update, handle + skip-scal reuse, ``gemmLt`` for the FP8 backend
(the plain ``gemm`` entry rejects FP8, exactly like the reference's
plain-cuBLAS entry, gemmul8.cu:136-139).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def colmajor(x, ld):
    """Pack a row-major numpy matrix into a cuBLAS-style column-major
    1-D buffer with leading dimension ld (>= rows)."""
    rows, cols = x.shape
    buf = np.zeros(ld * cols, x.dtype)
    for j in range(cols):
        buf[j * ld:j * ld + rows] = x[:, j]
    return buf


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from gemmul8_tpu import compat

    a = np.array([[1.0, -2.5, 3.25],
                  [0.5, 4.0, -1.125],
                  [-3.0, 0.25, 2.0],
                  [7.5, -0.75, 1.5]])
    b = np.array([[2.0, -1.0, 0.5, 3.0, -0.25],
                  [1.5, 2.5, -3.0, 0.125, 4.0],
                  [-0.5, 1.0, 2.25, -1.5, 0.75]])
    m, k = a.shape
    _, n = b.shape
    expected = a @ b  # exact in f64 (short mantissas)

    # ld-strided column-major device-pointer-style buffers (lda > m on
    # purpose: the stride path must be honored, as with real cuBLAS calls)
    lda, ldb, ldc = m + 2, k, m
    A = colmajor(a, lda)
    B = colmajor(b, ldb)

    h = compat.create()

    # --- gemm (INT8 backend; plain-cuBLAS entry analog) -----------------
    C = np.zeros(ldc * n)
    compat.gemm(h, "N", "N", m, n, k, 1.0, A, lda, B, ldb, 0.0, C, ldc,
                num_moduli=8, fastmode=True)
    got = C.reshape(n, ldc).T[:m]
    err = np.abs(got - expected).max()
    print("compat.gemm INT8 max abs error:", err)
    assert err == 0.0

    # --- gemmLt (FP8 backend; Lt entry analog) --------------------------
    C2 = np.zeros(ldc * n)
    compat.gemmLt(h, "N", "N", m, n, k, 1.0, A, lda, B, ldb, 0.0, C2, ldc,
                  num_moduli=8, fastmode=True, backend="FP8")
    got2 = C2.reshape(n, ldc).T[:m]
    err2 = np.abs(got2 - expected).max()
    print("compat.gemmLt FP8 max abs error:", err2)
    assert err2 == 0.0

    # gemm must reject FP8 exactly like the reference's plain entry
    try:
        compat.gemm(h, "N", "N", m, n, k, 1.0, A, lda, B, ldb, 0.0,
                    np.zeros(ldc * n), ldc, num_moduli=8, fastmode=True,
                    backend="FP8")
    except ValueError as e:
        print("plain gemm rejected FP8 as expected:", str(e)[:60], "...")
    else:
        raise AssertionError("compat.gemm must reject backend='FP8'")

    # --- skip-scal reuse: quantize A once, multiply against two Bs ------
    C3 = np.zeros(ldc * n)
    compat.gemm(h, "N", "N", m, n, k, 1.0, A, lda, B, ldb, 0.0, C3, ldc,
                num_moduli=8, fastmode=True, enable_skip_scalA=True)
    C4 = np.zeros(ldc * n)
    compat.gemm(h, "N", "N", m, n, k, 1.0, A, lda, B, ldb, 0.0, C4, ldc,
                num_moduli=8, fastmode=True, skip_scalA=True)  # cached planes
    got3 = C3.reshape(n, ldc).T[:m]
    got4 = C4.reshape(n, ldc).T[:m]
    assert np.array_equal(got3, got4), "skip-scal reuse must be bit-identical"
    assert np.abs(got3 - expected).max() == 0.0
    print("skip-scal reuse bit-identical: True")

    ws = compat.workSize(m, n, k, 8)
    print(f"workSize({m},{n},{k},nu=8) planning estimate: {ws} bytes")
    compat.destroy(h)
    print("OK")


if __name__ == "__main__":
    main()

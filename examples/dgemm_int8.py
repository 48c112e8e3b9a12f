#!/usr/bin/env python3
"""Minimal DGEMM emulation sample with golden expected values.

Analog of the reference sample (sample/dgemm_cuBLAS_int8.cu:24-67): a tiny
4x3x5 DGEMM whose inputs are exactly representable, so the emulated result must
match the exact product bit-for-bit at sufficient num_moduli.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import gemmul8_tpu as g8

    a = np.array([[1.0, -2.5, 3.25],
                  [0.5, 4.0, -1.125],
                  [-3.0, 0.25, 2.0],
                  [7.5, -0.75, 1.5]])
    b = np.array([[2.0, -1.0, 0.5, 3.0, -0.25],
                  [1.5, 2.5, -3.0, 0.125, 4.0],
                  [-0.5, 1.0, 2.25, -1.5, 0.75]])
    expected = a @ b  # exact in f64 (short mantissas)

    c = np.asarray(g8.gemm(jnp.asarray(a), jnp.asarray(b), num_moduli=8))
    err = np.abs(c - expected).max()
    print("emulated C =\n", c)
    print("max abs error vs exact:", err)
    assert err == 0.0, "sample must reproduce the exact product bit-for-bit"
    print("OK")


if __name__ == "__main__":
    main()

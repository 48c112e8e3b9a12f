#!/usr/bin/env python3
"""Dense LU solve with every O(n^3) flop on the int8 MXU.

HPL-MxP-style mixed-precision direct solver: blocked right-looking LU where
the panel factorizations run natively (O(n * block^2)) but ALL trailing
Schur updates and triangular-solve update GEMMs -- the O(n^3) bulk -- go
through the emulated GEMM (num_moduli dial). Two steps of iterative
refinement (residuals also emulated) push a cheap nu=6 factorization to
full f64 residual quality.
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

    rng = np.random.default_rng(5)
    n = 512
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal((n,))

    aj, bj = jnp.asarray(a), jnp.asarray(b)

    # full-accuracy factorization (nu=14: f64-equivalent updates)
    x = np.asarray(g8.solve(aj, bj, num_moduli=14, block=128))
    r = np.max(np.abs(a @ x - b)) / np.max(np.abs(b))
    print(f"nu=14 LU solve       relative residual: {r:.3e}")
    assert r < 1e-11

    # cheap factorization + refinement (the mixed-precision pattern)
    x0 = np.asarray(g8.solve(aj, bj, num_moduli=6, block=128))
    r0 = np.max(np.abs(a @ x0 - b)) / np.max(np.abs(b))
    x2 = np.asarray(g8.solve(aj, bj, num_moduli=6, block=128,
                             refine_steps=2))
    r2 = np.max(np.abs(a @ x2 - b)) / np.max(np.abs(b))
    print(f"nu=6  LU solve       relative residual: {r0:.3e}")
    print(f"nu=6  + 2 IR steps   relative residual: {r2:.3e}")
    assert r2 < 1e-12

    # the BLAS-3 surface underneath is public too
    t = np.tril(rng.standard_normal((n, n))) + n * np.eye(n)
    rhs = rng.standard_normal((n, 8))
    y = np.asarray(g8.trsm(jnp.asarray(t), jnp.asarray(rhs),
                           num_moduli=14, block=128))
    rt = np.max(np.abs(t @ y - rhs)) / np.max(np.abs(rhs))
    print(f"trsm (lower, left)   relative residual: {rt:.3e}")
    assert rt < 1e-11
    print("OK")


if __name__ == "__main__":
    main()

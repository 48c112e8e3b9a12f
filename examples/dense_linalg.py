#!/usr/bin/env python3
"""The full dense linear-algebra stack on the int8 MXU.

QR / least-squares (blocked Householder compact-WY), SVD and symmetric
eigendecomposition (block Jacobi), and matrix inverse (LU) -- every
O(n^3) flop routed through the emulated GEMM, with num_moduli as the
accuracy dial. The reference (RIKEN-RCCS/GEMMul8) provides the GEMM
building block; this is the building pointed at.
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

    rng = np.random.default_rng(42)
    m, n = 384, 256
    a = rng.standard_normal((m, n))
    aj = jnp.asarray(a)

    # --- QR + least squares -------------------------------------------
    q, r = g8.qr(aj, num_moduli=14)
    q_, r_ = np.asarray(q), np.asarray(r)
    print(f"qr:    |QR - A|     = {np.max(np.abs(q_ @ r_ - a)):.2e}   "
          f"|Q'Q - I| = {np.max(np.abs(q_.T @ q_ - np.eye(n))):.2e}")

    b = rng.standard_normal((m, 3))
    x = np.asarray(g8.lstsq(aj, jnp.asarray(b), num_moduli=14))
    xref = np.linalg.lstsq(a, b, rcond=None)[0]
    print(f"lstsq: |x - x_ref|  = {np.max(np.abs(x - xref)):.2e}")

    # --- SVD (one-sided block Jacobi: batched emulated Gram products) --
    u, s, vt = (np.asarray(z) for z in g8.svd(aj))
    sref = np.linalg.svd(a, compute_uv=False)
    print(f"svd:   |USV' - A|   = "
          f"{np.max(np.abs(u @ np.diag(s) @ vt - a)):.2e}   "
          f"max sigma err = {np.max(np.abs(s - sref) / sref):.2e}")

    # --- symmetric eig (two-sided block Jacobi) ------------------------
    h = np.asarray(a.T @ a / m)
    w, v = (np.asarray(z) for z in g8.eigh(jnp.asarray(h)))
    print(f"eigh:  |Av - vw|    = "
          f"{np.max(np.abs(h @ v - v * w[None, :])):.2e}")

    # --- inverse via LU -------------------------------------------------
    sq = rng.standard_normal((n, n)) + n * np.eye(n)
    inv = np.asarray(g8.inv(jnp.asarray(sq), num_moduli=14))
    print(f"inv:   |A^-1 A - I| = {np.max(np.abs(inv @ sq - np.eye(n))):.2e}")

    # the accuracy dial carries through every algorithm
    s8 = np.asarray(g8.svd(aj, num_moduli=8, compute_uv=False))
    print(f"dial:  svd sigma err nu=8 {np.max(np.abs(s8 - sref) / sref):.1e}"
          f"  vs nu=14 {np.max(np.abs(s - sref) / sref):.1e}")


if __name__ == "__main__":
    main()

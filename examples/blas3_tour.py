#!/usr/bin/env python3
"""Tour of the complete Level-3 BLAS surface on the residue emulator.

The reference is GEMM-only (include/gemmul8.hpp:41-94); this library closes
the full BLAS-3 set on the same engine: gemm, syrk/herk, syr2k/her2k,
symm/hemm, trmm/trsm (and trtri on top of trsm). Every routine dials
accuracy/speed with the same num_moduli/fastmode/backend knobs and inherits
bit-wise reproducibility. Structural guarantees are exact: rank-2k results
are symmetric/Hermitian bit-for-bit, symm/hemm never read the unstored
triangle, trtri's complementary triangle is exactly zero.
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

    rng = np.random.default_rng(0)
    n, k, m = 96, 64, 48
    nu = 16

    # syr2k: C = alpha (A B^T + B A^T) -- ONE emulated product
    a = jnp.asarray(rng.standard_normal((n, k)))
    b = jnp.asarray(rng.standard_normal((n, k)))
    c = np.asarray(g8.syr2k(a, b, num_moduli=nu, alpha=0.5))
    want = 0.5 * (np.asarray(a) @ np.asarray(b).T
                  + np.asarray(b) @ np.asarray(a).T)
    print("syr2k  rel err %.2e  exactly symmetric: %s"
          % (np.abs(c - want).max() / np.abs(want).max(),
             np.array_equal(c, c.T)))

    # her2k: C = alpha A B^H + conj(alpha) B A^H (beta real per BLAS)
    az = jnp.asarray(rng.standard_normal((n, k))
                     + 1j * rng.standard_normal((n, k)))
    bz = jnp.asarray(rng.standard_normal((n, k))
                     + 1j * rng.standard_normal((n, k)))
    alpha = 1.0 - 0.5j
    cz = np.asarray(g8.her2k(az, bz, num_moduli=nu, alpha=alpha))
    wz = (alpha * (np.asarray(az) @ np.asarray(bz).conj().T)
          + np.conj(alpha) * (np.asarray(bz) @ np.asarray(az).conj().T))
    print("her2k  rel err %.2e  exactly Hermitian: %s  diag real: %s"
          % (np.abs(cz - wz).max() / np.abs(wz).max(),
             np.array_equal(cz, cz.conj().T),
             bool((np.imag(np.diagonal(cz)) == 0).all())))

    # symm: only the stored triangle is read (poison the other to prove it)
    s = rng.standard_normal((n, n))
    s = s + s.T
    stored = np.array(s)
    stored[np.triu_indices(n, 1)] = np.nan
    bb = jnp.asarray(rng.standard_normal((n, m)))
    cs = np.asarray(g8.symm(jnp.asarray(stored), bb, lower=True,
                            num_moduli=nu))
    print("symm   rel err %.2e  (NaN-poisoned unread triangle)"
          % (np.abs(cs - s @ np.asarray(bb)).max()
             / np.abs(s @ np.asarray(bb)).max()))

    # hemm: Hermitian operand, diagonal imaginary part ignored per BLAS
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h = h + h.conj().T
    bz2 = jnp.asarray(rng.standard_normal((n, m))
                      + 1j * rng.standard_normal((n, m)))
    ch = np.asarray(g8.hemm(jnp.asarray(np.tril(h)), bz2, num_moduli=nu))
    print("hemm   rel err %.2e"
          % (np.abs(ch - h @ np.asarray(bz2)).max()
             / np.abs(h @ np.asarray(bz2)).max()))

    # trtri: triangular inverse through the blocked emulated-GEMM trsm
    t = np.tril(rng.standard_normal((n, n))) / np.sqrt(n)
    t[np.arange(n), np.arange(n)] = 1.0 + rng.random(n)
    x = np.asarray(g8.trtri(jnp.asarray(t), num_moduli=nu))
    print("trtri  resid %.2e  masked triangle exactly zero: %s"
          % (np.abs(t @ x - np.eye(n)).max() / n,
             bool((np.triu(x, 1) == 0).all())))

    print("OK")


if __name__ == "__main__":
    main()

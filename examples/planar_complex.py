#!/usr/bin/env python3
"""ZGEMM on an accelerator WITHOUT complex dtype support, via the planar API.

The tested TPU v5e PJRT stack implements no complex64/128 at all; the 3M
residue pipeline is planar internally, so gemm_planar provides full
CGEMM/ZGEMM capability from separate (real, imag) arrays -- bit-identical to
gemm() on complex arrays where those exist.
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

    rng = np.random.default_rng(3)
    m, k, n = 32, 96, 24
    a = rng.standard_normal((k, m)) + 1j * rng.standard_normal((k, m))
    b = rng.standard_normal((k, n)) + 1j * rng.standard_normal((k, n))

    # C = A^H @ B, planar in, planar out
    cr, ci = g8.gemm_planar(jnp.asarray(a.real), jnp.asarray(a.imag),
                            jnp.asarray(b.real), jnp.asarray(b.imag),
                            num_moduli=14, trans_a="C")
    ref = a.conj().T @ b
    err = max(np.max(np.abs(np.asarray(cr) - ref.real)),
              np.max(np.abs(np.asarray(ci) - ref.imag)))
    print(f"ZGEMM (C,N) {m}x{k}x{n} nu=14 max abs err: {err:.3e}")
    assert err < 1e-12
    print("OK")


if __name__ == "__main__":
    main()

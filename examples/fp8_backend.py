#!/usr/bin/env python3
"""FP8-backend DGEMM: residues split into fp8-e4m3-exact pairs/triples.

Analog of the reference's Backend::FP8 sample (sample/dgemm_cuBLASLt_fp8.cu):
the wide FP8 moduli (up to 1089) pack ~10 bits per modulus vs INT8's ~8, so
fewer moduli reach the same accuracy (nu=13 ~ native f64)."""
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
    a = jnp.asarray(rng.standard_normal((48, 256)))
    b = jnp.asarray(rng.standard_normal((256, 32)))
    ref = np.asarray(a) @ np.asarray(b)
    for nu in (6, 9, 13):
        c = np.asarray(g8.gemm(a, b, num_moduli=nu, backend="FP8"))
        err = np.max(np.abs(c - ref) / np.abs(ref))
        print(f"FP8 backend nu={nu:2d}: max rel err {err:.3e}")
    print("OK")


if __name__ == "__main__":
    main()

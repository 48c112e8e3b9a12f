#!/usr/bin/env python3
"""Train a small MLP with EVERY matmul (forward and backward) routed through
the emulator via the transparent hook -- bitwise-reproducible training.

Analog of the reference's LD_PRELOAD hook use-case (README.md:258-268,
src/hook.cu): an unmodified training loop gains reproducible high-precision
GEMMs. The hook installs a custom VJP, so gradient GEMMs are emulated too.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import gemmul8_tpu as g8

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    yb = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    params = {
        "w1": jnp.asarray(rng.standard_normal((32, 64)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((64, 8)) * 0.1, jnp.float32),
    }

    def loss(p, x, y):
        h = jnp.tanh(x @ p["w1"])
        return jnp.mean((h @ p["w2"] - y) ** 2)

    @jax.jit
    def step(p, x, y):
        g = jax.grad(loss)(p, x, y)
        return jax.tree.map(lambda w, d: w - 0.1 * d, p, g)

    def train(p):
        for _ in range(20):
            p = step(p, xb, yb)
        return float(loss(p, xb, yb)), p

    with g8.emulate(num_moduli=8):
        l1, p1 = train(params)
        l2, p2 = train(params)

    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))
    print(f"final loss: {l1:.6f}; two runs bit-identical: {same}")
    assert same, "training must be bitwise reproducible under the hook"
    print("OK")


if __name__ == "__main__":
    main()

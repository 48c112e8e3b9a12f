"""Minimal pure-jnp MLP used by the hook-mode end-to-end check (BASELINE config 4:
intercept every dot_general in an FP32 inference pass and verify bitwise-identical
logits across reruns)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_params(key, sizes, dtype=jnp.float32):
    """sizes = [in, h1, ..., out]; returns list of (W, b)."""
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (din, dout), dtype) / jnp.sqrt(jnp.asarray(din, dtype))
        params.append((w, jnp.zeros((dout,), dtype)))
    return params


def forward(params, x):
    """x: (batch, in) -> logits (batch, out); matmuls via jnp.matmul so the
    dot_general hook intercepts them when installed."""
    h = x
    for i, (w, b) in enumerate(params):
        h = jnp.matmul(h, w) + b
        if i + 1 < len(params):
            h = jax.nn.gelu(h)
    return h

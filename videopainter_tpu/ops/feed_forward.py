"""Transformer feed-forward: Linear -> gelu(tanh) -> Linear.

Reference: FeedForward with activation_fn="gelu-approximate" (attention.py:1144-1202,
activations.py:65-90). Dropout is identity at inference; training applies it
via the caller's rng.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import gelu_tanh, init_linear, linear


def feed_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["proj_in"], x)
    h = gelu_tanh(h)
    return linear(p["proj_out"], h)


def init_feed_forward(key, dim: int, *, mult: int = 4, inner_dim=None,
                      bias: bool = True, dtype=jnp.float32) -> dict:
    inner = inner_dim or dim * mult
    k1, k2 = jax.random.split(key)
    return {
        "proj_in": init_linear(k1, dim, inner, bias=bias, dtype=dtype),
        "proj_out": init_linear(k2, inner, dim, bias=bias, dtype=dtype),
    }

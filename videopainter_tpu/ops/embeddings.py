"""Timestep (sinusoidal + MLP) embeddings.

Reference: embeddings.py:27-72 (get_timestep_embedding), :700-760
(TimestepEmbedding), :777-793 (Timesteps). CogVideoX uses
flip_sin_to_cos=True, freq_shift=0, silu activation.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .basic import init_linear, linear, silu


def timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int, *,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       scale: float = 1.0,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding, [N] -> [N, embedding_dim] float32."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def timestep_mlp(p: dict, t_emb: jnp.ndarray) -> jnp.ndarray:
    """TimestepEmbedding: linear -> silu -> linear."""
    h = linear(p["linear_1"], t_emb)
    h = silu(h)
    return linear(p["linear_2"], h)


def init_timestep_mlp(key, in_dim: int, time_embed_dim: int, dtype=jnp.float32) -> dict:
    import jax
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, in_dim, time_embed_dim, dtype=dtype),
        "linear_2": init_linear(k2, time_embed_dim, time_embed_dim, dtype=dtype),
    }

"""AdaLN-style conditioning norms.

Reference: CogVideoXLayerNormZero (normalization.py:358-386) and AdaLayerNorm
with chunk_dim=1 (normalization.py:31-87). Modulation math runs in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import init_layer_norm, init_linear, layer_norm, linear, silu


def layer_norm_zero(
    p: dict,
    hidden_states: jnp.ndarray,          # [B, S_vid, D]
    encoder_hidden_states: Optional[jnp.ndarray],  # [B, S_text, D] or None
    temb: jnp.ndarray,                   # [B, cond_dim]
    *,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (h, enc_h, gate, enc_gate). 6-way chunk: shift, scale, gate for
    video then text. `forward_wo_text` == passing encoder_hidden_states=None
    (normalization.py:381-386 uses only the first three chunks)."""
    mod = linear(p["linear"], silu(temb.astype(jnp.float32)))
    shift, scale, gate, enc_shift, enc_scale, enc_gate = jnp.split(mod, 6, axis=-1)
    h = layer_norm(p.get("norm"), hidden_states, eps=eps)
    h = (h.astype(jnp.float32) * (1 + scale[:, None, :]) + shift[:, None, :]).astype(hidden_states.dtype)
    if encoder_hidden_states is None:
        return h, None, gate[:, None, :].astype(hidden_states.dtype), None
    e = layer_norm(p.get("norm"), encoder_hidden_states, eps=eps)
    e = (e.astype(jnp.float32) * (1 + enc_scale[:, None, :]) + enc_shift[:, None, :]).astype(
        encoder_hidden_states.dtype)
    return (h, e, gate[:, None, :].astype(hidden_states.dtype),
            enc_gate[:, None, :].astype(hidden_states.dtype))


def init_layer_norm_zero(key, cond_dim: int, embed_dim: int, *,
                         elementwise_affine: bool = True, dtype=jnp.float32) -> dict:
    return {
        "linear": init_linear(key, cond_dim, 6 * embed_dim, dtype=dtype),
        "norm": init_layer_norm(embed_dim, affine=elementwise_affine, dtype=dtype),
    }


def ada_layer_norm(p: dict, x: jnp.ndarray, temb: jnp.ndarray, *,
                   eps: float = 1e-5) -> jnp.ndarray:
    """Final-output AdaLN with chunk_dim=1: (shift, scale) chunk order.

    Reference: normalization.py:68-86 -
        shift, scale = chunk(linear(silu(temb)), 2, dim=1)
        x = norm(x) * (1 + scale[:, None, :]) + shift[:, None, :]
    """
    mod = linear(p["linear"], silu(temb.astype(jnp.float32)))
    shift, scale = jnp.split(mod, 2, axis=-1)
    y = layer_norm(p.get("norm"), x, eps=eps)
    y = y.astype(jnp.float32) * (1 + scale[:, None, :]) + shift[:, None, :]
    return y.astype(x.dtype)


def init_ada_layer_norm(key, embedding_dim: int, output_dim: int, *,
                        elementwise_affine: bool = True, dtype=jnp.float32) -> dict:
    return {
        "linear": init_linear(key, embedding_dim, output_dim, dtype=dtype),
        "norm": init_layer_norm(output_dim // 2, affine=elementwise_affine, dtype=dtype),
    }

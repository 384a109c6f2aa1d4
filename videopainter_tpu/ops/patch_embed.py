"""Joint [text ‖ video] patch embedding.

Reference: CogVideoXPatchEmbed (embeddings.py:337-455). The reference uses a
Conv2d(p, stride=p) per frame; on TPU a strided conv with kernel==stride is
exactly a reshape + one big matmul, which lands on the MXU with no im2col —
so we patchify via reshape and einsum. The converter reorders the torch conv
weight [O, I, kh, kw] -> [kh, kw, I, O] -> [(kh kw I), O] to match.

Our video layout is channels-last: [B, T, H, W, C].

Mask pathway (embeddings.py:417-426): masks are avg-pooled to the patch grid
and binarized with > 0.0 (any masked pixel in a patch marks the whole patch).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import init_linear, linear


def patchify(video: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, T*(H/p)*(W/p), p*p*C] with (ph, pw, c) minor order."""
    b, t, h, w, c = video.shape
    p = patch_size
    x = video.reshape(b, t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # [B, T, h, w, ph, pw, C]
    return x.reshape(b, t * (h // p) * (w // p), p * p * c)


def unpatchify(tokens: jnp.ndarray, num_frames: int, height: int, width: int,
               patch_size: int) -> jnp.ndarray:
    """[B, T*h*w, p*p*C] -> [B, T, H, W, C].

    Matches the reference unpatchify permute (cogvideox_transformer_3d.py:630-632):
    proj_out produces channel-major (c, ph, pw) per token.
    """
    b, s, d = tokens.shape
    p = patch_size
    h, w = height // p, width // p
    c = d // (p * p)
    x = tokens.reshape(b, num_frames, h, w, c, p, p)
    # [B, T, h, w, C, ph, pw] -> [B, T, h, ph, w, pw, C]
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)
    return x.reshape(b, num_frames, height, width, c)


def pool_patch_mask(masks: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, T, H, W] (float 0/1) -> bool [B, T*(H/p)*(W/p)] via avgpool + (>0)."""
    b, t, h, w = masks.shape
    p = patch_size
    m = masks.reshape(b, t, h // p, p, w // p, p)
    m = m.mean(axis=(3, 5))
    return (m > 0.0).reshape(b, t * (h // p) * (w // p))


def patch_embed(
    p: dict,
    text_embeds: jnp.ndarray,       # [B, S_text, text_dim]
    video: jnp.ndarray,             # [B, T, H, W, C]
    *,
    patch_size: int,
    masks: Optional[jnp.ndarray] = None,  # [B, T, H, W] float
    pos_embedding: Optional[jnp.ndarray] = None,  # [1, S_text+S_vid, D] or None
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (joint_embeds [B, S_text+S_vid, D], patch_mask bool [B, S_vid] | None)."""
    text = linear(p["text_proj"], text_embeds)
    patches = patchify(video, patch_size)
    vid = linear(p["proj"], patches)
    embeds = jnp.concatenate([text, vid.astype(text.dtype)], axis=1)
    if pos_embedding is not None:
        embeds = embeds + pos_embedding.astype(embeds.dtype)
    patch_mask = pool_patch_mask(masks, patch_size) if masks is not None else None
    return embeds, patch_mask


def init_patch_embed(key, *, patch_size: int, in_channels: int, embed_dim: int,
                     text_embed_dim: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "proj": init_linear(k1, patch_size * patch_size * in_channels, embed_dim, dtype=dtype),
        "text_proj": init_linear(k2, text_embed_dim, embed_dim, dtype=dtype),
    }

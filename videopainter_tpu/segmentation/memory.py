"""SAM2 memory attention + memory encoder — JAX.

Reference: app/sam2/modeling/memory_attention.py (MemoryAttentionLayer
:15-100, MemoryAttention :103-170) and memory_encoder.py (MaskDownSampler
:17-60, CXBlock :63-115, Fuser :118-135, MemoryEncoder :138-181).
transformer.py RoPEAttention (:285-360): axial 2D RoPE on q and the spatial
part of k (object-pointer tokens excluded via num_k_exclude_rope).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import layer_norm, linear
from .modules import (apply_rotary_enc, channel_layer_norm, compute_axial_cis,
                      conv2d, sdpa, sine_pos_embed)

def _gelu_exact(x):
    """torch nn.GELU default (erf), not the tanh approximation."""
    import jax

    return jax.nn.gelu(x, approximate=False)




def _rope_attention(p: dict, q, k, v, *, num_heads: int, feat_size: Tuple[int, int],
                    rope_theta: float = 10000.0, rope_k_repeat: bool = False,
                    num_k_exclude_rope: int = 0):
    """RoPEAttention (reference transformer.py:285-360). q/k/v [B, S, C]."""
    q = linear(p["q_proj"], q)
    k = linear(p["k_proj"], k)
    v = linear(p["v_proj"], v)

    def split(x):
        b, n, c = x.shape
        return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    head_dim = qh.shape[-1]
    cis = compute_axial_cis(head_dim, feat_size[0], feat_size[1], rope_theta)
    num_k_rope = kh.shape[-2] - num_k_exclude_rope
    qh, k_rot = apply_rotary_enc(qh, kh[:, :, :num_k_rope], cis,
                                 repeat_freqs_k=rope_k_repeat)
    kh = jnp.concatenate([k_rot, kh[:, :, num_k_rope:]], axis=-2) \
        if num_k_exclude_rope > 0 else k_rot
    out = sdpa(qh, kh, vh)
    b, h, n, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    return linear(p["out_proj"], out)


def memory_attention(
    p: dict,
    curr: jnp.ndarray,          # [S_cur, B, C] current-frame features (seq-first)
    memory: jnp.ndarray,        # [S_mem, B, C_mem] memory tokens
    curr_pos: jnp.ndarray,      # [S_cur, B, C]
    memory_pos: jnp.ndarray,    # [S_mem, B, C_mem]
    *,
    num_heads: int,
    feat_size: Tuple[int, int],
    num_obj_ptr_tokens: int = 0,
    pos_enc_at_input: bool = True,
) -> jnp.ndarray:
    """MemoryAttention forward (reference :103-170); layer config matches the
    SAM2 yamls (pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
    pos_enc_at_cross_attn_queries=False, relu FF)."""
    output = curr
    if pos_enc_at_input:
        output = output + 0.1 * curr_pos

    # batch-first internally
    x = output.transpose(1, 0, 2)
    qpos = curr_pos.transpose(1, 0, 2)
    mem = memory.transpose(1, 0, 2)
    mpos = memory_pos.transpose(1, 0, 2)

    for lp in p["layers"]:
        # self-attn (RoPE), no pos enc added at attn
        t2 = layer_norm(lp["norm1"], x)
        t2 = _rope_attention(lp["self_attn"], t2, t2, t2, num_heads=num_heads,
                             feat_size=feat_size)
        x = x + t2
        # cross-attn to memory (RoPE w/ k repeat; obj-ptr tokens excluded)
        t2 = layer_norm(lp["norm2"], x)
        t2 = _rope_attention(lp["cross_attn_image"], t2, mem + mpos, mem,
                             num_heads=num_heads, feat_size=feat_size,
                             rope_k_repeat=True,
                             num_k_exclude_rope=num_obj_ptr_tokens)
        x = x + t2
        # FF (relu)
        t2 = layer_norm(lp["norm3"], x)
        t2 = linear(lp["linear2"], jax.nn.relu(linear(lp["linear1"], t2)))
        x = x + t2

    x = layer_norm(p["norm"], x)
    return x.transpose(1, 0, 2)


def memory_encoder(p: dict, pix_feat: jnp.ndarray, masks: jnp.ndarray, *,
                   skip_mask_sigmoid: bool = False):
    """MemoryEncoder (reference :138-181). pix_feat [B, h, w, C]; masks
    [B, H, W, 1] logits at image resolution. Returns (feat [B,h,w,C_out], pos)."""
    if not skip_mask_sigmoid:
        masks = jax.nn.sigmoid(masks)
    x = masks
    n_convs = len(p["mask_down_convs"])
    for i in range(n_convs - 1):
        x = conv2d(p["mask_down_convs"][i], x, stride=4)
        x = _gelu_exact(channel_layer_norm(p["mask_down_lns"][i], x))
    x = conv2d(p["mask_down_convs"][-1], x)

    pf = conv2d(p["pix_feat_proj"], pix_feat)
    y = pf + x
    for lp in p["fuser"]:
        inp = y
        dim = y.shape[-1]
        z = conv2d(lp["dwconv"], y, padding=3, feature_group_count=dim)
        z = channel_layer_norm(lp["norm"], z)
        z = linear(lp["pwconv2"], _gelu_exact(linear(lp["pwconv1"], z)))
        y = inp + lp["gamma"] * z
    if "out_proj" in p:
        y = conv2d(p["out_proj"], y)
    pos = jnp.asarray(sine_pos_embed(y.shape[1], y.shape[2], y.shape[-1]),
                      y.dtype)[None]
    pos = jnp.broadcast_to(pos, y.shape)
    return y, pos

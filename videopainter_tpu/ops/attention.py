"""Joint [text ‖ video] self-attention with RoPE, QK-LayerNorm, cross-clip
blending, and target-region ID resampling.

Reference processors (attention_processor.py):
 - CogVideoXAttnProcessor2_0 (:2097-2211): joint SDPA; RoPE on the video slice
   only; optional prev-clip KV blending `(1-w)*attn + w*attn_prev` (:2156-2189).
 - CogVideoXAttnProcessor2_0_resample (:2213-2305): ID resampling — masked KV
   tokens concatenated onto K/V so target-region tokens get double attention
   weight. NOTE the reference order of operations: the mask multiplies the
   *pre-norm, pre-RoPE* K (and V) projections; norm_k and RoPE are then applied
   to the already-masked K (:2253-2284). We reproduce that exactly.
 - CogVideoXAttnProcessor2_0_wo_text (:2306-2366): video-only attention.

This module is the *reference-exact einsum implementation* (fp32 softmax).
The Pallas flash-attention kernel in ops/flash_attention.py implements the same
contract for the long-sequence hot path; models pick via `use_flash`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import init_layer_norm, init_linear, layer_norm, linear
from .rope import apply_rotary_emb


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         scale: Optional[float] = None) -> jnp.ndarray:
    """Scaled dot-product attention, fp32 softmax. q,k,v: [B, H, S, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _pick_flash(use_flash):
    """use_flash=True -> bf16 Pallas kernel; "int8" -> SageAttention-style
    int8-QK^T kernel; "int8pv" -> additionally int8 P·V (slightly lossier,
    fastest). Both int8 modes are inference-only deployment modes, like the
    W8A8 block projections in quantize.py."""
    if use_flash == "int8":
        from .flash_attention_int8 import flash_attention_int8
        return flash_attention_int8
    if use_flash == "int8pv":
        import functools

        from .flash_attention_int8 import flash_attention_int8
        return functools.partial(flash_attention_int8, int8_pv=True)
    from .flash_attention import flash_attention
    return flash_attention


def _rope_video_slice(x: jnp.ndarray, rope, text_len: int) -> jnp.ndarray:
    """Apply RoPE only to positions [text_len:] of [B, H, S, D].

    Fast path: if the cos/sin tables already cover the FULL sequence (the
    resident padded-sequence mode builds joint tables with identity rows —
    cos=1, sin=0 — over the text segment and pad tail), apply in one shot;
    x*1 + rotate(x)*0 == x bit-exactly, and the per-layer slice+concat
    HBM copies disappear.
    """
    if rope is None:
        return x
    cos, sin = rope
    if cos.shape[0] == x.shape[2]:
        return apply_rotary_emb(x, cos, sin).astype(x.dtype)
    head = x[:, :, :text_len]
    tail = apply_rotary_emb(x[:, :, text_len:], cos, sin)
    return jnp.concatenate([head, tail.astype(x.dtype)], axis=2)


def joint_attention(
    p: dict,
    hidden_states: jnp.ndarray,                # [B, S_vid, D]
    encoder_hidden_states: Optional[jnp.ndarray],  # [B, S_text, D] | None (wo_text)
    *,
    num_heads: int,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    resample_mask: Optional[jnp.ndarray] = None,        # bool [B, S_joint]
    prev_hidden_states: Optional[jnp.ndarray] = None,   # [B, S_joint, D] (pre-normed)
    prev_clip_weight: Optional[float] = None,
    prev_resample_mask: Optional[jnp.ndarray] = None,   # bool [B, S_joint]
    use_flash: bool = False,   # False | True | "int8" (SageAttention-style)
    ring_axis: Optional[str] = None,
    ring_mesh=None,
    qk_norm_eps: float = 1e-6,
    kv_valid_len: Optional[int] = None,  # resident padded-sequence mode: the
                                         # joint sequence arrives pre-padded to
                                         # the flash block multiple; keys past
                                         # this length are masked in-kernel
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (attn_hidden_states, attn_encoder_hidden_states).

    Variant selection mirrors the reference:
     - encoder_hidden_states is None      -> wo_text processor
     - resample_mask/prev_resample given  -> resample processor
     - prev_hidden_states + weight        -> base processor with dual-SDPA blend
    """
    if encoder_hidden_states is not None:
        text_len = encoder_hidden_states.shape[1]
        x = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
    else:
        text_len = 0
        x = hidden_states

    head_dim = x.shape[-1] // num_heads
    if "to_qkv" in p:
        # fused projection (FusedCogVideoXAttnProcessor2_0, :2368-2430):
        # one [D, 3D] matmul fills the MXU better than three [D, D] ones
        qkv = linear(p["to_qkv"], x)
        q_flat, k_flat, v_flat = jnp.split(qkv, 3, axis=-1)
    else:
        q_flat = linear(p["to_q"], x)
        k_flat = linear(p["to_k"], x)
        v_flat = linear(p["to_v"], x)

    use_resample = resample_mask is not None or prev_resample_mask is not None
    has_prev = prev_hidden_states is not None and prev_clip_weight is not None

    # NOTE (measured, round 2): a "no-transpose" [B, S, H, d]-layout Pallas
    # kernel that reads head slices via BlockSpec indexing was tried and is
    # 4.4x SLOWER than split_heads + the [B, H, S, d] kernel at flagship dims
    # (597.9 vs 137.1 ms @ S=17776) — the strided per-head DMAs defeat it, and
    # blocks >=512x512 crash the Mosaic compiler at S>=4096. The head
    # transposes below are the right trade; do not revisit.

    if use_resample:
        # Reference :2247-2262 — mask multiplies the raw K/V projections.
        if has_prev:
            if "to_qkv" in p:
                pqkv = linear(p["to_qkv"], prev_hidden_states)
                _, pk_flat, pv_flat = jnp.split(pqkv, 3, axis=-1)
            else:
                pk_flat = linear(p["to_k"], prev_hidden_states)
                pv_flat = linear(p["to_v"], prev_hidden_states)
            key_mask_flat = pk_flat * prev_resample_mask[..., None].astype(pk_flat.dtype) * prev_clip_weight
            value_mask_flat = pv_flat * prev_resample_mask[..., None].astype(pv_flat.dtype) * prev_clip_weight
        else:
            key_mask_flat = k_flat * resample_mask[..., None].astype(k_flat.dtype)
            value_mask_flat = v_flat * resample_mask[..., None].astype(v_flat.dtype)

    q = _split_heads(q_flat, num_heads)
    k = _split_heads(k_flat, num_heads)
    v = _split_heads(v_flat, num_heads)

    if "norm_q" in p and p["norm_q"] is not None:
        q = layer_norm(p["norm_q"], q, eps=qk_norm_eps)
    if "norm_k" in p and p["norm_k"] is not None:
        k = layer_norm(p["norm_k"], k, eps=qk_norm_eps)

    q = _rope_video_slice(q, rope, text_len)
    k = _rope_video_slice(k, rope, text_len)

    if kv_valid_len is not None and (ring_axis is not None or not use_flash):
        raise ValueError(
            "kv_valid_len (resident padded sequence) is only supported on the "
            "FLASH attention paths; models disable residency for ring/SP "
            "shards and the exact-SDPA mode")

    if use_resample:
        km = _split_heads(key_mask_flat, num_heads)
        vm = _split_heads(value_mask_flat, num_heads)
        if "norm_k" in p and p["norm_k"] is not None:
            km = layer_norm(p["norm_k"], km, eps=qk_norm_eps)
        km = _rope_video_slice(km, rope, text_len)
        k = jnp.concatenate([k, km], axis=2)
        v = jnp.concatenate([v, vm], axis=2)
        if use_flash:
            if kv_valid_len is not None:
                # resident padded sequence: K = [joint page ‖ masked-KV page],
                # both of length S_pad with the same kv_valid_len validity —
                # the kernel's paged mask ((i % S_pad) < kv_len) excludes
                # exactly the rows the per-layer padding never created
                out = _pick_flash(use_flash)(q, k, v, kv_len=kv_valid_len,
                                             kv_page_len=q.shape[2])
            else:
                # S_kv = 2*S_q — the kernel takes ragged/asymmetric kv lengths
                out = _pick_flash(use_flash)(q, k, v)
        else:
            out = sdpa(q, k, v)
    elif has_prev:
        # base processor dual-attention blend (:2156-2189)
        if "to_qkv" in p:
            pqkv = linear(p["to_qkv"], prev_hidden_states)
            _, pk_flat2, pv_flat2 = jnp.split(pqkv, 3, axis=-1)
        else:
            pk_flat2 = linear(p["to_k"], prev_hidden_states)
            pv_flat2 = linear(p["to_v"], prev_hidden_states)
        pk = _split_heads(pk_flat2, num_heads)
        pv = _split_heads(pv_flat2, num_heads)
        if "norm_k" in p and p["norm_k"] is not None:
            pk = layer_norm(p["norm_k"], pk, eps=qk_norm_eps)
        pk = _rope_video_slice(pk, rope, text_len)
        w = prev_clip_weight
        if use_flash:
            # the blend is linear in the attention OUTPUTS (:2156-2189), so
            # two flash calls replace the two SDPAs — at 17,776 tokens the
            # exact path's score matrix cannot materialize on a chip. Under
            # the resident padded sequence both K sets are single pre-padded
            # pages, so the plain kv_len mask covers each call.
            fa = _pick_flash(use_flash)
            out = fa(q, k, v, kv_len=kv_valid_len) * (1.0 - w) \
                + fa(q, pk, pv, kv_len=kv_valid_len) * w
        else:
            out = sdpa(q, k, v) * (1.0 - w) + sdpa(q, pk, pv) * w
    elif ring_axis is not None and ring_mesh is not None and text_len > 0:
        # sequence-parallel ring attention over ICI: video KV shards rotate,
        # text KV folded in once (parallel/ring_attention.py)
        from ..parallel.ring_attention import ring_joint_attention

        out_t, out_v = ring_joint_attention(
            q[:, :, :text_len], q[:, :, text_len:],
            k[:, :, :text_len], k[:, :, text_len:],
            v[:, :, :text_len], v[:, :, text_len:],
            ring_mesh, axis=ring_axis)
        out = jnp.concatenate([out_t, out_v], axis=2)
    else:
        if use_flash:
            out = _pick_flash(use_flash)(q, k, v, kv_len=kv_valid_len)
        else:
            out = sdpa(q, k, v)

    out = _merge_heads(out)
    out = linear(p["to_out"], out)

    if encoder_hidden_states is None:
        return out, None
    return out[:, text_len:], out[:, :text_len]


def init_attention(key, dim: int, *, num_heads: int, qk_norm: bool = True,
                   bias: bool = True, out_bias: bool = True, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    head_dim = dim // num_heads
    p = {
        "to_q": init_linear(ks[0], dim, dim, bias=bias, dtype=dtype),
        "to_k": init_linear(ks[1], dim, dim, bias=bias, dtype=dtype),
        "to_v": init_linear(ks[2], dim, dim, bias=bias, dtype=dtype),
        "to_out": init_linear(ks[3], dim, dim, bias=out_bias, dtype=dtype),
    }
    if qk_norm:
        p["norm_q"] = init_layer_norm(head_dim, dtype=dtype)
        p["norm_k"] = init_layer_norm(head_dim, dtype=dtype)
    return p


def fuse_qkv(attn_params: dict) -> dict:
    """Fold to_q/to_k/to_v into one to_qkv (fuse_qkv_projections analog,
    cogvideox_transformer_3d.py:433-456). Works on a single layer or the
    stacked [L, ...] block tree."""
    import jax.numpy as jnp

    out = {k: v for k, v in attn_params.items()
           if k not in ("to_q", "to_k", "to_v")}
    out["to_qkv"] = {
        "kernel": jnp.concatenate([attn_params[t]["kernel"]
                                   for t in ("to_q", "to_k", "to_v")], axis=-1)}
    if "bias" in attn_params["to_q"]:
        out["to_qkv"]["bias"] = jnp.concatenate(
            [attn_params[t]["bias"] for t in ("to_q", "to_k", "to_v")], axis=-1)
    return out


def fuse_qkv_projections(params: dict) -> dict:
    """Apply fuse_qkv to a transformer/branch param tree's blocks."""
    params = dict(params)
    blocks = dict(params["blocks"])
    blocks["attn1"] = fuse_qkv(blocks["attn1"])
    params["blocks"] = blocks
    return params

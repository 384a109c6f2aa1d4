"""SAM prompt encoder, two-way transformer, and mask decoder — JAX.

Reference: app/sam2/modeling/sam/prompt_encoder.py (:20-185),
transformer.py (TwoWayTransformer :46-140, TwoWayAttentionBlock :143-215,
Attention :219-280), mask_decoder.py (:15-300).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.basic import layer_norm, linear
from .modules import (channel_layer_norm, conv2d, conv_transpose2d, mlp,
                      random_pe_encode, random_pe_grid, sdpa)

def _gelu_exact(x):
    """torch nn.GELU default (erf), not the tanh approximation."""
    import jax

    return jax.nn.gelu(x, approximate=False)




# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def embed_points(p: dict, points: jnp.ndarray, labels: jnp.ndarray,
                 input_image_size: Tuple[int, int], pad: bool = True) -> jnp.ndarray:
    """points [B, N, 2] (x, y in pixels), labels [B, N] in {-1,0,1,2,3}.
    Returns [B, N(+1), C] (reference :81-103)."""
    b = points.shape[0]
    pts = points + 0.5
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((b, 1, 2), pts.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
    coords = pts / jnp.asarray([input_image_size[1], input_image_size[0]],
                               dtype=pts.dtype)
    pe = random_pe_encode(p["pe_gauss"], coords)
    emb = jnp.where((labels == -1)[..., None], 0.0, pe)
    emb = emb + jnp.where((labels == -1)[..., None], p["not_a_point_embed"], 0.0)
    for i in range(4):
        emb = emb + jnp.where((labels == i)[..., None], p["point_embeddings"][i], 0.0)
    return emb


def embed_boxes(p: dict, boxes: jnp.ndarray,
                input_image_size: Tuple[int, int]) -> jnp.ndarray:
    """boxes [B, 4] -> [B, 2, C] corner embeddings (reference :105-114)."""
    coords = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray(
        [input_image_size[1], input_image_size[0]], dtype=boxes.dtype)
    emb = random_pe_encode(p["pe_gauss"], coords)
    emb = emb.at[:, 0].add(p["point_embeddings"][2])
    emb = emb.at[:, 1].add(p["point_embeddings"][3])
    return emb


def embed_masks(p: dict, masks: jnp.ndarray) -> jnp.ndarray:
    """masks [B, H, W, 1] -> dense embeddings [B, h, w, C] (reference :116-119)."""
    md = p["mask_downscaling"]
    x = conv2d(md["conv1"], masks, stride=2)
    x = _gelu_exact(channel_layer_norm(md["ln1"], x))
    x = conv2d(md["conv2"], x, stride=2)
    x = _gelu_exact(channel_layer_norm(md["ln2"], x))
    return conv2d(md["conv3"], x)


def prompt_encoder(p: dict, *, image_embedding_size: Tuple[int, int],
                   input_image_size: Tuple[int, int],
                   points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                   boxes: Optional[jnp.ndarray] = None,
                   masks: Optional[jnp.ndarray] = None):
    """Returns (sparse [B, N, C], dense [B, h, w, C]) (reference :139-185)."""
    parts = []
    bs = 1
    if points is not None:
        coords, labels = points
        bs = coords.shape[0]
        parts.append(embed_points(p, coords, labels, input_image_size,
                                  pad=boxes is None))
    if boxes is not None:
        bs = boxes.shape[0]
        parts.append(embed_boxes(p, boxes, input_image_size))
    c = p["no_mask_embed"].shape[-1]
    sparse = (jnp.concatenate(parts, axis=1) if parts
              else jnp.zeros((bs, 0, c)))
    if masks is not None:
        dense = embed_masks(p, masks)
    else:
        h, w = image_embedding_size
        dense = jnp.broadcast_to(p["no_mask_embed"][None, None, None], (bs, h, w, c))
    return sparse, dense


def get_dense_pe(p: dict, image_embedding_size: Tuple[int, int]) -> jnp.ndarray:
    """[1, h, w, C] dense positional encoding (reference :69-78)."""
    h, w = image_embedding_size
    return random_pe_grid(p["pe_gauss"], h, w)[None]


# ---------------------------------------------------------------------------
# two-way transformer
# ---------------------------------------------------------------------------

def _attn(p: dict, q, k, v, num_heads: int):
    """SAM Attention with optional internal downsample (reference :219-280)."""
    q = linear(p["q_proj"], q)
    k = linear(p["k_proj"], k)
    v = linear(p["v_proj"], v)

    def split(x):
        b, n, c = x.shape
        return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)

    out = sdpa(split(q), split(k), split(v))
    b, h, n, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    return linear(p["out_proj"], out)


def twoway_transformer(p: dict, image_embedding: jnp.ndarray,
                       image_pe: jnp.ndarray, point_embedding: jnp.ndarray,
                       *, num_heads: int):
    """image_embedding/image_pe: [B, N_img, C]; point_embedding [B, N_pts, C].
    Returns (queries, keys) (reference :46-140)."""
    queries, keys = point_embedding, image_embedding
    for i, lp in enumerate(p["layers"]):
        if i == 0:
            # first layer REPLACES queries (skip_first_layer_pe, :188-189)
            queries = _attn(lp["self_attn"], queries, queries, queries,
                            num_heads)
        else:
            q = queries + point_embedding
            queries = queries + _attn(lp["self_attn"], q, q, queries, num_heads)
        queries = layer_norm(lp["norm1"], queries)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + _attn(lp["cross_attn_token_to_image"], q, k, keys,
                                  num_heads)
        queries = layer_norm(lp["norm2"], queries)

        queries = queries + mlp(lp["mlp"], queries)
        queries = layer_norm(lp["norm3"], queries)

        q = queries + point_embedding
        k = keys + image_pe
        keys = keys + _attn(lp["cross_attn_image_to_token"], k, q, queries,
                            num_heads)
        keys = layer_norm(lp["norm4"], keys)

    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + _attn(p["final_attn"], q, k, keys, num_heads)
    queries = layer_norm(p["norm_final"], queries)
    return queries, keys


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def mask_decoder(p: dict, *, image_embeddings: jnp.ndarray,  # [B, h, w, C]
                 image_pe: jnp.ndarray,                      # [1, h, w, C]
                 sparse_prompt_embeddings: jnp.ndarray,      # [B, N, C]
                 dense_prompt_embeddings: jnp.ndarray,       # [B, h, w, C]
                 multimask_output: bool,
                 num_heads: int = 8,
                 high_res_features: Optional[List[jnp.ndarray]] = None,
                 dynamic_multimask_via_stability: bool = False,
                 stability_delta: float = 0.05,
                 stability_thresh: float = 0.98,
                 iou_prediction_use_sigmoid: bool = False):
    """Reference MaskDecoder.forward/predict_masks (:110-260). Returns
    (masks [B, k, 4h, 4w], iou [B, k], sam_tokens [B, t, C], obj_logits)."""
    b, h, w, c = image_embeddings.shape
    num_mask_tokens = p["mask_tokens"].shape[0]
    pred_obj = "obj_score_token" in p
    toks = [p["iou_token"], p["mask_tokens"]]
    s = 0
    if pred_obj:
        toks = [p["obj_score_token"]] + toks
        s = 1
    output_tokens = jnp.concatenate(toks, axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (b, *output_tokens.shape)),
         sparse_prompt_embeddings], axis=1)

    src = image_embeddings + dense_prompt_embeddings
    src_flat = src.reshape(b, h * w, c)
    pe_flat = jnp.broadcast_to(image_pe.reshape(1, h * w, c), (b, h * w, c))

    hs, src_out = twoway_transformer(p["transformer"], src_flat, pe_flat, tokens,
                                     num_heads=num_heads)
    iou_token_out = hs[:, s]
    mask_tokens_out = hs[:, s + 1: s + 1 + num_mask_tokens]

    src_img = src_out.reshape(b, h, w, c)
    up = p["output_upscaling"]
    if high_res_features is None:
        x = conv_transpose2d(up["convT1"], src_img)
        x = _gelu_exact(channel_layer_norm(up["ln"], x))
        x = _gelu_exact(conv_transpose2d(up["convT2"], x))
    else:
        feat_s0, feat_s1 = high_res_features
        x = conv_transpose2d(up["convT1"], src_img) + feat_s1
        x = _gelu_exact(channel_layer_norm(up["ln"], x))
        x = _gelu_exact(conv_transpose2d(up["convT2"], x) + feat_s0)

    hyper = jnp.stack([mlp(p["hypernet_mlps"][i], mask_tokens_out[:, i])
                       for i in range(num_mask_tokens)], axis=1)  # [B, k, C/8]
    hb, hh, hw, hc = x.shape
    masks = jnp.einsum("bkc,bhwc->bkhw", hyper, x)

    iou_pred = mlp(p["iou_head"], iou_token_out)
    if iou_prediction_use_sigmoid:
        # mask_decoder.py:90-97: restrict iou predictions to [0, 1]
        iou_pred = jax.nn.sigmoid(iou_pred)
    if pred_obj:
        obj_logits = mlp(p["pred_obj_score_head"], hs[:, 0])
    else:
        obj_logits = 10.0 * jnp.ones((b, 1), iou_pred.dtype)

    if multimask_output:
        out_masks, out_iou = masks[:, 1:], iou_pred[:, 1:]
        sam_tokens = mask_tokens_out[:, 1:]
    else:
        if dynamic_multimask_via_stability:
            out_masks, out_iou = _dynamic_multimask(masks, iou_pred,
                                                    stability_delta,
                                                    stability_thresh)
        else:
            out_masks, out_iou = masks[:, :1], iou_pred[:, :1]
        sam_tokens = mask_tokens_out[:, :1]
    return out_masks, out_iou, sam_tokens, obj_logits


def _dynamic_multimask(all_masks, all_iou, delta, thresh):
    """Stability-based fallback (reference :262-300)."""
    multi, multi_iou = all_masks[:, 1:], all_iou[:, 1:]
    best = jnp.argmax(multi_iou, axis=-1)
    bidx = jnp.arange(all_masks.shape[0])
    best_masks = multi[bidx, best][:, None]
    best_iou = multi_iou[bidx, best][:, None]
    single = all_masks[:, :1]
    flat = single.reshape(*single.shape[:2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    stability = jnp.where(area_u > 0, area_i / area_u, 1.0)
    stable = stability >= thresh
    masks_out = jnp.where(stable[..., None, None], single, best_masks)
    iou_out = jnp.where(stable, all_iou[:, :1], best_iou)
    return masks_out, iou_out

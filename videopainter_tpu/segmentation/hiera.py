"""Hiera trunk + FPN neck (SAM2 image encoder) — JAX, channels-last.

Reference: app/sam2/modeling/backbones/hieradet.py (MultiScaleAttention
:60-107, MultiScaleBlock :110-190, Hiera :193-317) and image_encoder.py
(FpnNeck :44-140, ImageEncoder :14-41).

Behavioral notes reproduced:
 - 7x7 s4 p3 patch embed; windowed pos embed = bicubic-resized background
   embed + tiled window embed (:284-296)
 - per-block window attention with q-pooling at stage boundaries; global
   attention (window 0) at configured blocks
 - FPN neck: per-level 1x1 conv + top-down bilinear x2 fusion, sine pos encs
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import init_layer_norm, init_linear, layer_norm, linear
from .modules import (conv2d, init_conv2d, init_mlp, mlp, sdpa, sine_pos_embed,
                      window_partition, window_unpartition)

def _gelu_exact(x):
    """torch nn.GELU default (erf), not the tanh approximation."""
    import jax

    return jax.nn.gelu(x, approximate=False)




@dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 96
    num_heads: int = 1
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    # neck (reference image_encoder.py FpnNeck; the shipped SAM2 configs use
    # fpn_top_down_levels=[2, 3] with nearest interpolation)
    d_model: int = 256
    scalp: int = 1
    fpn_top_down_levels: Optional[Tuple[int, ...]] = None  # None = all levels
    fpn_interp: str = "bilinear"

    @property
    def depth(self):
        return sum(self.stages)

    @property
    def stage_ends(self):
        return [sum(self.stages[:i]) - 1 for i in range(1, len(self.stages) + 1)]

    @property
    def q_pool_blocks(self):
        return [x + 1 for x in self.stage_ends[:-1]][: self.q_pool]

    def block_dims(self):
        """Per-block (dim_in, dim_out, heads, window_size, has_pool)."""
        out = []
        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        for i in range(self.depth):
            dim_out = dim
            window = self.window_spec[cur_stage - 1]
            if self.global_att_blocks and i in self.global_att_blocks:
                window = 0
            if i - 1 in self.stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            out.append((dim, dim_out, heads, window, i in self.q_pool_blocks))
            dim = dim_out
        return out

    @property
    def channel_list(self):
        dims = [d_out for (_, d_out, _, _, _) in self.block_dims()]
        return [dims[i] for i in self.stage_ends[::-1]]


def _maxpool2x(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def _attn(p: dict, x: jnp.ndarray, num_heads: int, pool: bool) -> jnp.ndarray:
    """MultiScaleAttention (reference :60-107). x: [B, H, W, C]."""
    b, h, w, _ = x.shape
    qkv = linear(p["qkv"], x).reshape(b, h * w, 3, num_heads, -1)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if pool:
        q = _maxpool2x(q.reshape(b, h, w, -1))
        h, w = q.shape[1:3]
        q = q.reshape(b, h * w, num_heads, -1)
    out = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
               v.transpose(0, 2, 1, 3))
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, -1)
    return linear(p["proj"], out)


def hiera_block(p: dict, x: jnp.ndarray, *, dim: int, dim_out: int,
                num_heads: int, window: int, has_pool: bool) -> jnp.ndarray:
    """MultiScaleBlock (reference :110-190)."""
    shortcut = x
    xn = layer_norm(p["norm1"], x, eps=1e-6)
    if dim != dim_out:
        # q-pooling only ever occurs at stage boundaries where dim changes
        # (reference :162-166: shortcut = do_pool(proj(normed_x)))
        shortcut = linear(p["proj"], xn)
        if has_pool:
            shortcut = _maxpool2x(shortcut)

    h, w = xn.shape[1:3]
    if window > 0:
        xw, pad_hw = window_partition(xn, window)
    else:
        xw, pad_hw = xn, (h, w)
    xw = _attn(p["attn"], xw, num_heads, has_pool)
    if has_pool:
        window_out = window // 2 if window > 0 else 0
        oh, ow = shortcut.shape[1:3]
        if window > 0:
            ph = (window_out - oh % window_out) % window_out
            pw = (window_out - ow % window_out) % window_out
            pad_hw = (oh + ph, ow + pw)
        h, w = oh, ow
        window = window_out
    if window > 0:
        xw = window_unpartition(xw, window, pad_hw, (h, w))
    x = shortcut + xw
    return x + mlp(p["mlp"], layer_norm(p["norm2"], x, eps=1e-6),
                   act=_gelu_exact)


class HieraImageEncoder:
    """Hiera trunk + FpnNeck. apply(params, image [B,H,W,3]) returns
    {"backbone_fpn": [stride4, stride8, stride16(, stride32)],
     "vision_pos_enc": [...]} with `scalp` lowest-res levels dropped."""

    def __init__(self, cfg: HieraConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 4 * cfg.depth + 16))
        p: dict = {
            "patch_embed": init_conv2d(next(keys), 3, cfg.embed_dim, 7, dtype),
            "pos_embed": jnp.zeros((1, *cfg.window_pos_embed_bkg_spatial_size,
                                    cfg.embed_dim), dtype),
            "pos_embed_window": jnp.zeros((1, cfg.window_spec[0],
                                           cfg.window_spec[0], cfg.embed_dim), dtype),
            "blocks": [],
        }
        for (dim, dim_out, heads, _, _) in self.cfg.block_dims():
            bp = {
                "norm1": init_layer_norm(dim, dtype=dtype),
                "attn": {"qkv": init_linear(next(keys), dim, dim_out * 3, dtype=dtype),
                         "proj": init_linear(next(keys), dim_out, dim_out, dtype=dtype)},
                "norm2": init_layer_norm(dim_out, dtype=dtype),
                "mlp": init_mlp(next(keys), dim_out, int(dim_out * 4), dim_out, 2,
                                dtype=dtype),
            }
            if dim != dim_out:
                bp["proj"] = init_linear(next(keys), dim, dim_out, dtype=dtype)
            p["blocks"].append(bp)
        p["neck"] = {"convs": [init_conv2d(next(keys), ch, cfg.d_model, 1, dtype)
                               for ch in cfg.channel_list]}
        return p

    def _pos_embed(self, p, h, w):
        from .modules import bicubic_resize_torch

        # torch-exact bicubic (a=-0.75); static gather weights, jit-safe
        pe = bicubic_resize_torch(p["pos_embed"].astype(jnp.float32), h, w)
        win = p["pos_embed_window"]
        reps = (1, h // win.shape[1], w // win.shape[2], 1)
        return pe + jnp.tile(win, reps)

    def apply(self, params: dict, image: jnp.ndarray) -> dict:
        cfg = self.cfg
        x = conv2d(params["patch_embed"], image, stride=4, padding=3)
        x = x + self._pos_embed(params, x.shape[1], x.shape[2])

        feats: List[jnp.ndarray] = []
        for i, (bp, spec) in enumerate(zip(params["blocks"], cfg.block_dims())):
            dim, dim_out, heads, window, has_pool = spec
            x = hiera_block(bp, x, dim=dim, dim_out=dim_out, num_heads=heads,
                            window=window, has_pool=has_pool)
            if i in cfg.stage_ends:
                feats.append(x)

        # FPN neck (reference image_encoder.py:101-140): top-down from the
        # lowest resolution; convs[j] handles xs[n-j]
        n = len(feats) - 1
        out = [None] * len(feats)
        pos = [None] * len(feats)
        top_down_levels = (cfg.fpn_top_down_levels
                           if cfg.fpn_top_down_levels is not None
                           else tuple(range(len(feats))))
        prev = None
        for i in range(n, -1, -1):
            lateral = conv2d(params["neck"]["convs"][n - i], feats[i])
            if prev is not None and i in top_down_levels:
                shape = (prev.shape[0], prev.shape[1] * 2, prev.shape[2] * 2,
                         prev.shape[3])
                if cfg.fpn_interp == "nearest":
                    top_down = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                else:
                    top_down = jax.image.resize(
                        prev.astype(jnp.float32), shape,
                        cfg.fpn_interp).astype(lateral.dtype)
                prev = lateral + top_down.astype(lateral.dtype)
            else:
                prev = lateral
            out[i] = prev
            pe = sine_pos_embed(prev.shape[1], prev.shape[2], cfg.d_model)
            pos[i] = jnp.broadcast_to(jnp.asarray(pe, prev.dtype)[None],
                                      prev.shape)

        if cfg.scalp > 0:
            out, pos = out[: -cfg.scalp], pos[: -cfg.scalp]
        return {"backbone_fpn": out, "vision_pos_enc": pos,
                "vision_features": out[-1]}


# -- shipped SAM2 model presets (app/sam2_configs/sam2_hiera_{t,s,b+,l}.yaml) --

def hiera_config(variant: str) -> HieraConfig:
    """Hiera trunk + neck config for the published SAM2 checkpoints."""
    common = dict(d_model=256, scalp=1, fpn_top_down_levels=(2, 3),
                  fpn_interp="nearest",
                  window_pos_embed_bkg_spatial_size=(7, 7))
    presets = {
        "tiny": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                     global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7)),
        "small": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                      global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7)),
        "base_plus": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                          global_att_blocks=(12, 16, 20),
                          window_spec=(8, 4, 14, 7),
                          window_pos_embed_bkg_spatial_size=(14, 14)),
        "large": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                      global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8)),
    }
    if variant not in presets:
        raise ValueError(f"unknown variant {variant}; choose {list(presets)}")
    kw = dict(common)
    kw.update(presets[variant])
    return HieraConfig(**kw)

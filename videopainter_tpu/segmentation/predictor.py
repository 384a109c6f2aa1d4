"""SAM2 interactive video predictor — JAX.

Reference: app/sam2/sam2_video_predictor.py (init_state :41, add_new_points
:170, propagate_in_video :606, reset_state :719) orchestrating
sam2_base.SAM2Base.track_step: per frame —
  1. image-encoder features (cached per frame)
  2. memory conditioning: conditioning frames (clicks) at t_pos 0, the last
     num_maskmem-1 frames' memory features with temporal embeddings, plus
     object-pointer tokens (sam2_base.py:493-662)
  3. SAM heads: prompt encoder (clicks / previous-mask) + mask decoder
  4. memory encoder on the predicted mask (sam2_base.py:664-700)

Functional design: all state (feature cache, memory bank, click sets) lives
in an explicit SAM2State dataclass; the heavy per-frame compute paths are
jitted with static shapes (memory length padded to the maximum bank size).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hiera import HieraConfig, HieraImageEncoder
from .memory import memory_attention, memory_encoder
from .modules import mlp, sine_pos_embed
from .sam_heads import get_dense_pe, mask_decoder, prompt_encoder


@dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = field(default_factory=HieraConfig)
    image_size: int = 512
    num_maskmem: int = 7
    mem_dim: int = 64
    hidden_dim: int = 256
    memory_attention_heads: int = 1
    mask_decoder_heads: int = 8
    max_obj_ptrs_in_encoder: int = 16
    use_obj_ptrs_in_encoder: bool = True
    directly_add_no_mem_embed: bool = True
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    multimask_output_for_tracking: bool = True
    iou_prediction_use_sigmoid: bool = True
    multimask_output_in_sam: bool = True
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    pred_obj_scores: bool = True
    fixed_no_obj_ptr: bool = True
    add_tpos_enc_to_obj_ptrs: bool = True
    binarize_mask_from_pts_for_mem_enc: bool = True

    @property
    def feat_stride(self) -> int:
        return 16

    @property
    def feat_size(self) -> int:
        return self.image_size // self.feat_stride


def get_1d_sine_pe(pos: jnp.ndarray, dim: int, temperature: float = 10000.0):
    pe_dim = dim // 2
    dim_t = temperature ** (jnp.arange(pe_dim, dtype=jnp.float32) / pe_dim)
    t = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(t), jnp.cos(t)], axis=-1)


@dataclass
class FrameOutput:
    maskmem_features: np.ndarray      # [1, h, w, mem_dim]
    maskmem_pos: np.ndarray           # [1, h, w, mem_dim]
    pred_mask: np.ndarray             # [1, H, W] logits at image size
    obj_ptr: np.ndarray               # [1, C]


@dataclass
class SAM2State:
    images: np.ndarray                # [T, H, W, 3] normalized
    features: Dict[int, dict] = field(default_factory=dict)
    points: Dict[int, Tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)
    cond_outputs: Dict[int, FrameOutput] = field(default_factory=dict)
    non_cond_outputs: Dict[int, FrameOutput] = field(default_factory=dict)


_IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SAM2VideoPredictor:
    def __init__(self, cfg: SAM2Config, params: dict):
        self.cfg = cfg
        self.params = params
        self._encode = jax.jit(
            lambda p, img: HieraImageEncoder(cfg.hiera).apply(p, img))

    # -- public API (mirrors sam2_video_predictor.py) -----------------------
    def init_state(self, video: np.ndarray) -> SAM2State:
        """video: [T, H, W, 3] uint8 or float [0,1]; resized to image_size."""
        import cv2

        s = self.cfg.image_size
        frames = []
        for f in video:
            if f.dtype == np.uint8:
                f = f.astype(np.float32) / 255.0
            f = cv2.resize(f, (s, s), interpolation=cv2.INTER_AREA)
            frames.append((f - _IMG_MEAN) / _IMG_STD)
        return SAM2State(images=np.stack(frames))

    def reset_state(self, state: SAM2State) -> None:
        state.points.clear()
        state.cond_outputs.clear()
        state.non_cond_outputs.clear()

    def _frame_features(self, state: SAM2State, idx: int) -> dict:
        if idx not in state.features:
            out = self._encode(self.params["image_encoder"],
                               jnp.asarray(state.images[idx][None]))
            state.features[idx] = jax.tree.map(np.asarray, out)
        return state.features[idx]

    def add_new_points(self, state: SAM2State, frame_idx: int,
                       points: np.ndarray, labels: np.ndarray) -> np.ndarray:
        """points [N, 2] (x, y) in original-resolution pixels scaled by caller
        to image_size; labels [N] (1 fg / 0 bg). Returns mask logits [H, W]."""
        prev = state.points.get(frame_idx)
        if prev is not None:
            points = np.concatenate([prev[0], points], axis=0)
            labels = np.concatenate([prev[1], labels], axis=0)
        state.points[frame_idx] = (points, labels)
        out = self._track_frame(state, frame_idx, is_cond=True,
                                points=(points[None], labels[None]))
        state.cond_outputs[frame_idx] = out
        state.non_cond_outputs.pop(frame_idx, None)
        return out.pred_mask[0]

    def propagate_in_video(self, state: SAM2State, start_frame_idx: int = 0,
                           reverse: bool = False):
        """Yields (frame_idx, mask_logits [H, W]) across the video."""
        t = len(state.images)
        order = (range(start_frame_idx, t) if not reverse
                 else range(start_frame_idx, -1, -1))
        for idx in order:
            if idx in state.cond_outputs:
                yield idx, state.cond_outputs[idx].pred_mask[0]
                continue
            out = self._track_frame(state, idx, is_cond=False, points=None,
                                    reverse=reverse)
            state.non_cond_outputs[idx] = out
            yield idx, out.pred_mask[0]

    # -- internals -----------------------------------------------------------
    def _memory_bank(self, state: SAM2State, frame_idx: int, reverse: bool):
        """Assemble (memory, memory_pos, num_obj_ptr_tokens) following
        sam2_base.py:516-636 (stride r=1)."""
        cfg = self.cfg
        p = self.params
        mems, poss = [], []
        t_pos_and_prevs = [(0, out) for _, out in
                           sorted(state.cond_outputs.items())]
        for t_pos in range(1, cfg.num_maskmem):
            t_rel = cfg.num_maskmem - t_pos
            prev_idx = frame_idx + t_rel if reverse else frame_idx - t_rel
            out = state.non_cond_outputs.get(prev_idx)
            t_pos_and_prevs.append((t_pos, out))
        for t_pos, prev in t_pos_and_prevs:
            if prev is None:
                continue
            feats = prev.maskmem_features.reshape(-1, 1, cfg.mem_dim)
            pos = prev.maskmem_pos.reshape(-1, 1, cfg.mem_dim)
            pos = pos + np.asarray(
                p["maskmem_tpos_enc"][cfg.num_maskmem - t_pos - 1])
            mems.append(feats)
            poss.append(pos)

        n_ptr_tokens = 0
        if cfg.use_obj_ptrs_in_encoder:
            pos_and_ptrs = [(abs(frame_idx - t), o.obj_ptr)
                            for t, o in state.cond_outputs.items()
                            if (t >= frame_idx if reverse else t <= frame_idx)]
            max_ptrs = min(len(state.images), cfg.max_obj_ptrs_in_encoder)
            for t_diff in range(1, max_ptrs):
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or t >= len(state.images):
                    break
                out = state.non_cond_outputs.get(t)
                if out is not None:
                    pos_and_ptrs.append((t_diff, out.obj_ptr))
            if pos_and_ptrs:
                pos_list, ptrs = zip(*pos_and_ptrs)
                obj_ptrs = jnp.asarray(np.stack(ptrs))  # [P, 1, C]
                c = obj_ptrs.shape[-1]
                if cfg.add_tpos_enc_to_obj_ptrs:
                    # sam2_base.py:612-620: sine dim = C only when a projection
                    # follows (proj_tpos_enc_in_obj_ptrs); mem_dim otherwise
                    tpos_dim = c if "obj_ptr_tpos_proj" in p else cfg.mem_dim
                    tpos = get_1d_sine_pe(
                        jnp.asarray(pos_list, jnp.float32) / max(max_ptrs - 1, 1),
                        dim=tpos_dim)
                    if "obj_ptr_tpos_proj" in p:
                        tpos = mlp(p["obj_ptr_tpos_proj"], tpos)[:, : cfg.mem_dim]
                else:
                    tpos = jnp.zeros((len(pos_list), cfg.mem_dim), jnp.float32)
                # split C-dim pointers into mem_dim tokens (sam2_base.py:627-631)
                k = c // cfg.mem_dim
                obj_ptrs = obj_ptrs.reshape(-1, 1, k, cfg.mem_dim)
                obj_ptrs = obj_ptrs.transpose(0, 2, 1, 3).reshape(-1, 1, cfg.mem_dim)
                tpos = jnp.repeat(tpos[:, None], k, axis=0).reshape(
                    -1, 1, cfg.mem_dim)
                mems.append(np.asarray(obj_ptrs))
                poss.append(np.asarray(tpos))
                n_ptr_tokens = obj_ptrs.shape[0]
        if not mems:
            return None, None, 0
        return (np.concatenate(mems, axis=0), np.concatenate(poss, axis=0),
                n_ptr_tokens)

    def _track_frame(self, state: SAM2State, frame_idx: int, *, is_cond: bool,
                     points, reverse: bool = False) -> FrameOutput:
        cfg = self.cfg
        p = self.params
        feats = self._frame_features(state, frame_idx)
        top = jnp.asarray(feats["backbone_fpn"][-1])          # [1, h, w, C]
        top_pos = jnp.asarray(feats["vision_pos_enc"][-1])
        h, w, c = top.shape[1:]
        hi_res = None
        if "conv_s0" in p["mask_decoder"] and len(feats["backbone_fpn"]) >= 3:
            from .modules import conv2d

            hi_res = [conv2d(p["mask_decoder"]["conv_s0"],
                             jnp.asarray(feats["backbone_fpn"][0])),
                      conv2d(p["mask_decoder"]["conv_s1"],
                             jnp.asarray(feats["backbone_fpn"][1]))]

        curr = top.reshape(1, h * w, c).transpose(1, 0, 2)
        curr_pos = top_pos.reshape(1, h * w, c).transpose(1, 0, 2)

        if is_cond and cfg.directly_add_no_mem_embed:
            pix = top + jnp.asarray(p["no_mem_embed"]).reshape(1, 1, 1, -1)
        else:
            memory, memory_pos, n_ptr = self._memory_bank(state, frame_idx, reverse)
            if memory is None:
                mem = jnp.asarray(p["no_mem_embed"]).reshape(1, 1, -1)
                mem_pos = jnp.asarray(p["no_mem_pos_enc"]).reshape(1, 1, -1)
                n_ptr = 0
            else:
                mem = jnp.asarray(memory)
                mem_pos = jnp.asarray(memory_pos)
            pix = memory_attention(
                p["memory_attention"], curr, mem, curr_pos, mem_pos,
                num_heads=cfg.memory_attention_heads, feat_size=(w, h),
                num_obj_ptr_tokens=n_ptr)
            pix = pix.transpose(1, 0, 2).reshape(1, h, w, c)

        # SAM heads
        if points is not None:
            pts = jnp.asarray(points[0], jnp.float32)
            lbl = jnp.asarray(points[1], jnp.int32)
        else:
            pts = jnp.zeros((1, 1, 2), jnp.float32)
            lbl = -jnp.ones((1, 1), jnp.int32)
        sparse, dense = prompt_encoder(
            p["prompt_encoder"], image_embedding_size=(h, w),
            input_image_size=(cfg.image_size, cfg.image_size),
            points=(pts, lbl))
        # _use_multimask (sam2_base.py:770-778): no-point tracking frames count
        # as num_pts=0, which the shipped configs' min_pt_num=0 includes
        num_pts = 0 if points is None else int(points[1].shape[1])
        multimask = (cfg.multimask_output_in_sam
                     and (is_cond or cfg.multimask_output_for_tracking)
                     and cfg.multimask_min_pt_num <= num_pts
                     <= cfg.multimask_max_pt_num)
        masks, iou, sam_tokens, obj_logits = mask_decoder(
            p["mask_decoder"], image_embeddings=pix,
            image_pe=get_dense_pe(p["prompt_encoder"], (h, w)),
            sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
            multimask_output=multimask, num_heads=cfg.mask_decoder_heads,
            high_res_features=hi_res,
            iou_prediction_use_sigmoid=cfg.iou_prediction_use_sigmoid)
        if cfg.pred_obj_scores and obj_logits is not None:
            # hard obj/no-obj gating of the memory mask (sam2_base.py:353-362)
            is_obj = obj_logits > 0
            masks = jnp.where(is_obj[..., None, None], masks, -1024.0)
        if multimask:
            best = int(np.argmax(np.asarray(iou[0])))
            low_res = masks[:, best]
            token = sam_tokens[:, best] if sam_tokens.shape[1] > 1 else sam_tokens[:, 0]
        else:
            low_res = masks[:, 0]
            token = sam_tokens[:, 0]
        obj_ptr = mlp(p["obj_ptr_proj"], token) if "obj_ptr_proj" in p else token
        if cfg.pred_obj_scores and obj_logits is not None and "no_obj_ptr" in p:
            # occlusion handling of the pointer (sam2_base.py:388-399)
            lam = (obj_logits > 0).astype(obj_ptr.dtype)
            if cfg.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1.0 - lam) * jnp.asarray(p["no_obj_ptr"])

        high_res = jax.image.resize(
            low_res, (1, cfg.image_size, cfg.image_size), "bilinear")

        # encode memory (sam2_base.py:664-700)
        binarize = cfg.binarize_mask_from_pts_for_mem_enc and points is not None
        mask_for_mem = ((high_res > 0).astype(jnp.float32) if binarize
                        else jax.nn.sigmoid(high_res))
        mask_for_mem = (mask_for_mem * cfg.sigmoid_scale_for_mem_enc
                        + cfg.sigmoid_bias_for_mem_enc)
        mem_feat, mem_pos = memory_encoder(
            p["memory_encoder"], top, mask_for_mem[..., None],
            skip_mask_sigmoid=True)

        return FrameOutput(
            maskmem_features=np.asarray(mem_feat),
            maskmem_pos=np.asarray(mem_pos),
            pred_mask=np.asarray(high_res),
            obj_ptr=np.asarray(obj_ptr))

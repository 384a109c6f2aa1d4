"""SAM2 single-image predictor + automatic mask generator.

Reference: app/sam2/sam2_image_predictor.py (set_image/predict, 446 LoC) and
app/sam2/automatic_mask_generator.py (grid prompting + quality filtering +
NMS dedup, 434 LoC). Compact JAX equivalents sharing the video predictor's
modules and weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hiera import HieraImageEncoder
from .modules import conv2d
from .predictor import SAM2Config, _IMG_MEAN, _IMG_STD
from .sam_heads import get_dense_pe, mask_decoder, prompt_encoder


class SAM2ImagePredictor:
    def __init__(self, cfg: SAM2Config, params: dict):
        self.cfg = cfg
        self.params = params
        self._encode = jax.jit(
            lambda p, img: HieraImageEncoder(cfg.hiera).apply(p, img))
        self._features = None
        self._orig_hw: Optional[Tuple[int, int]] = None

    def set_image(self, image: np.ndarray) -> None:
        """image [H, W, 3] uint8 or float [0,1]."""
        import cv2

        self._orig_hw = image.shape[:2]
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        s = self.cfg.image_size
        img = cv2.resize(image, (s, s), interpolation=cv2.INTER_AREA)
        img = (img - _IMG_MEAN) / _IMG_STD
        self._features = self._encode(self.params["image_encoder"],
                                      jnp.asarray(img[None]))

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Coords in original-image pixels. Returns (masks [K, H, W] bool -
        or logits when return_logits - iou [K], low_res_logits [K, h*4, w*4])."""
        if self._features is None:
            raise RuntimeError("call set_image first")
        cfg = self.cfg
        p = self.params
        top = self._features["backbone_fpn"][-1]
        if cfg.directly_add_no_mem_embed and "no_mem_embed" in p:
            # sam2_image_predictor.py:100-101: the no-memory embedding is
            # added to the top-level feature exactly as in video training
            top = top + jnp.asarray(p["no_mem_embed"]).reshape(1, 1, 1, -1)
        h, w = top.shape[1:3]
        sy = cfg.image_size / self._orig_hw[0]
        sx = cfg.image_size / self._orig_hw[1]

        pts = lbl = None
        if point_coords is not None:
            pts = jnp.asarray(point_coords, jnp.float32)[None] * \
                jnp.asarray([sx, sy])
            lbl = jnp.asarray(point_labels, jnp.int32)[None]
        if box is not None:
            # reference merges boxes into the point stream as corner points
            # with labels [2, 3], prepended (sam2_image_predictor.py:303-316),
            # and still passes boxes=None so the encoder pads
            bc = (jnp.asarray(box, jnp.float32).reshape(1, 2, 2) *
                  jnp.asarray([sx, sy]))
            bl = jnp.asarray([[2, 3]], jnp.int32)
            if pts is not None:
                pts = jnp.concatenate([bc, pts], axis=1)
                lbl = jnp.concatenate([bl, lbl], axis=1)
            else:
                pts, lbl = bc, bl

        hi_res = None
        if "conv_s0" in p["mask_decoder"] and len(self._features["backbone_fpn"]) >= 3:
            hi_res = [conv2d(p["mask_decoder"]["conv_s0"],
                             self._features["backbone_fpn"][0]),
                      conv2d(p["mask_decoder"]["conv_s1"],
                             self._features["backbone_fpn"][1])]

        sparse, dense = prompt_encoder(
            p["prompt_encoder"], image_embedding_size=(h, w),
            input_image_size=(cfg.image_size, cfg.image_size),
            points=(pts, lbl) if pts is not None else None)
        masks, iou, _, _ = mask_decoder(
            p["mask_decoder"], image_embeddings=top,
            image_pe=get_dense_pe(p["prompt_encoder"], (h, w)),
            sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
            multimask_output=multimask_output, num_heads=cfg.mask_decoder_heads,
            high_res_features=hi_res,
            iou_prediction_use_sigmoid=cfg.iou_prediction_use_sigmoid)
        low_res = np.asarray(masks[0])
        full = jax.image.resize(masks[0], (masks.shape[1], *self._orig_hw),
                                "bilinear")
        full = np.asarray(full)
        return (full if return_logits else full > 0), np.asarray(iou[0]), low_res


# ---------------------------------------------------------------------------
# automatic mask generation
# ---------------------------------------------------------------------------

@dataclass
class AutoMaskConfig:
    points_per_side: int = 16
    pred_iou_thresh: float = 0.8
    stability_score_thresh: float = 0.9
    stability_offset: float = 1.0
    box_nms_thresh: float = 0.7
    min_mask_region_area: int = 0


def _stability_score(logits: np.ndarray, offset: float) -> float:
    hi = (logits > offset).sum()
    lo = (logits > -offset).sum()
    return float(hi / lo) if lo > 0 else 1.0


def _mask_to_box(mask: np.ndarray):
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return None
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)


def _box_iou(a, b):
    x0 = max(a[0], b[0]); y0 = max(a[1], b[1])
    x1 = min(a[2], b[2]); y1 = min(a[3], b[3])
    inter = max(0, x1 - x0) * max(0, y1 - y0)
    area = ((a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / area if area > 0 else 0.0


def _remove_small_regions(mask: np.ndarray, area_thresh: int, mode: str):
    """sam2/utils/amg.py remove_small_regions: fill small holes or drop small
    islands (8-connectivity, native CC kernel instead of cv2)."""
    from ..native import get_connected_components

    correct_holes = mode == "holes"
    working = (mask ^ correct_holes).astype(np.uint8)[None, None]
    labels, areas = get_connected_components(working)
    labels, areas = labels[0, 0], areas[0, 0]
    fg = working[0, 0] > 0
    small = fg & (areas < area_thresh)
    if not small.any():
        return mask, False
    if correct_holes:
        # fill small background components into the mask
        return mask | small, True
    # islands mode: keep only large foreground components (if none survive,
    # keep the largest island — reference fallback)
    keep = fg & ~small
    if not keep.any():
        flat_lab = labels[fg]
        flat_area = areas[fg]
        best = flat_lab[np.argmax(flat_area)]
        keep = labels == best
    return keep, True


def _nms_keep(boxes: List[np.ndarray], scores: List[float], thresh: float) -> List[int]:
    """torchvision.ops.nms semantics: score-descending greedy (index tiebreak),
    suppress IoU strictly greater than thresh."""
    order = sorted(range(len(boxes)), key=lambda i: (-scores[i], i))
    kept: List[int] = []
    for i in order:
        if all(_box_iou(boxes[i], boxes[j]) <= thresh for j in kept):
            kept.append(i)
    return kept


def _box_xyxy_to_xywh(box):
    return [float(box[0]), float(box[1]),
            float(box[2] - box[0]), float(box[3] - box[1])]


class SAM2AutomaticMaskGenerator:
    """Grid-prompted mask proposals with quality filtering + box NMS.

    Exact-parity notes vs app/sam2/automatic_mask_generator.py:
     - candidate order is point-major then mask-index (build_point_grid is
       row-major y-outer/x-inner; _process_batch flattens (points, masks))
     - pred_iou filter is strictly `>` and only applied when thresh > 0 (:312)
     - NMS is torchvision batched_nms with one category: score-descending,
       index tiebreak, suppression strictly `iou > thresh`
     - min_mask_region_area triggers postprocess_small_regions (:186-190):
       fill holes < area, drop islands < area, re-NMS preferring unchanged
       masks (score 1 vs 0)
     - ann dict uses XYWH bbox + crop_box like write_mask_data
    """

    def __init__(self, predictor: SAM2ImagePredictor,
                 cfg: AutoMaskConfig = AutoMaskConfig()):
        self.predictor = predictor
        self.cfg = cfg

    def generate(self, image: np.ndarray) -> List[dict]:
        self.predictor.set_image(image)
        h, w = image.shape[:2]
        n = self.cfg.points_per_side
        xs = (np.arange(n) + 0.5) / n * w
        ys = (np.arange(n) + 0.5) / n * h

        candidates = []
        for y in ys:
            for x in xs:
                logits, ious, low = self.predictor.predict(
                    point_coords=np.array([[x, y]], np.float32),
                    point_labels=np.array([1], np.int32),
                    multimask_output=True, return_logits=True)
                masks = logits > 0.0
                for k in range(masks.shape[0]):
                    if self.cfg.pred_iou_thresh > 0.0 and \
                            not (ious[k] > self.cfg.pred_iou_thresh):
                        continue
                    # stability from the high-res logits (amg.py
                    # calculate_stability_score on the model-threshold masks)
                    stab = _stability_score(logits[k], self.cfg.stability_offset)
                    if self.cfg.stability_score_thresh > 0.0 and \
                            stab < self.cfg.stability_score_thresh:
                        continue
                    box = _mask_to_box(masks[k])
                    if box is None:
                        # empty mask -> batched_mask_to_box yields [0,0,0,0]
                        box = np.zeros(4, np.float32)
                    candidates.append({"segmentation": masks[k],
                                       "predicted_iou": float(ious[k]),
                                       "stability_score": stab,
                                       "box": box,
                                       "point_coords": [[float(x), float(y)]]})
        keep = _nms_keep([c["box"] for c in candidates],
                         [c["predicted_iou"] for c in candidates],
                         self.cfg.box_nms_thresh)
        kept = [candidates[i] for i in keep]

        if self.cfg.min_mask_region_area > 0:
            kept = self._postprocess_small_regions(
                kept, self.cfg.min_mask_region_area, self.cfg.box_nms_thresh)

        anns = []
        for c in kept:
            anns.append({"segmentation": c["segmentation"],
                         "area": int(c["segmentation"].sum()),
                         "bbox": _box_xyxy_to_xywh(c["box"]),
                         "predicted_iou": c["predicted_iou"],
                         "point_coords": c["point_coords"],
                         "stability_score": c["stability_score"],
                         "crop_box": [0.0, 0.0, float(w), float(h)]})
        return anns

    @staticmethod
    def _postprocess_small_regions(kept: List[dict], min_area: int,
                                   nms_thresh: float) -> List[dict]:
        """amg postprocess_small_regions (:367-414): repair each mask, then
        NMS with score 1 for unchanged / 0 for changed masks so unchanged
        masks win duplicates."""
        if not kept:
            return kept
        new_masks, scores = [], []
        for c in kept:
            m = c["segmentation"].copy()
            m, changed = _remove_small_regions(m, min_area, mode="holes")
            unchanged = not changed
            m, changed = _remove_small_regions(m, min_area, mode="islands")
            unchanged = unchanged and not changed
            new_masks.append(m)
            scores.append(float(unchanged))
        boxes = []
        for m in new_masks:
            b = _mask_to_box(m)
            boxes.append(np.zeros(4, np.float32) if b is None else b)
        keep = _nms_keep(boxes, scores, nms_thresh)
        out = []
        for i in keep:
            c = kept[i]
            if scores[i] == 0.0:  # changed: update mask + box
                c = dict(c)
                c["segmentation"] = new_masks[i]
                c["box"] = boxes[i]
            out.append(c)
        return out

"""Automatic mask generator behavioral parity vs torch SAM2AMG
(app/sam2/automatic_mask_generator.py) on the micro hi-res model:
same point grid + thresholds -> the surviving mask set must correspond
(every torch mask has a high-IoU counterpart with matching predicted_iou)."""

import numpy as np
import pytest

from videopainter_tpu.segmentation import SAM2Config
from videopainter_tpu.segmentation.convert import convert_sam2_state_dict
from videopainter_tpu.segmentation.hiera import HieraConfig
from videopainter_tpu.segmentation.image_predictor import (
    AutoMaskConfig, SAM2AutomaticMaskGenerator, SAM2ImagePredictor)


def mask_iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / union if union else 1.0


def test_amg_behavioral_parity(goldens):
    g = goldens("amg")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    cfg = SAM2Config(
        hiera=HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                          window_spec=(4, 2, 4, 2), global_att_blocks=(4,),
                          window_pos_embed_bkg_spatial_size=(4, 4),
                          d_model=32, scalp=1, q_pool=3),
        image_size=64, num_maskmem=7, mem_dim=16, hidden_dim=32,
        memory_attention_heads=2, mask_decoder_heads=8,
        max_obj_ptrs_in_encoder=4, add_tpos_enc_to_obj_ptrs=False)
    pred = SAM2ImagePredictor(cfg, convert_sam2_state_dict(sd))
    amg = SAM2AutomaticMaskGenerator(pred, AutoMaskConfig(
        points_per_side=8, pred_iou_thresh=0.45, stability_score_thresh=0.0,
        stability_offset=1.0, box_nms_thresh=0.7, min_mask_region_area=0))
    anns = amg.generate(g["io::img"])
    n_ref = int(g["n_masks"])
    assert anns, "no masks generated"
    # FULL SET equality: same survivor count, and the i-th survivor (NMS keeps
    # score-descending order, index tiebreak = torchvision batched_nms) must
    # be the i-th torch mask. Masks are compared by IoU (cross-framework
    # logits near 0 may flip individual boundary pixels).
    assert len(anns) == n_ref, (len(anns), n_ref)
    for i in range(n_ref):
        ref_m = g[f"mask::{i}"] > 0
        ref_iou = float(g[f"iou::{i}"])
        ref_stab = float(g[f"stab::{i}"])
        a = anns[i]
        assert mask_iou(a["segmentation"], ref_m) > 0.99, f"mask {i} differs"
        assert abs(a["predicted_iou"] - ref_iou) < 1e-3, f"iou {i}"
        assert abs(a["stability_score"] - ref_stab) < 1e-2, f"stability {i}"

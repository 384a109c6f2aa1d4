"""SAM2ImagePredictor parity vs the torch single-image path
(sam2_image_predictor.py:66-345) on the micro hi-res model."""

import numpy as np
import pytest

from videopainter_tpu.segmentation import SAM2Config
from videopainter_tpu.segmentation.convert import convert_sam2_state_dict
from videopainter_tpu.segmentation.hiera import HieraConfig
from videopainter_tpu.segmentation.image_predictor import SAM2ImagePredictor


@pytest.fixture(scope="module")
def env(goldens):
    g = goldens("sam2_image")
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
    pred.set_image(g["io::img"])
    return g, pred


def test_point_prompt(env):
    g, pred = env
    masks, iou, low = pred.predict(point_coords=g["io::pt::coords"],
                                   point_labels=g["io::pt::labels"],
                                   multimask_output=True, return_logits=True)
    np.testing.assert_allclose(iou, g["io::pt::iou"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(masks, g["io::pt::masks"], rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(low, g["io::pt::low"], rtol=1e-3, atol=2e-3)


def test_box_prompt(env):
    g, pred = env
    masks, iou, _ = pred.predict(box=g["io::box::box"],
                                 multimask_output=False, return_logits=True)
    np.testing.assert_allclose(iou, g["io::box::iou"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(masks, g["io::box::masks"], rtol=1e-3, atol=2e-3)

"""SAM2 video predictor end-to-end parity vs the torch reference.

Golden (tests/goldens/sam2_e2e.npz, from tools/gen_goldens_sam2_e2e.py)
drives the full vendored torch SAM2VideoPredictor — init_state on 4 JPEG
frames, one click on frame 0, propagate_in_video — through the complete
track_step stack (reference app/sam2/modeling/sam2_base.py:493-700 +
sam2_video_predictor.py:41-719). We must reproduce every per-frame mask.
"""

import numpy as np
import pytest

from videopainter_tpu.segmentation import SAM2Config, SAM2VideoPredictor
from videopainter_tpu.segmentation.convert import convert_sam2_state_dict
from videopainter_tpu.segmentation.hiera import HieraConfig

TOL = dict(rtol=1e-3, atol=2e-3)


@pytest.fixture(scope="module")
def env(goldens):
    g = goldens("sam2_e2e")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_sam2_state_dict(sd)
    cfg = SAM2Config(
        hiera=HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                          window_spec=(4, 2, 4, 2), global_att_blocks=(4,),
                          window_pos_embed_bkg_spatial_size=(4, 4),
                          d_model=32, scalp=1, q_pool=3),
        image_size=64, num_maskmem=7, mem_dim=16, hidden_dim=32,
        memory_attention_heads=2, mask_decoder_heads=8,
        max_obj_ptrs_in_encoder=4, add_tpos_enc_to_obj_ptrs=False)
    predictor = SAM2VideoPredictor(cfg, params)
    return g, predictor


def test_click_mask_matches(env):
    g, predictor = env
    state = predictor.init_state(g["io::video_decoded"])
    mask = predictor.add_new_points(state, 0, g["io::points"], g["io::labels"])
    np.testing.assert_allclose(np.squeeze(mask), np.squeeze(g["io::click_mask"]),
                               **TOL)


def test_propagation_matches(env):
    g, predictor = env
    state = predictor.init_state(g["io::video_decoded"])
    predictor.add_new_points(state, 0, g["io::points"], g["io::labels"])
    for idx, mask in predictor.propagate_in_video(state):
        ref = np.squeeze(g[f"io::prop::{idx}"])
        np.testing.assert_allclose(np.squeeze(mask), ref, err_msg=f"frame {idx}",
                                   **TOL)
        # sanity: the tracked object stays segmented (positive logits exist)
        assert (np.squeeze(mask) > 0).any(), f"frame {idx} lost the object"


@pytest.fixture(scope="module")
def env_hires(goldens):
    """Same micro model but use_high_res_features_in_sam=True (the shipped
    configs' production path: conv_s0/s1 stride-4/8 features feed the mask
    decoder upscaling)."""
    g = goldens("sam2_e2e_hires")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_sam2_state_dict(sd)
    cfg = SAM2Config(
        hiera=HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                          window_spec=(4, 2, 4, 2), global_att_blocks=(4,),
                          window_pos_embed_bkg_spatial_size=(4, 4),
                          d_model=32, scalp=1, q_pool=3),
        image_size=64, num_maskmem=7, mem_dim=16, hidden_dim=32,
        memory_attention_heads=2, mask_decoder_heads=8,
        max_obj_ptrs_in_encoder=4, add_tpos_enc_to_obj_ptrs=False)
    return g, SAM2VideoPredictor(cfg, params)


def test_hires_click_and_propagation(env_hires):
    g, predictor = env_hires
    state = predictor.init_state(g["io::video_decoded"])
    mask = predictor.add_new_points(state, 0, g["io::points"], g["io::labels"])
    np.testing.assert_allclose(np.squeeze(mask), np.squeeze(g["io::click_mask"]),
                               **TOL)
    for idx, m in predictor.propagate_in_video(state):
        np.testing.assert_allclose(np.squeeze(m),
                                   np.squeeze(g[f"io::prop::{idx}"]),
                                   err_msg=f"frame {idx}", **TOL)


def test_reverse_propagation_matches(env):
    """Click on the LAST frame, propagate backwards (reverse memory ordering
    + future-obj-pointer selection, sam2_video_predictor.py:606+ reverse)."""
    g, predictor = env
    state = predictor.init_state(g["io::video_decoded"])
    mask = predictor.add_new_points(state, 3,
                                    np.array([[40.0, 36.0]], np.float32),
                                    np.array([1], np.int32))
    np.testing.assert_allclose(np.squeeze(mask),
                               np.squeeze(g["io::rev_click_mask"]), **TOL)
    for idx, m in predictor.propagate_in_video(state, start_frame_idx=3,
                                               reverse=True):
        np.testing.assert_allclose(np.squeeze(m),
                                   np.squeeze(g[f"io::rev::{idx}"]),
                                   err_msg=f"frame {idx}", **TOL)

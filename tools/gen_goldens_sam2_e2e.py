"""End-to-end SAM2 video-predictor golden from the vendored torch code.

Builds a micro SAM2Base (64x64 images, tiny Hiera trunk) wired with the
shipped sam2_hiera_t.yaml behavioral flags (use_high_res_features off to
match the module goldens), drives the full torch SAM2VideoPredictor
(init_state -> add_new_points -> propagate_in_video) on a 4-frame synthetic
video, and records per-frame mask logits + the model state dict.

Run offline: python tools/gen_goldens_sam2_e2e.py
Writes tests/goldens/sam2_e2e.npz.
"""

import os
import sys
import tempfile
import types

import numpy as np
import torch

hydra = types.ModuleType("hydra")
hydra.initialize_config_module = lambda *a, **k: None
hydra.compose = lambda *a, **k: None
sys.modules.setdefault("hydra", hydra)
sys.path.insert(0, "/root/reference/app")

# the vendored video predictor hardcodes .cuda(); run it on CPU here
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

from PIL import Image  # noqa: E402

from sam2.modeling.backbones.hieradet import Hiera  # noqa: E402
from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder  # noqa: E402
from sam2.modeling.position_encoding import PositionEmbeddingSine  # noqa: E402
from sam2.modeling.sam.transformer import RoPEAttention  # noqa: E402
from sam2.modeling.memory_attention import (MemoryAttention,  # noqa: E402
                                            MemoryAttentionLayer)
from sam2.modeling.memory_encoder import (CXBlock, Fuser,  # noqa: E402
                                          MaskDownSampler, MemoryEncoder)
from sam2.sam2_video_predictor import SAM2VideoPredictor  # noqa: E402

OUT = "tests/goldens/sam2_e2e.npz"
D_MODEL = 32


def build_model():
    torch.manual_seed(7)
    trunk = Hiera(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                  window_spec=(4, 2, 4, 2), global_att_blocks=(4,),
                  window_pos_embed_bkg_spatial_size=(4, 4), q_pool=3)
    neck = FpnNeck(position_encoding=PositionEmbeddingSine(num_pos_feats=D_MODEL),
                   d_model=D_MODEL, backbone_channel_list=trunk.channel_list,
                   fpn_interp_model="bilinear")
    image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)

    def rope_attn(**kw):
        return RoPEAttention(embedding_dim=D_MODEL, num_heads=2,
                             rope_theta=10000.0, feat_sizes=(4, 4), **kw)

    layer = MemoryAttentionLayer(
        activation="relu", d_model=D_MODEL, dim_feedforward=64, dropout=0.0,
        pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        self_attention=rope_attn(),
        cross_attention=rope_attn(rope_k_repeat=True, kv_in_dim=16))
    memory_attention = MemoryAttention(d_model=D_MODEL, pos_enc_at_input=True,
                                       layer=layer, num_layers=2,
                                       batch_first=True)
    memory_encoder = MemoryEncoder(
        out_dim=16,
        mask_downsampler=MaskDownSampler(embed_dim=D_MODEL, kernel_size=4,
                                         stride=4, padding=0, total_stride=16),
        fuser=Fuser(CXBlock(dim=D_MODEL, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6), num_layers=2),
        position_encoding=PositionEmbeddingSine(num_pos_feats=16),
        in_dim=D_MODEL)

    # flags follow app/sam2_configs/sam2_hiera_t.yaml:87-116 except
    # use_high_res_features_in_sam (off; matches tests/goldens/sam2.npz decoder)
    model = SAM2VideoPredictor(
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=7, image_size=64, backbone_stride=16,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        binarize_mask_from_pts_for_mem_enc=True,
        use_mask_input_as_output_without_sam=False,
        directly_add_no_mem_embed=True,
        use_high_res_features_in_sam=False,
        multimask_output_in_sam=True,
        multimask_min_pt_num=0, multimask_max_pt_num=1,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True, max_obj_ptrs_in_encoder=4,
        add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True, pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        use_mlp_for_obj_ptr_proj=True)
    # NOTE: SAM heads are built with SAM's fixed hyperparameters
    # (sam2_base.py:216-233): TwoWayTransformer depth 2, heads 8, mlp 2048
    model.eval()
    # randomize the zero-init embeddings so their pathways are exercised
    rng = np.random.RandomState(11)
    with torch.no_grad():
        for t in (trunk.pos_embed, trunk.pos_embed_window, model.no_mem_embed,
                  model.no_mem_pos_enc, model.maskmem_tpos_enc):
            t.copy_(torch.tensor(rng.randn(*t.shape), dtype=torch.float32) * 0.02)
    return model


def make_video(t=4, s=64):
    rng = np.random.RandomState(3)
    frames = []
    for i in range(t):
        f = (rng.rand(s, s, 3) * 60 + 40).astype(np.uint8)
        y, x = 18 + 4 * i, 22 + 5 * i
        f[y:y + 20, x:x + 20] = [220, 80, 60]
        frames.append(f)
    return np.stack(frames)


def main():
    model = build_model()
    video = make_video()
    out = {"io::video": video}
    for k, v in model.state_dict().items():
        out[f"sd::{k}"] = v.detach().float().numpy()

    with tempfile.TemporaryDirectory() as d:
        for i, f in enumerate(video):
            Image.fromarray(f).save(os.path.join(d, f"{i}.jpg"), quality=95)
        # feed the decoded JPEGs to the JAX side too (identical pixel input)
        dec = np.stack([np.asarray(Image.open(os.path.join(d, f"{i}.jpg")))
                        for i in range(len(video))])
        out["io::video_decoded"] = dec
        state = model.init_state(video_path=d, offload_video_to_cpu=True)
        state["device"] = torch.device("cpu")
        state["storage_device"] = torch.device("cpu")

    pts = np.array([[28.0, 28.0]], np.float32)
    lbl = np.array([1], np.int32)
    out["io::points"] = pts
    out["io::labels"] = lbl
    with torch.no_grad():
        _, _, click_masks = model.add_new_points(
            state, frame_idx=0, obj_id=1,
            points=torch.tensor(pts), labels=torch.tensor(lbl))
        out["io::click_mask"] = click_masks[0].numpy()
        for fidx, _, masks in model.propagate_in_video(state):
            out[f"io::prop::{fidx}"] = masks[0].numpy()

        # reverse propagation: fresh state, click on the LAST frame, go back
        model.reset_state(state)
        _, _, rmask = model.add_new_points(
            state, frame_idx=3, obj_id=1,
            points=torch.tensor(np.array([[40.0, 36.0]], np.float32)),
            labels=torch.tensor(np.array([1], np.int32)))
        out["io::rev_click_mask"] = rmask[0].numpy()
        for fidx, _, masks in model.propagate_in_video(
                state, start_frame_idx=3, reverse=True):
            out[f"io::rev::{fidx}"] = masks[0].numpy()

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays; prop frames:",
          [k for k in out if k.startswith("io::prop")])


if __name__ == "__main__":
    main()

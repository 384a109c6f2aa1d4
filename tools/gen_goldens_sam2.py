"""Generate SAM2 golden files from the vendored torch implementation.

Run offline: python tools/gen_goldens_sam2.py
Writes tests/goldens/sam2.npz (tiny config).
"""

import sys
import types

import numpy as np
import torch

# stub hydra (sam2 package __init__ imports it)
hydra = types.ModuleType("hydra")
hydra.initialize_config_module = lambda *a, **k: None
hydra.compose = lambda *a, **k: None
sys.modules.setdefault("hydra", hydra)
sys.path.insert(0, "/root/reference/app")

from sam2.modeling.backbones.hieradet import Hiera  # noqa: E402
from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder  # noqa: E402
from sam2.modeling.position_encoding import PositionEmbeddingSine  # noqa: E402
from sam2.modeling.sam.prompt_encoder import PromptEncoder  # noqa: E402
from sam2.modeling.sam.mask_decoder import MaskDecoder  # noqa: E402
from sam2.modeling.sam.transformer import TwoWayTransformer, RoPEAttention  # noqa: E402
from sam2.modeling.memory_attention import (MemoryAttention,  # noqa: E402
                                            MemoryAttentionLayer)
from sam2.modeling.memory_encoder import (CXBlock, Fuser,  # noqa: E402
                                          MaskDownSampler, MemoryEncoder)

OUT = "tests/goldens/sam2.npz"

HIERA_KW = dict(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                window_spec=(4, 2, 4, 2), global_att_blocks=(4,),
                window_pos_embed_bkg_spatial_size=(4, 4), q_pool=3)
D_MODEL = 32


def save_sd(out, name, model):
    for k, v in model.state_dict().items():
        out[f"sd::{name}::{k}"] = v.detach().float().numpy()


def main():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    out = {}

    # ---- image encoder (trunk + neck) -------------------------------------
    trunk = Hiera(**HIERA_KW)
    neck = FpnNeck(position_encoding=PositionEmbeddingSine(num_pos_feats=D_MODEL),
                   d_model=D_MODEL, backbone_channel_list=trunk.channel_list,
                   fpn_interp_model="bilinear")
    enc = ImageEncoder(trunk=trunk, neck=neck, scalp=1)
    enc.eval()
    # randomize zero-init pos embeds so they're exercised
    with torch.no_grad():
        trunk.pos_embed.copy_(torch.tensor(
            rng.randn(*trunk.pos_embed.shape), dtype=torch.float32) * 0.02)
        trunk.pos_embed_window.copy_(torch.tensor(
            rng.randn(*trunk.pos_embed_window.shape), dtype=torch.float32) * 0.02)
    save_sd(out, "image_encoder", enc)

    img = torch.tensor(rng.rand(1, 3, 64, 64), dtype=torch.float32)
    out["io::enc::img"] = img.numpy()
    with torch.no_grad():
        res = enc(img)
    for i, f in enumerate(res["backbone_fpn"]):
        out[f"io::enc::fpn{i}"] = f.numpy()
    for i, f in enumerate(res["vision_pos_enc"]):
        out[f"io::enc::pos{i}"] = f.numpy()

    # ---- prompt encoder ----------------------------------------------------
    torch.manual_seed(1)
    pe = PromptEncoder(embed_dim=D_MODEL, image_embedding_size=(4, 4),
                       input_image_size=(64, 64), mask_in_chans=8)
    pe.eval()
    save_sd(out, "prompt_encoder", pe)
    pts = torch.tensor([[[10.0, 20.0], [40.0, 50.0]]])
    lbl = torch.tensor([[1, 0]])
    out["io::pe::points"] = pts.numpy()
    out["io::pe::labels"] = lbl.numpy()
    with torch.no_grad():
        sparse, dense = pe(points=(pts, lbl), boxes=None, masks=None)
        out["io::pe::sparse"] = sparse.numpy()
        out["io::pe::dense"] = dense.numpy()
        out["io::pe::dense_pe"] = pe.get_dense_pe().numpy()
        m_in = torch.tensor(rng.rand(1, 1, 16, 16), dtype=torch.float32)
        out["io::pe::mask_in"] = m_in.numpy()
        _, dense_m = pe(points=(pts, lbl), boxes=None, masks=m_in)
        out["io::pe::dense_mask"] = dense_m.numpy()

    # ---- mask decoder ------------------------------------------------------
    torch.manual_seed(2)
    dec = MaskDecoder(
        transformer_dim=D_MODEL,
        transformer=TwoWayTransformer(depth=2, embedding_dim=D_MODEL,
                                      num_heads=2, mlp_dim=64),
        num_multimask_outputs=3, use_high_res_features=False,
        pred_obj_scores=True, pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True)
    dec.eval()
    save_sd(out, "mask_decoder", dec)
    img_emb = torch.tensor(rng.randn(1, D_MODEL, 4, 4), dtype=torch.float32)
    img_pe = out["io::pe::dense_pe"]
    out["io::dec::img_emb"] = img_emb.numpy()
    with torch.no_grad():
        masks, iou, sam_tokens, obj = dec(
            image_embeddings=img_emb, image_pe=torch.tensor(img_pe),
            sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
            multimask_output=True, repeat_image=False)
    out["io::dec::masks"] = masks.numpy()
    out["io::dec::iou"] = iou.numpy()
    out["io::dec::sam_tokens"] = sam_tokens.numpy()
    out["io::dec::obj"] = obj.numpy()

    # ---- memory attention --------------------------------------------------
    torch.manual_seed(3)
    layer = MemoryAttentionLayer(
        activation="relu", d_model=D_MODEL, dim_feedforward=64, dropout=0.0,
        pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        self_attention=RoPEAttention(embedding_dim=D_MODEL, num_heads=2,
                                     rope_theta=10000.0, feat_sizes=(4, 4)),
        cross_attention=RoPEAttention(embedding_dim=D_MODEL, num_heads=2,
                                      rope_theta=10000.0, feat_sizes=(4, 4),
                                      rope_k_repeat=True, kv_in_dim=16))
    mem_attn = MemoryAttention(d_model=D_MODEL, pos_enc_at_input=True,
                               layer=layer, num_layers=2, batch_first=True)
    mem_attn.eval()
    save_sd(out, "memory_attention", mem_attn)
    curr = torch.tensor(rng.randn(16, 1, D_MODEL), dtype=torch.float32)
    curr_pos = torch.tensor(rng.randn(16, 1, D_MODEL), dtype=torch.float32)
    memory = torch.tensor(rng.randn(36, 1, 16), dtype=torch.float32)  # 2 frames of 4x4 + 4 ptr tokens
    memory_pos = torch.tensor(rng.randn(36, 1, 16), dtype=torch.float32)
    out["io::ma::curr"] = curr.numpy()
    out["io::ma::curr_pos"] = curr_pos.numpy()
    out["io::ma::memory"] = memory.numpy()
    out["io::ma::memory_pos"] = memory_pos.numpy()
    with torch.no_grad():
        res = mem_attn(curr=curr, memory=memory, curr_pos=curr_pos,
                       memory_pos=memory_pos, num_obj_ptr_tokens=4)
    out["io::ma::out"] = res.numpy()

    # ---- memory encoder ----------------------------------------------------
    torch.manual_seed(4)
    menc = MemoryEncoder(
        out_dim=16,
        mask_downsampler=MaskDownSampler(embed_dim=D_MODEL, kernel_size=4,
                                         stride=4, padding=0, total_stride=16),
        fuser=Fuser(CXBlock(dim=D_MODEL, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6), num_layers=2),
        position_encoding=PositionEmbeddingSine(num_pos_feats=16),
        in_dim=D_MODEL)
    menc.eval()
    save_sd(out, "memory_encoder", menc)
    pix = torch.tensor(rng.randn(1, D_MODEL, 4, 4), dtype=torch.float32)
    msk = torch.tensor(rng.randn(1, 1, 64, 64), dtype=torch.float32)
    out["io::me::pix"] = pix.numpy()
    out["io::me::mask"] = msk.numpy()
    with torch.no_grad():
        r = menc(pix, msk)
    out["io::me::feat"] = r["vision_features"].numpy()
    out["io::me::pos"] = r["vision_pos_enc"][0].numpy()

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()

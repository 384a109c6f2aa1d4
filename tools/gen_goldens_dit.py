"""Generate DiT / branch / ops golden files from the PyTorch reference fork.

Run offline:  python tools/gen_goldens_dit.py
Writes tests/goldens/dit.npz with:
  sd::<model>::<param>  — torch state dicts (fp32)
  io::<case>::<name>    — inputs/outputs per test case
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from diffusers.models.transformers.cogvideox_transformer_3d import (  # noqa: E402
    CogVideoXBlock, CogVideoXTransformer3DModel)
from diffusers.models.branch_cogvideox import CogvideoXBranchModel  # noqa: E402
from diffusers.models.embeddings import get_3d_rotary_pos_embed  # noqa: E402

OUT = "tests/goldens/dit.npz"

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=16,
    out_channels=16,
    time_embed_dim=16,
    text_embed_dim=12,
    num_layers=2,
    sample_width=8,
    sample_height=4,
    sample_frames=9,
    patch_size=2,
    temporal_compression_ratio=4,
    max_text_seq_length=5,
    use_rotary_positional_embeddings=True,
    use_learned_positional_embeddings=False,
)

B, T_LAT, C, H, W = 2, 3, 16, 4, 8
TEXT = 5
D = 32
S_VID = T_LAT * (H // 2) * (W // 2)   # 24
S_JOINT = TEXT + S_VID


def seed_all(s):
    torch.manual_seed(s)
    np.random.seed(s)


def sd_to_npz(out, name, model):
    for k, v in model.state_dict().items():
        out[f"sd::{name}::{k}"] = v.detach().float().numpy()


def rope_tiny():
    cos, sin = get_3d_rotary_pos_embed(
        embed_dim=16, crops_coords=((0, 0), (2, 4)), grid_size=(2, 4),
        temporal_size=T_LAT)
    return cos, sin


def main():
    seed_all(0)
    out = {}
    rng = np.random.RandomState(42)

    def rand(*shape):
        return torch.tensor(rng.randn(*shape), dtype=torch.float32)

    # ---- RoPE tables -------------------------------------------------------
    cos, sin = rope_tiny()
    out["io::rope::cos"] = cos.numpy()
    out["io::rope::sin"] = sin.numpy()

    # ---- base transformer (id_pool_resample_learnable=False) --------------
    model = CogVideoXTransformer3DModel(**TINY)
    model.eval()
    sd_to_npz(out, "transformer", model)

    hidden = rand(B, T_LAT, C, H, W)
    text = rand(B, TEXT, 12)
    timestep = torch.tensor([250, 700], dtype=torch.long)
    out["io::base::hidden"] = hidden.numpy()
    out["io::base::text"] = text.numpy()
    out["io::base::timestep"] = timestep.numpy()
    image_rotary_emb = (cos, sin)

    with torch.no_grad():
        y = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                  return_dict=False)[0]
    out["io::base::out"] = y.numpy()

    # with return_hidden_states
    with torch.no_grad():
        y2, hs_list = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                            return_hidden_states=True, return_dict=False)
    out["io::base_hs::out"] = y2.numpy()
    out["io::base_hs::hs"] = np.stack([h.numpy() for h in hs_list])

    # with branch injection (2 branch layers), unmasked and masked
    branch_samples = [rand(B, S_VID, D) * 0.1 for _ in range(2)]
    out["io::branch_samples"] = np.stack([s.numpy() for s in branch_samples])
    masks = (rng.rand(B, T_LAT, 1, H, W) > 0.5).astype(np.float32)
    out["io::masks"] = masks
    with torch.no_grad():
        yb = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                   branch_block_samples=[s for s in branch_samples],
                   return_dict=False)[0]
        ybm = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                    branch_block_samples=[s for s in branch_samples],
                    branch_block_masks=torch.tensor(masks),
                    return_dict=False)[0]
        ybf = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                    branch_block_samples=[s for s in branch_samples[:1]],
                    add_first=True, return_dict=False)[0]
    out["io::branch::out"] = yb.numpy()
    out["io::branch_masked::out"] = ybm.numpy()
    out["io::branch_addfirst::out"] = ybf.numpy()

    # prev-clip blending through the base processor
    prev_hs = rand(B, S_JOINT, D)
    out["io::prev::prev_hs"] = prev_hs.numpy()
    with torch.no_grad():
        yp = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                   attention_kwargs={"prev_hidden_states": {0: prev_hs, 1: prev_hs},
                                     "prev_clip_weight": 0.3},
                   return_dict=False)[0]
    out["io::prev::out"] = yp.numpy()

    # self-guidance swap
    sg = [rand(B, S_VID, D) for _ in range(2)]
    out["io::sg::hs"] = np.stack([s.numpy() for s in sg])
    with torch.no_grad():
        ysg = model(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                    self_guidance_hidden_states=sg,
                    self_guidance_masks=torch.tensor(masks),
                    return_dict=False)[0]
    out["io::sg::out"] = ysg.numpy()

    # ---- resample transformer (id_pool_resample_learnable=True) -----------
    seed_all(1)
    model_rs = CogVideoXTransformer3DModel(**TINY, id_pool_resample_learnable=True)
    model_rs.eval()
    model_rs.load_state_dict(model.state_dict())
    with torch.no_grad():
        yr, hs_r, rs_mask = model_rs(
            hidden, text, timestep, image_rotary_emb=image_rotary_emb,
            branch_block_masks=torch.tensor(masks),
            id_pool_resample_learnable=True,
            return_hidden_states=True, return_resample_mask=True,
            return_dict=False)
    out["io::resample::out"] = yr.numpy()
    out["io::resample::hs"] = np.stack([h.numpy() for h in hs_r])
    out["io::resample::mask"] = rs_mask.numpy()

    prev_rs_mask = torch.tensor((rng.rand(B, S_JOINT) > 0.5).astype(np.float32))
    out["io::resample_prev::prev_mask"] = prev_rs_mask.numpy()
    with torch.no_grad():
        yrp = model_rs(hidden, text, timestep, image_rotary_emb=image_rotary_emb,
                       branch_block_masks=torch.tensor(masks),
                       id_pool_resample_learnable=True,
                       attention_kwargs={"prev_hidden_states": {0: prev_hs, 1: prev_hs},
                                         "prev_clip_weight": 0.4,
                                         "prev_resample_mask": prev_rs_mask},
                       return_dict=False)[0]
    out["io::resample_prev::out"] = yrp.numpy()

    # ---- 2B path (sincos pos embedding, no rope) ---------------------------
    seed_all(2)
    tiny2b = dict(TINY, use_rotary_positional_embeddings=False)
    model2b = CogVideoXTransformer3DModel(**tiny2b)
    model2b.eval()
    sd_to_npz(out, "transformer2b", model2b)
    with torch.no_grad():
        y2b = model2b(hidden, text, timestep, return_dict=False)[0]
    out["io::base2b::out"] = y2b.numpy()

    # ---- branch model ------------------------------------------------------
    seed_all(3)
    branch = CogvideoXBranchModel.from_transformer(
        model, num_layers=2, attention_head_dim=TINY["attention_head_dim"],
        num_attention_heads=TINY["num_attention_heads"])
    branch.eval()
    # randomize zero-init branch projections so outputs are nontrivial
    with torch.no_grad():
        for lin in branch.branch_blocks:
            lin.weight.copy_(rand(D, D) * 0.05)
            lin.bias.copy_(rand(D) * 0.05)
    sd_to_npz(out, "branch", branch)

    branch_cond = rand(B, T_LAT, 17, H, W)  # masked latents(16) + mask(1)
    out["io::branchmodel::cond"] = branch_cond.numpy()
    with torch.no_grad():
        bs = branch(hidden_states=hidden, encoder_hidden_states=text,
                    branch_cond=branch_cond, timestep=timestep,
                    image_rotary_emb=image_rotary_emb,
                    conditioning_scale=0.7, return_dict=False)[0]
    out["io::branchmodel::out"] = np.stack([s.numpy() for s in bs])

    # wo_text branch
    seed_all(4)
    branch_wt = CogvideoXBranchModel.from_transformer(
        model, num_layers=2, attention_head_dim=TINY["attention_head_dim"],
        num_attention_heads=TINY["num_attention_heads"], wo_text=True)
    branch_wt.eval()
    with torch.no_grad():
        for lin in branch_wt.branch_blocks:
            lin.weight.copy_(rand(D, D) * 0.05)
            lin.bias.copy_(rand(D) * 0.05)
    sd_to_npz(out, "branch_wo_text", branch_wt)
    with torch.no_grad():
        bs_wt = branch_wt(hidden_states=hidden, encoder_hidden_states=text,
                          branch_cond=branch_cond, timestep=timestep,
                          image_rotary_emb=image_rotary_emb,
                          conditioning_scale=1.0, wo_text=True,
                          return_dict=False)[0]
    out["io::branchmodel_wt::out"] = np.stack([s.numpy() for s in bs_wt])

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()

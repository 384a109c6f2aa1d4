"""Generate END-TO-END pipeline goldens from the reference (tiny models).

Determinism strategy:
 - DiagonalGaussianDistribution.sample patched to mode() (no VAE sampling noise)
 - randn_tensor patched (in the pipeline + DPM scheduler modules) to pop from a
   recorded deterministic queue; the queue is saved so the JAX pipeline can be
   fed the exact same noise.

Run offline:  python tools/gen_goldens_pipeline.py
Writes tests/goldens/pipeline.npz.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from diffusers.models.transformers.cogvideox_transformer_3d import (  # noqa: E402
    CogVideoXTransformer3DModel)
from diffusers.models.branch_cogvideox import CogvideoXBranchModel  # noqa: E402
from diffusers.models.autoencoders.autoencoder_kl_cogvideox import (  # noqa: E402
    AutoencoderKLCogVideoX)
from diffusers.models.autoencoders import vae as vae_mod  # noqa: E402
from diffusers.schedulers import scheduling_dpm_cogvideox as dpm_mod  # noqa: E402
from diffusers.schedulers.scheduling_dpm_cogvideox import CogVideoXDPMScheduler  # noqa: E402
from diffusers.pipelines.cogvideo import (  # noqa: E402
    pipeline_cogvideox_inpainting_i2v_branch as pipe_mod,
    pipeline_cogvideox_inpainting_i2v_branch_anyl as anyl_mod)

OUT = "tests/goldens/pipeline.npz"

DIT_KW = dict(
    num_attention_heads=2, attention_head_dim=16,
    in_channels=32, out_channels=16,
    time_embed_dim=16, text_embed_dim=12, num_layers=2,
    sample_width=12, sample_height=8, sample_frames=9,
    patch_size=2, temporal_compression_ratio=4, max_text_seq_length=5,
    use_rotary_positional_embeddings=True, use_learned_positional_embeddings=False)

VAE_KW = dict(in_channels=3, out_channels=3, block_out_channels=(8, 8, 16, 16),
              latent_channels=16, layers_per_block=1, norm_num_groups=4,
              sample_height=64, sample_width=96)

H, W = 64, 96


class NoiseQueue:
    def __init__(self, seed=123):
        self.rng = np.random.RandomState(seed)
        self.record = []

    def __call__(self, shape, generator=None, device=None, dtype=None, layout=None):
        arr = self.rng.standard_normal([int(s) for s in shape]).astype(np.float32)
        self.record.append(arr)
        return torch.tensor(arr, dtype=dtype or torch.float32)


def build_models(seed=0):
    torch.manual_seed(seed)
    transformer = CogVideoXTransformer3DModel(**DIT_KW)
    transformer.eval()
    vae = AutoencoderKLCogVideoX(**VAE_KW)
    vae.eval()
    branch_kw = dict(DIT_KW, num_layers=2)
    branch = CogvideoXBranchModel(**branch_kw)
    branch.eval()
    with torch.no_grad():
        # replicate from_transformer for the 8ch (I2V-style) case the reference
        # hardcodes for 16/32: duplicate the noisy-latent half of the kernel
        w = torch.zeros_like(branch.patch_embed.proj.weight)  # [D, 33, 2, 2]
        bb = transformer.patch_embed.proj.weight              # [D, 32, 2, 2]
        w[:, :16] = bb[:, :16]
        w[:, 16:32] = bb[:, :16]
        branch.patch_embed.proj.weight.copy_(w)
        branch.patch_embed.proj.bias.copy_(transformer.patch_embed.proj.bias)
        branch.time_embedding.load_state_dict(transformer.time_embedding.state_dict())
        branch.transformer_blocks.load_state_dict(
            {k: v for k, v in transformer.transformer_blocks.state_dict().items()
             if k.startswith(("0.", "1."))}, strict=False)
        rng = np.random.RandomState(5)
        for lin in branch.branch_blocks:
            lin.weight.copy_(torch.tensor(rng.randn(32, 32), dtype=torch.float32) * 0.05)
            lin.bias.copy_(torch.tensor(rng.randn(32), dtype=torch.float32) * 0.05)
    return transformer, branch, vae


def save_sd(out, name, model):
    for k, v in model.state_dict().items():
        out[f"sd::{name}::{k}"] = v.detach().float().numpy()


def main():
    out = {}
    transformer, branch, vae = build_models()
    save_sd(out, "transformer", transformer)
    save_sd(out, "branch", branch)
    save_sd(out, "vae", vae)

    # deterministic VAE encode
    vae_mod.DiagonalGaussianDistribution.sample = (
        lambda self, generator=None: self.mode())

    rng = np.random.RandomState(9)
    T = 9
    video01 = rng.rand(1, T, H, W, 3).astype(np.float32)
    masks = np.zeros((1, T, H, W, 1), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    # uint8-quantized so the PIL input to the reference == our float input
    image_u8 = np.round((video01[:, 0] * (1 - masks[:, 0])) * 255).astype(np.uint8)
    image01 = (image_u8 / 255.0).astype(np.float32)
    from PIL import Image
    image_pil = Image.fromarray(image_u8[0])
    embeds = rng.randn(1, 5, 12).astype(np.float32)
    neg = np.zeros_like(embeds)
    out["io::video01"] = video01
    out["io::masks"] = masks[..., 0]
    out["io::image01"] = image01
    out["io::embeds"] = embeds

    sched_kw = dict(prediction_type="v_prediction", rescale_betas_zero_snr=True,
                    timestep_spacing="trailing", snr_shift_scale=3.0)

    # ---- single-clip run ---------------------------------------------------
    nq = NoiseQueue(123)
    pipe_mod.randn_tensor = nq
    dpm_mod.randn_tensor = nq
    sched = CogVideoXDPMScheduler(**sched_kw)
    pipe = pipe_mod.CogVideoXI2VDualInpaintPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=transformer,
        scheduler=sched, branch=branch)
    with torch.no_grad():
        res = pipe(
            image=image_pil, video=video01, masked_video=masks,
            prompt_embeds=torch.tensor(embeds),
            negative_prompt_embeds=torch.tensor(neg),
            height=H, width=W, num_frames=T,
            num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
            strength=1.0, conditioning_scale=1.0,
            replace_gt=True, mask_add=True, output_type="np",
        )
    out["io::single::out"] = res.frames[0] if hasattr(res, "frames") else res[0]
    for i, arr in enumerate(nq.record):
        out[f"noise::single::{i}"] = arr
    out["io::single::n_noises"] = np.array(len(nq.record))

    # ---- any-length run ----------------------------------------------------
    T2 = 17
    video2 = rng.rand(1, T2, H, W, 3).astype(np.float32)
    masks2 = np.zeros((1, T2, H, W, 1), np.float32)
    masks2[:, :, 10:30, 30:70] = 1.0
    image2_u8 = np.round((video2[:, 0] * (1 - masks2[:, 0])) * 255).astype(np.uint8)
    image2 = (image2_u8 / 255.0).astype(np.float32)
    from PIL import Image
    image2_pil = Image.fromarray(image2_u8[0])
    out["io::video2"] = video2
    out["io::masks2"] = masks2[..., 0]
    out["io::image2"] = image2

    nq2 = NoiseQueue(321)
    anyl_mod.randn_tensor = nq2
    dpm_mod.randn_tensor = nq2
    sched2 = CogVideoXDPMScheduler(**sched_kw)
    pipe2 = anyl_mod.CogVideoXI2VDualInpaintAnyLPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=transformer,
        scheduler=sched2, branch=branch)
    with torch.no_grad():
        res2 = pipe2(
            image=image2_pil, video=video2, masks=masks2,
            prompt_embeds=torch.tensor(embeds),
            negative_prompt_embeds=torch.tensor(neg),
            height=H, width=W, num_frames=9, stride=4,
            num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
            strength=1.0, conditioning_scale=1.0, prev_clip_weight=0.3,
            replace_gt=True, mask_add=True, output_type="np",
        )
    out["io::anyl::out"] = res2.frames[0] if hasattr(res2, "frames") else res2[0]
    for i, arr in enumerate(nq2.record):
        out[f"noise::anyl::{i}"] = arr
    out["io::anyl::n_noises"] = np.array(len(nq2.record))

    # ---- any-length + ID-resample run (VideoPainterID inference path) -----
    # NOTE the resample processor is selected at BLOCK CONSTRUCTION
    # (cogvideox_transformer_3d.py:98-99); the forward kwarg only builds the
    # mask. Rebuild the transformer with the flag, same weights.
    transformer_rs = CogVideoXTransformer3DModel(
        **DIT_KW, id_pool_resample_learnable=True)
    transformer_rs.eval()
    transformer_rs.load_state_dict(transformer.state_dict())
    nq3 = NoiseQueue(555)
    anyl_mod.randn_tensor = nq3
    dpm_mod.randn_tensor = nq3
    sched3 = CogVideoXDPMScheduler(**sched_kw)
    pipe3 = anyl_mod.CogVideoXI2VDualInpaintAnyLPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=transformer_rs,
        scheduler=sched3, branch=branch)
    with torch.no_grad():
        res3 = pipe3(
            image=image2_pil, video=video2, masks=masks2,
            prompt_embeds=torch.tensor(embeds),
            negative_prompt_embeds=torch.tensor(neg),
            height=H, width=W, num_frames=9, stride=4,
            num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
            strength=1.0, conditioning_scale=1.0, prev_clip_weight=0.3,
            id_pool_resample_learnable=True,
            replace_gt=True, mask_add=True, output_type="np",
        )
    out["io::anyl_rs::out"] = res3.frames[0] if hasattr(res3, "frames") else res3[0]
    for i, arr in enumerate(nq3.record):
        out[f"noise::anyl_rs::{i}"] = arr
    out["io::anyl_rs::n_noises"] = np.array(len(nq3.record))

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays; noises single={len(nq.record)} "
          f"anyl={len(nq2.record)} anyl_rs={len(nq3.record)}")


if __name__ == "__main__":
    main()

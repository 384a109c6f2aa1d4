"""END-TO-END goldens for the baseline/variant pipelines (tiny models).

Drives the reference torch pipelines:
 - CogVideoXSFTInpaintPipeline          (pipeline_cogvideox_inpainting_sft.py:156)
 - CogVideoXSelfGuidanceInpaintPipeline (pipeline_cogvideox_inpainting_selfguidance.py:153)
 - CogVideoXInpaintPipeline             (pipeline_cogvideox_inpainting.py:154)
 - CogVideoXImageToVideoInpaintPipeline (pipeline_cogvideox_image2video_inpainting.py:155)
 - CogVideoXDualInpaintPipeline         (pipeline_cogvideox_inpainting_branch.py:160)
   — T2V backbone (16ch, no image latents) + CogvideoXBranchModel.from_transformer
   (branch_cogvideox.py:255: for in_channels==16 the FULL backbone kernel is
   duplicated into both latent slots), mask_add + replace_gt blend exercised

Same determinism strategy as gen_goldens_pipeline.py: VAE sample->mode and a
recorded randn queue injected into the pipeline + DPM scheduler modules.

NOTE: the reference selfguidance pipeline cannot run unmodified:
 1. under CFG its already-doubled masked latents get doubled again
    (:846/:853) -> batch mismatch; the golden runs with guidance_scale=1.0.
 2. it passes a latent_channels-repeated mask into patch_embed, whose
    `masks.view(batch, num_frames, ...)` then fails (embeddings.py:421);
 3. the swap `torch.where(masks==False, self_guidance_hidden_states[i], h)`
    (cogvideox_transformer_3d.py:593-594) compares a video-only tensor with
    the JOINT [text||video] states captured by return_hidden_states.
The golden applies the two evident-intent one-line shims (slice the mask to
one channel; slice the text tokens off the guidance states) via a forward
wrapper — the swap math itself is untouched reference code.

Run offline:  python tools/gen_goldens_variants.py
Writes tests/goldens/variants.npz.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from diffusers.models.transformers.cogvideox_transformer_3d import (  # noqa: E402
    CogVideoXTransformer3DModel)
from diffusers.models.transformers.cogvideox_transformer_3d_inpainting import (  # noqa: E402
    CogVideoXTransformer3DInpaintModel)
from diffusers.models.autoencoders.autoencoder_kl_cogvideox import (  # noqa: E402
    AutoencoderKLCogVideoX)
from diffusers.models.autoencoders import vae as vae_mod  # noqa: E402
from diffusers.schedulers import scheduling_dpm_cogvideox as dpm_mod  # noqa: E402
from diffusers.schedulers.scheduling_dpm_cogvideox import CogVideoXDPMScheduler  # noqa: E402
from diffusers.models.branch_cogvideox import CogvideoXBranchModel  # noqa: E402
from diffusers.pipelines.cogvideo import (  # noqa: E402
    pipeline_cogvideox_inpainting_sft as sft_mod,
    pipeline_cogvideox_inpainting_selfguidance as sg_mod,
    pipeline_cogvideox_inpainting as plain_mod,
    pipeline_cogvideox_image2video_inpainting as i2v_mod,
    pipeline_cogvideox_inpainting_branch as dual_mod)

OUT = "tests/goldens/variants.npz"

COMMON_KW = dict(
    num_attention_heads=2, attention_head_dim=16,
    time_embed_dim=16, text_embed_dim=12, num_layers=2,
    sample_width=12, sample_height=8, sample_frames=9,
    patch_size=2, temporal_compression_ratio=4, max_text_seq_length=5,
    use_rotary_positional_embeddings=True, use_learned_positional_embeddings=False)

VAE_KW = dict(in_channels=3, out_channels=3, block_out_channels=(8, 8, 16, 16),
              latent_channels=16, layers_per_block=1, norm_num_groups=4,
              sample_height=64, sample_width=96)

H, W, T = 64, 96, 9

SCHED_KW = dict(prediction_type="v_prediction", rescale_betas_zero_snr=True,
                timestep_spacing="trailing", snr_shift_scale=3.0)


class NoiseQueue:
    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)
        self.record = []

    def __call__(self, shape, generator=None, device=None, dtype=None, layout=None):
        arr = self.rng.standard_normal([int(s) for s in shape]).astype(np.float32)
        self.record.append(arr)
        return torch.tensor(arr, dtype=dtype or torch.float32)


def save_sd(out, name, model):
    for k, v in model.state_dict().items():
        out[f"sd::{name}::{k}"] = v.detach().float().numpy()


def record(out, prefix, nq, res):
    out[f"io::{prefix}::out"] = res.frames[0] if hasattr(res, "frames") else res[0]
    for i, arr in enumerate(nq.record):
        out[f"noise::{prefix}::{i}"] = arr
    out[f"io::{prefix}::n_noises"] = np.array(len(nq.record))


def main():
    out = {}
    torch.manual_seed(0)
    t2v = CogVideoXTransformer3DModel(in_channels=16, out_channels=16, **COMMON_KW)
    t2v.eval()
    torch.manual_seed(1)
    sft = CogVideoXTransformer3DInpaintModel(in_channels=16, out_channels=16,
                                             **COMMON_KW)
    sft.eval()
    torch.manual_seed(2)
    i2v = CogVideoXTransformer3DModel(in_channels=32, out_channels=16, **COMMON_KW)
    i2v.eval()
    torch.manual_seed(3)
    vae = AutoencoderKLCogVideoX(**VAE_KW)
    vae.eval()
    save_sd(out, "t2v", t2v)
    save_sd(out, "sft", sft)
    save_sd(out, "i2v", i2v)
    save_sd(out, "vae", vae)

    vae_mod.DiagonalGaussianDistribution.sample = (
        lambda self, generator=None: self.mode())

    rng = np.random.RandomState(11)
    video01 = rng.rand(1, T, H, W, 3).astype(np.float32)
    masks = np.zeros((1, T, H, W, 1), np.float32)
    masks[:, :, 20:44, 30:70] = 1.0
    image_u8 = np.round((video01[:, 0] * (1 - masks[:, 0])) * 255).astype(np.uint8)
    from PIL import Image
    image_pil = Image.fromarray(image_u8[0])
    embeds = rng.randn(1, 5, 12).astype(np.float32)
    neg = np.zeros_like(embeds)
    out["io::video01"] = video01
    out["io::masks"] = masks[..., 0]
    out["io::image01"] = (image_u8 / 255.0).astype(np.float32)
    out["io::embeds"] = embeds

    base_call = dict(
        video=video01, masked_video=masks,
        prompt_embeds=torch.tensor(embeds),
        negative_prompt_embeds=torch.tensor(neg),
        height=H, width=W, num_frames=T,
        num_inference_steps=4, strength=1.0, output_type="np")

    # ---- SFT (widened-patch-embed backbone, NO blending) -------------------
    nq = NoiseQueue(201)
    sft_mod.randn_tensor = nq
    dpm_mod.randn_tensor = nq
    pipe = sft_mod.CogVideoXSFTInpaintPipeline(
        tokenizer=None, text_encoder=None, vae=vae,
        scheduler=CogVideoXDPMScheduler(**SCHED_KW), branch=sft)
    with torch.no_grad():
        res = pipe(**base_call, guidance_scale=6.0, use_dynamic_cfg=True)
    record(out, "sft", nq, res)

    # ---- self-guidance (no CFG: reference loop is CFG-broken) --------------
    # Shim the two reference crashes (see module docstring): 1-channel mask
    # into patch_embed, text tokens sliced off the joint guidance states.
    orig_fwd = t2v.forward

    def shimmed_fwd(hidden_states=None, encoder_hidden_states=None, **kw):
        sg = kw.get("self_guidance_hidden_states")
        if sg is not None:
            L = encoder_hidden_states.shape[1]
            kw["self_guidance_hidden_states"] = [h[:, L:] for h in sg]
        m = kw.get("self_guidance_masks")
        if m is not None and m.dim() == 5 and m.shape[2] != 1:
            kw["self_guidance_masks"] = m[:, :, :1]
        return orig_fwd(hidden_states=hidden_states,
                        encoder_hidden_states=encoder_hidden_states, **kw)

    t2v.forward = shimmed_fwd
    nq = NoiseQueue(202)
    sg_mod.randn_tensor = nq
    dpm_mod.randn_tensor = nq
    pipe = sg_mod.CogVideoXSelfGuidanceInpaintPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=t2v,
        scheduler=CogVideoXDPMScheduler(**SCHED_KW))
    with torch.no_grad():
        res = pipe(**base_call, guidance_scale=1.0, use_dynamic_cfg=False)
    record(out, "selfguidance", nq, res)
    t2v.forward = orig_fwd

    # ---- plain latent-blend baseline ---------------------------------------
    nq = NoiseQueue(203)
    plain_mod.randn_tensor = nq
    dpm_mod.randn_tensor = nq
    pipe = plain_mod.CogVideoXInpaintPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=t2v,
        scheduler=CogVideoXDPMScheduler(**SCHED_KW))
    with torch.no_grad():
        res = pipe(**base_call, guidance_scale=6.0, use_dynamic_cfg=True)
    record(out, "plain", nq, res)

    # ---- image2video inpainting (image concat + latent blend) --------------
    nq = NoiseQueue(204)
    i2v_mod.randn_tensor = nq
    dpm_mod.randn_tensor = nq
    pipe = i2v_mod.CogVideoXImageToVideoInpaintPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=i2v,
        scheduler=CogVideoXDPMScheduler(**SCHED_KW))
    # reference bug: its check_inputs call site (:829-838) passes
    # prompt_embeds/negative_prompt_embeds positionally into the video=/
    # latents= slots, so embeds-only invocation always raises. The check is
    # validation-only; skip it.
    pipe.check_inputs = lambda *a, **k: None
    with torch.no_grad():
        res = pipe(image=image_pil, **base_call, guidance_scale=6.0,
                   use_dynamic_cfg=True)
    record(out, "image2video", nq, res)

    # ---- T2V dual (branch on the 16ch T2V backbone) -------------------------
    # the real reference from_transformer path: full 16ch kernel duplicated
    # into both latent slots (branch_cogvideox.py:273-277); branch_blocks are
    # zero-init there, so randomize them (as the flagship golden does) to make
    # the injection actually contribute to the output
    torch.manual_seed(4)
    branch = CogvideoXBranchModel.from_transformer(
        t2v, num_layers=2, attention_head_dim=16, num_attention_heads=2)
    branch.eval()
    with torch.no_grad():
        brng = np.random.RandomState(6)
        for lin in branch.branch_blocks:
            lin.weight.copy_(torch.tensor(brng.randn(32, 32),
                                          dtype=torch.float32) * 0.05)
            lin.bias.copy_(torch.tensor(brng.randn(32),
                                        dtype=torch.float32) * 0.05)
    save_sd(out, "dual_branch", branch)

    nq = NoiseQueue(205)
    dual_mod.randn_tensor = nq
    dpm_mod.randn_tensor = nq
    pipe = dual_mod.CogVideoXDualInpaintPipeline(
        tokenizer=None, text_encoder=None, vae=vae, transformer=t2v,
        scheduler=CogVideoXDPMScheduler(**SCHED_KW), branch=branch)
    with torch.no_grad():
        res = pipe(**base_call, guidance_scale=6.0, use_dynamic_cfg=True,
                   conditioning_scale=1.0, mask_add=True, replace_gt=True)
    record(out, "t2v_dual", nq, res)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()

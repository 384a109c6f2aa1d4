"""END-TO-END parity for the baseline/variant pipelines vs torch goldens
(tests/goldens/variants.npz, produced by tools/gen_goldens_variants.py).

Covers the reference classes VERDICT round-1 flagged as golden-less:
 - CogVideoXSFTInpaintPipeline          (widened patch embed, NO latent blend)
 - CogVideoXSelfGuidanceInpaintPipeline (hidden-state swap, masked-latent init
                                         + masked-latent blend; no CFG — the
                                         reference loop is CFG-broken)
 - CogVideoXInpaintPipeline             (plain latent blend)
 - CogVideoXImageToVideoInpaintPipeline (image concat + latent blend)
 - CogVideoXDualInpaintPipeline         (T2V dual-stream: branch on the 16ch
                                         backbone, no image latents; round-2
                                         VERDICT item — the last golden-less
                                         variant)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.convert import (convert_branch_state_dict,
                                      convert_transformer_state_dict,
                                      convert_vae_state_dict)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import (CogVideoXDualInpaintPipeline,
                                        CogVideoXImageToVideoInpaintPipeline,
                                        CogVideoXInpaintPipeline,
                                        CogVideoXSelfGuidanceInpaintPipeline,
                                        CogVideoXSFTInpaintPipeline,
                                        make_sft_inpaint_transformer)
from videopainter_tpu.schedulers import CogVideoXDPMScheduler

T2V_CFG = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12)
I2V_CFG = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
VAE_CFG = VAEConfig.tiny(latent_channels=16)


def extract_sd(g, name):
    pre = f"sd::{name}::"
    return {k[len(pre):]: g[k] for k in g.files if k.startswith(pre)}


def to_lat_jax(x):  # torch latent [B,F,C,h,w] -> [B,F,h,w,C]
    return jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))


def effective_dpm_noises(g, prefix, base, n_steps):
    """randn-queue -> per-step DPM SDE noise actually used (first draw of the
    middle steps is discarded, scheduling_dpm_cogvideox.py:423-432)."""
    used = []
    c = base + 1  # base is the init-noise draw
    for i in range(n_steps):
        if i == 0 or i == n_steps - 1:
            used.append(g[f"noise::{prefix}::{c}"])
            c += 1
        else:
            c += 1
            used.append(g[f"noise::{prefix}::{c}"])
            c += 1
    return np.stack([np.transpose(u, (0, 1, 3, 4, 2)) for u in used]), c


@pytest.fixture(scope="module")
def stack(goldens):
    g = goldens("variants")
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    vae_params = convert_vae_state_dict(extract_sd(g, "vae"))
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    video = jnp.asarray(g["io::video01"]) * 2 - 1
    masks = jnp.asarray(g["io::masks"])
    embeds = jnp.asarray(g["io::embeds"])
    return g, vae, vae_params, sched, video, masks, embeds


def check(out, g, prefix, atol=3e-3, mean_tol=3e-4):
    ours01 = np.asarray(out) / 2 + 0.5
    ref = g[f"io::{prefix}::out"][None]
    np.testing.assert_allclose(ours01, ref, rtol=0, atol=atol)
    assert np.abs(ours01 - ref).mean() < mean_tol


def test_sft_end_to_end(stack):
    g, vae, vae_params, sched, video, masks, embeds = stack
    sft = make_sft_inpaint_transformer(T2V_CFG)
    params = {"transformer": convert_transformer_state_dict(extract_sd(g, "sft")),
              "vae": vae_params}
    assert params["transformer"]["patch_embed"]["proj"]["kernel"].shape[0] == \
        2 * 2 * (2 * 16 + 1)
    pipe = CogVideoXSFTInpaintPipeline(sft, vae, sched)

    init_noise = to_lat_jax(g["noise::sft::0"])
    dpm_noises, used = effective_dpm_noises(g, "sft", 0, 4)
    assert used == int(g["io::sft::n_noises"])

    out = pipe(params, video=video, masks=masks, prompt_embeds=embeds,
               negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               vae_sample_mode="mode", init_noise=init_noise,
               dpm_noises=jnp.asarray(dpm_noises), rng=jax.random.PRNGKey(0))
    check(out, g, "sft")


def test_selfguidance_end_to_end(stack):
    g, vae, vae_params, sched, video, masks, embeds = stack
    t2v = CogVideoXTransformer3D(T2V_CFG)
    params = {"transformer": convert_transformer_state_dict(extract_sd(g, "t2v")),
              "vae": vae_params}
    pipe = CogVideoXSelfGuidanceInpaintPipeline(t2v, vae, sched)

    init_noise = to_lat_jax(g["noise::selfguidance::0"])
    dpm_noises, used = effective_dpm_noises(g, "selfguidance", 0, 4)
    assert used == int(g["io::selfguidance::n_noises"])

    out = pipe(params, video=video, masks=masks, prompt_embeds=embeds,
               num_inference_steps=4, guidance_scale=1.0,
               vae_sample_mode="mode", init_noise=init_noise,
               dpm_noises=jnp.asarray(dpm_noises), rng=jax.random.PRNGKey(0))
    check(out, g, "selfguidance")


def test_plain_end_to_end(stack):
    g, vae, vae_params, sched, video, masks, embeds = stack
    t2v = CogVideoXTransformer3D(T2V_CFG)
    params = {"transformer": convert_transformer_state_dict(extract_sd(g, "t2v")),
              "vae": vae_params}
    pipe = CogVideoXInpaintPipeline(t2v, vae, sched)

    init_noise = to_lat_jax(g["noise::plain::0"])
    dpm_noises, used = effective_dpm_noises(g, "plain", 0, 4)
    assert used == int(g["io::plain::n_noises"])

    out = pipe(params, video=video, masks=masks, prompt_embeds=embeds,
               negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               vae_sample_mode="mode", init_noise=init_noise,
               dpm_noises=jnp.asarray(dpm_noises), rng=jax.random.PRNGKey(0))
    check(out, g, "plain")


def test_t2v_dual_end_to_end(stack):
    """T2V dual-stream (pipeline_cogvideox_inpainting_branch.py:160): branch
    injection on the 16ch backbone, no image latents, mask_add gating +
    replace_gt blend — the branch-on-T2V patch-embed path
    (branch_cogvideox.py:273-277 duplicates the FULL backbone kernel into
    both latent slots for in_channels==16)."""
    g, vae, vae_params, sched, video, masks, embeds = stack
    t2v = CogVideoXTransformer3D(T2V_CFG)
    bcfg = BranchConfig.from_transformer(T2V_CFG, num_layers=2)
    assert bcfg.patch_in_channels == 2 * 16 + 1
    branch = CogVideoXBranch(bcfg)
    params = {"transformer": convert_transformer_state_dict(extract_sd(g, "t2v")),
              "branch": convert_branch_state_dict(extract_sd(g, "dual_branch")),
              "vae": vae_params}
    pipe = CogVideoXDualInpaintPipeline(t2v, branch, vae, sched)

    init_noise = to_lat_jax(g["noise::t2v_dual::0"])
    dpm_noises, used = effective_dpm_noises(g, "t2v_dual", 0, 4)
    assert used == int(g["io::t2v_dual::n_noises"])

    out = pipe(params, video=video, masks=masks, prompt_embeds=embeds,
               negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               conditioning_scale=1.0, mask_add=True, replace_gt=True,
               vae_sample_mode="mode", init_noise=init_noise,
               dpm_noises=jnp.asarray(dpm_noises), rng=jax.random.PRNGKey(0))
    check(out, g, "t2v_dual")


def test_image2video_end_to_end(stack):
    g, vae, vae_params, sched, video, masks, embeds = stack
    i2v = CogVideoXTransformer3D(I2V_CFG)
    params = {"transformer": convert_transformer_state_dict(extract_sd(g, "i2v")),
              "vae": vae_params}
    pipe = CogVideoXImageToVideoInpaintPipeline(i2v, vae, sched)
    image = jnp.asarray(g["io::image01"]) * 2 - 1

    init_noise = to_lat_jax(g["noise::image2video::0"])
    dpm_noises, used = effective_dpm_noises(g, "image2video", 0, 4)
    assert used == int(g["io::image2video::n_noises"])

    out = pipe(params, image=image, video=video, masks=masks,
               prompt_embeds=embeds,
               negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               vae_sample_mode="mode", init_noise=init_noise,
               dpm_noises=jnp.asarray(dpm_noises), rng=jax.random.PRNGKey(0))
    check(out, g, "image2video")

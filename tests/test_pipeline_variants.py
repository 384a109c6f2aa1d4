"""Smoke tests for the baseline/variant pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import (CogVideoXDualInpaintPipeline,
                                        CogVideoXImageToVideoInpaintPipeline,
                                        CogVideoXInpaintPipeline,
                                        CogVideoXI2VInpaintAnyLPipeline,
                                        CogVideoXSelfGuidanceInpaintPipeline,
                                        CogVideoXSFTInpaintPipeline,
                                        init_sft_from_transformer,
                                        make_sft_inpaint_transformer)
from videopainter_tpu.schedulers import CogVideoXDPMScheduler

VAE_CFG = VAEConfig.tiny()  # latent 4
T2V_CFG = TransformerConfig.tiny(in_channels=4, out_channels=4,
                                 sample_height=8, sample_width=12)
I2V_CFG = TransformerConfig.tiny(in_channels=8, out_channels=4,
                                 sample_height=8, sample_width=12)
SCHED = SchedulerConfig.cogvideox_5b_inference()


def make_data(t=9):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, t, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, t, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    image = video[:, 0] * (1 - jnp.asarray(masks[:, 0, :, :, None]))
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    return video, jnp.asarray(masks), image, embeds, jnp.zeros_like(embeds)


@pytest.fixture(scope="module")
def vae_stack():
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    return vae, vae.init(jax.random.PRNGKey(9))


def run(pipe, params, *, image=None, anyl=False, **kw):
    video, masks, img, embeds, neg = make_data(t=17 if anyl else 9)
    call_kw = dict(video=video, masks=masks, prompt_embeds=embeds,
                   negative_prompt_embeds=neg, num_inference_steps=2,
                   guidance_scale=6.0, replace_gt=True,
                   rng=jax.random.PRNGKey(7), **kw)
    if image is not False:
        call_kw["image"] = img
    if anyl:
        call_kw.update(num_frames=9, stride=8)
    out = pipe(params, **call_kw)
    assert out.shape[0] == 1 and np.isfinite(out).all()
    return out


def test_t2v_dual(vae_stack):
    vae, vp = vae_stack
    transformer = CogVideoXTransformer3D(T2V_CFG)
    branch = CogVideoXBranch(BranchConfig.from_transformer(T2V_CFG, num_layers=2, latent_channels=4))
    tp = transformer.init(jax.random.PRNGKey(0))
    params = {"transformer": tp, "vae": vp,
              "branch": branch.init_from_transformer(jax.random.PRNGKey(1), tp, T2V_CFG)}
    pipe = CogVideoXDualInpaintPipeline(transformer, branch, vae,
                                        CogVideoXDPMScheduler(SCHED))
    run(pipe, params, image=False, mask_add=True)


def test_sft_single_and_anyl(vae_stack):
    vae, vp = vae_stack
    base = CogVideoXTransformer3D(T2V_CFG)
    base_params = base.init(jax.random.PRNGKey(0))
    sft = make_sft_inpaint_transformer(T2V_CFG)
    sft_params = init_sft_from_transformer(jax.random.PRNGKey(1), base_params, T2V_CFG)
    assert sft_params["patch_embed"]["proj"]["kernel"].shape[0] == 4 * (2 * 4 + 1)
    params = {"transformer": sft_params, "vae": vp}
    pipe = CogVideoXSFTInpaintPipeline(sft, vae, CogVideoXDPMScheduler(SCHED))
    run(pipe, params, image=False)
    pipe2 = CogVideoXI2VInpaintAnyLPipeline(sft, vae, CogVideoXDPMScheduler(SCHED))
    run(pipe2, params, image=False, anyl=True, mask_add=False)


def test_selfguidance(vae_stack):
    vae, vp = vae_stack
    transformer = CogVideoXTransformer3D(T2V_CFG)
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)), "vae": vp}
    pipe = CogVideoXSelfGuidanceInpaintPipeline(transformer, vae,
                                                CogVideoXDPMScheduler(SCHED))
    run(pipe, params, image=False, mask_add=True)


def test_plain_and_image2video(vae_stack):
    vae, vp = vae_stack
    t2v = CogVideoXTransformer3D(T2V_CFG)
    params = {"transformer": t2v.init(jax.random.PRNGKey(0)), "vae": vp}
    pipe = CogVideoXInpaintPipeline(t2v, vae, CogVideoXDPMScheduler(SCHED))
    run(pipe, params, image=False)

    i2v = CogVideoXTransformer3D(I2V_CFG)
    params2 = {"transformer": i2v.init(jax.random.PRNGKey(1)), "vae": vp}
    pipe2 = CogVideoXImageToVideoInpaintPipeline(i2v, vae,
                                                 CogVideoXDPMScheduler(SCHED))
    run(pipe2, params2)

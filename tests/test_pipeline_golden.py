"""END-TO-END pipeline parity vs the torch reference (tests/goldens/pipeline.npz).

Same tiny weights, same deterministic noise (injected), 4 DPM steps with CFG +
dynamic guidance + branch injection + replace_gt — final decoded videos must
match to fp32 tolerance. This exercises the full stack: VAE encode, latent
prep, denoise scan, scheduler, VAE decode.
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
from videopainter_tpu.pipelines import (CogVideoXI2VDualInpaintAnyLPipeline,
                                        CogVideoXI2VDualInpaintPipeline)
from videopainter_tpu.schedulers import CogVideoXDPMScheduler

DIT_CFG = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
BR_CFG = BranchConfig.from_transformer(DIT_CFG, num_layers=2)
VAE_CFG = VAEConfig.tiny(latent_channels=16)


def extract_sd(g, name):
    pre = f"sd::{name}::"
    return {k[len(pre):]: g[k] for k in g.files if k.startswith(pre)}


def to_lat_jax(x):  # torch latent [B,F,C,h,w] -> [B,F,h,w,C]
    return jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))


def effective_dpm_noises(g, prefix, base, n_steps):
    """Map the recorded randn queue to the per-step noise the reference
    actually *used*: step0 1 draw, middle steps draw twice (first discarded),
    last step 1 draw (scheduling_dpm_cogvideox.py:423-432)."""
    used = []
    c = base + 1  # base is the init-noise draw
    for i in range(n_steps):
        if i == 0 or i == n_steps - 1:
            used.append(g[f"noise::{prefix}::{c}"])
            c += 1
        else:
            c += 1  # discarded first draw
            used.append(g[f"noise::{prefix}::{c}"])
            c += 1
    return np.stack([np.transpose(u, (0, 1, 3, 4, 2)) for u in used]), c


@pytest.fixture(scope="module")
def stack(goldens):
    g = goldens("pipeline")
    transformer = CogVideoXTransformer3D(DIT_CFG)
    branch = CogVideoXBranch(BR_CFG)
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    params = {
        "transformer": convert_transformer_state_dict(extract_sd(g, "transformer")),
        "branch": convert_branch_state_dict(extract_sd(g, "branch")),
        "vae": convert_vae_state_dict(extract_sd(g, "vae")),
    }
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    return g, transformer, branch, vae, params, sched


def test_single_clip_end_to_end(stack):
    g, transformer, branch, vae, params, sched = stack
    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)

    video = jnp.asarray(g["io::video01"]) * 2 - 1
    masks = jnp.asarray(g["io::masks"])
    image = jnp.asarray(g["io::image01"]) * 2 - 1
    embeds = jnp.asarray(g["io::embeds"])
    neg = jnp.zeros_like(embeds)

    init_noise = to_lat_jax(g["noise::single::0"])
    dpm_noises, used = effective_dpm_noises(g, "single", 0, 4)
    assert used == int(g["io::single::n_noises"])

    out = pipe(params, image=image, video=video, masks=masks,
               prompt_embeds=embeds, negative_prompt_embeds=neg,
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               replace_gt=True, mask_add=True,
               vae_sample_mode="mode", init_noise=init_noise,
               dpm_noises=jnp.asarray(dpm_noises),
               rng=jax.random.PRNGKey(0))
    ours01 = np.asarray(out) / 2 + 0.5
    ref = g["io::single::out"][None]  # [1, F, H, W, C] in [0, 1]
    np.testing.assert_allclose(ours01, ref, rtol=0, atol=2e-3)
    assert np.abs(ours01 - ref).mean() < 2e-4
    # BASELINE.json quality target: per-frame PSNR >= 35 dB vs the reference
    mse = np.square(ours01 - ref).mean()
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 35.0, f"PSNR vs torch reference {psnr:.1f} dB < 35"


def test_anyl_end_to_end(stack):
    g, transformer, branch, vae, params, sched = stack
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)

    video = jnp.asarray(g["io::video2"]) * 2 - 1
    masks = jnp.asarray(g["io::masks2"])
    image = jnp.asarray(g["io::image2"]) * 2 - 1
    embeds = jnp.asarray(g["io::embeds"])
    neg = jnp.zeros_like(embeds)

    init_noises, dpm_list = [], []
    base = 0
    for _ in range(3):  # 3 windows
        init_noises.append(to_lat_jax(g[f"noise::anyl::{base}"]))
        noises, base = effective_dpm_noises(g, "anyl", base, 4)
        dpm_list.append(noises)
    assert base == int(g["io::anyl::n_noises"])

    out = pipe(params, image=image, video=video, masks=masks,
               num_frames=9, stride=4,
               prompt_embeds=embeds, negative_prompt_embeds=neg,
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               prev_clip_weight=0.3, replace_gt=True, mask_add=True,
               vae_sample_mode="mode", init_noises=init_noises,
               dpm_noises_list=dpm_list,
               rng=jax.random.PRNGKey(0))
    ours01 = np.asarray(out) / 2 + 0.5
    ref = g["io::anyl::out"][None]
    np.testing.assert_allclose(ours01, ref, rtol=0, atol=3e-3)
    assert np.abs(ours01 - ref).mean() < 3e-4
    mse = np.square(ours01 - ref).mean()
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 35.0, f"PSNR vs torch reference {psnr:.1f} dB < 35"


def test_anyl_id_resample_end_to_end(stack):
    """Any-length + ID resampling (the VideoPainterID inference path):
    per-layer masked KV re-attention on the current window + the previous
    window's cached hidden states (reference :962-988 with
    id_pool_resample_learnable=True)."""
    g, _, branch, vae, params, sched = stack
    rs_cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                    sample_height=8, sample_width=12,
                                    id_pool_resample_learnable=True)
    transformer = CogVideoXTransformer3D(rs_cfg)
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)

    video = jnp.asarray(g["io::video2"]) * 2 - 1
    masks = jnp.asarray(g["io::masks2"])
    image = jnp.asarray(g["io::image2"]) * 2 - 1
    embeds = jnp.asarray(g["io::embeds"])

    init_noises, dpm_list = [], []
    base = 0
    for _ in range(3):
        init_noises.append(to_lat_jax(g[f"noise::anyl_rs::{base}"]))
        noises, base = effective_dpm_noises(g, "anyl_rs", base, 4)
        dpm_list.append(noises)
    assert base == int(g["io::anyl_rs::n_noises"])

    out = pipe(params, image=image, video=video, masks=masks,
               num_frames=9, stride=4,
               prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               prev_clip_weight=0.3, id_pool_resample=True,
               replace_gt=True, mask_add=True,
               vae_sample_mode="mode", init_noises=init_noises,
               dpm_noises_list=dpm_list, rng=jax.random.PRNGKey(0))
    ours01 = np.asarray(out) / 2 + 0.5
    ref = g["io::anyl_rs::out"][None]
    np.testing.assert_allclose(ours01, ref, rtol=0, atol=3e-3)
    assert np.abs(ours01 - ref).mean() < 3e-4

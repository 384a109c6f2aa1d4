"""bf16 end-to-end numerics: the hard part of TPU parity (SURVEY.md §7).

Runs the tiny dual-stream pipeline at bf16 and fp32 with identical noise and
checks the decoded videos stay close — fp32 norm/softmax accumulation must
keep error from compounding over layers x steps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintPipeline
from videopainter_tpu.schedulers import CogVideoXDPMScheduler


def test_bf16_pipeline_close_to_fp32():
    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    vcfg = VAEConfig.tiny(latent_channels=16)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(vcfg)
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    image = video[:, 0] * (1 - jnp.asarray(masks[:, 0, :, :, None]))
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    init_noise = jnp.asarray(rng.randn(1, 3, 8, 12, 16).astype(np.float32))
    dpm_noises = jnp.asarray(rng.randn(4, 1, 3, 8, 12, 16).astype(np.float32))
    kw = dict(image=image, video=video, masks=jnp.asarray(masks),
              prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
              replace_gt=True, mask_add=True, vae_sample_mode="mode",
              init_noise=init_noise, dpm_noises=dpm_noises,
              rng=jax.random.PRNGKey(7))

    out32 = pipe(params, **kw)
    params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    pipe16 = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    out16 = pipe16(params16, **kw, dtype=jnp.bfloat16)

    err = np.abs(out32.astype(np.float32) - np.asarray(out16, np.float32))
    # background is replace_gt'd (VAE-only error); the generated hole drifts
    # more but must stay visually equivalent
    assert err.mean() < 0.02, f"mean bf16 drift {err.mean()}"
    assert np.isfinite(np.asarray(out16)).all()

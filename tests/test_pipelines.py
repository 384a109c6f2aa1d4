"""Pipeline smoke tests on tiny configs (structure/finiteness/behavioral checks).

End-to-end numerical parity vs the torch reference pipeline lives in
test_pipeline_golden.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import (CogVideoXI2VDualInpaintAnyLPipeline,
                                        CogVideoXI2VDualInpaintPipeline)
from videopainter_tpu.schedulers import CogVideoXDDIMScheduler, CogVideoXDPMScheduler

VAE_CFG = VAEConfig.tiny()
DIT_CFG = TransformerConfig.tiny(in_channels=8, out_channels=4,
                                 sample_height=8, sample_width=12)
BR_CFG = BranchConfig.from_transformer(DIT_CFG, num_layers=2)


@pytest.fixture(scope="module")
def stack():
    transformer = CogVideoXTransformer3D(DIT_CFG)
    branch = CogVideoXBranch(BR_CFG)
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    k = jax.random.PRNGKey(0)
    params = {
        "transformer": transformer.init(jax.random.PRNGKey(1)),
        "vae": vae.init(jax.random.PRNGKey(2)),
    }
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(3),
                                                    params["transformer"], DIT_CFG)
    # make the branch injection non-trivial
    params["branch"]["branch_blocks"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(4),
                          params["branch"]["branch_blocks"]["kernel"].shape) * 0.02)
    return transformer, branch, vae, params


def make_data(t=9):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, t, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, t, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    image = video[:, 0] * (1 - jnp.asarray(masks[:, 0, :, :, None]))
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    neg = jnp.zeros_like(embeds)
    return video, jnp.asarray(masks), image, embeds, neg


@pytest.mark.parametrize("sched_cls", [CogVideoXDPMScheduler, CogVideoXDDIMScheduler])
def test_single_clip_smoke(stack, sched_cls):
    transformer, branch, vae, params = stack
    sched = sched_cls(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    video, masks, image, embeds, neg = make_data()
    out = pipe(params, image=image, video=video, masks=masks,
               prompt_embeds=embeds, negative_prompt_embeds=neg,
               num_inference_steps=4, guidance_scale=6.0, use_dynamic_cfg=True,
               replace_gt=True, mask_add=True, rng=jax.random.PRNGKey(7))
    assert out.shape == (1, 9, 64, 96, 3)
    assert np.isfinite(out).all()


def test_single_clip_latent_and_strength(stack):
    transformer, branch, vae, params = stack
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    video, masks, image, embeds, neg = make_data()
    lat = pipe(params, image=image, video=video, masks=masks,
               prompt_embeds=embeds, negative_prompt_embeds=neg,
               num_inference_steps=4, guidance_scale=6.0, strength=0.75,
               output_type="latent", rng=jax.random.PRNGKey(7))
    assert lat.shape == (1, 3, 8, 12, 4)
    assert np.isfinite(np.asarray(lat)).all()


def test_anyl_windows(stack):
    transformer, branch, vae, params = stack
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)
    # 17 frames, window 9, stride 8 -> 2 windows; overlap 1 frame -> overlap_lat 0?
    # (9-8)//4 = 0 latent overlap; accumulator length (3-1)*?: use stride 4:
    # (17-9)//4+1 = 3 windows, overlap_lat = (9-4)//4 = 1
    video, masks, image, embeds, neg = make_data(t=17)
    out = pipe(params, image=image, video=video, masks=masks, num_frames=9, stride=4,
               prompt_embeds=embeds, negative_prompt_embeds=neg,
               num_inference_steps=4, guidance_scale=6.0,
               prev_clip_weight=0.3, replace_gt=True, mask_add=True,
               rng=jax.random.PRNGKey(7))
    # num_frame_latents = 3*3 - 2*(1+1) = 5 -> decode -> 17 frames
    assert out.shape == (1, 17, 64, 96, 3)
    assert np.isfinite(out).all()


def test_anyl_invalid_stride(stack):
    transformer, branch, vae, params = stack
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)
    video, masks, image, embeds, neg = make_data(t=17)
    with pytest.raises(ValueError):
        pipe(params, image=image, video=video, masks=masks, num_frames=9, stride=10,
             prompt_embeds=embeds, negative_prompt_embeds=neg,
             num_inference_steps=2, guidance_scale=6.0)


def test_sequential_cfg_matches_batched():
    """sequential_cfg=True (two B-sized passes per step, the single-chip
    memory mode) must match the CFG-batched pass — incl. the any-length
    ID-resample path where captured hidden states and prev-state are handled
    per CFG half."""
    import numpy as np

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX,
                                         CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines import (
        CogVideoXI2VDualInpaintAnyLPipeline, CogVideoXI2VDualInpaintPipeline)
    from videopainter_tpu.schedulers import CogVideoXDPMScheduler

    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16))
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))

    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    kw = dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
              prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=3, guidance_scale=6.0, use_dynamic_cfg=True,
              replace_gt=True, mask_add=True, vae_sample_mode="mode",
              rng=jax.random.PRNGKey(7))
    ref = pipe(params, **kw)
    got = pipe(params, sequential_cfg=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    pipe2 = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)
    video2 = jnp.asarray(rng.rand(1, 17, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks2 = np.zeros((1, 17, 64, 96), np.float32)
    masks2[:, :, 10:30, 20:60] = 1.0
    kw2 = dict(video=video2, masks=jnp.asarray(masks2), image=video2[:, 0],
               num_frames=9, stride=4, prompt_embeds=embeds,
               negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=3, guidance_scale=6.0, replace_gt=True,
               mask_add=True, id_pool_resample=True, prev_clip_weight=0.3,
               vae_sample_mode="mode", rng=jax.random.PRNGKey(9))
    ref2 = pipe2(params, **kw2)
    got2 = pipe2(params, sequential_cfg=True, **kw2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=3e-5)


def test_scan_chunk_matches_single_scan():
    """scan_chunk (host loop over one jitted segment — required on backends
    that kill long-running device programs) must be bit-identical to the
    single-scan path, incl. the anyl capture step."""
    import numpy as np

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX,
                                         CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines import (
        CogVideoXI2VDualInpaintAnyLPipeline, CogVideoXI2VDualInpaintPipeline)
    from videopainter_tpu.schedulers import CogVideoXDPMScheduler

    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16))
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))

    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    kw = dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
              prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=5, guidance_scale=6.0, use_dynamic_cfg=True,
              replace_gt=True, mask_add=True, vae_sample_mode="mode",
              rng=jax.random.PRNGKey(7))
    ref = pipe(params, scan_chunk=0, **kw)
    got = pipe(params, scan_chunk=2, **kw)  # 5 % 2 -> divisor fallback
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    pipe2 = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)
    video2 = jnp.asarray(rng.rand(1, 17, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks2 = np.zeros((1, 17, 64, 96), np.float32)
    masks2[:, :, 10:30, 20:60] = 1.0
    kw2 = dict(video=video2, masks=jnp.asarray(masks2), image=video2[:, 0],
               num_frames=9, stride=4, prompt_embeds=embeds,
               negative_prompt_embeds=jnp.zeros_like(embeds),
               num_inference_steps=4, guidance_scale=6.0, replace_gt=True,
               mask_add=True, id_pool_resample=True, prev_clip_weight=0.3,
               vae_sample_mode="mode", rng=jax.random.PRNGKey(9))
    ref2 = pipe2(params, scan_chunk=0, **kw2)
    got2 = pipe2(params, scan_chunk=2, **kw2)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))

"""Step-skip caching (DenoiseConfig.skip_steps) — the serving accelerator
that reuses the previous step's pre-CFG model output at scheduled steps.

Semantics under test:
 - a skipped step runs NO model evaluation but a FRESH scheduler update /
   dynamic-CFG combine / replace_gt blend (verified against an explicit
   reference loop built from the scheduler primitives);
 - the chunked-dispatch path threads the cached prediction across segment
   boundaries bit-identically;
 - sequential-CFG and batched-CFG skip paths agree;
 - schedule helpers and validation (step 0 can never be skipped).

Not in the torch reference (it always evaluates all 50 steps) — quality at
flagship dims is gated separately by tools/gate_skip_flagship.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintPipeline
from videopainter_tpu.pipelines.common import (DenoiseConfig, DenoiseInputs,
                                               make_denoise_fn,
                                               parse_skip_steps, prepare_rope,
                                               uniform_skip_steps)
from videopainter_tpu.schedulers import (CogVideoXDDIMScheduler,
                                         CogVideoXDPMScheduler)


def test_uniform_skip_steps_helper():
    # stride 2 over [10, 16): evaluate 10, 12, 14; skip 11, 13, 15
    assert uniform_skip_steps(50, 10, 16, 2) == (11, 13, 15)
    # stride 3: evaluate 10, 13; skip the rest of the window
    assert uniform_skip_steps(50, 10, 16, 3) == (11, 12, 14, 15)
    assert parse_skip_steps("10:16:2", 50) == (11, 13, 15)
    assert parse_skip_steps("11,15,13", 50) == (11, 13, 15)
    with pytest.raises(ValueError):
        uniform_skip_steps(50, 0, 10, 2)   # start must be > 0
    with pytest.raises(ValueError):
        uniform_skip_steps(50, 10, 60, 2)  # window past the end
    with pytest.raises(ValueError):
        uniform_skip_steps(50, 10, 20, 1)  # stride 1 = skip everything
    # comma lists are deduped and range-checked AT PARSE TIME: a spec like
    # "5,5,7" must not inflate bench.py's n_skip arithmetic, and "60" with
    # 50 steps must fail loudly, not at trace time
    assert parse_skip_steps("5,5,7", 50) == (5, 7)
    with pytest.raises(ValueError, match="out of range"):
        parse_skip_steps("60", 50)
    with pytest.raises(ValueError, match="out of range"):
        parse_skip_steps("3,-1", 50)


def test_skip_final_step_with_capture_rejected():
    """With capture_hidden_states the final step always evaluates fully
    (cross-window states need a real forward); listing it as skipped would
    be a silent no-op — make_denoise_fn must reject it loudly."""
    cfg = TransformerConfig.tiny(in_channels=8, out_channels=4,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    sched = CogVideoXDDIMScheduler(SchedulerConfig.cogvideox_5b_inference())
    ts = sched.timesteps(4)
    dcfg = DenoiseConfig(num_inference_steps=4, do_cfg=False,
                         use_dynamic_cfg=False, guidance_scale=1.0,
                         conditioning_scale=1.0, replace_gt=False,
                         mask_add=False, mask_background=False,
                         add_first=False, wo_text=False,
                         id_pool_resample=False, is_dpm=False, mode="plain",
                         capture_hidden_states=True, skip_steps=(2, 3))
    with pytest.raises(ValueError, match="capture"):
        make_denoise_fn(transformer, None, sched, dcfg, ts)


def test_skip_step0_rejected():
    cfg = TransformerConfig.tiny(in_channels=8, out_channels=4,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    sched = CogVideoXDDIMScheduler(SchedulerConfig.cogvideox_5b_inference())
    ts = sched.timesteps(4)
    dcfg = DenoiseConfig(num_inference_steps=4, do_cfg=False,
                         use_dynamic_cfg=False, guidance_scale=1.0,
                         conditioning_scale=1.0, replace_gt=False,
                         mask_add=False, mask_background=False,
                         add_first=False, wo_text=False,
                         id_pool_resample=False, is_dpm=False, mode="plain",
                         skip_steps=(0, 2))
    with pytest.raises(ValueError, match="step 0"):
        make_denoise_fn(transformer, None, sched, dcfg, ts)


def test_skip_matches_reference_loop():
    """Skip-enabled scan == an explicit host loop over the same scheduler
    primitives that reuses the cached prediction at the scheduled steps."""
    cfg = TransformerConfig.tiny(in_channels=8, out_channels=4,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    params = {"transformer": transformer.init(jax.random.PRNGKey(0))}
    sched = CogVideoXDDIMScheduler(SchedulerConfig.cogvideox_5b_inference())
    S = 6
    skip = (2, 3, 5)
    timesteps = sched.timesteps(S)

    rng = np.random.RandomState(0)
    lat_shape = (1, 3, 8, 12, 4)
    latents0 = jnp.asarray(rng.rand(*lat_shape).astype(np.float32))
    image_latents = jnp.asarray(rng.rand(*lat_shape).astype(np.float32))
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    rope = prepare_rope(cfg, 64, 96, 3)

    inputs = DenoiseInputs(
        latents=latents0, image_latents=image_latents,
        masked_video_latents=jnp.zeros(lat_shape, jnp.float32),
        mask=jnp.zeros(lat_shape[:-1], jnp.float32),
        prompt_embeds=embeds, noise=jnp.zeros(lat_shape, jnp.float32),
        video_latents=None)

    dcfg = DenoiseConfig(num_inference_steps=S, do_cfg=False,
                         use_dynamic_cfg=False, guidance_scale=1.0,
                         conditioning_scale=1.0, replace_gt=False,
                         mask_add=False, mask_background=False,
                         add_first=False, wo_text=False,
                         id_pool_resample=False, is_dpm=False, mode="plain",
                         skip_steps=skip)
    denoise = jax.jit(make_denoise_fn(transformer, None, sched, dcfg, timesteps))
    got, _, _ = denoise(params, inputs, rope, jax.random.PRNGKey(1))

    # explicit reference loop: scheduler primitives + cached-pred reuse
    coeffs = sched.precompute(S, timesteps=np.asarray(timesteps))
    lat = latents0
    pred = None
    for i in range(S):
        if i not in skip:
            model_in = jnp.concatenate([lat, image_latents], axis=-1)
            ts = jnp.broadcast_to(coeffs.timesteps[i], (1,))
            pred = transformer.apply(params["transformer"], model_in, embeds,
                                     ts, rope=rope).sample.astype(jnp.float32)
        lat, _ = sched.step(coeffs, i, pred, lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(lat),
                               atol=2e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def stack():
    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16))
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    return transformer, branch, vae, params


def _pipe_kw(rng):
    r = np.random.RandomState(0)
    video = jnp.asarray(r.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    embeds = jnp.asarray(r.rand(1, 5, 12).astype(np.float32))
    return dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
                prompt_embeds=embeds,
                negative_prompt_embeds=jnp.zeros_like(embeds),
                num_inference_steps=6, guidance_scale=6.0,
                use_dynamic_cfg=True, replace_gt=True, mask_add=True,
                vae_sample_mode="mode", rng=rng)


def test_skip_pipeline_engages_and_chunked_bitequal(stack):
    """Full pipeline with a skip schedule: (a) the cache actually engages
    (output differs from the all-steps run), (b) chunked dispatch threads the
    cached prediction across segments bit-identically, (c) sequential CFG
    agrees with batched CFG under skipping."""
    transformer, branch, vae, params = stack
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, sched)
    kw = _pipe_kw(jax.random.PRNGKey(7))
    skip = uniform_skip_steps(6, 2, 6, 2)  # skip steps 3, 5

    full = pipe(params, scan_chunk=0, **kw)
    skipped = pipe(params, scan_chunk=0, skip_steps=skip, **kw)
    assert np.isfinite(skipped).all()
    assert np.abs(np.asarray(full) - np.asarray(skipped)).max() > 1e-6, \
        "skip schedule had no effect — cache not engaged"

    chunked = pipe(params, scan_chunk=2, skip_steps=skip, **kw)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(skipped))

    seq = pipe(params, scan_chunk=0, skip_steps=skip, sequential_cfg=True, **kw)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(skipped), atol=2e-5)

"""Streaming VAE decode: bit-identity with the one-shot path.

VAEStreamDecoder must emit exactly what decode(z_full) produces — same
frame-batch boundaries, carried conv caches, per-tile caches + in-place
blending under tiling — regardless of how the latent frames are split
across feed() calls. Also covers the any-length pipeline's stream_decode
path end to end (including on a second device).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline
from videopainter_tpu.schedulers import CogVideoXDPMScheduler

VAE_CFG = VAEConfig.tiny(latent_channels=16)


@pytest.fixture(scope="module")
def vae_stack():
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    return vae, {"vae": vae.init(jax.random.PRNGKey(3))}


@pytest.mark.parametrize("total_t,splits", [
    (5, [2, 2, 1]),
    (5, [5]),
    (7, [1, 1, 1, 1, 1, 1, 1]),
    (6, [4, 2]),
])
def test_stream_matches_oneshot(vae_stack, total_t, splits):
    vae, params = vae_stack
    assert sum(splits) == total_t
    z = jax.random.normal(jax.random.PRNGKey(0), (1, total_t, 8, 12, 16))
    ref = vae.decode(params["vae"], z)

    streamer = vae.stream_decoder(params["vae"], total_t)
    outs, s = [], 0
    for n in splits:
        got = streamer.feed(z[:, s:s + n])
        if got is not None:
            outs.append(got)
        s += n
    ours = jnp.concatenate(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_stream_matches_oneshot_tiled(vae_stack):
    vae, params = vae_stack
    vae.enable_tiling(tile_sample_min_height=48, tile_sample_min_width=64)
    try:
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 12, 18, 16))
        ref = vae.decode(params["vae"], z)
        streamer = vae.stream_decoder(params["vae"], 5)
        outs = [streamer.feed(z[:, :3]), streamer.feed(z[:, 3:])]
        ours = jnp.concatenate([o for o in outs if o is not None], axis=1)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
    finally:
        vae.disable_tiling()


def test_stream_cache_spill_bitexact(vae_stack):
    """Single-chip mode: tile conv caches round-trip to HOST between chunks
    (device holds one tile's cache at a time). Must stay bit-identical —
    the spill is pure copies."""
    vae, params = vae_stack
    vae.enable_tiling(tile_sample_min_height=48, tile_sample_min_width=64)
    try:
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12, 18, 16))
        ref = vae.decode(params["vae"], z)
        streamer = vae.stream_decoder(params["vae"], 5, cache_spill=True)
        outs = [streamer.feed(z[:, :2]), streamer.feed(z[:, 2:4]),
                streamer.feed(z[:, 4:])]
        ours = jnp.concatenate([o for o in outs if o is not None], axis=1)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
        # caches really live on host between chunks
        assert all(isinstance(leaf, np.ndarray)
                   for leaf in jax.tree.leaves(streamer.caches))
    finally:
        vae.disable_tiling()


def test_stream_overfeed_raises(vae_stack):
    vae, params = vae_stack
    streamer = vae.stream_decoder(params["vae"], 3)
    streamer.feed(jnp.zeros((1, 2, 8, 12, 16)))
    with pytest.raises(ValueError):
        streamer.feed(jnp.zeros((1, 2, 8, 12, 16)))


def _make_anyl_stack():
    t2v_cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                     sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(t2v_cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(t2v_cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    tp = transformer.init(jax.random.PRNGKey(0))
    params = {"transformer": tp, "vae": vae.init(jax.random.PRNGKey(9)),
              "branch": branch.init_from_transformer(jax.random.PRNGKey(1), tp, t2v_cfg)}
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    return CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched), params


@pytest.mark.parametrize("stride", [8, 4])
def test_anyl_stream_decode_matches(stride):
    """stream_decode=True must be pixel-identical to the default path, for
    both non-overlapping (stride == num_frames-1 grid) and overlapping
    windows (decode lags one window)."""
    pipe, params = _make_anyl_stack()
    t = 17 if stride == 8 else 17
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, t, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, t, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    image = video[:, 0]
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))

    kw = dict(video=video, masks=jnp.asarray(masks), image=image,
              num_frames=9, stride=stride, prompt_embeds=embeds,
              negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=2, guidance_scale=6.0, replace_gt=True,
              vae_sample_mode="mode", rng=jax.random.PRNGKey(7))
    ref = pipe(params, **kw)
    out = pipe(params, **kw, stream_decode=True)
    np.testing.assert_array_equal(out, ref)


def test_anyl_stream_decode_second_device():
    """vae_device: decode runs on another device of the CPU mesh; result
    is still identical."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    pipe, params = _make_anyl_stack()
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.rand(1, 17, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 17, 64, 96), np.float32)
    masks[:, :, 10:30, 30:70] = 1.0
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    kw = dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
              num_frames=9, stride=8, prompt_embeds=embeds,
              negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=2, guidance_scale=6.0,
              vae_sample_mode="mode", rng=jax.random.PRNGKey(5))
    ref = pipe(params, **kw)
    out = pipe(params, **kw, stream_decode=True, vae_device=jax.devices()[1])
    np.testing.assert_array_equal(out, ref)

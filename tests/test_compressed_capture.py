"""Compressed cross-window state capture (ID-resample any-length path).

The captured per-layer hidden states are only ever read through a
prev_resample_mask multiply (ops/attention.py:133-134), so capturing just the
masked-region tokens (common.capture_token_indices) and scattering them back
(models/dit.py run_block) must be EXACT vs the full [L, 2B, S, D] capture.
This is the memory optimization that makes flagship ID anyl single-chip
(8.5 GiB captured state -> mask-fraction of that).
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
from videopainter_tpu.pipelines.common import capture_token_indices
from videopainter_tpu.schedulers import CogVideoXDPMScheduler


def test_capture_token_indices_shape_and_padding():
    mask = np.zeros((2, 3, 8, 12), np.float32)
    mask[0, :, 2:4, 4:8] = 1.0        # 3 frames * 1x2 patches = 6 tokens
    mask[1, :, 0:2, 0:2] = 1.0        # 3 frames * 1x1 patch = 3 tokens
    idx = np.asarray(capture_token_indices(jnp.asarray(mask), 2, text_len=5,
                                           bucket=4))
    s_joint = 5 + 3 * 4 * 6
    assert idx.shape == (2, 8)        # max count 6 -> bucket 4 rounds to 8
    assert (idx[0, :6] >= 5).all() and (idx[0, 6:] == s_joint).all()
    assert (idx[1, :3] >= 5).all() and (idx[1, 3:] == s_joint).all()
    # bucket larger than S_joint caps at S_joint
    idx2 = np.asarray(capture_token_indices(jnp.asarray(mask), 2, text_len=5,
                                            bucket=4096))
    assert idx2.shape[1] == s_joint


@pytest.fixture(scope="module")
def rs_stack():
    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12,
                                 id_pool_resample_learnable=True)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16))
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)
    return pipe, params


def _anyl_kwargs(sequential_cfg=False):
    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.rand(1, 17, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 17, 64, 96), np.float32)
    masks[:, :, 12:32, 24:56] = 1.0
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    return dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
                num_frames=9, stride=4, prompt_embeds=embeds,
                negative_prompt_embeds=jnp.zeros_like(embeds),
                num_inference_steps=3, guidance_scale=6.0,
                use_dynamic_cfg=True, replace_gt=True, mask_add=True,
                id_pool_resample=True, prev_clip_weight=0.3,
                vae_sample_mode="mode", sequential_cfg=sequential_cfg,
                rng=jax.random.PRNGKey(11))


def test_compressed_capture_matches_full(rs_stack):
    pipe, params = rs_stack
    kw = _anyl_kwargs()
    full = pipe(params, compress_capture=None, **kw)
    comp = pipe(params, compress_capture=4, **kw)   # tiny bucket: real padding
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(full))


def test_compressed_capture_matches_full_sequential_cfg(rs_stack):
    pipe, params = rs_stack
    kw = _anyl_kwargs(sequential_cfg=True)
    full = pipe(params, compress_capture=None, **kw)
    comp = pipe(params, compress_capture=8, **kw)
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(full))


def test_capture_int8_close_to_full(rs_stack):
    """int8 per-token capture: lossy but tight — the second window's output
    must track the full-precision capture closely (the stored state carries
    ~0.4% quantization error into the next window's resample attention)."""
    pipe, params = rs_stack
    kw = _anyl_kwargs()
    full = np.asarray(pipe(params, compress_capture=4, **kw))
    q = np.asarray(pipe(params, compress_capture=4, capture_int8=True, **kw))
    assert np.isfinite(q).all()
    # window 0 is identical (no prev state); later windows differ only by the
    # quantization error carried through one attention call
    err = np.abs(q - full).mean() / (np.abs(full).mean() + 1e-9)
    assert err < 5e-3, err
    assert not np.array_equal(q, full)  # it IS lossy — guard the test itself


def test_capture_int8_sequential_cfg_matches_batched(rs_stack):
    """The int8-capture dict must split/concat correctly through the
    sequential-CFG half() path — sequential and batched CFG runs with
    capture_int8 must agree exactly (the same quantized states flow
    through either path)."""
    pipe, params = rs_stack
    b = np.asarray(pipe(params, compress_capture=4, capture_int8=True,
                        **_anyl_kwargs()))
    s = np.asarray(pipe(params, compress_capture=4, capture_int8=True,
                        **_anyl_kwargs(sequential_cfg=True)))
    np.testing.assert_allclose(s, b, rtol=2e-5, atol=2e-5)


def test_capture_int8_dequant_error_bound(rs_stack):
    """Unit-level: the dict capture dequantizes to within per-token int8
    error of the bf16 capture (|x - deq(x)| <= scale/2 = max|x|/254)."""
    pipe, params = rs_stack
    cfg = pipe.transformer.cfg
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 8, 12, cfg.in_channels), jnp.float32)
    emb = jnp.asarray(rng.randn(1, 5, 12), jnp.float32)
    mask = jnp.asarray((rng.rand(1, 2, 8, 12) > 0.5), jnp.float32)
    ci = capture_token_indices(mask, cfg.patch_size, text_len=5, bucket=4)
    kw = dict(rope=None, branch_block_masks=mask, id_pool_resample=True,
              return_hidden_states=True, capture_indices=ci)
    ref = pipe.transformer.apply(params["transformer"], x, emb, jnp.asarray(0),
                                 **kw).hidden_states_list
    out = pipe.transformer.apply(params["transformer"], x, emb, jnp.asarray(0),
                                 capture_quant=True, **kw).hidden_states_list
    assert out["values"].dtype == jnp.int8
    deq = np.asarray(out["values"], np.float32) * np.asarray(
        out["scales"], np.float32)[..., None]
    ref = np.asarray(ref, np.float32)
    bound = np.abs(ref).max(axis=-1, keepdims=True) / 254.0 + 1e-6
    assert (np.abs(deq - ref) <= bound + 1e-4 * np.abs(ref)).all()


def test_compressed_prev_requires_resample_path():
    cfg = TransformerConfig.tiny()  # id_pool_resample_learnable=False
    transformer = CogVideoXTransformer3D(cfg)
    params = transformer.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 2, 8, 12, cfg.in_channels))
    emb = jnp.zeros((1, 5, 12))
    s_joint = 5 + 2 * 4 * 6
    prev = jnp.zeros((cfg.num_layers, 1, 4, cfg.inner_dim))
    with pytest.raises(ValueError):
        transformer.apply(params, x, emb, jnp.asarray(0),
                          prev_hidden_states=prev,
                          prev_clip_weight=0.3,
                          prev_resample_mask=jnp.zeros((1, s_joint), bool),
                          prev_hidden_indices=jnp.zeros((1, 4), jnp.int32))

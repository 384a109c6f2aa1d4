"""Self-served first-frame pre-inpaint (infer/first_frame.py) — the offline
FluxFill analog (reference infer/inpaint.py:119-194, app/utils.py:86-160)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.infer.first_frame import make_self_first_frame_inpaint
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline
from videopainter_tpu.pipelines.variants import (
    CogVideoXI2VInpaintAnyLPipeline, init_sft_from_transformer,
    make_sft_inpaint_transformer)
from videopainter_tpu.schedulers import CogVideoXDPMScheduler

VAE_CFG = VAEConfig.tiny()
DIT_CFG = TransformerConfig.tiny(in_channels=8, out_channels=4,
                                 sample_height=8, sample_width=12)


def _frame_and_mask():
    rng = np.random.RandomState(3)
    frame01 = rng.rand(64, 96, 3).astype(np.float32)
    mask = np.zeros((64, 96), np.float32)
    mask[16:40, 24:64] = 1.0
    return frame01, mask


@pytest.fixture(scope="module")
def dual_pipe():
    transformer = CogVideoXTransformer3D(DIT_CFG)
    branch = CogVideoXBranch(BranchConfig.from_transformer(DIT_CFG, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    params = {
        "transformer": transformer.init(jax.random.PRNGKey(1)),
        "vae": vae.init(jax.random.PRNGKey(2)),
    }
    params["branch"] = branch.init_from_transformer(
        jax.random.PRNGKey(3), params["transformer"], DIT_CFG)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)
    return pipe, params


def test_self_inpaint_dual(dual_pipe):
    pipe, params = dual_pipe
    frame01, mask = _frame_and_mask()
    embeds = np.random.RandomState(0).rand(1, 5, 12).astype(np.float32)
    fn = make_self_first_frame_inpaint(pipe, params, num_inference_steps=3,
                                       prompt_embeds=embeds)
    out = fn(frame01, mask, "a prompt")
    assert out.shape == frame01.shape
    assert np.isfinite(out).all()
    keep = mask[..., None] == 0
    # composite: pixels outside the hole are untouched
    np.testing.assert_allclose(out[keep[..., 0]], frame01[keep[..., 0]])
    # the hole is actually filled (not left zeroed / not the masked input)
    hole = out[mask > 0.5]
    assert np.abs(hole).max() > 1e-3
    masked_in = (frame01 * (1 - mask[..., None]))[mask > 0.5]
    assert np.abs(hole - masked_in).max() > 1e-3


def test_self_inpaint_branchless_sft():
    """Branchless deployments fall back to the SFT widened-patch-embed
    backbone (itself an inpainter)."""
    cfg = TransformerConfig.tiny(in_channels=4, out_channels=4,
                                 sample_height=8, sample_width=12)
    transformer = make_sft_inpaint_transformer(cfg)
    base = CogVideoXTransformer3D(cfg).init(jax.random.PRNGKey(0))
    params = {
        "transformer": init_sft_from_transformer(jax.random.PRNGKey(1), base, cfg),
        "vae": AutoencoderKLCogVideoX(VAE_CFG).init(jax.random.PRNGKey(2)),
    }
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VInpaintAnyLPipeline(
        transformer, AutoencoderKLCogVideoX(VAE_CFG), sched)
    frame01, mask = _frame_and_mask()
    embeds = np.random.RandomState(0).rand(1, 5, 12).astype(np.float32)
    fn = make_self_first_frame_inpaint(pipe, params, num_inference_steps=2,
                                       prompt_embeds=embeds)
    out = fn(frame01, mask, "p")
    assert out.shape == frame01.shape and np.isfinite(out).all()


def test_encode_prompt_fn_path(dual_pipe):
    pipe, params = dual_pipe
    frame01, mask = _frame_and_mask()
    calls = []

    def enc(prompt):
        calls.append(prompt)
        e = np.random.RandomState(1).rand(1, 5, 12).astype(np.float32)
        return e, np.zeros_like(e)

    fn = make_self_first_frame_inpaint(pipe, params, num_inference_steps=2,
                                       encode_prompt_fn=enc)
    out = fn(frame01, mask, "the prompt")
    assert calls == ["the prompt"]
    assert np.isfinite(out).all()

"""Headless app session test: load -> click -> track -> inpaint."""

import jax
import numpy as np
import pytest

from videopainter_tpu.app.app import AppSession
from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline
from videopainter_tpu.schedulers import CogVideoXDPMScheduler


def test_app_session_end_to_end():
    import sys

    sys.path.insert(0, "tests")
    from test_sam2_predictor import tiny_params

    sam_cfg, sam_params = tiny_params(jax.random.PRNGKey(0))
    from videopainter_tpu.segmentation import SAM2VideoPredictor

    predictor = SAM2VideoPredictor(sam_cfg, sam_params)

    DIT = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    BR = BranchConfig.from_transformer(DIT, num_layers=2)
    VAE = VAEConfig.tiny(latent_channels=16)
    transformer, branch, vae = (CogVideoXTransformer3D(DIT), CogVideoXBranch(BR),
                                AutoencoderKLCogVideoX(VAE))
    params = {"transformer": transformer.init(jax.random.PRNGKey(1)),
              "vae": vae.init(jax.random.PRNGKey(2))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(3),
                                                    params["transformer"], DIT)
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(
        transformer, branch, vae,
        CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference()))

    import jax.numpy as jnp

    embeds = jnp.asarray(np.random.RandomState(0).rand(1, 5, 12).astype(np.float32))
    session = AppSession(predictor=predictor, pipe=pipe, pipe_params=params,
                         encode_prompt_fn=lambda p: (embeds, jnp.zeros_like(embeds)),
                         height=64, width=96, max_frames=9)

    video = (np.random.RandomState(1).rand(12, 50, 70, 3) * 255).astype(np.uint8)
    frames = session.load_video(video)
    assert frames.shape == (9, 64, 96, 3)

    mask = session.click(0, 48.0, 32.0, positive=True)
    assert mask.shape == (64, 96)
    overlay = session.overlay(0, mask)
    assert overlay.shape == (64, 96, 3)

    masks = session.track()
    assert masks.shape == (9, 64, 96)

    out = session.inpaint("a cat", num_inference_steps=2)
    assert out.shape == (9, 64, 96, 3) and out.dtype == np.uint8

    with pytest.raises(RuntimeError):
        AppSession(predictor=predictor, pipe=pipe, pipe_params=params,
                   encode_prompt_fn=lambda p: (embeds, embeds)).inpaint("x")

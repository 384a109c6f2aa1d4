"""Stock generation pipelines (T2V / I2V / V2V) smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from videopainter_tpu.config import SchedulerConfig, TransformerConfig, VAEConfig
from videopainter_tpu.models import AutoencoderKLCogVideoX, CogVideoXTransformer3D
from videopainter_tpu.pipelines import (CogVideoXImageToVideoPipeline,
                                        CogVideoXPipeline,
                                        CogVideoXVideoToVideoPipeline)
from videopainter_tpu.schedulers import CogVideoXDPMScheduler

VAE_CFG = VAEConfig.tiny()  # latent 4
SCHED = SchedulerConfig.cogvideox_5b_inference()


def stack(in_ch):
    cfg = TransformerConfig.tiny(in_channels=in_ch, out_channels=4,
                                 sample_height=8, sample_width=12)
    t = CogVideoXTransformer3D(cfg)
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    params = {"transformer": t.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    return t, vae, params


def embeds():
    e = jnp.asarray(np.random.RandomState(0).rand(1, 5, 12).astype(np.float32))
    return dict(prompt_embeds=e, negative_prompt_embeds=jnp.zeros_like(e),
                num_inference_steps=2, guidance_scale=6.0,
                rng=jax.random.PRNGKey(3))


def test_t2v_generation():
    t, vae, params = stack(4)
    pipe = CogVideoXPipeline(t, vae, CogVideoXDPMScheduler(SCHED))
    out = pipe(params, num_frames=9, height=64, width=96, **embeds())
    assert out.shape == (1, 9, 64, 96, 3) and np.isfinite(out).all()


def test_i2v_generation():
    t, vae, params = stack(8)
    pipe = CogVideoXImageToVideoPipeline(t, vae, CogVideoXDPMScheduler(SCHED))
    img = jnp.asarray(np.random.RandomState(1).rand(1, 64, 96, 3), jnp.float32) * 2 - 1
    out = pipe(params, image=img, num_frames=9, height=64, width=96, **embeds())
    assert out.shape == (1, 9, 64, 96, 3) and np.isfinite(out).all()


def test_v2v_generation():
    t, vae, params = stack(4)
    pipe = CogVideoXVideoToVideoPipeline(t, vae, CogVideoXDPMScheduler(SCHED))
    vid = jnp.asarray(np.random.RandomState(2).rand(1, 9, 64, 96, 3),
                      jnp.float32) * 2 - 1
    out = pipe(params, video=vid, strength=0.5, **embeds())
    assert out.shape == (1, 9, 64, 96, 3) and np.isfinite(out).all()

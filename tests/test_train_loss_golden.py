"""Trainer loss-fragment parity vs the torch reference.

Golden from tools/gen_goldens_train_loss.py: the reference trainer's exact
add_noise -> get_velocity -> weighted-MSE lines
(train_cogvideox_inpainting_i2v_video.py:1872-1891) and the nearest mask
latent resize (:1802-1811), on fixed tensors.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import SchedulerConfig
from videopainter_tpu.schedulers import CogVideoXDDIMScheduler
from videopainter_tpu.training.train_branch import _x0_loss


def to_bthwc(x):  # [B, F, C, H, W] -> [B, F, H, W, C]
    return np.transpose(x, (0, 1, 3, 4, 2))


@pytest.fixture(scope="module")
def env(goldens):
    g = goldens("train_loss")
    sched = CogVideoXDDIMScheduler(SchedulerConfig(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", snr_shift_scale=3.0,
        rescale_betas_zero_snr=True, prediction_type="v_prediction"))
    return g, sched


def test_add_noise_matches(env):
    g, sched = env
    noisy = sched.add_noise(jnp.asarray(to_bthwc(g["model_input"])),
                            jnp.asarray(to_bthwc(g["noise"])),
                            jnp.asarray(g["timesteps"]))
    np.testing.assert_allclose(np.asarray(noisy),
                               to_bthwc(g["noisy_video_latents"]),
                               rtol=1e-5, atol=1e-6)


def test_loss_fragment_matches(env):
    g, sched = env
    mask_lat = jnp.asarray(g["masks"][:, :, 0])              # [B, F, H, W]
    total, (loss, inp) = _x0_loss(
        sched, jnp.asarray(to_bthwc(g["model_output"])),
        jnp.asarray(to_bthwc(g["noisy_video_latents"])),
        jnp.asarray(g["timesteps"]),
        jnp.asarray(to_bthwc(g["model_input"])), mask_lat,
        inpainting_loss_weight=1.0)
    np.testing.assert_allclose(float(loss), float(g["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(inp), float(g["inpainting_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(g["total"]), rtol=1e-5)


def test_mask_latent_resize_matches(env):
    g, _ = env
    from videopainter_tpu.pipelines.common import resize_mask_to_latent

    pix = jnp.asarray(g["pix_masks"][:, 0])                  # [B, T, H, W]
    lat = resize_mask_to_latent(pix, 3, 8, 12)
    np.testing.assert_array_equal(np.asarray(lat), g["lat_masks"][:, 0])

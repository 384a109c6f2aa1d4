"""CogVideoX DDIM scheduler — pure-JAX, scan-ready.

The reference (scheduling_ddim_cogvideox.py:305-399) steps with

    x0   = f(prediction_type, abar_t, x_t, model_output)
    a_t  = sqrt((1-abar_prev)/(1-abar_t))
    b_t  = sqrt(abar_prev) - sqrt(abar_t) * a_t
    x_{t-1} = a_t x_t + b_t x0

TPU-first: `precompute(num_inference_steps)` materializes float64 host-side
per-step coefficient arrays; `step(coeffs, i, ...)` is a pure gather + FMA that
lives happily inside `lax.scan` (static shapes, no Python control flow).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from . import common


class DDIMStepCoeffs(NamedTuple):
    """Per-inference-step coefficients, each shaped [S] (fp32 device arrays)."""

    timesteps: jnp.ndarray      # int32 [S] — train-timestep of each step
    alpha_prod_t: jnp.ndarray   # [S]
    alpha_prod_prev: jnp.ndarray  # [S]
    a_t: jnp.ndarray            # [S]
    b_t: jnp.ndarray            # [S]


class CogVideoXDDIMScheduler:
    """Functional DDIM scheduler.

    Usage:
        sched = CogVideoXDDIMScheduler(SchedulerConfig.cogvideox_5b_inference())
        coeffs = sched.precompute(50)
        # inside lax.scan over i:
        prev, x0 = sched.step(coeffs, i, model_output, sample)
    """

    order = 1

    def __init__(self, config: SchedulerConfig):
        self.config = config
        self.alphas_cumprod = common.compute_alphas_cumprod(config)  # np.float64 [N]
        self.final_alpha_cumprod = 1.0 if config.set_alpha_to_one else float(self.alphas_cumprod[0])
        self.init_noise_sigma = 1.0

    # -- host-side ---------------------------------------------------------
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return common.make_timesteps(self.config, num_inference_steps)

    def precompute(self, num_inference_steps: int,
                   timesteps: np.ndarray | None = None) -> DDIMStepCoeffs:
        if timesteps is None:
            timesteps = self.timesteps(num_inference_steps)
        n = self.config.num_train_timesteps
        stride = n // num_inference_steps
        abar = self.alphas_cumprod
        a_t_list, b_t_list, ap_list, app_list = [], [], [], []
        for t in timesteps:
            prev_t = int(t) - stride
            ap = abar[int(t)]
            app = abar[prev_t] if prev_t >= 0 else self.final_alpha_cumprod
            a_t = ((1 - app) / (1 - ap)) ** 0.5
            b_t = app**0.5 - ap**0.5 * a_t
            ap_list.append(ap)
            app_list.append(app)
            a_t_list.append(a_t)
            b_t_list.append(b_t)
        return DDIMStepCoeffs(
            timesteps=jnp.asarray(np.asarray(timesteps), dtype=jnp.int32),
            alpha_prod_t=jnp.asarray(np.array(ap_list), dtype=jnp.float32),
            alpha_prod_prev=jnp.asarray(np.array(app_list), dtype=jnp.float32),
            a_t=jnp.asarray(np.array(a_t_list), dtype=jnp.float32),
            b_t=jnp.asarray(np.array(b_t_list), dtype=jnp.float32),
        )

    # -- device-side (jit/scan safe) ---------------------------------------
    def step(self, coeffs: DDIMStepCoeffs, i, model_output: jnp.ndarray,
             sample: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One DDIM update at step position `i` (traced int OK).

        Returns (prev_sample, pred_original_sample). fp32 internal math.
        """
        mo = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        ap = coeffs.alpha_prod_t[i]
        x0 = common.pred_original_sample(self.config.prediction_type, ap, x, mo)
        prev = coeffs.a_t[i] * x + coeffs.b_t[i] * x0
        return prev.astype(sample.dtype), x0.astype(sample.dtype)

    def add_noise(self, original, noise, timesteps):
        return common.add_noise(jnp.asarray(self.alphas_cumprod), original, noise, timesteps)

    def get_velocity(self, sample, noise, timesteps):
        return common.get_velocity(jnp.asarray(self.alphas_cumprod), sample, noise, timesteps)

    def scale_model_input(self, sample, timestep=None):
        return sample

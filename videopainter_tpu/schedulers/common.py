"""Shared noise-schedule math for the CogVideoX DDIM / DPM schedulers.

TPU-first design: all schedule constants are precomputed on the host in float64
numpy (matching the reference's float64 `scaled_linear` beta path,
scheduling_ddim_cogvideox.py:203) and gathered inside jitted code as fp32 — the
per-step scheduler update then becomes a handful of fused multiply-adds inside
the denoise `lax.scan`, with no data-dependent control flow.

Reference behaviors reproduced (cited file:line are in /root/reference):
 - beta schedules + SNR shift: scheduling_ddim_cogvideox.py:197-214
 - zero-terminal-SNR rescale: scheduling_ddim_cogvideox.py:95-123
 - timestep spacing (linspace/leading/trailing): scheduling_ddim_cogvideox.py:279-303
 - add_noise / get_velocity: scheduling_ddim_cogvideox.py:401-446
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig


def _betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    # Glide cosine schedule ("squaredcos_cap_v2").
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [
        min(1.0 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps), max_beta)
        for i in range(num_steps)
    ]
    return np.array(betas, dtype=np.float64)


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale (arXiv:2305.08891 alg. 1) applied to alphas_cumprod.

    Reference: scheduling_ddim_cogvideox.py:95-123.
    """
    a_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = a_sqrt[0], a_sqrt[-1]
    a_sqrt = a_sqrt - aT
    a_sqrt = a_sqrt * (a0 / (a0 - aT))
    return a_sqrt**2


def compute_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    """Float64 alphas_cumprod with the CogVideoX SNR shift (and optional zero-SNR).

    Reference: scheduling_ddim_cogvideox.py:197-218.
    """
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        betas = _betas_for_alpha_bar(n)
    else:
        raise NotImplementedError(f"beta_schedule={cfg.beta_schedule}")

    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    # SNR shift following SD3: abar <- abar / (s + (1-s)*abar)
    s = cfg.snr_shift_scale
    alphas_cumprod = alphas_cumprod / (s + (1 - s) * alphas_cumprod)
    if cfg.rescale_betas_zero_snr:
        alphas_cumprod = rescale_zero_terminal_snr(alphas_cumprod)
    return alphas_cumprod


def make_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending int64 timesteps per the configured spacing.

    Reference: scheduling_ddim_cogvideox.py:279-303.
    """
    n = cfg.num_train_timesteps
    if num_inference_steps > n:
        raise ValueError(f"num_inference_steps {num_inference_steps} > {n}")
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, n - 1, num_inference_steps).round()[::-1].astype(np.int64)
    elif cfg.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        ts = np.round(np.arange(n, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"timestep_spacing={cfg.timestep_spacing}")
    return np.ascontiguousarray(ts)


def add_noise(alphas_cumprod: jnp.ndarray, original: jnp.ndarray, noise: jnp.ndarray,
              timesteps: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps.

    `timesteps` is int [B] (or scalar); broadcasts over trailing dims.
    Reference: scheduling_ddim_cogvideox.py:401-426.
    """
    abar = alphas_cumprod.astype(jnp.float32)[timesteps]
    while abar.ndim < original.ndim:
        abar = abar[..., None]
    return (jnp.sqrt(abar) * original.astype(jnp.float32)
            + jnp.sqrt(1.0 - abar) * noise.astype(jnp.float32)).astype(original.dtype)


def get_velocity(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray, noise: jnp.ndarray,
                 timesteps: jnp.ndarray) -> jnp.ndarray:
    """v = sqrt(abar) eps - sqrt(1-abar) x_0. Reference: :428-446."""
    abar = alphas_cumprod.astype(jnp.float32)[timesteps]
    while abar.ndim < sample.ndim:
        abar = abar[..., None]
    return (jnp.sqrt(abar) * noise.astype(jnp.float32)
            - jnp.sqrt(1.0 - abar) * sample.astype(jnp.float32)).astype(sample.dtype)


def pred_original_sample(prediction_type: str, alpha_prod_t, sample, model_output):
    """Recover x0 from the model output at noise level alpha_prod_t.

    alpha_prod_t broadcasts against sample. Reference: :376-389.
    """
    beta_prod_t = 1.0 - alpha_prod_t
    if prediction_type == "epsilon":
        return (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    if prediction_type == "sample":
        return model_output
    if prediction_type == "v_prediction":
        return alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
    raise ValueError(f"prediction_type={prediction_type}")

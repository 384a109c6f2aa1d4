"""CogVideoX DPM-Solver++(SDE, 2M-style) scheduler — pure-JAX, scan-ready.

The reference (scheduling_dpm_cogvideox.py:306-439) keeps the previous step's
`old_pred_original_sample` and, when available, applies a second-order update:

    lamb  = log(sqrt(abar/(1-abar)))                        (:307-309)
    h     = lamb_next - lamb ;  r = h_last / h              (:309-314)
    m1    = sqrt((1-abar_prev)/(1-abar)) * exp(-h)          (:320)
    m2    = expm1(-2h) * sqrt(abar_prev)                    (:321)
    m3    = 1 + 1/(2r) ; m4 = 1/(2r)                        (:324-325)
    mn    = sqrt(1-abar_prev) * sqrt(1 - exp(-2h))          (:421)
    first-order:  x' = m1 x - m2 x0 + mn eps                (:424)
    second-order: D  = m3 x0 - m4 old_x0
                  x' = m1 x - m2 D + mn eps                 (:430-432)

The second-order branch is taken when step > 0 AND prev_timestep >= 0 (:426).
All coefficients are precomputed host-side in float64; `step` is a gather + FMA
with a `jnp.where` select — the whole 50-step loop compiles into one scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from . import common


class DPMStepCoeffs(NamedTuple):
    """Per-inference-step coefficients, each [S]."""

    timesteps: jnp.ndarray        # int32 [S]
    alpha_prod_t: jnp.ndarray     # [S]
    alpha_prod_prev: jnp.ndarray  # [S]
    mult1: jnp.ndarray            # [S]
    mult2: jnp.ndarray            # [S]
    mult3: jnp.ndarray            # [S] (second-order; 0 where unused)
    mult4: jnp.ndarray            # [S]
    mult_noise: jnp.ndarray       # [S]
    use_multistep: jnp.ndarray    # bool [S] — second-order branch taken
    null_noise: jnp.ndarray       # bool [S] — True on last step (prev_t < 0): reference
                                  # still adds mult_noise*eps there; kept for parity.


class CogVideoXDPMScheduler:
    """Functional DPM scheduler. The multistep state (old x0 prediction) is an
    explicit carry — thread it through your scan."""

    order = 1

    def __init__(self, config: SchedulerConfig):
        self.config = config
        self.alphas_cumprod = common.compute_alphas_cumprod(config)
        self.final_alpha_cumprod = 1.0 if config.set_alpha_to_one else float(self.alphas_cumprod[0])
        self.init_noise_sigma = 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return common.make_timesteps(self.config, num_inference_steps)

    def precompute(self, num_inference_steps: int,
                   timesteps: np.ndarray | None = None) -> DPMStepCoeffs:
        if timesteps is None:
            timesteps = self.timesteps(num_inference_steps)
        n = self.config.num_train_timesteps
        stride = n // num_inference_steps
        abar = self.alphas_cumprod

        def lam(a):
            # np.float64 so a==1.0 yields +inf (not a ZeroDivisionError) and a==0.0
            # yields -inf — the reference's torch math relies on these inf limits
            # (last step: m1->0, m2->-1, mn->0 => prev_sample == x0).
            a = np.float64(a)
            with np.errstate(divide="ignore"):
                return np.log((a / (1 - a)) ** 0.5)

        rows = []
        for idx, t in enumerate(timesteps):
            t = int(t)
            prev_t = t - stride
            # timestep_back = previous loop iteration's timestep (pipeline passes
            # `timesteps[i-1]`; None on the first step).
            t_back = int(timesteps[idx - 1]) if idx > 0 else None
            ap = abar[t]
            app = abar[prev_t] if prev_t >= 0 else self.final_alpha_cumprod
            h = lam(app) - lam(ap)
            m1 = ((1 - app) / (1 - ap)) ** 0.5 * np.exp(-h)
            m2 = np.expm1(-2 * h) * app**0.5
            mn = (1 - app) ** 0.5 * (1 - np.exp(-2 * h)) ** 0.5
            use_ms = (t_back is not None) and (prev_t >= 0)
            if use_ms:
                h_last = lam(ap) - lam(abar[t_back])
                r = h_last / h
                m3 = 1 + 1 / (2 * r)
                m4 = 1 / (2 * r)
            else:
                # second-order coefficients unused (first/last step) — keep finite
                m3, m4 = 0.0, 0.0
            rows.append((t, ap, app, m1, m2, m3, m4, mn, use_ms, prev_t < 0))

        cols = list(zip(*rows))
        f32 = lambda c: jnp.asarray(np.array(c, dtype=np.float64), dtype=jnp.float32)
        return DPMStepCoeffs(
            timesteps=jnp.asarray(np.array(cols[0]), dtype=jnp.int32),
            alpha_prod_t=f32(cols[1]),
            alpha_prod_prev=f32(cols[2]),
            mult1=f32(cols[3]),
            mult2=f32(cols[4]),
            mult3=f32(cols[5]),
            mult4=f32(cols[6]),
            mult_noise=f32(cols[7]),
            use_multistep=jnp.asarray(np.array(cols[8]), dtype=bool),
            null_noise=jnp.asarray(np.array(cols[9]), dtype=bool),
        )

    def step(self, coeffs: DPMStepCoeffs, i, model_output: jnp.ndarray,
             old_pred_original_sample: jnp.ndarray, sample: jnp.ndarray,
             noise: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One DPM update at step position `i` (traced OK).

        `old_pred_original_sample` is the carry (pass zeros on the first step —
        it is ignored there via `use_multistep[0]=False`). `noise` is the SDE
        noise for this step (zeros → deterministic ODE variant).
        Returns (prev_sample, pred_original_sample); feed the returned x0 back
        in as `old_pred_original_sample` next step (reference pipeline does the
        same at pipeline_..._anyl.py:999-1011).
        """
        mo = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        old_x0 = old_pred_original_sample.astype(jnp.float32)
        ap = coeffs.alpha_prod_t[i]
        x0 = common.pred_original_sample(self.config.prediction_type, ap, x, mo)

        if noise is None:
            eps = jnp.zeros_like(x)
        else:
            eps = noise.astype(jnp.float32)

        denoised_d = coeffs.mult3[i] * x0 - coeffs.mult4[i] * old_x0
        target = jnp.where(coeffs.use_multistep[i], denoised_d, x0)
        prev = coeffs.mult1[i] * x - coeffs.mult2[i] * target + coeffs.mult_noise[i] * eps
        return prev.astype(sample.dtype), x0.astype(sample.dtype)

    def add_noise(self, original, noise, timesteps):
        return common.add_noise(jnp.asarray(self.alphas_cumprod), original, noise, timesteps)

    def get_velocity(self, sample, noise, timesteps):
        return common.get_velocity(jnp.asarray(self.alphas_cumprod), sample, noise, timesteps)

    def compute_pred_original_sample(self, model_output, sample, timestep):
        """Reference: scheduling_dpm_cogvideox.py:491-523 (used by replace_gt)."""
        ap = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timestep]
        return common.pred_original_sample(
            self.config.prediction_type, ap, sample.astype(jnp.float32),
            model_output.astype(jnp.float32)).astype(sample.dtype)

    def scale_model_input(self, sample, timestep=None):
        return sample

"""Scheduler parity tests vs the PyTorch reference goldens (tests/goldens/schedulers.npz)."""

import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import SchedulerConfig
from videopainter_tpu.schedulers import (
    CogVideoXDDIMScheduler,
    CogVideoXDPMScheduler,
    compute_alphas_cumprod,
    make_timesteps,
)

INFER = SchedulerConfig.cogvideox_5b_inference()


def test_alphas_cumprod_matches(goldens):
    g = goldens("schedulers")
    got = compute_alphas_cumprod(INFER)
    np.testing.assert_allclose(got, g["alphas_cumprod"], rtol=1e-12, atol=1e-12)
    got2 = compute_alphas_cumprod(SchedulerConfig(prediction_type="v_prediction"))
    np.testing.assert_allclose(got2, g["alphas_cumprod_nozero"], rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("spacing", ["linspace", "leading", "trailing"])
@pytest.mark.parametrize("steps", [50, 30])
def test_timestep_spacings(goldens, spacing, steps):
    g = goldens("schedulers")
    cfg = SchedulerConfig(timestep_spacing=spacing)
    np.testing.assert_array_equal(make_timesteps(cfg, steps), g[f"timesteps_{spacing}_{steps}"])


def test_ddim_trajectory(goldens):
    g = goldens("schedulers")
    sched = CogVideoXDDIMScheduler(INFER)
    coeffs = sched.precompute(10)
    np.testing.assert_array_equal(np.asarray(coeffs.timesteps), g["ddim_timesteps_10"])
    x = jnp.asarray(g["ddim_x0_in"], dtype=jnp.float32)
    for i in range(10):
        mo = jnp.asarray(g["ddim_model_outputs"][i], dtype=jnp.float32)
        x, _ = sched.step(coeffs, i, mo, x)
        np.testing.assert_allclose(np.asarray(x), g["ddim_trajectory"][i], rtol=2e-5, atol=2e-5)


def test_add_noise_get_velocity(goldens):
    g = goldens("schedulers")
    sched = CogVideoXDDIMScheduler(INFER)
    s = jnp.asarray(g["an_sample"])
    n = jnp.asarray(g["an_noise"])
    t = jnp.asarray(g["an_t"])
    np.testing.assert_allclose(np.asarray(sched.add_noise(s, n, t)), g["an_out"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.get_velocity(s, n, t)), g["gv_out"], rtol=1e-5, atol=1e-6)


def test_dpm_trajectory(goldens):
    g = goldens("schedulers")
    sched = CogVideoXDPMScheduler(INFER)
    coeffs = sched.precompute(10)
    np.testing.assert_array_equal(np.asarray(coeffs.timesteps), g["dpm_timesteps_10"])
    x = jnp.asarray(g["dpm_x_in"], dtype=jnp.float32)
    old_x0 = jnp.zeros_like(x)
    for i in range(10):
        mo = jnp.asarray(g["dpm_model_outputs"][i], dtype=jnp.float32)
        eps = jnp.asarray(g["dpm_noises"][i], dtype=jnp.float32)
        x, x0 = sched.step(coeffs, i, mo, old_x0, x, noise=eps)
        np.testing.assert_allclose(np.asarray(x0), g["dpm_x0s"][i], rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(x), g["dpm_trajectory"][i], rtol=3e-4, atol=3e-4)
        old_x0 = x0


def test_dpm_scan_compatible():
    """The whole DPM loop must compile as a single lax.scan."""
    import jax

    sched = CogVideoXDPMScheduler(INFER)
    coeffs = sched.precompute(10)
    x0_shape = (1, 2, 4, 4)

    def body(carry, i):
        x, old = carry
        mo = jnp.ones(x0_shape) * 0.1
        x, x0 = sched.step(coeffs, i, mo, old, x)
        return (x, x0), ()

    init = (jnp.ones(x0_shape), jnp.zeros(x0_shape))
    (xf, _), _ = jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(10)))(init)
    assert np.isfinite(np.asarray(xf)).all()

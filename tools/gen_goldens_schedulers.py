"""Generate scheduler golden files from the PyTorch reference fork.

Run offline (requires /root/reference to be mounted):
    python tools/gen_goldens_schedulers.py

Writes tests/goldens/schedulers.npz. The committed npz is the oracle for
tests/test_schedulers.py — tests never import the reference at runtime.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from diffusers.schedulers.scheduling_ddim_cogvideox import CogVideoXDDIMScheduler  # noqa: E402
from diffusers.schedulers.scheduling_dpm_cogvideox import CogVideoXDPMScheduler  # noqa: E402

OUT = "tests/goldens/schedulers.npz"


def main():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    out = {}

    kw = dict(prediction_type="v_prediction", rescale_betas_zero_snr=True,
              timestep_spacing="trailing", snr_shift_scale=3.0)

    # --- schedule constants -------------------------------------------------
    ddim = CogVideoXDDIMScheduler(**kw)
    out["alphas_cumprod"] = ddim.alphas_cumprod.numpy()
    ddim_noshift = CogVideoXDDIMScheduler(prediction_type="v_prediction")
    out["alphas_cumprod_nozero"] = ddim_noshift.alphas_cumprod.numpy()

    for spacing in ["linspace", "leading", "trailing"]:
        s = CogVideoXDDIMScheduler(timestep_spacing=spacing)
        s.set_timesteps(50)
        out[f"timesteps_{spacing}_50"] = s.timesteps.numpy()
        s.set_timesteps(30)
        out[f"timesteps_{spacing}_30"] = s.timesteps.numpy()

    # --- DDIM steps ---------------------------------------------------------
    ddim.set_timesteps(10)
    x = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float64)
    out["ddim_x0_in"] = x.numpy()
    mos = []
    xs = []
    for t in ddim.timesteps:
        mo = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float64)
        mos.append(mo.numpy())
        x, _ = ddim.step(mo, int(t), x, return_dict=False) if False else (
            ddim.step(mo, int(t), x).prev_sample, None)
        xs.append(x.numpy())
    out["ddim_model_outputs"] = np.stack(mos)
    out["ddim_trajectory"] = np.stack(xs)
    out["ddim_timesteps_10"] = ddim.timesteps.numpy()

    # --- add_noise / get_velocity ------------------------------------------
    sample = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float32)
    noise = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float32)
    tsteps = torch.tensor([10, 700])
    out["an_sample"] = sample.numpy()
    out["an_noise"] = noise.numpy()
    out["an_t"] = tsteps.numpy()
    out["an_out"] = ddim.add_noise(sample, noise, tsteps).numpy()
    out["gv_out"] = ddim.get_velocity(sample, noise, tsteps).numpy()

    # --- DPM steps (noise passed explicitly through the formulas) ----------
    dpm = CogVideoXDPMScheduler(**kw)
    dpm.set_timesteps(10)
    ts = dpm.timesteps
    out["dpm_timesteps_10"] = ts.numpy()
    x = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float64)
    out["dpm_x_in"] = x.numpy()
    old_x0 = None
    mos, epss, xs, x0s = [], [], [], []
    n_train = dpm.config.num_train_timesteps
    stride = n_train // 10
    for i, t in enumerate(ts):
        t = int(t)
        t_back = int(ts[i - 1]) if i > 0 else None
        mo = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float64)
        eps = torch.tensor(rng.randn(2, 3, 4, 4), dtype=torch.float64)
        mos.append(mo.numpy())
        epss.append(eps.numpy())
        # replicate reference step() math with explicit eps (the reference draws
        # its own randn; we reproduce the same formulas via its public helpers)
        prev_t = t - stride
        ap = dpm.alphas_cumprod[t]
        app = dpm.alphas_cumprod[prev_t] if prev_t >= 0 else dpm.final_alpha_cumprod
        ap_back = dpm.alphas_cumprod[t_back] if t_back is not None else None
        x0 = dpm.compute_pred_original_sample(mo, x, t)
        h, r, lamb, lamb_next = dpm.get_variables(ap, app, ap_back)
        mult = list(dpm.get_mult(h, r, ap, app, ap_back))
        mult_noise = (1 - app) ** 0.5 * (1 - (-2 * h).exp()) ** 0.5
        prev = mult[0] * x - mult[1] * x0 + mult_noise * eps
        if old_x0 is not None and prev_t >= 0:
            denoised_d = mult[2] * x0 - mult[3] * old_x0
            prev = mult[0] * x - mult[1] * denoised_d + mult_noise * eps
        x, old_x0 = prev, x0
        xs.append(x.numpy())
        x0s.append(x0.numpy())
    out["dpm_model_outputs"] = np.stack(mos)
    out["dpm_noises"] = np.stack(epss)
    out["dpm_trajectory"] = np.stack(xs)
    out["dpm_x0s"] = np.stack(x0s)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()

"""Golden for the trainer's loss fragment + mask latent resize.

Replays train/train_cogvideox_inpainting_i2v_video.py:1802-1811 (mask
F.interpolate, default nearest) and :1872-1891 (add_noise -> get_velocity ->
1/(1-abar) weighted MSE + masked inpainting term) with the vendored
diffusers CogVideoXDDIMScheduler on fixed tensors.

Run offline: python tools/gen_goldens_train_loss.py
Writes tests/goldens/train_loss.npz.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from diffusers import CogVideoXDDIMScheduler  # noqa: E402

OUT = "tests/goldens/train_loss.npz"


def main():
    rng = np.random.RandomState(0)
    scheduler = CogVideoXDDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", snr_shift_scale=3.0,
        rescale_betas_zero_snr=True, prediction_type="v_prediction")

    B, F, C, H, W = 2, 3, 16, 8, 12
    model_input = torch.tensor(rng.randn(B, F, C, H, W), dtype=torch.float32)
    model_output = torch.tensor(rng.randn(B, F, C, H, W), dtype=torch.float32)
    noise = torch.tensor(rng.randn(B, F, C, H, W), dtype=torch.float32)
    timesteps = torch.tensor([123, 877], dtype=torch.long)
    # latent-grid masks [B, F, 1, H, W] as the trainer applies them (:1888)
    masks = torch.tensor((rng.rand(B, F, 1, H, W) > 0.5).astype(np.float32))
    inpainting_loss_weight = 1.0

    # reference :1872 + :1879-1891 verbatim (BFCHW layout)
    noisy_video_latents = scheduler.add_noise(
        model_input.permute(0, 2, 1, 3, 4), noise.permute(0, 2, 1, 3, 4),
        timesteps).permute(0, 2, 1, 3, 4)
    # reference add_noise/get_velocity broadcast over [B, C, F, H, W]
    model_pred = scheduler.get_velocity(
        model_output.permute(0, 2, 1, 3, 4),
        noisy_video_latents.permute(0, 2, 1, 3, 4),
        timesteps).permute(0, 2, 1, 3, 4)
    alphas_cumprod = scheduler.alphas_cumprod
    weights = 1 / (1 - alphas_cumprod[timesteps])
    while len(weights.shape) < len(model_pred.shape):
        weights = weights.unsqueeze(-1)
    target = model_input
    loss = torch.mean((weights * (model_pred - target) ** 2).reshape(B, -1),
                      dim=1).mean()
    inpainting_loss = torch.mean(
        (weights * (model_pred * masks - target * masks) ** 2).reshape(B, -1),
        dim=1).mean()
    total = loss + inpainting_loss_weight * inpainting_loss

    # mask latent resize (:1802-1811): F.interpolate default nearest over
    # [B, 1, T, H, W] to ((T-1)//4+1, H//8, W//8)
    pix_masks = torch.tensor((rng.rand(B, 1, 9, 64, 96) > 0.5).astype(np.float32))
    lat_masks = torch.nn.functional.interpolate(
        pix_masks, size=((9 - 1) // 4 + 1, 64 // 8, 96 // 8))

    np.savez_compressed(
        OUT,
        model_input=model_input.numpy(), model_output=model_output.numpy(),
        noise=noise.numpy(), timesteps=timesteps.numpy(),
        masks=masks.numpy(),
        noisy_video_latents=noisy_video_latents.numpy(),
        model_pred=model_pred.numpy(),
        loss=loss.numpy(), inpainting_loss=inpainting_loss.numpy(),
        total=total.numpy(),
        pix_masks=pix_masks.numpy(), lat_masks=lat_masks.numpy())
    print(f"wrote {OUT}: loss={float(loss):.6f} inp={float(inpainting_loss):.6f}")


if __name__ == "__main__":
    main()

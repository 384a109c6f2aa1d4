"""Generate causal-3D-VAE golden files from the PyTorch reference fork.

Run offline:  python tools/gen_goldens_vae.py
Writes tests/goldens/vae.npz (tiny config, fp32).
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from diffusers.models.autoencoders.autoencoder_kl_cogvideox import (  # noqa: E402
    AutoencoderKLCogVideoX)

OUT = "tests/goldens/vae.npz"

TINY = dict(
    in_channels=3, out_channels=3,
    block_out_channels=(8, 8, 16, 16),
    latent_channels=4, layers_per_block=1, norm_num_groups=4,
    sample_height=64, sample_width=96,
)


def main():
    torch.manual_seed(0)
    rng = np.random.RandomState(7)
    out = {}

    vae = AutoencoderKLCogVideoX(**TINY)
    vae.eval()
    for k, v in vae.state_dict().items():
        out[f"sd::vae::{k}"] = v.detach().float().numpy()

    # ---- encode: 17 frames exercises the 2-batch conv-cache path ----------
    x = torch.tensor(rng.randn(1, 3, 17, 64, 96), dtype=torch.float32) * 0.5
    out["io::enc::x"] = x.numpy()
    with torch.no_grad():
        h = vae._encode(x)
    out["io::enc::moments"] = h.numpy()

    # single-frame encode
    x1 = torch.tensor(rng.randn(1, 3, 1, 64, 96), dtype=torch.float32) * 0.5
    out["io::enc1::x"] = x1.numpy()
    with torch.no_grad():
        h1 = vae._encode(x1)
    out["io::enc1::moments"] = h1.numpy()

    # ---- decode: 5 latent frames exercises the 2-batch path ----------------
    z = torch.tensor(rng.randn(1, 4, 5, 8, 12), dtype=torch.float32)
    out["io::dec::z"] = z.numpy()
    with torch.no_grad():
        y = vae.decode(z).sample
    out["io::dec::y"] = y.numpy()

    # single-latent-frame decode (duplication path :1180-1181)
    z1 = torch.tensor(rng.randn(1, 4, 1, 8, 12), dtype=torch.float32)
    out["io::dec1::z"] = z1.numpy()
    with torch.no_grad():
        y1 = vae.decode(z1).sample
    out["io::dec1::y"] = y1.numpy()

    # ---- tiled paths --------------------------------------------------------
    vae.enable_tiling(tile_sample_min_height=32, tile_sample_min_width=48)
    xt = torch.tensor(rng.randn(1, 3, 9, 64, 96), dtype=torch.float32) * 0.5
    out["io::tenc::x"] = xt.numpy()
    with torch.no_grad():
        ht = vae.tiled_encode(xt)
    out["io::tenc::moments"] = ht.numpy()

    zt = torch.tensor(rng.randn(1, 4, 3, 8, 12), dtype=torch.float32)
    out["io::tdec::z"] = zt.numpy()
    with torch.no_grad():
        yt = vae.tiled_decode(zt).sample
    out["io::tdec::y"] = yt.numpy()

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()

"""Sweep VAE tiled-decode configs on the chip: tile size x latent frame batch.

The default decode config mirrors the reference (240x360-px tiles, 2 latent
frames per batch — autoencoder_kl_cogvideox.py:1144-1158, :1279): 3x3 spatial
tiles whose overlaps recompute 2.25x the real pixel area. Larger tiles cut
that waste (2x2 at 320x480 px -> 1.78x) and larger frame batches amortize the
conv-cache threading, at the cost of per-program HBM. This sweep measures the
wall clock of each (tile, fbs) combo on the 13x60x90x16 flagship latent and
reports PSNR vs the default config (blending weights differ at tile seams, so
outputs are close but not bit-equal).

Usage: python tools/bench_vae_decode.py [--configs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def decode_once(vae, params, z):
    y = vae.decode(params, z)
    # force a fetch: block_until_ready does not block through the axon tunnel
    s = float(jnp.sum(y.astype(jnp.float32)))
    return y, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=13)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from videopainter_tpu.config import VAEConfig
    from videopainter_tpu.models import AutoencoderKLCogVideoX

    dtype = jnp.bfloat16
    z = jax.random.normal(jax.random.PRNGKey(4),
                          (1, args.frames, 60, 90, 16), dtype=dtype)

    # (name, tile_sample_h, tile_sample_w, fbs). None tile = default 240x360.
    combos = [
        ("default 240x360 fbs2", None, None, 2),
        ("240x360 fbs4", None, None, 4),
        ("320x480 fbs2", 320, 480, 2),
        ("320x480 fbs4", 320, 480, 4),
        ("480x360 fbs2", 480, 360, 2),
        ("240x360 fbs7", None, None, 7),
    ]

    ref = None
    results = []
    for name, th, tw, fbs in combos:
        vae = AutoencoderKLCogVideoX(VAEConfig())
        vae.enable_tiling(tile_sample_min_height=th, tile_sample_min_width=tw)
        vae.num_latent_frames_batch_size = fbs
        params = vae.init(jax.random.PRNGKey(3), dtype=dtype)
        try:
            y, _ = decode_once(vae, params, z)  # compile + run
            t0 = time.time()
            y, _ = decode_once(vae, params, z)
            dt = time.time() - t0
        except Exception as e:  # OOM / compile failure: record and move on
            results.append({"config": name, "error": str(e)[:200]})
            print(json.dumps(results[-1]), flush=True)
            del vae, params
            continue
        yf = np.asarray(y.astype(jnp.float32))
        if ref is None:
            ref = yf
            psnr = float("inf")
        else:
            # non-default tiles can overshoot the sample size (reference
            # tiled_decode quirk: no final crop, :1354-1356) — compare the
            # common top-left region
            h = min(yf.shape[2], ref.shape[2])
            w = min(yf.shape[3], ref.shape[3])
            mse = float(np.mean((yf[:, :, :h, :w] - ref[:, :, :h, :w]) ** 2))
            psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")
        results.append({"config": name, "decode_s": round(dt, 2),
                        "fps": round((4 * args.frames - 3) / dt, 1),
                        "psnr_vs_default": round(psnr, 1)})
        print(json.dumps(results[-1]), flush=True)
        del vae, params, y

    best = min((r for r in results if "decode_s" in r),
               key=lambda r: r["decode_s"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()

"""Flagship-dims quality gate for the int8 serving mode.

The int8 W8A8 + int8-QK-attention fast path is PSNR-gated in tests on tiny
models (tests/test_quantize.py). This tool closes the scale gap: it runs a
short denoise trajectory on the TRUE 42-layer model at production dims
(d=3072, 48 heads, 17,776-token joint sequence) in bf16 and in the int8
serving config, and reports latent-space agreement (PSNR over the latent
value range + cosine). Run on the chip; both trajectories see identical
params, inputs, and CFG arithmetic — only the quantization differs.

Usage: python tools/gate_int8_flagship.py [--steps 5] [--layers 42]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--pv", action="store_true",
                    help="gate the int8pv mode (int8 P·V on top of int8-QK^T)")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from videopainter_tpu.config import BranchConfig, TransformerConfig
    from videopainter_tpu.models import CogVideoXBranch, CogVideoXTransformer3D
    from videopainter_tpu.pipelines.common import prepare_rope

    cfg = TransformerConfig.cogvideox_5b_i2v(num_layers=args.layers)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    dtype = jnp.bfloat16

    @jax.jit
    def _build(k0, k1):  # one program: compact buffer assignment (CLAUDE.md)
        tp = transformer.init(k0, dtype=dtype)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=dtype)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    jax.block_until_ready(params)

    B, T_lat, H_lat, W_lat = 1, 13, 60, 90
    lat_shape = (B, T_lat, H_lat, W_lat, 16)
    gen = jax.jit(lambda k, s=lat_shape: jax.random.normal(k, s, dtype=dtype))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    latents0, masked = gen(keys[0]), gen(keys[1])
    image_latents = jnp.zeros(lat_shape, dtype)
    mask = (jax.random.uniform(keys[2], (B, T_lat, H_lat, W_lat)) > 0.5).astype(dtype)
    embeds = jax.random.normal(keys[3], (2 * B, 226, 4096), dtype=dtype)
    rope = prepare_rope(cfg, H_lat * 8, W_lat * 8, T_lat, 8)
    rope = (rope[0].astype(dtype), rope[1].astype(dtype))

    def make_forward(use_flash):
        def forward_one(params, latents, embeds_b, ts):
            model_in = jnp.concatenate([latents, image_latents], axis=-1)
            cond = jnp.concatenate([masked, mask[..., None]], axis=-1)
            samples = branch.apply(params["branch"], latents, embeds_b, cond,
                                   ts, rope=rope, use_flash=use_flash)
            out = transformer.apply(params["transformer"], model_in, embeds_b,
                                    ts, rope=rope, branch_block_samples=samples,
                                    branch_block_masks=mask,
                                    use_flash=use_flash)
            return out.sample
        return forward_one

    def combine(latents, u, c):
        pred = u.astype(jnp.float32) + 6.0 * (c - u).astype(jnp.float32)
        return (latents.astype(jnp.float32) * 0.99 - 0.01 * pred).astype(dtype)

    def run_traj(params, use_flash):
        # sequential CFG (two B=1 passes) so the bf16 42L trajectory fits;
        # arithmetic identical to batched CFG (tests/test_pipelines.py)
        fwd = jax.jit(lambda p, l, e, ts: make_forward(use_flash)(p, l, e, ts))
        comb = jax.jit(combine)
        lat = latents0
        for i in range(args.steps):
            ts = jnp.broadcast_to(jnp.asarray(500 - i), (B,))
            u = fwd(params, lat, embeds[:B], ts)
            c = fwd(params, lat, embeds[B:], ts)
            lat = comb(lat, u, c)
            float(jnp.sum(lat.astype(jnp.float32)))  # sync (axon)
        return np.asarray(lat.astype(jnp.float32))

    t0 = time.time()
    ref = run_traj(params, use_flash=True)

    from videopainter_tpu.quantize import quantize_transformer_int8

    params = {k: quantize_transformer_int8(v, free_source=True)
              for k, v in params.items()}
    gc.collect()
    got = run_traj(params, use_flash="int8pv" if args.pv else "int8")

    rng_val = float(ref.max() - ref.min())
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(rng_val ** 2 / mse) if mse else float("inf")
    cos = float((ref * got).sum() /
                (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    print(json.dumps({
        "gate": ("int8+int8pv-attn vs bf16, 42L flagship dims" if args.pv
                 else "int8+int8attn vs bf16, 42L flagship dims"),
        "steps": args.steps, "layers": args.layers,
        "latent_psnr_db": round(psnr, 2), "cosine": round(cos, 6),
        "rel_l1": round(float(np.abs(got - ref).mean() /
                              (np.abs(ref).mean() + 1e-12)), 5),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()

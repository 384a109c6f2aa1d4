"""Flagship-dims quality gate for the step-skip cache serving mode.

Step-skip caching (DenoiseConfig.skip_steps) reuses the previous step's
pre-CFG model output at scheduled steps — each skipped step removes a full
42-layer transformer+branch evaluation (~7.4 s at flagship dims) from the
clip. Unlike the int8 gate's per-step forward comparison, skipping interacts
with the REAL scheduler dynamics (DPM x0 carry, dynamic CFG, replace_gt
re-noising), so this gate runs the actual fused denoise scan
(pipelines.common.make_denoise_fn) end to end:

 1. bf16, all 50 steps           -> the reference trajectory
 2. int8+static-ascale, 50 steps -> the current serving headline, now gated
                                    under the real scheduler too
 3. int8+static-ascale + skip    -> the candidate rung, one run per schedule

Reported per schedule: latent PSNR vs (1) and vs (2), plus a decoded-pixel
PSNR/SSIM leg for the first schedule (reference eval protocol measures
pixels, /root/reference/evaluate/eval_inpainting.py:400-448). bench.py
headlines a skip rung only if its latent AND pixel PSNR vs the bf16
trajectory clear >=35 dB (GATE_skip.json, same bar as GATE_int8.json).

Weights are random (no public checkpoints in this environment): the gate
measures skip-error propagation through the real 42L arithmetic + scheduler,
not perceptual quality on real content.

Usage:
  python tools/gate_skip_flagship.py                      # schedules 10:46:2
  python tools/gate_skip_flagship.py --schedules 10:46:2 12:44:2
  python tools/gate_skip_flagship.py --smoke              # CPU plumbing test
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
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--schedules", nargs="+", default=["10:46:2"],
                    help='skip schedules "start:end:stride" (see '
                         "pipelines.common.parse_skip_steps)")
    ap.add_argument("--scales", default="calib_ascales.npz",
                    help="calibrated static activation scales ('' = dynamic "
                         "int8)")
    ap.add_argument("--bf16", action="store_true",
                    help="gate skip on the bf16 path instead of int8 (no "
                         "quantization error in the stack)")
    ap.add_argument("--ref-cache", default=None,
                    help="npz path caching the bf16-full and serving-full "
                         "final latents. The gate is DETERMINISTIC (fixed "
                         "keys), so a cached reference is bit-identical to "
                         "a recompute — reruns then only pay for the new "
                         "skip schedules (~5 min each), not the ~26 min "
                         "bf16 trajectory.")
    ap.add_argument("--out", default="GATE_skip.json")
    ap.add_argument("--smoke", action="store_true",
                    help="plumbing dry-run: tiny dims, 2 layers, CPU, no "
                         "Pallas, 6 steps")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.layers, args.steps = 2, 6
        args.schedules = ["2:6:2"]

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig)
    from videopainter_tpu.models import CogVideoXBranch, CogVideoXTransformer3D
    from videopainter_tpu.pipelines.common import (DenoiseConfig,
                                                   DenoiseInputs,
                                                   make_denoise_fn,
                                                   parse_skip_steps,
                                                   prepare_rope)
    from videopainter_tpu.schedulers import CogVideoXDPMScheduler

    B, T_lat, H_lat, W_lat = (1, 3, 8, 12) if args.smoke else (1, 13, 60, 90)
    dim_kw = (dict(sample_height=H_lat, sample_width=W_lat,
                   sample_frames=(T_lat - 1) * 4 + 1, max_text_seq_length=226)
              if args.smoke else {})
    cfg = TransformerConfig.cogvideox_5b_i2v(num_layers=args.layers, **dim_kw)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    dtype = jnp.bfloat16

    @jax.jit
    def _build(k0, k1, pos):  # one program: compact buffer assignment (42L
        # heap-fragmentation lesson); pos table as ARG (axon 413 limit)
        tp = transformer.init(k0, dtype=dtype, pos_embedding=pos)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=dtype)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                    transformer.host_pos_embedding())
    jax.block_until_ready(params)

    lat_shape = (B, T_lat, H_lat, W_lat, 16)
    gen = jax.jit(lambda k, s=lat_shape: jax.random.normal(k, s, dtype=dtype))
    keys = jax.random.split(jax.random.PRNGKey(2), 5)
    # production-like ~25%-area rectangular hole
    m = np.zeros((B, T_lat, H_lat, W_lat), np.float32)
    if args.smoke:
        m[:, :, 2:6, 3:9] = 1.0
    else:
        m[:, :, 15:45, 22:68] = 1.0
    inputs = DenoiseInputs(
        latents=gen(keys[0]),
        image_latents=jnp.zeros(lat_shape, dtype),
        masked_video_latents=gen(keys[1]),
        mask=jnp.asarray(m, dtype),
        prompt_embeds=jax.random.normal(keys[2], (2 * B, 226, 4096),
                                        dtype=dtype),
        noise=gen(keys[3]),
        video_latents=gen(keys[4]),   # replace_gt re-noises the "clean" GT
    )
    rope = prepare_rope(cfg, H_lat * 8, W_lat * 8, T_lat, 8)
    rope = (rope[0].astype(dtype), rope[1].astype(dtype))

    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    timesteps = sched.timesteps(args.steps)

    def run(params, use_flash, skip=None):
        # the serving path: sequential CFG + chunked dispatch (axon kills
        # long device programs), dynamic CFG 6.0, DPM, replace_gt blending
        dcfg = DenoiseConfig(
            num_inference_steps=args.steps, do_cfg=True, use_dynamic_cfg=True,
            guidance_scale=6.0, conditioning_scale=1.0, replace_gt=True,
            mask_add=True, mask_background=False, add_first=False,
            wo_text=False, id_pool_resample=False, is_dpm=True,
            use_flash=use_flash, sequential_cfg=not args.smoke,
            scan_chunk=0 if args.smoke else 5, mode="dual",
            skip_steps=skip)
        fn = make_denoise_fn(transformer, branch, sched, dcfg, timesteps)
        if args.smoke:
            fn = jax.jit(fn)
        t0 = time.time()
        lat, _, _ = fn(params, inputs, rope, jax.random.PRNGKey(7))
        out = np.asarray(lat.astype(jnp.float32))
        return out, round(time.time() - t0, 1)

    def psnr(a, b):
        rng_v = float(b.max() - b.min())
        mse = float(np.mean((a - b) ** 2))
        return round(10 * np.log10(rng_v**2 / mse), 2) if mse else float("inf")

    def _cache_meta():
        return np.asarray([args.layers, args.steps, T_lat, H_lat, W_lat])

    use_flash_ref = False if args.smoke else True
    ref = None
    if args.ref_cache and os.path.exists(args.ref_cache):
        z = np.load(args.ref_cache)
        if np.array_equal(z["meta"], _cache_meta()):
            ref, t_bf16 = z["ref"], float(z["t_bf16"])
            print(f"loaded bf16 reference from {args.ref_cache}")
    if ref is None:
        ref, t_bf16 = run(params, use_flash_ref)

    mode = "bf16"
    if not args.bf16 and not args.smoke:
        from videopainter_tpu.quantize import quantize_transformer_int8

        params = {k: quantize_transformer_int8(v, free_source=True)
                  for k, v in params.items()}
        gc.collect()
        mode = "int8"
        if args.scales and os.path.exists(args.scales):
            from videopainter_tpu.quantize import (attach_static_ascale,
                                                   load_ascales)

            scales = load_ascales(args.scales)
            params = {k: attach_static_ascale(v, scales[k])
                      if k in scales else v for k, v in params.items()}
            mode = "int8+ascale"
    use_flash_serv = use_flash_ref if (args.smoke or args.bf16) else "int8"

    serv = None
    if args.ref_cache and os.path.exists(args.ref_cache):
        z = np.load(args.ref_cache)
        if np.array_equal(z["meta"], _cache_meta()) and "serv" in z \
                and str(z["serv_mode"]) == mode:
            serv, t_serv = z["serv"], float(z["t_serv"])
            print(f"loaded {mode} serving-full from {args.ref_cache}")
    if serv is None:
        serv, t_serv = run(params, use_flash_serv)
    if args.ref_cache:
        np.savez(args.ref_cache, meta=_cache_meta(), ref=ref, t_bf16=t_bf16,
                 serv=serv, t_serv=t_serv, serv_mode=mode)
    result = {
        "gate": f"step-skip cache on the {mode} serving path vs bf16 full-"
                f"step trajectory, {args.layers}L flagship dims, REAL "
                "denoise scan (DPM + dynamic CFG 6.0 + replace_gt, "
                "sequential CFG)",
        "steps": args.steps, "layers": args.layers,
        "weights": "random init (no public ckpt in env) — measures skip-"
                   "error propagation through the real 42L arithmetic + "
                   "scheduler dynamics",
        "serving_mode": mode,
        "serving_full_latent_psnr_vs_bf16_db": psnr(serv, ref),
        "traj_wall_s": {"bf16_full": t_bf16, "serving_full": t_serv},
        "schedules": {},
    }
    print(json.dumps({k: v for k, v in result.items() if k != "schedules"}),
          flush=True)

    finals = {}
    for spec in args.schedules:
        skip = parse_skip_steps(spec, args.steps)
        got, t_skip = run(params, use_flash_serv, skip=skip)
        entry = {
            "skipped_steps": len(skip),
            "evaluated_steps": args.steps - len(skip),
            "latent_psnr_vs_bf16_db": psnr(got, ref),
            "latent_psnr_vs_serving_full_db": psnr(got, serv),
            "traj_wall_s": t_skip,
        }
        result["schedules"][spec] = entry
        print(json.dumps({spec: entry}), flush=True)
        finals[spec] = got

    # decoded-pixel leg, PER SCHEDULE: the reference eval protocol is pixels
    # through the tiled VAE; bench headlines the most-skipped schedule whose
    # latent AND pixel PSNR both clear the bar
    del params
    gc.collect()
    from videopainter_tpu.config import VAEConfig
    from videopainter_tpu.evaluate.metrics import psnr as psnr_np
    from videopainter_tpu.evaluate.metrics import ssim as ssim_np
    from videopainter_tpu.models import AutoencoderKLCogVideoX

    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16)
                                 if args.smoke else VAEConfig())
    vae.enable_tiling()
    vparams = jax.jit(lambda k: vae.init(k, dtype=dtype))(jax.random.PRNGKey(3))
    jax.block_until_ready(vparams)
    sf = vae.cfg.scaling_factor

    def decode(lat_np):
        z = jnp.asarray(lat_np).astype(dtype) / sf
        y = vae.decode(vparams, z)
        return np.asarray(jnp.clip(y, -1, 1).astype(jnp.float32)) / 2 + 0.5

    px_ref = decode(ref)
    for spec, got in finals.items():
        px_got = decode(got)
        ssims = [ssim_np(px_got[0, t], px_ref[0, t], data_range=1.0)
                 for t in range(px_ref.shape[1])]
        result["schedules"][spec]["pixel_psnr_db"] = round(
            float(psnr_np(px_got, px_ref, data_range=1.0)), 2)
        result["schedules"][spec]["pixel_ssim"] = round(
            float(np.mean(ssims)), 5)
    result["pixel_note"] = ("per-schedule final latents vs the bf16 "
                            "full-step final, all through the tiled VAE "
                            "decode")
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

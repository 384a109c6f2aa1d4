"""On-chip end-to-end smoke of the flagship any-length inpainting path.

Runs the COMPLETE production inference path — VAE encode, sliding-window
50-step dual-stream denoise (branch + 42-layer backbone, CFG, dynamic
guidance, replace_gt), cross-window state, VAE decode — at flagship dims
(480x720, 49-frame windows) on ONE v5e chip, with the opt-in int8 W8A8
block projections (the bf16 DiT + VAE cannot coexist in 16 GB; int8 is the
single-chip deployment mode — see CLAUDE.md).

Random weights (this box has no converted checkpoints); the value is proving
the full pipeline compiles, fits, and runs at production shapes, and timing
its phases. Reference path being mirrored: infer/inpaint.py:410-453 driving
pipeline_cogvideox_inpainting_i2v_branch_anyl.py:158-1082.

Usage: python tools/smoke_chip_anyl.py [--frames 73] [--stride 24]
       [--steps 50] [--bf16] [--resample]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=73)
    ap.add_argument("--stride", type=int, default=24)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--bf16", action="store_true",
                    help="skip int8 quantization (needs >16 GB HBM at 42L)")
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--resample", action="store_true",
                    help="VideoPainterID mode: cross-window ID resampling + "
                         "prev-clip blend (stores 42 x [S,3072] hidden states "
                         "between windows - tightest memory config)")
    ap.add_argument("--stream-decode", action="store_true", default=False,
                    help="per-window streaming decode - needs a second chip "
                         "(vae_device) worth of HBM for the per-tile conv "
                         "caches; the single-chip config decodes one-shot")
    ap.add_argument("--int8_attn", action="store_true",
                    help="SageAttention-style int8-QK^T flash attention "
                         "(the full production fast mode)")
    ap.add_argument("--scales", default=None,
                    help="calibrated static activation scales .npz "
                         "(calib_ascales.npz) — the int8+ascale headline "
                         "serving config (quantize.attach_static_ascale)")
    ap.add_argument("--skip_steps", default=None,
                    help='step-skip cache schedule "start:end:stride" '
                         "(gated via GATE_skip.json; the anyl capture step "
                         "always evaluates fully)")
    ap.add_argument("--capture_int8", action="store_true",
                    help="store the compressed cross-window capture as "
                         "per-token int8 (+scales) — halves it again; "
                         "headroom for larger masks on one chip")
    ap.add_argument("--compare-full", action="store_true",
                    help="run the pipeline TWICE — with --skip_steps and "
                         "without — same rng/noise, and report pixel PSNR "
                         "between the outputs: the skip x cross-window-"
                         "capture interaction leg, written to "
                         "ANYL_SKIP.json (merged into GATE_skip.json by "
                         "tools/gate_skip_flagship.py)")
    args = ap.parse_args()
    if args.compare_full and not args.skip_steps:
        ap.error("--compare-full requires --skip_steps")

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline
    from videopainter_tpu.pipelines.common import parse_skip_steps
    from videopainter_tpu.schedulers import CogVideoXDPMScheduler

    dtype = jnp.bfloat16
    # --resample mirrors the VideoPainterID deployment: the ID-LoRA model is
    # BUILT with id_pool_resample_learnable=True (reference subtlety — the
    # processor is chosen at block construction, cogvideox_transformer_3d.py:
    # 98-99). This also enables the compressed cross-window capture (masked
    # tokens only, bit-exact), which is what lets flagship ID anyl fit ONE
    # chip at all: the full [42, 2B, S, D] capture alone is 8.5 GiB.
    cfg = TransformerConfig.cogvideox_5b_i2v(
        num_layers=args.layers, id_pool_resample_learnable=args.resample)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(VAEConfig())
    # single-chip: the DiT stays resident during decode, so shrink the
    # decoder working set — 1-latent-frame batches halve the per-program
    # temp arena (group-norm f32 temps dominate; see CLAUDE.md). Tile dims
    # stay at the reference 240x360: non-multiple-of-8 tiles break the
    # latent-grid arithmetic.
    vae.enable_tiling()
    vae.num_latent_frames_batch_size = 1
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())

    t0 = time.time()

    # one jitted init program -> compactly laid-out params (CLAUDE.md)
    @jax.jit
    def _build(k0, k1):
        tp = transformer.init(k0, dtype=dtype)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=dtype)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    jax.block_until_ready(params)
    params["vae"] = vae.init(jax.random.PRNGKey(2), dtype=dtype)
    print(f"init: {time.time()-t0:.1f}s, "
          f"{sum(x.nbytes for x in jax.tree.leaves(params))/2**30:.2f} GiB")

    if not args.bf16:
        from videopainter_tpu.quantize import quantize_transformer_int8
        from videopainter_tpu.utils import compact_params

        t0 = time.time()
        params["transformer"] = quantize_transformer_int8(
            params["transformer"], free_source=True)
        params["branch"] = quantize_transformer_int8(
            params["branch"], free_source=True)
        jax.block_until_ready((params["transformer"], params["branch"]))
        # free_source quantization drops int8 leaves into the holes left by
        # the freed bf16 kernels and checkerboards the heap; the denoise
        # scan's multi-GiB contiguous temp arena then can't be placed
        # (RESOURCE_EXHAUSTED at the first window even though total free HBM
        # is ample). Re-materialize the tree through one jitted copy program
        # so it occupies one dense region (utils/memory.py).
        params = compact_params(params)
        print(f"int8 quantize: {time.time()-t0:.1f}s, "
              f"{sum(x.nbytes for x in jax.tree.leaves(params))/2**30:.2f} GiB")
        if args.scales:
            from videopainter_tpu.quantize import (attach_static_ascale,
                                                   load_ascales)

            scales = load_ascales(args.scales)
            params = {k: attach_static_ascale(v, scales[k])
                      if k in scales else v for k, v in params.items()}
            print(f"attached static ascales from {args.scales}")

    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)

    B, T, H, W = 1, args.frames, 480, 720
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1,
                        dtype)
    masks = np.zeros((B, T, H, W), np.float32)
    masks[:, :, 120:360, 180:540] = 1.0
    embeds = jax.random.normal(jax.random.PRNGKey(3), (B, 226, 4096), dtype)

    # NOTE: no progress_fn here — it rides jax.debug.callback, and the axon
    # PJRT tunnel does not support host callbacks (UNIMPLEMENTED).
    def run(skip_spec):
        t0 = time.time()
        out = pipe(
            params, video=video, masks=jnp.asarray(masks), image=video[:, 0],
            num_frames=49, stride=args.stride,
            prompt_embeds=embeds,
            negative_prompt_embeds=jnp.zeros_like(embeds),
            num_inference_steps=args.steps, guidance_scale=6.0,
            use_dynamic_cfg=True, replace_gt=True, mask_add=True,
            id_pool_resample=args.resample, sequential_cfg=True,
            capture_int8=args.capture_int8,
            prev_clip_weight=0.3 if args.resample else 0.0,
            rng=jax.random.PRNGKey(42),
            use_flash=("int8" if args.int8_attn else True),
            skip_steps=(parse_skip_steps(skip_spec, args.steps)
                        if skip_spec else None),
            stream_decode=args.stream_decode, dtype=dtype)
        return np.asarray(out), time.time() - t0

    out, wall = run(args.skip_steps)
    n_windows = (T - 49) // args.stride + 1
    assert out.shape == (B, T, H, W, 3), out.shape
    assert np.isfinite(out).all()
    mode_str = (f"{'bf16' if args.bf16 else 'int8'}"
                f"{'+int8attn' if args.int8_attn else ''}"
                f"{'+resample' if args.resample else ''}"
                f"{'+skip' if args.skip_steps else ''}")
    print(f"E2E OK: {out.shape}, {n_windows} windows, {wall:.1f}s wall "
          f"({wall/n_windows:.1f}s/window incl. compile), mode={mode_str}")

    if args.compare_full:
        # identical rng -> identical noise/trajectory inputs; the ONLY
        # difference is the skip schedule, so the PSNR below isolates the
        # skip x cross-window capture/resample interaction on the REAL
        # product path (reference flagship: infer/inpaint.py:435-453)
        out_full, wall_full = run(None)
        a = (np.clip(out, -1, 1) + 1) / 2    # [0, 1] pixel space
        b = (np.clip(out_full, -1, 1) + 1) / 2
        mse = float(np.mean((a - b) ** 2))
        ps = 10 * np.log10(1.0 / mse) if mse else float("inf")
        import json

        rec = {
            "leg": "any-length skip-vs-full, same rng, same serving params "
                   f"({mode_str.replace('+skip', '')})",
            "frames": T, "windows": n_windows, "steps": args.steps,
            "skip_schedule": args.skip_steps,
            "skipped_steps": len(parse_skip_steps(args.skip_steps,
                                                  args.steps)),
            "pixel_psnr_skip_vs_full_db": round(ps, 2),
            "wall_s": {"skip": round(wall, 1), "full": round(wall_full, 1)},
            "note": "random weights; cross-window capture taken at the "
                    "final (always-evaluated) step of each window — this "
                    "leg checks the skip carry does not corrupt the "
                    "window handoff at production dims on one chip",
        }
        path = os.path.join(os.path.dirname(__file__), "..",
                            "ANYL_SKIP.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
        print(json.dumps(rec))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Flagship-dims quality gate for the int8 serving mode.

The int8 W8A8 + int8-QK-attention fast path is PSNR-gated in tests on tiny
models (tests/test_quantize.py). This tool closes the scale gap on the TRUE
42-layer model at production dims (d=3072, 48 heads, 17,776-token joint
sequence):

Quick mode (default, 5 steps): latent-space PSNR/cosine between the bf16 and
int8 trajectories (identical params/inputs/CFG arithmetic; only quantization
differs).

Deep mode (--deep, writes GATE_int8.json):
 (a) the FULL 50-step trajectory, not 5;
 (b) decoded-PIXEL PSNR/SSIM — both final latents through the tiled VAE
     decode (the reference eval protocol measures pixels,
     /root/reference/evaluate/eval_inpainting.py:400-448);
 (c) the capture-int8 cross-window path: round-trip error of the per-token
     int8 compressed capture AND its propagation through a window-1-style
     ID-resample forward vs the bf16 capture.

Weights are random (no public checkpoints ship in this environment): the gate
measures quantization-error PROPAGATION through the real 42L arithmetic, not
perceptual quality on real content.

Usage: python tools/gate_int8_flagship.py [--steps 5] [--layers 42]
       python tools/gate_int8_flagship.py --deep [--out GATE_int8.json]
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
    ap.add_argument("--deep", action="store_true",
                    help="full 50-step trajectory + decoded-pixel PSNR/SSIM + "
                         "capture-int8 legs; writes --out")
    ap.add_argument("--ascale", action="store_true",
                    help="also gate STATIC calibrated activation scales "
                         "(quantize.calibrate_ascales): calibrate during the "
                         "dynamic int8 trajectory, rerun it static, report "
                         "latent PSNR vs bf16 and vs dynamic int8")
    ap.add_argument("--ascale-margin", type=float, default=1.0,
                    help="headroom multiplier on calibrated scales")
    ap.add_argument("--save-scales", default=None,
                    help="with --ascale: write the calibrated scales to this "
                         ".npz (consumed by infer --int8_scales)")
    ap.add_argument("--out", default="GATE_int8.json")
    ap.add_argument("--smoke", action="store_true",
                    help="plumbing dry-run: tiny spatial dims, 2 layers, "
                         "no Pallas (CPU-safe), 2 steps")
    args = ap.parse_args()
    if args.deep and args.steps == 5:
        args.steps = 50
    if args.smoke:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        args.layers, args.steps = 2, 2

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from videopainter_tpu.config import BranchConfig, TransformerConfig
    from videopainter_tpu.models import CogVideoXBranch, CogVideoXTransformer3D
    from videopainter_tpu.pipelines.common import (capture_token_indices,
                                                   prepare_rope)

    B, T_lat, H_lat, W_lat = (1, 3, 8, 12) if args.smoke else (1, 13, 60, 90)
    dim_kw = (dict(sample_height=H_lat, sample_width=W_lat,
                   sample_frames=(T_lat - 1) * 4 + 1, max_text_seq_length=226)
              if args.smoke else {})
    cfg = TransformerConfig.cogvideox_5b_i2v(
        num_layers=args.layers, id_pool_resample_learnable=args.deep, **dim_kw)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    dtype = jnp.bfloat16

    @jax.jit
    def _build(k0, k1, pos):  # one program: compact buffer assignment; pos
        # table as ARG, not constant (axon remote-compile 413 — CLAUDE.md)
        tp = transformer.init(k0, dtype=dtype, pos_embedding=pos)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=dtype)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                    transformer.host_pos_embedding())
    jax.block_until_ready(params)

    lat_shape = (B, T_lat, H_lat, W_lat, 16)
    gen = jax.jit(lambda k, s=lat_shape: jax.random.normal(k, s, dtype=dtype))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    latents0, masked = gen(keys[0]), gen(keys[1])
    image_latents = jnp.zeros(lat_shape, dtype)
    if args.deep:
        # production-like ~25%-area rectangular hole (the compressed-capture
        # sizing CLAUDE.md documents); the random 50% mask would double the
        # captured-state footprint for no extra signal
        m = np.zeros((B, T_lat, H_lat, W_lat), np.float32)
        if args.smoke:
            m[:, :, 2:6, 3:9] = 1.0
        else:
            m[:, :, 15:45, 22:68] = 1.0
        mask = jnp.asarray(m, dtype)
    else:
        mask = (jax.random.uniform(keys[2], (B, T_lat, H_lat, W_lat)) > 0.5).astype(dtype)
    embeds = jax.random.normal(keys[3], (2 * B, 226, 4096), dtype=dtype)
    rope = prepare_rope(cfg, H_lat * 8, W_lat * 8, T_lat, 8)
    rope = (rope[0].astype(dtype), rope[1].astype(dtype))

    def make_forward(use_flash, **extra):
        def forward_one(params, latents, embeds_b, ts, **dyn):
            model_in = jnp.concatenate([latents, image_latents], axis=-1)
            cond = jnp.concatenate([masked, mask[..., None]], axis=-1)
            samples = branch.apply(params["branch"], latents, embeds_b, cond,
                                   ts, rope=rope, use_flash=use_flash)
            out = transformer.apply(params["transformer"], model_in, embeds_b,
                                    ts, rope=rope, branch_block_samples=samples,
                                    branch_block_masks=mask,
                                    use_flash=use_flash, **extra, **dyn)
            return out
        return forward_one

    def combine(latents, u, c):
        pred = u.astype(jnp.float32) + 6.0 * (c - u).astype(jnp.float32)
        return (latents.astype(jnp.float32) * 0.99 - 0.01 * pred).astype(dtype)

    def run_traj(params, use_flash):
        # sequential CFG (two B=1 passes) so the bf16 42L trajectory fits;
        # arithmetic identical to batched CFG (tests/test_pipelines.py)
        fn = make_forward(use_flash)
        fwd = jax.jit(lambda p, l, e, ts: fn(p, l, e, ts).sample)
        comb = jax.jit(combine)
        lat = latents0
        for i in range(args.steps):
            ts = jnp.broadcast_to(jnp.asarray(500 - i), (B,))
            u = fwd(params, lat, embeds[:B], ts)
            c = fwd(params, lat, embeds[B:], ts)
            lat = comb(lat, u, c)
            float(jnp.sum(lat.astype(jnp.float32)))  # sync (axon)
        return np.asarray(lat.astype(jnp.float32))

    def run_traj_calibrated(params, use_flash):
        # dynamic-int8 trajectory that ALSO records per-layer per-site
        # activation amax — numerically identical to run_traj (the tap only
        # adds two [L, n_sites] outputs; the dynamic quantize is unchanged)
        def cal_forward(params, latents, embeds_b, ts):
            model_in = jnp.concatenate([latents, image_latents], axis=-1)
            cond = jnp.concatenate([masked, mask[..., None]], axis=-1)
            samples, am_b = branch.apply(params["branch"], latents, embeds_b,
                                         cond, ts, rope=rope,
                                         use_flash=use_flash, calibrate=True)
            out = transformer.apply(params["transformer"], model_in, embeds_b,
                                    ts, rope=rope, branch_block_samples=samples,
                                    branch_block_masks=mask,
                                    use_flash=use_flash, calibrate=True)
            return out.sample, am_b, out.calib_amax

        fwd = jax.jit(cal_forward)
        comb = jax.jit(combine)
        lat = latents0
        am_b_acc = am_t_acc = None
        for i in range(args.steps):
            ts = jnp.broadcast_to(jnp.asarray(500 - i), (B,))
            u, ab1, at1 = fwd(params, lat, embeds[:B], ts)
            c, ab2, at2 = fwd(params, lat, embeds[B:], ts)
            lat = comb(lat, u, c)
            float(jnp.sum(lat.astype(jnp.float32)))  # sync (axon)
            ab = np.maximum(np.asarray(ab1, np.float32),
                            np.asarray(ab2, np.float32))
            at = np.maximum(np.asarray(at1, np.float32),
                            np.asarray(at2, np.float32))
            am_b_acc = ab if am_b_acc is None else np.maximum(am_b_acc, ab)
            am_t_acc = at if am_t_acc is None else np.maximum(am_t_acc, at)
        return np.asarray(lat.astype(jnp.float32)), am_b_acc, am_t_acc

    use_flash_ref = False if args.smoke else True
    t0 = time.time()
    ref = run_traj(params, use_flash=use_flash_ref)
    t_bf16 = time.time() - t0

    from videopainter_tpu.quantize import quantize_transformer_int8

    params = {k: quantize_transformer_int8(v, free_source=True)
              for k, v in params.items()}
    gc.collect()
    int8_flash = (False if args.smoke else
                  ("int8pv" if args.pv else "int8"))
    am_b = am_t = None
    t0 = time.time()
    if args.ascale:
        got, am_b, am_t = run_traj_calibrated(params, use_flash=int8_flash)
    else:
        got = run_traj(params, use_flash=int8_flash)
    t_int8 = time.time() - t0

    rng_val = float(ref.max() - ref.min())
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(rng_val ** 2 / mse) if mse else float("inf")
    cos = float((ref * got).sum() /
                (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    result = {
        "gate": ("int8+int8pv-attn vs bf16, 42L flagship dims" if args.pv
                 else "int8+int8attn vs bf16, 42L flagship dims"),
        "steps": args.steps, "layers": args.layers,
        "weights": "random init (no public ckpt in env) — measures "
                   "quantization-error propagation through the real 42L "
                   "arithmetic",
        "latent": {"psnr_db": round(psnr, 2), "cosine": round(cos, 6),
                   "rel_l1": round(float(np.abs(got - ref).mean() /
                                         (np.abs(ref).mean() + 1e-12)), 5)},
        "traj_wall_s": {"bf16": round(t_bf16, 1), "int8": round(t_int8, 1)},
    }

    if args.ascale:
        # ---- static calibrated activation scales: rerun the trajectory with
        # the per-token quantize reduce replaced by the calibrated constants
        from videopainter_tpu.quantize import (ascale_site_order,
                                               attach_static_ascale)

        def to_scales(tree, acc):
            sites = ascale_site_order(tree["blocks"])
            assert acc.shape[1] == len(sites), (acc.shape, sites)
            return {n: acc[:, i] * (args.ascale_margin / 127.0)
                    for i, n in enumerate(sites)}

        scales = {"transformer": to_scales(params["transformer"], am_t),
                  "branch": to_scales(params["branch"], am_b)}
        if args.save_scales:
            from videopainter_tpu.quantize import save_ascales

            save_ascales(args.save_scales, scales, provenance={
                "tool": "tools/gate_int8_flagship.py",
                "argv": sys.argv[1:],
                "layers": args.layers,
                "steps": args.steps,
                "margin": args.ascale_margin,
                "calibration": "full dynamic-int8 CFG trajectory (both "
                               "branches, every denoise step) via the "
                               "in-scan amax tap; random-init weights "
                               "(no public ckpt in env)",
                "dims": f"B={B} T={T_lat} H={H_lat} W={W_lat} "
                        f"joint_seq={cfg.max_text_seq_length}+video",
            })
            print(f"wrote calibrated scales -> {args.save_scales}")
        sparams = {
            "transformer": attach_static_ascale(
                params["transformer"], scales["transformer"]),
            "branch": attach_static_ascale(
                params["branch"], scales["branch"]),
        }
        t0s = time.time()
        got_sta = run_traj(sparams, use_flash=int8_flash)
        t_sta = time.time() - t0s
        del sparams
        gc.collect()

        def _psnr(a, b):
            rng_v = float(b.max() - b.min())
            m = float(np.mean((a - b) ** 2))
            return 10 * np.log10(rng_v ** 2 / m) if m else float("inf")

        result["static_ascale"] = {
            "margin": args.ascale_margin,
            "latent_psnr_vs_bf16_db": round(_psnr(got_sta, ref), 2),
            "latent_psnr_vs_dynamic_int8_db": round(_psnr(got_sta, got), 2),
            "traj_wall_s": round(t_sta, 1),
            "note": "scales calibrated over the full dynamic-int8 trajectory "
                    "(both CFG branches, every step) via the in-scan tap; "
                    "outliers clip at ±127 instead of per-token rescaling",
        }

    if not args.deep:
        print(json.dumps(result))
        return

    # ---- (c) capture-int8 legs, under the int8 serving params (the config
    # that actually produces/consumes captures in production) ---------------
    text_len = cfg.max_text_seq_length
    cap_idx = capture_token_indices(mask.astype(jnp.float32), cfg.patch_size,
                                    text_len)
    lat_dev = jnp.asarray(got.astype(np.float32)).astype(dtype)
    ts1 = jnp.broadcast_to(jnp.asarray(450), (B,))

    cap_fn = make_forward(int8_flash, return_hidden_states=True,
                          capture_indices=cap_idx)
    cap_bf16 = jax.jit(lambda p, l, e, ts: cap_fn(p, l, e, ts))(
        params, lat_dev, embeds[B:], ts1)
    hs_bf16 = cap_bf16.hidden_states_list
    resample_mask = cap_bf16.resample_mask
    jax.block_until_ready(hs_bf16)

    capq_fn = make_forward(int8_flash, return_hidden_states=True,
                           capture_indices=cap_idx, capture_quant=True)
    hs_int8 = jax.jit(lambda p, l, e, ts: capq_fn(p, l, e, ts)
                      .hidden_states_list)(params, lat_dev, embeds[B:], ts1)
    jax.block_until_ready(hs_int8)

    # round-trip error of the stored state (dequantize vs bf16 capture)
    deq = jax.jit(lambda d: (d["values"].astype(jnp.float32)
                             * d["scales"][..., None]))
    hs_deq = np.asarray(deq(hs_int8))
    hs_ref = np.asarray(hs_bf16.astype(jnp.float32))
    cap_rel_l1 = float(np.abs(hs_deq - hs_ref).mean() /
                       (np.abs(hs_ref).mean() + 1e-12))
    # fp64 accumulation: a float32 dot/norm over ~1e9 elements loses enough
    # precision to report cosine > 1 (round-4 artifact said 1.014997 — an
    # impossible value for a similarity measure)
    dot = np.dot(hs_deq.ravel().astype(np.float64),
                 hs_ref.ravel().astype(np.float64))
    n_deq = np.linalg.norm(hs_deq.ravel().astype(np.float64))
    n_ref = np.linalg.norm(hs_ref.ravel().astype(np.float64))
    cap_cos = float(dot / (n_deq * n_ref + 1e-12))

    # propagation: window-1-style ID-resample forward consuming each capture
    del hs_deq, hs_ref, cap_bf16
    prev_kw = dict(prev_hidden_indices=cap_idx, id_pool_resample=True,
                   prev_resample_mask=resample_mask,
                   prev_clip_weight=0.3)  # production anyl handoff weight
    prop_fn = make_forward(int8_flash, **prev_kw)
    prop = jax.jit(lambda p, l, e, ts, hs: prop_fn(
        p, l, e, ts, prev_hidden_states=hs).sample)
    out_b = np.asarray(prop(params, lat_dev, embeds[B:], ts1, hs_bf16)
                       .astype(jnp.float32))
    out_q = np.asarray(prop(params, lat_dev, embeds[B:], ts1, hs_int8)
                       .astype(jnp.float32))
    # consumption control: zeroed prev states MUST change the output, else
    # the propagation PSNR would be vacuous (nothing consumed)
    hs_zero = jax.tree.map(jnp.zeros_like, hs_bf16)
    out_none = np.asarray(prop(params, lat_dev, embeds[B:], ts1, hs_zero)
                          .astype(jnp.float32))
    consumption = float(np.abs(out_b - out_none).max())
    prng = float(out_b.max() - out_b.min())
    pmse = float(np.mean((out_q - out_b) ** 2))
    prop_psnr = 10 * np.log10(prng ** 2 / pmse) if pmse else float("inf")
    result["capture_int8"] = {
        "captured_tokens": int(cap_idx.shape[1]),
        "roundtrip_rel_l1": round(cap_rel_l1, 5),
        "roundtrip_cosine": round(cap_cos, 6),
        "window1_propagation_psnr_db": round(prop_psnr, 2),
        "consumption_control_maxdiff": round(consumption, 6),
        "note": "per-token symmetric int8 capture vs bf16 compressed capture, "
                "both produced/consumed by the int8 serving forward at 42L "
                "flagship dims (ID-resample paged-KV path)",
    }
    del hs_bf16, hs_int8, out_b, out_q, params, lat_dev
    gc.collect()

    # ---- (b) decoded-pixel PSNR/SSIM (tiled VAE decode of both finals) ----
    from videopainter_tpu.config import VAEConfig
    from videopainter_tpu.models import AutoencoderKLCogVideoX
    from videopainter_tpu.evaluate.metrics import psnr as psnr_np, ssim as ssim_np

    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16)
                                 if args.smoke else VAEConfig())
    vae.enable_tiling()
    vparams = jax.jit(lambda k: vae.init(k, dtype=dtype))(jax.random.PRNGKey(3))
    jax.block_until_ready(vparams)
    sf = vae.cfg.scaling_factor

    def decode(lat_np):
        z = jnp.asarray(lat_np).astype(dtype) / sf
        y = vae.decode(vparams, z)
        return np.asarray(jnp.clip(y, -1, 1).astype(jnp.float32))

    px_ref = decode(ref)
    px_got = decode(got)
    px01_ref = px_ref / 2 + 0.5
    px01_got = px_got / 2 + 0.5
    pix_psnr = psnr_np(px01_got, px01_ref, data_range=1.0)
    # SSIM frame-by-frame mean (eval protocol shape)
    ssims = [ssim_np(px01_got[0, t], px01_ref[0, t], data_range=1.0)
             for t in range(px01_ref.shape[1])]
    sat = float(np.mean((np.abs(px_ref) >= 0.999)))
    result["pixel"] = {
        "psnr_db": round(float(pix_psnr), 2),
        "ssim": round(float(np.mean(ssims)), 5),
        "clip_saturation_frac": round(sat, 4),
        "note": "both 50-step final latents decoded by the tiled VAE "
                "(random weights; clip_saturation_frac reports how much of "
                "the frame the [-1,1] clip saturates — low values mean the "
                "PSNR is not inflated by clipping)",
    }
    result["total_wall_s"] = round(time.time() - t0 + t_bf16, 1)
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

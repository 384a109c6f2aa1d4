"""Flagship-dims TRAINING smoke on one chip: branch SFT step with the true
42-layer frozen backbone (or the deepest that fits).

Round-2 verdict: training was only ever chip-measured at 4 layers; flash-bwd
and remat exist precisely to enable deep training, so prove it. Reference
config: 8xGPU ZeRO-2 bf16, batch 1/GPU, 480x720x49f, frozen backbone +
trainable 2L branch (train/accelerate_config_machine_single_ds.yaml,
train_cogvideox_inpainting_i2v_video.py:1413-1418). Here: ONE v5e chip,
bf16, batch 1 — the ladder records honestly which depths OOM.

Each rung runs as a subprocess so an OOM can't poison the parent heap.
Writes TRAIN_SMOKE.json at the repo root.

Usage: python tools/smoke_chip_train.py               # ladder 42->21
       python tools/smoke_chip_train.py --layers 42   # one rung, in-process
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LADDER = [42, 32, 28, 24, 21]


def run_rung(layers: int, steps: int, int8_backbone: bool = False,
             frames: int = 49, optimizer: str = "adamw",
             bf16_branch: bool = False, mode: str = "branch",
             lr: float = 1e-5, fixed_noise: bool = False,
             validate: bool = False, validate_steps: int = 6,
             precomputed_latents: bool = False, remat_chunk: int = 0) -> dict:
    cmd = [sys.executable, __file__, "--layers", str(layers),
           "--steps", str(steps), "--frames", str(frames),
           "--optimizer", optimizer, "--mode", mode, "--lr", str(lr),
           "--validate-steps", str(validate_steps),
           "--remat-chunk", str(remat_chunk)] + \
          (["--int8-backbone"] if int8_backbone else []) + \
          (["--bf16-branch"] if bf16_branch else []) + \
          (["--fixed-noise"] if fixed_noise else []) + \
          (["--validate"] if validate else []) + \
          (["--precomputed-latents"] if precomputed_latents else [])
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600 + 30 * steps)
    except subprocess.TimeoutExpired:
        return {"layers": layers, "ok": False, "error": "timeout"}
    lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    if res.returncode == 0 and lines:
        return json.loads(lines[-1])
    err = (res.stderr or res.stdout)[-2000:]
    kind = ("RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED" in err else
            "error")
    return {"layers": layers, "ok": False, "error": kind,
            "tail": err[-300:]}


def measure(args) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX,
                                         CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.schedulers import CogVideoXDDIMScheduler
    from videopainter_tpu.training import (BranchTrainConfig,
                                           init_branch_train_state,
                                           make_branch_train_step,
                                           make_optimizer)
    from videopainter_tpu.training.train_branch import make_lora_train_step

    lora_mode = args.mode == "lora"
    cfg = TransformerConfig.cogvideox_5b_i2v(
        num_layers=args.layers,
        # the reference's ID-LoRA trainer forwards with the learnable
        # resample processor (train_..._resample.py)
        **({"id_pool_resample_learnable": True} if lora_mode else {}))
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(VAEConfig())
    vae.enable_tiling()  # reference trains with tiling+slicing (README:95)
    sched = CogVideoXDDIMScheduler(SchedulerConfig(prediction_type="v_prediction"))
    dtype = jnp.bfloat16

    # jitted init programs (heap stays unfragmented — bench.py lesson); the
    # sincos pos table rides in as an ARGUMENT (baked-in it overflows the
    # axon remote-compile request, HTTP 413). VAE in its own program.
    # Frozen stacks bf16; the TRAINABLE branch in fp32 (master weights, as
    # DeepSpeed bf16 keeps fp32 master params). In LoRA mode the branch is
    # FROZEN (bf16) and the trainable tree is the LoRA A/B pytree.
    bdt = jnp.bfloat16 if (args.bf16_branch or lora_mode) else jnp.float32

    @jax.jit
    def _build(k0, k1, pos):
        tp = transformer.init(k0, dtype=dtype, pos_embedding=pos)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=bdt)
        return {"transformer": tp, "branch": bp}

    t0 = time.time()
    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                    transformer.host_pos_embedding())
    jax.block_until_ready(params)
    if args.int8_backbone:
        # QLoRA-style: the FROZEN backbone runs int8 W8A8 (halves its HBM
        # share, 10.7 -> 5.4 GiB at 42L) while gradients flow through it to
        # the branch via the straight-through estimator
        # (ops/basic._int8_matmul_ste); the trainable branch stays fp32
        from videopainter_tpu.quantize import quantize_transformer_int8

        params["transformer"] = quantize_transformer_int8(
            params["transformer"], free_source=True)
    params["vae"] = jax.jit(lambda k: vae.init(k, dtype=dtype))(
        jax.random.PRNGKey(2))
    jax.block_until_ready(params["vae"])
    init_s = time.time() - t0

    tcfg = BranchTrainConfig(height=args.height, width=args.width,
                             mask_add=True, remat=True, use_flash=True,
                             remat_chunk=args.remat_chunk or None)
    optimizer = make_optimizer(lr=args.lr, optimizer=args.optimizer)
    if lora_mode:
        # reference ID-LoRA config: r=256 alpha=128 on backbone q/k/v/out,
        # branch + backbone frozen (train_..._resample.py LoraConfig). The
        # additive attach path lets the frozen backbone stay int8 (QLoRA).
        from videopainter_tpu.models.lora import init_lora_params

        # --bf16-branch doubles as "bf16 LoRA params" here (no fp32 master
        # weights): at 42L the fp32 A/B tree + its grad + clip temp cost
        # ~3.2 GiB, the single biggest LoRA-vs-branch memory delta
        lora_dtype = jnp.bfloat16 if args.bf16_branch else jnp.float32
        lora = init_lora_params(jax.random.PRNGKey(5), params["transformer"],
                                rank=tcfg.lora_rank, dtype=lora_dtype)
        frozen_branch = params.pop("branch")
        state = init_branch_train_state(lora, optimizer)
        train_step = make_lora_train_step(transformer, branch, vae, sched,
                                          optimizer, tcfg)
        frozen = {"transformer": params["transformer"], "vae": params["vae"],
                  "branch": frozen_branch}
    else:
        state = init_branch_train_state(params.pop("branch"), optimizer)
        train_step = make_branch_train_step(transformer, branch, vae, sched,
                                            optimizer, tcfg)
        frozen = {"transformer": params["transformer"], "vae": params["vae"]}

    T = args.frames
    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.rand(1, T, args.height, args.width, 3), dtype) * 2 - 1,
        "conditioning_pixel_values": jnp.asarray(
            rng.rand(1, T, args.height, args.width, 3), dtype) * 2 - 1,
        "masks": jnp.asarray(
            (rng.rand(1, T, args.height, args.width) > 0.75), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.rand(1, 226, 4096), dtype),
    }
    if args.precomputed_latents:
        # precomputed-latents fast path: the two 49f VAE encodes leave the
        # step (posterior moments ride in the batch; per-step sample
        # bit-identical — tests/test_training.py)
        from videopainter_tpu.training import encode_batch_latent_moments

        batch = encode_batch_latent_moments(vae, params["vae"], batch)
        jax.block_until_ready(batch["video_latent_mean"])

    # --fixed-noise: reuse ONE rng every step, so the sampled (noise,
    # timestep, sigma) stay constant -> pure gradient descent on one loss
    # surface (the overfit gate: the loss curve must decrease). Default:
    # fresh keys, the realistic noisy objective.
    def step_key(i):
        return jax.random.PRNGKey(4) if args.fixed_noise \
            else jax.random.PRNGKey(4 + i)

    t0 = time.time()
    state, metrics = train_step(state, frozen, batch, step_key(0))
    loss0 = float(metrics["total_loss"])  # forces full sync through the tunnel
    compile_s = time.time() - t0

    curve = [loss0]
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = train_step(state, frozen, batch, step_key(i + 1))
        loss = float(metrics["total_loss"])
        curve.append(loss)
    step_s = (time.time() - t0) / max(args.steps, 1)

    assert np.isfinite(loss0) and np.isfinite(loss), (loss0, loss)
    frozen_desc = ("int8-STE frozen (QLoRA-style)" if args.int8_backbone
                   else "bf16 frozen")
    trainable_desc = (f"r={tcfg.lora_rank} LoRA q/k/v/out (frozen bf16 branch)"
                      if lora_mode
                      else ("bf16 branch" if args.bf16_branch
                            else "fp32 branch"))
    out = {
        "layers": args.layers, "ok": True,
        "mode": args.mode,
        "int8_backbone": bool(args.int8_backbone),
        "optimizer": args.optimizer,
        "bf16_branch": bool(args.bf16_branch),
        "lr": args.lr, "fixed_noise": bool(args.fixed_noise),
        "precomputed_latents": bool(args.precomputed_latents),
        "remat_chunk": args.remat_chunk or None,
        "dims": f"{T}f x {args.height}x{args.width}, batch 1, {frozen_desc} + "
                f"{trainable_desc} ({args.optimizer}), flash fwd+bwd, remat, "
                "mask_add",
        "step_s": round(step_s, 2),
        "compile_s": round(compile_s, 1), "init_s": round(init_s, 1),
        "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
        "grad_norm": round(float(metrics["gradient_norm_before_clip"]), 4),
    }
    if args.steps > 2:
        out["loss_curve"] = [round(x, 4) for x in curve]
    if args.validate:
        # end-of-run validation (reference log_validation): run the full
        # single-clip pipeline with the trained weights, save a side-by-side
        # [GT | masked | output] sample under artifacts/
        from videopainter_tpu.training.validation import make_validation_fn

        val_fn = make_validation_fn(
            transformer, branch, vae, sched, frozen, batch,
            num_inference_steps=args.validate_steps, mode=args.mode,
            lora_alpha=tcfg.lora_alpha, lora_rank=tcfg.lora_rank,
            replace_gt_alternate=False, use_flash=True, sequential_cfg=True,
            dtype=dtype)
        t0 = time.time()
        video01 = val_fn(state.trainable, int(state.step))
        val_s = time.time() - t0
        os.makedirs(os.path.join(os.path.dirname(__file__), "..",
                                 "artifacts"), exist_ok=True)
        from PIL import Image

        frames = [0, video01.shape[0] // 2, video01.shape[0] - 1]
        for fi in frames:
            img = (video01[fi] * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(
                os.path.dirname(__file__), "..", "artifacts",
                f"train_val_{args.mode}_f{fi}.png"))
        out["validation"] = {
            "steps": args.validate_steps, "wall_s": round(val_s, 1),
            "finite": bool(np.isfinite(video01).all()),
            "frames_png": [f"artifacts/train_val_{args.mode}_f{fi}.png"
                           for fi in frames]}
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=0,
                    help="0 = subprocess ladder 42->21, writes TRAIN_SMOKE.json")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--int8-backbone", action="store_true",
                    help="freeze the backbone as int8 W8A8 (STE gradients; "
                         "QLoRA-style) — halves its HBM share so deeper "
                         "stacks fit one chip")
    ap.add_argument("--optimizer", default="adamw",
                    help="adam|adamw|prodigy|adafactor (adafactor: factored "
                         "second moment, ~2 GiB less optimizer HBM)")
    ap.add_argument("--bf16-branch", action="store_true",
                    help="bf16 trainable branch (no fp32 master weights)")
    ap.add_argument("--mode", default="branch", choices=["branch", "lora"],
                    help="branch = SFT context encoder; lora = ID-LoRA "
                         "(r=256 on backbone q/k/v/out, branch frozen, "
                         "resample attention — reference "
                         "train_..._resample.py)")
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--fixed-noise", action="store_true",
                    help="one fixed (noise, timestep) every step: the "
                         "overfit gate — loss must decrease monotonically")
    ap.add_argument("--validate", action="store_true",
                    help="run the full pipeline once after training and save "
                         "side-by-side frames under artifacts/")
    ap.add_argument("--validate-steps", type=int, default=6)
    ap.add_argument("--remat-chunk", type=int, default=0,
                    help="two-level remat group size (e.g. 6 or 7 at 42L): "
                         "cuts scan-backward residuals ~3x for ~1 extra "
                         "in-group forward — the single-chip bf16 lever")
    ap.add_argument("--precomputed-latents", action="store_true",
                    help="precompute the batch's VAE posterior moments once "
                         "and skip the per-step 49f encodes (bit-identical "
                         "sampling; measures the dataset-cache serving mode)")
    args = ap.parse_args()

    if args.layers:
        return measure(args)

    results = []
    best = None
    for layers in LADDER:
        r = run_rung(layers, args.steps, int8_backbone=args.int8_backbone,
                     frames=args.frames, optimizer=args.optimizer,
                     bf16_branch=args.bf16_branch, mode=args.mode,
                     lr=args.lr, fixed_noise=args.fixed_noise,
                     validate=args.validate,
                     validate_steps=args.validate_steps,
                     precomputed_latents=args.precomputed_latents,
                     remat_chunk=args.remat_chunk)
        results.append(r)
        print(json.dumps(r), flush=True)
        if r.get("ok"):
            best = r
            break
    mode = ("int8_backbone" if args.int8_backbone else "bf16_backbone") + \
        f"_{args.frames}f" + \
        (f"_{args.optimizer}" if args.optimizer != "adamw" else "") + \
        ("_bf16branch" if args.bf16_branch else "") + \
        ("_lora" if args.mode == "lora" else "") + \
        ("_overfit" if args.fixed_noise else "") + \
        ("_precomp" if args.precomputed_latents else "") + \
        (f"_rc{args.remat_chunk}" if args.remat_chunk else "")
    path = os.path.join(os.path.dirname(__file__), "..", "TRAIN_SMOKE.json")
    out = {}
    if os.path.exists(path):  # accumulate: one section per (mode, frames)
        try:
            with open(path) as f:
                out = json.load(f)
        except Exception:
            out = {}
    if "rungs" in out:  # migrate the pre-section format (bf16 @49f ladder)
        out = {"bf16_backbone_49f": out}
    out[mode] = {"rungs": results, "best": best}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()

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
             bf16_branch: bool = False) -> dict:
    cmd = [sys.executable, __file__, "--layers", str(layers),
           "--steps", str(steps), "--frames", str(frames),
           "--optimizer", optimizer] + \
          (["--int8-backbone"] if int8_backbone else []) + \
          (["--bf16-branch"] if bf16_branch else [])
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
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

    cfg = TransformerConfig.cogvideox_5b_i2v(num_layers=args.layers)
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
    # DeepSpeed bf16 keeps fp32 master params)
    bdt = jnp.bfloat16 if args.bf16_branch else jnp.float32

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
                             mask_add=True, remat=True, use_flash=True)
    optimizer = make_optimizer(lr=1e-5, optimizer=args.optimizer)
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

    t0 = time.time()
    state, metrics = train_step(state, frozen, batch, jax.random.PRNGKey(3))
    loss0 = float(metrics["total_loss"])  # forces full sync through the tunnel
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = train_step(state, frozen, batch,
                                    jax.random.PRNGKey(4 + i))
        loss = float(metrics["total_loss"])
    step_s = (time.time() - t0) / max(args.steps, 1)

    assert np.isfinite(loss0) and np.isfinite(loss), (loss0, loss)
    frozen_desc = ("int8-STE frozen (QLoRA-style)" if args.int8_backbone
                   else "bf16 frozen")
    branch_desc = "bf16 branch" if args.bf16_branch else "fp32 branch"
    print(json.dumps({
        "layers": args.layers, "ok": True,
        "int8_backbone": bool(args.int8_backbone),
        "optimizer": args.optimizer,
        "bf16_branch": bool(args.bf16_branch),
        "dims": f"{T}f x {args.height}x{args.width}, batch 1, {frozen_desc} + "
                f"{branch_desc} ({args.optimizer}), flash fwd+bwd, remat, "
                "mask_add",
        "step_s": round(step_s, 2),
        "compile_s": round(compile_s, 1), "init_s": round(init_s, 1),
        "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
        "grad_norm": round(float(metrics["gradient_norm_before_clip"]), 4),
    }))


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
    args = ap.parse_args()

    if args.layers:
        return measure(args)

    results = []
    best = None
    for layers in LADDER:
        r = run_rung(layers, args.steps, int8_backbone=args.int8_backbone,
                     frames=args.frames, optimizer=args.optimizer,
                     bf16_branch=args.bf16_branch)
        results.append(r)
        print(json.dumps(r), flush=True)
        if r.get("ok"):
            best = r
            break
    mode = ("int8_backbone" if args.int8_backbone else "bf16_backbone") + \
        f"_{args.frames}f" + \
        (f"_{args.optimizer}" if args.optimizer != "adamw" else "") + \
        ("_bf16branch" if args.bf16_branch else "")
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

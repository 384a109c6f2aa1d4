"""Profile one flagship denoise step on the attached TPU and print the
per-op-category time breakdown.

jax.profiler works through the axon tunnel (CLAUDE.md); the device trace
lands in <out>/plugins/profile/*/­*.trace.json.gz. Categories are keyed on
XLA op names (fusion kinds, custom-calls for the Pallas kernels, copies).

Usage: python tools/profile_step.py [--layers 42] [--int8] [--seq-cfg]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def categorize(name: str) -> str:
    n = name.lower()
    if "flash" in n or "custom-call" in n or "custom_call" in n:
        return "flash/custom-call"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion (elementwise/norm)"
    if "dot" in n or "convolution" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "pad" in n or "slice" in n:
        return "copy/transpose/pad"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def report(out_dir: str, region: str) -> None:
    traces = sorted(glob.glob(os.path.join(
        out_dir, region, "plugins", "profile", "*", "*trace.json.gz")),
        key=os.path.getmtime)
    if not traces:
        print("no trace found under", out_dir)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    cats = collections.Counter()
    ops = collections.Counter()
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        arg = ev.get("args") or {}
        # device-lane events carry 'run_id'/'hlo' style args; host lanes don't
        if "hlo_category" in arg or "long_name" in arg or "hlo" in str(arg)[:64]:
            dur = ev["dur"] / 1e3  # ms
            cats[arg.get("hlo_category") or categorize(name)] += dur
            ops[name[:60]] += dur
            total += dur
    print(f"\ndevice op time total: {total:.1f} ms")
    for k, v in cats.most_common(12):
        print(f"  {k:<36} {v:9.1f} ms  {100*v/total:5.1f}%")
    print("\ntop ops:")
    for k, v in ops.most_common(15):
        print(f"  {k:<60} {v:8.1f} ms")


def profile_train(args):
    """Profile ONE flagship training step (the TRUE 42L serving-train config:
    int8-STE frozen backbone + bf16 branch + adafactor + precomputed
    latents, flash fwd+bwd, remat). Round-4 measured 18.01 s/step but the
    split fwd/bwd/optimizer/STE-quantize was never profiled — this answers
    where the next training lever is."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX,
                                         CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.schedulers import CogVideoXDDIMScheduler
    from videopainter_tpu.training import (BranchTrainConfig,
                                           encode_batch_latent_moments,
                                           init_branch_train_state,
                                           make_branch_train_step,
                                           make_optimizer)
    from videopainter_tpu.utils.profiling import profile_region

    cfg = TransformerConfig.cogvideox_5b_i2v(num_layers=args.layers)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(VAEConfig())
    vae.enable_tiling()
    sched = CogVideoXDDIMScheduler(
        SchedulerConfig(prediction_type="v_prediction"))
    dtype = jnp.bfloat16

    @jax.jit
    def _build(k0, k1, pos):
        tp = transformer.init(k0, dtype=dtype, pos_embedding=pos)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=jnp.bfloat16)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                    transformer.host_pos_embedding())
    jax.block_until_ready(params)
    from videopainter_tpu.quantize import quantize_transformer_int8

    params["transformer"] = quantize_transformer_int8(
        params["transformer"], free_source=True)
    params["vae"] = jax.jit(lambda k: vae.init(k, dtype=dtype))(
        jax.random.PRNGKey(2))
    jax.block_until_ready(params["vae"])

    tcfg = BranchTrainConfig(height=480, width=720, mask_add=True,
                             remat=True, use_flash=True)
    optimizer = make_optimizer(lr=1e-5, optimizer="adafactor")
    state = init_branch_train_state(params.pop("branch"), optimizer)
    train_step = make_branch_train_step(transformer, branch, vae, sched,
                                        optimizer, tcfg)
    frozen = {"transformer": params["transformer"], "vae": params["vae"]}

    T = 49
    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.rand(1, T, 480, 720, 3), dtype) * 2 - 1,
        "conditioning_pixel_values": jnp.asarray(
            rng.rand(1, T, 480, 720, 3), dtype) * 2 - 1,
        "masks": jnp.asarray((rng.rand(1, T, 480, 720) > 0.75), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.rand(1, 226, 4096), dtype),
    }
    batch = encode_batch_latent_moments(vae, params["vae"], batch)
    jax.block_until_ready(batch["video_latent_mean"])

    t0 = _t.time()
    state, metrics = train_step(state, frozen, batch, jax.random.PRNGKey(4))
    print(f"compile+first step: {_t.time()-t0:.1f}s "
          f"loss={float(metrics['total_loss']):.4f}")
    t0 = _t.time()
    with profile_region("train_step", args.out):
        state, metrics = train_step(state, frozen, batch,
                                    jax.random.PRNGKey(5))
        float(metrics["total_loss"])
    print(f"train step wall: {_t.time()-t0:.2f}s")
    report(args.out, "train_step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="profile the flagship TRAIN step (int8-STE backbone "
                         "+ bf16 branch + adafactor + precomputed latents) "
                         "instead of the denoise step")
    ap.add_argument("--out", default="/tmp/jax_trace_step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_vp_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.train:
        return profile_train(args)

    from videopainter_tpu.config import BranchConfig, TransformerConfig
    from videopainter_tpu.models import CogVideoXBranch, CogVideoXTransformer3D
    from videopainter_tpu.pipelines.common import prepare_rope
    from videopainter_tpu.utils.profiling import profile_region

    cfg = TransformerConfig.cogvideox_5b_i2v(num_layers=args.layers)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    dtype = jnp.bfloat16

    @jax.jit
    def _build(k0, k1):
        tp = transformer.init(k0, dtype=dtype)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=dtype)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    jax.block_until_ready(params)
    if args.int8:
        from videopainter_tpu.quantize import quantize_transformer_int8

        params = {k: quantize_transformer_int8(v, free_source=True)
                  for k, v in params.items()}

    B, H_lat, W_lat, T_lat = 1, 60, 90, 13
    lat_shape = (B, T_lat, H_lat, W_lat, 16)
    gen = jax.jit(lambda k, s=lat_shape: jax.random.normal(k, s, dtype=dtype))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    latents, masked = gen(keys[0]), gen(keys[1])
    image_latents = jnp.zeros(lat_shape, dtype)
    mask = (jax.random.uniform(keys[2], (B, T_lat, H_lat, W_lat)) > 0.5).astype(dtype)
    embeds = jax.random.normal(keys[3], (2 * B, 226, 4096), dtype=dtype)
    rope = prepare_rope(cfg, H_lat * 8, W_lat * 8, T_lat, 8)
    rope = (rope[0].astype(dtype), rope[1].astype(dtype))

    def step(params, latents, masked, image_latents, mask, embeds, rope, t):
        lvi = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.broadcast_to(t, (2 * B,))
        model_in = jnp.concatenate(
            [lvi, jnp.concatenate([image_latents] * 2, 0)], axis=-1)
        cond = jnp.concatenate(
            [jnp.concatenate([masked] * 2, 0),
             jnp.concatenate([mask] * 2, 0)[..., None]], axis=-1)
        samples = branch.apply(params["branch"], lvi, embeds, cond, ts,
                               rope=rope, use_flash=True)
        out = transformer.apply(params["transformer"], model_in, embeds, ts,
                                rope=rope, branch_block_samples=samples,
                                branch_block_masks=jnp.concatenate([mask] * 2, 0),
                                use_flash=True)
        u, c = jnp.split(out.sample.astype(jnp.float32), 2, axis=0)
        pred = u + 6.0 * (c - u)
        return (latents.astype(jnp.float32) * 0.99 - 0.01 * pred).astype(dtype)

    jstep = jax.jit(step)
    t = jnp.asarray(500)
    lat = jstep(params, latents, masked, image_latents, mask, embeds, rope, t)
    float(jnp.sum(lat.astype(jnp.float32)))  # compile + settle
    t0 = time.time()
    with profile_region("step", args.out):
        lat = jstep(params, lat, masked, image_latents, mask, embeds, rope, t)
        float(jnp.sum(lat.astype(jnp.float32)))
    print(f"step wall: {time.time()-t0:.2f}s")
    report(args.out, "step")


if __name__ == "__main__":
    main()

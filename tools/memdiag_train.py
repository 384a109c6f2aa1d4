"""Compiled-memory diagnosis of the branch-SFT grad step at flagship dims.

Lowers+compiles the inner grad-step program from ABSTRACT shapes only
(jax.ShapeDtypeStruct) — no parameters are materialized, so this runs with an
empty chip and answers "would depth L fit?" from XLA's buffer assignment
before we burn a real training dispatch (TRAIN_SMOKE found every bf16 depth
21-42 OOMs; this tool shows where the HBM goes and sizes the int8-STE
backbone alternative).

Usage: python tools/memdiag_train.py --layers 42 [--int8-backbone] [--no-flash]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--int8-backbone", action="store_true")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--optimizer", default="adamw",
                    help="adam|adamw|prodigy|adafactor (adafactor factors "
                         "the second moment: ~2 GiB less fp32 state on the "
                         "flagship branch)")
    ap.add_argument("--bf16-branch", action="store_true",
                    help="bf16 trainable branch (no fp32 master weights): "
                         "~0.5 GiB less — the last squeeze for 42L@49f")
    ap.add_argument("--remat-chunk", type=int, default=0,
                    help="two-level remat group size (see "
                         "BranchTrainConfig.remat_chunk)")
    ap.add_argument("--licm-ratio", type=float, default=0.0,
                    help="xla_tpu_licm_size_inflation_ratio compiler option "
                         "(<1 discourages hoisting the backward's whole-"
                         "stack W^T transpose copies out of the layer loop)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--frames", type=int, default=49)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX,
                                         CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines.common import prepare_rope
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
    sched = CogVideoXDDIMScheduler(SchedulerConfig(prediction_type="v_prediction"))
    dtype = jnp.bfloat16

    tcfg = BranchTrainConfig(height=args.height, width=args.width,
                             mask_add=True, remat=not args.no_remat,
                             use_flash=not args.no_flash,
                             remat_chunk=args.remat_chunk or None)
    optimizer = make_optimizer(lr=1e-5, optimizer=args.optimizer)
    step = make_branch_train_step(transformer, branch, vae, sched, optimizer,
                                  tcfg)

    # abstract param trees (no device memory): eval_shape through the real
    # init functions, then quantize SHAPES by swapping kernel->kernel_q/kscale
    tp_shapes = jax.eval_shape(
        lambda k: transformer.init(k, dtype=dtype,
                                   pos_embedding=transformer.host_pos_embedding()),
        jax.random.PRNGKey(0))
    bdt = jnp.bfloat16 if args.bf16_branch else jnp.float32
    bp_shapes = jax.eval_shape(
        lambda k: branch.init(k, dtype=bdt), jax.random.PRNGKey(1))
    if args.int8_backbone:
        from videopainter_tpu.quantize import _BLOCK_LINEARS

        def q_shapes(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    if k in _BLOCK_LINEARS and "kernel" in v:
                        w = v["kernel"]
                        out[k] = {"kernel_q": jax.ShapeDtypeStruct(w.shape, jnp.int8),
                                  "kscale": jax.ShapeDtypeStruct(
                                      w.shape[:-2] + w.shape[-1:], jnp.float32)}
                        if "bias" in v:
                            out[k]["bias"] = v["bias"]
                    else:
                        out[k] = q_shapes(v)
                else:
                    out[k] = v
            return out

        tp_shapes = dict(tp_shapes, blocks=q_shapes(tp_shapes["blocks"]))

    state_shapes = jax.eval_shape(
        lambda p: init_branch_train_state(p, optimizer), bp_shapes)

    T_lat = (args.frames - 1) // 4 + 1
    H_lat, W_lat = args.height // 8, args.width // 8
    lat = jax.ShapeDtypeStruct((1, T_lat, H_lat, W_lat, 16), dtype)
    cond = jax.ShapeDtypeStruct((1, T_lat, H_lat, W_lat, 17), dtype)
    mask = jax.ShapeDtypeStruct((1, T_lat, H_lat, W_lat), dtype)
    ts = jax.ShapeDtypeStruct((1,), jnp.int32)
    emb = jax.ShapeDtypeStruct((1, 226, 4096), dtype)
    rope = prepare_rope(cfg, args.height, args.width, T_lat, 8)
    rope = tuple(jax.ShapeDtypeStruct(r.shape, dtype) for r in rope)

    lowered = step.grad_step.lower(state_shapes, tp_shapes, lat, lat, cond,
                                   mask, lat, ts, emb, rope)
    base = {"layers": args.layers, "frames": args.frames,
            "int8_backbone": bool(args.int8_backbone),
            "optimizer": args.optimizer,
            "bf16_branch": bool(args.bf16_branch),
            "flash": not args.no_flash, "remat": not args.no_remat}
    copts = ({"xla_tpu_licm_size_inflation_ratio": str(args.licm_ratio)}
             if args.licm_ratio else None)
    if copts:
        base["licm_ratio"] = args.licm_ratio
    try:
        compiled = (lowered.compile(compiler_options=copts) if copts
                    else lowered.compile())
    except Exception as e:  # the axon compiler enforces the 15.75G HBM cap
        import re

        msg = str(e)
        m = re.search(r"Used ([\d.]+)G of ([\d.]+)G hbm", msg)
        frag = re.search(r"([\d.]+)% fragmentation \(([\d.]+)G\)", msg)
        # surface the per-buffer breakdown XLA embeds in the OOM message —
        # "Largest program allocations in hbm:" names each offender
        alloc_idx = msg.find("Largest program allocations")
        allocs = msg[alloc_idx:alloc_idx + 6000] if alloc_idx >= 0 else None
        print(json.dumps(dict(base, fits=False,
                              used_gib=float(m.group(1)) if m else None,
                              capacity_gib=float(m.group(2)) if m else None,
                              temp_fragmentation_gib=(float(frag.group(2))
                                                      if frag else None),
                              error=msg[:200],
                              largest_allocations=allocs)))
        return
    ma = compiled.memory_analysis()
    gib = 1024 ** 3

    def g(x):
        return round(x / gib, 2)

    print(json.dumps(dict(
        base, fits=True,
        argument_gib=g(ma.argument_size_in_bytes),
        output_gib=g(ma.output_size_in_bytes),
        temp_gib=g(ma.temp_size_in_bytes),
        alias_gib=g(ma.alias_size_in_bytes),
        peak_gib=g(ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes - ma.alias_size_in_bytes),
        note="peak = args + outputs + temps - aliased (donated args); "
             "the axon compiler enforces the 15.75 GiB cap at compile time, "
             "so fits=True means buffer assignment succeeded on-device",
    )))


if __name__ == "__main__":
    main()

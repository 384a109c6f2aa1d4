"""Compiled-memory diagnosis of the flagship ID-resample anyl window programs.

AOT-lowers and compiles (NO execution, abstract args — no HBM used for
params) the two peak device programs of the any-length ID-resample window
loop at flagship dims, per CFG half (sequential_cfg mode):

 - window-0 "final" step: produces the compressed [L, B, M, D] capture
 - window-1 segment step: consumes the compressed prev state

and prints XLA's memory_analysis (argument/output/temp bytes). Use to size
the single-chip fit before burning a 20-minute e2e smoke.

Usage: python tools/memdiag_anyl.py [--layers 42] [--bucket 2048] [--bf16]
       [--int8_attn]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fmt(ma) -> str:
    g = 2.0**30
    try:
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        return (f"args {ma.argument_size_in_bytes/g:.2f} + "
                f"out {ma.output_size_in_bytes/g:.2f} + "
                f"temp {ma.temp_size_in_bytes/g:.2f} "
                f"(alias {ma.alias_size_in_bytes/g:.2f}) = "
                f"sum {peak/g:.2f} GiB")
    except Exception as e:  # some PJRT backends don't expose the fields
        return f"<memory_analysis unavailable: {e}> raw={ma}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--bucket", type=int, default=2048)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--int8_attn", action="store_true")
    ap.add_argument("--capture_int8", action="store_true",
                    help="size the per-token int8 capture variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    dtype = jnp.bfloat16
    cfg = TransformerConfig.cogvideox_5b_i2v(
        num_layers=args.layers, id_pool_resample_learnable=True)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    use_flash = "int8" if args.int8_attn else True

    B, T_lat, H_lat, W_lat, C = 1, 13, 60, 90, 16
    text_len = 226
    s_vid = T_lat * (H_lat // 2) * (W_lat // 2)
    s_joint = text_len + s_vid

    # abstract params: AOT analysis needs shapes only
    t_shapes = jax.eval_shape(lambda k: transformer.init(k, dtype=dtype),
                              jax.random.PRNGKey(0))
    b_shapes = jax.eval_shape(
        lambda k: branch.init_from_transformer(
            k, jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t_shapes),
            cfg, dtype=dtype), jax.random.PRNGKey(1))
    params = {"transformer": t_shapes, "branch": b_shapes}
    if not args.bf16:
        from videopainter_tpu.quantize import quantize_transformer_int8

        params = jax.eval_shape(
            lambda p: {k: quantize_transformer_int8(v) for k, v in p.items()},
            params)
    pbytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                 for s in jax.tree.leaves(params))
    print(f"params ({'bf16' if args.bf16 else 'int8'}): {pbytes/2**30:.2f} GiB")

    # concrete mask for index sizing (quarter-area box like the chip smoke)
    mask_np = np.zeros((B, T_lat, H_lat, W_lat), np.float32)
    mask_np[:, :, 15:45, 22:68] = 1.0
    cap_idx_c = capture_token_indices(jnp.asarray(mask_np), cfg.patch_size,
                                      text_len=text_len, bucket=args.bucket)
    M = cap_idx_c.shape[1]
    print(f"masked tokens bucketed M={M} of S_joint={s_joint} "
          f"({M/s_joint:.1%}); compressed capture [L,2B,M,3072] bf16 = "
          f"{args.layers*2*B*M*3072*2/2**30:.2f} GiB "
          f"(full would be {args.layers*2*B*s_joint*3072*2/2**30:.2f} GiB)")

    # rope is closed over (like the pipeline does), so keep it concrete
    rope = prepare_rope(cfg, H_lat * 8, W_lat * 8, T_lat, 8)
    rope = (rope[0].astype(dtype), rope[1].astype(dtype))

    lat = jax.ShapeDtypeStruct((B, T_lat, H_lat, W_lat, C), dtype)
    mask_lat = jax.ShapeDtypeStruct((B, T_lat, H_lat, W_lat), dtype)
    e_half = jax.ShapeDtypeStruct((B, text_len, 4096), dtype)
    cap_idx = jax.ShapeDtypeStruct(cap_idx_c.shape, jnp.int32)
    if args.capture_int8:
        prev_h = {"values": jax.ShapeDtypeStruct((args.layers, B, M, 3072),
                                                 jnp.int8),
                  "scales": jax.ShapeDtypeStruct((args.layers, B, M),
                                                 jnp.float32)}
    else:
        prev_h = jax.ShapeDtypeStruct((args.layers, B, M, 3072), dtype)
    prev_m = jax.ShapeDtypeStruct((B, s_joint), jnp.bool_)
    prev_i = jax.ShapeDtypeStruct((B, M), jnp.int32)

    def final_like(params, lat_, masked, img, mask, e, ci):
        """window-0 final step, one sequential-CFG half, compressed capture."""
        model_in = jnp.concatenate([lat_, img], axis=-1)
        cond = jnp.concatenate([masked, mask[..., None]], axis=-1)
        ts = jnp.broadcast_to(jnp.asarray(500), (B,))
        samples = branch.apply(params["branch"], lat_, e, cond, ts,
                               rope=rope, use_flash=use_flash)
        out = transformer.apply(params["transformer"], model_in, e, ts,
                                rope=rope, branch_block_samples=samples,
                                branch_block_masks=mask,
                                id_pool_resample=True,
                                return_hidden_states=True,
                                capture_indices=ci,
                                capture_quant=args.capture_int8,
                                use_flash=use_flash)
        return out.sample, out.hidden_states_list, out.resample_mask

    def seg_like_w1(params, lat_, masked, img, mask, e, ph, pm, pi):
        """window-1 segment step, one half, compressed prev-state input."""
        model_in = jnp.concatenate([lat_, img], axis=-1)
        cond = jnp.concatenate([masked, mask[..., None]], axis=-1)
        ts = jnp.broadcast_to(jnp.asarray(500), (B,))
        samples = branch.apply(params["branch"], lat_, e, cond, ts,
                               rope=rope, use_flash=use_flash)
        out = transformer.apply(params["transformer"], model_in, e, ts,
                                rope=rope, branch_block_samples=samples,
                                branch_block_masks=mask,
                                id_pool_resample=True,
                                prev_hidden_states=ph, prev_resample_mask=pm,
                                prev_hidden_indices=pi, prev_clip_weight=0.3,
                                use_flash=use_flash)
        return out.sample

    for name, fn, a in (
        ("window0-final (capture out, 1 CFG half)", final_like,
         (params, lat, lat, lat, mask_lat, e_half, cap_idx)),
        ("window1-seg (compressed prev in, 1 CFG half)", seg_like_w1,
         (params, lat, lat, lat, mask_lat, e_half, prev_h, prev_m, prev_i)),
    ):
        compiled = jax.jit(fn).lower(*a).compile()
        print(f"{name}: {fmt(compiled.memory_analysis())}")


if __name__ == "__main__":
    main()

"""Block-size sweep for the PRODUCTION int8 flash attention entry point.

Times `ops.flash_attention_int8.flash_attention_int8` (i.e. including the
XLA-fused K-centering + per-block quantization overhead, which is what the
denoise step actually pays) across candidate (blk_q, blk_k) pairs at flagship
dims, against the bf16 `flash_attention` baseline.

Rationale: the bf16 sweep (round 1) settled on 512x2048 and found larger
blocks fail compile on VMEM — but int8 operands halve the per-element VMEM
footprint, so blocks that were previously uncompilable (1024x2048, 512x4096,
1024x4096) may now fit and better amortize the online-softmax overhead.

Usage: python tools/sweep_int8_blocks.py [--iters 10] [--pv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters):
    # warm + BLOCK: the axon dispatch is async; force a scalar fetch so the
    # remote compile stays out of the timed window (CLAUDE.md)
    _ = float(jnp.sum(fn().astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bh", type=int, default=48)
    ap.add_argument("--seq", type=int, default=17776)
    ap.add_argument("--pv", action="store_true", help="also sweep int8-PV")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import functools

    from videopainter_tpu.ops.flash_attention import flash_attention
    from videopainter_tpu.ops.flash_attention_int8 import flash_attention_int8

    # jit the FULL entry (quantization prologue included) — that is how the
    # denoise step consumes it; unjitted, the prologue runs as ~15 eager
    # axon dispatches and dominates the timing
    @functools.lru_cache(maxsize=None)
    def int8_fn(bq, bk, pv):
        return jax.jit(lambda q, k, v: flash_attention_int8(
            q, k, v, blk_q=bq, blk_k=bk, int8_pv=pv))

    b, h, s, d = 1, args.bh, args.seq, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d) * 0.5, jnp.bfloat16)
    flops = 4.0 * h * s * s * d

    bf16_fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    t0 = timeit(lambda: bf16_fn(q, k, v), args.iters)
    print(f"bf16 512x2048 (prod)     : {t0*1e3:8.2f} ms  "
          f"{flops/t0/1e12:6.1f} TF/s")

    o_ref = np.asarray(bf16_fn(q, k, v), np.float32)

    candidates = [(512, 2048), (1024, 2048), (512, 4096), (1024, 4096),
                  (2048, 2048), (256, 4096)]
    modes = [False] + ([True] if args.pv else [])
    for int8_pv in modes:
        tag = "int8-qk-pv" if int8_pv else "int8-qk   "
        for bq, bk in candidates:
            try:
                fn = int8_fn(bq, bk, int8_pv)
                t = timeit(lambda: fn(q, k, v), args.iters)
            except Exception as e:
                print(f"{tag} {bq}x{bk}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:120]})")
                continue
            o = np.asarray(fn(q, k, v), np.float32)
            rel = np.abs(o - o_ref).mean() / (np.abs(o_ref).mean() + 1e-9)
            print(f"{tag} {bq}x{bk}: {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TF/s"
                  f"  ({t0/t:.2f}x bf16)  rel-L1 {rel:.4f}")


if __name__ == "__main__":
    main()

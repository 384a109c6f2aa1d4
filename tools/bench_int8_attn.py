"""Microbenchmark: int8 (SageAttention-style) flash attention vs bf16.

Measures the forward flash kernel at flagship dims (48 heads x 17,776 tokens
x d=64) in three variants:
  - bf16:        the production kernel (ops/flash_attention.py)
  - int8-qk:     Q/K quantized to int8, QK^T on the int8 MXU path (2x peak),
                 softmax + PV unchanged (f32 / bf16)
  - int8-qk-pv:  additionally P quantized to int8 (fixed 127 scale — p in
                 (0,1]) and V int8, PV accumulated in int32

Rationale: flash is 119 ms/layer = 60% of the denoise step and MXU-bound at
the d=64 underfill ceiling in bf16 (CLAUDE.md). int8 doubles the MXU rate.
SageAttention (arXiv 2410.02367) validated int8 QK^T on CogVideoX.

Usage: python tools/bench_int8_attn.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _int8_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                 sm_scale: float, deq_scale: float, kv_len: int,
                 int8_pv: bool):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    blk_q, d = q_ref.shape
    blk_k = k_ref.shape[0]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_i32 = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
    s = s_i32.astype(jnp.float32) * (sm_scale * deq_scale)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1) + j * blk_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if int8_pv:
        p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
        pv = jax.lax.dot_general(p_i8, v_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        acc_ref[:] = acc_ref[:] * alpha + pv.astype(jnp.float32) / 127.0
    else:
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "deq_scale", "kv_len",
                                             "blk_q", "blk_k", "int8_pv"))
def _int8_flash(q_i8, k_i8, v, sm_scale, deq_scale, kv_len, blk_q, blk_k,
                int8_pv=False):
    bh, s_q, d = q_i8.shape
    s_k = k_i8.shape[1]
    qspec = pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_int8_kernel, sm_scale=sm_scale,
                          deq_scale=deq_scale, kv_len=kv_len, int8_pv=int8_pv),
        grid=(bh, s_q // blk_q, s_k // blk_k),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )(q_i8, k_i8, v)


def timeit(fn, iters):
    # warm + BLOCK: the axon dispatch is async, so without a forced fetch the
    # remote compile leaks into the timed window
    _ = float(jnp.sum(fn().astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.sum(out.astype(jnp.float32)))  # force through axon tunnel
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bh", type=int, default=48)
    ap.add_argument("--seq", type=int, default=17776)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from videopainter_tpu.ops.flash_attention import _flash_padded, _ceil_to

    bh, s, d = args.bh, args.seq, 64
    blk_q, blk_k = 512, 2048
    sp = _ceil_to(s, blk_k)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, sp, d) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, sp, d) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, sp, d) * 0.5, jnp.bfloat16)
    # zero the padded tail like _pad_qkv does
    mask = (np.arange(sp) < s)[None, :, None]
    q = q * mask
    k = k * mask
    v = v * mask
    sm_scale = d ** -0.5

    flops = 4.0 * bh * s * s * d  # qk + pv

    t_bf16 = timeit(lambda: _flash_padded(q, k, v, sm_scale, s, blk_q, blk_k),
                    args.iters)
    print(f"bf16       : {t_bf16*1e3:8.2f} ms  {flops/t_bf16/1e12:6.1f} TF/s")

    # int8 quantization (per-tensor; production would be per-head)
    q32, k32 = np.asarray(q, np.float32), np.asarray(k, np.float32)
    sq = np.abs(q32).max() / 127.0
    sk_ = np.abs(k32).max() / 127.0
    q_i8 = jnp.asarray(np.round(q32 / sq), jnp.int8)
    k_i8 = jnp.asarray(np.round(k32 / sk_), jnp.int8)
    deq = float(sq * sk_)

    t_i8 = timeit(lambda: _int8_flash(q_i8, k_i8, v, sm_scale, deq, s,
                                      blk_q, blk_k), args.iters)
    print(f"int8-qk    : {t_i8*1e3:8.2f} ms  {flops/t_i8/1e12:6.1f} TF/s "
          f"({t_bf16/t_i8:.2f}x)")

    sv = np.abs(np.asarray(v, np.float32)).max() / 127.0
    v_i8 = jnp.asarray(np.round(np.asarray(v, np.float32) / sv), jnp.int8)
    t_i8pv = timeit(lambda: _int8_flash(q_i8, k_i8, v_i8, sm_scale, deq, s,
                                        blk_q, blk_k, int8_pv=True),
                    args.iters)
    # note: int8-pv output is scaled by sv vs the others (skip rescale in bench)
    print(f"int8-qk-pv : {t_i8pv*1e3:8.2f} ms  {flops/t_i8pv/1e12:6.1f} TF/s "
          f"({t_bf16/t_i8pv:.2f}x)")

    # quick numerics check for the int8-qk variant
    o_ref = np.asarray(_flash_padded(q, k, v, sm_scale, s, blk_q, blk_k),
                       np.float32)[:, :s]
    o_i8 = np.asarray(_int8_flash(q_i8, k_i8, v, sm_scale, deq, s,
                                  blk_q, blk_k), np.float32)[:, :s]
    err = np.abs(o_i8 - o_ref).mean() / (np.abs(o_ref).mean() + 1e-9)
    cos = (o_i8.ravel() @ o_ref.ravel()) / (
        np.linalg.norm(o_i8) * np.linalg.norm(o_ref) + 1e-9)
    print(f"int8-qk numerics: rel-L1 {err:.4f}, cos {cos:.6f}")


if __name__ == "__main__":
    main()

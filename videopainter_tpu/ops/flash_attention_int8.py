"""int8 (SageAttention-style) flash attention forward for TPU.

The denoise step is dominated by the flash kernel (119 ms/layer = 60% at
flagship dims) which sits at the bf16 MXU ceiling for d=64 (CLAUDE.md). The
v5e MXU runs int8 at 2x the bf16 rate, so quantizing the QK^T operands (and
optionally P·V) buys kernel headroom that no bf16 scheduling can.

Method (SageAttention, arXiv:2410.02367 — validated on CogVideoX):
 - K is mean-centered along the sequence before quantization. Subtracting a
   per-(batch,head) constant vector from every key shifts each query's score
   row uniformly, which softmax ignores — EXACT transformation, and it
   removes the common-mode component that otherwise wastes int8 range.
 - Q and centered K are quantized PER BLOCK (the kernel's blk_q/blk_k tiles)
   with symmetric scales max|x|/127 — an outlier token only poisons its own
   block's scale, not the whole head. QK^T runs on the int8 MXU path with
   int32 accumulation and is dequantized into the fp32 online softmax with
   the per-(q-block, k-block) scale product.
 - Optional int8 P·V: P in (0,1] is quantized with the fixed scale 127 and V
   per k-block; slightly lossier, so it is a separate opt-in.

Inference-only: no custom VJP (training uses the bf16 flash kernel — the
quantization round has no useful gradient).

Reference behavior replaced: torch SDPA over the joint sequence
(attention_processor.py:2097-2211); this kernel keeps the same contract as
ops/flash_attention.py (bidirectional, padded+masked keys).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG_INF, _ceil_to, _kv_valid

__all__ = ["flash_attention_int8"]


def _int8_flash_kernel(deq_q_ref, deq_k_ref, q_ref, k_ref, v_ref, o_ref,
                       m_ref, l_ref, acc_ref, *,
                       sm_scale: float, kv_len: int, int8_pv: bool,
                       kv_page_len=None, kv_total=0):
    """Grid (bh, nq, nk) like the bf16 kernel. deq_q_ref is the current
    q-block's [8, 128] (row-replicated) scale window (lane 0 = sq);
    deq_k_ref the current k-block's (lane 0 = sk, lane 1 = sv)."""
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
    deq_qk = deq_q_ref[0, 0] * deq_k_ref[0, 0]
    s = s_i32.astype(jnp.float32) * (sm_scale * deq_qk)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1) + j * blk_k
    s = jnp.where(_kv_valid(col, kv_len, kv_page_len, kv_total), s, NEG_INF)

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
        deq_pv = deq_k_ref[0, 1] * (1.0 / 127.0)
        acc_ref[:] = acc_ref[:] * alpha + pv.astype(jnp.float32) * deq_pv
    else:
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_len", "blk_q",
                                             "blk_k", "int8_pv", "out_dtype",
                                             "kv_page_len", "kv_total"))
def _int8_flash_padded(deq_q, deq_k, q_i8, k_i8, v, sm_scale, kv_len,
                       blk_q, blk_k, int8_pv, out_dtype,
                       kv_page_len=None, kv_total=0):
    bh, s_q, d = q_i8.shape
    s_k = k_i8.shape[1]
    qspec = pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    # scale tables are stored 8x row-replicated ([bh, n*8, 128]) so the
    # per-block (8, 128) window satisfies Mosaic's second-minor divisibility
    # rule — a (1, 128) block only lowers in interpret mode (CLAUDE.md)
    dqspec = pl.BlockSpec((None, 8, 128), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    dkspec = pl.BlockSpec((None, 8, 128), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_int8_flash_kernel, sm_scale=sm_scale,
                          kv_len=kv_len, int8_pv=int8_pv,
                          kv_page_len=kv_page_len, kv_total=kv_total),
        grid=(bh, s_q // blk_q, s_k // blk_k),
        in_specs=[dqspec, dkspec, qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )(deq_q, deq_k, q_i8, k_i8, v)


def _block_quantize(x32: jnp.ndarray, blk: int):
    """x32: [B, H, S_pad, d] f32 → (int8 same shape, scales [B, H, S_pad//blk])
    with per-(b, h, block) symmetric scales max|x|/127."""
    b, h, sp, d = x32.shape
    xb = x32.reshape(b, h, sp // blk, blk, d)
    sc = jnp.maximum(jnp.max(jnp.abs(xb), axis=(3, 4)) / 127.0, 1e-8)
    x_i8 = jnp.round(xb / sc[..., None, None]).astype(jnp.int8)
    return x_i8.reshape(b, h, sp, d), sc


def flash_attention_int8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: Optional[float] = None, *, blk_q: int = 512,
                         blk_k: int = 2048, int8_pv: bool = False,
                         kv_len: Optional[int] = None,
                         kv_page_len: Optional[int] = None) -> jnp.ndarray:
    """int8-QK^T flash attention. q, k, v: [B, H, S, D] (bf16/f32 in, same out).

    Quantization (K mean-centering + per-block symmetric int8) happens here
    and fuses into the caller's XLA program; the Pallas kernel consumes int8
    operands. Forward/inference only — use `flash_attention` for training:
    differentiating through the int8 round would silently produce zero
    gradients, so the custom_vjp below fails loudly under autodiff instead.

    kv_len: number of valid keys when k/v arrive pre-padded (the resident
    padded-sequence path). The K mean-centering then includes the padded tail
    rows — still EXACT (any per-(b,h) constant shift is softmax-invariant);
    only the int8 scale quality of the last block is marginally affected.

    kv_page_len: paged validity for concatenated pre-padded KV pages (the
    ID-resample masked-KV page) — valid(i) = (i < S_k) & (i % kv_page_len
    < kv_len); see ops/flash_attention._kv_valid.
    """

    @jax.custom_vjp
    def run(q, k, v):
        return _int8_flash_impl(q, k, v, scale, blk_q=blk_q, blk_k=blk_k,
                                int8_pv=int8_pv, kv_len=kv_len,
                                kv_page_len=kv_page_len)

    def _fwd(q, k, v):
        return run(q, k, v), None

    def _bwd(res, g):
        raise NotImplementedError(
            "flash_attention_int8 is inference-only (no useful gradient "
            "through int8 rounding); use use_flash=True for training")

    run.defvjp(_fwd, _bwd)
    return run(q, k, v)


def _int8_flash_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: Optional[float], *, blk_q: int, blk_k: int,
                     int8_pv: bool, kv_len: Optional[int] = None,
                     kv_page_len: Optional[int] = None) -> jnp.ndarray:
    if kv_page_len is not None and kv_len is None:
        raise ValueError("kv_page_len requires kv_len")
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    sqp = _ceil_to(s_q, blk_q)
    skp = _ceil_to(s_k, blk_k)

    # exact: per-(b,h) mean-centering of K along S shifts all scores of a
    # query row by the same constant -> softmax-invariant
    k32 = k.astype(jnp.float32)
    k_c = k32 - jnp.mean(k32, axis=2, keepdims=True)
    q32 = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (0, sqp - s_q), (0, 0)))
    k_c = jnp.pad(k_c, ((0, 0), (0, 0), (0, skp - s_k), (0, 0)))

    q_i8, sq = _block_quantize(q32, blk_q)          # sq: [B, H, nq]
    k_i8, sk = _block_quantize(k_c, blk_k)          # sk: [B, H, nk]
    nq, nk = sqp // blk_q, skp // blk_k

    if int8_pv:
        v32 = jnp.pad(v.astype(jnp.float32),
                      ((0, 0), (0, 0), (0, skp - s_k), (0, 0)))
        v_in, sv = _block_quantize(v32, blk_k)      # sv: [B, H, nk]
        v_in = v_in.reshape(b * h, skp, d)
    else:
        sv = jnp.ones((b, h, nk), jnp.float32)
        v_in = jnp.pad(v, ((0, 0), (0, 0), (0, skp - s_k), (0, 0))
                       ).reshape(b * h, skp, v.shape[-1])

    q_i8 = q_i8.reshape(b * h, sqp, d)
    k_i8 = k_i8.reshape(b * h, skp, d)

    # scale tables: [bh, nblocks*8, 128] — each block's scale row replicated
    # 8x so the kernel's (8, 128) block window lowers on real Mosaic (lane 0
    # = s, lane 1 = sv)
    rep = lambda s, n: jnp.repeat(s.reshape(b * h, n), 8, axis=1)
    deq_q = jnp.zeros((b * h, nq * 8, 128), jnp.float32
                      ).at[:, :, 0].set(rep(sq, nq))
    deq_k = jnp.zeros((b * h, nk * 8, 128), jnp.float32
                      ).at[:, :, 0].set(rep(sk, nk))
    deq_k = deq_k.at[:, :, 1].set(rep(sv, nk))

    out = _int8_flash_padded(deq_q, deq_k, q_i8, k_i8, v_in, float(scale),
                             kv_len if kv_len is not None else s_k,
                             blk_q, blk_k, int8_pv, q.dtype,
                             kv_page_len=kv_page_len, kv_total=s_k)
    return out.reshape(b, h, -1, d)[:, :, :s_q]

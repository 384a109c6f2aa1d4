"""Flash attention for TPU — Pallas forward kernel + differentiable chunked
fallback.

The reference runs torch SDPA over the 17,776-token joint [text ‖ video]
sequence (attention_processor.py:2097-2211); naively materializing the score
matrix at that length costs ~120 GB — the Pallas kernel streams KV blocks with
an online softmax so VMEM holds only (blk_q x blk_k) score tiles, and HBM
traffic is O(S·D).

Design (pallas_guide.md):
 - grid = (B*H, S_q / BLK_Q); K/V live in VMEM per (batch, head) program
 - fp32 running max/sum/accumulator; bf16 inputs hit the MXU
 - sequence lengths padded to the block size; padded keys masked with -inf
   at compile time (static shapes — no scalar prefetch needed)

`chunked_attention` is the pure-JAX lax.scan equivalent: same online softmax,
fully differentiable (training path), remat-friendly, no S^2 memory.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, kv_len: int):
    """Grid (bh, nq, nk): innermost nk streams KV blocks; online-softmax state
    (m, l, acc) lives in VMEM scratch that persists across the nk iterations."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    blk_q, d = q_ref.shape
    blk_k = k_ref.shape[0]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16 inputs straight into the MXU with fp32 accumulation (an f32 x f32
    # matmul costs multiple MXU passes); scale applied to the f32 scores.
    s = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1) + j * blk_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]                       # [BLK_Q, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_len", "blk_q", "blk_k"))
def _flash_padded(q, k, v, scale, kv_len, blk_q, blk_k):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=kv_len),
        grid=(bh, s_q // blk_q, s_k // blk_k),
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),   # running max
            pltpu.VMEM((blk_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((blk_q, d), jnp.float32),     # output accumulator
        ],
    )(q, k, v)
    return out


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None, *, blk_q: int = 512,
                    blk_k: int = 2048) -> jnp.ndarray:
    """Bidirectional flash attention. q, k, v: [B, H, S, D]. Returns [B, H, S, D].

    Pads sequence lengths to block multiples; padded keys are masked, padded
    queries sliced off. Inference forward path — for training use
    chunked_attention (differentiable).
    """
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    sqp = _ceil_to(s_q, blk_q)
    skp = _ceil_to(s_k, blk_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sqp - s_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skp - s_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skp - s_k), (0, 0)))
    qf = qp.reshape(b * h, sqp, d)
    kf = kp.reshape(b * h, skp, d)
    vf = vp.reshape(b * h, skp, d)
    out = _flash_padded(qf, kf, vf, float(scale), s_k, blk_q, blk_k)
    return out.reshape(b, h, sqp, d)[:, :, :s_q]


# ---------------------------------------------------------------------------
# Differentiable chunked attention (training / fallback)
# ---------------------------------------------------------------------------

def chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: Optional[float] = None, *,
                      chunk: int = 1024) -> jnp.ndarray:
    """Memory-efficient attention via lax.scan over KV chunks (online softmax).

    Differentiable; never materializes the [S_q, S_k] matrix. fp32 statistics.
    """
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    skp = _ceil_to(s_k, chunk)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skp - s_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skp - s_k), (0, 0)))
    nk = skp // chunk
    kc = kp.reshape(b, h, nk, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = vp.reshape(b, h, nk, chunk, d).transpose(2, 0, 1, 3, 4)
    qs = q.astype(jnp.float32) * scale

    col_base = jnp.arange(chunk)

    def body(carry, xs):
        m_prev, l_prev, acc = carry
        kb, vb, idx = xs
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        valid = (col_base + idx * chunk) < s_k
        s = jnp.where(valid[None, None, None, :], s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc), None

    m0 = jnp.full((b, h, s_q), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, s_q), dtype=jnp.float32)
    acc0 = jnp.zeros((b, h, s_q, d), dtype=jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0),
                                  (kc, vc, jnp.arange(nk)))
    return (acc / l[..., None]).astype(q.dtype)

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
   at compile time (static shapes — no scalar prefetch needed).
   DO NOT switch to a ceil-div ("ragged") grid: Mosaic masks out-of-bounds
   WRITES on edge blocks but does not guarantee OOB READ safety — the tail
   KV DMA can cross into an unmapped page and hard-fault the device
   (reproduced twice inside the 42L denoise scan, layout-dependent; the
   pad copies measured time-NEUTRAL at flagship dims: 9211 vs 9213 ms/step)

`flash_attention` is differentiable: a custom VJP with two Pallas backward
kernels (dq and dk/dv) that recompute probabilities from the forward's
logsumexp. Both backward kernels compute scores TRANSPOSED ([blk_k, blk_q],
queries on lanes) so the per-query lse/delta rows broadcast along sublanes
for free - no [seq, 128] stat materialization like the bundled jax kernel.

`chunked_attention` is the pure-JAX lax.scan equivalent: same online softmax,
fully differentiable, remat-friendly, no S^2 memory (CPU-friendly fallback).
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

def _kv_valid(col, kv_len: int, kv_page_len, kv_total):
    """Key-validity mask shared by all kernels.

    Plain mode (kv_page_len None): keys [0, kv_len) are valid — the resident
    padded-sequence contract for a single KV segment.
    Paged mode: K is a concatenation of equal-length pages of kv_page_len
    rows, each valid up to kv_len (the ID-resample processor concatenates the
    masked-KV page onto the padded joint sequence — ops/attention.py). The
    extra `col < kv_total` cap is REQUIRED: _pad_qkv pads the concatenated K
    to the block multiple, and those tail rows would otherwise alias into
    valid page offsets under the modulo."""
    if kv_page_len is None:
        return col < kv_len
    return (col < kv_total) & (jax.lax.rem(col, kv_page_len) < kv_len)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *refs,
                  scale: float, kv_len: int, kv_page_len=None, kv_total=0,
                  with_lse: bool = False):
    """Grid (bh, nq, nk): innermost nk streams KV blocks; online-softmax state
    (m, l, acc) lives in VMEM scratch that persists across the nk iterations."""
    if with_lse:
        lse_ref, m_ref, l_ref, acc_ref = refs
    else:
        m_ref, l_ref, acc_ref = refs
        lse_ref = None
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
    s = jnp.where(_kv_valid(col, kv_len, kv_page_len, kv_total), s, NEG_INF)

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
        if lse_ref is not None:
            lse_ref[:] = m_ref[:] + jnp.log(l_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("scale", "kv_len", "blk_q", "blk_k",
                                    "with_lse", "kv_page_len", "kv_total"))
def _flash_padded(q, k, v, scale, kv_len, blk_q, blk_k, with_lse=False,
                  kv_page_len=None, kv_total=0):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    qspec = pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [qspec]
    if with_lse:
        # lse broadcast over 128 lanes (the scratch layout) - sliced to
        # [bh, s_q] right after the call, so the HBM cost is transient
        out_shapes.append(jax.ShapeDtypeStruct((bh, s_q, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((None, blk_q, 128),
                                      lambda b, i, j: (b, i, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=kv_len,
                          kv_page_len=kv_page_len, kv_total=kv_total,
                          with_lse=with_lse),
        grid=(bh, s_q // blk_q, s_k // blk_k),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shapes if with_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),   # running max
            pltpu.VMEM((blk_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((blk_q, d), jnp.float32),     # output accumulator
        ],
    )(q, k, v)
    if with_lse:
        out, lse = res
        return out, lse[:, :, 0]
    return res


# ---------------------------------------------------------------------------
# Pallas backward kernels (transposed-scores design)
# ---------------------------------------------------------------------------
#
# dO . O rowsum `delta` and the forward logsumexp `lse` are [bh, s_q] arrays;
# both kernels compute scores as s_t = K @ Q^T, i.e. [blk_k, blk_q] with the
# QUERY index on lanes, so lse/delta blocks ([blk_q] lanes vectors) broadcast
# along sublanes for free and p = exp(s_t - lse) is already normalized.

def _flash_dq_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dlt_ref, dq_ref,
                     acc_ref, *, scale: float, kv_len: int, kv_page_len=None,
                     kv_total=0):
    """Grid (bh, nq, nk): stream KV blocks, accumulate dQ for one Q block."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    blk_k = k_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_t = jax.lax.dot_general(k_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0) + j * blk_k
    p_t = jnp.where(_kv_valid(row, kv_len, kv_page_len, kv_total),
                    jnp.exp(s_t - lse_ref[0:1, :]), 0.0)
    dp_t = jax.lax.dot_general(v_ref[:], do_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_t = p_t * (dp_t - dlt_ref[0:1, :]) * scale
    # dq[blk_q, d] += ds_t^T @ k  (contract the kv sublane dim of both)
    acc_ref[:] += jax.lax.dot_general(
        ds_t.astype(k_ref.dtype), k_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[:] = acc_ref[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dlt_ref,
                      dk_ref, dv_ref, dk_acc, dv_acc, *,
                      scale: float, kv_len: int, kv_page_len=None,
                      kv_total=0):
    """Grid (bh, nk, nq): stream Q blocks, accumulate dK/dV for one KV block.

    Zero-padded queries contribute nothing: their dO rows are zero (kills dV)
    and their delta/dp are zero (kills dS, hence dK)."""
    j = pl.program_id(2)
    nq = pl.num_programs(2)
    blk_k = k_ref.shape[0]

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    s_t = jax.lax.dot_general(k_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0) +         pl.program_id(1) * blk_k
    p_t = jnp.where(_kv_valid(row, kv_len, kv_page_len, kv_total),
                    jnp.exp(s_t - lse_ref[0:1, :]), 0.0)
    dv_acc[:] += jax.lax.dot_general(
        p_t.astype(do_ref.dtype), do_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_t = jax.lax.dot_general(v_ref[:], do_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_t = p_t * (dp_t - dlt_ref[0:1, :]) * scale
    dk_acc[:] += jax.lax.dot_general(
        ds_t.astype(q_ref.dtype), q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nq - 1)
    def _():
        dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_len", "blk_q",
                                             "blk_k", "kv_page_len",
                                             "kv_total"))
def _flash_bwd_padded(q, k, v, do, lse, delta, scale, kv_len, blk_q, blk_k,
                      kv_page_len=None, kv_total=0):
    bh, sqp, d = q.shape
    skp = k.shape[1]
    kvspec = pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    # lse/delta arrive as [bh, 8, sqp] (8 redundant sublane copies - mosaic
    # requires >=2D blocks with (8, 128)-divisible trailing dims); queries
    # stay on lanes so rows broadcast against the transposed score tiles
    vecspec = pl.BlockSpec((None, 8, blk_q), lambda b, i, j: (b, 0, i),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, kv_len=kv_len,
                          kv_page_len=kv_page_len, kv_total=kv_total),
        grid=(bh, sqp // blk_q, skp // blk_k),
        in_specs=[kvspec, kvspec, qspec, qspec, vecspec, vecspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
    )(k, v, q, do, lse, delta)

    kvspec2 = pl.BlockSpec((None, blk_k, d), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    qspec2 = pl.BlockSpec((None, blk_q, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    vecspec2 = pl.BlockSpec((None, 8, blk_q), lambda b, i, j: (b, 0, j),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, kv_len=kv_len,
                          kv_page_len=kv_page_len, kv_total=kv_total),
        grid=(bh, skp // blk_k, sqp // blk_q),
        in_specs=[kvspec2, kvspec2, qspec2, qspec2, vecspec2, vecspec2],
        out_specs=[kvspec2, kvspec2],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((blk_k, d), jnp.float32),
                        pltpu.VMEM((blk_k, d), jnp.float32)],
    )(k, v, q, do, lse, delta)
    return dq, dk, dv


def _pad_qkv(q, k, v, blk_q, blk_k):
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    sqp = _ceil_to(s_q, blk_q)
    skp = _ceil_to(s_k, blk_k)
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, sqp - s_q), (0, 0))).reshape(b * h, sqp, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, skp - s_k), (0, 0))).reshape(b * h, skp, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, skp - s_k), (0, 0))).reshape(b * h, skp, d)
    return qf, kf, vf


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, scale, blk_q, blk_k, bwd_blk_k, kv_len, kv_page_len):
    b, h, s_q, d = q.shape
    kv_total = k.shape[2]
    qf, kf, vf = _pad_qkv(q, k, v, blk_q, blk_k)
    out = _flash_padded(qf, kf, vf, scale, kv_len, blk_q, blk_k,
                        kv_page_len=kv_page_len, kv_total=kv_total)
    return out.reshape(b, h, -1, d)[:, :, :s_q]


def _flash_fwd(q, k, v, scale, blk_q, blk_k, bwd_blk_k, kv_len, kv_page_len):
    b, h, s_q, d = q.shape
    kv_total = k.shape[2]
    qf, kf, vf = _pad_qkv(q, k, v, blk_q, blk_k)
    out, lse = _flash_padded(qf, kf, vf, scale, kv_len, blk_q, blk_k,
                             with_lse=True, kv_page_len=kv_page_len,
                             kv_total=kv_total)
    return (out.reshape(b, h, -1, d)[:, :, :s_q],
            (q, k, v, out, lse))


def _flash_bwd(scale, blk_q, blk_k, bwd_blk_k, kv_len, kv_page_len, res, g):
    q, k, v, out_p, lse = res
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    qf, kf, vf = _pad_qkv(q, k, v, blk_q, bwd_blk_k)
    sqp = qf.shape[1]
    dof = jnp.pad(g, ((0, 0), (0, 0), (0, sqp - s_q), (0, 0))
                  ).reshape(b * h, sqp, d)
    delta = jnp.sum(dof.astype(jnp.float32) * out_p.astype(jnp.float32),
                    axis=-1)                                   # [bh, sqp]
    lse8 = jnp.broadcast_to(lse[:, None, :], (lse.shape[0], 8, lse.shape[1]))
    dlt8 = jnp.broadcast_to(delta[:, None, :],
                            (delta.shape[0], 8, delta.shape[1]))
    dq, dk, dv = _flash_bwd_padded(qf, kf, vf, dof, lse8, dlt8, scale, kv_len,
                                   blk_q, bwd_blk_k,
                                   kv_page_len=kv_page_len, kv_total=s_k)
    dq = dq.reshape(b, h, sqp, d)[:, :, :s_q]
    dk = dk.reshape(b, h, -1, d)[:, :, :s_k]
    dv = dv.reshape(b, h, -1, d)[:, :, :s_k]
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             scale: Optional[float] = None, *,
                             blk_q: int = 512, blk_k: int = 2048,
                             kv_len: Optional[int] = None):
    """Forward-only flash attention returning (out, lse) with
    lse = logsumexp of the scaled scores per query row - the merge state for
    ring attention (parallel/ring_attention.py combines shards in
    (out, lse) space)."""
    b, h, s_q, d = q.shape
    if scale is None:
        scale = d ** -0.5
    qf, kf, vf = _pad_qkv(q, k, v, blk_q, blk_k)
    out, lse = _flash_padded(qf, kf, vf, float(scale),
                             kv_len if kv_len is not None else k.shape[2],
                             blk_q, blk_k, with_lse=True)
    out = out.reshape(b, h, -1, d)[:, :, :s_q]
    lse = lse.reshape(b, h, -1)[:, :, :s_q]
    return out, lse


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None, *, blk_q: int = 512,
                    blk_k: int = 2048, bwd_blk_k: int = 2048,
                    kv_len: Optional[int] = None,
                    kv_page_len: Optional[int] = None) -> jnp.ndarray:
    """Bidirectional flash attention. q, k, v: [B, H, S, D]. Returns [B, H, S, D].

    Pads sequence lengths to block multiples; padded keys are masked, padded
    queries sliced off. Differentiable (custom VJP with Pallas backward
    kernels); `chunked_attention` remains as the pure-JAX fallback.

    kv_len: number of VALID keys when k/v arrive pre-padded (the resident
    padded-sequence fast path — models/dit.py pads the joint sequence ONCE
    to the block multiple instead of per layer, and keys beyond kv_len are
    masked exactly as the per-layer padding used to be). Default: all of S_k.

    kv_page_len: when K is a concatenation of equal-length pre-padded PAGES
    (the ID-resample processor appends the masked-KV page to the padded
    joint sequence), each page of kv_page_len rows is valid up to kv_len:
    valid(i) = (i < S_k) & (i % kv_page_len < kv_len). Requires kv_len.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if kv_page_len is not None and kv_len is None:
        raise ValueError("kv_page_len requires kv_len")
    return _flash(q, k, v, float(scale), blk_q, blk_k, bwd_blk_k,
                  kv_len if kv_len is not None else k.shape[2], kv_page_len)


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

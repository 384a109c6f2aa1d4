"""GSPMD sharding rules for the parameter pytrees.

Tensor-parallel layout (megatron-style) over the `model` axis for the DiT
blocks (the FLOP-dominant 95% of parameters):
 - attention to_q/to_k/to_v kernels [L, D_in, D_out]: shard D_out (head dim)
 - attention to_out kernel:                           shard D_in
 - ff proj_in kernel [L, D, 4D]:                      shard hidden (out)
 - ff proj_out kernel [L, 4D, D]:                     shard hidden (in)
 - norms / AdaLN modulation / embeddings:             replicated
VAE: replicated (memory-bound; spatial tiling + frame batching handle scale).

ZeRO-2 analog: optimizer moments for stacked-block leaves additionally shard
the leading layer axis over `data` — parameters stay replicated while
optimizer state is distributed, matching the reference's DeepSpeed stage-2
semantics (train/accelerate_config_machine_single_ds.yaml:3-11, SURVEY.md §2f).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES

M = AXES.model
D = AXES.data
S = AXES.seq

# leaf-name -> spec builders, keyed by the path suffix inside a DiT block.
_BLOCK_RULES = {
    ("attn1", "to_q", "kernel"): P(None, None, M),
    ("attn1", "to_k", "kernel"): P(None, None, M),
    ("attn1", "to_v", "kernel"): P(None, None, M),
    ("attn1", "to_q", "bias"): P(None, M),
    ("attn1", "to_k", "bias"): P(None, M),
    ("attn1", "to_v", "bias"): P(None, M),
    ("attn1", "to_out", "kernel"): P(None, M, None),
    ("ff", "proj_in", "kernel"): P(None, None, M),
    ("ff", "proj_in", "bias"): P(None, M),
    ("ff", "proj_out", "kernel"): P(None, M, None),
}

# int8-quantized linears (quantize.quantize_transformer_int8): kernel_q keeps
# the [L, in, out] kernel layout; kscale is per-OUT-channel [L, out], so it
# shards with the out axis (and stays replicated where `out` is the
# replicated axis, i.e. the row-parallel to_out / ff.proj_out). The exactness
# argument for TP int8: the per-token dynamic amax reduces over the full
# hidden axis (GSPMD inserts the max-collective when that axis is sharded),
# and the row-parallel partial int32 sums are scaled per shard before the
# psum — scale-then-add == add-then-scale since kscale columns are complete
# on every shard. `ascale` (static [L]) is always replicated.
for _tgt, _kspec, _sspec in [
        (("attn1", "to_q"), P(None, None, M), P(None, M)),
        (("attn1", "to_k"), P(None, None, M), P(None, M)),
        (("attn1", "to_v"), P(None, None, M), P(None, M)),
        (("attn1", "to_qkv"), P(None, None, M), P(None, M)),
        (("attn1", "to_out"), P(None, M, None), P()),
        (("ff", "proj_in"), P(None, None, M), P(None, M)),
        (("ff", "proj_out"), P(None, M, None), P())]:
    _BLOCK_RULES[_tgt + ("kernel_q",)] = _kspec
    _BLOCK_RULES[_tgt + ("kscale",)] = _sspec
# fused-QKV bf16 kernel (fuse_qkv_projections): column-parallel like q/k/v
_BLOCK_RULES[("attn1", "to_qkv", "kernel")] = P(None, None, M)
_BLOCK_RULES[("attn1", "to_qkv", "bias")] = P(None, M)


def _spec_for_path(path) -> P:
    keys = tuple(getattr(k, "key", None) for k in path)
    if "blocks" in keys:
        i = keys.index("blocks")
        suffix = keys[i + 1:]
        for rule_suffix, spec in _BLOCK_RULES.items():
            if suffix == rule_suffix:
                return spec
    return P()


def transformer_param_specs(params: dict) -> dict:
    """PartitionSpec tree mirroring a transformer/branch param tree."""
    return jax.tree_util.tree_map_with_path(lambda path, _: _spec_for_path(path), params)


def branch_param_specs(params: dict) -> dict:
    return transformer_param_specs(params)


def vae_param_specs(params: dict) -> dict:
    return jax.tree.map(lambda _: P(), params)


def activation_spec(batch_axis: bool = True, seq_axis: bool = False) -> P:
    """Latent activations [B, ...] / token sequences [B, S, D]."""
    if seq_axis:
        return P(D, S)
    return P(D) if batch_axis else P()


def optimizer_state_specs(param_specs: dict) -> dict:
    """ZeRO-2 analog: stacked-block moments shard their leading (layer) axis
    over `data`. Only applied to leaves that are block-stacked (spec rank >= 2
    with a free leading axis); everything else stays replicated."""

    def convert(spec: P):
        parts = list(spec)
        if len(parts) >= 2 and parts[0] is None:
            parts[0] = D
            return P(*parts)
        return spec

    return jax.tree.map(convert, param_specs, is_leaf=lambda x: isinstance(x, P))


def opt_state_specs(opt_state, params: dict, param_specs: dict):
    """Spec tree for an optax state whose moment trees mirror `params`.

    Any opt-state leaf whose key-path *suffix* matches a param leaf path gets
    that param's ZeRO-sharded spec (optimizer_state_specs); everything else
    (step counters, empty states) is replicated.
    """
    zero_specs = optimizer_state_specs(param_specs)

    def path_keys(path):
        out = []
        for k in path:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "name"):
                out.append(str(k.name))
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
        return tuple(out)

    param_map = {}
    for path, spec in jax.tree_util.tree_leaves_with_path(
            zero_specs, is_leaf=lambda x: isinstance(x, P)):
        param_map[path_keys(path)] = spec

    def spec_for(path, leaf):
        keys = path_keys(path)
        for plen in range(len(keys), 0, -1):
            suffix = keys[-plen:]
            if suffix in param_map:
                return param_map[suffix]
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)


def fit_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop spec axes whose mesh size doesn't divide the array dim (e.g. a
    2-layer stacked leaf on a data=4 mesh stays replicated on that dim)."""
    parts = list(spec) + [None] * (x.ndim - len(spec))
    out = []
    for dim, axis in zip(x.shape, parts):
        if axis is None:
            out.append(None)
            continue
        names = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        out.append(axis if size > 0 and dim % size == 0 else None)
    return P(*out)


def shard_params(params: dict, specs: dict, mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, fit_spec(x, s, mesh))),
        params, specs, is_leaf=lambda x: not isinstance(x, (dict, list)))

"""Opt-in int8 (W8A8) inference quantization.

TPU rationale: the per-layer profile splits ~119 ms flash attention /
~50 ms dense projections / ~18 ms padding overhead. The dense share runs at
the bf16 MXU roofline, so the remaining lever is the datapath itself — the
v5e MXU executes int8 x int8 -> int32 at twice the bf16 rate. This module
rewrites the DiT/branch block projections (attention q/k/v/out + both
feed-forward linears) into the `kernel_q` format that `ops.basic.linear`
dispatches on: per-out-channel weight scales, dynamic per-token activation
scales, int32 accumulation.

Quantization is OPT-IN and approximate (not parity-safe): norms, modulation,
patch/time embeds, and proj_out stay bf16/fp32 — they are tiny and numerically
sensitive. The reference has no quantized path (beyond-reference feature).

Usage:
    params["transformer"] = quantize_transformer_int8(params["transformer"])
    params["branch"] = quantize_transformer_int8(params["branch"])
"""

from __future__ import annotations

from typing import Iterable

from .ops.basic import quantize_linear_int8

# block-level projections worth quantizing: the big [D, D] / [D, 4D] matmuls
# ("to_qkv" is the fused-projection slot from fuse_qkv_projections)
_BLOCK_LINEARS = ("to_q", "to_k", "to_v", "to_qkv", "to_out",
                  "proj_in", "proj_out")


def _quantize_block_tree(tree: dict, free_source: bool) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            if k in _BLOCK_LINEARS and "kernel" in v:
                out[k] = quantize_linear_int8(v, free_source=free_source)
            else:
                out[k] = _quantize_block_tree(v, free_source)
        else:
            out[k] = v
    return out


def quantize_transformer_int8(params: dict,
                              subtrees: Iterable[str] = ("blocks",),
                              *, free_source: bool = False) -> dict:
    """Quantize the stacked block projections of a DiT/branch param tree.

    Only descends into `subtrees` (default: the scan-stacked "blocks") so
    embeddings, norms, and output heads keep full precision.

    free_source=True drops each source kernel from `params` (mutating it) as
    its int8 copy lands — required to quantize a full 42-layer model in place
    on one 16 GB chip, where holding the bf16 and int8 trees simultaneously
    exceeds HBM.
    """
    out = dict(params)
    for name in subtrees:
        if name in params:
            out[name] = _quantize_block_tree(params[name], free_source)
    return out

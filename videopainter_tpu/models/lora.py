"""LoRA for the DiT attention projections (VideoPainterID adapter).

The reference trains a rank-256 (alpha=128) LoRA on the backbone's
to_q/to_k/to_v/to_out.0 via peft (train_cogvideox_inpainting_i2v_video_resample.py,
LoraConfig target_modules; loaded at inference via
pipe.load_lora_weights(..., adapter_name="test_1"), infer/inpaint.py:294-319).

TPU-native design: two modes —
 - `merge_lora`: fold W + (alpha/r)·A·B into the base kernels once, host-side
   (inference; zero runtime cost).
 - `apply_lora` trainable pytree: keep (A, B) separate for training; the train
   step computes y = x·W + (alpha/r)·(x·A)·B with only A/B trainable.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def init_lora_params(key, base_params: dict, *, rank: int = 256,
                     dtype=jnp.float32) -> dict:
    """Zero-init LoRA tree mirroring params['blocks']['attn1'][target].

    A: kaiming-uniform-ish [L, d_in, r]; B: zeros [L, r, d_out]
    (standard LoRA init: product starts at zero)."""
    blocks = base_params["blocks"]["attn1"]
    out = {}
    keys = jax.random.split(key, len(LORA_TARGETS))
    for k, tgt in zip(keys, LORA_TARGETS):
        tp = blocks[tgt]
        # kernel_q: int8-quantized backbone (same [L, d_in, d_out] shape)
        kern = tp["kernel"] if "kernel" in tp else tp["kernel_q"]
        L, d_in, d_out = kern.shape
        bound = 1.0 / (d_in ** 0.5)
        a = jax.random.uniform(k, (L, d_in, rank), minval=-bound, maxval=bound).astype(dtype)
        b = jnp.zeros((L, rank, d_out), dtype=dtype)
        out[tgt] = {"lora_A": a, "lora_B": b}
    return out


def merge_lora(base_params: dict, lora_params: dict, *, alpha: float,
               rank: int, scale: float = 1.0) -> dict:
    """Return params with W <- W + scale*(alpha/rank)*A@B folded in."""
    factor = scale * alpha / rank
    params = jax.tree.map(lambda x: x, base_params)  # shallow copy tree
    attn = dict(params["blocks"]["attn1"])
    for tgt, ab in lora_params.items():
        delta = jnp.einsum("lir,lro->lio", ab["lora_A"], ab["lora_B"]) * factor
        tp = dict(attn[tgt])
        tp["kernel"] = tp["kernel"] + delta.astype(tp["kernel"].dtype)
        attn[tgt] = tp
    blocks = dict(params["blocks"])
    blocks["attn1"] = attn
    params = dict(params)
    params["blocks"] = blocks
    return params


def attach_lora(base_params: dict, lora_params: dict, *, alpha: float,
                rank: int, scale: float = 1.0) -> dict:
    """Thread (A, B) into the attn param tree as `lora` sub-entries so
    ops.basic.linear ADDS scale*(alpha/r)*(x@A)@B after each base projection.

    Same math as merge_lora, but structural: no [L, d, d] merged-kernel
    copies per call (merge is ~2.4 GB of transients at 42 layers), and it
    works on an int8-quantized backbone where there is no `kernel` to merge
    into (QLoRA-style training/serving). The per-target `scale` leaf is
    stacked [L] so the tree stays scannable. Attach AFTER
    quantize_transformer_int8 (quantize rebuilds the linear dicts) and do
    not combine with fuse_qkv_projections."""
    if "to_qkv" in base_params["blocks"]["attn1"]:
        raise ValueError("attach_lora targets to_q/to_k/to_v/to_out — do not "
                         "fuse QKV projections on a LoRA-adapted tree")
    factor = scale * alpha / rank
    params = dict(base_params)
    blocks = dict(params["blocks"])
    attn = dict(blocks["attn1"])
    for tgt, ab in lora_params.items():
        n_layers = ab["lora_A"].shape[0]
        tp = dict(attn[tgt])
        tp["lora"] = {"lora_A": ab["lora_A"], "lora_B": ab["lora_B"],
                      "scale": jnp.full((n_layers,), factor, jnp.float32)}
        attn[tgt] = tp
    blocks["attn1"] = attn
    params["blocks"] = blocks
    return params


def apply_lora_delta(lora_params: dict, tgt: str, layer_params: dict,
                     x: jnp.ndarray, layer_idx, *, alpha: float, rank: int) -> jnp.ndarray:
    """y_delta = (alpha/r) * (x @ A_l) @ B_l for use inside a scanned block."""
    a = jnp.take(lora_params[tgt]["lora_A"], layer_idx, axis=0)
    b = jnp.take(lora_params[tgt]["lora_B"], layer_idx, axis=0)
    return (x @ a.astype(x.dtype)) @ b.astype(x.dtype) * (alpha / rank)


# ---------------------------------------------------------------------------
# peft / diffusers checkpoint interop
# ---------------------------------------------------------------------------

_PEFT_RE = re.compile(
    r"transformer\.transformer_blocks\.(\d+)\.attn1\.(to_q|to_k|to_v|to_out)(?:\.0)?"
    r"\.lora_([AB])\.weight")


def convert_peft_lora_state_dict(sd: Dict[str, np.ndarray], num_layers: int,
                                 rank: int) -> dict:
    """diffusers save_lora_weights format -> our stacked LoRA pytree.

    torch lora_A.weight: [r, d_in] -> A [d_in, r]; lora_B.weight: [d_out, r]
    -> B [r, d_out]."""
    shapes: Dict[Tuple[str, str], np.ndarray] = {}
    for k, v in sd.items():
        m = _PEFT_RE.match(k)
        if not m:
            continue
        layer, tgt, ab = int(m.group(1)), m.group(2), m.group(3)
        shapes[(tgt, ab, layer)] = v
    out = {}
    for tgt in LORA_TARGETS:
        a_list, b_list = [], []
        for layer in range(num_layers):
            a = shapes.get((tgt, "A", layer))
            b = shapes.get((tgt, "B", layer))
            if a is None or b is None:
                raise KeyError(f"missing LoRA weights for layer {layer} target {tgt}")
            a_list.append(a.T)
            b_list.append(b.T)
        out[tgt] = {"lora_A": np.stack(a_list), "lora_B": np.stack(b_list)}
    return out


def export_peft_lora_state_dict(lora_params: dict) -> Dict[str, np.ndarray]:
    """Our pytree -> diffusers save_lora_weights naming (for interop)."""
    sd = {}
    for tgt, ab in lora_params.items():
        A, B = np.asarray(ab["lora_A"]), np.asarray(ab["lora_B"])
        suffix = ".0" if tgt == "to_out" else ""
        for layer in range(A.shape[0]):
            base = f"transformer.transformer_blocks.{layer}.attn1.{tgt}{suffix}"
            sd[f"{base}.lora_A.weight"] = np.ascontiguousarray(A[layer].T)
            sd[f"{base}.lora_B.weight"] = np.ascontiguousarray(B[layer].T)
    return sd

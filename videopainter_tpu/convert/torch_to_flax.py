"""PyTorch → videopainter_tpu weight conversion.

Maps the reference HF state-dict naming (cogvideox_transformer_3d.py,
branch_cogvideox.py, autoencoder_kl_cogvideox.py) onto our parameter pytrees:

 - Linear:   torch [out, in]           -> kernel [in, out] (transpose)
 - Conv2d patchify: torch [O, I, p, p] -> kernel [(p p I), O] (transpose(2,3,1,0))
 - Conv3d:  torch [O, I, kt, kh, kw]   -> kernel [kt, kh, kw, I, O] (DHWIO)
 - LayerNorm/GroupNorm: weight->scale, bias->bias
 - per-layer blocks stacked along a leading L axis (we scan over them)

Pure numpy — runs host-side once; outputs can then be device_put with shardings.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors in a HF model dir into one numpy state dict."""
    from safetensors import safe_open

    state = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return state


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _linear(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _norm(sd: Dict[str, np.ndarray], prefix: str) -> Optional[dict]:
    if f"{prefix}.weight" not in sd:
        return None
    p = {"scale": sd[f"{prefix}.weight"]}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv2d_patchify(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]  # [O, I, p, p]
    k = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # [p, p, I, O]
    k = k.reshape(-1, k.shape[-1])
    p = {"kernel": k}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _block(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    out = {
        "norm1": {"linear": _linear(sd, f"{prefix}.norm1.linear"),
                  "norm": _norm(sd, f"{prefix}.norm1.norm")},
        "attn1": {
            "to_q": _linear(sd, f"{prefix}.attn1.to_q"),
            "to_k": _linear(sd, f"{prefix}.attn1.to_k"),
            "to_v": _linear(sd, f"{prefix}.attn1.to_v"),
            "to_out": _linear(sd, f"{prefix}.attn1.to_out.0"),
        },
        "norm2": {"linear": _linear(sd, f"{prefix}.norm2.linear"),
                  "norm": _norm(sd, f"{prefix}.norm2.norm")},
        "ff": {"proj_in": _linear(sd, f"{prefix}.ff.net.0.proj"),
               "proj_out": _linear(sd, f"{prefix}.ff.net.2")},
    }
    nq = _norm(sd, f"{prefix}.attn1.norm_q")
    nk = _norm(sd, f"{prefix}.attn1.norm_k")
    if nq is not None:
        out["attn1"]["norm_q"] = nq
    if nk is not None:
        out["attn1"]["norm_k"] = nk
    return out


def _stack_blocks(blocks: list) -> dict:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def _num_layers(sd: Dict[str, np.ndarray], prefix: str) -> int:
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd for m in [pat.match(k)] if m}
    return max(idx) + 1 if idx else 0


def convert_transformer_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference CogVideoXTransformer3DModel state dict -> our param pytree."""
    n = _num_layers(sd, "transformer_blocks")
    params = {
        "patch_embed": _conv2d_patchify(sd, "patch_embed.proj"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "blocks": _stack_blocks([_block(sd, f"transformer_blocks.{i}") for i in range(n)]),
        "norm_final": _norm(sd, "norm_final"),
        "norm_out": {"linear": _linear(sd, "norm_out.linear"),
                     "norm": _norm(sd, "norm_out.norm")},
        "proj_out": _linear(sd, "proj_out"),
    }
    params["patch_embed"] = {"proj": params["patch_embed"],
                             "text_proj": _linear(sd, "patch_embed.text_proj")}
    if "patch_embed.pos_embedding" in sd:
        params["patch_embed"]["pos_embedding"] = sd["patch_embed.pos_embedding"]
    return params


def convert_branch_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference CogvideoXBranchModel state dict -> our param pytree."""
    params = convert_transformer_state_dict(sd)
    n = _num_layers(sd, "branch_blocks")
    params["branch_blocks"] = {
        "kernel": np.stack([_t(sd[f"branch_blocks.{i}.weight"]) for i in range(n)]),
        "bias": np.stack([sd[f"branch_blocks.{i}.bias"] for i in range(n)]),
    }
    if "branch_x_embedder.weight" in sd:
        params["branch_x_embedder"] = _linear(sd, "branch_x_embedder")
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _conv3d(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]  # [O, I, kt, kh, kw]
    k = np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))  # DHWIO
    p = {"kernel": k}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv2d(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]  # [O, I, kh, kw]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}  # HWIO
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _spatial_norm(sd, prefix) -> dict:
    return {
        "norm_layer": _norm(sd, f"{prefix}.norm_layer"),
        "conv_y": {"conv": _conv3d(sd, f"{prefix}.conv_y.conv")},
        "conv_b": {"conv": _conv3d(sd, f"{prefix}.conv_b.conv")},
    }


def _resnet3d(sd, prefix, *, spatial_norm: bool) -> dict:
    out = {
        "conv1": {"conv": _conv3d(sd, f"{prefix}.conv1.conv")},
        "conv2": {"conv": _conv3d(sd, f"{prefix}.conv2.conv")},
    }
    if spatial_norm:
        out["norm1"] = _spatial_norm(sd, f"{prefix}.norm1")
        out["norm2"] = _spatial_norm(sd, f"{prefix}.norm2")
    else:
        out["norm1"] = _norm(sd, f"{prefix}.norm1")
        out["norm2"] = _norm(sd, f"{prefix}.norm2")
    if f"{prefix}.conv_shortcut.conv.weight" in sd:
        out["conv_shortcut"] = {"conv": _conv3d(sd, f"{prefix}.conv_shortcut.conv")}
    elif f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv3d(sd, f"{prefix}.conv_shortcut")
    return out


def convert_vae_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference AutoencoderKLCogVideoX state dict -> our param pytree."""
    enc: dict = {"conv_in": {"conv": _conv3d(sd, "encoder.conv_in.conv")},
                 "down_blocks": [], "mid_block": {"resnets": []},
                 "norm_out": _norm(sd, "encoder.norm_out"),
                 "conv_out": {"conv": _conv3d(sd, "encoder.conv_out.conv")}}
    n_down = _num_layers(sd, "encoder.down_blocks")
    for i in range(n_down):
        dp = f"encoder.down_blocks.{i}"
        nres = _num_layers(sd, f"{dp}.resnets")
        blk = {"resnets": [_resnet3d(sd, f"{dp}.resnets.{j}", spatial_norm=False)
                           for j in range(nres)]}
        if f"{dp}.downsamplers.0.conv.weight" in sd:
            blk["downsampler"] = {"conv": _conv2d(sd, f"{dp}.downsamplers.0.conv")}
        enc["down_blocks"].append(blk)
    nmid = _num_layers(sd, "encoder.mid_block.resnets")
    enc["mid_block"]["resnets"] = [
        _resnet3d(sd, f"encoder.mid_block.resnets.{j}", spatial_norm=False) for j in range(nmid)]

    dec: dict = {"conv_in": {"conv": _conv3d(sd, "decoder.conv_in.conv")},
                 "up_blocks": [], "mid_block": {"resnets": []},
                 "norm_out": _spatial_norm(sd, "decoder.norm_out"),
                 "conv_out": {"conv": _conv3d(sd, "decoder.conv_out.conv")}}
    nmid = _num_layers(sd, "decoder.mid_block.resnets")
    dec["mid_block"]["resnets"] = [
        _resnet3d(sd, f"decoder.mid_block.resnets.{j}", spatial_norm=True) for j in range(nmid)]
    n_up = _num_layers(sd, "decoder.up_blocks")
    for i in range(n_up):
        up = f"decoder.up_blocks.{i}"
        nres = _num_layers(sd, f"{up}.resnets")
        blk = {"resnets": [_resnet3d(sd, f"{up}.resnets.{j}", spatial_norm=True)
                           for j in range(nres)]}
        if f"{up}.upsamplers.0.conv.weight" in sd:
            blk["upsampler"] = {"conv": _conv2d(sd, f"{up}.upsamplers.0.conv")}
        dec["up_blocks"].append(blk)

    return {"encoder": enc, "decoder": dec}

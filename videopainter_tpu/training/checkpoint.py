"""Checkpoint save / rotate / resume (orbax) + HF-format export.

Reference behaviors (train_...video.py):
 - save every `checkpointing_steps` with `checkpoints_total_limit` rotation
   (:1912-1933)
 - `--resume_from_checkpoint latest` scans checkpoint-* dirs (:1694-1719)
 - branch exported as an HF save_pretrained-style dir (safetensors shards,
   :1468-1482); LoRA as pytorch_lora_weights.safetensors via
   save_lora_weights (resample trainer)

TPU-native: orbax PyTreeCheckpointer for train state (params + opt state +
step, sharding-aware); export helpers write reference-compatible safetensors
so checkpoints interop both ways with the torch stack.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax train-state checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(output_dir: str, step: int, state, *,
                    total_limit: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    if total_limit is not None:
        rotate_checkpoints(output_dir, total_limit)
    return path


def rotate_checkpoints(output_dir: str, total_limit: int) -> None:
    """Delete oldest checkpoint-* dirs beyond the limit (reference :1912-1933)."""
    ckpts = sorted(
        (d for d in os.listdir(output_dir) if re.fullmatch(r"checkpoint-\d+", d)),
        key=lambda d: int(d.split("-")[1]))
    for d in ckpts[: max(0, len(ckpts) - total_limit)]:
        shutil.rmtree(os.path.join(output_dir, d))


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Scan checkpoint-* dirs for the newest (reference :1694-1719)."""
    if not os.path.isdir(output_dir):
        return None
    ckpts = [d for d in os.listdir(output_dir) if re.fullmatch(r"checkpoint-\d+", d)]
    if not ckpts:
        return None
    return os.path.join(output_dir, max(ckpts, key=lambda d: int(d.split("-")[1])))


def restore_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# HF-format interop (safetensors)
# ---------------------------------------------------------------------------

def _flatten_to_torch_names(params: dict) -> Dict[str, np.ndarray]:
    """Our transformer/branch pytree -> reference torch state-dict naming
    (inverse of convert/torch_to_flax.py)."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_norm(prefix, p):
        if p is None:
            return
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    pe = params["patch_embed"]
    k = np.asarray(pe["proj"]["kernel"])  # [(p p I), O]
    d_out = k.shape[-1]
    # reconstruct [O, I, p, p]: we flattened (ph, pw, I); p inferred as 2
    p_sz = 2
    i_ch = k.shape[0] // (p_sz * p_sz)
    sd["patch_embed.proj.weight"] = np.ascontiguousarray(
        k.reshape(p_sz, p_sz, i_ch, d_out).transpose(3, 2, 0, 1))
    sd["patch_embed.proj.bias"] = np.asarray(pe["proj"]["bias"])
    put_linear("patch_embed.text_proj", pe["text_proj"])
    if "pos_embedding" in pe:
        sd["patch_embed.pos_embedding"] = np.asarray(pe["pos_embedding"])

    put_linear("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    put_linear("time_embedding.linear_2", params["time_embedding"]["linear_2"])

    blocks = params["blocks"]
    n_layers = np.asarray(blocks["norm1"]["linear"]["kernel"]).shape[0]
    for i in range(n_layers):
        sl = lambda tree: jax.tree.map(lambda x: np.asarray(x)[i], tree)
        b = sl(blocks)
        pre = f"transformer_blocks.{i}"
        put_linear(f"{pre}.norm1.linear", b["norm1"]["linear"])
        put_norm(f"{pre}.norm1.norm", b["norm1"]["norm"])
        put_linear(f"{pre}.norm2.linear", b["norm2"]["linear"])
        put_norm(f"{pre}.norm2.norm", b["norm2"]["norm"])
        for t in ("to_q", "to_k", "to_v"):
            put_linear(f"{pre}.attn1.{t}", b["attn1"][t])
        put_linear(f"{pre}.attn1.to_out.0", b["attn1"]["to_out"])
        put_norm(f"{pre}.attn1.norm_q", b["attn1"].get("norm_q"))
        put_norm(f"{pre}.attn1.norm_k", b["attn1"].get("norm_k"))
        put_linear(f"{pre}.ff.net.0.proj", b["ff"]["proj_in"])
        put_linear(f"{pre}.ff.net.2", b["ff"]["proj_out"])

    put_norm("norm_final", params["norm_final"])
    put_linear("norm_out.linear", params["norm_out"]["linear"])
    put_norm("norm_out.norm", params["norm_out"]["norm"])
    put_linear("proj_out", params["proj_out"])

    if "branch_blocks" in params:
        bk = np.asarray(params["branch_blocks"]["kernel"])
        bb = np.asarray(params["branch_blocks"]["bias"])
        for i in range(bk.shape[0]):
            sd[f"branch_blocks.{i}.weight"] = np.ascontiguousarray(bk[i].T)
            sd[f"branch_blocks.{i}.bias"] = bb[i]
    if "branch_x_embedder" in params:
        put_linear("branch_x_embedder", params["branch_x_embedder"])
    return sd


def export_branch_pretrained(params: dict, config_dict: dict, out_dir: str) -> None:
    """HF save_pretrained-style export: config.json +
    diffusion_pytorch_model.safetensors (reference :1468-1482)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = _flatten_to_torch_names(params)
    save_file({k: np.asarray(v, dtype=np.float32) for k, v in sd.items()},
              os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))
    cfg = dict(config_dict)
    cfg["_class_name"] = "CogvideoXBranchModel"
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def export_lora_weights(lora_params: dict, out_dir: str) -> None:
    """diffusers-compatible pytorch_lora_weights.safetensors."""
    from safetensors.numpy import save_file

    from ..models.lora import export_peft_lora_state_dict

    os.makedirs(out_dir, exist_ok=True)
    sd = export_peft_lora_state_dict(lora_params)
    save_file({k: np.asarray(v, dtype=np.float32) for k, v in sd.items()},
              os.path.join(out_dir, "pytorch_lora_weights.safetensors"))


def _flatten_vae_to_torch_names(params: dict) -> Dict[str, np.ndarray]:
    """Our VAE pytree -> reference torch state-dict naming (inverse of
    convert/torch_to_flax.py convert_vae_state_dict)."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv3d(prefix, p):
        # DHWIO -> [O, I, kt, kh, kw]
        sd[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2))
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_conv2d(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_norm(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_spatial(prefix, p):
        put_norm(f"{prefix}.norm_layer", p["norm_layer"])
        put_conv3d(f"{prefix}.conv_y.conv", p["conv_y"]["conv"])
        put_conv3d(f"{prefix}.conv_b.conv", p["conv_b"]["conv"])

    def put_resnet(prefix, p, spatial):
        put_conv3d(f"{prefix}.conv1.conv", p["conv1"]["conv"])
        put_conv3d(f"{prefix}.conv2.conv", p["conv2"]["conv"])
        if spatial:
            put_spatial(f"{prefix}.norm1", p["norm1"])
            put_spatial(f"{prefix}.norm2", p["norm2"])
        else:
            put_norm(f"{prefix}.norm1", p["norm1"])
            put_norm(f"{prefix}.norm2", p["norm2"])
        if "conv_shortcut" in p:
            if "conv" in p["conv_shortcut"]:
                put_conv3d(f"{prefix}.conv_shortcut.conv", p["conv_shortcut"]["conv"])
            else:
                put_conv3d(f"{prefix}.conv_shortcut", p["conv_shortcut"])

    enc = params["encoder"]
    put_conv3d("encoder.conv_in.conv", enc["conv_in"]["conv"])
    for i, blk in enumerate(enc["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"encoder.down_blocks.{i}.resnets.{j}", r, spatial=False)
        if "downsampler" in blk:
            put_conv2d(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                       blk["downsampler"]["conv"])
    for j, r in enumerate(enc["mid_block"]["resnets"]):
        put_resnet(f"encoder.mid_block.resnets.{j}", r, spatial=False)
    put_norm("encoder.norm_out", enc["norm_out"])
    put_conv3d("encoder.conv_out.conv", enc["conv_out"]["conv"])

    dec = params["decoder"]
    put_conv3d("decoder.conv_in.conv", dec["conv_in"]["conv"])
    for j, r in enumerate(dec["mid_block"]["resnets"]):
        put_resnet(f"decoder.mid_block.resnets.{j}", r, spatial=True)
    for i, blk in enumerate(dec["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"decoder.up_blocks.{i}.resnets.{j}", r, spatial=True)
        if "upsampler" in blk:
            put_conv2d(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                       blk["upsampler"]["conv"])
    put_spatial("decoder.norm_out", dec["norm_out"])
    put_conv3d("decoder.conv_out.conv", dec["conv_out"]["conv"])
    return sd


def export_vae_pretrained(params: dict, config_dict: dict, out_dir: str) -> None:
    """HF save_pretrained-style VAE export (reference-interoperable)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = _flatten_vae_to_torch_names(params)
    save_file({k: np.asarray(v, dtype=np.float32) for k, v in sd.items()},
              os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))
    cfg = dict(config_dict)
    cfg["_class_name"] = "AutoencoderKLCogVideoX"
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def export_transformer_pretrained(params: dict, config_dict: dict,
                                  out_dir: str) -> None:
    """HF save_pretrained-style transformer export."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = _flatten_to_torch_names(params)
    save_file({k: np.asarray(v, dtype=np.float32) for k, v in sd.items()},
              os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))
    cfg = dict(config_dict)
    cfg["_class_name"] = "CogVideoXTransformer3DModel"
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

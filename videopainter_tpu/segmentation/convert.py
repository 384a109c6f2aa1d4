"""torch SAM2 state dict -> JAX param pytrees.

Name map follows app/sam2/modeling/* module attributes. Linear weights
transpose to [in, out]; Conv2d [O,I,kh,kw] -> HWIO; ConvTranspose2d
[I,O,kh,kw] -> HWIO ([kh,kw,I,O] with flipped? jax conv_transpose with HWIO
kernel matches torch ConvTranspose2d directly for stride=k 'VALID').
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t(w):
    return np.ascontiguousarray(w.T)


def _lin(sd, p):
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _norm(sd, p):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _conv(sd, p):
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _convT(sd, p):
    # torch ConvTranspose2d weight [I, O, kh, kw] -> [kh, kw, O, I] for
    # lax.conv_transpose(transpose_kernel=True)
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _mlp(sd, p, n):
    return {"layers": [_lin(sd, f"{p}.layers.{i}") for i in range(n)]}


def _count(sd, pat):
    r = re.compile(pat + r"\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd for m in [r.match(k)] if m}
    return max(idx) + 1 if idx else 0


def convert_hiera(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    g = lambda k: prefix + k
    nb = _count(sd, re.escape(prefix) + r"blocks")
    p = {
        "patch_embed": _conv(sd, g("patch_embed.proj")),
        "pos_embed": sd[g("pos_embed")].transpose(0, 2, 3, 1),
        "pos_embed_window": sd[g("pos_embed_window")].transpose(0, 2, 3, 1),
        "blocks": [],
    }
    for i in range(nb):
        b = g(f"blocks.{i}")
        bp = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "norm2": _norm(sd, f"{b}.norm2"),
            "mlp": _mlp(sd, f"{b}.mlp", 2),
        }
        if f"{b}.proj.weight" in sd:
            bp["proj"] = _lin(sd, f"{b}.proj")
        p["blocks"].append(bp)
    return p


def convert_image_encoder(sd: Dict[str, np.ndarray]) -> dict:
    p = convert_hiera(sd, "trunk.")
    n_convs = _count(sd, r"neck\.convs")
    p["neck"] = {"convs": [_conv(sd, f"neck.convs.{i}.conv")
                           for i in range(n_convs)]}
    return p


def _attention(sd, p):
    return {"q_proj": _lin(sd, f"{p}.q_proj"), "k_proj": _lin(sd, f"{p}.k_proj"),
            "v_proj": _lin(sd, f"{p}.v_proj"), "out_proj": _lin(sd, f"{p}.out_proj")}


def convert_prompt_encoder(sd, prefix="sam_prompt_encoder.") -> dict:
    g = lambda k: prefix + k
    return {
        "pe_gauss": sd[g("pe_layer.positional_encoding_gaussian_matrix")],
        "point_embeddings": np.stack([sd[g(f"point_embeddings.{i}.weight")][0]
                                      for i in range(4)]),
        "not_a_point_embed": sd[g("not_a_point_embed.weight")][0],
        "no_mask_embed": sd[g("no_mask_embed.weight")][0],
        "mask_downscaling": {
            "conv1": _conv(sd, g("mask_downscaling.0")),
            "ln1": _norm(sd, g("mask_downscaling.1")),
            "conv2": _conv(sd, g("mask_downscaling.3")),
            "ln2": _norm(sd, g("mask_downscaling.4")),
            "conv3": _conv(sd, g("mask_downscaling.6")),
        },
    }


def _twoway_block(sd, p):
    return {
        "self_attn": _attention(sd, f"{p}.self_attn"),
        "norm1": _norm(sd, f"{p}.norm1"),
        "cross_attn_token_to_image": _attention(sd, f"{p}.cross_attn_token_to_image"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "mlp": _mlp(sd, f"{p}.mlp", 2),
        "norm3": _norm(sd, f"{p}.norm3"),
        "norm4": _norm(sd, f"{p}.norm4"),
        "cross_attn_image_to_token": _attention(sd, f"{p}.cross_attn_image_to_token"),
    }


def convert_mask_decoder(sd, prefix="sam_mask_decoder.") -> dict:
    g = lambda k: prefix + k
    n_layers = _count(sd, re.escape(prefix) + r"transformer\.layers")
    n_mask_tokens = sd[g("mask_tokens.weight")].shape[0]
    p = {
        "iou_token": sd[g("iou_token.weight")],
        "mask_tokens": sd[g("mask_tokens.weight")],
        "transformer": {
            "layers": [_twoway_block(sd, g(f"transformer.layers.{i}"))
                       for i in range(n_layers)],
            "final_attn": _attention(sd, g("transformer.final_attn_token_to_image")),
            "norm_final": _norm(sd, g("transformer.norm_final_attn")),
        },
        "output_upscaling": {
            "convT1": _convT(sd, g("output_upscaling.0")),
            "ln": _norm(sd, g("output_upscaling.1")),
            "convT2": _convT(sd, g("output_upscaling.3")),
        },
        "hypernet_mlps": [_mlp(sd, g(f"output_hypernetworks_mlps.{i}"), 3)
                          for i in range(n_mask_tokens)],
        "iou_head": _mlp(sd, g("iou_prediction_head"), 3),
    }
    if g("obj_score_token.weight") in sd:
        p["obj_score_token"] = sd[g("obj_score_token.weight")]
    if g("pred_obj_score_head.layers.0.weight") in sd:
        p["pred_obj_score_head"] = _mlp(sd, g("pred_obj_score_head"), 3)
    elif g("pred_obj_score_head.weight") in sd:
        p["pred_obj_score_head"] = {"layers": [_lin(sd, g("pred_obj_score_head"))]}
    if g("conv_s0.weight") in sd:
        p["conv_s0"] = _conv(sd, g("conv_s0"))
        p["conv_s1"] = _conv(sd, g("conv_s1"))
    return p


def convert_memory_attention(sd, prefix="memory_attention.") -> dict:
    g = lambda k: prefix + k
    n = _count(sd, re.escape(prefix) + r"layers")
    layers = []
    for i in range(n):
        p = g(f"layers.{i}")
        layers.append({
            "self_attn": _attention(sd, f"{p}.self_attn"),
            "cross_attn_image": _attention(sd, f"{p}.cross_attn_image"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "norm3": _norm(sd, f"{p}.norm3"),
        })
    return {"layers": layers, "norm": _norm(sd, g("norm"))}


def convert_memory_encoder(sd, prefix="memory_encoder.") -> dict:
    g = lambda k: prefix + k
    n_down = _count(sd, re.escape(prefix) + r"mask_downsampler\.encoder") // 2 + 1
    # encoder = [conv, LN, act] * k + final conv: indices 0,1,3,4,... final even
    convs, lns = [], []
    enc_prefix = g("mask_downsampler.encoder")
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(re.escape(enc_prefix) + r"\.(\d+)\.weight$", k)]
                   if m})
    for i in idxs:
        w = sd[f"{enc_prefix}.{i}.weight"]
        if w.ndim == 4:
            convs.append(_conv(sd, f"{enc_prefix}.{i}"))
        else:
            lns.append(_norm(sd, f"{enc_prefix}.{i}"))
    n_fuser = _count(sd, re.escape(prefix) + r"fuser\.layers")
    fuser = []
    for j in range(n_fuser):
        p = g(f"fuser.layers.{j}")
        fuser.append({
            "dwconv": _conv(sd, f"{p}.dwconv"),
            "norm": _norm(sd, f"{p}.norm"),
            "pwconv1": _lin(sd, f"{p}.pwconv1"),
            "pwconv2": _lin(sd, f"{p}.pwconv2"),
            "gamma": sd[f"{p}.gamma"],
        })
    out = {
        "mask_down_convs": convs, "mask_down_lns": lns,
        "pix_feat_proj": _conv(sd, g("pix_feat_proj")),
        "fuser": fuser,
    }
    if g("out_proj.weight") in sd:
        out["out_proj"] = _conv(sd, g("out_proj"))
    return out


def convert_sam2_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Full SAM2Base checkpoint -> our param tree."""
    p = {
        "image_encoder": convert_image_encoder(
            {k[len("image_encoder."):]: v for k, v in sd.items()
             if k.startswith("image_encoder.")}),
        "prompt_encoder": convert_prompt_encoder(sd),
        "mask_decoder": convert_mask_decoder(sd),
        "memory_attention": convert_memory_attention(sd),
        "memory_encoder": convert_memory_encoder(sd),
    }
    for k in ["maskmem_tpos_enc", "no_mem_embed", "no_mem_pos_enc",
              "no_obj_ptr"]:
        if k in sd:
            p[k] = sd[k]
    if "obj_ptr_proj.layers.0.weight" in sd:
        p["obj_ptr_proj"] = _mlp(sd, "obj_ptr_proj", 3)
    elif "obj_ptr_proj.weight" in sd:
        p["obj_ptr_proj"] = {"layers": [_lin(sd, "obj_ptr_proj")]}
    if "mask_downsample.weight" in sd:
        p["mask_downsample"] = _conv(sd, "mask_downsample")
    return p


def load_sam2_npz(path: str) -> dict:
    """Load the flat .npz written by tools/convert_checkpoint.py back into the
    param pytree (keys are '/'-joined; integer components are list indices)."""
    flat = np.load(path)

    def insert(tree, keys, value):
        k = keys[0]
        idx = int(k) if k.isdigit() else None
        if len(keys) == 1:
            if idx is not None:
                while len(tree) <= idx:
                    tree.append(None)
                tree[idx] = value
            else:
                tree[k] = value
            return
        nxt_is_idx = keys[1].isdigit()
        if idx is not None:
            while len(tree) <= idx:
                tree.append(None)
            if tree[idx] is None:
                tree[idx] = [] if nxt_is_idx else {}
            insert(tree[idx], keys[1:], value)
        else:
            if k not in tree:
                tree[k] = [] if nxt_is_idx else {}
            insert(tree[k], keys[1:], value)

    root: dict = {}
    for key in flat.files:
        insert(root, key.split("/"), flat[key])
    return root

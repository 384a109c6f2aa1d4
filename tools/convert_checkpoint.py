"""Convert reference HF checkpoints (torch safetensors) into this repo's layout.

Usage:
    python tools/convert_checkpoint.py \
        --src /path/to/CogVideoX-5b-I2V --dst ckpts/cogvideox-5b-i2v \
        [--branch /path/to/VideoPainter/checkpoints/branch --branch_dst ckpts/branch] \
        [--sam2 sam2_hiera_large.pt --sam2_dst ckpts/sam2.npz]

The converted dirs keep the HF layout (config.json + safetensors) that
videopainter_tpu.infer.inpaint.build_pipeline consumes — conversion to our
param pytrees happens at load (convert/torch_to_flax.py), so the on-disk
format stays interoperable with the torch stack.

For model dirs this mostly validates + copies configs and re-saves tensors
(the loader reads torch-layout safetensors directly); SAM2 .pt checkpoints
convert to an .npz of our pytree.
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_model_dir(src: str, dst: str, sub: str) -> None:
    s = os.path.join(src, sub)
    d = os.path.join(dst, sub)
    if not os.path.isdir(s):
        print(f"[skip] {s} missing")
        return
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(s):
        if f.endswith((".safetensors", ".json", ".model", ".txt")):
            shutil.copy2(os.path.join(s, f), os.path.join(d, f))
    # sanity: loadable by our converter
    from videopainter_tpu.convert import load_safetensors_dir

    sd = load_safetensors_dir(d)
    print(f"[ok] {sub}: {len(sd)} tensors")


def convert_sam2(src: str, dst: str) -> None:
    import torch

    from videopainter_tpu.segmentation.convert import convert_sam2_state_dict

    ckpt = torch.load(src, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    params = convert_sam2_state_dict({k: v.numpy() for k, v in sd.items()})

    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}/")
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}{i}/")
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    walk(params)
    np.savez_compressed(dst, **flat)
    print(f"[ok] sam2: {len(flat)} arrays -> {dst}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="CogVideoX/VideoPainter HF model dir")
    ap.add_argument("--dst", help="output dir")
    ap.add_argument("--branch", help="branch checkpoint dir")
    ap.add_argument("--branch_dst")
    ap.add_argument("--sam2", help="sam2 .pt checkpoint")
    ap.add_argument("--sam2_dst", default="ckpts/sam2.npz")
    args = ap.parse_args()

    if args.src:
        for sub in ["transformer", "vae", "text_encoder", "tokenizer",
                    "scheduler"]:
            convert_model_dir(args.src, args.dst, sub)
    if args.branch:
        os.makedirs(args.branch_dst, exist_ok=True)
        for f in os.listdir(args.branch):
            if f.endswith((".safetensors", ".json")):
                shutil.copy2(os.path.join(args.branch, f),
                             os.path.join(args.branch_dst, f))
        print(f"[ok] branch -> {args.branch_dst}")
    if args.sam2:
        convert_sam2(args.sam2, args.sam2_dst)


if __name__ == "__main__":
    main()

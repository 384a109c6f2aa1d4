"""Inference CLI: CSV-row-driven any-length video inpainting.

Reference: infer/inpaint.py generate_video (:196-601) — loads a CSV metadata
row + all_masks.npz, builds the AnyL pipeline (+ optional ID-resample LoRA),
DPM trailing scheduler, long-video VAE tiling/slicing, runs with
stride = num_frames - overlap, exports a side-by-side comparison video.

Usage:
    python -m videopainter_tpu.infer.inpaint \
        --model_path /path/to/converted/cogvideox-5b-i2v \
        --inpainting_branch /path/to/branch \
        [--id_adapter /path/to/lora] \
        --meta_file_path meta.csv --video_id 0 --output_path out/

Model dirs hold converted checkpoints (HF layout: transformer/, vae/,
text_encoder/+tokenizer/ or precomputed embeds); see convert/.
The FluxFill first-frame pre-inpaint + GPT-4o captioning of the reference
(:119-194) are external-model/API steps — hook points are exposed
(`first_frame_inpaint_fn`, `caption_fn`) so deployments can plug their own.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional

import numpy as np


def build_pipeline(model_path: str, inpainting_branch: Optional[str],
                   id_adapter: Optional[str] = None,
                   dtype_str: str = "bfloat16", long_video: bool = False):
    """Load converted weights and assemble the flagship AnyL pipeline.

    inpainting_branch=None builds the backbone-only (SFT) any-length
    pipeline (reference evaluate/eval_inpainting_wo_branch.py:147)."""
    import jax.numpy as jnp

    from ..config import (BranchConfig, SchedulerConfig, TransformerConfig,
                          VAEConfig, load_config)
    from ..convert import (convert_branch_state_dict,
                           convert_transformer_state_dict,
                           convert_vae_state_dict, load_safetensors_dir)
    from ..models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                          CogVideoXTransformer3D)
    from ..models.lora import convert_peft_lora_state_dict, merge_lora
    from ..models.text_encoder import T5TextEncoder
    from ..pipelines import CogVideoXI2VDualInpaintAnyLPipeline
    from ..schedulers import CogVideoXDPMScheduler

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_str]

    tcfg = load_config(os.path.join(model_path, "transformer", "config.json"),
                       TransformerConfig)
    if id_adapter:
        tcfg = TransformerConfig.from_dict(
            {**tcfg.to_dict(), "id_pool_resample_learnable": True})
    vcfg = load_config(os.path.join(model_path, "vae", "config.json"), VAEConfig)
    bcfg = (load_config(os.path.join(inpainting_branch, "config.json"),
                        BranchConfig) if inpainting_branch else None)

    import jax

    cast = lambda tree: jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)
    params = {
        "transformer": cast(convert_transformer_state_dict(
            load_safetensors_dir(os.path.join(model_path, "transformer")))),
        "vae": cast(convert_vae_state_dict(
            load_safetensors_dir(os.path.join(model_path, "vae")))),
    }
    if inpainting_branch:
        params["branch"] = cast(convert_branch_state_dict(
            load_safetensors_dir(inpainting_branch)))
    if id_adapter:
        lora_sd = load_safetensors_dir(id_adapter)
        lora = convert_peft_lora_state_dict(lora_sd, tcfg.num_layers, rank=256)
        params["transformer"] = merge_lora(params["transformer"], cast(lora),
                                           alpha=128.0, rank=256)

    # derive patch-in width from the checkpoint itself: SFT inpaint
    # checkpoints carry a widened patch embed (2*C+1 channels,
    # cogvideox_transformer_3d_inpainting.py:253-268)
    kern_rows = params["transformer"]["patch_embed"]["proj"]["kernel"].shape[0]
    patch_in = kern_rows // (tcfg.patch_size * tcfg.patch_size)
    transformer = CogVideoXTransformer3D(tcfg, patch_in_channels=patch_in)
    branch = CogVideoXBranch(bcfg) if bcfg is not None else None
    vae = AutoencoderKLCogVideoX(vcfg)
    if long_video:
        vae.enable_slicing()
        vae.enable_tiling()
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())

    text_encoder = None
    te_path = os.path.join(model_path, "text_encoder")
    if os.path.isdir(te_path):
        try:
            text_encoder = T5TextEncoder.from_local(te_path)
        except Exception as e:  # pragma: no cover
            print(f"[warn] text encoder unavailable ({e}); pass --prompt_embeds")

    if inpainting_branch:
        pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae,
                                                   sched, text_encoder)
    else:
        from ..pipelines import CogVideoXI2VInpaintAnyLPipeline

        pipe = CogVideoXI2VInpaintAnyLPipeline(transformer, vae, sched,
                                               text_encoder)
    return pipe, params


def read_video_with_mask(meta_file_path: str, video_id: int, data_root: str,
                         height: int, width: int, fps: int):
    """CSV row -> (video uint8 [T,H,W,3], masks [T,H,W]) (reference :74-117)."""
    import pandas as pd

    from ..training.data import read_video_frames, resize_video

    row = pd.read_csv(meta_file_path).iloc[video_id]
    path = os.path.join(data_root, str(row["path"])) if data_root else str(row["path"])
    src_fps = float(row.get("fps", fps) or fps)
    stride = max(1, int(round(src_fps / fps)))
    video = read_video_frames(path, int(row.get("start_frame", 0) or 0),
                              int(row.get("end_frame", 0) or 0) or None, stride)
    video = resize_video(video, height, width)
    mask_path = row.get("mask_path") or os.path.join(os.path.dirname(path),
                                                     "all_masks.npz")
    with np.load(mask_path) as npz:
        key = str(row.get("mask_id", 0))
        masks = npz[key if key in npz.files else npz.files[0]]
    if masks.ndim == 4:
        masks = masks[..., 0]
    masks = masks[::stride][: len(video)]
    import cv2

    masks = np.stack([cv2.resize((m > 0).astype(np.uint8), (width, height),
                                 interpolation=cv2.INTER_NEAREST) for m in masks])
    return video, masks, str(row.get("caption", ""))


def export_side_by_side(original01, masked01, output01, path, fps=8):
    """Comparison video [orig | masked | output] (reference :30-49)."""
    import cv2

    h, w = original01.shape[1:3]
    frames = np.concatenate([original01, masked01, output01], axis=2)
    frames = (frames * 255).clip(0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w * 3, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def generate_video(args, first_frame_inpaint_fn: Optional[Callable] = None,
                   caption_fn: Optional[Callable] = None):
    import jax
    import jax.numpy as jnp

    pipe, params = build_pipeline(args.model_path, args.inpainting_branch,
                                  args.id_adapter, args.dtype, args.long_video)

    if getattr(args, "vae_frame_batch", 0):
        pipe.vae.num_latent_frames_batch_size = args.vae_frame_batch

    if getattr(args, "int8", False):
        # single-chip deployment mode: W8A8 block projections; on a 16 GB
        # chip the bf16 42L stack cannot share HBM with the VAE (CLAUDE.md)
        from ..quantize import quantize_transformer_int8
        from ..utils import compact_params

        params["transformer"] = quantize_transformer_int8(
            params["transformer"], free_source=True)
        params["branch"] = quantize_transformer_int8(params["branch"],
                                                     free_source=True)
        if getattr(args, "int8_scales", None):
            # calibrated STATIC activation scales (quantize.calibrate_ascales
            # -> save_ascales, e.g. via tools/gate_int8_flagship.py
            # --ascale --save-scales): removes the per-token quantize reduce
            from ..quantize import attach_static_ascale, load_ascales

            for model_name, sites in load_ascales(args.int8_scales).items():
                if model_name in params:
                    params[model_name] = attach_static_ascale(
                        params[model_name], sites)
        # in-place quantization checkerboards the heap (int8 leaves in the
        # holes of the freed bf16 kernels); re-materialize through one jitted
        # copy so the denoise scan's contiguous temp arena can be placed
        # (utils/memory.py; the anyl window denoise OOMed without this)
        params = compact_params(params)

    video_u8, masks, caption = read_video_with_mask(
        args.meta_file_path, args.video_id, args.data_root,
        args.height, args.width, args.fps)
    t = len(video_u8)
    num_frames = min(args.num_frames, (t - 1) // 4 * 4 + 1)
    stride = num_frames - args.overlap_frames
    usable = num_frames + max(0, (t - num_frames) // stride) * stride
    video_u8, masks = video_u8[:usable], masks[:usable]

    if caption_fn is not None:
        caption = caption_fn(video_u8, masks, caption)
    prompt = args.prompt or caption

    video01 = video_u8.astype(np.float32) / 255.0
    masks_f = masks.astype(np.float32)
    if args.first_frame_gt:
        masks_f[0] = 0.0
    first = video01[0] * (1 - masks_f[0][..., None])
    if (first_frame_inpaint_fn is None
            and getattr(args, "first_frame_inpaint", "none") == "self"):
        # self-served FluxFill analog: the framework's own image-mode
        # inpaint at T=1 (reference pre-inpaints frame 0 with FluxFill,
        # infer/inpaint.py:119-194)
        from .first_frame import make_self_first_frame_inpaint

        import jax.numpy as jnp

        ff_embeds = None
        if args.prompt_embeds:
            from ..models.text_encoder import load_prompt_embeds

            ff_embeds = jnp.asarray(load_prompt_embeds(args.prompt_embeds))
        first_frame_inpaint_fn = make_self_first_frame_inpaint(
            pipe, params, guidance_scale=args.guidance_scale,
            seed=args.seed, sequential_cfg=getattr(args, "sequential_cfg",
                                                   False),
            use_flash=("int8" if getattr(args, "int8_attn", False)
                       else getattr(args, "use_flash", False)),
            dtype={"bfloat16": jnp.bfloat16,
                   "float32": jnp.float32}[args.dtype],
            prompt_embeds=ff_embeds)
    if first_frame_inpaint_fn is not None:  # FluxFill hook (reference :389-408)
        first = first_frame_inpaint_fn(first, masks_f[0], prompt)

    video = jnp.asarray(video01) * 2 - 1
    image = jnp.asarray(first) * 2 - 1

    if args.prompt_embeds:
        from ..models.text_encoder import load_prompt_embeds

        embeds = jnp.asarray(load_prompt_embeds(args.prompt_embeds))
        neg = jnp.zeros_like(embeds)
        emb_kw = dict(prompt_embeds=embeds, negative_prompt_embeds=neg)
    else:
        emb_kw = dict(prompt=prompt, negative_prompt=args.negative_prompt)

    from ..pipelines.common import parse_skip_steps
    from ..utils.profiling import maybe_profile

    with maybe_profile(getattr(args, "profile", False), "inpaint_denoise",
                       getattr(args, "profile_dir", "/tmp/jax_trace")):
        out = pipe(params, image=image[None], video=video[None],
                   masks=jnp.asarray(masks_f)[None],
                   num_frames=num_frames, stride=stride,
                   num_inference_steps=args.num_inference_steps,
                   guidance_scale=args.guidance_scale, use_dynamic_cfg=True,
                   replace_gt=args.replace_gt, mask_add=args.mask_add,
                   prev_clip_weight=args.prev_clip_weight,
                   id_pool_resample=bool(args.id_adapter),
                   use_flash=("int8pv" if getattr(args, "int8_pv", False)
                              else "int8" if getattr(args, "int8_attn", False)
                              else getattr(args, "use_flash", False)),
                   sequential_cfg=getattr(args, "sequential_cfg", False),
                   skip_steps=(parse_skip_steps(args.skip_steps,
                                                args.num_inference_steps)
                               if getattr(args, "skip_steps", None) else None),
                   # int8 capture defaults ON for the single-chip ID config:
                   # with bf16 compressed capture the window-0 denoise
                   # RESOURCE_EXHAUSTEDs at flagship dims (chip-validated;
                   # CLAUDE.md) — params 6.9 + temps 2.7 + 3.0 GiB captures
                   # leave no placement slack on a 16 GB chip
                   capture_int8=(not getattr(args, "no_capture_int8", False)
                                 and (getattr(args, "capture_int8", False)
                                      or (getattr(args, "int8", False)
                                          and bool(args.id_adapter)))),
                   rng=jax.random.PRNGKey(args.seed),
                   dtype={"bfloat16": jnp.bfloat16,
                          "float32": jnp.float32}[args.dtype],
                   **emb_kw)
    out01 = (np.asarray(out)[0] / 2 + 0.5).clip(0, 1)

    masked01 = video01[: len(out01)] * (1 - masks_f[: len(out01)][..., None])
    dst = os.path.join(args.output_path, f"video_{args.video_id}.mp4")
    export_side_by_side(video01[: len(out01)], masked01, out01, dst, args.fps)
    print(f"wrote {dst}")
    return out01


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--inpainting_branch", required=True)
    p.add_argument("--id_adapter", default=None)
    p.add_argument("--meta_file_path", required=True)
    p.add_argument("--data_root", default="")
    p.add_argument("--video_id", type=int, default=0)
    p.add_argument("--output_path", default="out")
    p.add_argument("--prompt", default=None)
    p.add_argument("--prompt_embeds", default=None,
                   help="npz/npy with precomputed T5 embeds (no-T5 deployments)")
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--overlap_frames", type=int, default=0)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--prev_clip_weight", type=float, default=0.0)
    p.add_argument("--replace_gt", action="store_true")
    p.add_argument("--mask_add", action="store_true")
    p.add_argument("--first_frame_gt", action="store_true")
    p.add_argument("--first_frame_inpaint", choices=["none", "self"],
                   default="none",
                   help="'self' pre-inpaints frame 0 with the framework's "
                        "own image-mode (T=1) inpaint before propagating — "
                        "the offline analog of the reference's FluxFill "
                        "step (infer/inpaint.py:119-194); an explicit "
                        "first_frame_inpaint_fn hook still takes precedence")
    p.add_argument("--long_video", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--use_flash", action="store_true",
                   help="Pallas flash attention (the on-chip hot path)")
    p.add_argument("--int8_attn", action="store_true",
                   help="SageAttention-style int8-QK^T flash attention "
                        "(implies --use_flash; 2x MXU rate on the kernel "
                        "that is 60%% of the step)")
    p.add_argument("--int8", action="store_true",
                   help="opt-in W8A8 int8 block projections (single-chip "
                        "deployment mode; PSNR-gated vs full precision)")
    p.add_argument("--int8_pv", action="store_true",
                   help="int8-QK^T AND int8-P.V flash attention (fastest "
                        "attention mode; slightly lossier than --int8_attn)")
    p.add_argument("--int8_scales", default=None,
                   help="npz of calibrated STATIC activation scales "
                        "(quantize.save_ascales) to attach to the int8 "
                        "linears — removes the per-token quantize reduce; "
                        "calibrate offline (quantize.calibrate_ascales or "
                        "tools/gate_int8_flagship.py --ascale --save-scales)")
    p.add_argument("--capture_int8", action="store_true",
                   help="store the compressed cross-window ID state as "
                        "per-token int8 (+scales) - halves it again; "
                        "defaults ON when --int8 is combined with "
                        "--id_adapter (the chip-validated single-chip "
                        "config - bf16 capture OOMs window 0)")
    p.add_argument("--no_capture_int8", action="store_true",
                   help="force bf16 compressed capture in --int8 ID mode "
                        "(needs more HBM headroom than one 16 GB chip)")
    p.add_argument("--skip_steps", default=None,
                   help='step-skip cache schedule "start:end:stride" (or '
                        "explicit comma list): skipped steps reuse the "
                        "cached pre-CFG prediction — the quality-gated "
                        "serving accelerator (tools/gate_skip_flagship.py, "
                        "GATE_skip.json)")
    p.add_argument("--sequential_cfg", action="store_true",
                   help="uncond/cond as two passes per step - halves "
                        "activation memory (single-chip 42L)")
    p.add_argument("--vae_frame_batch", type=int, default=0,
                   help="latent frames per VAE decoder dispatch (0 = model "
                        "default 2; 1 halves decoder memory - needed when "
                        "the DiT stays resident on one chip)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--profile", action="store_true",
                   help="jax.profiler trace around the denoise (SURVEY.md §5: "
                        "the reference has no profiler; Perfetto for free)")
    p.add_argument("--profile_dir", default="/tmp/jax_trace")
    return p.parse_args(argv)


def main(argv=None):
    """Console entry point (pyproject: vp-infer)."""
    generate_video(get_args(argv))


if __name__ == "__main__":
    main()

"""Video editing CLI: instruction-driven edits propagated by inpainting.

Reference: infer/edit.py (:131-238, :240-…) — an LLM (GPT-4o) rewrites the
caption according to the editing instruction and produces a description of the
edited first frame; FluxFill edits frame 0; the VideoPainter AnyL pipeline
propagates the edit through the masked region; the instruction metadata is
saved alongside the output (:491-498). infer/edit_bench.py additionally asks
the VLM to *generate* instructions per benchmark sample (:240-280) —
`generate_instructions_fn` hook below.

This environment has no network egress, so both external models are pluggable
callables:
  llm_fn(instruction, caption) -> (edited_caption, first_frame_description)
  first_frame_edit_fn(frame01, mask, description) -> edited_frame01
Without hooks, the edit degrades to caption-conditioned inpainting with the
instruction appended to the prompt.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Optional

import numpy as np

from .inpaint import (build_pipeline, export_side_by_side, get_args,
                      read_video_with_mask)


def default_llm(instruction: str, caption: str):
    """Offline fallback: splice the instruction into the caption."""
    edited = f"{caption.rstrip('.')}. {instruction}"
    return edited, instruction


def generate_edit(args, instruction: str,
                  llm_fn: Optional[Callable] = None,
                  first_frame_edit_fn: Optional[Callable] = None,
                  tag: Optional[str] = None):
    import jax
    import jax.numpy as jnp

    if llm_fn is None:
        print("[edit] WARNING: no llm_fn hook — falling back to splicing the "
              "instruction into the caption (default_llm). The result is "
              "caption-conditioned inpainting, not instruction-following "
              "editing; plug an LLM via edit_bench_main(llm_fn=...).")
        llm_fn = default_llm
    pipe, params = build_pipeline(args.model_path, args.inpainting_branch,
                                  args.id_adapter, args.dtype, args.long_video)
    if (first_frame_edit_fn is None
            and getattr(args, "first_frame_inpaint", "none") == "self"):
        # self-served FluxFill analog (see infer/first_frame.py): inpaint
        # frame 0 with the framework's own models at T=1
        import jax.numpy as jnp

        from .first_frame import make_self_first_frame_inpaint

        first_frame_edit_fn = make_self_first_frame_inpaint(
            pipe, params, guidance_scale=args.guidance_scale, seed=args.seed,
            use_flash=getattr(args, "use_flash", False),
            sequential_cfg=getattr(args, "sequential_cfg", False),
            dtype={"bfloat16": jnp.bfloat16,
                   "float32": jnp.float32}[args.dtype])
    elif first_frame_edit_fn is None:
        print("[edit] WARNING: no first-frame editor — frame 0 stays masked. "
              "Pass --first_frame_inpaint self to pre-inpaint it with the "
              "framework's own image-mode pipeline (the reference uses "
              "FluxFill here, infer/inpaint.py:119-194).")
    video_u8, masks, caption = read_video_with_mask(
        args.meta_file_path, args.video_id, args.data_root,
        args.height, args.width, args.fps)
    edited_caption, frame_desc = llm_fn(instruction, caption)

    t = len(video_u8)
    num_frames = min(args.num_frames, (t - 1) // 4 * 4 + 1)
    stride = num_frames - args.overlap_frames
    usable = num_frames + max(0, (t - num_frames) // stride) * stride
    video_u8, masks = video_u8[:usable], masks[:usable]

    video01 = video_u8.astype(np.float32) / 255.0
    masks_f = masks.astype(np.float32)
    first = video01[0] * (1 - masks_f[0][..., None])
    if first_frame_edit_fn is not None:
        first = first_frame_edit_fn(video01[0], masks_f[0], frame_desc)
        masks_f[0] = 0.0  # edited frame 0 becomes the conditioning GT

    if args.prompt_embeds:
        # precomputed-embeds path (no local T5) — same fallback as inpaint.py
        from ..models.text_encoder import load_prompt_embeds
        embeds = jnp.asarray(load_prompt_embeds(args.prompt_embeds))
        emb_kw = dict(prompt_embeds=embeds,
                      negative_prompt_embeds=jnp.zeros_like(embeds))
    else:
        emb_kw = dict(prompt=edited_caption,
                      negative_prompt=args.negative_prompt)

    out = pipe(params,
               image=jnp.asarray(first)[None] * 2 - 1,
               video=jnp.asarray(video01)[None] * 2 - 1,
               masks=jnp.asarray(masks_f)[None],
               num_frames=num_frames, stride=stride, **emb_kw,
               num_inference_steps=args.num_inference_steps,
               guidance_scale=args.guidance_scale, use_dynamic_cfg=True,
               replace_gt=args.replace_gt, mask_add=args.mask_add,
               prev_clip_weight=args.prev_clip_weight,
               id_pool_resample=bool(args.id_adapter),
               rng=jax.random.PRNGKey(args.seed))
    out01 = (np.asarray(out)[0] / 2 + 0.5).clip(0, 1)

    os.makedirs(args.output_path, exist_ok=True)
    stem = f"edit_{args.video_id}" + (f"_{tag}" if tag else "")
    dst = os.path.join(args.output_path, f"{stem}.mp4")
    masked01 = video01[: len(out01)] * (1 - masks_f[: len(out01)][..., None])
    export_side_by_side(video01[: len(out01)], masked01, out01, dst, args.fps)
    with open(os.path.join(args.output_path, f"{stem}.json"), "w") as f:
        # instruction-metadata schema of the reference (infer/edit.py:491-498)
        json.dump({"Original_video_caption": caption,
                   "Edited_video_caption": edited_caption,
                   "Edited_image_caption": frame_desc,
                   "Editing_instruction": instruction}, f, indent=4,
                  ensure_ascii=False)
    print(f"wrote {dst}")
    return out01


def run_edit_bench(args, instructions_per_video: dict,
                   llm_fn=None, first_frame_edit_fn=None,
                   generate_instructions_fn: Optional[Callable] = None):
    """Batch editing over a benchmark CSV (reference edit_bench.py). If
    `generate_instructions_fn(video, caption) -> list[str]` is given it mass-
    produces instructions per sample (reference :240-280, where GPT-4o looks
    at the masked first frame). Writes one side-by-side mp4 + one
    instruction-metadata JSON per (sample, instruction)."""
    import pandas as pd

    df = pd.read_csv(args.meta_file_path)
    results = {}
    for vid in range(len(df)):
        args.video_id = vid
        instrs = instructions_per_video.get(vid)
        if instrs is None and generate_instructions_fn is not None:
            video_u8, masks, caption = read_video_with_mask(
                args.meta_file_path, vid, args.data_root, args.height,
                args.width, args.fps)
            instrs = generate_instructions_fn(video_u8, caption)
        for j, instr in enumerate(instrs or []):
            out = generate_edit(args, instr, llm_fn, first_frame_edit_fn,
                                tag=str(j) if len(instrs) > 1 else None)
            results[(vid, j)] = out.shape
    return results


def edit_bench_main(argv=None, llm_fn=None, first_frame_edit_fn=None,
                    generate_instructions_fn=None):
    """CSV-sweep CLI (reference infer/edit_bench.py / edit_bench.sh):

      python -m videopainter_tpu.infer.edit --bench \\
          --meta_file_path bench.csv --instructions_json instrs.json ...

    instructions_json maps video_id (str) -> list of instructions; samples
    absent from the mapping fall back to `generate_instructions_fn` (a VLM in
    the reference; pluggable here — zero egress) or --default_instruction.
    """
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--instruction", default=None)
    ap.add_argument("--instructions_json", default=None)
    ap.add_argument("--default_instruction", default=None)
    known, rest = ap.parse_known_args(argv)
    args = get_args(rest)

    if not known.bench:
        if known.instruction is None:
            raise SystemExit("--instruction is required without --bench")
        return generate_edit(args, known.instruction, llm_fn,
                             first_frame_edit_fn)

    instrs = {}
    if known.instructions_json:
        with open(known.instructions_json) as f:
            instrs = {int(k): v for k, v in json.load(f).items()}
    if generate_instructions_fn is None and known.default_instruction:
        generate_instructions_fn = \
            lambda video, caption: [known.default_instruction]  # noqa: E731
    return run_edit_bench(args, instrs, llm_fn, first_frame_edit_fn,
                          generate_instructions_fn)


def main(argv=None):
    """Console entry point (pyproject: vp-edit)."""
    return edit_bench_main(argv)


if __name__ == "__main__":
    main()

"""Inpainting evaluation harness.

Reference contract (evaluate/eval_inpainting.py main_worker :81-510):
 - per video: run the any-length pipeline (50 steps, 49-frame windows),
   optional replace_gt compositing, then a per-frame metric loop (:400-448)
 - per-frame wall-clock accounting: time_i = (t_end - t_start) / video_length,
   corpus-averaged (:378-380, :495)
 - incremental results CSV with per-video rows + running averages (:115-127)
 - idempotent resume: videos whose comp_frames/ output already exists are
   skipped (:243-262)
 - I3D activations accumulated across the corpus for a final FVID (:451-456)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, Optional

import numpy as np

from .metrics import MetricsCalculator

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def load_frames_dir(path: str, height: int, width: int) -> np.ndarray:
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".jpg", ".png", ".jpeg")))
    out = []
    for f in files:
        img = cv2.cvtColor(cv2.imread(os.path.join(path, f)), cv2.COLOR_BGR2RGB)
        out.append(cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA))
    return np.stack(out)


def save_frames(video01: np.ndarray, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(video01):
        cv2.imwrite(os.path.join(out_dir, f"{i:05d}.png"),
                    cv2.cvtColor((f * 255).clip(0, 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))


@dataclass
class EvalConfig:
    output_dir: str = "eval_out"
    num_inference_steps: int = 50
    num_frames: int = 49
    stride: Optional[int] = None
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = True
    replace_gt: bool = True
    mask_add: bool = True
    prev_clip_weight: float = 0.0
    composite_with_gt: bool = True   # paste GT background over the output
    resume: bool = True
    seed: int = 42
    max_videos: Optional[int] = None


def run_inpainting_eval(pipe, params, dataset: Iterable[Dict],
                        cfg: EvalConfig,
                        metrics: Optional[MetricsCalculator] = None,
                        encode_prompt_fn=None,
                        caption_fn=None) -> Dict[str, float]:
    """Evaluate `pipe` (an AnyL pipeline) over `dataset` rows
    {name, video [T,H,W,3] uint8, masks [T,H,W] {0,1}, caption}.

    caption_fn(video_u8, masks) -> str fills in captions for samples that
    have none — the reference runs a CogVLM2 captioner here
    (evaluate/metrics.py:621-725); external 19B model, so pluggable.

    Returns the corpus-average metric dict; writes results.csv incrementally.
    """
    import jax
    import jax.numpy as jnp
    import pandas as pd

    metrics = metrics or MetricsCalculator()
    os.makedirs(cfg.output_dir, exist_ok=True)
    csv_path = os.path.join(cfg.output_dir, "results.csv")
    rows = []
    if cfg.resume and os.path.exists(csv_path):
        rows = pd.read_csv(csv_path).to_dict("records")
    done = {r["name"] for r in rows}

    n_done = 0
    for sample in dataset:
        if cfg.max_videos and n_done >= cfg.max_videos:
            break
        name = str(sample["name"])
        comp_dir = os.path.join(cfg.output_dir, "comp_frames", name)
        if cfg.resume and name in done and os.path.isdir(comp_dir):
            n_done += 1
            continue

        if caption_fn is not None and not sample.get("caption"):
            sample = dict(sample)
            sample["caption"] = caption_fn(sample["video"], sample["masks"])

        video01 = sample["video"].astype(np.float32) / 255.0
        masks = sample["masks"].astype(np.float32)
        t_total = len(video01)
        # trim to a valid any-length frame count
        num_frames = min(cfg.num_frames, (t_total - 1) // 4 * 4 + 1)
        stride = cfg.stride or num_frames
        usable = num_frames + ((t_total - num_frames) // stride) * stride
        video01, masks = video01[:usable], masks[:usable]

        video = jnp.asarray(video01) * 2 - 1
        image = video[0] * (1 - jnp.asarray(masks[0])[..., None])

        if encode_prompt_fn is not None:
            embeds, neg = encode_prompt_fn(sample.get("caption", ""))
        else:
            raise ValueError("encode_prompt_fn required (supply T5 embeds)")

        t0 = time.time()
        out = pipe(params, image=image[None], video=video[None],
                   masks=jnp.asarray(masks)[None],
                   num_frames=num_frames, stride=stride,
                   prompt_embeds=embeds, negative_prompt_embeds=neg,
                   num_inference_steps=cfg.num_inference_steps,
                   guidance_scale=cfg.guidance_scale,
                   use_dynamic_cfg=cfg.use_dynamic_cfg,
                   replace_gt=cfg.replace_gt, mask_add=cfg.mask_add,
                   prev_clip_weight=cfg.prev_clip_weight,
                   rng=jax.random.PRNGKey(cfg.seed))
        gen_time = time.time() - t0
        pred01 = (np.asarray(out)[0] / 2 + 0.5).clip(0, 1)

        if cfg.composite_with_gt:
            m = masks[: len(pred01), ..., None]
            pred01 = pred01 * m + video01[: len(pred01)] * (1 - m)

        save_frames(pred01, comp_dir)

        frame_rows = []
        for i in range(len(pred01)):
            frame_rows.append(metrics.frame_metrics(
                pred01[i], video01[i], mask=masks[i],
                caption=sample.get("caption")))
        vid_metrics = {k: float(np.mean([fr[k] for fr in frame_rows
                                         if np.isfinite(fr[k])]))
                       for k in frame_rows[0]}
        vid_metrics.update(metrics.video_metrics(pred01,
                                                 masks=masks[: len(pred01)]))
        metrics.accumulate_fvid(pred01, video01[: len(pred01)])
        vid_metrics["time_per_frame_s"] = gen_time / len(pred01)
        vid_metrics["name"] = name
        rows.append(vid_metrics)
        n_done += 1

        # incremental CSV with running averages (reference :115-127)
        df = pd.DataFrame(rows)
        avg = df.drop(columns=["name"]).mean(numeric_only=True)
        avg["name"] = "__average__"
        pd.concat([df, avg.to_frame().T]).to_csv(csv_path, index=False)

    fvid = metrics.compute_fvid()
    df = pd.DataFrame(rows)
    summary = {k: float(v) for k, v in
               df.drop(columns=["name"]).mean(numeric_only=True).items()}
    if fvid is not None:
        summary["fvid"] = fvid
    return summary

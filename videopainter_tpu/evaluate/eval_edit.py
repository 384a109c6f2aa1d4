"""Editing evaluation: CLIP-alignment metrics over edited videos.

Reference: evaluate/eval_edit.py (690 LoC) — per edited sample it scores
instruction alignment (CLIP score of the edited region vs the edited caption),
temporal consistency, and background preservation (PSNR/SSIM/LPIPS outside the
mask, since the background must be untouched by an edit).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, Iterable, Optional

import numpy as np

from .metrics import MetricsCalculator, psnr, ssim, temporal_consistency


@dataclass
class EditEvalConfig:
    output_dir: str = "edit_eval_out"
    resume: bool = True


def edit_sample_metrics(edited01: np.ndarray, source01: np.ndarray,
                        masks: np.ndarray, edited_caption: str,
                        metrics: MetricsCalculator) -> Dict[str, float]:
    """Per-video editing metrics.

    edited01/source01: [T, H, W, 3] in [0,1]; masks [T, H, W] (1 = edited
    region)."""
    out: Dict[str, float] = {}
    inv = (1 - masks)[..., None]
    # background preservation (outside the edit)
    bg_psnr, bg_ssim = [], []
    for t in range(len(edited01)):
        bg_psnr.append(psnr(edited01[t] * inv[t], source01[t] * inv[t]))
        bg_ssim.append(ssim(edited01[t] * inv[t], source01[t] * inv[t]))
    out["background_psnr"] = float(np.mean([v for v in bg_psnr if np.isfinite(v)]
                                           or [np.inf]))
    out["background_ssim"] = float(np.mean(bg_ssim))
    # instruction alignment
    if metrics.text_image_score_fn is not None and edited_caption:
        scores = [metrics.text_image_score_fn(edited01[t], edited_caption)
                  for t in range(len(edited01))]
        m_scores = [metrics.text_image_score_fn(
            edited01[t] * masks[t][..., None], edited_caption)
            for t in range(len(edited01))]
        out["clip_score"] = float(np.mean(scores))
        out["masked_clip_score"] = float(np.mean(m_scores))
    # temporal consistency of the edit
    if metrics.image_embed_fn is not None:
        embeds = np.stack([metrics.image_embed_fn(f) for f in edited01])
        out["temporal_consistency"] = temporal_consistency(embeds)
    return out


def run_edit_eval(samples: Iterable[Dict], cfg: EditEvalConfig,
                  metrics: Optional[MetricsCalculator] = None) -> Dict[str, float]:
    """samples: dicts {name, edited [T,H,W,3] float01, source, masks,
    edited_caption}. Writes incremental results.csv; returns averages."""
    import pandas as pd

    metrics = metrics or MetricsCalculator()
    os.makedirs(cfg.output_dir, exist_ok=True)
    csv_path = os.path.join(cfg.output_dir, "results.csv")
    rows = []
    if cfg.resume and os.path.exists(csv_path):
        rows = pd.read_csv(csv_path).to_dict("records")
    done = {r["name"] for r in rows}

    for s in samples:
        if s["name"] in done:
            continue
        t0 = time.time()
        m = edit_sample_metrics(s["edited"], s["source"], s["masks"],
                                s.get("edited_caption", ""), metrics)
        m["time_s"] = time.time() - t0
        m["name"] = s["name"]
        rows.append(m)
        pd.DataFrame(rows).to_csv(csv_path, index=False)

    df = pd.DataFrame(rows)
    return {k: float(v) for k, v in
            df.drop(columns=["name"]).mean(numeric_only=True).items()}

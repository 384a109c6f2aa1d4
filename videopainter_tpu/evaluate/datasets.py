"""Evaluation datasets: DAVIS (frame dirs + PNG masks) and VPBench (CSV+NPZ).

Reference: evaluate/dataset.py — DavisTestDataset (:44-117: frame directories
+ per-frame mask PNGs, optional binary dilation) and OurTestDataset/VPBench
(:119-…: CSV metadata + all_masks.npz).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def dilate_mask(mask: np.ndarray, iterations: int) -> np.ndarray:
    """Binary dilation with a 3x3 kernel, `iterations` times (reference uses
    scipy binary_dilation / cv2.dilate with dilate_size sweeps {0,16,32})."""
    if iterations <= 0:
        return mask
    kernel = np.ones((3, 3), np.uint8)
    return cv2.dilate(mask.astype(np.uint8), kernel, iterations=iterations)


@dataclass
class DavisTestDataset:
    """root/JPEGImages/<video>/*.jpg + root/Annotations/<video>/*.png."""

    root: str
    height: int = 480
    width: int = 720
    dilate_iterations: int = 0
    image_dir: str = "JPEGImages/480p"
    mask_dir: str = "Annotations/480p"

    def videos(self):
        d = os.path.join(self.root, self.image_dir)
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    def __iter__(self) -> Iterator[Dict]:
        from .harness import load_frames_dir

        for name in self.videos():
            frames = load_frames_dir(os.path.join(self.root, self.image_dir, name),
                                     self.height, self.width)
            mdir = os.path.join(self.root, self.mask_dir, name)
            mask_files = sorted(os.listdir(mdir))
            masks = []
            for f in mask_files[: len(frames)]:
                m = cv2.imread(os.path.join(mdir, f), cv2.IMREAD_GRAYSCALE)
                m = cv2.resize(m, (self.width, self.height),
                               interpolation=cv2.INTER_NEAREST)
                masks.append(dilate_mask((m > 0).astype(np.uint8),
                                         self.dilate_iterations))
            yield {"name": name, "video": frames,
                   "masks": np.stack(masks), "caption": ""}


@dataclass
class VPBenchDataset:
    """CSV rows (path, mask_id, caption, [start/end]) + NPZ masks per video."""

    meta_file_path: str
    data_root: str = ""
    height: int = 480
    width: int = 720
    dilate_iterations: int = 0
    max_videos: Optional[int] = None

    def __iter__(self) -> Iterator[Dict]:
        import pandas as pd

        from ..training.data import read_video_frames, resize_video

        df = pd.read_csv(self.meta_file_path)
        if self.max_videos:
            df = df.iloc[: self.max_videos]
        for i, r in df.iterrows():
            path = os.path.join(self.data_root, str(r["path"])) \
                if self.data_root else str(r["path"])
            video = read_video_frames(path, int(r.get("start_frame", 0) or 0),
                                      int(r.get("end_frame", 0) or 0) or None)
            video = resize_video(video, self.height, self.width)
            mask_path = r.get("mask_path") or os.path.join(
                os.path.dirname(path), "all_masks.npz")
            with np.load(mask_path) as npz:
                key = (str(r.get("mask_id", 0))
                       if str(r.get("mask_id", 0)) in npz.files else npz.files[0])
                masks = npz[key]
            if masks.ndim == 4:
                masks = masks[..., 0]
            masks = masks[: len(video)]
            masks = np.stack([
                dilate_mask(cv2.resize((m > 0).astype(np.uint8),
                                       (self.width, self.height),
                                       interpolation=cv2.INTER_NEAREST),
                            self.dilate_iterations)
                for m in masks])
            yield {"name": f"{i:04d}", "video": video, "masks": masks,
                   "caption": str(r.get("caption", ""))}

"""Optical-flow utilities: EPE, flow warping, flow visualization.

Reference: evaluate/flow_util.py (195 LoC; EPE util cited at metrics.py:41).
Host-side numpy; flow estimation itself is an external model (RAFT et al.) —
plug any `flow_fn(frame0, frame1) -> [H, W, 2]`.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def endpoint_error(flow_pred: np.ndarray, flow_gt: np.ndarray,
                   valid: Optional[np.ndarray] = None) -> float:
    """Mean EPE between [H, W, 2] flows."""
    err = np.sqrt(((flow_pred - flow_gt) ** 2).sum(-1))
    if valid is not None:
        err = err[valid > 0]
    return float(err.mean()) if err.size else 0.0


def warp_with_flow(image: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Backward-warp image [H, W, C] with flow [H, W, 2] (bilinear, clamped)."""
    h, w = flow.shape[:2]
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    x = np.clip(gx + flow[..., 0], 0, w - 1)
    y = np.clip(gy + flow[..., 1], 0, h - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    img = image.astype(np.float32)
    out = (img[y0, x0] * (1 - wx) * (1 - wy) + img[y0, x1] * wx * (1 - wy)
           + img[y1, x0] * (1 - wx) * wy + img[y1, x1] * wx * wy)
    return out.astype(image.dtype if image.dtype != np.uint8 else np.float32)


def flow_warping_error(frames01: np.ndarray, flow_fn: Callable,
                       masks: Optional[np.ndarray] = None) -> float:
    """Temporal warping error: mean |warp(f_{t+1}, flow_{t->t+1}) - f_t|
    over consecutive frames (a flow-based temporal-consistency metric)."""
    errs = []
    for t in range(len(frames01) - 1):
        flow = flow_fn(frames01[t], frames01[t + 1])
        warped = warp_with_flow(frames01[t + 1], flow)
        e = np.abs(warped - frames01[t])
        if masks is not None:
            m = masks[t][..., None] > 0
            e = e[np.broadcast_to(m, e.shape)]
        errs.append(float(np.mean(e)))
    return float(np.mean(errs)) if errs else 0.0


def flow_to_color(flow: np.ndarray) -> np.ndarray:
    """Standard HSV flow visualization -> [H, W, 3] uint8."""
    import cv2

    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv = np.zeros((*flow.shape[:2], 3), np.uint8)
    hsv[..., 0] = (ang * 180 / np.pi / 2).astype(np.uint8)
    hsv[..., 1] = 255
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)

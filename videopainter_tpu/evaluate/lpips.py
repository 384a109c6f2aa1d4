"""JAX-native LPIPS (SqueezeNet-1.1 backbone + learned 1x1 linear heads).

The reference evaluates LPIPS per frame (global + masked) through
torchmetrics' `LearnedPerceptualImagePatchSimilarity(net_type='squeeze')`
(/root/reference/evaluate/metrics.py:604, :761-779 — images in [0,1], masked
variant multiplies the mask in pixel space, then the metric gets `img*2-1`).
torchmetrics vendors the LPIPS architecture of Zhang et al. (CVPR 2018,
richzhang/PerceptualSimilarity): a frozen SqueezeNet-1.1 feature trunk whose
7 ReLU endpoints are channel-unit-normalized, squared-diffed, and reduced by
per-layer learned 1x1 convs, spatially averaged and summed over layers.

This module reimplements that forward pass in JAX (channels-last, fp32) with
a converter from the torch checkpoints (lpips package / torchmetrics naming),
so the TPU framework evaluates itself without torch.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# SqueezeNet-1.1 `features` trunk (torchvision layout). Fire(sq, e1, e3):
# squeeze 1x1 -> relu -> [expand1x1 -> relu ‖ expand3x3(pad 1) -> relu].
# LPIPS taps 7 ReLU endpoints with channels [64,128,256,384,384,512,512].
_FIRE_SPECS = [  # (in, squeeze, expand1x1, expand3x3)
    (64, 16, 64, 64), (128, 16, 64, 64),
    (128, 32, 128, 128), (256, 32, 128, 128),
    (256, 48, 192, 192), (384, 48, 192, 192),
    (384, 64, 256, 256), (512, 64, 256, 256),
]
# trunk program: conv1(s2)+relu -> TAP, then (pool?, fire idx, tap?) steps
_TRUNK = [
    ("pool", None), ("fire", 0), ("fire", 1), ("tap", None),
    ("pool", None), ("fire", 2), ("fire", 3), ("tap", None),
    ("pool", None), ("fire", 4), ("tap", None),
    ("fire", 5), ("tap", None),
    ("fire", 6), ("tap", None),
    ("fire", 7), ("tap", None),
]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(p, x, stride=1, pad=0):
    import jax
    import jax.numpy as jnp

    if pad:
        x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["bias"])


def _maxpool_ceil(x, k=3, s=2):
    """torch MaxPool2d(3, stride=2, ceil_mode=True): the last window may
    overhang the input (right-pad with -inf) but must start inside it."""
    import jax
    import jax.numpy as jnp

    def right_pad(n):
        out = -(-(n - k) // s) + 1  # ceil division
        if (out - 1) * s >= n:  # window starting in padding: drop it
            out -= 1
        return max((out - 1) * s + k - n, 0)

    ph, pw = right_pad(x.shape[1]), right_pad(x.shape[2])
    x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)],
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), "VALID")


def _fire(p, x):
    import jax.numpy as jnp

    s = _conv(p["squeeze"], x)
    return jnp.concatenate([_conv(p["e1"], s), _conv(p["e3"], s, pad=1)],
                           axis=-1)


def _trunk_taps(params: dict, x) -> List:
    """[B, H, W, 3] scaled input -> the 7 tapped ReLU feature maps."""
    taps = []
    x = _conv(params["conv1"], x, stride=2)
    taps.append(x)
    for kind, idx in _TRUNK:
        if kind == "pool":
            x = _maxpool_ceil(x)
        elif kind == "fire":
            x = _fire(params["fires"][idx], x)
        else:
            taps.append(x)
    return taps


def lpips_forward(params: dict, a, b):
    """a, b: [B, H, W, 3] fp32 in [-1, 1] -> [B] LPIPS distances."""
    import jax.numpy as jnp

    total = 0.0
    for fa, fb, w in zip(_trunk_taps(params, (a - _SHIFT) / _SCALE),
                         _trunk_taps(params, (b - _SHIFT) / _SCALE),
                         params["lins"]):
        # channel-unit normalize (eps OUTSIDE the sqrt, as upstream)
        fa = fa / (jnp.sqrt(jnp.sum(fa * fa, -1, keepdims=True)) + 1e-10)
        fb = fb / (jnp.sqrt(jnp.sum(fb * fb, -1, keepdims=True)) + 1e-10)
        d = (fa - fb) ** 2
        # learned head: 1x1 conv C->1 (no bias), then spatial average
        total = total + jnp.mean(d @ w, axis=(1, 2))
    return total


def convert_lpips_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """torch LPIPS checkpoint -> our pytree.

    Accepts the `lpips` package naming (net.sliceK.J.*, linK.model.1.weight)
    and the torchmetrics wrapper naming (everything prefixed with one more
    `net.`). Conv kernels [O, I, kh, kw] -> HWIO.
    """
    if any(k.startswith("net.net.") for k in sd):  # torchmetrics prefix
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("net.")}

    def conv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}

    def fire(prefix):
        return {"squeeze": conv(f"{prefix}.squeeze"),
                "e1": conv(f"{prefix}.expand1x1"),
                "e3": conv(f"{prefix}.expand3x3")}

    # slice -> (torchvision features index offset) fire locations:
    # slice2.[1,2], slice3.[1,2], slice4.[1], slice5.[0], slice6.[0], slice7.[0]
    fire_slots = [("slice2", 1), ("slice2", 2), ("slice3", 1), ("slice3", 2),
                  ("slice4", 1), ("slice5", 0), ("slice6", 0), ("slice7", 0)]
    params = {
        "conv1": conv("net.slice1.0"),
        "fires": [fire(f"net.{s}.{i}") for s, i in fire_slots],
        "lins": [np.asarray(sd[f"lin{k}.model.1.weight"],
                            np.float32).reshape(-1) for k in range(7)],
    }
    return params


class LpipsExtractor:
    """lpips_fn for MetricsCalculator: fn(a01, b01) -> float.

    Matches the reference's calculate_lpips contract
    (/root/reference/evaluate/metrics.py:761-779): inputs are [H, W, 3]
    floats in [0, 1]; the x2-1 rescale happens here, masking (if any)
    happened in pixel space before the call.
    """

    def __init__(self, weights_path: str):
        if weights_path.endswith(".npz"):
            sd = {k: v for k, v in np.load(weights_path).items()}
        else:
            import torch

            raw = torch.load(weights_path, map_location="cpu")
            if isinstance(raw, dict) and "state_dict" in raw:
                raw = raw["state_dict"]
            sd = {k: v.numpy() for k, v in raw.items()}
        self.params = convert_lpips_state_dict(sd)
        self._jitted = None

    def __call__(self, a01: np.ndarray, b01: np.ndarray) -> float:
        import jax

        if self._jitted is None:
            self._jitted = jax.jit(lpips_forward)
        a = np.asarray(a01, np.float32)[None] * 2 - 1
        b = np.asarray(b01, np.float32)[None] * 2 - 1
        return float(self._jitted(self.params, a, b)[0])

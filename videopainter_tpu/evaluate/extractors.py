"""Pretrained feature extractors for the metrics stack.

Reference dependency map (evaluate/metrics.py):
 - CLIP-L/14 CLIPScore + CLIP-B/32 temporal consistency (:841-901)
 - InceptionI3d activations for FVID (:181-598; the reference bundles a
   ~400-LoC pytorch-i3d port)
 - LPIPS (squeeze backbone via torchmetrics)

Zero-egress environment: all extractors load from LOCAL paths. CLIP uses
transformers' FlaxCLIPModel; I3D is a JAX reimplementation below with a
converter for the standard pytorch-i3d `rgb_imagenet.pt` naming
(Conv3d_1a_7x7.conv3d.weight, Mixed_3b.b0.conv3d.weight, ...). LPIPS falls
back to torchmetrics (torch-CPU) when its weights are present.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


class ClipExtractor:
    """CLIP score + image embeddings via Flax CLIP loaded from a local dir."""

    def __init__(self, path: str, dtype=None):
        import jax.numpy as jnp
        from transformers import AutoProcessor, FlaxCLIPModel

        self.model = FlaxCLIPModel.from_pretrained(path, from_pt=True,
                                                   dtype=dtype or jnp.float32)
        self.processor = AutoProcessor.from_pretrained(path)

    def image_embed(self, image01: np.ndarray) -> np.ndarray:
        """[H, W, 3] float in [0,1] -> [D] (for temporal consistency)."""
        inputs = self.processor(images=(image01 * 255).astype(np.uint8),
                                return_tensors="np")
        feats = self.model.get_image_features(pixel_values=inputs["pixel_values"])
        return np.asarray(feats)[0]

    def clip_score(self, image01: np.ndarray, text: str) -> float:
        """100 * max(cos(img, text), 0) — torchmetrics CLIPScore convention."""
        inputs = self.processor(images=(image01 * 255).astype(np.uint8),
                                text=[text], return_tensors="np",
                                padding=True, truncation=True)
        img = np.asarray(self.model.get_image_features(
            pixel_values=inputs["pixel_values"]))[0]
        txt = np.asarray(self.model.get_text_features(
            input_ids=inputs["input_ids"],
            attention_mask=inputs["attention_mask"]))[0]
        cos = float(np.dot(img, txt) /
                    (np.linalg.norm(img) * np.linalg.norm(txt) + 1e-12))
        return 100.0 * max(cos, 0.0)


# ---------------------------------------------------------------------------
# InceptionI3d (JAX)
# ---------------------------------------------------------------------------

# (name, type, spec): conv -> (out, kernel, stride); pool -> (kernel, stride);
# mixed -> (b0, b1a, b1b, b2a, b2b, b3b) output channels
_I3D_LAYERS = [
    ("Conv3d_1a_7x7", "conv", (64, (7, 7, 7), (2, 2, 2))),
    ("MaxPool3d_2a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Conv3d_2b_1x1", "conv", (64, (1, 1, 1), (1, 1, 1))),
    ("Conv3d_2c_3x3", "conv", (192, (3, 3, 3), (1, 1, 1))),
    ("MaxPool3d_3a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Mixed_3b", "mixed", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", "mixed", (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", "pool", ((3, 3, 3), (2, 2, 2))),
    ("Mixed_4b", "mixed", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", "mixed", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", "mixed", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", "mixed", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", "mixed", (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", "pool", ((2, 2, 2), (2, 2, 2))),
    ("Mixed_5b", "mixed", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", "mixed", (384, 192, 384, 48, 128, 128)),
]


def _same_pad(size, k, s):
    if size % s == 0:
        pad = max(k - s, 0)
    else:
        pad = max(k - size % s, 0)
    return pad // 2, pad - pad // 2


def _conv3d_same(p, x, kernel, stride):
    """tf-style SAME conv3d + BN + relu (Unit3D, reference metrics.py:247-313)."""
    import jax
    import jax.numpy as jnp

    t, h, w = x.shape[1:4]
    pads = [(0, 0)] + [_same_pad(s, k, st) for s, k, st in
                       zip((t, h, w), kernel, stride)] + [(0, 0)]
    x = jnp.pad(x, pads)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # BN folded at conversion time into scale/bias
    y = y * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(y)


def _maxpool3d_same(x, kernel, stride):
    import jax
    import jax.numpy as jnp

    t, h, w = x.shape[1:4]
    pads = [(0, 0)] + [_same_pad(s, k, st) for s, k, st in
                       zip((t, h, w), kernel, stride)] + [(0, 0)]
    x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, *kernel, 1), (1, *stride, 1), "VALID")


def i3d_extract_features(params: dict, video: "np.ndarray") -> "np.ndarray":
    """[B, T, H, W, 3] in [-1, 1] -> [B, 1024] (Logits-input features,
    spatiotemporal average pooled — the FVID feature of the reference)."""
    import jax.numpy as jnp

    x = jnp.asarray(video)
    for name, kind, spec in _I3D_LAYERS:
        if kind == "conv":
            _, kernel, stride = spec
            x = _conv3d_same(params[name], x, kernel, stride)
        elif kind == "pool":
            kernel, stride = spec
            x = _maxpool3d_same(x, kernel, stride)
        else:
            p = params[name]
            b0 = _conv3d_same(p["b0"], x, (1, 1, 1), (1, 1, 1))
            b1 = _conv3d_same(p["b1a"], x, (1, 1, 1), (1, 1, 1))
            b1 = _conv3d_same(p["b1b"], b1, (3, 3, 3), (1, 1, 1))
            b2 = _conv3d_same(p["b2a"], x, (1, 1, 1), (1, 1, 1))
            b2 = _conv3d_same(p["b2b"], b2, (3, 3, 3), (1, 1, 1))
            b3 = _maxpool3d_same(x, (3, 3, 3), (1, 1, 1))
            b3 = _conv3d_same(p["b3b"], b3, (1, 1, 1), (1, 1, 1))
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
    # global avg pool (reference avg_pool 2x7x7 then squeeze; mean is
    # equivalent for feature purposes)
    return np.asarray(jnp.mean(x, axis=(1, 2, 3)))


def convert_i3d_state_dict(sd: Dict[str, np.ndarray], eps: float = 1e-3) -> dict:
    """pytorch-i3d checkpoint -> our pytree, folding BatchNorm into scale/bias.

    torch conv3d weight [O, I, kt, kh, kw] -> DHWIO.
    """

    def unit(prefix):
        w = sd[f"{prefix}.conv3d.weight"].transpose(2, 3, 4, 1, 0)
        if f"{prefix}.bn.weight" in sd:
            gamma = sd[f"{prefix}.bn.weight"]
            beta = sd[f"{prefix}.bn.bias"]
            mean = sd[f"{prefix}.bn.running_mean"]
            var = sd[f"{prefix}.bn.running_var"]
            scale = gamma / np.sqrt(var + eps)
            bias = beta - mean * scale
        else:
            scale = np.ones(w.shape[-1], np.float32)
            bias = sd.get(f"{prefix}.conv3d.bias", np.zeros(w.shape[-1], np.float32))
        return {"kernel": np.ascontiguousarray(w), "bn_scale": scale,
                "bn_bias": bias}

    params = {}
    for name, kind, _ in _I3D_LAYERS:
        if kind == "conv":
            params[name] = unit(name)
        elif kind == "mixed":
            params[name] = {k: unit(f"{name}.{k}")
                            for k in ["b0", "b1a", "b1b", "b2a", "b2b", "b3b"]}
    return params


class I3DExtractor:
    """FVID feature fn: load a local pytorch-i3d checkpoint, return the
    callable for MetricsCalculator(video_feature_fn=...)."""

    def __init__(self, checkpoint_path: str):
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.params = convert_i3d_state_dict(
            {k: v.numpy() for k, v in sd.items()})

    def __call__(self, video01: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] in [0, 1] -> [1024] activations."""
        v = video01[None].astype(np.float32) * 2 - 1
        return i3d_extract_features(self.params, v)[0]


def make_lpips_fn(net: str = "squeeze", weights_path: Optional[str] = None):
    """LPIPS feature fn. Prefers the JAX-native implementation
    (evaluate/lpips.py) when a local checkpoint path is given; otherwise
    falls back to torchmetrics (torch CPU) and returns None when neither is
    available (zero-egress)."""
    if weights_path:
        from .lpips import LpipsExtractor

        return LpipsExtractor(weights_path)
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(net_type=net,
                                                       normalize=True)

        def fn(a01, b01):
            a = torch.tensor(a01.transpose(2, 0, 1)[None], dtype=torch.float32)
            b = torch.tensor(b01.transpose(2, 0, 1)[None], dtype=torch.float32)
            return float(metric(a, b))

        return fn
    except Exception:
        return None

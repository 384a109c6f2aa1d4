"""Shared SAM2 primitives (JAX, channels-last).

Reference: app/sam2/modeling/sam2_utils.py (MLP :108-132, LayerNorm2d
:137-149), backbones/utils.py (window partition :16-63, PatchEmbed :66-98),
position_encoding.py (sine :16-113, random :115-158, axial RoPE :167-216).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import init_linear, layer_norm, linear


# -- small nets --------------------------------------------------------------

def mlp(p: dict, x: jnp.ndarray, *, act=jax.nn.relu,
        sigmoid_output: bool = False) -> jnp.ndarray:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = act(x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def init_mlp(key, d_in: int, d_hidden: int, d_out: int, num_layers: int,
             dtype=jnp.float32) -> dict:
    dims = [d_in] + [d_hidden] * (num_layers - 1) + [d_out]
    keys = jax.random.split(key, num_layers)
    return {"layers": [init_linear(k, dims[i], dims[i + 1], dtype=dtype)
                       for i, k in enumerate(keys)]}


def channel_layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the channel (last) axis WITHOUT normalizing spatial dims
    — matches LayerNorm2d on NCHW (stats over C only)."""
    u = x.mean(-1, keepdims=True)
    s = jnp.mean(jnp.square(x - u), axis=-1, keepdims=True)
    y = (x - u) * jax.lax.rsqrt(s + eps)
    return y * p["scale"] + p["bias"]


def conv2d(p: dict, x: jnp.ndarray, *, stride=1, padding=0,
           feature_group_count: int = 1) -> jnp.ndarray:
    """[B, H, W, C] with HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv_transpose2d(p: dict, x: jnp.ndarray, *, stride=2) -> jnp.ndarray:
    """Matches torch ConvTranspose2d(k=2, s=2): kernel [kh, kw, out, in] with
    transpose_kernel=True (verified numerically against torch)."""
    y = jax.lax.conv_transpose(
        x, p["kernel"].astype(x.dtype), strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def init_conv2d(key, cin: int, cout: int, k: int, dtype=jnp.float32) -> dict:
    bound = 1.0 / math.sqrt(cin * k * k)
    return {"kernel": jax.random.uniform(key, (k, k, cin, cout),
                                         minval=-bound, maxval=bound).astype(dtype),
            "bias": jnp.zeros((cout,), dtype=dtype)}


# -- windowing ---------------------------------------------------------------

def window_partition(x: jnp.ndarray, window: int):
    """[B, H, W, C] -> ([B*nw, win, win, C], (Hp, Wp))."""
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c),
            (hp, wp))


def window_unpartition(windows: jnp.ndarray, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


# -- positional encodings ----------------------------------------------------

def sine_pos_embed(h: int, w: int, num_pos_feats: int,
                   temperature: float = 10000.0,
                   scale: float = 2 * math.pi) -> np.ndarray:
    """PositionEmbeddingSine (normalized) -> [H, W, C] numpy
    (reference position_encoding.py:79-113)."""
    half = num_pos_feats // 2
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1).astype(np.float32)


def random_pe_encode(gauss: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """PositionEmbeddingRandom._pe_encoding: coords in [0,1] -> [..., C]."""
    c = (2 * coords01 - 1) @ gauss.astype(coords01.dtype)
    c = 2 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def random_pe_grid(gauss: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Dense grid PE -> [H, W, C] (reference :138-149)."""
    ye = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xe = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xe, ye, indexing="xy"), axis=-1)  # [H, W, 2]
    return random_pe_encode(gauss, grid)


def compute_axial_cis(dim: int, end_x: int, end_y: int,
                      theta: float = 10000.0):
    """Axial 2D RoPE angles as (cos, sin) float32 [end_x*end_y, dim//2]
    (reference :167-183 builds a complex table; we keep real cos/sin — the
    axon TPU backend has no complex arithmetic)."""
    n = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4, dtype=np.float32)[:n] / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    tx, ty = t % end_x, np.floor(t / end_x)
    ang = np.concatenate([np.outer(tx, freqs), np.outer(ty, freqs)], axis=-1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rotary_enc(xq: jnp.ndarray, xk: Optional[jnp.ndarray],
                     freqs_cis, repeat_freqs_k: bool = False):
    """[B, H, S, D] rotary with (cos, sin) tables [S, D/2]
    (reference :194-216); (x0 + i x1) * e^{i a} expanded in real math."""
    cos, sin = (jnp.asarray(freqs_cis[0]), jnp.asarray(freqs_cis[1]))

    def rot(x, cos, sin):
        xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        out0 = x0 * cos - x1 * sin
        out1 = x0 * sin + x1 * cos
        return jnp.stack([out0, out1], axis=-1).reshape(x.shape).astype(x.dtype)

    xq_out = rot(xq, cos, sin)
    if xk is None or xk.shape[-2] == 0:
        return xq_out, xk
    if repeat_freqs_k and xk.shape[-2] != xq.shape[-2]:
        r = xk.shape[-2] // xq.shape[-2]
        cos, sin = jnp.tile(cos, (r, 1)), jnp.tile(sin, (r, 1))
    return xq_out, rot(xk, cos, sin)


def sdpa(q, k, v, scale=None):
    from ..ops.attention import sdpa as _sdpa

    return _sdpa(q, k, v, scale)


def _bicubic_weights(in_size, out_size):
    a = -0.75
    scale = in_size / out_size
    pos = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(pos).astype(np.int64)
    idx = np.stack([base - 1, base, base + 1, base + 2], 1)
    d = np.abs(pos[:, None] - idx)
    idx = np.clip(idx, 0, in_size - 1)
    w = np.where(d <= 1, (a + 2) * d**3 - (a + 3) * d**2 + 1,
                 np.where(d < 2, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0))
    return idx, w.astype(np.float32)


def bicubic_resize_torch(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='bicubic', align_corners=False) equivalent
    (Keys kernel a=-0.75, half-pixel centers, edge clamp). x: [B, H, W, C].
    Static gather weights (numpy) + traced gathers — safe under jit."""
    b, h, w_in, c = x.shape
    iy, wy = _bicubic_weights(h, out_h)
    ix, wx = _bicubic_weights(w_in, out_w)
    xh = (x[:, iy] * wy[None, :, :, None, None]).sum(axis=2)
    xw = (xh[:, :, ix] * wx[None, None, :, :, None]).sum(axis=3)
    return xw.astype(x.dtype)



"""Native (C++) components + pure-JAX fallbacks.

The reference's single native kernel is SAM2's CUDA connected-components
union-find (app/sam2/csrc/connected_components.cu, built as a CUDAExtension by
app/setup.py:40-53). Here:

 - connected_components.cpp: CPython C-API extension (built on demand with the
   system toolchain; no pybind11) — path-compressed union-find on CPU.
 - connected_components_jax: pure-JAX iterative min-label propagation under
   lax.while_loop — runs on TPU, used when the extension isn't built.

`get_connected_components(mask)` dispatches native -> JAX automatically.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _build_native() -> bool:
    """Compile the extension in-place with the system compiler."""
    import sysconfig

    src_dir = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(src_dir, "connected_components.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(src_dir, f"_cc{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    if _build_native():
        try:
            from . import _cc  # type: ignore

            _NATIVE = _cc
        except ImportError:
            _NATIVE = None
    return _NATIVE


def connected_components_native(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 [B, 1, H, W] -> (labels, areas) int32 same shape."""
    cc = _load_native()
    if cc is None:
        raise RuntimeError("native extension unavailable")
    b, c, h, w = mask.shape
    m = np.ascontiguousarray(mask.reshape(b, h, w).astype(np.uint8))
    labels_b, areas_b = cc.get_connected_components(m.tobytes(), b, h, w)
    labels = np.frombuffer(labels_b, dtype=np.int32).reshape(b, 1, h, w).copy()
    areas = np.frombuffer(areas_b, dtype=np.int32).reshape(b, 1, h, w).copy()
    return labels, areas


def connected_components_jax(mask) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-JAX 8-connectivity labeling: iterative min-index propagation under
    lax.while_loop (converges in O(diameter) 3x3 min-pool steps)."""
    import jax
    import jax.numpy as jnp

    mask_j = jnp.asarray(mask)
    b, c, h, w = mask_j.shape
    fg = mask_j.reshape(b, h, w) > 0
    big = jnp.int32(h * w + 1)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    init = jnp.where(fg, idx, big)

    def min_pool(x):
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=h * w + 1)
        windows = jnp.stack([p[:, dy:dy + h, dx:dx + w]
                             for dy in range(3) for dx in range(3)])
        return jnp.min(windows, axis=0)

    def cond(state):
        x, changed = state
        return changed

    def body(state):
        x, _ = state
        nx = jnp.where(fg, jnp.minimum(x, min_pool(x)), big)
        return nx, jnp.any(nx != x)

    final, _ = jax.lax.while_loop(cond, body, (init, jnp.asarray(True)))
    final = np.asarray(final)

    labels = np.zeros((b, h, w), np.int32)
    areas = np.zeros((b, h, w), np.int32)
    for i in range(b):
        fgm = np.asarray(fg[i])
        roots, inverse, counts = np.unique(final[i][fgm],
                                           return_inverse=True,
                                           return_counts=True)
        lab = np.zeros((h, w), np.int32)
        ar = np.zeros((h, w), np.int32)
        lab[fgm] = inverse + 1
        ar[fgm] = counts[inverse]
        labels[i], areas[i] = lab, ar
    return labels[:, None], areas[:, None]


def get_connected_components(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatcher matching sam2._C.get_connected_componnets' contract."""
    try:
        return connected_components_native(np.asarray(mask))
    except Exception:
        return connected_components_jax(np.asarray(mask))


def fill_holes_in_mask_scores(mask: np.ndarray, max_area: int) -> np.ndarray:
    """Remove small holes/sprinkles (sam2/utils/misc.py:268): background
    components with area <= max_area become foreground, and vice versa for
    small foreground specks."""
    if max_area <= 0:
        return mask
    binary = (mask > 0).astype(np.uint8)
    if binary.ndim == 2:
        binary = binary[None, None]
        squeeze = True
    else:
        squeeze = False
    _, hole_areas = get_connected_components(1 - binary)
    _, speck_areas = get_connected_components(binary)
    out = binary.copy()
    out[(binary == 0) & (hole_areas > 0) & (hole_areas <= max_area)] = 1
    out[(binary == 1) & (speck_areas > 0) & (speck_areas <= max_area)] = 0
    return out[0, 0] if squeeze else out

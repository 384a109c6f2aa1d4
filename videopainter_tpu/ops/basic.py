"""Primitive ops and the mixed-precision policy.

TPU numerics stance (SURVEY.md §7 hard-part 1): matmuls run in the compute
dtype (bf16 on TPU → MXU), while normalizations, softmax, and modulation run
with float32 accumulation. Parameters live in `param_dtype`.

Params are plain nested dicts: Linear = {"kernel": [in,out], "bias": [out]},
LayerNorm = {"scale": [d], "bias": [d]} (affine optional).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32  # accumulation dtype for norms/softmax

    def cast(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)


# -- activation-scale calibration tap -----------------------------------------
# When a collector list is installed, every DYNAMIC int8 linear appends its
# global activation amax (a traced scalar) in call order. The installer
# (models/dit.py scan_body under calibrate=True) drains the list into the
# layer scan's ys, so per-layer per-site amax escapes the scan as [L, n_sites].
# Trace-time only: taps fire while the scan body is being traced, never at
# runtime, so this costs nothing when calibration is off.
_CALIB_TAP = None


def _set_calib_tap(collector):
    """Install (a list) or remove (None) the calibration collector.
    Returns the previous collector so callers can restore it."""
    global _CALIB_TAP
    prev = _CALIB_TAP
    _CALIB_TAP = collector
    return prev


def linear(p: dict, x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """y = x @ kernel + bias. kernel: [in, out].

    Dispatches on the param structure: a `kernel_q` leaf selects the W8A8
    int8 path (see quantize_linear_int8) — the v5e MXU runs int8 at 2x the
    bf16 rate, the main lever on the ~50 ms/layer dense share of the
    profile. Opt-in via videopainter_tpu.quantize.quantize_params_int8.
    """
    if "kernel_q" in p:
        y = _linear_int8(p, x)
    else:
        y = jnp.dot(x, p["kernel"].astype(x.dtype), precision=precision)
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"].astype(y.dtype)
    if "lora" in p:
        # Additive LoRA (models/lora.attach_lora): y += scale*(x@A)@B. Exactly
        # the merged-kernel math, but it never materializes W+ΔW — so it
        # composes with the int8 path above (QLoRA: frozen int8 base + bf16
        # low-rank delta, reference train_..._resample.py's LoraConfig).
        lp = p["lora"]
        delta = jnp.dot(jnp.dot(x, lp["lora_A"].astype(x.dtype),
                                precision=precision),
                        lp["lora_B"].astype(x.dtype), precision=precision)
        y = y + delta * lp["scale"].astype(y.dtype)
    return y


@jax.custom_vjp
def _int8_matmul_ste(x32, xs, kernel_q, kscale):
    """y = clip(round(x32/xs)) @ kernel_q * xs * kscale, int32 MXU accumulation.

    Backward = straight-through estimator: the quantize (round/clip and the
    xs dependence on x in the dynamic mode) is treated as identity, so
    dx = (g * kscale) @ dequantized-W^T — the QLoRA-style recipe that makes a
    FROZEN int8 backbone differentiable (branch/LoRA grads flow through it).
    Without this, autodiff through round() silently yields ~zero gradients."""
    xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q,
        dimension_numbers=(((x32.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * kscale.astype(jnp.float32)


def _int8_matmul_ste_fwd(x32, xs, kernel_q, kscale):
    return _int8_matmul_ste(x32, xs, kernel_q, kscale), (kernel_q, kscale,
                                                         xs.shape)


def _int8_matmul_ste_bwd(res, g):
    import numpy as np

    kernel_q, kscale, xs_shape = res
    # bf16 matmul against the dequantized weights (cast is a per-call temp;
    # the resident weights stay int8)
    gk = (g * kscale.astype(jnp.float32)).astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        gk, kernel_q.astype(jnp.bfloat16),
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (dx, jnp.zeros(xs_shape, jnp.float32),
            np.zeros(kernel_q.shape, jax.dtypes.float0),
            jnp.zeros_like(kscale))


_int8_matmul_ste.defvjp(_int8_matmul_ste_fwd, _int8_matmul_ste_bwd)


def _linear_int8(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 with per-out-channel weight scales and per-token activation
    scales; int32 accumulation on the MXU.

    Activation scales: dynamic per-token max|x|/127 by default. If the params
    carry an `ascale` leaf (static calibrated per-layer scale, see
    quantize.attach_static_ascale), the per-token reduce is skipped — the
    quantize becomes a fused multiply/round/clip with clipping instead of
    rescaling for outliers (SmoothQuant-style static W8A8).

    Differentiable via a straight-through estimator (see _int8_matmul_ste):
    a frozen int8 backbone passes exact-in-expectation gradients to whatever
    feeds it (branch features, LoRA adapters)."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    if "ascale" in p:
        xs = p["ascale"].astype(jnp.float32)  # scalar (per layer under scan)
        xs = jnp.broadcast_to(xs, x32.shape[:-1] + (1,))
    else:
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        if _CALIB_TAP is not None:
            _CALIB_TAP.append(jnp.max(amax))  # global amax, in call order
        xs = jnp.where(amax > 0, amax / 127.0, 1.0)
        xs = jax.lax.stop_gradient(xs)  # STE: no grad through the amax path
    y = _int8_matmul_ste(x32, xs, p["kernel_q"], p["kscale"])
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(orig)


def _quantize_kernel_int8(w):
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=False)
    scale = jnp.where(amax > 0, amax / 127.0, jnp.float32(1.0))
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[..., None, :]),
                 -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def _quantize_stacked_int8(w):
    # layer-at-a-time: the f32 temporaries of a 42-layer [L, 3072, 12288]
    # stack would otherwise coexist with the resident bf16 params (6+ GiB on
    # a chip that is already ~70% full of weights)
    return jax.lax.scan(lambda _, wi: (None, _quantize_kernel_int8(wi)),
                        None, w)[1]


def quantize_linear_int8(p: dict, *, free_source: bool = False) -> dict:
    """Linear params -> int8 weights + per-out-channel scales.

    Works on plain [in, out] kernels and scan-stacked [L, in, out] kernels
    (the reduction runs over the `in` axis either way; stacked kernels are
    quantized one layer at a time to bound the f32 temporaries).

    free_source=True pops the source kernel out of `p` as soon as the int8
    copy is built, so quantizing an on-chip model never holds both full
    trees — at 42-layer/16 GB scale the bf16 stack alone is ~70% of HBM.
    """
    w = p["kernel"]
    if w.ndim >= 3:
        q, scale = _quantize_stacked_int8(w)
    else:
        q, scale = _quantize_kernel_int8(w)
    out = {"kernel_q": q, "kscale": scale}
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"]
    if free_source:
        jax.block_until_ready(q)
        del w
        p.pop("kernel")
    return out


def layer_norm(p: Optional[dict], x: jnp.ndarray, *, eps: float = 1e-5,
               dtype=jnp.float32) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 statistics; affine if p given."""
    orig = x.dtype
    x32 = x.astype(dtype)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p is not None and "scale" in p:
        y = y * p["scale"].astype(dtype)
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"].astype(dtype)
    return y.astype(orig)


def group_norm(p: dict, x: jnp.ndarray, *, num_groups: int, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over channel-last input [..., C] with fp32 statistics.

    Statistics are computed per (batch, group) across all non-batch spatial dims,
    matching torch.nn.GroupNorm on [B, C, *spatial] inputs (our layout is
    [B, *spatial, C]).
    """
    orig = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    x32 = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """gelu-approximate (tanh), the CogVideoX FF activation (attention.py:1176-1177)."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


# -- initializers ------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int, *, bias: bool = True,
                dtype=jnp.float32, zero: bool = False) -> dict:
    if zero:
        k = jnp.zeros((d_in, d_out), dtype=dtype)
    else:
        # torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))
        bound = 1.0 / (d_in ** 0.5)
        k = jax.random.uniform(key, (d_in, d_out), dtype=jnp.float32,
                               minval=-bound, maxval=bound).astype(dtype)
    p = {"kernel": k}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype=dtype)
    return p


def init_layer_norm(d: int, *, affine: bool = True, bias: bool = True,
                    dtype=jnp.float32) -> Optional[dict]:
    if not affine:
        return None
    p = {"scale": jnp.ones((d,), dtype=dtype)}
    if bias:
        p["bias"] = jnp.zeros((d,), dtype=dtype)
    return p


def init_group_norm(c: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((c,), dtype=dtype), "bias": jnp.zeros((c,), dtype=dtype)}

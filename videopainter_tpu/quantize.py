"""Opt-in int8 (W8A8) inference quantization.

TPU rationale: the per-layer profile splits ~119 ms flash attention /
~50 ms dense projections / ~18 ms padding overhead. The dense share runs at
the bf16 MXU roofline, so the remaining lever is the datapath itself — the
v5e MXU executes int8 x int8 -> int32 at twice the bf16 rate. This module
rewrites the DiT/branch block projections (attention q/k/v/out + both
feed-forward linears) into the `kernel_q` format that `ops.basic.linear`
dispatches on: per-out-channel weight scales, dynamic per-token activation
scales, int32 accumulation.

Quantization is OPT-IN and approximate (not parity-safe): norms, modulation,
patch/time embeds, and proj_out stay bf16/fp32 — they are tiny and numerically
sensitive. The reference has no quantized path (beyond-reference feature).

Usage:
    params["transformer"] = quantize_transformer_int8(params["transformer"])
    params["branch"] = quantize_transformer_int8(params["branch"])
"""

from __future__ import annotations

from typing import Iterable

import jax

from .ops.basic import quantize_linear_int8

# block-level projections worth quantizing: the big [D, D] / [D, 4D] matmuls
# ("to_qkv" is the fused-projection slot from fuse_qkv_projections)
_BLOCK_LINEARS = ("to_q", "to_k", "to_v", "to_qkv", "to_out",
                  "proj_in", "proj_out")


def _quantize_block_tree(tree: dict, free_source: bool) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            if k in _BLOCK_LINEARS and "kernel" in v:
                out[k] = quantize_linear_int8(v, free_source=free_source)
            else:
                out[k] = _quantize_block_tree(v, free_source)
        else:
            out[k] = v
    return out


def attach_static_ascale(params: dict, ascale,
                         subtrees: Iterable[str] = ("blocks",)) -> dict:
    """Attach STATIC activation scales to int8-quantized block linears.

    With an `ascale` leaf present, ops.basic._linear_int8 skips the dynamic
    per-token max-reduce (activation outliers clip at ±127 instead of
    rescaling) — the quantize fuses into the producing op's epilogue.

    ascale: float (uniform; perf A/B) or a dict mapping linear names
    (subset of to_q/to_k/to_v/to_qkv/to_out/proj_in/proj_out) to per-layer
    [L] arrays from calibrate_ascales(). Returns a new tree; quantized leaves
    are shared, only the touched linear dicts are copied.
    """
    import jax.numpy as jnp

    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in _BLOCK_LINEARS and "kernel_q" in v:
                    if isinstance(ascale, dict):
                        if k not in ascale:
                            out[k] = v
                            continue
                        s = jnp.asarray(ascale[k], jnp.float32)
                    else:
                        # uniform: stack along L so the scan slices a scalar
                        L = v["kernel_q"].shape[0] if v["kernel_q"].ndim >= 3 else ()
                        s = jnp.full((L,) if L else (), float(ascale), jnp.float32)
                    out[k] = dict(v, ascale=s)
                else:
                    out[k] = visit(v)
            else:
                out[k] = v
        return out

    out = dict(params)
    for name in subtrees:
        if name in params:
            out[name] = visit(params[name])
    return out


def ascale_site_order(blocks: dict) -> list:
    """The quantized-linear SITE NAMES in the plain forward path's call order
    (ops/attention.py:126-131 then :240, then feed_forward.py:17-19) — the
    order the calibration tap records amaxes in. Raises if the structure is
    not one of the two known layouts (separate or fused qkv)."""
    sites = []
    attn = blocks.get("attn1", {})
    for n in ("to_qkv", "to_q", "to_k", "to_v"):
        if isinstance(attn.get(n), dict) and "kernel_q" in attn[n]:
            sites.append(n)
    if isinstance(attn.get("to_out"), dict) and "kernel_q" in attn["to_out"]:
        sites.append("to_out")
    ff = blocks.get("ff", {})
    for n in ("proj_in", "proj_out"):
        if isinstance(ff.get(n), dict) and "kernel_q" in ff[n]:
            sites.append(n)
    if sites not in (["to_q", "to_k", "to_v", "to_out", "proj_in", "proj_out"],
                     ["to_qkv", "to_out", "proj_in", "proj_out"]):
        raise ValueError(f"unexpected quantized-site layout: {sites}")
    return sites


def calibrate_ascales(model, params: dict, samples, *, margin: float = 1.0,
                      subtree: str = "blocks") -> dict:
    """Calibrate STATIC per-layer activation scales from sample forwards.

    Runs `model.apply(params, *args, **kwargs, calibrate=True)` for each
    sample (params must already be dynamic-int8, quantize_transformer_int8)
    and records each quantized linear's input amax per layer — through the
    serving numerics themselves, so downstream layers see the int8 error they
    will see at inference. Returns {site: [L] float32 scale} for
    attach_static_ascale: scale = max-over-samples(amax) * margin / 127.

    samples: iterable of (args, kwargs) for model.apply — e.g. several
    (latents, prompt_embeds, timestep) triples spanning the denoise
    trajectory (early/mid/late timesteps; both CFG branches). margin > 1
    leaves headroom so unseen data clips less.

    Works for CogVideoXTransformer3D (TransformerOutput.calib_amax) and
    CogVideoXBranch ((features, amax) tuple). Eager per-sample calls; jit
    `partial(model.apply, calibrate=True)` yourself for on-chip calibration.
    """
    import numpy as np

    acc = None
    for args, kwargs in samples:
        out = model.apply(params, *args, calibrate=True, **kwargs)
        a = out.calib_amax if hasattr(out, "calib_amax") else out[1]
        a = np.asarray(jax.device_get(a), np.float32)  # [L, n_sites]
        acc = a if acc is None else np.maximum(acc, a)
    if acc is None:
        raise ValueError("calibrate_ascales needs at least one sample")
    sites = ascale_site_order(params[subtree])
    if acc.shape[1] != len(sites):
        raise ValueError(
            f"tap recorded {acc.shape[1]} sites/layer but the param tree has "
            f"{len(sites)} quantized linears ({sites}) — did a variant path "
            "add extra projections?")
    return {name: acc[:, i] * (float(margin) / 127.0)
            for i, name in enumerate(sites)}


def save_ascales(path: str, scales_by_model: dict,
                 provenance: dict | None = None) -> None:
    """Write calibrated activation scales to an .npz.

    scales_by_model: {"transformer": {site: [L]}, "branch": {site: [L]}}
    (each inner dict from calibrate_ascales). Keys flatten to
    "<model>/<site>" in the archive.

    provenance (optional): a JSON-serializable dict recording how the scales
    were produced (tool invocation, calibration sample set / step coverage,
    margin) — stored under the reserved key "__provenance__" so deployments
    can audit what a scales file was calibrated on.
    """
    import json as _json

    import numpy as np

    flat = {f"{m}/{s}": np.asarray(v, np.float32)
            for m, sites in scales_by_model.items() for s, v in sites.items()}
    if not flat:
        raise ValueError("no scales to save")
    if provenance is not None:
        flat["__provenance__"] = np.frombuffer(
            _json.dumps(provenance, sort_keys=True).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_ascales(path: str, return_provenance: bool = False):
    """Inverse of save_ascales: {"<model>": {site: [L] float32}}.

    return_provenance=True returns (scales, provenance_dict_or_None).
    """
    import json as _json

    import numpy as np

    out: dict = {}
    prov = None
    with np.load(path) as z:
        for k in z.files:
            if k == "__provenance__":
                prov = _json.loads(bytes(z[k].tobytes()).decode())
                continue
            m, s = k.split("/", 1)
            out.setdefault(m, {})[s] = z[k]
    if return_provenance:
        return out, prov
    return out


def quantize_transformer_int8(params: dict,
                              subtrees: Iterable[str] = ("blocks",),
                              *, free_source: bool = False) -> dict:
    """Quantize the stacked block projections of a DiT/branch param tree.

    Only descends into `subtrees` (default: the scan-stacked "blocks") so
    embeddings, norms, and output heads keep full precision.

    free_source=True drops each source kernel from `params` (mutating it) as
    its int8 copy lands — required to quantize a full 42-layer model in place
    on one 16 GB chip, where holding the bf16 and int8 trees simultaneously
    exceeds HBM.
    """
    out = dict(params)
    for name in subtrees:
        if name in params:
            out[name] = _quantize_block_tree(params[name], free_source)
    return out

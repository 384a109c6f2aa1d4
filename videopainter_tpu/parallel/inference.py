"""Multi-chip inference: tensor/sequence-parallel pipeline execution.

The reference has no inference parallelism (single GPU, SURVEY.md §2f); the
TPU-native design shards the denoise loop over a Mesh:

 - DiT block weights TP-sharded over `model` (heads / FFN hidden) — GSPMD
   inserts the all-reduces after attention out-proj and FFN down-proj
 - the CFG pair (uncond/cond) shards over `data`
 - activations' video-token axis may shard over `seq` (einsum attention path;
   the Pallas kernel is single-chip and used when the mesh is absent)

Usage:
    mesh = make_mesh(data=2, model=4)
    params = shard_inference_params(params, mesh)
    pipe.set_mesh(mesh)      # denoise jits with sharded params in_shardings
    out = pipe(params, ...)
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES
from .sharding import (branch_param_specs, shard_params,
                       transformer_param_specs, vae_param_specs)


def inference_param_specs(params: dict) -> dict:
    """Spec tree for a pipeline params dict {transformer, branch, vae, ...}."""
    specs = {}
    for k, v in params.items():
        if k == "transformer":
            specs[k] = transformer_param_specs(v)
        elif k == "branch":
            specs[k] = branch_param_specs(v)
        else:
            specs[k] = jax.tree.map(lambda _: P(), v)
    return specs


def shard_inference_params(params: dict, mesh: Mesh) -> dict:
    """device_put the pipeline params with TP shardings."""
    specs = inference_param_specs(params)
    return {k: shard_params(params[k], specs[k], mesh) for k in params}


def denoise_shardings(params: dict, mesh: Mesh):
    """(in_shardings for (params, inputs, rope, rng, prev_state)) for the
    fused denoise fn — params TP-sharded, data replicated (the CFG doubling
    happens inside the jit; XLA propagates)."""
    pspecs = inference_param_specs(params)
    ps = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                      is_leaf=lambda x: isinstance(x, P))
    rep = NamedSharding(mesh, P())
    return ps, rep

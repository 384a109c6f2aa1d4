"""Device mesh construction.

The reference scales only by data parallelism (8-GPU DeepSpeed ZeRO-2 over
NCCL, SURVEY.md §2f). The TPU-native replacement is one `jax.sharding.Mesh`
with three axes:

  data  — batch/data parallel (DCN-friendly; gradients all-reduce here)
  seq   — sequence/context parallel over the ~17.5k video tokens (ICI)
  model — megatron-style tensor parallel over attention heads / FFN hidden

GSPMD inserts the collectives; no hand-written comm layer (the NCCL analog
is `jax.distributed.initialize` + XLA collectives over ICI/DCN).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    seq: str = "seq"
    model: str = "model"


AXES = MeshAxes()


def make_mesh(data: int = 1, seq: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with (data, seq, model) axes. Total must equal device count.

    Axis order puts `model` innermost so TP collectives ride the fastest ICI
    links; `data` outermost so DP gradient reduction can cross DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = data * seq * model
    if n != len(devices):
        raise ValueError(f"mesh {data}x{seq}x{model}={n} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, seq, model)
    return Mesh(arr, (AXES.data, AXES.seq, AXES.model))


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Reasonable default: all devices on `data` (the reference's strategy)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return make_mesh(data=n, devices=devices[:n])


def initialize_distributed(**kwargs) -> int:
    """Multi-host bring-up: `jax.distributed.initialize` (the NCCL-rendezvous
    analog of `accelerate launch`, train/accelerate_config_machine_single_ds
    .yaml). No-op when single-process (no coordinator configured) or already
    initialized. Returns this host's process index."""
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:
        already = False
    if not already:
        import os

        has_coord = ("coordinator_address" in kwargs
                     or os.environ.get("JAX_COORDINATOR_ADDRESS")
                     or os.environ.get("COORDINATOR_ADDRESS"))
        if has_coord:
            jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_hybrid_mesh(dcn_data: int = 1, data: int = 1, seq: int = 1,
                     model: int = 1) -> Mesh:
    """Multi-slice mesh: `dcn_data` ranges over slices (gradient all-reduce
    crosses DCN there) while (data, seq, model) stay within a slice so their
    collectives ride ICI. Both leading axes are exposed under the single
    `data` mesh axis name by flattening, so all existing (data, seq, model)
    PartitionSpecs work unchanged — GSPMD maps the flattened axis onto the
    [slice, intra-slice] device order, which keeps same-slice replicas
    adjacent.

    Falls back to a plain mesh when running single-slice (CPU tests, one
    chip): the DCN factor then just multiplies `data`.
    """
    n = dcn_data * data * seq * model
    devices = jax.devices()
    if n != len(devices):
        raise ValueError(f"hybrid mesh {dcn_data}x{data}x{seq}x{model}={n} "
                         f"!= {len(devices)} devices")
    if dcn_data > 1 and all(hasattr(d, "slice_index") for d in devices):
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (data, seq, model), dcn_mesh_shape=(dcn_data, 1, 1),
            devices=devices)  # [dcn*data, seq, model] with slice-major order
        arr = arr.reshape(dcn_data * data, seq, model)
        return Mesh(arr, (AXES.data, AXES.seq, AXES.model))
    return make_mesh(data=dcn_data * data, seq=seq, model=model,
                     devices=devices)

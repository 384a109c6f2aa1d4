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

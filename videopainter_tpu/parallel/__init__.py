from .mesh import make_mesh, MeshAxes
from .sharding import (
    transformer_param_specs,
    branch_param_specs,
    vae_param_specs,
    activation_spec,
    optimizer_state_specs,
    opt_state_specs,
    shard_params,
)

__all__ = [
    "make_mesh", "MeshAxes",
    "transformer_param_specs", "branch_param_specs", "vae_param_specs",
    "activation_spec", "optimizer_state_specs", "opt_state_specs", "shard_params",
]

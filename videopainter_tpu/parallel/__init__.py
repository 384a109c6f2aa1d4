from .mesh import (make_mesh, auto_mesh, make_hybrid_mesh,
                   initialize_distributed, MeshAxes)
from .ring_attention import ring_attention
from .inference import shard_inference_params, inference_param_specs
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
    "make_mesh", "auto_mesh", "make_hybrid_mesh",
    "initialize_distributed", "MeshAxes", "ring_attention",
    "shard_inference_params", "inference_param_specs",
    "transformer_param_specs", "branch_param_specs", "vae_param_specs",
    "activation_spec", "optimizer_state_specs", "opt_state_specs", "shard_params",
]

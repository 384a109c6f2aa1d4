from .basic import (
    Policy,
    DEFAULT_POLICY,
    linear,
    layer_norm,
    group_norm,
    gelu_tanh,
    silu,
    init_linear,
    init_layer_norm,
)
from .rope import get_3d_rotary_pos_embed, apply_rotary_emb, get_resize_crop_region_for_grid
from .sincos import get_3d_sincos_pos_embed
from .embeddings import timestep_embedding, timestep_mlp, init_timestep_mlp
from .patch_embed import patch_embed, init_patch_embed, pool_patch_mask
from .norms import layer_norm_zero, ada_layer_norm, init_layer_norm_zero, init_ada_layer_norm
from .attention import joint_attention, init_attention, fuse_qkv, fuse_qkv_projections
from .feed_forward import feed_forward, init_feed_forward

__all__ = [
    "Policy", "DEFAULT_POLICY", "linear", "layer_norm", "group_norm", "gelu_tanh", "silu",
    "init_linear", "init_layer_norm",
    "get_3d_rotary_pos_embed", "apply_rotary_emb", "get_resize_crop_region_for_grid",
    "get_3d_sincos_pos_embed",
    "timestep_embedding", "timestep_mlp", "init_timestep_mlp",
    "patch_embed", "init_patch_embed", "pool_patch_mask",
    "layer_norm_zero", "ada_layer_norm", "init_layer_norm_zero", "init_ada_layer_norm",
    "joint_attention", "init_attention", "fuse_qkv", "fuse_qkv_projections",
    "feed_forward", "init_feed_forward",
]

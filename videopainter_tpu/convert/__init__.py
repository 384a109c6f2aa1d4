from .torch_to_flax import (
    convert_transformer_state_dict,
    convert_branch_state_dict,
    convert_vae_state_dict,
    load_safetensors_dir,
)

__all__ = [
    "convert_transformer_state_dict",
    "convert_branch_state_dict",
    "convert_vae_state_dict",
    "load_safetensors_dir",
]

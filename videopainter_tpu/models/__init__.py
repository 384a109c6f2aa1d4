from .dit import (
    CogVideoXTransformer3D,
    dit_block,
    init_dit_block,
)
from .branch import CogVideoXBranch
from .vae import AutoencoderKLCogVideoX, DiagonalGaussian

__all__ = [
    "CogVideoXTransformer3D",
    "CogVideoXBranch",
    "AutoencoderKLCogVideoX",
    "DiagonalGaussian",
    "dit_block",
    "init_dit_block",
]

from .dit import (
    CogVideoXTransformer3D,
    dit_block,
    init_dit_block,
)
from .branch import CogVideoXBranch

__all__ = [
    "CogVideoXTransformer3D",
    "CogVideoXBranch",
    "dit_block",
    "init_dit_block",
]

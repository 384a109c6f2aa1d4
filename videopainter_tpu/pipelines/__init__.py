from .inpaint import CogVideoXI2VDualInpaintPipeline
from .inpaint_anyl import CogVideoXI2VDualInpaintAnyLPipeline
from .generation import (
    CogVideoXPipeline,
    CogVideoXImageToVideoPipeline,
    CogVideoXVideoToVideoPipeline,
)
from .variants import (
    CogVideoXDualInpaintPipeline,
    CogVideoXSFTInpaintPipeline,
    CogVideoXI2VInpaintAnyLPipeline,
    CogVideoXSelfGuidanceInpaintPipeline,
    CogVideoXInpaintPipeline,
    CogVideoXImageToVideoInpaintPipeline,
    make_sft_inpaint_transformer,
    init_sft_from_transformer,
)

__all__ = [
    "CogVideoXPipeline",
    "CogVideoXImageToVideoPipeline",
    "CogVideoXVideoToVideoPipeline",
    "CogVideoXI2VDualInpaintPipeline",
    "CogVideoXI2VDualInpaintAnyLPipeline",
    "CogVideoXDualInpaintPipeline",
    "CogVideoXSFTInpaintPipeline",
    "CogVideoXI2VInpaintAnyLPipeline",
    "CogVideoXSelfGuidanceInpaintPipeline",
    "CogVideoXInpaintPipeline",
    "CogVideoXImageToVideoInpaintPipeline",
    "make_sft_inpaint_transformer",
    "init_sft_from_transformer",
]

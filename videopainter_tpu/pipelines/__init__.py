from .inpaint import CogVideoXI2VDualInpaintPipeline
from .inpaint_anyl import CogVideoXI2VDualInpaintAnyLPipeline

__all__ = [
    "CogVideoXI2VDualInpaintPipeline",
    "CogVideoXI2VDualInpaintAnyLPipeline",
]

from .metrics import MetricsCalculator, psnr, ssim, mse, mae, frechet_distance
from .harness import EvalConfig, run_inpainting_eval

__all__ = [
    "MetricsCalculator", "psnr", "ssim", "mse", "mae", "frechet_distance",
    "EvalConfig", "run_inpainting_eval",
]

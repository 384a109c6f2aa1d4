from .metrics import MetricsCalculator, psnr, ssim, mse, mae, frechet_distance
from .harness import EvalConfig, run_inpainting_eval
from .lpips import LpipsExtractor, convert_lpips_state_dict, lpips_forward

__all__ = [
    "MetricsCalculator", "psnr", "ssim", "mse", "mae", "frechet_distance",
    "EvalConfig", "run_inpainting_eval",
    "LpipsExtractor", "convert_lpips_state_dict", "lpips_forward",
]

"""videopainter_tpu — a TPU-native (JAX / Flax / Pallas / pjit) video-inpainting framework.

A from-scratch rebuild of the capabilities of VideoPainter (yxbian23/VideoPainter):
the CogVideoX-5b-I2V DiT backbone plus its ~6%-parameter dual-stream context encoder,
the causal 3D VAE, DDIM/DPM v-prediction schedulers, single-clip and any-length
inpainting pipelines with target-region ID resampling, branch/LoRA training, and a
VPBench/DAVIS evaluation harness — all re-designed TPU-first (bf16 MXU matmuls,
static shapes, lax.scan denoise loops, GSPMD sharding over a jax.sharding.Mesh).

Reference parity map lives in SURVEY.md; each module cites the reference file:line
whose behavior it reproduces.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

__all__ = ["config"]

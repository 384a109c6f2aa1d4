"""SAM2 video segmentation — TPU-native (JAX) reimplementation.

Reference subsystem: app/sam2/ (SURVEY.md §2e) — Hiera image encoder + FPN
neck, prompt encoder, two-way-transformer mask decoder, streaming memory
attention/encoder, and the interactive video predictor used by the gradio app
to turn user clicks into per-frame masks.

Modules:
  modules   — shared primitives (MLP, channel-LayerNorm, windowing, pos encs)
  hiera     — Hiera trunk + FPN neck (image encoder)
  sam_heads — prompt encoder, two-way transformer, mask decoder
  memory    — memory attention (RoPE cross-attn) + memory encoder
  predictor — SAM2VideoPredictor: init_state / add_new_points /
              propagate_in_video / reset_state
  convert   — torch SAM2 checkpoint -> param pytrees
"""

from .predictor import SAM2VideoPredictor, SAM2Config

__all__ = ["SAM2VideoPredictor", "SAM2Config"]

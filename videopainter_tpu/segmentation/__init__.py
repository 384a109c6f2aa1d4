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


def build_sam2_video_predictor(variant: str, checkpoint_path: str,
                               image_size: int = 1024) -> SAM2VideoPredictor:
    """build_sam.py:60+ analog: variant in {tiny, small, base_plus, large},
    checkpoint = torch SAM2 .pt, or the converted .npz from
    tools/convert_checkpoint.py."""
    from .hiera import hiera_config

    if checkpoint_path.endswith(".npz"):
        from .convert import load_sam2_npz

        params = load_sam2_npz(checkpoint_path)
    else:
        import torch

        from .convert import convert_sam2_state_dict

        ckpt = torch.load(checkpoint_path, map_location="cpu")
        sd = ckpt.get("model", ckpt)
        params = convert_sam2_state_dict(
            {k: v.numpy() for k, v in sd.items()})
    cfg = SAM2Config(hiera=hiera_config(variant), image_size=image_size)
    return SAM2VideoPredictor(cfg, params)


__all__ = ["SAM2VideoPredictor", "SAM2Config", "build_sam2_video_predictor"]

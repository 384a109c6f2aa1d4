"""Stock CogVideoX generation pipelines (no inpainting conditioning).

Reference inventory (§2b): the upstream `CogVideoXPipeline` (T2V),
`CogVideoXImageToVideoPipeline` (I2V) and `CogVideoXVideoToVideoPipeline`
(strength-based V2V) ship unmodified in the fork and back the VideoPainter
stack. Here they are thin wrappers over the same fused denoise scan
(mode="plain", no branch, no mask conditioning).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .inpaint import CogVideoXI2VDualInpaintPipeline


class _GenerationBase(CogVideoXI2VDualInpaintPipeline):
    _mode = "plain"

    def __init__(self, transformer, vae, scheduler, text_encoder=None):
        super().__init__(transformer, None, vae, scheduler, text_encoder)

    def _generate(self, params, *, num_frames: int, height: int, width: int,
                  image=None, video=None, strength: float = 1.0, **kw):
        b = 1
        if video is None:
            # pure generation: a blank video drives only shape/latent prep
            # (replace_gt off, so its latents never touch the output)
            video = jnp.zeros((b, num_frames, height, width, 3), jnp.float32)
        masks = jnp.zeros(video.shape[:4], jnp.float32)
        return super().__call__(params, video=video, masks=masks, image=image,
                                strength=strength, replace_gt=False,
                                mask_add=False, **kw)


class CogVideoXPipeline(_GenerationBase):
    """Text-to-video generation."""

    def __call__(self, params, *, num_frames: int = 49, height: int = 480,
                 width: int = 720, **kw):
        return self._generate(params, num_frames=num_frames, height=height,
                              width=width, **kw)


class CogVideoXImageToVideoPipeline(_GenerationBase):
    """Image-to-video generation (first-frame conditioned; requires the I2V
    backbone with in_channels == 2 * latent_channels)."""

    def __call__(self, params, *, image, num_frames: int = 49,
                 height: int = 480, width: int = 720, **kw):
        return self._generate(params, num_frames=num_frames, height=height,
                              width=width, image=image, **kw)


class CogVideoXVideoToVideoPipeline(_GenerationBase):
    """Video-to-video: init latents from the noised input video at `strength`."""

    def __call__(self, params, *, video, strength: float = 0.8, **kw):
        return self._generate(params, num_frames=video.shape[1],
                              height=video.shape[2], width=video.shape[3],
                              video=video, strength=strength, **kw)

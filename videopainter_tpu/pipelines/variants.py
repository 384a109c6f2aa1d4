"""Baseline / variant pipelines (reference §2b inventory).

| class                               | reference file                                  | mode |
|-------------------------------------|--------------------------------------------------|------|
| CogVideoXDualInpaintPipeline        | pipeline_cogvideox_inpainting_branch.py:160      | dual (T2V backbone, no image latents) |
| CogVideoXSFTInpaintPipeline         | pipeline_cogvideox_inpainting_sft.py:156         | sft  |
| CogVideoXI2VInpaintAnyLPipeline     | pipeline_cogvideox_inpainting_i2v_anyl.py:161    | sft, any-length (backbone-only baseline) |
| CogVideoXSelfGuidanceInpaintPipeline| pipeline_cogvideox_inpainting_selfguidance.py:153| selfguidance |
| CogVideoXInpaintPipeline            | pipeline_cogvideox_inpainting.py:154             | plain (latent blending via replace_gt) |
| CogVideoXImageToVideoInpaintPipeline| pipeline_cogvideox_image2video_inpainting.py:155 | plain + image conditioning |

All share the base machinery in pipelines/inpaint.py; the mode switches the
fused denoise step (pipelines/common.py model_step).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import TransformerConfig
from ..models.dit import CogVideoXTransformer3D
from .inpaint import CogVideoXI2VDualInpaintPipeline
from .inpaint_anyl import CogVideoXI2VDualInpaintAnyLPipeline


class CogVideoXDualInpaintPipeline(CogVideoXI2VDualInpaintPipeline):
    """T2V dual-stream variant — same flagship path, no first-frame latents
    (transformer in_channels == latent_channels, so image concat is skipped)."""

    _mode = "dual"


class CogVideoXSFTInpaintPipeline(CogVideoXI2VDualInpaintPipeline):
    """Full-backbone-finetune baseline: widened patch embed eats
    [noisy ‖ masked ‖ mask]; no branch.

    NOTE: the reference computes `init_latents_proper`/`init_mask` each step
    but never applies the blend (pipeline_..._sft.py:890-904 is dead code),
    so this class pins replace_gt=False for parity.
    """

    _mode = "sft"

    def __init__(self, transformer, vae, scheduler, text_encoder=None):
        super().__init__(transformer, None, vae, scheduler, text_encoder)

    def __call__(self, params, **kw):
        kw["replace_gt"] = False
        return super().__call__(params, **kw)


class CogVideoXI2VInpaintAnyLPipeline(CogVideoXI2VDualInpaintAnyLPipeline):
    """Any-length WITHOUT branch (SFT backbone-only; used by
    evaluate/eval_inpainting_wo_branch.py:147)."""

    _mode = "sft"

    def __init__(self, transformer, vae, scheduler, text_encoder=None):
        super().__init__(transformer, None, vae, scheduler, text_encoder)


class CogVideoXSelfGuidanceInpaintPipeline(CogVideoXI2VDualInpaintPipeline):
    """Training-free baseline: per step, a second forward on noised
    masked-video latents caches per-layer hidden states which are mask-swapped
    into the main pass (reference :852-880).

    Reference fixed semantics (pinned here): latents start from the NOISED
    MASKED-video latents (:838-840) and every step blends against the
    re-noised masked-video latents unconditionally (:908-925). The reference
    loop is shape-inconsistent under CFG (its [2B] masked latents get doubled
    again at :846/:853), so parity holds for guidance_scale <= 1.
    """

    _mode = "selfguidance"

    def __init__(self, transformer, vae, scheduler, text_encoder=None):
        super().__init__(transformer, None, vae, scheduler, text_encoder)

    def __call__(self, params, **kw):
        kw["replace_gt"] = True
        return super().__call__(params, **kw)


class CogVideoXInpaintPipeline(CogVideoXI2VDualInpaintPipeline):
    """Plain latent-blending baseline: bare backbone + unconditional blend
    against the re-noised clean video latents
    (pipeline_cogvideox_inpainting.py:900-916)."""

    _mode = "plain"

    def __init__(self, transformer, vae, scheduler, text_encoder=None):
        super().__init__(transformer, None, vae, scheduler, text_encoder)

    def __call__(self, params, **kw):
        kw["replace_gt"] = True
        return super().__call__(params, **kw)


class CogVideoXImageToVideoInpaintPipeline(CogVideoXI2VDualInpaintPipeline):
    """Older I2V inpainting variant: image conditioning (first-frame latents
    concatenated on channel, :975-976) + unconditional blend against the
    re-noised clean video latents
    (pipeline_cogvideox_image2video_inpainting.py:1015-1028)."""

    _mode = "plain"

    def __init__(self, transformer, vae, scheduler, text_encoder=None):
        super().__init__(transformer, None, vae, scheduler, text_encoder)

    def __call__(self, params, **kw):
        kw["replace_gt"] = True
        return super().__call__(params, **kw)


# ---------------------------------------------------------------------------
# SFT inpaint model construction
# ---------------------------------------------------------------------------

def make_sft_inpaint_transformer(cfg: TransformerConfig) -> CogVideoXTransformer3D:
    """CogVideoXTransformer3DInpaintModel analog: patch embed widened to
    in_channels*2+1 (cogvideox_transformer_3d_inpainting.py:253-268)."""
    return CogVideoXTransformer3D(cfg, patch_in_channels=cfg.in_channels * 2 + 1)


def init_sft_from_transformer(key, base_params: dict, cfg: TransformerConfig,
                              dtype=jnp.float32) -> dict:
    """Widen a pretrained backbone's patch embed by duplicating the latent
    slots and zero-initializing the mask slot (reference :425-433)."""
    model = make_sft_inpaint_transformer(cfg)
    params = model.init(key, dtype=dtype)
    # copy everything except patch_embed.proj
    for k in base_params:
        if k == "patch_embed":
            params["patch_embed"]["text_proj"] = base_params["patch_embed"]["text_proj"]
            if "pos_embedding" in base_params["patch_embed"]:
                params["patch_embed"]["pos_embedding"] = \
                    base_params["patch_embed"]["pos_embedding"]
        else:
            params[k] = base_params[k]
    p = cfg.patch_size
    c = cfg.in_channels
    bb = base_params["patch_embed"]["proj"]["kernel"].reshape(p, p, c, -1)
    d = bb.shape[-1]
    new_k = jnp.zeros((p, p, 2 * c + 1, d), dtype=bb.dtype)
    new_k = new_k.at[:, :, :c].set(bb)
    new_k = new_k.at[:, :, c:2 * c].set(bb)
    params["patch_embed"]["proj"]["kernel"] = new_k.reshape(p * p * (2 * c + 1), d)
    params["patch_embed"]["proj"]["bias"] = base_params["patch_embed"]["proj"]["bias"]
    return params

"""In-training pipeline validation (reference log_validation,
train_...video.py:1026-1110): every `validating_steps`, run the full
single-clip inpainting pipeline with the current trainable weights on a fixed
validation sample and log the side-by-side video.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


def make_validation_fn(transformer, branch, vae, scheduler,
                       frozen_params: Dict, val_batch: Dict, *,
                       num_inference_steps: int = 20,
                       guidance_scale: float = 6.0,
                       mode: str = "branch",
                       lora_alpha: float = 128.0, lora_rank: int = 256,
                       replace_gt_alternate: bool = True,
                       use_flash=False, sequential_cfg: bool = False,
                       id_pool_resample: Optional[bool] = None,
                       dtype=None) -> Callable:
    """Returns validation_fn(trainable, step) -> side-by-side video01.

    val_batch: {pixel_values [1,T,H,W,3] in [-1,1], conditioning_pixel_values,
    masks [1,T,H,W], prompt_embeds}. `replace_gt_alternate` alternates the
    replace_gt flag between validations (reference :1958-1964).
    """
    import jax
    import jax.numpy as jnp

    from ..models.lora import attach_lora
    from ..pipelines import CogVideoXI2VDualInpaintPipeline

    pipe = CogVideoXI2VDualInpaintPipeline(transformer, branch, vae, scheduler)
    video = val_batch["pixel_values"]
    masks = val_batch["masks"]
    embeds = val_batch["prompt_embeds"]
    image = video[:, 0] * (1 - masks[:, 0][..., None])

    def validation_fn(trainable, step: int) -> np.ndarray:
        if mode == "branch":
            params = {**frozen_params, "branch": trainable}
        else:  # lora
            params = dict(frozen_params)
            # additive attach (same math as merging): no merged-kernel copy,
            # and the frozen backbone may be int8-quantized (QLoRA)
            params["transformer"] = attach_lora(
                frozen_params["transformer"], trainable,
                alpha=lora_alpha, rank=lora_rank)
        replace_gt = (step % 2 == 0) if replace_gt_alternate else True
        kw = {}
        if dtype is not None:
            kw["dtype"] = dtype
        out = pipe(params, image=image, video=video, masks=masks,
                   prompt_embeds=embeds,
                   negative_prompt_embeds=jnp.zeros_like(embeds),
                   num_inference_steps=num_inference_steps,
                   guidance_scale=guidance_scale, use_dynamic_cfg=True,
                   replace_gt=replace_gt, mask_add=True,
                   use_flash=use_flash, sequential_cfg=sequential_cfg,
                   id_pool_resample=(mode == "lora" if id_pool_resample is None
                                     else id_pool_resample),
                   rng=jax.random.PRNGKey(step), **kw)
        out01 = (np.asarray(out)[0] / 2 + 0.5).clip(0, 1)
        gt01 = (np.asarray(video)[0] / 2 + 0.5).clip(0, 1)
        masked01 = gt01 * (1 - np.asarray(masks)[0][..., None])
        return np.concatenate([gt01, masked01, out01], axis=2)

    return validation_fn

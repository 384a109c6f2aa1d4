"""Self-served first-frame pre-inpainting (FluxFill analog).

The reference pre-inpaints frame 0 with FluxFill + GPT-4o before propagating
the edit through the video (reference infer/inpaint.py:119-194,
app/utils.py:86-160). Those are external models with no offline analog — but
the framework already contains an image inpainter: the flagship dual-stream
pipeline run at T=1 collapses to image-mode inpainting (the same collapse the
training collator uses for mix_train_ratio image batches).

`make_self_first_frame_inpaint` packages that into the
`first_frame_inpaint_fn(frame01, mask, prompt) -> frame01` hook shared by
infer/inpaint.py, infer/edit.py and app.AppSession — so a hook-less
deployment gets a real pre-inpainted frame 0 instead of the masked frame.
Enable with `--first_frame_inpaint self` on the CLIs.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _single_clip_pipeline(pipe):
    """A single-clip pipeline sharing `pipe`'s models (AnyL pipelines ARE
    single-clip subclasses, but their __call__ takes windowing args)."""
    from ..pipelines import CogVideoXI2VDualInpaintPipeline
    from ..pipelines.variants import CogVideoXSFTInpaintPipeline

    if pipe.branch is not None:
        return CogVideoXI2VDualInpaintPipeline(
            pipe.transformer, pipe.branch, pipe.vae, pipe.scheduler,
            pipe.text_encoder)
    # branchless deployment: the SFT widened-patch-embed backbone is itself
    # an inpainter (reference pipeline_cogvideox_inpainting_sft.py)
    return CogVideoXSFTInpaintPipeline(
        pipe.transformer, pipe.vae, pipe.scheduler, pipe.text_encoder)


def make_self_first_frame_inpaint(
    pipe, params, *,
    num_inference_steps: int = 30,
    guidance_scale: float = 6.0,
    seed: int = 0,
    use_flash=False,
    sequential_cfg: bool = False,
    dtype=None,
    encode_prompt_fn: Optional[Callable] = None,
    prompt_embeds=None,
    negative_prompt_embeds=None,
    composite: bool = True,
) -> Callable:
    """Build a `first_frame_inpaint_fn(frame01, mask, prompt) -> frame01`
    backed by the framework's own models at T=1.

    frame01: [H, W, 3] float in [0, 1] (masked or unmasked — the hole is
    re-zeroed from `mask` either way). mask: [H, W], nonzero = hole.
    With composite=True (default) only the hole is replaced, matching the
    reference's paste-back (app/utils.py:150-158).

    Text conditioning resolution order: explicit `prompt_embeds`, then
    `encode_prompt_fn(prompt)`, then the pipeline's text encoder.
    """
    import jax
    import jax.numpy as jnp

    single = _single_clip_pipeline(pipe)
    if dtype is None:
        dtype = jnp.float32

    def fn(frame01: np.ndarray, mask: np.ndarray, prompt: str) -> np.ndarray:
        frame01 = np.asarray(frame01, np.float32)
        hole = (np.asarray(mask, np.float32) > 0.5).astype(np.float32)
        masked01 = frame01 * (1.0 - hole[..., None])

        video = jnp.asarray(masked01, jnp.float32)[None, None] * 2 - 1
        masks = jnp.asarray(hole, jnp.float32)[None, None]

        if prompt_embeds is not None:
            emb_kw = dict(
                prompt_embeds=jnp.asarray(prompt_embeds),
                negative_prompt_embeds=(
                    jnp.asarray(negative_prompt_embeds)
                    if negative_prompt_embeds is not None
                    else jnp.zeros_like(jnp.asarray(prompt_embeds))))
        elif encode_prompt_fn is not None:
            pos, neg = encode_prompt_fn(prompt)
            emb_kw = dict(prompt_embeds=jnp.asarray(pos),
                          negative_prompt_embeds=jnp.asarray(neg))
        else:
            emb_kw = dict(prompt=prompt)  # raises helpfully w/o text encoder

        out = single(params, image=video[:, 0], video=video, masks=masks,
                     num_inference_steps=num_inference_steps,
                     guidance_scale=guidance_scale, use_dynamic_cfg=True,
                     replace_gt=(single._mode != "sft"), mask_add=True,
                     use_flash=use_flash, sequential_cfg=sequential_cfg,
                     rng=jax.random.PRNGKey(seed), dtype=dtype, **emb_kw)
        frame = (np.asarray(out)[0, 0].astype(np.float32) / 2 + 0.5).clip(0, 1)
        if composite:
            frame = frame * hole[..., None] + frame01 * (1 - hole[..., None])
        return frame

    return fn

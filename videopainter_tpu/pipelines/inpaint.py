"""Flagship single-clip dual-stream I2V inpainting pipeline.

Behavioral parity with CogVideoXI2VDualInpaintPipeline
(pipeline_cogvideox_inpainting_i2v_branch.py:161-1020):

 - first-frame image VAE-encoded, zero-padded over latent time (:375-383)
 - masked-video = video * (mask < 0.5) (or >= 0.5 with mask_background), both
   VAE-encoded and scaled (:869-878 + prepare_mask_latents :432-475)
 - latent-grid mask via nearest resize (:438-440)
 - strength-sliced timesteps, pure-noise or noised-video init (:485-493, :399-404)
 - denoise loop: CFG batch, branch(16ch noisy ‖ 17ch cond) → backbone(32ch),
   dynamic CFG, DDIM/DPM step, optional replace_gt GT re-noising (:898-1006)
 - single VAE decode (:477-482)

TPU-native: all of step 5 runs as ONE jitted lax.scan (pipelines/common.py);
host code only does VAE prep and result decode. Text embeds may be supplied
directly (`prompt_embeds`) or computed by the optional T5 encoder wrapper.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from ..models.branch import CogVideoXBranch
from ..models.dit import CogVideoXTransformer3D
from ..models.vae import AutoencoderKLCogVideoX
from ..schedulers import CogVideoXDPMScheduler
from .common import (DenoiseConfig, DenoiseInputs, get_strength_timesteps,
                     supports_host_callbacks,
                     make_denoise_fn, prepare_rope, resize_mask_to_latent)


class CogVideoXI2VDualInpaintPipeline:
    """Functional pipeline. Call with a params dict:
    {"transformer": ..., "branch": ..., "vae": ..., ["text_encoder": ...]}.

    Subclasses select the denoise mode (pipelines/variants.py): "dual" is the
    flagship branch-injection path; "sft"/"plain"/"selfguidance" are the
    reference's baseline pipelines.
    """

    _mode = "dual"

    def __init__(self, transformer: CogVideoXTransformer3D,
                 branch: Optional[CogVideoXBranch],
                 vae: AutoencoderKLCogVideoX, scheduler, text_encoder=None):
        self.transformer = transformer
        self.branch = branch
        self.vae = vae
        self.scheduler = scheduler
        self.text_encoder = text_encoder
        self.vae_scale_factor_spatial = vae.cfg.spatial_compression_ratio
        self.vae_scale_factor_temporal = vae.cfg.temporal_compression_ratio
        self._denoise_cache: Dict[Any, Any] = {}
        self._progress_cell: list = [None]  # per-step listener (see common.py)

    # ------------------------------------------------------------------
    def encode_prompt(self, params, prompt, negative_prompt="",
                      max_sequence_length: int = 226):
        """T5 embeds, 226-token pad (reference :217-338). Requires text_encoder."""
        if self.text_encoder is None:
            raise ValueError("no text encoder configured; pass prompt_embeds instead")
        pos = self.text_encoder.encode(params.get("text_encoder"), prompt,
                                       max_length=max_sequence_length)
        neg = self.text_encoder.encode(params.get("text_encoder"), negative_prompt,
                                       max_length=max_sequence_length)
        return pos, neg

    # ------------------------------------------------------------------
    def _vae_encode(self, params, x, key, sample_mode="sample"):
        dist = self.vae.encode(params["vae"], x)
        lat = dist.sample(key) if sample_mode == "sample" else dist.mode()
        return lat * self.vae.cfg.scaling_factor

    def prepare_inputs(
        self, params, *,
        video: jnp.ndarray,            # [B, T, H, W, 3] in [-1, 1]
        image: Optional[jnp.ndarray] = None,  # [B, H, W, 3] in [-1, 1] (pixel) or
                                       # [B, 1, h, w, C] (latent, any-length path)
        masks: jnp.ndarray,            # [B, T, H, W] float 0/1 (1 = hole)
        rng: jax.Array,
        strength: float = 1.0,
        timesteps: Optional[np.ndarray] = None,
        mask_background: bool = False,
        need_video_latents: bool = True,
        vae_sample_mode: str = "sample",
        init_noise: Optional[jnp.ndarray] = None,
        dtype=jnp.float32,
    ) -> Tuple[DenoiseInputs, jax.Array]:
        """Host-side VAE prep. Returns (DenoiseInputs sans prompt, next rng)."""
        b, t, height, width, _ = video.shape
        t_lat = (t - 1) // self.vae_scale_factor_temporal + 1
        h_lat = height // self.vae_scale_factor_spatial
        w_lat = width // self.vae_scale_factor_spatial
        c_lat = self.vae.cfg.latent_channels

        rng, k_img, k_mv, k_vid, k_noise = jax.random.split(rng, 5)

        # image latents, zero-padded over time (:375-383)
        if image is None:
            image_latents = jnp.zeros((b, 1, h_lat, w_lat, c_lat), dtype=dtype)
        elif image.ndim == 5:
            image_latents = image.astype(dtype)  # already latent [B,1,h,w,C]
        else:
            image_latents = self._vae_encode(params, image[:, None], k_img,
                                             vae_sample_mode).astype(dtype)
        pad = jnp.zeros((b, t_lat - 1, h_lat, w_lat, c_lat), dtype=dtype)
        image_latents = jnp.concatenate([image_latents, pad], axis=1)

        # masked video (:869-878): zero the hole (or the background)
        keep = (masks < 0.5) if not mask_background else (masks >= 0.5)
        masked_video = video * keep[..., None].astype(video.dtype)
        masked_video_latents = self._vae_encode(params, masked_video, k_mv,
                                                vae_sample_mode).astype(dtype)

        mask_lat = resize_mask_to_latent(masks.astype(jnp.float32), t_lat, h_lat, w_lat)

        video_latents = None
        if need_video_latents:
            video_latents = self._vae_encode(params, video, k_vid,
                                             vae_sample_mode).astype(dtype)

        noise = (init_noise if init_noise is not None
                 else jax.random.normal(k_noise, (b, t_lat, h_lat, w_lat, c_lat),
                                        dtype=jnp.float32)).astype(dtype)
        if strength >= 1.0:
            latents = noise * self.scheduler.init_noise_sigma
        else:
            if timesteps is None or video_latents is None:
                raise ValueError("strength < 1 requires timesteps and video latents")
            latent_timestep = jnp.full((b,), int(timesteps[0]), dtype=jnp.int32)
            latents = self.scheduler.add_noise(video_latents, noise, latent_timestep)

        inputs = DenoiseInputs(
            latents=latents, image_latents=image_latents,
            masked_video_latents=masked_video_latents, mask=mask_lat.astype(dtype),
            prompt_embeds=None, noise=noise, video_latents=video_latents)
        return inputs, rng

    # ------------------------------------------------------------------
    def _get_denoise(self, dcfg: DenoiseConfig, timesteps: np.ndarray):
        key = (dcfg, tuple(int(t) for t in timesteps))
        if key not in self._denoise_cache:
            fn = make_denoise_fn(self.transformer, self.branch, self.scheduler,
                                 dcfg, timesteps,
                                 progress_cell=self._progress_cell)
            # chunked mode is a host loop over an inner-jitted segment —
            # wrapping it in an outer jit would inline everything back into
            # one long device program (the thing scan_chunk exists to avoid)
            self._denoise_cache[key] = fn if dcfg.scan_chunk else jax.jit(fn)
        return self._denoise_cache[key]

    # ------------------------------------------------------------------
    def __call__(
        self, params: dict, *,
        video: jnp.ndarray,
        masks: jnp.ndarray,
        image: Optional[jnp.ndarray] = None,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        strength: float = 1.0,
        conditioning_scale: float = 1.0,
        replace_gt: bool = False,
        mask_add: bool = False,
        mask_background: bool = False,
        add_first: bool = False,
        wo_text: bool = False,
        id_pool_resample: bool = False,
        rng: Optional[jax.Array] = None,
        vae_sample_mode: str = "sample",
        init_noise: Optional[jnp.ndarray] = None,
        dpm_noises: Optional[jnp.ndarray] = None,
        output_type: str = "np",
        use_flash: bool = False,
        sequential_cfg: bool = False,
        scan_chunk: int = None,   # None -> auto (4 on axon, 0 = one program)
        skip_steps: Optional[Tuple[int, ...]] = None,  # step-skip cache
                                  # schedule (common.uniform_skip_steps /
                                  # parse_skip_steps); quality-gated serving
                                  # accelerator — see GATE_skip.json
        seq_axis: Optional[str] = None,
        ring_mesh=None,
        progress_fn: Optional[Any] = None,   # called with (step, total_steps)
        dtype=jnp.float32,
    ):
        """Returns decoded video [B, T, H, W, 3] in [-1, 1] (or latents).

        use_flash: Pallas flash attention for the 17,776-token joint sequence.
        seq_axis: GSPMD sequence-parallel mesh axis name (call under an active
        `with mesh:`); video tokens shard over it, XLA inserts KV all-gathers.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if video.shape[1] > 49:
            # reference guard (pipeline_..._branch.py:751-754): static
            # positional embeddings cap single-clip length at 49 frames -
            # use the AnyL pipeline for longer videos
            raise ValueError(
                f"num_frames {video.shape[1]} > 49; use the any-length "
                "pipeline (CogVideoX...AnyLPipeline) for longer videos")
        do_cfg = guidance_scale > 1.0

        if prompt_embeds is None:
            prompt_embeds, negative_prompt_embeds = self.encode_prompt(
                params, prompt, negative_prompt,
                self.transformer.cfg.max_text_seq_length)
        if do_cfg:
            if negative_prompt_embeds is None:
                raise ValueError("CFG requires negative_prompt_embeds")
            embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
        else:
            embeds = prompt_embeds

        ts_full = self.scheduler.timesteps(num_inference_steps)
        timesteps, _ = get_strength_timesteps(ts_full, num_inference_steps, strength)

        inputs, rng = self.prepare_inputs(
            params, image=image, video=video, masks=masks, rng=rng,
            strength=strength, timesteps=timesteps, mask_background=mask_background,
            need_video_latents=True, vae_sample_mode=vae_sample_mode,
            init_noise=init_noise, dtype=dtype)
        if self._mode == "selfguidance":
            # reference ..._selfguidance.py:838-840: the denoise loop STARTS
            # from the noised masked-video latents, not pure noise
            t0 = jnp.full((video.shape[0],), int(timesteps[0]), dtype=jnp.int32)
            inputs = inputs._replace(latents=self.scheduler.add_noise(
                inputs.masked_video_latents, inputs.noise, t0))
        inputs = inputs._replace(prompt_embeds=embeds.astype(dtype))
        if dpm_noises is not None:
            inputs = inputs._replace(dpm_noises=jnp.asarray(dpm_noises, dtype=dtype))

        t_lat = inputs.latents.shape[1]
        rope = prepare_rope(self.transformer.cfg, video.shape[2], video.shape[3],
                            t_lat, self.vae_scale_factor_spatial)

        dcfg = DenoiseConfig(
            num_inference_steps=num_inference_steps, do_cfg=do_cfg,
            use_dynamic_cfg=use_dynamic_cfg, guidance_scale=guidance_scale,
            conditioning_scale=conditioning_scale, replace_gt=replace_gt,
            mask_add=mask_add, mask_background=mask_background, add_first=add_first,
            wo_text=wo_text, id_pool_resample=id_pool_resample,
            is_dpm=isinstance(self.scheduler, CogVideoXDPMScheduler),
            use_flash=use_flash, seq_axis=seq_axis, ring_mesh=ring_mesh,
            sequential_cfg=sequential_cfg,
            scan_chunk=(scan_chunk if scan_chunk is not None else
                        (4 if not supports_host_callbacks() else 0)),
            skip_steps=tuple(skip_steps) if skip_steps else None,
            with_progress=progress_fn is not None and supports_host_callbacks(),
            mode=self._mode)
        denoise = self._get_denoise(dcfg, timesteps)

        n_steps = len(timesteps)
        if progress_fn is not None:
            self._progress_cell[0] = lambda i: progress_fn(i + 1, n_steps)
        rng, k = jax.random.split(rng)
        try:
            latents, _, _ = denoise(params, inputs, rope, k)
            if progress_fn is not None:
                latents = jax.block_until_ready(latents)
        finally:
            self._progress_cell[0] = None

        if output_type == "latent":
            return latents
        video_out = self.vae.decode(params["vae"],
                                    latents / self.vae.cfg.scaling_factor)
        if output_type == "np":
            return np.asarray(jnp.clip(video_out, -1, 1))
        return video_out

"""Any-length dual-stream I2V inpainting — sliding windows with cross-clip ID
resampling.

Behavioral parity with CogVideoXI2VDualInpaintAnyLPipeline
(pipeline_cogvideox_inpainting_i2v_branch_anyl.py:158-1082):

 - window count n_windows = (total - num_frames) // stride + 1 (:759)
 - per-window first-frame conditioning: window 0 uses the provided image; later
   windows reuse the previous window's latent at the overlap position (:866-872)
 - per-layer hidden states + resample mask captured at the final timestep of
   each window and fed to the next window's attention as
   prev_hidden_states/prev_resample_mask/prev_clip_weight (:962-988)
 - latent frame accumulator averaged across overlapping windows (:833-841,
   :1052-1069), then ONE VAE decode (:1071-1072) — or, with
   stream_decode=True, a bit-identical per-window streaming decode that
   overlaps window-i decode with window-i+1 denoise (optionally on a second
   chip via vae_device; beyond the reference, which decodes serially)

TPU-native: the window loop is host-level Python (window count is data
dependent); every window reuses the same jitted denoise scan, so there is one
compile for windows 1..N-1 (identical shapes + prev-state structure) plus one
for window 0.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers import CogVideoXDPMScheduler
from .common import (DenoiseConfig, capture_token_indices,
                     get_strength_timesteps, prepare_rope,
                     supports_host_callbacks)
from .inpaint import CogVideoXI2VDualInpaintPipeline


class CogVideoXI2VDualInpaintAnyLPipeline(CogVideoXI2VDualInpaintPipeline):

    def __call__(  # noqa: C901
        self, params: dict, *,
        video: jnp.ndarray,                 # [B, T_total, H, W, 3]
        masks: jnp.ndarray,                 # [B, T_total, H, W]
        image: Optional[jnp.ndarray] = None,  # [B, H, W, 3] first frame (pixels)
        num_frames: int = 49,
        stride: Optional[int] = None,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        strength: float = 1.0,
        conditioning_scale: float = 1.0,
        prev_clip_weight: float = 0.0,
        replace_gt: bool = False,
        mask_add: bool = False,
        mask_background: bool = False,
        add_first: bool = False,
        wo_text: bool = False,
        id_pool_resample: bool = False,
        rng: Optional[jax.Array] = None,
        vae_sample_mode: str = "sample",
        init_noises: Optional[list] = None,       # per-window init noise (parity testing)
        dpm_noises_list: Optional[list] = None,   # per-window [S,...] SDE noise
        output_type: str = "np",
        use_flash: bool = False,
        sequential_cfg: bool = False,
        scan_chunk: int = None,   # None -> auto (4 on axon, 0 = one program)
        skip_steps=None,          # step-skip cache schedule (gated; the
                                  # capture step always evaluates fully)
        seq_axis: Optional[str] = None,
        ring_mesh=None,
        stream_decode: bool = False,
        vae_device=None,
        stream_cache_spill: Optional[bool] = None,  # None = auto: spill tile
        # conv caches to host when streaming WITHOUT a dedicated vae_device
        # (single-chip mode); bit-identical either way
        compress_capture: Optional[int] = 2048,  # bucket for compressed
        # cross-window state capture (ID-resample path only; bit-exact —
        # see common.capture_token_indices). None/0 keeps full [L,2B,S,D].
        capture_int8: bool = False,  # additionally store the compressed
        # capture as per-token int8 (+scales) — ~0.4% state error, halves
        # it again; pairs with the int8 W8A8 serving mode which quantizes
        # these states at the projections anyway.
        progress_fn=None,   # called with (done_steps, total_steps) across windows
        dtype=jnp.float32,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        b, total_frames = video.shape[0], video.shape[1]
        stride = stride if stride is not None else num_frames
        if stride > num_frames:
            raise ValueError(f"stride {stride} > num_frames {num_frames}")
        if (total_frames - num_frames) % stride != 0:
            raise ValueError(
                f"total_frames {total_frames} must satisfy (total - num_frames) % stride == 0")
        n_windows = (total_frames - num_frames) // stride + 1
        tc = self.vae_scale_factor_temporal
        t_lat = (num_frames - 1) // tc + 1
        overlap_lat = (num_frames - stride) // tc

        if stride < num_frames:
            num_frame_latents = t_lat * n_windows - (n_windows - 1) * (overlap_lat + 1)
        else:
            num_frame_latents = (t_lat - 1) * n_windows + 1

        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds, negative_prompt_embeds = self.encode_prompt(
                params, prompt, negative_prompt,
                self.transformer.cfg.max_text_seq_length)
        embeds = (jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
                  if do_cfg else prompt_embeds).astype(dtype)

        ts_full = self.scheduler.timesteps(num_inference_steps)
        timesteps, _ = get_strength_timesteps(ts_full, num_inference_steps, strength)

        h_lat = video.shape[2] // self.vae_scale_factor_spatial
        w_lat = video.shape[3] // self.vae_scale_factor_spatial
        c_lat = self.vae.cfg.latent_channels
        rope = prepare_rope(self.transformer.cfg, video.shape[2], video.shape[3],
                            t_lat, self.vae_scale_factor_spatial)

        accumulator = jnp.zeros((b, num_frame_latents, h_lat, w_lat, c_lat), dtype=dtype)
        counts = np.zeros(num_frame_latents, dtype=np.float32)

        base_dcfg = DenoiseConfig(
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

        def window_start(w: int) -> int:
            if w == 0:
                return 0
            if stride < num_frames:
                return w * t_lat - (overlap_lat + 1) * w
            return w * t_lat - w

        # streaming decode: frames before the next window's start are final
        # after this window, so decode them NOW — the decode dispatches overlap
        # the next window's denoise (run the VAE on `vae_device` to overlap on
        # real hardware; emitted frames are bit-identical to the one-shot path,
        # see AutoencoderKLCogVideoX.stream_decoder).
        streamer = None
        decoded_chunks = []
        emitted = 0
        if stream_decode and output_type != "latent":
            vae_params = params["vae"]
            if vae_device is not None:
                vae_params = jax.device_put(vae_params, vae_device)
            # single-chip streaming (no vae_device): spill tile conv caches
            # to host between chunks — only ~0.65 GiB of cache resident next
            # to the DiT instead of 5.9 GiB (which OOMs a 16 GiB v5e)
            spill = (stream_cache_spill if stream_cache_spill is not None
                     else vae_device is None)
            streamer = self.vae.stream_decoder({"decoder": vae_params["decoder"]},
                                               num_frame_latents,
                                               cache_spill=spill)

        prev_state: Optional[Dict[str, Any]] = None
        latents = None
        for window_idx in range(n_windows):
            s = window_idx * stride
            window_video = video[:, s:s + num_frames]
            window_masks = masks[:, s:s + num_frames]

            if window_idx == 0:
                image_ = image
            elif overlap_lat > 0:
                # previous window's latent at the overlap position (:866-872)
                image_ = latents[:, -overlap_lat - 1:-overlap_lat]
            else:
                image_ = latents[:, -1:]

            inputs, rng = self.prepare_inputs(
                params, image=image_, video=window_video, masks=window_masks,
                rng=rng, strength=strength, timesteps=timesteps,
                mask_background=mask_background, need_video_latents=True,
                vae_sample_mode=vae_sample_mode,
                init_noise=(init_noises[window_idx] if init_noises else None),
                dtype=dtype)
            inputs = inputs._replace(prompt_embeds=embeds)
            if dpm_noises_list is not None:
                inputs = inputs._replace(
                    dpm_noises=jnp.asarray(dpm_noises_list[window_idx], dtype=dtype))

            # Capture per-layer states only when the next window will USE
            # them: the w=0 blend is the exact identity (a + 0*b), and the
            # captured stack is [L, 2B, S, D] — 8.5 GiB at flagship dims,
            # which single-handedly OOMs a 16 GB chip.
            wants_prev = id_pool_resample or (prev_clip_weight or 0.0) > 0.0
            capture = wants_prev and window_idx < n_windows - 1
            # Compressed capture (ID-resample path only — the prev-clip blend
            # reads FULL prev KV): keep just the masked-region tokens, the
            # only positions prev_resample_mask lets through. Bit-exact and
            # shrinks the 8.5 GiB flagship capture by the mask fraction —
            # this is what makes flagship ID anyl fit ONE chip.
            can_compress = (
                bool(compress_capture) and id_pool_resample
                and self.transformer.cfg.id_pool_resample_learnable
                and (mask_add if self._mode == "dual"
                     else self._mode == "selfguidance"))
            if capture and can_compress:
                inputs = inputs._replace(capture_indices=capture_token_indices(
                    inputs.mask, self.transformer.cfg.patch_size,
                    text_len=embeds.shape[1], bucket=int(compress_capture)))
            dcfg = dc_replace(base_dcfg, capture_hidden_states=capture,
                              capture_quant=bool(capture_int8 and capture
                                                 and can_compress))
            denoise = self._get_denoise(dcfg, timesteps)

            if progress_fn is not None:
                base_done = window_idx * len(timesteps)
                total = n_windows * len(timesteps)
                self._progress_cell[0] = \
                    lambda i, b=base_done, t=total: progress_fn(b + i + 1, t)
            rng, k = jax.random.split(rng)
            try:
                latents, hs_list, resample_mask = denoise(params, inputs, rope,
                                                          k, prev_state)
                if progress_fn is not None or vae_device is None:
                    # single-device: serialize at the window boundary. The
                    # denoise scan's temp arena is multiple GiB and the axon
                    # allocator does not backpressure host-side eager allocs
                    # against in-flight programs — the accumulator update
                    # would OOM while the scan still holds its arena. With a
                    # second device (vae_device) async dispatch is the point,
                    # so no sync there.
                    latents = jax.block_until_ready(latents)
            finally:
                self._progress_cell[0] = None
            if capture:
                prev_state = {
                    "prev_hidden_states": hs_list,
                    "prev_resample_mask": resample_mask,
                    "prev_clip_weight": prev_clip_weight,
                }
                if inputs.capture_indices is not None:
                    ci = inputs.capture_indices
                    prev_state["prev_hidden_indices"] = (
                        jnp.concatenate([ci, ci], axis=0) if do_cfg else ci)
            else:
                # release the cross-window state (GiBs at flagship dims) the
                # moment no later window will read it — on a single chip it
                # must not stay resident through the final VAE decode
                prev_state = None
                hs_list = resample_mask = None

            # accumulate into the global latent timeline (:1052-1064)
            start = window_start(window_idx)
            accumulator = accumulator.at[:, start:start + t_lat].add(latents.astype(dtype))
            counts[start:start + t_lat] += 1

            if streamer is not None:
                final_upto = (num_frame_latents if window_idx == n_windows - 1
                              else window_start(window_idx + 1))
                if final_upto > emitted:
                    chunk = accumulator[:, emitted:final_upto] / jnp.asarray(
                        np.maximum(counts[emitted:final_upto], 1.0)
                    )[None, :, None, None, None]
                    chunk = chunk / self.vae.cfg.scaling_factor
                    if vae_device is not None:
                        chunk = jax.device_put(chunk, vae_device)
                    frames = streamer.feed(chunk)
                    if frames is not None:
                        decoded_chunks.append(frames)
                    emitted = final_upto

        accumulator = accumulator / jnp.asarray(np.maximum(counts, 1.0))[None, :, None, None, None]

        if output_type == "latent":
            return accumulator
        if streamer is not None:
            # chunks may live on vae_device — gather host-side
            video_out = jnp.asarray(np.concatenate(
                [np.asarray(c) for c in decoded_chunks], axis=1))
        else:
            video_out = self.vae.decode(params["vae"],
                                        accumulator / self.vae.cfg.scaling_factor)
        if output_type == "np":
            return np.asarray(jnp.clip(video_out, -1, 1))
        return video_out

"""Shared pipeline machinery (latent/mask prep, RoPE, CFG, denoise scan).

Reference anatomy: pipeline_cogvideox_inpainting_i2v_branch.py —
prepare_latents (:340-416), prepare_mask_latents (:432-475), get_timesteps
strength slicing (:485-493), _prepare_rotary_positional_embeddings (:587-611),
denoise loop (:898-1006).

TPU-first: host code does VAE prep + coefficient precompute; the 50-step
denoise (CFG-batched branch + backbone + guidance + scheduler + replace_gt
re-noising/blending) compiles into ONE `lax.scan` jitted per shape. All
data-dependent quantities (dynamic CFG from the train timestep, per-step
add-noise coefficients) are precomputed [S]-arrays gathered inside the scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TransformerConfig
from ..models.vae import nearest_resize3d
from ..ops.rope import get_3d_rotary_pos_embed, get_resize_crop_region_for_grid
from ..schedulers import CogVideoXDPMScheduler


def supports_host_callbacks() -> bool:
    """Whether the backend can run jax.debug.callback from inside jit.

    The axon PJRT tunnel raises UNIMPLEMENTED for host send/recv callbacks;
    pipelines silently downgrade per-step progress to per-call progress there
    instead of crashing the denoise scan. NOTE: `jax.default_backend()`
    reports plain "tpu" under axon — the tunnel is only visible in the env
    (its sitecustomize exports JAX_PLATFORMS=axon / PALLAS_AXON_* vars).
    """
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "axon" or \
            os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        try:
            # env says axon, but the process may have forced another backend
            # (tests set jax_platforms="cpu" before init)
            return jax.default_backend() != "tpu"
        except Exception:
            return False
    return True


def get_strength_timesteps(timesteps: np.ndarray, num_inference_steps: int,
                           strength: float) -> Tuple[np.ndarray, int]:
    """Strength-based timestep slicing (reference :485-493)."""
    init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
    t_start = max(num_inference_steps - init_timestep, 0)
    return timesteps[t_start:], num_inference_steps - t_start


def prepare_rope(cfg: TransformerConfig, height: int, width: int,
                 num_latent_frames: int, vae_spatial: int = 8,
                 base_height: int = 480, base_width: int = 720):
    """Rotary tables for the video grid (reference :587-611).

    NOTE: the reference hardcodes the aspect-ratio base grid to 720x480 pixels
    (`base_size_width = 720 // ...`, :596-597) independent of the model's
    sample dims — RoPE positions are rescaled onto that base grid.
    """
    if not cfg.use_rotary_positional_embeddings:
        return None
    p = cfg.patch_size
    grid_h = height // (vae_spatial * p)
    grid_w = width // (vae_spatial * p)
    base_w = base_width // (vae_spatial * p)
    base_h = base_height // (vae_spatial * p)
    crops = get_resize_crop_region_for_grid((grid_h, grid_w), base_w, base_h)
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, crops,
                                       (grid_h, grid_w), num_latent_frames)
    return jnp.asarray(cos), jnp.asarray(sin)


def resize_mask_to_latent(mask: jnp.ndarray, t_lat: int, h_lat: int, w_lat: int) -> jnp.ndarray:
    """[B, T, H, W] -> [B, t_lat, h_lat, w_lat] via nearest (reference :438-440
    uses F.interpolate default mode)."""
    m = mask[..., None]
    m = nearest_resize3d(m, (t_lat, h_lat, w_lat))
    return m[..., 0]


def dynamic_cfg_scales(timesteps: np.ndarray, num_inference_steps: int,
                       guidance_scale: float) -> np.ndarray:
    """Per-step dynamic CFG (reference :945-948):
    1 + g * (1 - cos(pi * ((S - t)/S)^5)) / 2, t = train timestep value."""
    out = []
    for t in timesteps:
        frac = (num_inference_steps - float(t)) / num_inference_steps
        out.append(1.0 + guidance_scale * (1 - math.cos(math.pi * frac**5.0)) / 2.0)
    return np.array(out, dtype=np.float32)


def uniform_skip_steps(num_steps: int, start: int, end: int,
                       stride: int = 2) -> Tuple[int, ...]:
    """Static step-skip schedule: inside [start, end) evaluate the model only
    every `stride`-th step and reuse the cached pre-CFG prediction for the
    rest. Early steps (< start) and late steps (>= end) always evaluate —
    the trajectory's endpoints are where reuse error hurts most (large CFG
    scale swings under dynamic CFG at late t, structure formation at early t).

    Accepts the "start:end:stride" CLI spelling via parse_skip_steps. Returns
    the tuple of SKIPPED indices for DenoiseConfig.skip_steps.
    """
    if not (0 < start <= end <= num_steps):
        raise ValueError(f"bad skip window [{start}, {end}) for {num_steps} steps")
    if stride < 2:
        raise ValueError("stride must be >= 2 (stride 1 would skip every step)")
    return tuple(i for i in range(start, end) if (i - start) % stride)


def parse_skip_steps(spec: str, num_steps: int) -> Tuple[int, ...]:
    """CLI spelling for skip schedules: "start:end:stride" (uniform window)
    or a comma list of explicit indices ("11,13,15").

    The comma list is deduped and range-checked HERE so every consumer
    (bench.py's n_skip arithmetic included) sees a validated schedule —
    a spec like "5,5,7" or "60" must not inflate the reported skip count.
    """
    if ":" in spec:
        parts = [int(x) for x in spec.split(":")]
        start, end = parts[0], parts[1]
        stride = parts[2] if len(parts) > 2 else 2
        return uniform_skip_steps(num_steps, start, end, stride)
    steps = tuple(sorted({int(x) for x in spec.split(",") if x.strip()}))
    for si in steps:
        if not (0 <= si < num_steps):
            raise ValueError(
                f"skip step {si} out of range [0, {num_steps})")
    return steps


def capture_token_indices(mask: jnp.ndarray, patch_size: int, text_len: int,
                          bucket: int = 2048) -> jnp.ndarray:
    """Joint-sequence gather indices for COMPRESSED cross-window state capture.

    The any-length ID-resample path (reference ..._anyl.py:982-988 +
    attention_processor.py:2247-2284) stores per-layer hidden states only to
    multiply them by `prev_resample_mask` in the next window — unmasked slots
    are zeroed before use. Capturing just the masked-region tokens is
    therefore bit-exact while shrinking the [L, 2B, S, D] state (8.5 GiB at
    flagship dims — the thing that made flagship ID anyl multi-chip-only) by
    the mask fraction.

    `mask` is the latent-grid mask [B, T_lat, h_lat, w_lat] — the SAME tensor
    the model pools in patch_embed, so the indices match the in-model
    resample mask exactly. Returns int32 [B, M] of joint-sequence positions
    (text offset applied), padded with S_joint (one past the end; the scatter
    in CogVideoXTransformer3D.apply drops pad slots). M is the max per-batch
    masked-token count rounded up to `bucket` (recompile granularity), capped
    at S_joint, so no truncation can occur.
    """
    from ..ops.patch_embed import pool_patch_mask

    pm = np.asarray(pool_patch_mask(jnp.asarray(mask), patch_size))
    b, s_vid = pm.shape
    s_joint = text_len + s_vid
    counts = pm.sum(axis=1).astype(int)
    m = int(np.ceil(max(int(counts.max()), 1) / bucket) * bucket)
    m = min(m, s_joint)
    idx = np.full((b, m), s_joint, dtype=np.int32)
    for i in range(b):
        nz = np.nonzero(pm[i])[0] + text_len
        idx[i, :len(nz)] = nz
    return jnp.asarray(idx)


class DenoiseInputs(NamedTuple):
    """Device inputs to the fused denoise scan. B = real batch (pre-CFG)."""

    latents: jnp.ndarray              # [B, T, h, w, C]
    image_latents: jnp.ndarray        # [B, T, h, w, C] (first-frame latent + zero pad)
    masked_video_latents: jnp.ndarray  # [B, T, h, w, C]
    mask: jnp.ndarray                 # [B, T, h, w] latent-grid mask (float)
    prompt_embeds: jnp.ndarray        # [2B, S_text, text_dim] (neg ‖ pos) or [B,...]
    noise: jnp.ndarray                # [B, T, h, w, C] initial noise (replace_gt re-noise)
    video_latents: Optional[jnp.ndarray]  # [B, T, h, w, C] clean GT latents (replace_gt)
    dpm_noises: Optional[jnp.ndarray] = None  # [S, B, T, h, w, C] injected SDE noise
                                              # (parity testing; None -> draw from rng)
    capture_indices: Optional[jnp.ndarray] = None  # int32 [B, M]: compressed
                                              # cross-window capture — only these
                                              # joint-sequence positions are kept
                                              # (see capture_token_indices)


@dataclass(frozen=True)
class DenoiseConfig:
    """Static (compile-time) options of the denoise loop."""

    num_inference_steps: int
    do_cfg: bool
    use_dynamic_cfg: bool
    guidance_scale: float
    conditioning_scale: float
    replace_gt: bool
    mask_add: bool
    mask_background: bool
    add_first: bool
    wo_text: bool
    id_pool_resample: bool
    is_dpm: bool
    capture_hidden_states: bool = False   # capture per-layer states at the final step
    capture_quant: bool = False           # int8 per-token capture (anyl ID path)
    with_progress: bool = False           # trace a per-step host callback in
    use_flash: bool = False
    seq_axis: Optional[str] = None        # GSPMD sequence-parallel mesh axis
    ring_mesh: Any = None                 # Mesh: ring attention over seq_axis
    dpm_sde: bool = True                  # draw SDE noise each DPM step
    sequential_cfg: bool = False          # uncond/cond as two B-sized passes
                                          # (halves activation peak; 1-chip)
    scan_chunk: int = 0                   # >0: dispatch the scan in chunks of
                                          # this many steps (axon: long single
                                          # dispatches are killed)
    # "dual": branch -> backbone injection (flagship);
    # "sft": cond channels concatenated straight into the widened backbone
    #        (pipeline_cogvideox_inpainting_sft.py:852, no branch);
    # "plain": no conditioning channels (latent-blend baseline,
    #        pipeline_cogvideox_inpainting.py);
    # "selfguidance": training-free per-step hidden-state swap
    #        (pipeline_cogvideox_inpainting_selfguidance.py:852-880).
    mode: str = "dual"
    # Step-skip caching (DeepCache/TeaCache-style serving accelerator, NOT in
    # the reference): at the listed step indices the transformer+branch
    # evaluation is SKIPPED and the previous step's pre-CFG model output is
    # reused; the scheduler update, dynamic CFG scale, and replace_gt blend
    # still run fresh every step. ~7.4 s/step of model compute becomes ~ms
    # for each skipped step at flagship dims. Quality-gated like int8:
    # tools/gate_skip_flagship.py writes GATE_skip.json and bench.py only
    # headlines a skip rung whose gate clears >=35 dB vs the bf16 full-step
    # trajectory. Step 0 must always evaluate.
    skip_steps: Optional[Tuple[int, ...]] = None


def make_denoise_fn(transformer, branch, scheduler, dcfg: DenoiseConfig,
                    timesteps: np.ndarray, progress_cell: Optional[list] = None):
    """Build the jittable denoise function.

    Returns fn(params, inputs, rope, rng, prev_state) ->
      (final_latents, hidden_states_list|None, resample_mask|None)

    prev_state: None or dict with stacked prev_hidden_states [L,B,S,D],
    prev_resample_mask [B,S], prev_clip_weight (float) — the any-length
    cross-clip conditioning (reference ..._anyl.py:962-966).

    progress_cell: 1-element mutable list; when dcfg.with_progress, a
    jax.debug.callback inside the scan calls progress_cell[0](step_index)
    after each denoise step (the reference's tqdm/progress-bar hook — the
    cell indirection keeps the jitted program cacheable while the UI swaps
    the listener per call).
    """
    S = len(timesteps)
    is_dpm = isinstance(scheduler, CogVideoXDPMScheduler)
    assert is_dpm == dcfg.is_dpm
    # Strength slicing passes a shortened timestep list, but the scheduler's
    # stride still derives from the un-sliced num_inference_steps (reference
    # keeps self.num_inference_steps from set_timesteps).
    coeffs = scheduler.precompute(dcfg.num_inference_steps,
                                  timesteps=np.asarray(timesteps))

    # Dynamic CFG uses the post-slice step count (reference reassigns
    # num_inference_steps from get_timesteps before the loop), while the
    # scheduler stride above uses the original count.
    cfg_scales = jnp.asarray(
        dynamic_cfg_scales(timesteps, S, dcfg.guidance_scale)
        if dcfg.use_dynamic_cfg else
        np.full(S, dcfg.guidance_scale, dtype=np.float32))

    # replace_gt re-noising: abar at timesteps[i+1] (last step un-noised).
    abar = scheduler.alphas_cumprod
    sqrt_ab = np.zeros(S, dtype=np.float32)
    sqrt_1mab = np.zeros(S, dtype=np.float32)
    renoise = np.zeros(S, dtype=np.float32)
    for i in range(S - 1):
        a = abar[int(timesteps[i + 1])]
        sqrt_ab[i] = a**0.5
        sqrt_1mab[i] = (1 - a)**0.5
        renoise[i] = 1.0
    sqrt_ab, sqrt_1mab, renoise = map(jnp.asarray, (sqrt_ab, sqrt_1mab, renoise))

    def model_step(params, inputs: DenoiseInputs, rope, latents, i, prev_state,
                   capture: bool):
        if dcfg.do_cfg and dcfg.sequential_cfg:
            # single-chip memory mode: uncond and cond as two B-sized passes
            # inside the same scan step — XLA reuses the first pass's temp
            # buffers for the second, halving the activation peak vs the
            # CFG-batched 2B pass (the knob that lets the 42L model denoise
            # next to the VAE on one 16 GB chip). Output re-concatenated so
            # scheduler_and_blend's uncond/cond split is unchanged; captured
            # hidden states / prev-state are handled per CFG half so the
            # any-length cross-window conditioning stays batched-equivalent.
            b = latents.shape[0]

            def half(ps, lo, hi):
                if ps is None:
                    return None
                # prev_hidden_states: [L, 2B, ...] array or the int8-capture
                # dict ({"values": [L,2B,M,D], "scales": [L,2B,M]}) — both
                # split on the batch axis (axis 1)
                out = {"prev_hidden_states": jax.tree.map(
                           lambda x: x[:, lo:hi], ps["prev_hidden_states"]),
                       "prev_resample_mask": ps["prev_resample_mask"][lo:hi],
                       "prev_clip_weight": ps["prev_clip_weight"]}
                if ps.get("prev_hidden_indices") is not None:
                    out["prev_hidden_indices"] = ps["prev_hidden_indices"][lo:hi]
                return out

            out_u = _model_pass(params, inputs, rope, latents, i,
                                half(prev_state, 0, b), capture=capture,
                                embeds=inputs.prompt_embeds[:b],
                                cfg_batch=False)
            out_c = _model_pass(params, inputs, rope, latents, i,
                                half(prev_state, b, 2 * b), capture=capture,
                                embeds=inputs.prompt_embeds[b:],
                                cfg_batch=False)
            out = out_c._replace(
                sample=jnp.concatenate([out_u.sample, out_c.sample], axis=0))
            if capture:
                out = out._replace(
                    hidden_states_list=jax.tree.map(
                        lambda *xs: jnp.concatenate(xs, axis=1),
                        out_u.hidden_states_list, out_c.hidden_states_list),
                    resample_mask=(None if out_c.resample_mask is None else
                                   jnp.concatenate([out_u.resample_mask,
                                                    out_c.resample_mask],
                                                   axis=0)))
            return out
        return _model_pass(params, inputs, rope, latents, i, prev_state,
                           capture=capture, embeds=inputs.prompt_embeds,
                           cfg_batch=dcfg.do_cfg)

    def _model_pass(params, inputs: DenoiseInputs, rope, latents, i, prev_state,
                    capture: bool, embeds, cfg_batch: bool):
        tcfg = transformer.cfg
        t = coeffs.timesteps[i]
        if cfg_batch:
            latent_video_input = jnp.concatenate([latents, latents], axis=0)
            image_latents = jnp.concatenate([inputs.image_latents] * 2, axis=0)
            masked_lat = jnp.concatenate([inputs.masked_video_latents] * 2, axis=0)
            mask = jnp.concatenate([inputs.mask] * 2, axis=0)
        else:
            latent_video_input = latents
            image_latents = inputs.image_latents
            masked_lat = inputs.masked_video_latents
            mask = inputs.mask

        # I2V: image latents concatenated into the backbone input. The SFT
        # baseline model is T2V (patch widened to in*2+1 = noisy+masked+mask,
        # cogvideox_transformer_3d_inpainting.py:255), so no image concat there.
        if dcfg.mode != "sft" and tcfg.in_channels == 2 * latents.shape[-1]:
            latent_model_input = jnp.concatenate([latent_video_input, image_latents], axis=-1)
        else:
            latent_model_input = latent_video_input

        timestep = jnp.broadcast_to(t, (latent_model_input.shape[0],))

        kw: Dict[str, Any] = {}
        if prev_state is not None:
            kw["prev_hidden_states"] = prev_state["prev_hidden_states"]
            kw["prev_clip_weight"] = prev_state["prev_clip_weight"]
            kw["prev_resample_mask"] = prev_state["prev_resample_mask"]
            if prev_state.get("prev_hidden_indices") is not None:
                kw["prev_hidden_indices"] = prev_state["prev_hidden_indices"]
        if capture and inputs.capture_indices is not None:
            ci = inputs.capture_indices
            kw["capture_indices"] = (jnp.concatenate([ci, ci], axis=0)
                                     if cfg_batch else ci)
            if dcfg.capture_quant:
                kw["capture_quant"] = True

        if dcfg.mode == "dual":
            branch_cond = jnp.concatenate([masked_lat, mask[..., None]], axis=-1)
            branch_samples = branch.apply(
                params["branch"], latent_video_input, embeds,
                branch_cond, timestep, rope=rope,
                conditioning_scale=dcfg.conditioning_scale,
                use_flash=dcfg.use_flash, seq_axis=dcfg.seq_axis,
                ring_mesh=dcfg.ring_mesh)
            return transformer.apply(
                params["transformer"], latent_model_input, embeds,
                timestep, rope=rope,
                branch_block_samples=branch_samples,
                branch_block_masks=mask if dcfg.mask_add else None,
                add_first=dcfg.add_first,
                id_pool_resample=dcfg.id_pool_resample,
                return_hidden_states=capture,
                use_flash=dcfg.use_flash, seq_axis=dcfg.seq_axis,
                ring_mesh=dcfg.ring_mesh, **kw)

        if dcfg.mode == "sft":
            # widened backbone eats [noisy (‖ image) ‖ masked-video ‖ mask]
            model_in = jnp.concatenate(
                [latent_model_input, masked_lat, mask[..., None]], axis=-1)
            return transformer.apply(
                params["transformer"], model_in, embeds, timestep,
                rope=rope, return_hidden_states=capture,
                use_flash=dcfg.use_flash, seq_axis=dcfg.seq_axis,
                ring_mesh=dcfg.ring_mesh, **kw)

        if dcfg.mode == "selfguidance":
            # guidance pass: noised masked-video latents -> per-layer states,
            # mask-swapped into the main pass (:852-880; swap at
            # cogvideox_transformer_3d.py:593-594). States are joint
            # [text‖video]; the swap applies to the video slice.
            abar_t = jnp.asarray(scheduler.alphas_cumprod,
                                 dtype=jnp.float32)[t]
            noise_cfg = (jnp.concatenate([inputs.noise] * 2, axis=0)
                         if cfg_batch else inputs.noise)
            noised_masked = (jnp.sqrt(abar_t) * masked_lat.astype(jnp.float32)
                             + jnp.sqrt(1 - abar_t) * noise_cfg.astype(jnp.float32)
                             ).astype(masked_lat.dtype)
            if tcfg.in_channels == 2 * latents.shape[-1]:
                noised_masked = jnp.concatenate([noised_masked, image_latents], axis=-1)
            g = transformer.apply(
                params["transformer"], noised_masked, embeds,
                timestep, rope=rope, return_hidden_states=True,
                use_flash=dcfg.use_flash, seq_axis=dcfg.seq_axis,
                ring_mesh=dcfg.ring_mesh)
            text_len = embeds.shape[1]
            sg = g.hidden_states_list[:, :, text_len:]
            return transformer.apply(
                params["transformer"], latent_model_input, embeds,
                timestep, rope=rope,
                self_guidance_hidden_states=sg,
                self_guidance_masks=mask,
                return_hidden_states=capture,
                use_flash=dcfg.use_flash, seq_axis=dcfg.seq_axis,
                ring_mesh=dcfg.ring_mesh, **kw)

        # "plain" latent-blend baseline: bare backbone
        return transformer.apply(
            params["transformer"], latent_model_input, embeds,
            timestep, rope=rope, return_hidden_states=capture,
            use_flash=dcfg.use_flash, seq_axis=dcfg.seq_axis,
                ring_mesh=dcfg.ring_mesh, **kw)

    def scheduler_and_blend(inputs: DenoiseInputs, latents, old_x0, noise_pred, i, step_key):
        noise_pred = noise_pred.astype(jnp.float32)
        if dcfg.do_cfg:
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + cfg_scales[i] * (text - uncond)
        if dcfg.is_dpm:
            if inputs.dpm_noises is not None:
                sde_noise = inputs.dpm_noises[i]
            elif dcfg.dpm_sde:
                sde_noise = jax.random.normal(step_key, latents.shape, dtype=jnp.float32)
            else:
                sde_noise = None
            latents, x0 = scheduler.step(coeffs, i, noise_pred, old_x0, latents,
                                         noise=sde_noise)
        else:
            latents, x0 = scheduler.step(coeffs, i, noise_pred, latents)
        if dcfg.replace_gt:
            dtype = latents.dtype
            # selfguidance blends against the MASKED-video latents, not the
            # clean GT (pipeline_..._selfguidance.py:910-925); every other
            # mode re-noises the clean video latents (:957-990).
            src = (inputs.masked_video_latents if dcfg.mode == "selfguidance"
                   else inputs.video_latents)
            init_latents = (src * sqrt_ab[i]
                            + inputs.noise * sqrt_1mab[i]) * renoise[i] \
                + src * (1.0 - renoise[i])
            m = inputs.mask[..., None]
            if dcfg.mask_background:
                latents = m * init_latents + (1 - m) * latents
            else:
                latents = (1 - m) * init_latents + m * latents
            latents = latents.astype(dtype)  # keep the scan carry dtype stable
        return latents, x0

    def _notify(i):
        fn = progress_cell[0] if progress_cell else None
        if fn is not None:
            fn(int(i))

    _chunk_cache: Dict[str, Any] = {}

    # Step-skip caching: precomputed boolean [S] — True = evaluate the model,
    # False = reuse the cached pre-CFG prediction from the carry. The no-skip
    # path keeps the ORIGINAL two-element carry so existing compiled programs
    # and golden tests are byte-identical.
    if dcfg.skip_steps:
        _rm = np.ones(S, dtype=bool)
        for si in dcfg.skip_steps:
            if not (0 <= si < S):
                raise ValueError(f"skip step {si} out of range [0, {S})")
            _rm[si] = False
        if not _rm[0]:
            raise ValueError("step 0 cannot be skipped (nothing cached yet)")
        if dcfg.capture_hidden_states and not _rm[S - 1]:
            # the capture step runs OUTSIDE the scan and always evaluates
            # fully (cross-window states must come from a real forward);
            # silently ignoring a listed skip here would misreport the
            # schedule — fail loudly like the step-0/out-of-range checks.
            raise ValueError(
                f"step {S - 1} cannot be skipped with capture_hidden_states: "
                "the final (capture) step always evaluates the model")
        run_mask = jnp.asarray(_rm)
    else:
        run_mask = None

    def _init_pred(inputs: DenoiseInputs):
        # cached pre-CFG model output: [2B (CFG) or B, T, h, w, C] fp32
        b = inputs.latents.shape[0] * (2 if dcfg.do_cfg else 1)
        return jnp.zeros((b,) + inputs.latents.shape[1:], jnp.float32)

    def _predict(params, inputs, rope, latents, i, prev_state, prev_pred):
        """Model output for step i: evaluated, or reused from the cache."""
        if run_mask is None:
            return model_step(params, inputs, rope, latents, i, prev_state,
                              capture=False).sample

        def full(lat):
            return model_step(params, inputs, rope, lat, i, prev_state,
                              capture=False).sample.astype(jnp.float32)

        return jax.lax.cond(run_mask[i], full, lambda lat: prev_pred, latents)

    def denoise(params, inputs: DenoiseInputs, rope, rng, prev_state=None):
        n_scan = S - 1 if dcfg.capture_hidden_states else S
        step_keys = jax.random.split(rng, S)

        def body(carry, i):
            if run_mask is None:
                latents, old_x0 = carry
                prev_pred = None
            else:
                latents, old_x0, prev_pred = carry
            pred = _predict(params, inputs, rope, latents, i, prev_state,
                            prev_pred)
            latents, x0 = scheduler_and_blend(inputs, latents, old_x0,
                                              pred, i, step_keys[i])
            if dcfg.with_progress:
                jax.debug.callback(_notify, i)
            out_carry = ((latents, x0) if run_mask is None
                         else (latents, x0, pred))
            return out_carry, ()

        init = (inputs.latents, jnp.zeros_like(inputs.latents))
        if run_mask is not None:
            init = init + (_init_pred(inputs),)
        if dcfg.scan_chunk and dcfg.scan_chunk < n_scan:
            # Chunked dispatch: the flagship 50-step scan is a single
            # ~7-minute device program, and the axon tunnel kills
            # long-running dispatches (UNAVAILABLE "kernel fault"); a host
            # loop over one jitted `chunk`-step segment (compiled once —
            # the segment start index is a traced scalar) keeps every
            # dispatch short. Also gives per-chunk host progress where
            # debug.callback is unsupported. Numerically identical: the
            # same step sequence with the same keys/coefficients.
            chunk = dcfg.scan_chunk
            while n_scan % chunk:   # largest divisor => one compiled segment
                chunk -= 1
            if "seg" not in _chunk_cache:
                def seg_fn(params, inputs, rope, prev_state, step_keys,
                           carry, start):
                    def seg_body(carry, i):
                        if run_mask is None:
                            latents, old_x0 = carry
                            prev_pred = None
                        else:
                            latents, old_x0, prev_pred = carry
                        pred = _predict(params, inputs, rope, latents, i,
                                        prev_state, prev_pred)
                        latents, x0 = scheduler_and_blend(
                            inputs, latents, old_x0, pred, i,
                            step_keys[i])
                        out_carry = ((latents, x0) if run_mask is None
                                     else (latents, x0, pred))
                        return out_carry, ()
                    return jax.lax.scan(seg_body, carry,
                                        jnp.arange(chunk) + start)[0]
                _chunk_cache["seg"] = jax.jit(seg_fn)
            seg = _chunk_cache["seg"]

            def _sync(x):
                # scalar FETCH, not block_until_ready — the tunnel's limit is
                # on blocking-RPC duration (waiting on 10 queued segments is
                # one ~7 min wait and gets killed exactly like one long
                # program), and block_until_ready doesn't reliably block
                # through it (CLAUDE.md)
                float(jnp.sum(x[:, 0, 0, 0, 0].astype(jnp.float32)))

            _sync(inputs.latents)      # drain pending VAE-prep dispatches
            carry = init
            for s0 in range(0, n_scan, chunk):
                carry = seg(params, inputs, rope, prev_state, step_keys,
                            carry, jnp.asarray(s0))
                _sync(carry[0])        # per-segment: no wait exceeds ~chunk steps
                _notify(s0 + chunk - 1)
            latents, old_x0 = carry[0], carry[1]
        else:
            carry, _ = jax.lax.scan(body, init, jnp.arange(n_scan))
            latents, old_x0 = carry[0], carry[1]

        hidden_states_list = None
        resample_mask = None
        if dcfg.capture_hidden_states:
            i = S - 1

            def final_fn(params, inputs, rope, prev_state, step_keys, latents,
                         old_x0):
                out = model_step(params, inputs, rope, latents, i, prev_state,
                                 capture=True)
                lat, _ = scheduler_and_blend(inputs, latents, old_x0,
                                             out.sample, i, step_keys[i])
                return lat, out.hidden_states_list, out.resample_mask

            if dcfg.scan_chunk and dcfg.scan_chunk < n_scan:
                if "final" not in _chunk_cache:
                    _chunk_cache["final"] = jax.jit(final_fn)
                latents, hidden_states_list, resample_mask = \
                    _chunk_cache["final"](params, inputs, rope, prev_state,
                                          step_keys, latents, old_x0)
                _notify(i)
            else:
                latents, hidden_states_list, resample_mask = final_fn(
                    params, inputs, rope, prev_state, step_keys, latents,
                    old_x0)
                if dcfg.with_progress:
                    jax.debug.callback(_notify, jnp.asarray(i))
        return latents, hidden_states_list, resample_mask

    return denoise

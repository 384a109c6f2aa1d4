"""Branch (context-encoder) and ID-LoRA training — jitted TPU train steps.

Behavioral parity with train/train_cogvideox_inpainting_i2v_video.py:1737-1898:

 - first-frame conditioning latent from a sigma-noised image,
   sigma = exp(N(-3, 0.5)) (:1775-1782), optional noised_image_dropout (:1800)
 - GT video / masked video VAE-encoded (sampled posterior) * scaling (:1785-1793)
 - masks nearest-resized to the latent grid, concatenated to the branch cond
   (:1802-1811)
 - v-prediction model; loss computed in x0 space: model_pred =
   get_velocity(model_output, noisy_latents, t) == predicted x0 (:1879);
   loss = mean(w*(x0_pred - x0)^2) + inpainting_loss_weight *
   mean(w*(x0_pred*m - x0*m)^2), w = 1/(1-abar_t) (:1881-1891)
 - grad-norm before/after clip logged (:1894-1898)

TPU-native: the whole step (VAE encodes + branch fwd + frozen backbone fwd +
loss + grads + optax update) is ONE jitted function; freeze is expressed by
differentiating only the trainable subtree. ZeRO-2 analog = sharded optimizer
state (parallel/sharding.py). The ID-LoRA step (reference
train_..._resample.py) differentiates only the LoRA A/B pytree, with the merged
kernels recomputed inside the loss (cheap einsum, keeps base frozen).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.lora import attach_lora
from ..pipelines.common import prepare_rope, resize_mask_to_latent


@dataclass(frozen=True)
class BranchTrainConfig:
    height: int = 480
    width: int = 720
    inpainting_loss_weight: float = 1.0
    mask_add: bool = False
    add_first: bool = False
    wo_text: bool = False
    noised_image_dropout: float = 0.05
    max_grad_norm: float = 1.0
    lora_rank: int = 256
    lora_alpha: float = 128.0
    id_pool_resample: bool = True  # LoRA training forwards with resample attn
    remat: bool = True
    remat_chunk: Optional[int] = None  # two-level remat group size for the
                                       # backbone scan (models/dit.py): cuts
                                       # the scan-backward carry residency
                                       # from L to ~2*sqrt(L) layer-states
    use_flash: bool = False  # Pallas flash attention (differentiable custom VJP)
    seq_axis: Optional[str] = None  # mesh axis for GSPMD sequence parallelism


class BranchTrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any          # branch params (or LoRA pytree for the LoRA step)
    opt_state: Any


def init_branch_train_state(trainable_params, optimizer) -> BranchTrainState:
    # The whole state is DONATED into the grad step, so it must OWN every
    # buffer: re-materialize the caller's trainable tree through ONE jitted
    # identity (fresh, compactly buffer-assigned outputs; an eager per-leaf
    # .copy() interleaves copies with live buffers and fragments the axon
    # heap), then make sure no opt-state leaf aliases a trainable buffer
    # (prodigy keeps params0=params — a shared buffer inside one donated
    # pytree is the `f(donate(a), donate(a))` runtime error).
    trainable_params = jax.jit(lambda t: t)(trainable_params)
    opt_state = optimizer.init(trainable_params)
    # Alias detection: optax aliasing keeps the SAME Array object, so id()
    # catches it everywhere; unsafe_buffer_pointer (when the backend
    # implements it — axon-PJRT raises UNIMPLEMENTED) additionally catches
    # distinct Array objects sharing one buffer.
    ids = {id(leaf) for leaf in jax.tree.leaves(trainable_params)}
    ptrs = set()
    for leaf in jax.tree.leaves(trainable_params):
        try:
            ptrs.add(leaf.unsafe_buffer_pointer())
        except Exception:  # non-addressable / sharded / axon-PJRT
            pass

    def unalias(x):
        if id(x) in ids:
            return x.copy()
        try:
            if x.unsafe_buffer_pointer() in ptrs:
                return x.copy()
        except Exception:
            pass
        return x

    opt_state = jax.tree.map(unalias, opt_state)
    return BranchTrainState(step=jnp.zeros((), jnp.int32),
                            trainable=trainable_params,
                            opt_state=opt_state)


def _make_prepare(vae, scheduler, cfg):
    """VAE prep split for single-chip HBM: the three `vae.encode` calls run as
    their own jitted dispatches (the VAE's conv temps would otherwise live
    alongside the DiT backward inside one XLA program - 21 GB at flagship
    dims); the cheap surrounding math is fused into two small jits."""

    @jax.jit
    def _sigma_noise(images, k_sig, k_imgn):
        # sigma-noised first frame (:1775-1782)
        b = images.shape[0]
        sigma = jnp.exp(-3.0 + 0.5 * jax.random.normal(k_sig, (b,)))
        return images + jax.random.normal(k_imgn, images.shape) * \
            sigma[:, None, None, None, None]

    @jax.jit
    def _post(image_latents, model_input, cond_latents, masks,
              k_drop, k_noise, k_t):
        b = model_input.shape[0]
        t_lat, h_lat, w_lat = model_input.shape[1:4]
        pad = jnp.zeros((b, t_lat - 1) + model_input.shape[2:],
                        model_input.dtype)
        image_latents = jnp.concatenate([image_latents, pad], axis=1)
        drop = jax.random.uniform(k_drop, ()) < cfg.noised_image_dropout
        image_latents = jnp.where(drop, jnp.zeros_like(image_latents),
                                  image_latents)
        mask_lat = resize_mask_to_latent(masks, t_lat, h_lat, w_lat)
        branch_cond = jnp.concatenate([cond_latents, mask_lat[..., None]],
                                      axis=-1)
        noise = jax.random.normal(k_noise, model_input.shape)
        timesteps = jax.random.randint(k_t, (b,), 0,
                                       scheduler.config.num_train_timesteps)
        noisy = scheduler.add_noise(model_input, noise, timesteps)
        return noisy, image_latents, branch_cond, mask_lat, timesteps

    def prepare(vae_params, batch, rng):
        video = batch["pixel_values"]          # [B, T, H, W, 3] in [-1, 1]
        sf = vae.cfg.scaling_factor
        ks = jax.random.split(rng, 8)
        noisy_images = _sigma_noise(video[:, :1], ks[0], ks[1])
        image_latents = vae.encode(vae_params, noisy_images).sample(ks[2]) * sf
        # Precomputed-latents fast path: with the posterior MOMENTS in the
        # batch (encode_batch_latent_moments / the trainer's latent cache),
        # the two 49-frame VAE encodes — ~5 s of a 22.45 s chip step — are
        # skipped while the per-step posterior SAMPLE stays bit-identical
        # (same moments, same key). The sigma-noised first-frame encode
        # cannot be precomputed (sigma is drawn per step) but is 1-frame
        # cheap.
        from ..models.vae import DiagonalGaussian

        if "video_latent_mean" in batch:
            model_input = DiagonalGaussian(
                batch["video_latent_mean"],
                batch["video_latent_logvar"]).sample(ks[3]) * sf
        else:
            model_input = vae.encode(vae_params, video).sample(ks[3]) * sf
        if "cond_latent_mean" in batch:
            cond_latents = DiagonalGaussian(
                batch["cond_latent_mean"],
                batch["cond_latent_logvar"]).sample(ks[4]) * sf
        else:
            cond_latents = vae.encode(
                vae_params, batch["conditioning_pixel_values"]).sample(ks[4]) * sf
        noisy, image_latents, branch_cond, mask_lat, timesteps = _post(
            image_latents, model_input, cond_latents, batch["masks"],
            ks[5], ks[6], ks[7])
        return (noisy, image_latents, branch_cond, mask_lat, model_input,
                timesteps)

    return prepare


def encode_batch_latent_moments(vae, vae_params, batch: Dict) -> Dict:
    """Precompute the VAE posterior moments for a batch, enabling the
    precomputed-latents train-step fast path (see _make_prepare). The
    returned batch adds video/cond latent mean+logvar; training then samples
    the SAME posterior per step, so the loss sequence is bit-identical to
    encoding inline with the same rng. Cache only when the pixels feeding an
    encode are step-deterministic: the GT video always is; the MASKED video
    is not when mask augmentation re-randomizes per step
    (mask_transform_prob > 0) — drop cond moments in that case."""
    out = dict(batch)
    d = vae.encode(vae_params, batch["pixel_values"])
    out["video_latent_mean"], out["video_latent_logvar"] = d.mean, d.logvar
    d = vae.encode(vae_params, batch["conditioning_pixel_values"])
    out["cond_latent_mean"], out["cond_latent_logvar"] = d.mean, d.logvar
    return out


def _x0_loss(scheduler, model_output, noisy_video_latents, timesteps,
             target_x0, mask_lat, inpainting_loss_weight):
    """x0-space weighted loss (reference :1879-1891)."""
    model_pred = scheduler.get_velocity(model_output, noisy_video_latents, timesteps)
    abar = jnp.asarray(scheduler.alphas_cumprod, dtype=jnp.float32)[timesteps]
    w = (1.0 / (1.0 - abar))[:, None, None, None, None]
    b = model_pred.shape[0]
    sq = w * jnp.square(model_pred - target_x0)
    loss = jnp.mean(sq.reshape(b, -1), axis=1).mean()
    m = mask_lat[..., None]
    sq_m = w * jnp.square(model_pred * m - target_x0 * m)
    inp_loss = jnp.mean(sq_m.reshape(b, -1), axis=1).mean()
    return loss + inpainting_loss_weight * inp_loss, (loss, inp_loss)


def make_branch_train_step(transformer, branch, vae, scheduler, optimizer,
                           cfg: BranchTrainConfig, ring_mesh=None):
    """Branch SFT: trains only the branch; backbone/VAE frozen.

    batch keys: pixel_values, conditioning_pixel_values, masks, prompt_embeds.
    Returns (state, metrics) with loss / inpainting_loss / grad norms.

    The returned step is self-jitting (VAE prep in its own dispatches, the
    grad+update in one inner jit) - do NOT wrap it in an outer jax.jit on a
    memory-constrained chip; doing so inlines the VAE into the backward
    program and overflows HBM at flagship dims (outer jit still works and is
    fine on CPU/tests or big-memory meshes).
    """
    prepare = _make_prepare(vae, scheduler, cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def _grad_step(state, frozen_transformer, noisy_vid, image_latents,
                   branch_cond, mask_lat, model_input, timesteps,
                   prompt_embeds, rope):
        noisy_model_input = (jnp.concatenate([noisy_vid, image_latents], axis=-1)
                             if transformer.cfg.in_channels == 2 * noisy_vid.shape[-1]
                             else noisy_vid)

        def loss_fn(branch_params):
            samples = branch.apply(branch_params, noisy_vid, prompt_embeds,
                                   branch_cond, timesteps, rope=rope,
                                   remat=cfg.remat, use_flash=cfg.use_flash,
                                   seq_axis=cfg.seq_axis, ring_mesh=ring_mesh)
            out = transformer.apply(
                frozen_transformer, noisy_model_input, prompt_embeds, timesteps,
                rope=rope, branch_block_samples=samples,
                branch_block_masks=mask_lat if cfg.mask_add else None,
                add_first=cfg.add_first, remat=cfg.remat,
                remat_chunk=cfg.remat_chunk, use_flash=cfg.use_flash,
                                   seq_axis=cfg.seq_axis, ring_mesh=ring_mesh)
            return _x0_loss(scheduler, out.sample, noisy_vid, timesteps,
                            model_input, mask_lat, cfg.inpainting_loss_weight)

        (total, (loss, inp_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        gnorm_before = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        new_params = optax.apply_updates(state.trainable, updates)
        gnorm_after = jnp.minimum(gnorm_before, cfg.max_grad_norm)
        metrics = {"loss": loss, "inpainting_loss": inp_loss, "total_loss": total,
                   "gradient_norm_before_clip": gnorm_before,
                   "gradient_norm_after_clip": gnorm_after}
        return BranchTrainState(state.step + 1, new_params, opt_state), metrics

    def train_step(state: BranchTrainState, frozen: Dict[str, Any], batch, rng):
        rng_prep, _ = jax.random.split(rng)
        prep = prepare(frozen["vae"], batch, rng_prep)
        rope = prepare_rope(transformer.cfg, cfg.height, cfg.width,
                            prep[4].shape[1], vae.cfg.spatial_compression_ratio)
        return _grad_step(state, frozen["transformer"], *prep,
                          batch["prompt_embeds"], rope)

    train_step.grad_step = _grad_step  # exposed for memory diagnostics
    return train_step


def make_lora_train_step(transformer, branch, vae, scheduler, optimizer,
                         cfg: BranchTrainConfig, ring_mesh=None):
    """ID-resample LoRA: trains rank-r LoRA on backbone to_q/k/v/out; branch +
    backbone base + VAE frozen; forwards with ID-resampling attention
    (reference train_..._resample.py: LoraConfig r=256 alpha=128,
    id_pool_resample_learnable=True). Self-jitting like the branch step."""
    prepare = _make_prepare(vae, scheduler, cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def _grad_step(state, frozen_models, noisy_vid, image_latents, branch_cond,
                   mask_lat, model_input, timesteps, prompt_embeds, rope):
        noisy_model_input = (jnp.concatenate([noisy_vid, image_latents], axis=-1)
                             if transformer.cfg.in_channels == 2 * noisy_vid.shape[-1]
                             else noisy_vid)
        samples = branch.apply(frozen_models["branch"], noisy_vid, prompt_embeds,
                               branch_cond, timesteps, rope=rope,
                               remat=cfg.remat, use_flash=cfg.use_flash,
                                   seq_axis=cfg.seq_axis, ring_mesh=ring_mesh)
        samples = jax.lax.stop_gradient(samples)

        def loss_fn(lora_params):
            # additive attach (not merge): no [L, d, d] merged-kernel copies
            # inside the grad program, and the frozen backbone may be int8
            # (QLoRA) — gradients reach A/B through ops.basic.linear's delta
            merged = attach_lora(frozen_models["transformer"], lora_params,
                                 alpha=cfg.lora_alpha, rank=cfg.lora_rank)
            out = transformer.apply(
                merged, noisy_model_input, prompt_embeds, timesteps,
                rope=rope, branch_block_samples=samples,
                branch_block_masks=mask_lat if cfg.mask_add else None,
                add_first=cfg.add_first,
                id_pool_resample=cfg.id_pool_resample, remat=cfg.remat,
                remat_chunk=cfg.remat_chunk, use_flash=cfg.use_flash,
                                   seq_axis=cfg.seq_axis, ring_mesh=ring_mesh)
            return _x0_loss(scheduler, out.sample, noisy_vid, timesteps,
                            model_input, mask_lat, cfg.inpainting_loss_weight)

        (total, (loss, inp_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        gnorm_before = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        new_params = optax.apply_updates(state.trainable, updates)
        metrics = {"loss": loss, "inpainting_loss": inp_loss, "total_loss": total,
                   "gradient_norm_before_clip": gnorm_before,
                   "gradient_norm_after_clip": jnp.minimum(gnorm_before,
                                                           cfg.max_grad_norm)}
        return BranchTrainState(state.step + 1, new_params, opt_state), metrics

    def train_step(state: BranchTrainState, frozen: Dict[str, Any], batch, rng):
        rng_prep, _ = jax.random.split(rng)
        prep = prepare(frozen["vae"], batch, rng_prep)
        rope = prepare_rope(transformer.cfg, cfg.height, cfg.width,
                            prep[4].shape[1], vae.cfg.spatial_compression_ratio)
        frozen_models = {"transformer": frozen["transformer"],
                         "branch": frozen["branch"]}
        return _grad_step(state, frozen_models, *prep,
                          batch["prompt_embeds"], rope)

    return train_step

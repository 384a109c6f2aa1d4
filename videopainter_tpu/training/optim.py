"""Optimizers and LR schedules.

Reference: train/train_cogvideox_inpainting_i2v_video.py get_optimizer
(:1236-1314; AdamW defaults lr 1e-5, betas (0.9, 0.95), wd 1e-4, eps 1e-8 per
get_args :120-650) and cosine_with_restarts via diffusers get_scheduler.
TPU-native: optax chains; ZeRO-2 analog comes from sharding the optimizer
state (parallel/sharding.py), not from a custom optimizer.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def cosine_with_restarts_schedule(base_lr: float, warmup_steps: int,
                                  total_steps: int, num_cycles: int = 1,
                                  final_lr: float = 0.0):
    """Matches HF get_cosine_with_hard_restarts_schedule_with_warmup."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        warmup_lr = base_lr * step / warm
        progress = jnp.clip((step - warmup_steps) /
                            jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0)
        cycle_pos = (progress * num_cycles) % 1.0
        cos_lr = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * cycle_pos))
        cos_lr = jnp.where(progress >= 1.0, final_lr, cos_lr)
        return jnp.where(step < warmup_steps, warmup_lr, cos_lr)

    return schedule


def make_lr_schedule(name: str, base_lr: float, *, warmup_steps: int = 0,
                     total_steps: int = 10000, num_cycles: int = 1,
                     power: float = 1.0):
    """The HF diffusers get_scheduler surface (reference --lr_scheduler:
    linear | cosine | cosine_with_restarts | polynomial | constant |
    constant_with_warmup), as an optax-compatible step->lr callable."""
    name = name.lower()
    if name == "cosine_with_restarts":
        return cosine_with_restarts_schedule(base_lr, warmup_steps,
                                             total_steps, num_cycles)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        warmup_lr = base_lr * jnp.minimum(step / warm, 1.0)
        progress = jnp.clip((step - warmup_steps) /
                            jnp.maximum(total_steps - warmup_steps, 1),
                            0.0, 1.0)
        if name == "constant":
            after = jnp.asarray(base_lr, jnp.float32)
            return jnp.broadcast_to(after, step.shape)
        elif name == "constant_with_warmup":
            after = base_lr
        elif name == "linear":
            after = base_lr * (1.0 - progress)
        elif name == "cosine":
            import math as _m

            after = base_lr * 0.5 * (1.0 + jnp.cos(
                _m.pi * float(num_cycles) * 2.0 * progress))
        elif name == "polynomial":
            after = base_lr * (1.0 - progress) ** power
        else:
            raise ValueError(f"unknown lr_scheduler {name!r}")
        return jnp.where(step < warmup_steps, warmup_lr, after)

    return schedule


def make_optimizer(lr=1e-5, *, optimizer: str = "adamw", betas=(0.9, 0.95),
                   eps=1e-8, weight_decay=1e-4,
                   max_grad_norm: Optional[float] = 1.0,
                   prodigy_beta3: Optional[float] = None,
                   prodigy_decouple: bool = True,
                   prodigy_use_bias_correction: bool = False,
                   prodigy_safeguard_warmup: bool = False,
                   accumulate_steps: int = 1,
                   schedule=None) -> optax.GradientTransformation:
    """Optimizer factory mirroring the reference's get_optimizer surface
    (train_...video.py:1236-1314: adam | adamw | prodigy, plus 8-bit Adam).

    - adamw (default): reference defaults lr 1e-5, betas (0.9, 0.95),
      wd 1e-4, eps 1e-8.
    - adam: no decoupled weight decay (torch.optim.Adam semantics).
    - prodigy: optax.contrib.prodigy; the reference passes lr≈1.0 and
      beta3/decouple knobs (:1289-1312).
    - adafactor: the TPU-native analog of the reference's bitsandbytes 8-bit
      Adam (--use_8bit_adam): both shrink optimizer HBM — 8-bit Adam by
      quantizing both moments, adafactor by FACTORING the second moment into
      row/col statistics (~2x state reduction on matrices, more on stacked
      [L,...] leaves). Preferred on TPU: no custom int8 state kernels needed.

    Global-norm clipping at 1.0 wraps every choice (reference
    train_...video.py:1894-1898).

    prodigy_use_bias_correction is accepted for reference flag parity but is
    a no-op: optax.contrib.prodigy has no bias-correction knob (its update
    is already bias-corrected-equivalent via the d-estimation).
    """
    del prodigy_use_bias_correction
    tx = []
    if max_grad_norm is not None:
        tx.append(optax.clip_by_global_norm(max_grad_norm))
    lr_arg = schedule if schedule is not None else lr
    opt = optimizer.lower()
    if opt == "adamw":
        tx.append(optax.adamw(lr_arg, b1=betas[0], b2=betas[1], eps=eps,
                              weight_decay=weight_decay))
    elif opt == "adam":
        tx.append(optax.adam(lr_arg, b1=betas[0], b2=betas[1], eps=eps))
    elif opt == "prodigy":
        tx.append(optax.contrib.prodigy(
            lr_arg, betas=betas, beta3=prodigy_beta3, eps=eps,
            weight_decay=weight_decay if prodigy_decouple else 0.0,
            safeguard_warmup=prodigy_safeguard_warmup))
    elif opt == "adafactor":
        # adafactor ignores Adam betas; its weight_decay_rate is the
        # multiplicative analog of decoupled wd
        tx.append(optax.adafactor(lr_arg,
                                  weight_decay_rate=weight_decay or None))
    else:
        raise ValueError(
            f"unsupported optimizer {optimizer!r}: adam|adamw|prodigy|adafactor")
    out = optax.chain(*tx)
    if accumulate_steps > 1:
        # gradient accumulation (reference --gradient_accumulation_steps via
        # accelerate): micro-grads average across k steps, then the WHOLE
        # chain (incl. the global-norm clip) applies once — matching
        # accelerate's sync_gradients semantics (clip the accumulated grad)
        out = optax.MultiSteps(out, every_k_schedule=accumulate_steps)
    return out

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


def make_optimizer(lr=1e-5, *, betas=(0.9, 0.95), eps=1e-8, weight_decay=1e-4,
                   max_grad_norm: Optional[float] = 1.0,
                   schedule=None) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping (reference clips at 1.0,
    train_...video.py:1894-1898)."""
    tx = []
    if max_grad_norm is not None:
        tx.append(optax.clip_by_global_norm(max_grad_norm))
    tx.append(optax.adamw(schedule if schedule is not None else lr,
                          b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay))
    return optax.chain(*tx)

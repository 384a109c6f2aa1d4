"""Training driver: the end-to-end branch / LoRA training loop.

Reference: train/train_cogvideox_inpainting_i2v_video.py main (:1316-2058) —
model loading/freezing, optimizer, dataloader, epoch loop, per-step metric
logging (loss, inpainting_loss, lr, gradient norms :1937-1946), checkpoint
rotation (:1912-1933), periodic pipeline validation logged as videos
(:1948-2050, log_validation :1026-1110), first-batch visual sanity dump
(:1744-1772), resume-from-latest (:1694-1719).

TPU-native: one jitted train step (training/train_branch.py) over a
data-parallel mesh; logging via the pluggable Logger (wandb if available,
JSONL otherwise); orbax checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np


class Logger:
    """wandb when importable+configured, JSONL fallback otherwise."""

    def __init__(self, output_dir: str, project: str = "videopainter-tpu",
                 run_name: Optional[str] = None, use_wandb: bool = True):
        self.jsonl = open(os.path.join(output_dir, "train_log.jsonl"), "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=project, name=run_name, dir=output_dir)
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict[str, Any], step: int):
        rec = {k: float(v) for k, v in metrics.items()
               if isinstance(v, (int, float, np.floating)) or
               (hasattr(v, "shape") and getattr(v, "shape", None) == ())}
        rec["step"] = step
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def log_video(self, name: str, video01: np.ndarray, step: int, fps: int = 8):
        if self.wandb is not None:
            frames = (video01 * 255).clip(0, 255).astype(np.uint8)
            self.wandb.log({name: self.wandb.Video(
                frames.transpose(0, 3, 1, 2), fps=fps)}, step=step)


@dataclass
class TrainerConfig:
    output_dir: str = "runs/branch"
    max_train_steps: int = 10000
    learning_rate: float = 1e-5
    optimizer: str = "adamw"  # adam | adamw | prodigy | adafactor
    lr_scheduler: str = "cosine_with_restarts"  # HF get_scheduler surface
    lr_warmup_steps: int = 100
    lr_num_cycles: int = 1
    lr_power: float = 1.0  # polynomial scheduler exponent
    gradient_accumulation_steps: int = 1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    adam_weight_decay: float = 1e-4
    adam_epsilon: float = 1e-8
    prodigy_beta3: Optional[float] = None
    prodigy_decouple: bool = True
    prodigy_use_bias_correction: bool = False
    prodigy_safeguard_warmup: bool = False
    batch_size: int = 1
    checkpointing_steps: int = 500
    checkpoints_total_limit: Optional[int] = 5
    validating_steps: int = 256
    log_every: int = 10
    resume_from_checkpoint: Optional[str] = "latest"
    seed: int = 42
    mode: str = "branch"  # or "lora"
    tracker_name: str = "videopainter-tpu"  # wandb project
    runs_name: Optional[str] = None         # wandb run name


def dump_first_batch(batch: Dict, out_dir: str) -> None:
    """First-batch visual sanity dump (reference :1744-1772)."""
    try:
        import cv2
    except ImportError:
        return
    for j in range(min(2, batch["pixel_values"].shape[1])):
        px = ((np.asarray(batch["pixel_values"][0, j]) + 1) * 127.5).clip(0, 255)
        cd = ((np.asarray(batch["conditioning_pixel_values"][0, j]) + 1) * 127.5).clip(0, 255)
        mk = np.repeat(np.asarray(batch["masks"][0, j])[..., None] * 255, 3, -1)
        combo = np.hstack([px, cd, mk]).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"training_sample_{j}.png"),
                    cv2.cvtColor(combo, cv2.COLOR_RGB2BGR))


def shard_train_setup(mesh, trainable, opt_state, frozen_params):
    """Place the training state on a mesh: params/frozen by their TP specs
    (replicated when the mesh has no `model` extent), optimizer moments
    ZeRO-2-style over `data` (the reference's DeepSpeed stage-2 semantics,
    accelerate_config_machine_single_ds.yaml:3-11). Returns the placed
    (trainable, opt_state, frozen_params) plus the batch sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import (branch_param_specs, opt_state_specs, shard_params,
                            transformer_param_specs, vae_param_specs)
    from ..parallel.sharding import fit_spec

    t_specs = branch_param_specs(trainable)
    # The trainable/opt state is DONATED into the train step, so it must own
    # its buffers — device_put can be zero-copy (host backends reuse the
    # source buffer), which would delete the caller's tree on the first step.
    # A jitted identity always materializes fresh, compactly-assigned buffers.
    trainable = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(
            lambda x, s: NamedSharding(mesh, fit_spec(x, s, mesh)),
            trainable, t_specs,
            is_leaf=lambda x: not isinstance(x, (dict, list))),
    )(trainable)
    os_specs = opt_state_specs(opt_state, trainable, t_specs)
    opt_state = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(
            lambda x, s: NamedSharding(mesh, fit_spec(x, s, mesh)),
            opt_state, os_specs),
    )(opt_state)
    placed_frozen = {}
    for name, tree in frozen_params.items():
        specs = (vae_param_specs(tree) if name == "vae"
                 else transformer_param_specs(tree))
        placed_frozen[name] = shard_params(tree, specs, mesh)
    batch_sharding = NamedSharding(mesh, P("data"))
    return trainable, opt_state, placed_frozen, batch_sharding


def train(transformer, branch, vae, scheduler, frozen_params: dict,
          data_iter, tcfg: TrainerConfig, bcfg,
          validation_fn=None, initial_trainable=None, mesh=None):
    """Run the training loop. `data_iter` yields collated batches with
    prompt_embeds already computed (or a text encoder embedded upstream).
    `validation_fn(trainable, step) -> video01 | None` runs the full pipeline
    periodically (reference log_validation). `mesh`: optional
    `jax.sharding.Mesh` — batches shard over `data`, optimizer state shards
    ZeRO-2-style, params follow the TP specs (GSPMD inserts the collectives,
    replacing the reference's accelerate/DeepSpeed NCCL stack)."""
    import jax

    from .checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from .optim import make_lr_schedule, make_optimizer
    from .train_branch import (BranchTrainState, init_branch_train_state,
                               make_branch_train_step, make_lora_train_step)

    os.makedirs(tcfg.output_dir, exist_ok=True)
    logger = Logger(tcfg.output_dir, project=tcfg.tracker_name,
                    run_name=tcfg.runs_name)
    schedule = make_lr_schedule(tcfg.lr_scheduler, tcfg.learning_rate,
                                warmup_steps=tcfg.lr_warmup_steps,
                                total_steps=tcfg.max_train_steps,
                                num_cycles=tcfg.lr_num_cycles,
                                power=tcfg.lr_power)
    optimizer = make_optimizer(
        schedule=schedule, optimizer=tcfg.optimizer,
        betas=(tcfg.adam_beta1, tcfg.adam_beta2),
        eps=tcfg.adam_epsilon, weight_decay=tcfg.adam_weight_decay,
        max_grad_norm=bcfg.max_grad_norm,
        prodigy_beta3=tcfg.prodigy_beta3,
        prodigy_decouple=tcfg.prodigy_decouple,
        prodigy_use_bias_correction=tcfg.prodigy_use_bias_correction,
        prodigy_safeguard_warmup=tcfg.prodigy_safeguard_warmup,
        accumulate_steps=tcfg.gradient_accumulation_steps)

    if initial_trainable is None:
        raise ValueError("initial_trainable (branch params or LoRA tree) required")
    # init_branch_train_state re-materializes the tree through a jitted
    # identity, so the donated state owns its buffers and the caller's tree
    # survives the first donated step.
    state = init_branch_train_state(initial_trainable, optimizer)

    start_step = 0
    if tcfg.resume_from_checkpoint:
        path = (latest_checkpoint(tcfg.output_dir)
                if tcfg.resume_from_checkpoint == "latest"
                else tcfg.resume_from_checkpoint)
        if path:
            template = {"step": np.asarray(0),
                        "trainable": jax.tree.map(np.asarray, state.trainable),
                        "opt_state": jax.tree.map(np.asarray, state.opt_state)}
            restored = restore_checkpoint(path, template)
            state = BranchTrainState(step=np.asarray(restored["step"]),
                                     trainable=restored["trainable"],
                                     opt_state=restored["opt_state"])
            start_step = int(np.asarray(state.step))
            print(f"resumed from {path} at step {start_step}")

    make_step = (make_branch_train_step if tcfg.mode == "branch"
                 else make_lora_train_step)
    # NOT wrapped in an outer jit: the step self-jits (VAE prep dispatches +
    # one grad-step program) so VAE temps never share HBM with the backward
    step_fn = make_step(transformer, branch, vae, scheduler, optimizer, bcfg)

    batch_sharding = None
    mesh_ctx = None
    if mesh is not None:
        trainable, opt_state, frozen_params, batch_sharding = \
            shard_train_setup(mesh, state.trainable, state.opt_state,
                              frozen_params)
        state = state._replace(trainable=trainable, opt_state=opt_state)
        mesh_ctx = mesh.__enter__()

    rng = jax.random.PRNGKey(tcfg.seed)
    t0 = time.time()
    for step in range(start_step, tcfg.max_train_steps):
        # gradient accumulation: k micro-batches per optimizer step; optax
        # MultiSteps averages the grads and applies the chain (incl. the
        # global-norm clip) on the k-th call — accelerate's sync_gradients
        # semantics. `step` counts OPTIMIZER steps, like the reference.
        for micro in range(tcfg.gradient_accumulation_steps):
            batch = next(data_iter)
            if batch_sharding is not None:
                batch = {k: jax.device_put(v, batch_sharding)
                         for k, v in batch.items()}
            if step == start_step and micro == 0:
                dump_first_batch(batch, tcfg.output_dir)
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, frozen_params, batch, k)

        if step % tcfg.log_every == 0:
            metrics = {k2: float(v) for k2, v in metrics.items()}
            metrics["lr"] = float(schedule(step))
            metrics["steps_per_sec"] = tcfg.log_every / max(time.time() - t0, 1e-9)
            t0 = time.time()
            logger.log(metrics, step)

        if (step + 1) % tcfg.checkpointing_steps == 0:
            save_checkpoint(tcfg.output_dir, step + 1,
                            {"step": np.asarray(step + 1),
                             "trainable": jax.tree.map(np.asarray, state.trainable),
                             "opt_state": jax.tree.map(np.asarray, state.opt_state)},
                            total_limit=tcfg.checkpoints_total_limit)

        if validation_fn is not None and (step + 1) % tcfg.validating_steps == 0:
            try:  # validation failures must not kill training (reference :2034-2050)
                video01 = validation_fn(state.trainable, step + 1)
                if video01 is not None:
                    logger.log_video("validation", video01, step + 1)
            except Exception as e:
                print(f"[warn] validation failed at step {step + 1}: {e}")

    if mesh_ctx is not None:
        mesh.__exit__(None, None, None)
    return state

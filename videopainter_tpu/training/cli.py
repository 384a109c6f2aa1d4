"""Training CLI: branch SFT / ID-LoRA from converted checkpoints.

Reference entry points: train/VideoPainter.sh -> train_cogvideox_inpainting_
i2v_video.py (branch) and train/VideoPainterID.sh -> ..._resample.py (LoRA);
the ~95 argparse flags (get_args :120-650) map onto the dataclass configs here.

Usage (branch SFT):
    python -m videopainter_tpu.training.cli \
        --pretrained_model_name_or_path ckpts/cogvideox-5b-i2v \
        --meta_file_path data/meta.csv --instance_data_root data/ \
        --output_dir runs/branch --mask_add --first_frame_gt \
        --max_train_steps 10000 --learning_rate 1e-5

ID-LoRA adds:  --mode lora --cogvideox_branch_name_or_path runs/branch/export
Text embeds: supply --prompt_embeds_file (precomputed, no-T5 deployments) or
a local T5 under <model>/text_encoder.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def get_args(argv=None):
    p = argparse.ArgumentParser()
    # model
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--cogvideox_branch_name_or_path", default=None,
                   help="pretrained branch (required for --mode lora)")
    p.add_argument("--mode", choices=["branch", "lora"], default="branch")
    p.add_argument("--branch_layer_num", type=int, default=2)
    p.add_argument("--rank", type=int, default=256)
    p.add_argument("--lora_alpha", type=float, default=128.0)
    # data
    p.add_argument("--meta_file_path", required=True)
    p.add_argument("--instance_data_root", default="")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--max_num_frames", type=int, default=49)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--mask_transform_prob", type=float, default=0.3)
    p.add_argument("--p_brush", type=float, default=0.25)
    p.add_argument("--p_rect", type=float, default=0.25)
    p.add_argument("--p_ellipse", type=float, default=0.2)
    p.add_argument("--p_circle", type=float, default=0.2)
    p.add_argument("--p_random_brush", type=float, default=0.1)
    p.add_argument("--mix_train_ratio", type=float, default=0.0)
    p.add_argument("--min_caption_len", type=int, default=50)
    p.add_argument("--first_frame_gt", action="store_true")
    p.add_argument("--mask_background", action="store_true")
    p.add_argument("--proportion_empty_prompts", type=float, default=0.0)
    p.add_argument("--prompt_embeds_file", default=None)
    # objective / conditioning
    p.add_argument("--inpainting_loss_weight", type=float, default=1.0)
    p.add_argument("--mask_add", action="store_true")
    p.add_argument("--add_first", action="store_true")
    p.add_argument("--wo_text", action="store_true")
    p.add_argument("--noised_image_dropout", type=float, default=0.05)
    p.add_argument("--use_flash", action="store_true",
                   help="Pallas flash attention in the train step (TPU)")
    # optimization
    p.add_argument("--max_train_steps", type=int, default=10000)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adam", "adamw", "prodigy", "adafactor"],
                   help="reference get_optimizer surface "
                        "(train_...video.py:1236-1314) + adafactor")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="TPU analog of bitsandbytes 8-bit Adam: switches to "
                        "adafactor (factored second moment — the optimizer-"
                        "HBM reduction, no int8 state kernels needed)")
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--lr_num_cycles", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    # infra
    p.add_argument("--output_dir", default="runs/branch")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=5)
    p.add_argument("--validating_steps", type=int, default=256)
    p.add_argument("--resume_from_checkpoint", default="latest")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel size (0 = all devices; default 1 = "
                        "single-device, no mesh)")
    p.add_argument("--mesh_seq", type=int, default=1,
                   help="sequence-parallel size (GSPMD seq axis)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel size (megatron-style block specs)")
    p.add_argument("--dcn_data", type=int, default=1,
                   help="multi-slice data-parallel factor (gradients "
                        "all-reduce over DCN; requires jax.distributed)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import (BranchConfig, SchedulerConfig, TransformerConfig,
                          VAEConfig, load_config)
    from ..convert import (convert_branch_state_dict,
                           convert_transformer_state_dict,
                           convert_vae_state_dict, load_safetensors_dir)
    from ..models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                          CogVideoXTransformer3D)
    from ..models.lora import init_lora_params
    from ..schedulers import CogVideoXDDIMScheduler
    from .data import DataConfig, InpaintingCollator, VideoInpaintingDataset, data_loader
    from .masks import MaskTransformConfig
    from .train_branch import BranchTrainConfig
    from .trainer import TrainerConfig, train

    root = args.pretrained_model_name_or_path
    tcfg_m = load_config(os.path.join(root, "transformer", "config.json"),
                         TransformerConfig)
    if args.mode == "lora":
        tcfg_m = TransformerConfig.from_dict(
            {**tcfg_m.to_dict(), "id_pool_resample_learnable": True})
    vcfg = load_config(os.path.join(root, "vae", "config.json"), VAEConfig)
    transformer = CogVideoXTransformer3D(tcfg_m)
    vae = AutoencoderKLCogVideoX(vcfg)
    frozen = {
        "transformer": convert_transformer_state_dict(
            load_safetensors_dir(os.path.join(root, "transformer"))),
        "vae": convert_vae_state_dict(
            load_safetensors_dir(os.path.join(root, "vae"))),
    }

    if args.mode == "branch":
        bcfg = BranchConfig.from_transformer(tcfg_m, num_layers=args.branch_layer_num,
                                             wo_text=args.wo_text)
        branch = CogVideoXBranch(bcfg)
        trainable = branch.init_from_transformer(
            jax.random.PRNGKey(args.seed), frozen["transformer"], tcfg_m)
    else:
        if not args.cogvideox_branch_name_or_path:
            raise SystemExit("--cogvideox_branch_name_or_path required for lora")
        bcfg = load_config(os.path.join(args.cogvideox_branch_name_or_path,
                                        "config.json"), BranchConfig)
        branch = CogVideoXBranch(bcfg)
        frozen["branch"] = convert_branch_state_dict(
            load_safetensors_dir(args.cogvideox_branch_name_or_path))
        trainable = init_lora_params(jax.random.PRNGKey(args.seed),
                                     frozen["transformer"], rank=args.rank)

    sched = CogVideoXDDIMScheduler(SchedulerConfig(prediction_type="v_prediction"))

    dcfg = DataConfig(
        meta_file_path=args.meta_file_path,
        instance_data_root=args.instance_data_root,
        height=args.height, width=args.width,
        max_num_frames=args.max_num_frames, fps=args.fps,
        mask_transform_prob=args.mask_transform_prob,
        mask_cfg=MaskTransformConfig(
            p_brush=args.p_brush, p_rect=args.p_rect, p_ellipse=args.p_ellipse,
            p_circle=args.p_circle, p_random_brush=args.p_random_brush),
        mix_train_ratio=args.mix_train_ratio,
        min_caption_len=args.min_caption_len,
        first_frame_gt=args.first_frame_gt,
        mask_background=args.mask_background,
        proportion_empty_prompts=args.proportion_empty_prompts,
        seed=args.seed)
    dataset = VideoInpaintingDataset(dcfg)
    collator = InpaintingCollator(dcfg)
    print(f"dataset: {len(dataset)} clips after filtering")

    # prompt embedding: precomputed or T5
    if args.prompt_embeds_file:
        from ..models.text_encoder import load_prompt_embeds

        fixed = jnp.asarray(load_prompt_embeds(args.prompt_embeds_file))
        embed_fn = lambda prompts: jnp.tile(fixed, (len(prompts), 1, 1))
    else:
        from ..models.text_encoder import T5TextEncoder

        te = T5TextEncoder.from_local(os.path.join(root, "text_encoder"),
                                      max_length=tcfg_m.max_text_seq_length)
        embed_fn = lambda prompts: jnp.concatenate(
            [te.encode(None, p) for p in prompts], axis=0)

    def batches():
        for batch in data_loader(dataset, collator, args.train_batch_size,
                                 seed=args.seed):
            yield {
                "pixel_values": jnp.asarray(batch["pixel_values"]),
                "conditioning_pixel_values": jnp.asarray(
                    batch["conditioning_pixel_values"]),
                "masks": jnp.asarray(batch["masks"]),
                "prompt_embeds": embed_fn(batch["prompts"]),
            }

    btcfg = BranchTrainConfig(
        height=args.height, width=args.width,
        inpainting_loss_weight=args.inpainting_loss_weight,
        mask_add=args.mask_add, add_first=args.add_first, wo_text=args.wo_text,
        noised_image_dropout=args.noised_image_dropout,
        use_flash=args.use_flash,
        max_grad_norm=args.max_grad_norm,
        lora_rank=args.rank, lora_alpha=args.lora_alpha)
    trcfg = TrainerConfig(
        output_dir=args.output_dir, max_train_steps=args.max_train_steps,
        learning_rate=args.learning_rate,
        optimizer=("adafactor" if args.use_8bit_adam else args.optimizer),
        lr_warmup_steps=args.lr_warmup_steps,
        lr_num_cycles=args.lr_num_cycles, batch_size=args.train_batch_size,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        validating_steps=args.validating_steps,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed, mode=args.mode)

    # distribution: mirror the reference's `accelerate launch` 8-GPU ZeRO-2
    # setup with a Mesh — data-parallel batches, ZeRO-2 optimizer sharding,
    # optional seq/model axes (beyond reference). mesh_data=1 with no other
    # axes keeps the single-device path.
    from ..parallel import initialize_distributed, make_hybrid_mesh

    initialize_distributed()
    mesh = None
    n_dev = len(jax.devices())
    data = args.mesh_data or max(
        n_dev // (args.mesh_seq * args.mesh_model * args.dcn_data), 1)
    if data * args.mesh_seq * args.mesh_model * args.dcn_data > 1:
        mesh = make_hybrid_mesh(dcn_data=args.dcn_data, data=data,
                                seq=args.mesh_seq, model=args.mesh_model)
        if args.mesh_seq > 1 and not btcfg.seq_axis:
            btcfg = dataclasses.replace(btcfg, seq_axis="seq")

    state = train(transformer, branch, vae, sched, frozen, batches(), trcfg,
                  btcfg, initial_trainable=trainable, mesh=mesh)

    # final export in reference-compatible format
    from .checkpoint import export_branch_pretrained, export_lora_weights

    if args.mode == "branch":
        export_branch_pretrained(state.trainable, bcfg.to_dict(),
                                 os.path.join(args.output_dir, "export"))
    else:
        export_lora_weights(state.trainable, os.path.join(args.output_dir, "export"))
    print(f"exported final weights to {args.output_dir}/export")


if __name__ == "__main__":
    main()

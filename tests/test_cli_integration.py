"""Inference CLI integration: export tiny checkpoints -> build_pipeline ->
generate_video over a synthetic mp4 + NPZ masks. Exercises the full deployment
flow (HF-format export, config load, safetensors, CSV/NPZ IO, side-by-side
export)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from videopainter_tpu.config import (BranchConfig, TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.training.checkpoint import (export_branch_pretrained,
                                                  export_transformer_pretrained,
                                                  export_vae_pretrained)


def make_ckpts(root):
    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    vcfg = VAEConfig.tiny(latent_channels=16)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(vcfg)
    tp = transformer.init(jax.random.PRNGKey(0))
    bp = branch.init_from_transformer(jax.random.PRNGKey(1), tp, cfg)
    vp = vae.init(jax.random.PRNGKey(2))
    export_transformer_pretrained(tp, cfg.to_dict(),
                                  os.path.join(root, "model", "transformer"))
    export_vae_pretrained(vp, vcfg.to_dict(), os.path.join(root, "model", "vae"))
    export_branch_pretrained(bp, bcfg.to_dict(), os.path.join(root, "branch"))
    return cfg


def make_data(root, t=9, h=64, w=96):
    rng = np.random.RandomState(0)
    video = (rng.rand(t, h, w, 3) * 255).astype(np.uint8)
    vpath = os.path.join(root, "vid.mp4")
    vw = cv2.VideoWriter(vpath, cv2.VideoWriter_fourcc(*"mp4v"), 8, (w, h))
    for f in video:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    masks = np.zeros((t, h, w), np.uint8)
    masks[:, 20:40, 30:60] = 1
    np.savez(os.path.join(root, "all_masks.npz"), **{"0": masks})
    import pandas as pd

    pd.DataFrame([{"path": vpath, "fps": 8, "start_frame": 0, "end_frame": 0,
                   "mask_id": 0,
                   "caption": "a colorful noise pattern morphing over time x"}]
                 ).to_csv(os.path.join(root, "meta.csv"), index=False)


def test_cli_generate_video(tmp_path):
    from videopainter_tpu.infer.inpaint import generate_video, get_args

    root = str(tmp_path)
    make_ckpts(root)
    make_data(root)
    embeds = np.random.RandomState(3).rand(1, 5, 12).astype(np.float32)
    np.save(os.path.join(root, "embeds.npy"), embeds)

    args = get_args([
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--meta_file_path", os.path.join(root, "meta.csv"),
        "--video_id", "0",
        "--output_path", os.path.join(root, "out"),
        "--prompt_embeds", os.path.join(root, "embeds.npy"),
        "--height", "64", "--width", "96",
        "--num_frames", "9", "--num_inference_steps", "2",
        "--replace_gt", "--mask_add", "--first_frame_gt",
        "--dtype", "float32",
    ])
    out01 = generate_video(args)
    assert out01.shape == (9, 64, 96, 3)
    assert np.isfinite(out01).all()
    assert os.path.exists(os.path.join(root, "out", "video_0.mp4"))


def test_cli_generate_video_int8_sequential(tmp_path):
    """Single-chip deployment flags: --int8 + --sequential_cfg (with
    --use_flash, this is the config the 42L model runs under on one 16 GB
    chip). Flash needs a TPU, so this CPU test exercises the two
    numerics-affecting flags through the full CLI."""
    from videopainter_tpu.infer.inpaint import generate_video, get_args

    root = str(tmp_path)
    make_ckpts(root)
    make_data(root)
    embeds = np.random.RandomState(3).rand(1, 5, 12).astype(np.float32)
    np.save(os.path.join(root, "embeds.npy"), embeds)

    args = get_args([
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--meta_file_path", os.path.join(root, "meta.csv"),
        "--video_id", "0",
        "--output_path", os.path.join(root, "out"),
        "--prompt_embeds", os.path.join(root, "embeds.npy"),
        "--height", "64", "--width", "96",
        "--num_frames", "9", "--num_inference_steps", "2",
        "--replace_gt", "--mask_add", "--first_frame_gt",
        "--dtype", "float32", "--int8", "--sequential_cfg",
        "--vae_frame_batch", "1",
    ])
    out01 = generate_video(args)
    assert out01.shape == (9, 64, 96, 3)
    assert np.isfinite(out01).all()


def test_cli_int8_static_scales(tmp_path):
    """--int8_scales: a save_ascales npz attaches through the CLI (static
    W8A8 — the per-token quantize reduce replaced by calibrated constants)."""
    from videopainter_tpu.infer.inpaint import generate_video, get_args
    from videopainter_tpu.quantize import save_ascales

    root = str(tmp_path)
    make_ckpts(root)
    make_data(root)
    embeds = np.random.RandomState(3).rand(1, 5, 12).astype(np.float32)
    np.save(os.path.join(root, "embeds.npy"), embeds)
    sites = ("to_q", "to_k", "to_v", "to_out", "proj_in", "proj_out")
    scales_path = os.path.join(root, "scales.npz")
    save_ascales(scales_path,
                 {m: {s: np.full(2, 0.2, np.float32) for s in sites}
                  for m in ("transformer", "branch")})

    args = get_args([
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--meta_file_path", os.path.join(root, "meta.csv"),
        "--video_id", "0",
        "--output_path", os.path.join(root, "out"),
        "--prompt_embeds", os.path.join(root, "embeds.npy"),
        "--height", "64", "--width", "96",
        "--num_frames", "9", "--num_inference_steps", "2",
        "--replace_gt", "--mask_add", "--first_frame_gt",
        "--dtype", "float32", "--int8", "--sequential_cfg",
        "--int8_scales", scales_path,
    ])
    out01 = generate_video(args)
    assert out01.shape == (9, 64, 96, 3)
    assert np.isfinite(out01).all()


def test_ascales_npz_roundtrip(tmp_path):
    from videopainter_tpu.quantize import load_ascales, save_ascales

    scales = {"transformer": {"to_q": np.arange(4, dtype=np.float32) + 1,
                              "proj_in": np.full(4, 0.5, np.float32)},
              "branch": {"to_out": np.full(2, 0.25, np.float32)}}
    p = os.path.join(str(tmp_path), "s.npz")
    save_ascales(p, scales)
    back = load_ascales(p)
    assert set(back) == {"transformer", "branch"}
    np.testing.assert_allclose(back["transformer"]["to_q"],
                               scales["transformer"]["to_q"])
    np.testing.assert_allclose(back["branch"]["to_out"],
                               scales["branch"]["to_out"])
    with pytest.raises(ValueError):
        save_ascales(p, {})

"""Evaluation + training CLI integration (synthetic data, tiny checkpoints).

Mirrors the reference shell drivers: evaluate/eval_inpainting.sh and
train/VideoPainter.sh, on a synthetic DAVIS tree / CSV+NPZ clip.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_cli_integration import make_ckpts, make_data  # noqa: E402


def make_davis(root, names=("bear",), t=9, h=64, w=96):
    rng = np.random.RandomState(1)
    for name in names:
        jd = os.path.join(root, "davis", "JPEGImages/480p", name)
        ad = os.path.join(root, "davis", "Annotations/480p", name)
        os.makedirs(jd)
        os.makedirs(ad)
        for i in range(t):
            cv2.imwrite(os.path.join(jd, f"{i:05d}.jpg"),
                        (rng.rand(h, w, 3) * 255).astype(np.uint8))
            m = np.zeros((h, w), np.uint8)
            m[20:40, 30:60] = 255
            cv2.imwrite(os.path.join(ad, f"{i:05d}.png"), m)


def test_eval_cli_davis(tmp_path):
    from videopainter_tpu.evaluate.cli import main

    root = str(tmp_path)
    make_ckpts(root)
    make_davis(root)
    np.save(os.path.join(root, "embeds.npy"),
            np.random.RandomState(0).rand(1, 5, 12).astype(np.float32))
    args = [
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--dataset", "davis", "--video_root", os.path.join(root, "davis"),
        "--save_addr", os.path.join(root, "eval_out"),
        "--height", "64", "--width", "96", "--num_frames", "9",
        "--num_inference_steps", "1", "--dilate_size", "2",
        "--replace_gt", "--mask_add", "--dtype", "float32",
        "--prompt_embeds_file", os.path.join(root, "embeds.npy")]
    avg = main(args)
    assert os.path.exists(os.path.join(root, "eval_out", "results.csv"))
    assert np.isfinite(avg["psnr"]) and np.isfinite(avg["time_per_frame_s"])
    # resume: a second run must skip the completed video and reproduce averages
    avg2 = main(args)
    np.testing.assert_allclose(avg2["psnr"], avg["psnr"], rtol=1e-6)


def test_eval_sweep_matrix(tmp_path):
    """One command reproduces the reference eval matrix layout
    (eval_inpainting.sh: config x dilate x replace_gt, per-combo dirs +
    aggregated summary)."""
    import csv

    from videopainter_tpu.evaluate.sweep import main

    root = str(tmp_path)
    make_ckpts(root)
    make_davis(root)
    np.save(os.path.join(root, "embeds.npy"),
            np.random.RandomState(0).rand(1, 5, 12).astype(np.float32))
    rows = main([
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--configs", "davis", "standard",  # standard skipped: no meta given
        "--davis_root", os.path.join(root, "davis"),
        "--dilate_sizes", "2", "--replace_gt_values", "true", "false",
        "--save_addr", os.path.join(root, "sweep_out"),
        "--height", "64", "--width", "96", "--num_frames", "9",
        "--num_inference_steps", "1", "--mask_add", "--dtype", "float32",
        "--prompt_embeds_file", os.path.join(root, "embeds.npy")])
    assert len(rows) == 2  # davis x 1 dilate x 2 replace_gt
    for rg in (0, 1):
        d = os.path.join(root, "sweep_out", "davis", f"dilate2_rg{rg}")
        assert os.path.exists(os.path.join(d, "results.csv")), d
    with open(os.path.join(root, "sweep_out", "sweep_summary.csv")) as f:
        recs = list(csv.DictReader(f))
    assert len(recs) == 2
    assert {r["replace_gt"] for r in recs} == {"0", "1"}
    assert all(np.isfinite(float(r["psnr"])) for r in recs)


def test_training_cli_one_step(tmp_path):
    from videopainter_tpu.training.cli import main

    root = str(tmp_path)
    make_ckpts(root)
    make_data(root)
    np.save(os.path.join(root, "embeds.npy"),
            np.random.RandomState(0).rand(1, 5, 12).astype(np.float32))
    main([
        "--pretrained_model_name_or_path", os.path.join(root, "model"),
        "--meta_file_path", os.path.join(root, "meta.csv"),
        "--output_dir", os.path.join(root, "run"),
        "--prompt_embeds_file", os.path.join(root, "embeds.npy"),
        "--height", "64", "--width", "96", "--max_num_frames", "5",
        "--max_train_steps", "1", "--checkpointing_steps", "1",
        "--validating_steps", "1000", "--mask_add", "--first_frame_gt",
        "--branch_layer_num", "2", "--seed", "0", "--min_caption_len", "10",
        "--cache_latents"])
    assert os.path.isdir(os.path.join(root, "run", "checkpoint-1"))
    assert os.path.exists(os.path.join(
        root, "run", "export", "diffusion_pytorch_model.safetensors"))
    # --cache_latents (video-only here: mask_transform_prob defaults >0)
    # wrote the GT-video moments for the consumed batch
    cache = os.path.join(root, "run", "latent_cache")
    npz = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert npz, "latent cache empty"
    z = np.load(os.path.join(cache, npz[0]))
    assert "vm" in z and "vl" in z and "cm" not in z

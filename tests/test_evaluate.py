"""Evaluation metrics + harness tests."""

import numpy as np
import pytest

from videopainter_tpu.evaluate.metrics import (MetricsCalculator, frechet_distance,
                                               mae, mse, psnr, ssim,
                                               temporal_consistency)


def test_psnr_ssim_identity():
    img = np.random.RandomState(0).rand(64, 64, 3)
    assert psnr(img, img) == float("inf")
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    assert mse(img, img) == 0 and mae(img, img) == 0


def test_psnr_known_value():
    a = np.zeros((32, 32, 3))
    b = np.full((32, 32, 3), 0.1)
    assert psnr(a, b) == pytest.approx(20.0, abs=1e-6)


def _ssim_reference(a, b, data_range=1.0, k1=0.01, k2=0.03):
    """Independent re-derivation of torchmetrics' SSIM (Wang et al. 2004:
    11x11 gaussian window sigma 1.5, valid padding, mean over channels),
    written directly from the formula so it shares no code with the
    implementation under test."""
    x = np.arange(11) - 5
    g1 = np.exp(-(x**2) / (2 * 1.5**2))
    g1 /= g1.sum()
    win = np.outer(g1, g1)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        ai, bi = a[..., ch].astype(np.float64), b[..., ch].astype(np.float64)

        def filt(img):
            h, w = img.shape
            out = np.empty((h - 10, w - 10))
            for i in range(h - 10):
                for j in range(w - 10):
                    out[i, j] = float((img[i:i + 11, j:j + 11] * win).sum())
            return out

        mu_a, mu_b = filt(ai), filt(bi)
        saa = filt(ai * ai) - mu_a**2
        sbb = filt(bi * bi) - mu_b**2
        sab = filt(ai * bi) - mu_a * mu_b
        s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2) /
             ((mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)))
        vals.append(s.mean())
    return float(np.mean(vals))


def test_ssim_matches_reference_formula():
    rng = np.random.RandomState(1)
    a = rng.rand(32, 40, 3).astype(np.float32)
    b = np.clip(a + rng.randn(32, 40, 3).astype(np.float32) * 0.05, 0, 1)
    np.testing.assert_allclose(ssim(b, a), _ssim_reference(b, a),
                               rtol=1e-3, atol=1e-4)


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 16)
    assert frechet_distance(a, a + 0.0) == pytest.approx(0.0, abs=1e-6)
    b = rng.randn(500, 16) + 3.0
    d = frechet_distance(a, b)
    assert d > 100  # mean shift of 3 in 16 dims -> ~144


def test_temporal_consistency():
    e = np.tile(np.random.RandomState(0).randn(8), (5, 1))
    assert temporal_consistency(e) == pytest.approx(1.0)
    rand = np.random.RandomState(1).randn(50, 512)
    assert abs(temporal_consistency(rand)) < 0.3


def test_calculator_masked_variants():
    rng = np.random.RandomState(0)
    gt = rng.rand(32, 48, 3)
    pred = np.clip(gt + rng.randn(32, 48, 3) * 0.1, 0, 1)
    mask = np.zeros((32, 48))
    mask[8:24, 12:36] = 1
    mc = MetricsCalculator()
    m = mc.frame_metrics(pred, gt, mask=mask)
    for k in ["psnr", "ssim", "mse", "mae", "masked_psnr", "masked_ssim",
              "masked_mse", "masked_mae"]:
        assert k in m and np.isfinite(m[k])
    # masked mse <= global mse (fewer contributing pixels, rest zeroed equal)
    assert m["masked_mse"] <= m["mse"] + 1e-9


def test_harness_end_to_end(tmp_path):
    """Tiny pipeline through the full eval loop incl. resume."""
    import jax
    import jax.numpy as jnp

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.evaluate import EvalConfig, run_inpainting_eval
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline
    from videopainter_tpu.schedulers import CogVideoXDPMScheduler

    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    vcfg = VAEConfig.tiny(latent_channels=16)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(vcfg)
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    sched = CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference())
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(transformer, branch, vae, sched)

    rng = np.random.RandomState(0)
    dataset = []
    for i in range(2):
        video = (rng.rand(9, 64, 96, 3) * 255).astype(np.uint8)
        masks = np.zeros((9, 64, 96), np.uint8)
        masks[:, 20:40, 30:60] = 1
        dataset.append({"name": f"vid{i}", "video": video, "masks": masks,
                        "caption": "test"})

    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))

    def encode(prompt):
        return embeds, jnp.zeros_like(embeds)

    ecfg = EvalConfig(output_dir=str(tmp_path), num_inference_steps=2,
                      num_frames=9, replace_gt=True, mask_add=True)
    summary = run_inpainting_eval(pipe, params, dataset, ecfg,
                                  encode_prompt_fn=encode)
    assert np.isfinite(summary["psnr"]) and "time_per_frame_s" in summary
    import os
    assert os.path.exists(tmp_path / "results.csv")
    assert os.path.isdir(tmp_path / "comp_frames" / "vid0")

    # resume: second run skips everything (no pipeline calls -> fast)
    import time

    t0 = time.time()
    summary2 = run_inpainting_eval(pipe, params, dataset, ecfg,
                                   encode_prompt_fn=encode)
    assert time.time() - t0 < 5.0


# ---------------------------------------------------------------------------
# flow utilities (reference flow_util.py parity)
# ---------------------------------------------------------------------------

def test_flow_io_roundtrip(tmp_path):
    from videopainter_tpu.evaluate.flow_util import flowread, flowwrite

    rng = np.random.RandomState(0)
    flow = rng.randn(12, 16, 2).astype(np.float32) * 3
    p = str(tmp_path / "a.flo")
    flowwrite(flow, p)
    got = flowread(p)
    # reference writes a float16 payload (:62, :92)
    np.testing.assert_allclose(got, flow.astype(np.float16).astype(np.float32))


def test_flow_quantized_roundtrip(tmp_path):
    import pytest

    pytest.importorskip("cv2")
    from videopainter_tpu.evaluate.flow_util import flowread, flowwrite

    rng = np.random.RandomState(1)
    flow = rng.uniform(-0.01, 0.01, (8, 10, 2)).astype(np.float32)
    flow[..., 0] *= 10  # dx normalized by width
    flow[..., 1] *= 8
    p = str(tmp_path / "q.png")
    flowwrite(flow, p, quantize_pair=True)
    got = flowread(p, quantize_pair=True)
    assert got.shape == flow.shape
    # 255-level quantization of [-0.02, 0.02]-normalized flow
    assert np.abs(got - flow).mean() < 0.05


def test_resize_flow_scales_magnitude():
    import pytest

    pytest.importorskip("cv2")
    from videopainter_tpu.evaluate.flow_util import resize_flow

    flow = np.ones((8, 10, 2), np.float32)
    out = resize_flow(flow, 16, 30)
    assert out.shape == (16, 30, 2)
    np.testing.assert_allclose(out[..., 0], 3.0, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], 2.0, rtol=1e-5)


def test_metrics_calculator_flow_warping():
    from videopainter_tpu.evaluate.metrics import MetricsCalculator

    rng = np.random.RandomState(2)
    video = np.repeat(rng.rand(1, 8, 12, 3), 4, axis=0).astype(np.float32)

    calls = []

    def zero_flow(f0, f1):
        calls.append(1)
        return np.zeros((*f0.shape[:2], 2), np.float32)

    mc = MetricsCalculator(flow_fn=zero_flow)
    masks = np.ones((4, 8, 12), np.float32)
    out = mc.video_metrics(video, masks=masks)
    # static video + zero flow -> exactly zero warping error
    assert out["flow_warping_error"] == 0.0
    assert out["masked_flow_warping_error"] == 0.0
    assert len(calls) == 6  # 3 frame pairs x (global + masked)


def test_harness_caption_hook(tmp_path):
    """Empty-caption samples go through caption_fn (the CogVLM2 captioner
    hook, reference evaluate/metrics.py:621-725) and the generated caption
    reaches the CLIP-score path."""
    import jax
    import jax.numpy as jnp

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         TransformerConfig, VAEConfig)
    from videopainter_tpu.evaluate import (EvalConfig, MetricsCalculator,
                                           run_inpainting_eval)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline
    from videopainter_tpu.schedulers import CogVideoXDPMScheduler

    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16))
    params = {"transformer": transformer.init(jax.random.PRNGKey(0)),
              "vae": vae.init(jax.random.PRNGKey(1))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(2),
                                                    params["transformer"], cfg)
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(
        transformer, branch, vae,
        CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference()))

    rng = np.random.RandomState(3)
    video = (rng.rand(9, 64, 96, 3) * 255).astype(np.uint8)
    masks = np.zeros((9, 64, 96), np.uint8)
    masks[:, 20:40, 30:60] = 1
    dataset = [{"name": "nocap", "video": video, "masks": masks, "caption": ""}]

    captioner_calls = []

    def fake_captioner(video_u8, masks_u8):
        captioner_calls.append((video_u8.shape, masks_u8.shape))
        return "a synthetic caption"

    scored_captions = []

    def fake_clip_score(image, text):
        scored_captions.append(text)
        return 0.5

    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    summary = run_inpainting_eval(
        pipe, params, dataset,
        EvalConfig(output_dir=str(tmp_path), num_inference_steps=2,
                   num_frames=9, replace_gt=True, mask_add=True),
        metrics=MetricsCalculator(text_image_score_fn=fake_clip_score),
        encode_prompt_fn=lambda p: (embeds, jnp.zeros_like(embeds)),
        caption_fn=fake_captioner)

    assert captioner_calls == [((9, 64, 96, 3), (9, 64, 96))]
    assert scored_captions and all(c == "a synthetic caption"
                                   for c in scored_captions)
    assert np.isfinite(summary["clip_score"])

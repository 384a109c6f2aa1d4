"""Int8 W8A8 quantization: linear-level exactness properties and model-level
closeness. Opt-in fast path (beyond reference) — not parity-exact by design.
"""

import jax
import jax.numpy as jnp
import numpy as np

from videopainter_tpu.config import TransformerConfig
from videopainter_tpu.models import CogVideoXTransformer3D
from videopainter_tpu.ops.basic import linear, quantize_linear_int8
from videopainter_tpu.quantize import quantize_transformer_int8


def test_linear_int8_close():
    rng = np.random.RandomState(0)
    p = {"kernel": jnp.asarray(rng.randn(64, 48).astype(np.float32)) * 0.05,
         "bias": jnp.asarray(rng.randn(48).astype(np.float32)) * 0.01}
    x = jnp.asarray(rng.randn(7, 64).astype(np.float32))
    ref = linear(p, x)
    q = quantize_linear_int8(p)
    assert q["kernel_q"].dtype == jnp.int8 and q["kernel_q"].shape == (64, 48)
    assert q["kscale"].shape == (48,)
    got = linear(q, x)
    # w8a8 with per-channel/per-token scales: ~1% error vs typical magnitude
    err = np.abs(np.asarray(got - ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert err < 0.02, err


def test_linear_int8_stacked_matches_per_layer():
    """Quantizing a scan-stacked [L, in, out] kernel == quantizing each layer."""
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 16, 8).astype(np.float32))
    stacked = quantize_linear_int8({"kernel": w})
    for i in range(3):
        single = quantize_linear_int8({"kernel": w[i]})
        np.testing.assert_array_equal(np.asarray(stacked["kernel_q"][i]),
                                      np.asarray(single["kernel_q"]))
        np.testing.assert_allclose(np.asarray(stacked["kscale"][i]),
                                   np.asarray(single["kscale"]))


def test_transformer_int8_forward_close():
    cfg = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12)
    t = CogVideoXTransformer3D(cfg)
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 12, 16))
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    ts = jnp.zeros((1,), jnp.int32)
    ref = t.apply(params, x, emb, ts).sample

    qparams = quantize_transformer_int8(params)
    # embeddings/norms/head untouched; block projections rewritten
    assert "kernel_q" in qparams["blocks"]["attn1"]["to_q"]
    assert "kernel" in qparams["patch_embed"]["proj"]
    assert "kernel" in qparams["proj_out"]
    got = t.apply(qparams, x, emb, ts).sample

    ref_n, got_n = np.asarray(ref), np.asarray(got)
    cos = (ref_n * got_n).sum() / (np.linalg.norm(ref_n) * np.linalg.norm(got_n))
    assert cos > 0.995, cos
    assert np.abs(got_n - ref_n).mean() < 0.05 * np.abs(ref_n).mean() + 1e-3


def test_pipeline_int8_quality():
    """End-to-end: the int8 fast mode stays close to the full-precision
    pipeline on the same injected noise (quality gate for the opt-in path)."""
    import numpy as np

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch)
    from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintPipeline
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
    pipe = CogVideoXI2VDualInpaintPipeline(
        transformer, branch, vae,
        CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference()))

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    kw = dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
              prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=2, guidance_scale=6.0, replace_gt=True,
              mask_add=True, vae_sample_mode="mode", rng=jax.random.PRNGKey(7))
    ref = pipe(params, **kw)

    qparams = dict(params)
    qparams["transformer"] = quantize_transformer_int8(params["transformer"])
    qparams["branch"] = quantize_transformer_int8(params["branch"])
    got = pipe(qparams, **kw)

    mse = float(np.square(np.asarray(got) / 2 - np.asarray(ref) / 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 25.0, f"int8 pipeline PSNR vs full precision {psnr:.1f} dB"


def test_quantize_free_source():
    """free_source=True must produce identical int8 params while popping the
    source kernels (the 42L on-chip path: both trees never coexist)."""
    import copy

    cfg = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12)
    t = CogVideoXTransformer3D(cfg)
    p = t.init(jax.random.PRNGKey(0))
    ref = quantize_transformer_int8(copy.deepcopy(p))
    got = quantize_transformer_int8(p, free_source=True)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "kernel" not in p["blocks"]["attn1"]["to_q"]
    assert "kernel" not in p["blocks"]["ff"]["proj_in"]


def test_quantize_after_fuse_qkv():
    """int8 composes with fuse_qkv_projections (the fused [D,3D] kernel is in
    the quantizable set) and stays close to the unfused fp32 forward."""
    from videopainter_tpu.ops.attention import fuse_qkv_projections

    cfg = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12)
    t = CogVideoXTransformer3D(cfg)
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 12, 16))
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    ts = jnp.zeros((1,), jnp.int32)
    ref = t.apply(params, x, emb, ts).sample

    q = quantize_transformer_int8(fuse_qkv_projections(params))
    assert "kernel_q" in q["blocks"]["attn1"]["to_qkv"]
    got = t.apply(q, x, emb, ts).sample
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    cos = (ref_n * got_n).sum() / (np.linalg.norm(ref_n) * np.linalg.norm(got_n))
    assert cos > 0.995, cos


def test_pipeline_int8_attention_quality():
    """End-to-end quality gate for use_flash="int8" (SageAttention-style
    int8-QK^T kernel, interpret mode on CPU): the full serving config is
    int8 projections + int8 attention, so gate their combination too."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch)
    from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintPipeline
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
    pipe = CogVideoXI2VDualInpaintPipeline(
        transformer, branch, vae,
        CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference()))

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 9, 64, 96, 3).astype(np.float32)) * 2 - 1
    masks = np.zeros((1, 9, 64, 96), np.float32)
    masks[:, :, 16:40, 24:64] = 1.0
    embeds = jnp.asarray(rng.rand(1, 5, 12).astype(np.float32))
    kw = dict(video=video, masks=jnp.asarray(masks), image=video[:, 0],
              prompt_embeds=embeds, negative_prompt_embeds=jnp.zeros_like(embeds),
              num_inference_steps=2, guidance_scale=6.0, replace_gt=True,
              mask_add=True, vae_sample_mode="mode", rng=jax.random.PRNGKey(7))
    ref = pipe(params, **kw)

    qparams = dict(params)
    qparams["transformer"] = quantize_transformer_int8(params["transformer"])
    qparams["branch"] = quantize_transformer_int8(params["branch"])
    with pltpu.force_tpu_interpret_mode():
        got = pipe(qparams, use_flash="int8", **kw)

    mse = float(np.square(np.asarray(got) / 2 - np.asarray(ref) / 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 25.0, f"int8+int8attn pipeline PSNR {psnr:.1f} dB"


def test_compact_params_bit_identical():
    """utils.compact_params re-materializes a mixed-dtype tree (int8 kernels +
    scales + bf16 leaves) through one jitted copy program without changing a
    bit, a dtype, or the tree structure (single-chip defrag pass; see
    utils/memory.py)."""
    from videopainter_tpu.utils import compact_params

    cfg = TransformerConfig.tiny()
    transformer = CogVideoXTransformer3D(cfg)
    params = {"transformer": quantize_transformer_int8(
        transformer.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)),
        "extra": jnp.arange(7, dtype=jnp.int32)}
    flat_before = jax.tree.leaves_with_path(params)

    out = compact_params(params)

    flat_after = jax.tree.leaves_with_path(out)
    assert [p for p, _ in flat_before] == [p for p, _ in flat_after]
    for (_, a), (_, b) in zip(flat_before, flat_after):
        assert a.dtype == b.dtype and a.shape == b.shape
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_linear_int8_static_ascale():
    """Static activation scale: same answer as dynamic when the scale equals
    the per-token max scale; no per-token reduce in the graph."""
    rng = np.random.RandomState(3)
    p = {"kernel": jnp.asarray(rng.randn(64, 48).astype(np.float32)) * 0.05,
         "bias": jnp.asarray(rng.randn(48).astype(np.float32)) * 0.01}
    x = jnp.asarray(rng.randn(7, 64).astype(np.float32))
    q = quantize_linear_int8(p)
    ref = linear(p, x)
    # an ample static scale (covers all tokens' amax) stays close to f32
    amax = float(np.abs(np.asarray(x)).max())
    qs = dict(q, ascale=jnp.float32(amax / 127.0))
    got = linear(qs, x)
    err = np.abs(np.asarray(got - ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert err < 0.03, err
    # a too-small scale CLIPS outliers (graceful, not catastrophic)
    qs_small = dict(q, ascale=jnp.float32(amax / 127.0 / 4.0))
    got_small = np.asarray(linear(qs_small, x))
    assert np.isfinite(got_small).all()


def test_attach_static_ascale_tree():
    from videopainter_tpu.quantize import attach_static_ascale

    cfg = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12)
    model = CogVideoXTransformer3D(cfg)
    params = quantize_transformer_int8(model.init(jax.random.PRNGKey(0)))
    L = cfg.num_layers
    uni = attach_static_ascale(params, 0.05)
    blk = uni["blocks"]
    # every quantized block linear got a stacked [L] scale
    found = []

    def walk(t, path=""):
        for k, v in t.items():
            if isinstance(v, dict):
                if "kernel_q" in v:
                    assert "ascale" in v, path + k
                    assert v["ascale"].shape == (L,)
                    found.append(k)
                else:
                    walk(v, path + k + ".")
    walk(blk)
    assert found, "no quantized linears found"
    # per-site dict: only named sites get scales
    per_site = attach_static_ascale(params, {"to_q": np.full((L,), 0.1)})

    def walk2(t):
        for k, v in t.items():
            if isinstance(v, dict):
                if "kernel_q" in v:
                    assert ("ascale" in v) == (k == "to_q"), k
                else:
                    walk2(v)
    walk2(per_site["blocks"])
    # model forward runs with static scales and stays close to dynamic int8
    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 8, 12, 16),
                    jnp.float32)
    e = jnp.zeros((1, 5, cfg.text_embed_dim), jnp.float32)
    t = jnp.array([5])
    dyn = model.apply(params, x, e, t).sample
    # calibrate the uniform scale from the dynamic run's input magnitude
    sta = model.apply(attach_static_ascale(params, 0.2), x, e, t).sample
    rel = float(jnp.abs(sta - dyn).mean() / (jnp.abs(dyn).mean() + 1e-9))
    assert np.isfinite(np.asarray(sta)).all()
    assert rel < 0.5, rel  # ballpark sanity; real scales come from calibration


def test_calibrate_ascales_end_to_end():
    """Offline calibration: tap records per-layer per-site amax through the
    int8 serving numerics; attached static scales reproduce the dynamic int8
    forward closely on the calibration distribution."""
    from videopainter_tpu.quantize import (attach_static_ascale,
                                           calibrate_ascales)

    cfg = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12)
    model = CogVideoXTransformer3D(cfg)
    params = quantize_transformer_int8(model.init(jax.random.PRNGKey(0)))
    L = cfg.num_layers

    rng = np.random.RandomState(7)
    def mk(t):
        x = jnp.asarray(rng.randn(1, 2, 8, 12, 16), jnp.float32)
        e = jnp.asarray(rng.randn(1, 5, cfg.text_embed_dim), jnp.float32)
        return (x, e, jnp.array([t])), {}

    samples = [mk(999), mk(500), mk(20)]
    scales = calibrate_ascales(model, params, samples)
    assert set(scales) == {"to_q", "to_k", "to_v", "to_out",
                           "proj_in", "proj_out"}
    for v in scales.values():
        assert v.shape == (L,) and (v > 0).all()
    # q/k/v read the same normed input -> identical calibrated scales
    np.testing.assert_allclose(scales["to_q"], scales["to_k"])
    np.testing.assert_allclose(scales["to_q"], scales["to_v"])

    # static forward tracks dynamic int8 on a calibration-like input
    (x, e, t), _ = mk(500)
    dyn = model.apply(params, x, e, t).sample
    sta = model.apply(attach_static_ascale(params, scales), x, e, t).sample
    rel = float(jnp.abs(sta - dyn).mean() / (jnp.abs(dyn).mean() + 1e-9))
    assert rel < 0.15, rel
    # margin>1 only loosens scales; still finite/close
    sta2 = model.apply(
        attach_static_ascale(params, calibrate_ascales(model, params, samples,
                                                       margin=1.25)),
        x, e, t).sample
    assert np.isfinite(np.asarray(sta2)).all()


def test_calibrate_ascales_branch_and_guards():
    from videopainter_tpu.config import BranchConfig
    from videopainter_tpu.models import CogVideoXBranch
    from videopainter_tpu.quantize import attach_static_ascale, calibrate_ascales

    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    tp = transformer.init(jax.random.PRNGKey(0))
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    bp = quantize_transformer_int8(
        branch.init_from_transformer(jax.random.PRNGKey(1), tp, cfg))

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 2, 8, 12, 16), jnp.float32)     # noisy latent
    cond = jnp.asarray(rng.randn(1, 2, 8, 12, 17), jnp.float32)  # masked ‖ mask
    e = jnp.asarray(rng.randn(1, 5, cfg.text_embed_dim), jnp.float32)
    t = jnp.array([400])
    scales = calibrate_ascales(branch, bp, [((x, e, cond, t), {})])
    assert scales["to_q"].shape == (2,)
    out = branch.apply(attach_static_ascale(bp, scales), x, e, cond, t)
    assert np.isfinite(np.asarray(out)).all()

    # guards: calibrate on unquantized params fails loudly
    import pytest
    x32 = jnp.concatenate([x, x], axis=-1)  # transformer takes 32 channels
    with pytest.raises(ValueError):
        transformer.apply(tp, x32, e, t, calibrate=True)
    # variant paths are rejected under calibrate
    qtp = quantize_transformer_int8(tp)
    with pytest.raises(ValueError):
        transformer.apply(qtp, x32, e, t, calibrate=True,
                          return_hidden_states=True)


def test_int8_linear_ste_gradients():
    """The int8 linear is differentiable via a straight-through estimator:
    grads wrt the input match grads through the dequantized-weight linear
    (the QLoRA-style frozen-backbone recipe). Plain autodiff through round()
    would give ~zero gradients."""
    rng = np.random.RandomState(0)
    p = {"kernel": jnp.asarray(rng.randn(32, 24).astype(np.float32)) * 0.05,
         "bias": jnp.asarray(rng.randn(24).astype(np.float32)) * 0.01}
    q = quantize_linear_int8(p)
    w_deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["kscale"])
    x = jnp.asarray(rng.randn(5, 32).astype(np.float32))
    co = jnp.asarray(rng.randn(5, 24).astype(np.float32))

    dx = jax.grad(lambda x: jnp.sum(linear(q, x) * co))(x)
    dx_ref = co @ w_deq.T  # exact STE target
    np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=2e-2, atol=1e-3)
    assert float(jnp.abs(dx).max()) > 0.01  # NOT the silent-zero-grad failure

    # static-ascale path is differentiable the same way
    qs = dict(q, ascale=jnp.float32(0.05))
    dxs = jax.grad(lambda x: jnp.sum(linear(qs, x) * co))(x)
    np.testing.assert_allclose(np.asarray(dxs), dx_ref, rtol=2e-2, atol=1e-3)


def test_int8_frozen_backbone_train_step():
    """QLoRA-style training: branch-SFT step with the FROZEN transformer in
    int8 — gradients flow through the quantized backbone into the branch
    (this is what lets the 42L backbone fit one chip during training)."""
    from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                         VAEConfig)
    from videopainter_tpu.models import (AutoencoderKLCogVideoX,
                                         CogVideoXBranch)
    from videopainter_tpu.schedulers import CogVideoXDDIMScheduler
    from videopainter_tpu.training import (BranchTrainConfig,
                                           init_branch_train_state,
                                           make_branch_train_step,
                                           make_optimizer)

    cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(BranchConfig.from_transformer(cfg, num_layers=2))
    vae = AutoencoderKLCogVideoX(VAEConfig.tiny(latent_channels=16))
    sched = CogVideoXDDIMScheduler(SchedulerConfig(prediction_type="v_prediction"))
    tp = transformer.init(jax.random.PRNGKey(0))
    bp = branch.init_from_transformer(jax.random.PRNGKey(1), tp, cfg)
    vp = vae.init(jax.random.PRNGKey(2))

    tcfg = BranchTrainConfig(height=32, width=48, mask_add=True, remat=True)
    opt = make_optimizer(lr=1e-4)
    step = make_branch_train_step(transformer, branch, vae, sched, opt, tcfg)

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.rand(1, 5, 32, 48, 3), jnp.float32) * 2 - 1,
        "conditioning_pixel_values": jnp.asarray(
            rng.rand(1, 5, 32, 48, 3), jnp.float32) * 2 - 1,
        "masks": jnp.asarray((rng.rand(1, 5, 32, 48) > 0.75), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.rand(1, 5, 12), jnp.float32),
    }

    frozen_q = {"transformer": quantize_transformer_int8(tp), "vae": vp}
    state = init_branch_train_state(bp, opt)
    state, metrics = step(state, frozen_q, batch, jax.random.PRNGKey(3))
    gnorm = float(metrics["gradient_norm_before_clip"])
    assert np.isfinite(float(metrics["total_loss"]))
    assert gnorm > 1e-4, f"int8 backbone blocked gradients (norm={gnorm})"

    # grads through the int8 backbone track the full-precision grads
    frozen = {"transformer": tp, "vae": vp}
    state2 = init_branch_train_state(bp, opt)
    state2, metrics2 = step(state2, frozen, batch, jax.random.PRNGKey(3))
    g1, g2 = gnorm, float(metrics2["gradient_norm_before_clip"])
    assert abs(g1 - g2) / max(g2, 1e-9) < 0.25, (g1, g2)

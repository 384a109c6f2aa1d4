"""Training subsystem tests: masks, train steps, LoRA, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import (BranchConfig, SchedulerConfig,
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                     CogVideoXTransformer3D)
from videopainter_tpu.models.lora import (convert_peft_lora_state_dict,
                                          export_peft_lora_state_dict,
                                          init_lora_params, merge_lora)
from videopainter_tpu.schedulers import CogVideoXDDIMScheduler
from videopainter_tpu.training import (BranchTrainConfig, init_branch_train_state,
                                       make_branch_train_step, make_optimizer)
from videopainter_tpu.training.checkpoint import (latest_checkpoint,
                                                  restore_checkpoint,
                                                  rotate_checkpoints,
                                                  save_checkpoint)
from videopainter_tpu.training.masks import (MaskTransformConfig,
                                             transform_video_masks)
from videopainter_tpu.training.train_branch import make_lora_train_step

DIT_CFG = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
DIT_CFG_RS = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                    sample_height=8, sample_width=12,
                                    id_pool_resample_learnable=True)
BR_CFG = BranchConfig.from_transformer(DIT_CFG, num_layers=2)
VAE_CFG = VAEConfig.tiny(latent_channels=16)


def test_mask_transforms_all_families():
    vm = np.zeros((4, 96, 128), np.uint8)
    vm[:, 30:70, 40:90] = 1
    rng = np.random.default_rng(0)
    for fam in ["brush", "rect", "ellipse", "circle", "random_brush"]:
        cfg = MaskTransformConfig(**{f"p_{f}": (1.0 if f == fam else 0.0)
                                     for f in ["brush", "rect", "ellipse",
                                               "circle", "random_brush"]},
                                  brush_width_range=(16, 32))
        out = transform_video_masks(vm, cfg, rng)
        assert out.shape == vm.shape and out.dtype == vm.dtype
        assert set(np.unique(out)).issubset({0, 1})
        # static families are constant across frames
        if fam != "brush":
            assert (out[0] == out[-1]).all()


def test_data_reshape_flip_idtoken():
    """Reference long-tail data flags: --video_reshape_mode center/random
    crops (masks follow the window), --random_flip flips video+masks
    together, --id_token prepends to prompts."""
    from videopainter_tpu.training.data import (DataConfig, InpaintingCollator,
                                                reshape_video)

    rng = np.random.default_rng(0)
    video = (np.arange(2 * 32 * 48 * 3) % 255).reshape(2, 32, 48, 3).astype(np.uint8)
    masks = np.zeros((2, 32, 48), np.uint8)
    masks[:, 8:16, 12:24] = 1
    for mode in ["resize", "center", "random"]:
        v, m = reshape_video(video, masks, 16, 16, mode, rng)
        assert v.shape == (2, 16, 16, 3) and m.shape == (2, 16, 16), mode
    # center crop preserves pixel values (no interpolation on the crop axis)
    v, m = reshape_video(video, masks, 24, 36, "center", rng)
    assert v.shape == (2, 24, 36, 3)

    cfg = DataConfig(height=32, width=48, max_num_frames=5, random_flip=True,
                     id_token="TOK", mask_transform_prob=0.0,
                     first_frame_gt=False, seed=0)
    coll = InpaintingCollator(cfg)
    # force the flip branch deterministically by trying until it happens
    flipped = False
    sample = {"video": video[:2], "masks": masks[:2], "caption": "a cat"}
    for _ in range(20):
        out = coll([sample])
        assert out["prompts"][0].startswith("TOK ")
        v01 = (out["pixel_values"][0] + 1) * 127.5
        if not np.allclose(v01[0], video[0].astype(np.float32), atol=0.6):
            # flipped: must equal the horizontally mirrored source
            np.testing.assert_allclose(v01[0], video[0, :, ::-1].astype(np.float32),
                                       atol=0.6)
            np.testing.assert_array_equal(out["masks"][0, 0] > 0.5,
                                          masks[0, :, ::-1] > 0)
            flipped = True
            break
    assert flipped, "random_flip never triggered in 20 draws (p=0.5 each)"


def test_mask_transform_empty_mask_passthrough():
    vm = np.zeros((2, 64, 64), np.uint8)
    cfg = MaskTransformConfig(p_brush=0, p_rect=1, p_ellipse=0, p_circle=0,
                              p_random_brush=0)
    out = transform_video_masks(vm, cfg, np.random.default_rng(0))
    np.testing.assert_array_equal(out, vm)


@pytest.fixture(scope="module")
def tiny_stack():
    transformer = CogVideoXTransformer3D(DIT_CFG)
    branch = CogVideoXBranch(BR_CFG)
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    tp = transformer.init(jax.random.PRNGKey(0))
    bp = branch.init_from_transformer(jax.random.PRNGKey(1), tp, DIT_CFG)
    vp = vae.init(jax.random.PRNGKey(2))
    sched = CogVideoXDDIMScheduler(SchedulerConfig(prediction_type="v_prediction"))
    return transformer, branch, vae, sched, tp, bp, vp


def make_batch(b=1, t=9):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(rng.rand(b, t, 64, 96, 3), jnp.float32) * 2 - 1,
        "conditioning_pixel_values": jnp.asarray(rng.rand(b, t, 64, 96, 3),
                                                 jnp.float32) * 2 - 1,
        "masks": (jnp.asarray(rng.rand(b, t, 64, 96), jnp.float32) > 0.5)
        .astype(jnp.float32),
        "prompt_embeds": jnp.asarray(rng.rand(b, 5, 12), jnp.float32),
    }


def test_make_optimizer_reference_surface():
    """make_optimizer mirrors the reference get_optimizer choices
    (train_...video.py:1236-1314: adam/adamw/prodigy; adafactor is the TPU
    analog of --use_8bit_adam): every mode produces finite param movement,
    and adafactor's state is genuinely smaller (factored second moment)."""
    params = {"w": jnp.ones((64, 32)), "b": jnp.zeros((32,))}
    grads = {"w": jnp.full((64, 32), 0.1), "b": jnp.full((32,), -0.2)}
    sizes = {}
    for name in ["adam", "adamw", "prodigy", "adafactor"]:
        opt = make_optimizer(lr=1e-2, optimizer=name)
        st = opt.init(params)
        upd, st = opt.update(grads, st, params)
        new = jax.tree.map(lambda p, u: p + u, params, upd)
        moved = float(sum(jnp.abs(n - p).sum()
                          for n, p in zip(jax.tree.leaves(new),
                                          jax.tree.leaves(params))))
        assert np.isfinite(moved), name
        if name != "prodigy":  # prodigy's first step is lr-discovery
            assert moved > 0, name
        sizes[name] = sum(l.size for l in jax.tree.leaves(st)
                          if hasattr(l, "size"))
    # factored second moment + no first moment on matrices: ~half the state
    # on these tiny shapes (the flagship stacked [L,3072,...] leaves factor
    # far better)
    assert sizes["adafactor"] < 0.55 * sizes["adamw"], sizes
    with pytest.raises(ValueError):
        make_optimizer(optimizer="sgd-nope")


def test_branch_train_step_bf16_branch_adafactor(tiny_stack):
    """The single-chip 42L@49f training config: bf16 trainable branch (no
    fp32 master weights) under adafactor. One step must produce a finite
    loss and move the params (tools/smoke_chip_train.py --bf16-branch
    --optimizer adafactor)."""
    transformer, branch, vae, sched, tp, _, vp = tiny_stack
    bp16 = branch.init_from_transformer(jax.random.PRNGKey(1), tp, DIT_CFG,
                                        dtype=jnp.bfloat16)
    # the dtype arg governs EVERY leaf, incl. the ones copied from the (here
    # fp32) backbone — a mixed tree would silently misreport master-weight
    # memory
    bad = [jax.tree_util.keystr(p) for p, l in
           jax.tree_util.tree_flatten_with_path(bp16)[0]
           if l.dtype != jnp.bfloat16]
    assert not bad, bad
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False)
    optimizer = make_optimizer(lr=1e-3, optimizer="adafactor")
    state = init_branch_train_state(bp16, optimizer)
    # snapshot BEFORE the step: the self-jitting step DONATES its state
    before = jax.tree.map(lambda x: np.asarray(x, np.float32),
                          state.trainable)
    step = make_branch_train_step(transformer, branch, vae, sched,
                                  optimizer, cfg)
    state1, m1 = step(state, {"transformer": tp, "vae": vp}, make_batch(),
                      jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["total_loss"]))
    assert state1.trainable["patch_embed"]["proj"]["kernel"].dtype == jnp.bfloat16
    delta = jax.tree.reduce(
        lambda a, x: a + float(np.abs(x).sum()),
        jax.tree.map(lambda a, b: np.asarray(a, np.float32) - b,
                     state1.trainable, before), 0.0)
    assert delta > 0


def test_branch_params_never_alias_backbone(tiny_stack):
    """init_from_transformer must COPY every leaf it takes from the backbone:
    the branch tree is donated into the train step (donate_argnums) while the
    backbone rides along frozen — a shared buffer is the `f(donate(a), a)`
    runtime error. Covers the trivial-slice case (branch depth == backbone
    depth) where x[:L] returns the same buffer."""
    _, _, _, _, tp, bp, _ = tiny_stack
    tp_ptrs = {leaf.unsafe_buffer_pointer()
               for leaf in jax.tree.leaves(tp)
               if hasattr(leaf, "unsafe_buffer_pointer")}
    for path, leaf in jax.tree_util.tree_flatten_with_path(bp)[0]:
        if not hasattr(leaf, "unsafe_buffer_pointer"):
            continue
        assert leaf.unsafe_buffer_pointer() not in tp_ptrs, \
            f"branch leaf aliases backbone buffer: {jax.tree_util.keystr(path)}"


def test_branch_train_step_learns(tiny_stack):
    transformer, branch, vae, sched, tp, bp, vp = tiny_stack
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False)
    optimizer = make_optimizer(lr=1e-3)
    state = init_branch_train_state(bp, optimizer)
    step = jax.jit(make_branch_train_step(transformer, branch, vae, sched,
                                          optimizer, cfg))
    frozen = {"transformer": tp, "vae": vp}
    batch = make_batch()
    state1, m1 = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["total_loss"]))
    assert float(m1["gradient_norm_before_clip"]) > 0
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, state1.trainable, state.trainable), 0.0)
    assert delta > 0
    # frozen zero-init branch projections receive gradient (they gate the output)
    g = float(jnp.abs(state1.trainable["branch_blocks"]["kernel"]).max())
    assert g > 0


def test_lora_train_step(tiny_stack):
    transformer_rs = CogVideoXTransformer3D(DIT_CFG_RS)
    _, branch, vae, sched, tp, bp, vp = tiny_stack
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False,
                            lora_rank=4, lora_alpha=2.0)
    lora = init_lora_params(jax.random.PRNGKey(3), tp, rank=4)
    optimizer = make_optimizer(lr=1e-3)
    state = init_branch_train_state(lora, optimizer)
    step = jax.jit(make_lora_train_step(transformer_rs, branch, vae, sched,
                                        optimizer, cfg))
    frozen = {"transformer": tp, "vae": vp, "branch": bp}
    state1, m = step(state, frozen, make_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["total_loss"]))
    # B matrices start at zero; gradients flow into them
    assert float(jnp.abs(state1.trainable["to_q"]["lora_B"]).max()) > 0


def test_lora_merge_and_interop():
    tp = CogVideoXTransformer3D(DIT_CFG).init(jax.random.PRNGKey(0))
    lora = init_lora_params(jax.random.PRNGKey(1), tp, rank=4)
    lora = jax.tree.map(lambda x: jnp.asarray(np.random.RandomState(0)
                                              .randn(*x.shape), x.dtype) * 0.1, lora)
    merged = merge_lora(tp, lora, alpha=2.0, rank=4)
    dq = merged["blocks"]["attn1"]["to_q"]["kernel"] - tp["blocks"]["attn1"]["to_q"]["kernel"]
    expect = jnp.einsum("lir,lro->lio", lora["to_q"]["lora_A"],
                        lora["to_q"]["lora_B"]) * (2.0 / 4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(expect), rtol=1e-5, atol=1e-6)
    # peft round-trip
    sd = export_peft_lora_state_dict(lora)
    back = convert_peft_lora_state_dict(sd, num_layers=2, rank=4)
    for tgt in lora:
        np.testing.assert_allclose(np.asarray(lora[tgt]["lora_A"]),
                                   back[tgt]["lora_A"], rtol=1e-6, atol=1e-7)


def test_precomputed_latents_bit_identical(tiny_stack):
    """The precomputed-latents fast path (posterior moments in the batch)
    must reproduce the inline-encode step's loss with the same rng — the
    moments ARE the encode output; only the sampling site moves."""
    from videopainter_tpu.training import encode_batch_latent_moments

    transformer, branch, vae, sched, tp, bp, vp = tiny_stack
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False)
    optimizer = make_optimizer(lr=1e-3)
    frozen = {"transformer": tp, "vae": vp}
    batch = make_batch()
    step = make_branch_train_step(transformer, branch, vae, sched, optimizer,
                                  cfg)
    s0 = init_branch_train_state(bp, optimizer)
    _, m_inline = step(s0, frozen, batch, jax.random.PRNGKey(0))
    pre = encode_batch_latent_moments(vae, vp, batch)
    assert "video_latent_mean" in pre and "cond_latent_logvar" in pre
    s1 = init_branch_train_state(bp, optimizer)
    _, m_pre = step(s1, frozen, pre, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_pre["total_loss"]),
                               float(m_inline["total_loss"]),
                               rtol=1e-6, atol=1e-7)


def test_lora_attach_matches_merge():
    """Additive LoRA (attach_lora -> ops.basic.linear delta) computes the
    same forward as folding W + (alpha/r)A@B into the kernels."""
    from videopainter_tpu.models.lora import attach_lora

    transformer = CogVideoXTransformer3D(DIT_CFG)
    tp = transformer.init(jax.random.PRNGKey(0))
    lora = init_lora_params(jax.random.PRNGKey(1), tp, rank=4)
    lora = jax.tree.map(lambda x: jnp.asarray(np.random.RandomState(1)
                                              .randn(*x.shape), x.dtype) * 0.05,
                        lora)
    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.rand(1, 3, 8, 12, 32), jnp.float32) * 2 - 1
    enc = jnp.asarray(rng.rand(1, 5, 12), jnp.float32)
    t = jnp.asarray([7])
    out_m = transformer.apply(merge_lora(tp, lora, alpha=2.0, rank=4),
                              h, enc, t).sample
    out_a = transformer.apply(attach_lora(tp, lora, alpha=2.0, rank=4),
                              h, enc, t).sample
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_m),
                               rtol=2e-4, atol=2e-5)


def test_lora_train_step_int8_backbone(tiny_stack):
    """QLoRA config: FROZEN int8 backbone + trainable LoRA — gradients reach
    A/B through the int8 linears' STE and the additive delta."""
    from videopainter_tpu.quantize import quantize_transformer_int8

    transformer_rs = CogVideoXTransformer3D(DIT_CFG_RS)
    _, branch, vae, sched, tp, bp, vp = tiny_stack
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False,
                            lora_rank=4, lora_alpha=2.0)
    lora = init_lora_params(jax.random.PRNGKey(3), tp, rank=4)
    optimizer = make_optimizer(lr=1e-3)
    state = init_branch_train_state(lora, optimizer)
    step = make_lora_train_step(transformer_rs, branch, vae, sched,
                                optimizer, cfg)
    frozen = {"transformer": quantize_transformer_int8(tp),
              "vae": vp, "branch": bp}
    state1, m = step(state, frozen, make_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["total_loss"]))
    assert float(m["gradient_norm_before_clip"]) > 0
    assert float(jnp.abs(state1.trainable["to_q"]["lora_B"]).max()) > 0


def test_int8_ste_convergence_matches_fp32(tiny_stack):
    """Convergence gate for the QLoRA-style chip config: training the branch
    through a FROZEN int8-STE backbone must follow the fp32 backbone's
    optimization — same overfit batch + same per-step keys, losses decrease
    in both runs and land close, and the branch-param updates point the same
    way (cosine similarity of the deltas)."""
    from videopainter_tpu.quantize import quantize_transformer_int8

    transformer, branch, vae, sched, tp, bp, vp = tiny_stack
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False)
    batch = make_batch()
    n_steps = 8

    def run(frozen_tf):
        optimizer = make_optimizer(lr=1e-3)
        state = init_branch_train_state(bp, optimizer)
        step = make_branch_train_step(transformer, branch, vae, sched,
                                      optimizer, cfg)
        frozen = {"transformer": frozen_tf, "vae": vp}
        losses = []
        for i in range(n_steps):
            # fixed key = fixed (noise, timestep): pure overfit descent
            state, m = step(state, frozen, batch, jax.random.PRNGKey(7))
            losses.append(float(m["total_loss"]))
        delta = jax.tree.map(lambda a, b: np.asarray(a - b).ravel(),
                             state.trainable, bp)
        return losses, np.concatenate(jax.tree.leaves(delta))

    losses_fp32, d_fp32 = run(tp)
    losses_int8, d_int8 = run(quantize_transformer_int8(tp))
    # both overfit runs descend
    assert losses_fp32[-1] < losses_fp32[0], losses_fp32
    assert losses_int8[-1] < losses_int8[0], losses_int8
    # final losses agree within the quantization error budget
    rel = abs(losses_int8[-1] - losses_fp32[-1]) / abs(losses_fp32[-1])
    assert rel < 0.1, (losses_fp32[-1], losses_int8[-1])
    # the STE gradients drive the SAME parameter update direction
    cos = float(np.dot(d_fp32, d_int8) /
                (np.linalg.norm(d_fp32) * np.linalg.norm(d_int8) + 1e-12))
    assert cos > 0.9, cos


def test_checkpoint_save_rotate_resume(tmp_path):
    state = {"step": np.asarray(3), "w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    d = str(tmp_path)
    for s in [100, 200, 300]:
        save_checkpoint(d, s, {**state, "step": np.asarray(s)}, total_limit=2)
    names = sorted(os.listdir(d))
    assert "checkpoint-100" not in names and "checkpoint-300" in names
    latest = latest_checkpoint(d)
    assert latest.endswith("checkpoint-300")
    restored = restore_checkpoint(latest)
    assert int(restored["step"]) == 300
    np.testing.assert_allclose(restored["w"], state["w"])


def test_hf_export_roundtrip(tiny_stack):
    """export_branch_pretrained -> convert back -> identical params."""
    from videopainter_tpu.convert import (convert_branch_state_dict,
                                          load_safetensors_dir)
    from videopainter_tpu.training.checkpoint import export_branch_pretrained

    *_, bp, _ = tiny_stack
    import tempfile

    bp = jax.tree.map(
        lambda x: jnp.asarray(np.random.RandomState(1).randn(*x.shape), x.dtype) * 0.1,
        bp)
    with tempfile.TemporaryDirectory() as d:
        export_branch_pretrained(bp, BR_CFG.to_dict(), d)
        sd = load_safetensors_dir(d)
        back = convert_branch_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(bp)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        if "pos_embedding" in str(path):
            continue
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   rtol=1e-6, atol=1e-7, err_msg=str(path))


def test_trainer_loop_with_mesh(tiny_stack, tmp_path):
    """train(mesh=...) runs the DP/ZeRO-2 path end-to-end: batches shard over
    `data`, stacked optimizer moments shard their layer axis, and the loop
    produces finite losses (the reference's accelerate+DeepSpeed stage-2
    setup, accelerate_config_machine_single_ds.yaml:3-11, as GSPMD)."""
    from videopainter_tpu.parallel import make_mesh
    from videopainter_tpu.training.trainer import TrainerConfig, train

    transformer, branch, vae, sched, tp, bp, vp = tiny_stack
    mesh = make_mesh(data=2, seq=1, model=1, devices=jax.devices()[:2])
    cfg = BranchTrainConfig(height=64, width=96, mask_add=True, remat=False)
    tcfg = TrainerConfig(output_dir=str(tmp_path), max_train_steps=2,
                         learning_rate=1e-3, checkpointing_steps=100,
                         validating_steps=100, resume_from_checkpoint=None,
                         log_every=1)

    def batches():
        while True:
            yield make_batch(b=2)

    state = train(transformer, branch, vae, sched,
                  {"transformer": tp, "vae": vp}, batches(), tcfg, cfg,
                  initial_trainable=bp, mesh=mesh)
    assert int(np.asarray(state.step)) == 2
    # ZeRO-2 analog: stacked moment leaves stay sharded over `data` through
    # the jitted step (GSPMD output propagation keeps the input placement)
    n_sharded = sum(1 for leaf in jax.tree.leaves(state.opt_state)
                    if hasattr(leaf, "sharding")
                    and "data" in str(leaf.sharding.spec))
    assert n_sharded > 0, "no optimizer moment leaf sharded over data"


def test_remat_chunk_train_step_tp_sharded_matches():
    """remat_chunk's per-layer dynamic param gather (models/dit.py) must
    compose with TP-sharded stacked params: the sharded grouped-remat train
    loss equals the unsharded flat-remat loss. Non-divisible depth (5 with
    chunk 2) exercises the remainder group under GSPMD."""
    from videopainter_tpu.parallel import make_mesh
    from videopainter_tpu.parallel.inference import shard_inference_params

    cfg = TransformerConfig.tiny(num_attention_heads=4, attention_head_dim=16,
                                 in_channels=32, out_channels=16,
                                 num_layers=5, sample_height=8,
                                 sample_width=12)
    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)
    vae = AutoencoderKLCogVideoX(VAE_CFG)
    sched = CogVideoXDDIMScheduler(SchedulerConfig(prediction_type="v_prediction"))
    tp = transformer.init(jax.random.PRNGKey(0))
    bp = branch.init_from_transformer(jax.random.PRNGKey(1), tp, cfg)
    vp = vae.init(jax.random.PRNGKey(2))
    optimizer = make_optimizer(lr=1e-3)
    batch = make_batch()

    def run(frozen_tp, frozen_vp, trainable, rc, mesh=None):
        tcfg = BranchTrainConfig(height=64, width=96, mask_add=True,
                                 remat=True, remat_chunk=rc)
        step = make_branch_train_step(transformer, branch, vae, sched,
                                      optimizer, tcfg)
        state = init_branch_train_state(jax.tree.map(jnp.copy, trainable),
                                        optimizer)
        frozen = {"transformer": frozen_tp, "vae": frozen_vp}
        if mesh is None:
            _, m = step(state, frozen, batch, jax.random.PRNGKey(7))
        else:
            with mesh:
                _, m = step(state, frozen, batch, jax.random.PRNGKey(7))
        return float(m["total_loss"])

    ref = run(tp, vp, bp, None)

    mesh = make_mesh(data=1, seq=1, model=2, devices=jax.devices()[:2])
    sharded = shard_inference_params(
        {"transformer": tp, "vae": vp, "branch": bp}, mesh)
    got = run(sharded["transformer"], sharded["vae"], sharded["branch"], 2,
              mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-5)

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

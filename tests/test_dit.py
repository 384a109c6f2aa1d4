"""DiT backbone + branch parity tests vs reference goldens (tests/goldens/dit.npz).

The goldens carry torch state dicts + io pairs for a tiny config; we convert
the state dicts with videopainter_tpu.convert and must match outputs to fp32
tolerance. This tests model math AND the weight converter together.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.config import BranchConfig, TransformerConfig
from videopainter_tpu.convert import convert_branch_state_dict, convert_transformer_state_dict
from videopainter_tpu.models import CogVideoXBranch, CogVideoXTransformer3D
from videopainter_tpu.ops import get_3d_rotary_pos_embed

TINY = TransformerConfig.tiny()
TINY_RS = TransformerConfig.tiny(id_pool_resample_learnable=True)
TOL = dict(rtol=2e-4, atol=2e-5)


def extract_sd(g, name):
    pre = f"sd::{name}::"
    return {k[len(pre):]: g[k] for k in g.files if k.startswith(pre)}


def to_bthwc(x):  # [B,T,C,H,W] -> [B,T,H,W,C]
    return np.transpose(x, (0, 1, 3, 4, 2))


def from_bthwc(x):
    return np.transpose(np.asarray(x), (0, 1, 4, 2, 3))


@pytest.fixture(scope="module")
def env(goldens):
    g = goldens("dit")
    params = convert_transformer_state_dict(extract_sd(g, "transformer"))
    model = CogVideoXTransformer3D(TINY)
    hidden = jnp.asarray(to_bthwc(g["io::base::hidden"]))
    text = jnp.asarray(g["io::base::text"])
    timestep = jnp.asarray(g["io::base::timestep"])
    rope = (jnp.asarray(g["io::rope::cos"]), jnp.asarray(g["io::rope::sin"]))
    return g, model, params, hidden, text, timestep, rope


def test_rope_table(goldens):
    g = goldens("dit")
    cos, sin = get_3d_rotary_pos_embed(16, ((0, 0), (2, 4)), (2, 4), 3)
    np.testing.assert_allclose(cos, g["io::rope::cos"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sin, g["io::rope::sin"], rtol=1e-6, atol=1e-6)


def test_base_forward(env):
    g, model, params, hidden, text, timestep, rope = env
    out = model.apply(params, hidden, text, timestep, rope=rope)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::base::out"], **TOL)


def test_return_hidden_states(env):
    g, model, params, hidden, text, timestep, rope = env
    out = model.apply(params, hidden, text, timestep, rope=rope, return_hidden_states=True)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::base_hs::out"], **TOL)
    np.testing.assert_allclose(np.asarray(out.hidden_states_list), g["io::base_hs::hs"], **TOL)


def test_branch_injection(env):
    g, model, params, hidden, text, timestep, rope = env
    bs = jnp.asarray(g["io::branch_samples"])
    out = model.apply(params, hidden, text, timestep, rope=rope, branch_block_samples=bs)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::branch::out"], **TOL)


def test_branch_injection_masked(env):
    g, model, params, hidden, text, timestep, rope = env
    bs = jnp.asarray(g["io::branch_samples"])
    masks = jnp.asarray(g["io::masks"][:, :, 0])  # [B,T,H,W]
    out = model.apply(params, hidden, text, timestep, rope=rope,
                      branch_block_samples=bs, branch_block_masks=masks)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::branch_masked::out"], **TOL)


def test_branch_injection_add_first(env):
    g, model, params, hidden, text, timestep, rope = env
    bs = jnp.asarray(g["io::branch_samples"][:1])
    out = model.apply(params, hidden, text, timestep, rope=rope,
                      branch_block_samples=bs, add_first=True)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::branch_addfirst::out"], **TOL)


def test_prev_clip_blending(env):
    g, model, params, hidden, text, timestep, rope = env
    prev = jnp.asarray(g["io::prev::prev_hs"])
    prev_stack = jnp.stack([prev, prev])
    out = model.apply(params, hidden, text, timestep, rope=rope,
                      prev_hidden_states=prev_stack, prev_clip_weight=0.3)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::prev::out"], **TOL)


def test_self_guidance_swap(env):
    g, model, params, hidden, text, timestep, rope = env
    sg = jnp.asarray(g["io::sg::hs"])
    masks = jnp.asarray(g["io::masks"][:, :, 0])
    out = model.apply(params, hidden, text, timestep, rope=rope,
                      self_guidance_hidden_states=sg, self_guidance_masks=masks)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::sg::out"], **TOL)


def test_resample_forward(env):
    g, _, params, hidden, text, timestep, rope = env
    model = CogVideoXTransformer3D(TINY_RS)
    masks = jnp.asarray(g["io::masks"][:, :, 0])
    out = model.apply(params, hidden, text, timestep, rope=rope,
                      branch_block_masks=masks, id_pool_resample=True,
                      return_hidden_states=True)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::resample::out"], **TOL)
    np.testing.assert_allclose(np.asarray(out.hidden_states_list), g["io::resample::hs"], **TOL)
    np.testing.assert_array_equal(np.asarray(out.resample_mask), g["io::resample::mask"].astype(bool))


def test_resample_prev_clip(env):
    g, _, params, hidden, text, timestep, rope = env
    model = CogVideoXTransformer3D(TINY_RS)
    masks = jnp.asarray(g["io::masks"][:, :, 0])
    prev = jnp.asarray(g["io::prev::prev_hs"])
    prev_stack = jnp.stack([prev, prev])
    prev_mask = jnp.asarray(g["io::resample_prev::prev_mask"])
    out = model.apply(params, hidden, text, timestep, rope=rope,
                      branch_block_masks=masks, id_pool_resample=True,
                      prev_hidden_states=prev_stack, prev_clip_weight=0.4,
                      prev_resample_mask=prev_mask)
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::resample_prev::out"], **TOL)


def test_2b_sincos_path(goldens):
    g = goldens("dit")
    cfg = TransformerConfig.tiny(use_rotary_positional_embeddings=False)
    params = convert_transformer_state_dict(extract_sd(g, "transformer2b"))
    assert "pos_embedding" not in params["patch_embed"]
    # non-persistent buffer: recompute the sincos table ourselves
    model = CogVideoXTransformer3D(cfg)
    params["patch_embed"]["pos_embedding"] = jnp.asarray(
        model._positional_embeddings(cfg.sample_height, cfg.sample_width, cfg.sample_frames))
    hidden = jnp.asarray(to_bthwc(g["io::base::hidden"]))
    out = model.apply(params, hidden, jnp.asarray(g["io::base::text"]),
                      jnp.asarray(g["io::base::timestep"]))
    np.testing.assert_allclose(from_bthwc(out.sample), g["io::base2b::out"], **TOL)


def test_branch_model(env):
    g, _, _, hidden, text, timestep, rope = env
    cfg = BranchConfig.from_transformer(TINY, num_layers=2)
    params = convert_branch_state_dict(extract_sd(g, "branch"))
    model = CogVideoXBranch(cfg)
    cond = jnp.asarray(to_bthwc(g["io::branchmodel::cond"]))
    out = model.apply(params, hidden, text, cond, timestep, rope=rope,
                      conditioning_scale=0.7)
    np.testing.assert_allclose(np.asarray(out), g["io::branchmodel::out"], **TOL)


def test_branch_model_wo_text(env):
    g, _, _, hidden, text, timestep, rope = env
    cfg = BranchConfig.from_transformer(TINY, num_layers=2, wo_text=True)
    params = convert_branch_state_dict(extract_sd(g, "branch_wo_text"))
    model = CogVideoXBranch(cfg)
    cond = jnp.asarray(to_bthwc(g["io::branchmodel::cond"]))
    out = model.apply(params, hidden, text, cond, timestep, rope=rope,
                      conditioning_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), g["io::branchmodel_wt::out"], **TOL)


def test_init_from_transformer_matches_reference(env):
    """Our init_from_transformer must produce the same widened patch embed as
    the reference from_transformer (branch_cogvideox.py:272-291)."""
    import jax

    g, _, bb_params, *_ = env
    ref_branch = convert_branch_state_dict(extract_sd(g, "branch"))
    cfg = BranchConfig.from_transformer(TINY, num_layers=2)
    model = CogVideoXBranch(cfg)
    params = model.init_from_transformer(jax.random.PRNGKey(0), bb_params, TINY)
    np.testing.assert_allclose(np.asarray(params["patch_embed"]["proj"]["kernel"]),
                               ref_branch["patch_embed"]["proj"]["kernel"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["blocks"]["attn1"]["to_q"]["kernel"]),
                               ref_branch["blocks"]["attn1"]["to_q"]["kernel"], rtol=1e-6, atol=1e-7)
    # zero-init projections
    assert float(jnp.abs(params["branch_blocks"]["kernel"]).max()) == 0.0


def test_transformer_fused_qkv_matches(env):
    """fuse_qkv_projections on the full stacked block tree is output-invariant."""
    from videopainter_tpu.ops.attention import fuse_qkv_projections

    g, model, params, hidden, text, timestep, rope = env
    ref = model.apply(params, hidden, text, timestep, rope=rope)
    out = model.apply(fuse_qkv_projections(params), hidden, text, timestep,
                      rope=rope)
    np.testing.assert_allclose(np.asarray(out.sample), np.asarray(ref.sample),
                               rtol=1e-5, atol=1e-5)


def test_resident_flash_variant_paths_match_exact(env):
    """dit.apply with use_flash now runs the resample / prev-resample /
    prev-clip / capture paths RESIDENT (joint sequence padded once to the
    flash block multiple, keys masked in-kernel) — each must match the exact
    unpadded SDPA path, captures and the returned resample_mask must stay
    true-length, and the compressed-indices scatter must build the padded
    buffer exactly."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.pipelines.common import capture_token_indices

    g, model, params, hidden, text, timestep, rope = env
    model_rs = CogVideoXTransformer3D(TINY_RS)
    masks = jnp.asarray(g["io::masks"][:, :, 0])
    prev = jnp.asarray(g["io::prev::prev_hs"])
    prev_stack = jnp.stack([prev, prev])
    prev_mask = jnp.asarray(g["io::resample_prev::prev_mask"])

    cases = [
        # (model, kwargs) — resample capture, resample+prev, prev-clip blend
        (model_rs, dict(branch_block_masks=masks, id_pool_resample=True,
                        return_hidden_states=True)),
        (model_rs, dict(branch_block_masks=masks, id_pool_resample=True,
                        prev_hidden_states=prev_stack, prev_clip_weight=0.4,
                        prev_resample_mask=prev_mask)),
        (model, dict(prev_hidden_states=prev_stack, prev_clip_weight=0.3)),
    ]
    for m, kw in cases:
        ref = m.apply(params, hidden, text, timestep, rope=rope, **kw)
        with pltpu.force_tpu_interpret_mode():
            out = m.apply(params, hidden, text, timestep, rope=rope,
                          use_flash=True, **kw)
        np.testing.assert_allclose(np.asarray(out.sample),
                                   np.asarray(ref.sample),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(kw.keys()))
        if ref.hidden_states_list is not None:
            assert (out.hidden_states_list.shape
                    == ref.hidden_states_list.shape)  # true-length captures
            np.testing.assert_allclose(np.asarray(out.hidden_states_list),
                                       np.asarray(ref.hidden_states_list),
                                       rtol=2e-4, atol=2e-4)
        if ref.resample_mask is not None:
            np.testing.assert_array_equal(np.asarray(out.resample_mask),
                                          np.asarray(ref.resample_mask))

    # compressed prev indices: the resident scatter builds the padded buffer
    s_joint = text.shape[1] + hidden.shape[1] * (hidden.shape[2] // 2) * (
        hidden.shape[3] // 2)
    ci = capture_token_indices(masks, 2, text_len=text.shape[1], bucket=4)
    take = jnp.take_along_axis(
        prev_stack, jnp.clip(ci, 0, s_joint - 1)[None, ..., None], axis=2)
    kw = dict(branch_block_masks=masks, id_pool_resample=True,
              prev_hidden_states=take, prev_clip_weight=0.4,
              prev_resample_mask=prev_mask, prev_hidden_indices=ci)
    ref = model_rs.apply(params, hidden, text, timestep, rope=rope, **kw)
    with pltpu.force_tpu_interpret_mode():
        out = model_rs.apply(params, hidden, text, timestep, rope=rope,
                             use_flash=True, **kw)
    np.testing.assert_allclose(np.asarray(out.sample), np.asarray(ref.sample),
                               rtol=2e-4, atol=2e-4)


def test_pos_embedding_prefix_crop_for_fewer_frames():
    """Shorter videos under the sincos/learned table: the reference
    RECOMPUTES the table for non-default dims (embeddings.py:440-449); with
    equal spatial dims and fewer frames that equals a prefix crop — the
    forward must match a model built with the smaller sample_frames, and a
    spatial mismatch must raise (embeddings.py:436-439)."""
    import pytest

    from videopainter_tpu.config import TransformerConfig
    from videopainter_tpu.models import CogVideoXTransformer3D

    big = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                 sample_height=8, sample_width=12,
                                 sample_frames=17,
                                 use_rotary_positional_embeddings=False)
    small = TransformerConfig.tiny(in_channels=16, out_channels=16,
                                   sample_height=8, sample_width=12,
                                   sample_frames=9,
                                   use_rotary_positional_embeddings=False)
    import jax

    mb = CogVideoXTransformer3D(big)
    ms = CogVideoXTransformer3D(small)
    pb = mb.init(jax.random.PRNGKey(0))
    ps = ms.init(jax.random.PRNGKey(0))
    # same weights everywhere except the table; small table is a prefix
    np.testing.assert_array_equal(
        np.asarray(pb["patch_embed"]["pos_embedding"][:, :ps["patch_embed"]
                   ["pos_embedding"].shape[1]]),
        np.asarray(ps["patch_embed"]["pos_embedding"]))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 3, 8, 12, 16), jnp.float32)  # 3 < 5 latent f
    e = jnp.asarray(rng.randn(1, big.max_text_seq_length, big.text_embed_dim),
                    jnp.float32)
    t = jnp.array([7])
    out_big = mb.apply(pb, x, e, t).sample
    out_small = ms.apply(ps, x, e, t).sample
    np.testing.assert_allclose(np.asarray(out_big), np.asarray(out_small),
                               rtol=1e-6, atol=1e-6)

    # spatial mismatch: loud error, not silent misalignment
    x_bad = jnp.asarray(rng.randn(1, 3, 4, 12, 16), jnp.float32)
    with pytest.raises(ValueError):
        mb.apply(pb, x_bad, e, t)


def test_remat_chunk_matches_flat_scan():
    """Two-level (sqrt) remat: grouping the layer scan into checkpointed
    chunks must not change the forward output or gradients — it only bounds
    the backward's carry residency (models/dit.py)."""
    import jax

    cfg = TransformerConfig.tiny(num_layers=4)
    model = CogVideoXTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.rand(1, 2, 4, 8, 16), jnp.float32)
    enc = jnp.asarray(rng.rand(1, 5, 12), jnp.float32)
    t = jnp.asarray([3])

    def loss(h, chunk):
        return jnp.sum(model.apply(params, h, enc, t, remat=True,
                                   remat_chunk=chunk).sample ** 2)

    v_flat, g_flat = jax.value_and_grad(lambda h: loss(h, None))(hidden)
    v_chunk, g_chunk = jax.value_and_grad(lambda h: loss(h, 2))(hidden)
    np.testing.assert_allclose(float(v_chunk), float(v_flat), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_flat),
                               rtol=1e-5, atol=1e-6)
    # non-divisible chunk: the LAST group is smaller (4 -> groups 3, 1);
    # value AND gradient must still match the flat scan exactly (an earlier
    # version silently fell back to the flat scan here — a quiet no-op)
    v_odd, g_odd = jax.value_and_grad(lambda h: loss(h, 3))(hidden)
    np.testing.assert_allclose(float(v_odd), float(v_flat), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_odd), np.asarray(g_flat),
                               rtol=1e-5, atol=1e-6)

"""SAM2 video predictor smoke test (tiny config, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.segmentation import SAM2Config, SAM2VideoPredictor
from videopainter_tpu.segmentation.hiera import HieraConfig, HieraImageEncoder
from videopainter_tpu.segmentation.modules import init_conv2d, init_linear, init_mlp


def tiny_params(key):
    """Random-init parameter tree for a tiny SAM2 (hand-assembled)."""
    cfg = SAM2Config(
        hiera=HieraConfig(embed_dim=8, num_heads=1, stages=(1, 1, 1, 1),
                          window_spec=(4, 2, 2, 2), global_att_blocks=(),
                          window_pos_embed_bkg_spatial_size=(4, 4),
                          d_model=32, scalp=1, q_pool=3),
        image_size=64, num_maskmem=3, mem_dim=16, hidden_dim=32,
        memory_attention_heads=2, mask_decoder_heads=2,
        max_obj_ptrs_in_encoder=4)
    ks = iter(jax.random.split(key, 256))
    d = 32
    enc = HieraImageEncoder(cfg.hiera)
    rngs = np.random.RandomState(0)
    rnd = lambda *shape: jnp.asarray(rngs.randn(*shape).astype(np.float32) * 0.05)

    def attention(din, dint):
        return {"q_proj": init_linear(next(ks), din, dint),
                "k_proj": init_linear(next(ks), din, dint),
                "v_proj": init_linear(next(ks), din, dint),
                "out_proj": init_linear(next(ks), dint, din)}

    def twoway_layer():
        return {"self_attn": attention(d, d),
                "norm1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "cross_attn_token_to_image": attention(d, d // 2),
                "norm2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "mlp": init_mlp(next(ks), d, 64, d, 2),
                "norm3": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "norm4": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "cross_attn_image_to_token": attention(d, d // 2)}

    def mem_layer():
        l = {"self_attn": attention(d, d),
             "cross_attn_image": {"q_proj": init_linear(next(ks), d, d),
                                  "k_proj": init_linear(next(ks), 16, d),
                                  "v_proj": init_linear(next(ks), 16, d),
                                  "out_proj": init_linear(next(ks), d, d)},
             "linear1": init_linear(next(ks), d, 64),
             "linear2": init_linear(next(ks), 64, d)}
        for n in ["norm1", "norm2", "norm3"]:
            l[n] = {"scale": jnp.ones(d), "bias": jnp.zeros(d)}
        return l

    params = {
        "image_encoder": enc.init(next(ks)),
        "prompt_encoder": {
            "pe_gauss": rnd(2, d // 2),
            "point_embeddings": rnd(4, d),
            "not_a_point_embed": rnd(d),
            "no_mask_embed": rnd(d),
            "mask_downscaling": {
                "conv1": init_conv2d(next(ks), 1, 2, 2),
                "ln1": {"scale": jnp.ones(2), "bias": jnp.zeros(2)},
                "conv2": init_conv2d(next(ks), 2, 8, 2),
                "ln2": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
                "conv3": init_conv2d(next(ks), 8, d, 1)}},
        "mask_decoder": {
            "iou_token": rnd(1, d), "mask_tokens": rnd(4, d),
            "obj_score_token": rnd(1, d),
            "transformer": {"layers": [twoway_layer() for _ in range(2)],
                            "final_attn": attention(d, d // 2),
                            "norm_final": {"scale": jnp.ones(d), "bias": jnp.zeros(d)}},
            "output_upscaling": {
                "convT1": {"kernel": rnd(2, 2, d // 4, d), "bias": jnp.zeros(d // 4)},
                "ln": {"scale": jnp.ones(d // 4), "bias": jnp.zeros(d // 4)},
                "convT2": {"kernel": rnd(2, 2, d // 8, d // 4), "bias": jnp.zeros(d // 8)}},
            "hypernet_mlps": [init_mlp(next(ks), d, d, d // 8, 3) for _ in range(4)],
            "iou_head": init_mlp(next(ks), d, d, 4, 3),
            "pred_obj_score_head": init_mlp(next(ks), d, d, 1, 3)},
        "memory_attention": {"layers": [mem_layer() for _ in range(2)],
                             "norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)}},
        "memory_encoder": {
            "mask_down_convs": [init_conv2d(next(ks), 1, 16, 4),
                                init_conv2d(next(ks), 16, d, 4),
                                init_conv2d(next(ks), d, d, 1)],
            "mask_down_lns": [{"scale": jnp.ones(16), "bias": jnp.zeros(16)},
                              {"scale": jnp.ones(d), "bias": jnp.zeros(d)}],
            "pix_feat_proj": init_conv2d(next(ks), d, d, 1),
            "fuser": [{"dwconv": {"kernel": rnd(7, 7, 1, d), "bias": jnp.zeros(d)},
                       "norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                       "pwconv1": init_linear(next(ks), d, 4 * d),
                       "pwconv2": init_linear(next(ks), 4 * d, d),
                       "gamma": jnp.ones(d) * 1e-6}],
            "out_proj": init_conv2d(next(ks), d, 16, 1)},
        "maskmem_tpos_enc": rnd(3, 1, 1, 16),
        "no_mem_embed": rnd(1, 1, d),
        "no_mem_pos_enc": rnd(1, 1, d),
        "obj_ptr_proj": init_mlp(next(ks), d, d, d, 3),
    }
    return cfg, params


def test_predictor_click_and_propagate():
    cfg, params = tiny_params(jax.random.PRNGKey(0))
    predictor = SAM2VideoPredictor(cfg, params)
    rng = np.random.RandomState(0)
    video = (rng.rand(4, 64, 64, 3) * 255).astype(np.uint8)
    state = predictor.init_state(video)
    assert state.images.shape == (4, 64, 64, 3)

    mask0 = predictor.add_new_points(state, 0,
                                     np.array([[32.0, 32.0]], np.float32),
                                     np.array([1], np.int32))
    assert mask0.shape == (64, 64) and np.isfinite(mask0).all()

    results = dict(predictor.propagate_in_video(state))
    assert set(results.keys()) == {0, 1, 2, 3}
    for m in results.values():
        assert m.shape == (64, 64) and np.isfinite(m).all()

    # adding a second click accumulates points
    predictor.add_new_points(state, 0, np.array([[10.0, 10.0]], np.float32),
                             np.array([0], np.int32))
    assert state.points[0][0].shape[0] == 2

    predictor.reset_state(state)
    assert not state.cond_outputs and not state.points


def test_image_predictor_and_amg():
    from videopainter_tpu.segmentation.image_predictor import (
        AutoMaskConfig, SAM2AutomaticMaskGenerator, SAM2ImagePredictor)

    cfg, params = tiny_params(jax.random.PRNGKey(0))
    pred = SAM2ImagePredictor(cfg, params)
    img = (np.random.RandomState(0).rand(48, 72, 3) * 255).astype(np.uint8)
    with pytest.raises(RuntimeError):
        pred.predict(point_coords=np.array([[1.0, 1.0]]),
                     point_labels=np.array([1]))
    pred.set_image(img)
    masks, iou, low = pred.predict(point_coords=np.array([[36.0, 24.0]]),
                                   point_labels=np.array([1]),
                                   multimask_output=True)
    assert masks.shape == (3, 48, 72) and masks.dtype == bool
    assert iou.shape == (3,)
    # box prompt
    m2, _, _ = pred.predict(box=np.array([10, 10, 60, 40], np.float32),
                            multimask_output=False)
    assert m2.shape == (1, 48, 72)

    amg = SAM2AutomaticMaskGenerator(
        pred, AutoMaskConfig(points_per_side=3, pred_iou_thresh=-10.0,
                             stability_score_thresh=0.0))
    props = amg.generate(img)
    assert isinstance(props, list)
    for c in props:
        assert {"segmentation", "predicted_iou", "stability_score",
                "bbox", "area"} <= set(c)

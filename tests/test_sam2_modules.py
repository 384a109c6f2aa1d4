"""SAM2 module parity vs the vendored torch implementation (tests/goldens/sam2.npz)."""

import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.segmentation.convert import (convert_image_encoder,
                                                   convert_mask_decoder,
                                                   convert_memory_attention,
                                                   convert_memory_encoder,
                                                   convert_prompt_encoder)
from videopainter_tpu.segmentation.hiera import HieraConfig, HieraImageEncoder
from videopainter_tpu.segmentation.memory import memory_attention, memory_encoder
from videopainter_tpu.segmentation.sam_heads import (get_dense_pe, mask_decoder,
                                                     prompt_encoder)

TOL = dict(rtol=3e-4, atol=3e-5)

HIERA_CFG = HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                        window_spec=(4, 2, 4, 2), global_att_blocks=(4,),
                        window_pos_embed_bkg_spatial_size=(4, 4), q_pool=3,
                        d_model=32, scalp=1)


def extract_sd(g, name):
    pre = f"sd::{name}::"
    return {k[len(pre):]: g[k] for k in g.files if k.startswith(pre)}


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_image_encoder(goldens):
    g = goldens("sam2")
    params = convert_image_encoder(extract_sd(g, "image_encoder"))
    enc = HieraImageEncoder(HIERA_CFG)
    img = jnp.asarray(nchw_to_nhwc(g["io::enc::img"]))
    out = enc.apply(params, img)
    n_fpn = sum(1 for k in g.files if k.startswith("io::enc::fpn"))
    assert len(out["backbone_fpn"]) == n_fpn
    for i in range(n_fpn):
        np.testing.assert_allclose(
            np.asarray(out["backbone_fpn"][i]),
            nchw_to_nhwc(g[f"io::enc::fpn{i}"]), **TOL)
        np.testing.assert_allclose(
            np.asarray(out["vision_pos_enc"][i]),
            nchw_to_nhwc(g[f"io::enc::pos{i}"]), rtol=1e-5, atol=1e-5)


def test_prompt_encoder(goldens):
    g = goldens("sam2")
    p = convert_prompt_encoder(extract_sd(g, "prompt_encoder"), prefix="")
    pts = jnp.asarray(g["io::pe::points"])
    lbl = jnp.asarray(g["io::pe::labels"])
    sparse, dense = prompt_encoder(p, image_embedding_size=(4, 4),
                                   input_image_size=(64, 64),
                                   points=(pts, lbl))
    np.testing.assert_allclose(np.asarray(sparse), g["io::pe::sparse"], **TOL)
    np.testing.assert_allclose(np.asarray(dense),
                               nchw_to_nhwc(g["io::pe::dense"]), **TOL)
    np.testing.assert_allclose(np.asarray(get_dense_pe(p, (4, 4))),
                               nchw_to_nhwc(g["io::pe::dense_pe"]), rtol=1e-5,
                               atol=1e-5)
    _, dense_m = prompt_encoder(p, image_embedding_size=(4, 4),
                                input_image_size=(64, 64), points=(pts, lbl),
                                masks=jnp.asarray(nchw_to_nhwc(g["io::pe::mask_in"])))
    np.testing.assert_allclose(np.asarray(dense_m),
                               nchw_to_nhwc(g["io::pe::dense_mask"]), **TOL)


def test_mask_decoder(goldens):
    g = goldens("sam2")
    p = convert_mask_decoder(extract_sd(g, "mask_decoder"), prefix="")
    pe = convert_prompt_encoder(extract_sd(g, "prompt_encoder"), prefix="")
    pts = jnp.asarray(g["io::pe::points"])
    lbl = jnp.asarray(g["io::pe::labels"])
    sparse, dense = prompt_encoder(pe, image_embedding_size=(4, 4),
                                   input_image_size=(64, 64), points=(pts, lbl))
    masks, iou, sam_tokens, obj = mask_decoder(
        p, image_embeddings=jnp.asarray(nchw_to_nhwc(g["io::dec::img_emb"])),
        image_pe=jnp.asarray(nchw_to_nhwc(g["io::pe::dense_pe"])),
        sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
        multimask_output=True, num_heads=2)
    np.testing.assert_allclose(np.asarray(masks), g["io::dec::masks"], **TOL)
    np.testing.assert_allclose(np.asarray(iou), g["io::dec::iou"], **TOL)
    np.testing.assert_allclose(np.asarray(sam_tokens), g["io::dec::sam_tokens"], **TOL)
    np.testing.assert_allclose(np.asarray(obj), g["io::dec::obj"], **TOL)


def test_memory_attention(goldens):
    g = goldens("sam2")
    p = convert_memory_attention(extract_sd(g, "memory_attention"), prefix="")
    out = memory_attention(
        p, jnp.asarray(g["io::ma::curr"]), jnp.asarray(g["io::ma::memory"]),
        jnp.asarray(g["io::ma::curr_pos"]), jnp.asarray(g["io::ma::memory_pos"]),
        num_heads=2, feat_size=(4, 4), num_obj_ptr_tokens=4)
    np.testing.assert_allclose(np.asarray(out), g["io::ma::out"], **TOL)


def test_memory_encoder(goldens):
    g = goldens("sam2")
    p = convert_memory_encoder(extract_sd(g, "memory_encoder"), prefix="")
    feat, pos = memory_encoder(p, jnp.asarray(nchw_to_nhwc(g["io::me::pix"])),
                               jnp.asarray(nchw_to_nhwc(g["io::me::mask"])))
    np.testing.assert_allclose(np.asarray(feat), nchw_to_nhwc(g["io::me::feat"]),
                               **TOL)
    np.testing.assert_allclose(np.asarray(pos), nchw_to_nhwc(g["io::me::pos"]),
                               rtol=1e-5, atol=1e-5)

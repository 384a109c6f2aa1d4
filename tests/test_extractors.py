"""Extractor machinery tests (architecture-level; no pretrained weights in CI)."""

import numpy as np
import pytest

from videopainter_tpu.evaluate.extractors import (_I3D_LAYERS,
                                                  convert_i3d_state_dict,
                                                  i3d_extract_features)


def random_i3d_sd(seed=0):
    """Synthetic pytorch-i3d-style state dict covering all layers."""
    rng = np.random.RandomState(seed)
    sd = {}
    in_ch = 3

    def add_unit(prefix, cin, cout, k):
        sd[f"{prefix}.conv3d.weight"] = rng.randn(cout, cin, *k).astype(np.float32) * 0.05
        sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.01
        sd[f"{prefix}.bn.running_var"] = np.ones(cout, np.float32)

    for name, kind, spec in _I3D_LAYERS:
        if kind == "conv":
            cout, k, _ = spec
            add_unit(name, in_ch, cout, k)
            in_ch = cout
        elif kind == "mixed":
            b0, b1a, b1b, b2a, b2b, b3b = spec
            add_unit(f"{name}.b0", in_ch, b0, (1, 1, 1))
            add_unit(f"{name}.b1a", in_ch, b1a, (1, 1, 1))
            add_unit(f"{name}.b1b", b1a, b1b, (3, 3, 3))
            add_unit(f"{name}.b2a", in_ch, b2a, (1, 1, 1))
            add_unit(f"{name}.b2b", b2a, b2b, (3, 3, 3))
            add_unit(f"{name}.b3b", in_ch, b3b, (1, 1, 1))
            in_ch = b0 + b1b + b2b + b3b
    return sd


def test_i3d_forward_shapes():
    params = convert_i3d_state_dict(random_i3d_sd())
    video = np.random.RandomState(0).rand(1, 16, 64, 64, 3).astype(np.float32) * 2 - 1
    feats = i3d_extract_features(params, video)
    assert feats.shape == (1, 1024)
    assert np.isfinite(feats).all()


def test_i3d_bn_folding():
    """Nontrivial BN stats must change the output (folded correctly)."""
    sd = random_i3d_sd()
    params_a = convert_i3d_state_dict(sd)
    sd2 = dict(sd)
    sd2["Conv3d_1a_7x7.bn.running_mean"] = sd["Conv3d_1a_7x7.bn.running_mean"] + 1.0
    params_b = convert_i3d_state_dict(sd2)
    video = np.random.RandomState(1).rand(1, 8, 32, 32, 3).astype(np.float32)
    fa = i3d_extract_features(params_a, video)
    fb = i3d_extract_features(params_b, video)
    assert np.abs(fa - fb).max() > 0


def test_i3d_matches_reference_port(goldens):
    """JAX I3D vs the reference's bundled torch InceptionI3d
    (evaluate/metrics.py:360-598): same random weights, same video ->
    pre-logits features must match (BN folding included)."""
    g = goldens("i3d")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_i3d_state_dict(sd)
    video = np.transpose(g["video"], (0, 2, 3, 4, 1))  # BCTHW -> BTHWC
    feats = i3d_extract_features(params, video)
    np.testing.assert_allclose(np.asarray(feats), g["features"],
                               rtol=1e-3, atol=1e-3)


def test_clip_extractor_matches_torch(goldens):
    """ClipExtractor (Flax CLIP + processor) vs torch CLIPModel on the tiny
    golden checkpoint: image features + CLIPScore convention
    (reference evaluate/metrics.py:841-901)."""
    pytest.importorskip("transformers")
    from videopainter_tpu.evaluate.extractors import ClipExtractor

    g = goldens("clip")
    ce = ClipExtractor("tests/goldens/clip_tiny")
    emb = ce.image_embed(g["img"])
    np.testing.assert_allclose(emb, g["image_features"], rtol=1e-4, atol=1e-5)
    score = ce.clip_score(g["img"], str(g["text"]))
    np.testing.assert_allclose(score, float(g["clip_score"]), rtol=1e-4)

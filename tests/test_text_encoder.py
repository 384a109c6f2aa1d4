"""Text tower parity: T5TextEncoder wrapper over Flax T5 vs torch T5
(reference _get_t5_prompt_embeds, pipeline_..._branch.py:217-338)."""

import numpy as np
import pytest

from videopainter_tpu.models.text_encoder import T5TextEncoder, load_prompt_embeds


class _FakeTokenizer:
    """Maps any prompt to the golden ids (max_length padding included)."""

    def __init__(self, ids):
        self.ids = ids

    def __call__(self, text, *, padding, max_length, truncation,
                 add_special_tokens, return_tensors):
        assert padding == "max_length" and truncation and add_special_tokens
        out = np.zeros((1, max_length), np.int32)
        n = min(self.ids.shape[1], max_length)
        out[:, :n] = self.ids[:, :n]
        return {"input_ids": out}


def test_t5_wrapper_matches_torch(goldens):
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    g = goldens("t5")
    model = transformers.FlaxT5EncoderModel.from_pretrained(
        "tests/goldens/t5_tiny", dtype=jnp.float32, from_pt=True)
    enc = T5TextEncoder(_FakeTokenizer(g["ids"]), model,
                        max_length=g["ids"].shape[1])
    out = enc.encode(None, "a prompt")
    np.testing.assert_allclose(np.asarray(out), g["hidden"],
                               rtol=1e-4, atol=1e-5)


def test_load_prompt_embeds_shapes(tmp_path):
    p = tmp_path / "e.npy"
    np.save(p, np.ones((5, 8), np.float32))
    assert load_prompt_embeds(str(p)).shape == (1, 5, 8)

"""T5-XXL prompt encoding (the reference's text tower).

Reference: pipeline_cogvideox_inpainting_i2v_branch.py:217-338
(_get_t5_prompt_embeds / encode_prompt): T5 tokenizer with max_length padding
to 226 tokens (add_special_tokens=True, truncation), encoder forward, and a
separate pass for the (usually empty) negative prompt.

TPU-native: uses transformers' Flax T5 encoder when weights are available
locally (`from_local`), so the text tower runs on-device next to the DiT; the
wrapper degrades gracefully — pipelines accept precomputed `prompt_embeds`,
and tests never require T5 weights.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


class T5TextEncoder:
    def __init__(self, tokenizer, model, max_length: int = 226):
        self.tokenizer = tokenizer
        self.model = model
        self.max_length = max_length

    @classmethod
    def from_local(cls, path: str, max_length: int = 226,
                   dtype=jnp.bfloat16) -> "T5TextEncoder":
        """Load tokenizer + Flax T5 encoder from a local directory
        (e.g. a converted CogVideoX text_encoder/ + tokenizer/ pair)."""
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        tokenizer = AutoTokenizer.from_pretrained(path)
        model = FlaxT5EncoderModel.from_pretrained(path, dtype=dtype,
                                                   from_pt=True)
        return cls(tokenizer, model, max_length)

    def encode(self, _params_unused, prompt: str,
               max_length: Optional[int] = None) -> jnp.ndarray:
        """Returns [1, max_length, d_model] embeddings."""
        max_length = max_length or self.max_length
        ids = self.tokenizer(
            prompt or "", padding="max_length", max_length=max_length,
            truncation=True, add_special_tokens=True, return_tensors="np")
        out = self.model(input_ids=jnp.asarray(ids["input_ids"]))
        return out.last_hidden_state

    def encode_with_negative(self, prompt: str, negative_prompt: str = "",
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (self.encode(None, prompt), self.encode(None, negative_prompt))


def load_prompt_embeds(path: str) -> np.ndarray:
    """Precomputed-embedding fallback (npz/npy with [S, D] or [1, S, D])."""
    arr = np.load(path)
    if hasattr(arr, "files"):
        arr = arr[arr.files[0]]
    if arr.ndim == 2:
        arr = arr[None]
    return arr

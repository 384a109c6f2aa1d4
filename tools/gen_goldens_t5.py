"""Tiny-T5 golden for the text tower wrapper.

Saves a tiny random torch T5EncoderModel (HF layout) + an (ids -> hidden)
io pair computed by torch; the test loads it through
T5TextEncoder/FlaxT5EncoderModel (from_pt) and must match.

Run offline: python tools/gen_goldens_t5.py
Writes tests/goldens/t5_tiny/ (HF dir) + tests/goldens/t5.npz.
"""

import os

import numpy as np
import torch
from transformers import T5Config, T5EncoderModel

OUT_DIR = "tests/goldens/t5_tiny"
OUT = "tests/goldens/t5.npz"


def main():
    cfg = T5Config(d_model=32, d_ff=64, d_kv=8, num_heads=4, num_layers=2,
                   vocab_size=512, feed_forward_proj="gated-gelu",
                   tie_word_embeddings=False)
    torch.manual_seed(0)
    model = T5EncoderModel(cfg).eval()
    os.makedirs(OUT_DIR, exist_ok=True)
    model.save_pretrained(OUT_DIR)
    ids = np.array([[5, 17, 130, 7, 1, 0, 0, 0]], np.int32)
    with torch.no_grad():
        hidden = model(input_ids=torch.tensor(ids, dtype=torch.long)
                       ).last_hidden_state.numpy()
    np.savez_compressed(OUT, ids=ids, hidden=hidden)
    print(f"wrote {OUT_DIR} + {OUT}")


if __name__ == "__main__":
    main()

"""Tiny-CLIP golden for the eval extractor (CLIPScore + temporal-consistency
embeddings; reference evaluate/metrics.py:841-901 uses torchmetrics CLIPScore
and CLIP frame embeddings).

Saves a tiny random CLIPModel + synthetic BPE tokenizer + image processor in
HF layout, plus torch-computed image features and clip score on a fixed image.

Run offline: python tools/gen_goldens_clip.py
Writes tests/goldens/clip_tiny/ + tests/goldens/clip.npz.
"""

import json
import os

import numpy as np
import torch
from transformers import (AutoProcessor, CLIPConfig, CLIPImageProcessor,
                          CLIPModel, CLIPTextConfig, CLIPTokenizer,
                          CLIPVisionConfig)

OUT_DIR = "tests/goldens/clip_tiny"
OUT = "tests/goldens/clip.npz"


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2, "red</w>": 3,
             "car</w>": 4, "cat</w>": 5, "r": 6, "e": 7, "d": 8, "c": 9,
             "r</w>": 10, "t</w>": 11, "a": 12, "d</w>": 13, "re": 14, "ca": 15}
    json.dump(vocab, open(os.path.join(OUT_DIR, "vocab.json"), "w"))
    open(os.path.join(OUT_DIR, "merges.txt"), "w").write(
        "#version: 0.2\nr e\nre d</w>\nc a\nca r</w>\nca t</w>\n")
    tok = CLIPTokenizer(vocab_file=os.path.join(OUT_DIR, "vocab.json"),
                        merges_file=os.path.join(OUT_DIR, "merges.txt"),
                        model_max_length=16)
    tok.save_pretrained(OUT_DIR)

    cfg = CLIPConfig.from_text_vision_configs(
        text_config=CLIPTextConfig(vocab_size=16, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=2,
                                   max_position_embeddings=16),
        vision_config=CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                       num_hidden_layers=2,
                                       num_attention_heads=2,
                                       image_size=32, patch_size=8),
        projection_dim=16)
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    model.save_pretrained(OUT_DIR)
    CLIPImageProcessor(size={"shortest_edge": 32},
                       crop_size={"height": 32, "width": 32}
                       ).save_pretrained(OUT_DIR)

    img = np.random.RandomState(0).rand(48, 64, 3).astype(np.float32)
    text = "a red car"
    proc = AutoProcessor.from_pretrained(OUT_DIR)
    with torch.no_grad():
        ti = proc(images=(img * 255).astype(np.uint8), text=[text],
                  return_tensors="pt", padding=True, truncation=True)
        t_img = model.get_image_features(
            pixel_values=ti["pixel_values"])[0].numpy()
        t_txt = model.get_text_features(
            input_ids=ti["input_ids"],
            attention_mask=ti["attention_mask"])[0].numpy()
    cos = float(np.dot(t_img, t_txt) /
                (np.linalg.norm(t_img) * np.linalg.norm(t_txt)))
    np.savez_compressed(OUT, img=img, text=np.array(text),
                        image_features=t_img,
                        clip_score=np.float32(100.0 * max(cos, 0.0)))
    print(f"wrote {OUT_DIR} + {OUT}: score={100 * max(cos, 0.0):.4f}")


if __name__ == "__main__":
    main()

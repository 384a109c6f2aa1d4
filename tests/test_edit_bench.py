"""edit_bench CSV-sweep integration: fake VLM generates instructions, fake
LLM rewrites captions, fake first-frame editor paints the hole — the driver
must produce the reference's side-by-side mp4 + instruction-metadata JSON
(schema of /root/reference/infer/edit.py:491-498) per (sample, instruction).
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_cli_integration import make_ckpts, make_data  # noqa: E402


def test_edit_bench_sweep(tmp_path):
    from videopainter_tpu.infer.edit import edit_bench_main

    root = str(tmp_path)
    make_ckpts(root)
    make_data(root)
    embeds = np.random.RandomState(3).rand(1, 5, 12).astype(np.float32)
    np.save(os.path.join(root, "embeds.npy"), embeds)
    with open(os.path.join(root, "instrs.json"), "w") as f:
        json.dump({"0": ["Remove the square", "Replace the square with a cat"]}, f)

    vlm_calls = []

    def fake_generate_instructions(video, caption):
        vlm_calls.append(caption)
        return ["Delete the object"]

    def fake_llm(instruction, caption):
        return f"{caption} EDITED[{instruction}]", f"frame with {instruction}"

    def fake_first_frame_edit(frame01, mask, desc):
        out = frame01.copy()
        out[mask > 0.5] = 0.5
        return out

    results = edit_bench_main([
        "--bench",
        "--instructions_json", os.path.join(root, "instrs.json"),
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--meta_file_path", os.path.join(root, "meta.csv"),
        "--video_id", "0",
        "--output_path", os.path.join(root, "out"),
        "--prompt_embeds", os.path.join(root, "embeds.npy"),
        "--height", "64", "--width", "96",
        "--num_frames", "9", "--num_inference_steps", "2",
        "--replace_gt", "--mask_add", "--dtype", "float32",
    ], llm_fn=fake_llm, first_frame_edit_fn=fake_first_frame_edit,
        generate_instructions_fn=fake_generate_instructions)

    # sample 0 had 2 instructions from the JSON; the VLM hook is only for
    # samples missing from the mapping
    assert set(results) == {(0, 0), (0, 1)}
    assert not vlm_calls
    for tag, instr in [("0", "Remove the square"),
                       ("1", "Replace the square with a cat")]:
        mp4 = os.path.join(root, "out", f"edit_0_{tag}.mp4")
        meta = os.path.join(root, "out", f"edit_0_{tag}.json")
        assert os.path.exists(mp4) and os.path.getsize(mp4) > 0
        with open(meta) as f:
            d = json.load(f)
        assert set(d) == {"Original_video_caption", "Edited_video_caption",
                          "Edited_image_caption", "Editing_instruction"}
        assert d["Editing_instruction"] == instr
        assert d["Edited_video_caption"].endswith(f"EDITED[{instr}]")
        assert d["Edited_image_caption"] == f"frame with {instr}"


def test_edit_bench_vlm_fallback(tmp_path):
    """Samples absent from the instructions mapping go through the
    generate_instructions hook (reference edit_bench.py:240-280)."""
    from videopainter_tpu.infer.edit import edit_bench_main

    root = str(tmp_path)
    make_ckpts(root)
    make_data(root)
    embeds = np.random.RandomState(3).rand(1, 5, 12).astype(np.float32)
    np.save(os.path.join(root, "embeds.npy"), embeds)

    seen = []

    def fake_generate_instructions(video, caption):
        seen.append((video.shape, caption))
        return ["Delete the object"]

    results = edit_bench_main([
        "--bench",
        "--model_path", os.path.join(root, "model"),
        "--inpainting_branch", os.path.join(root, "branch"),
        "--meta_file_path", os.path.join(root, "meta.csv"),
        "--video_id", "0",
        "--output_path", os.path.join(root, "out"),
        "--prompt_embeds", os.path.join(root, "embeds.npy"),
        "--height", "64", "--width", "96",
        "--num_frames", "9", "--num_inference_steps", "2",
        "--replace_gt", "--dtype", "float32",
    ], generate_instructions_fn=fake_generate_instructions)

    assert set(results) == {(0, 0)}
    assert len(seen) == 1 and seen[0][0][0] == 9  # 9 frames read
    with open(os.path.join(root, "out", "edit_0.json")) as f:
        d = json.load(f)
    assert d["Editing_instruction"] == "Delete the object"

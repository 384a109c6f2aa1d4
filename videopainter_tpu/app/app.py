"""Interactive inpainting app: segment -> track -> inpaint.

Reference: app/app.py (1402 LoC gradio UI) + app/utils.py (load_model :31,
generate_frames :86-160). Flow (reference app.py:354-587):
  upload video -> read + fps->8 + first 49 frames + resize 720x480
  -> SAM2 init_state -> click prompts add_new_points -> mask overlay
  -> propagate_in_video + binary dilation(6)
  -> inpaint: dilate(16), [FluxFill frame-0 hook], AnyL pipeline with
     replace_gt=True, mask_add=True

The session logic here is headless-first (AppSession) so it is testable and
scriptable; the gradio Blocks UI wraps it when gradio is importable (not baked
into this image — the UI degrades to a clear error message otherwise).
External models (FluxFill first-frame inpaint, GPT-4o prompt enhancement
app.py:710-951) are pluggable hooks, as in infer/.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def dilate_mask(mask: np.ndarray, iterations: int) -> np.ndarray:
    if iterations <= 0:
        return mask
    kernel = np.ones((3, 3), np.uint8)
    return cv2.dilate(mask.astype(np.uint8), kernel, iterations=iterations)


@dataclass
class AppSession:
    """One user's interactive state."""

    predictor: object                      # SAM2VideoPredictor
    pipe: object                           # CogVideoXI2VDualInpaintAnyLPipeline
    pipe_params: dict
    encode_prompt_fn: Callable
    fps: int = 8
    max_frames: int = 49
    height: int = 480
    width: int = 720
    track_dilate: int = 6
    inpaint_dilate: int = 16
    frames: Optional[np.ndarray] = None    # [T, H, W, 3] uint8
    sam_state: Optional[object] = None
    masks: Optional[np.ndarray] = None     # [T, H, W] uint8
    first_frame_inpaint_fn: Optional[Callable] = None

    # -- step 1: load video (reference app.py:354-401) ----------------------
    def load_video(self, path_or_array) -> np.ndarray:
        from ..training.data import read_video_frames, resize_video

        if isinstance(path_or_array, np.ndarray):
            video = path_or_array
        else:
            video = read_video_frames(path_or_array)
        video = video[: self.max_frames]
        t = ((len(video) - 1) // 4) * 4 + 1
        video = resize_video(video[:t], self.height, self.width)
        self.frames = video
        self.sam_state = self.predictor.init_state(video)
        self.masks = None
        return video

    # -- step 2: click refinement (reference app.py:433-479) ----------------
    def click(self, frame_idx: int, x: float, y: float,
              positive: bool = True) -> np.ndarray:
        """Click in display coords; returns the refined mask for that frame."""
        s = self.predictor.cfg.image_size
        px = np.array([[x * s / self.width, y * s / self.height]], np.float32)
        lbl = np.array([1 if positive else 0], np.int32)
        logits = self.predictor.add_new_points(self.sam_state, frame_idx, px, lbl)
        mask = (logits > 0).astype(np.uint8)
        return cv2.resize(mask, (self.width, self.height),
                          interpolation=cv2.INTER_NEAREST)

    def overlay(self, frame_idx: int, mask: np.ndarray) -> np.ndarray:
        f = self.frames[frame_idx].copy()
        f[mask > 0] = (0.5 * f[mask > 0] + 0.5 *
                       np.array([255, 0, 0])).astype(np.uint8)
        return f

    # -- step 3: tracking (reference app.py:490-527) ------------------------
    def track(self) -> np.ndarray:
        masks = np.zeros((len(self.frames), self.height, self.width), np.uint8)
        for idx, logits in self.predictor.propagate_in_video(self.sam_state):
            m = (logits > 0).astype(np.uint8)
            m = cv2.resize(m, (self.width, self.height),
                           interpolation=cv2.INTER_NEAREST)
            masks[idx] = dilate_mask(m, self.track_dilate)
        self.masks = masks
        return masks

    # -- step 4: inpaint (reference app.py:544-587 + utils.py:86-160) -------
    def inpaint(self, prompt: str, num_inference_steps: int = 50,
                guidance_scale: float = 6.0, seed: int = 42) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        if self.masks is None:
            raise RuntimeError("run track() first")
        masks = np.stack([dilate_mask(m, self.inpaint_dilate)
                          for m in self.masks]).astype(np.float32)
        masks[0] = 0.0  # zero mask on frame 0 (utils.py:118-121)
        video01 = self.frames.astype(np.float32) / 255.0
        first = video01[0]
        if self.first_frame_inpaint_fn is not None:
            first = self.first_frame_inpaint_fn(first, self.masks[0], prompt)

        embeds, neg = self.encode_prompt_fn(prompt)
        out = self.pipe(
            self.pipe_params,
            image=jnp.asarray(first)[None] * 2 - 1,
            video=jnp.asarray(video01)[None] * 2 - 1,
            masks=jnp.asarray(masks)[None],
            num_frames=len(video01),
            prompt_embeds=embeds, negative_prompt_embeds=neg,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, use_dynamic_cfg=True,
            replace_gt=True, mask_add=True,
            rng=jax.random.PRNGKey(seed))
        return ((np.asarray(out)[0] / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8)


def build_ui(session: AppSession):
    """Assemble the gradio Blocks UI around an AppSession."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed in this image; use AppSession headlessly "
            "or install gradio to serve the UI") from e

    with gr.Blocks(title="VideoPainter TPU") as demo:
        state_frame = gr.State(0)
        with gr.Row():
            video_in = gr.Video(label="Input video")
            frame_view = gr.Image(label="Click to segment")
        with gr.Row():
            positive = gr.Radio(["positive", "negative"], value="positive",
                                label="Click type")
            frame_slider = gr.Slider(0, session.max_frames - 1, step=1,
                                     label="Frame")
        prompt = gr.Textbox(label="Prompt")
        with gr.Row():
            track_btn = gr.Button("Track")
            inpaint_btn = gr.Button("Inpaint")
        video_out = gr.Video(label="Result")

        def on_upload(path):
            frames = session.load_video(path)
            return frames[0]

        def on_click(frame_idx, click_type, evt: "gr.SelectData"):
            x, y = evt.index
            mask = session.click(int(frame_idx), x, y,
                                 click_type == "positive")
            return session.overlay(int(frame_idx), mask)

        def on_track():
            masks = session.track()
            return session.overlay(0, masks[0])

        def on_inpaint(p):
            import tempfile

            out = session.inpaint(p)
            tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
            h, w = out.shape[1:3]
            vw = cv2.VideoWriter(tmp.name, cv2.VideoWriter_fourcc(*"mp4v"),
                                 session.fps, (w, h))
            for f in out:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
            return tmp.name

        video_in.upload(on_upload, video_in, frame_view)
        frame_view.select(on_click, [frame_slider, positive], frame_view)
        track_btn.click(on_track, None, frame_view)
        inpaint_btn.click(on_inpaint, prompt, video_out)
    return demo


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--inpainting_branch", required=True)
    ap.add_argument("--id_adapter", default=None)
    ap.add_argument("--sam2_checkpoint", default=None)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args(argv)

    from ..infer.inpaint import build_pipeline
    from ..segmentation import SAM2Config, SAM2VideoPredictor
    from ..segmentation.convert import convert_sam2_state_dict

    pipe, params = build_pipeline(args.model_path, args.inpainting_branch,
                                  args.id_adapter)
    if args.sam2_checkpoint:
        import torch

        sd = torch.load(args.sam2_checkpoint, map_location="cpu")["model"]
        sam_params = convert_sam2_state_dict(
            {k: v.numpy() for k, v in sd.items()})
        predictor = SAM2VideoPredictor(SAM2Config(), sam_params)
    else:
        raise SystemExit("--sam2_checkpoint required for the interactive app")

    def encode(prompt):
        pos = pipe.text_encoder.encode(None, prompt)
        neg = pipe.text_encoder.encode(None, "")
        return pos, neg

    session = AppSession(predictor=predictor, pipe=pipe, pipe_params=params,
                         encode_prompt_fn=encode)
    build_ui(session).launch(server_port=args.port)


if __name__ == "__main__":
    main()

"""Interactive inpainting app: segment -> track -> inpaint.

Reference: app/app.py (1402 LoC gradio UI) + app/utils.py (load_model :31,
generate_frames :86-160). Flow (reference app.py:354-587, UI graph :1002-1402):
  upload video -> read + fps->8 + first 49 frames + resize 720x480
  -> SAM2 init_state -> per-object click prompts (positive/negative
     refinement, add_new_points accumulates) -> mask overlay
  -> propagate_in_video per object + binary dilation(6) -> tracking gallery
  -> inpaint: dilate(16), union of object masks, [FluxFill frame-0 hook],
     AnyL pipeline with replace_gt=True, mask_add=True, per-step progress

TPU-side design notes:
 - multi-object tracking runs one independent SAM2 memory state per object
   (the reference batches objects in one state; independent states are
   equivalent because SAM2 objects never interact) while SHARING the frame
   feature cache, so the Hiera encoder runs once per frame total.
 - per-step denoise progress comes from a jax.debug.callback traced into the
   denoise scan (pipelines/common.py), surfaced as progress_fn.

The session logic is headless-first (AppSession) so it is testable and
scriptable; the gradio Blocks UI wraps it when gradio is importable (not baked
into this image — tests drive the event graph through a fake gradio shim).
External models (FluxFill first-frame inpaint, GPT-4o prompt enhancement
app.py:710-951) are pluggable hooks, as in infer/.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# per-object overlay colors (RGB), cycled (reference uses a fixed palette)
OBJ_COLORS = [(255, 0, 0), (0, 255, 0), (0, 128, 255), (255, 255, 0),
              (255, 0, 255), (0, 255, 255)]


def dilate_mask(mask: np.ndarray, iterations: int) -> np.ndarray:
    if iterations <= 0:
        return mask
    kernel = np.ones((3, 3), np.uint8)
    return cv2.dilate(mask.astype(np.uint8), kernel, iterations=iterations)


@dataclass
class AppSession:
    """One user's interactive state (multi-object)."""

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
    states: Dict[int, object] = field(default_factory=dict)  # obj_id -> SAM2State
    obj_masks: Dict[int, np.ndarray] = field(default_factory=dict)  # [T,H,W] u8
    masks: Optional[np.ndarray] = None     # union [T, H, W] uint8
    result: Optional[np.ndarray] = None    # [T, H, W, 3] uint8
    first_frame_inpaint_fn: Optional[Callable] = None
    _shared_features: dict = field(default_factory=dict)

    def use_self_first_frame_inpaint(self, **kw) -> None:
        """Pre-inpaint frame 0 with the framework's own image-mode (T=1)
        pipeline — the offline analog of the reference's FluxFill step
        (app/utils.py:86-160). kw forwards to make_self_first_frame_inpaint
        (e.g. num_inference_steps, use_flash)."""
        from ..infer.first_frame import make_self_first_frame_inpaint

        self.first_frame_inpaint_fn = make_self_first_frame_inpaint(
            self.pipe, self.pipe_params,
            encode_prompt_fn=self.encode_prompt_fn, **kw)

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
        self.states = {}
        self.obj_masks = {}
        self.masks = None
        self.result = None
        self._shared_features = {}
        return video

    def _state_for(self, obj_id: int):
        """One SAM2 memory state per object; the frame-feature cache is shared
        across objects so the image encoder runs once per frame."""
        if obj_id not in self.states:
            st = self.predictor.init_state(self.frames)
            st.features = self._shared_features
            self.states[obj_id] = st
        return self.states[obj_id]

    @property
    def object_ids(self) -> List[int]:
        return sorted(self.states)

    def reset_object(self, obj_id: int) -> None:
        """Drop an object's clicks + memory (reference 'reset' button)."""
        self.states.pop(obj_id, None)
        self.obj_masks.pop(obj_id, None)

    # -- step 2: click refinement (reference app.py:433-479) ----------------
    def click(self, frame_idx: int, x: float, y: float,
              positive: bool = True, obj_id: int = 0) -> np.ndarray:
        """Click in display coords; positive/negative clicks ACCUMULATE per
        (object, frame) — the negative-click refinement loop. Returns the
        refined mask for that frame."""
        s = self.predictor.cfg.image_size
        px = np.array([[x * s / self.width, y * s / self.height]], np.float32)
        lbl = np.array([1 if positive else 0], np.int32)
        state = self._state_for(obj_id)
        logits = self.predictor.add_new_points(state, frame_idx, px, lbl)
        mask = (logits > 0).astype(np.uint8)
        return cv2.resize(mask, (self.width, self.height),
                          interpolation=cv2.INTER_NEAREST)

    def overlay(self, frame_idx: int, mask: Optional[np.ndarray] = None,
                obj_id: Optional[int] = None) -> np.ndarray:
        """Blend masks onto a frame: one mask (obj color) or all tracked
        objects when mask is None."""
        f = self.frames[frame_idx].copy()
        if mask is not None:
            color = OBJ_COLORS[(obj_id or 0) % len(OBJ_COLORS)]
            f[mask > 0] = (0.5 * f[mask > 0] + 0.5 * np.array(color)).astype(np.uint8)
            return f
        for oid, masks in self.obj_masks.items():
            color = OBJ_COLORS[oid % len(OBJ_COLORS)]
            m = masks[frame_idx] > 0
            f[m] = (0.5 * f[m] + 0.5 * np.array(color)).astype(np.uint8)
        return f

    # -- step 3: tracking (reference app.py:490-527) ------------------------
    def track(self) -> np.ndarray:
        """Propagate every object through the video; masks is their union."""
        if not self.states:
            raise RuntimeError("add at least one click first")
        t = len(self.frames)
        union = np.zeros((t, self.height, self.width), np.uint8)
        for oid, state in self.states.items():
            masks = np.zeros_like(union)
            for idx, logits in self.predictor.propagate_in_video(state):
                m = (logits > 0).astype(np.uint8)
                m = cv2.resize(m, (self.width, self.height),
                               interpolation=cv2.INTER_NEAREST)
                masks[idx] = dilate_mask(m, self.track_dilate)
            self.obj_masks[oid] = masks
            union |= masks
        self.masks = union
        return union

    def tracking_gallery(self, stride: int = 8) -> List[np.ndarray]:
        """Every stride-th frame with all object overlays (reference's
        tracking result gallery)."""
        if self.masks is None:
            raise RuntimeError("run track() first")
        return [self.overlay(i) for i in range(0, len(self.frames), stride)]

    # -- step 4: inpaint (reference app.py:544-587 + utils.py:86-160) -------
    def inpaint(self, prompt: str, num_inference_steps: int = 50,
                guidance_scale: float = 6.0, seed: int = 42,
                progress_fn: Optional[Callable] = None) -> np.ndarray:
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
            progress_fn=progress_fn,
            rng=jax.random.PRNGKey(seed))
        self.result = ((np.asarray(out)[0] / 2 + 0.5).clip(0, 1) * 255
                       ).astype(np.uint8)
        return self.result

    def side_by_side(self) -> np.ndarray:
        """[original | masked | result] per frame (the reference's
        _visualize_video export)."""
        if self.result is None:
            raise RuntimeError("run inpaint() first")
        t = len(self.result)
        orig = self.frames[:t]
        keep = (self.masks[:t] == 0)[..., None]
        masked = (orig * keep).astype(np.uint8)
        return np.concatenate([orig, masked, self.result], axis=2)


def export_mp4(frames: np.ndarray, fps: int) -> str:
    import tempfile

    tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(tmp.name, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    return tmp.name


def build_ui(session: AppSession, gr=None):
    """Assemble the gradio Blocks UI around an AppSession.

    Mirrors the reference event graph (app/app.py:1002-1402): upload,
    object dropdown + add/reset, positive/negative click refinement on a
    frame slider, tracking gallery, inpaint controls with a per-step progress
    bar, result video + side-by-side export.

    `gr` is injectable for tests (a fake module drives the event graph).
    """
    if gr is None:
        try:
            import gradio as gr
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "gradio is not installed in this image; use AppSession "
                "headlessly or install gradio to serve the UI") from e

    with gr.Blocks(title="VideoPainter TPU") as demo:
        with gr.Row():
            video_in = gr.Video(label="Input video")
            frame_view = gr.Image(label="Click to segment")
        with gr.Row():
            frame_slider = gr.Slider(0, session.max_frames - 1, step=1,
                                     value=0, label="Frame")
            click_type = gr.Radio(["positive", "negative"], value="positive",
                                  label="Click type")
            obj_dropdown = gr.Dropdown(choices=["0"], value="0",
                                       label="Object")
            add_obj_btn = gr.Button("Add object")
            reset_obj_btn = gr.Button("Reset object")
        with gr.Row():
            track_btn = gr.Button("Track")
            gallery = gr.Gallery(label="Tracking result")
        with gr.Row():
            prompt = gr.Textbox(label="Prompt")
            steps = gr.Slider(1, 100, value=50, step=1, label="Steps")
            guidance = gr.Slider(1.0, 12.0, value=6.0, label="Guidance")
            seed = gr.Number(value=42, label="Seed")
        inpaint_btn = gr.Button("Inpaint")
        with gr.Row():
            video_out = gr.Video(label="Result")
            video_sbs = gr.Video(label="Original | Masked | Result")

        def on_upload(path):
            frames = session.load_video(path)
            return frames[0]

        def on_slide(frame_idx):
            if session.frames is None:
                return None
            return session.overlay(int(frame_idx))

        def on_click(frame_idx, ctype, obj_id, evt: "gr.SelectData"):
            x, y = evt.index
            mask = session.click(int(frame_idx), x, y,
                                 positive=ctype == "positive",
                                 obj_id=int(obj_id))
            return session.overlay(int(frame_idx), mask, obj_id=int(obj_id))

        def on_add_object(obj_id):
            new_id = max(session.object_ids, default=int(obj_id)) + 1
            session._state_for(new_id)
            ids = [str(i) for i in session.object_ids]
            return gr.update(choices=ids, value=str(new_id))

        def on_reset_object(obj_id):
            session.reset_object(int(obj_id))
            if session.frames is None:
                return None
            return session.frames[0]

        def on_track():
            session.track()
            return session.tracking_gallery()

        def on_inpaint(p, n_steps, g, s, progress=None):
            if progress is None:
                progress = getattr(gr, "Progress", lambda: None)()

            def on_step(done, total):
                if progress is not None:
                    progress(done / total,
                             desc=f"denoise step {done}/{total}")

            out = session.inpaint(p, num_inference_steps=int(n_steps),
                                  guidance_scale=float(g), seed=int(s),
                                  progress_fn=on_step)
            return export_mp4(out, session.fps), \
                export_mp4(session.side_by_side(), session.fps)

        video_in.upload(on_upload, video_in, frame_view)
        frame_slider.change(on_slide, frame_slider, frame_view)
        frame_view.select(on_click, [frame_slider, click_type, obj_dropdown],
                          frame_view)
        add_obj_btn.click(on_add_object, obj_dropdown, obj_dropdown)
        reset_obj_btn.click(on_reset_object, obj_dropdown, frame_view)
        track_btn.click(on_track, None, gallery)
        inpaint_btn.click(on_inpaint, [prompt, steps, guidance, seed],
                          [video_out, video_sbs])
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

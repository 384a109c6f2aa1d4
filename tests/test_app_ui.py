"""UI event-graph test: a fake gradio shim builds the Blocks UI and drives
every wired event (upload, slider, multi-object clicks with negative
refinement, add/reset object, track gallery, inpaint with per-step progress,
side-by-side export) against a real tiny AppSession — gradio itself is not
installed in this image, so the shim records the event graph the way gradio
would and the test fires the handlers."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from videopainter_tpu.app.app import AppSession, build_ui  # noqa: E402
from videopainter_tpu.config import (BranchConfig, SchedulerConfig,  # noqa: E402
                                     TransformerConfig, VAEConfig)
from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,  # noqa: E402
                                     CogVideoXTransformer3D)
from videopainter_tpu.pipelines import CogVideoXI2VDualInpaintAnyLPipeline  # noqa: E402
from videopainter_tpu.schedulers import CogVideoXDPMScheduler  # noqa: E402


# ---------------------------------------------------------------------------
# fake gradio
# ---------------------------------------------------------------------------

class _Component:
    _instances: list = []

    def __init__(self, *a, **kw):
        self.kw = kw
        self.label = kw.get("label") or (a[0] if a and isinstance(a[0], str)
                                         else None)
        self.events = {}
        _Component._instances.append(self)

    def _wire(self, name, fn, inputs, outputs):
        self.events.setdefault(name, []).append(
            (fn, inputs if isinstance(inputs, list) else
             ([] if inputs is None else [inputs]),
             outputs if isinstance(outputs, list) else
             ([] if outputs is None else [outputs])))

    def upload(self, fn, inputs=None, outputs=None):
        self._wire("upload", fn, inputs, outputs)

    def change(self, fn, inputs=None, outputs=None):
        self._wire("change", fn, inputs, outputs)

    def select(self, fn, inputs=None, outputs=None):
        self._wire("select", fn, inputs, outputs)

    def click(self, fn, inputs=None, outputs=None):
        self._wire("click", fn, inputs, outputs)


class _Ctx(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _SelectData:
    def __init__(self, index):
        self.index = index


def make_fake_gradio():
    gr = types.ModuleType("fake_gradio")
    for name in ["Video", "Image", "Slider", "Radio", "Dropdown", "Button",
                 "Textbox", "Gallery", "Number", "State"]:
        setattr(gr, name, type(name, (_Component,), {}))
    gr.Blocks = type("Blocks", (_Ctx,), {})
    gr.Row = type("Row", (_Ctx,), {})
    gr.Column = type("Column", (_Ctx,), {})
    gr.SelectData = _SelectData
    gr.update = lambda **kw: dict(kw)
    gr.Progress = lambda *a, **kw: None
    return gr


def make_session():
    import sys

    sys.path.insert(0, "tests")
    from test_sam2_predictor import tiny_params

    sam_cfg, sam_params = tiny_params(jax.random.PRNGKey(0))
    from videopainter_tpu.segmentation import SAM2VideoPredictor

    predictor = SAM2VideoPredictor(sam_cfg, sam_params)
    DIT = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                 sample_height=8, sample_width=12)
    BR = BranchConfig.from_transformer(DIT, num_layers=2)
    VAE = VAEConfig.tiny(latent_channels=16)
    transformer, branch, vae = (CogVideoXTransformer3D(DIT), CogVideoXBranch(BR),
                                AutoencoderKLCogVideoX(VAE))
    params = {"transformer": transformer.init(jax.random.PRNGKey(1)),
              "vae": vae.init(jax.random.PRNGKey(2))}
    params["branch"] = branch.init_from_transformer(jax.random.PRNGKey(3),
                                                    params["transformer"], DIT)
    pipe = CogVideoXI2VDualInpaintAnyLPipeline(
        transformer, branch, vae,
        CogVideoXDPMScheduler(SchedulerConfig.cogvideox_5b_inference()))
    embeds = jnp.asarray(np.random.RandomState(0).rand(1, 5, 12).astype(np.float32))
    return AppSession(predictor=predictor, pipe=pipe, pipe_params=params,
                      encode_prompt_fn=lambda p: (embeds, jnp.zeros_like(embeds)),
                      height=64, width=96, max_frames=9)


def handler(comp, event):
    assert event in comp.events, f"{comp.label} has no {event} handler"
    return comp.events[event][0][0]


def test_ui_event_graph():
    gr = make_fake_gradio()
    session = make_session()
    build_ui(session, gr=gr)

    comps = {c.label: c for c in _Component._instances if c.events}

    video_in = comps["Input video"]
    frame_view = comps["Click to segment"]
    frame_slider = comps["Frame"]
    add_btn = comps["Add object"]
    reset_btn = comps["Reset object"]
    track_btn = comps["Track"]
    inpaint_btn = comps["Inpaint"]

    # 1. upload
    video = (np.random.RandomState(1).rand(12, 50, 70, 3) * 255).astype(np.uint8)
    first = handler(video_in, "upload")(video)
    assert first.shape == (64, 96, 3)

    # 2. positive + negative click on object 0 (refinement accumulates)
    on_click = handler(frame_view, "select")
    ov = on_click(0, "positive", "0", _SelectData((48, 32)))
    assert ov.shape == (64, 96, 3)
    ov = on_click(0, "negative", "0", _SelectData((10, 10)))
    assert ov.shape == (64, 96, 3)
    assert len(session.states[0].points[0][0]) == 2  # two accumulated clicks

    # 3. add a second object and click it
    upd = handler(add_btn, "click")("0")
    assert upd["value"] == "1" and "1" in upd["choices"]
    on_click(0, "positive", "1", _SelectData((70, 40)))
    assert sorted(session.states) == [0, 1]

    # 4. slider overlay works pre-track (no masks yet)
    ov = handler(frame_slider, "change")(0)
    assert ov.shape == (64, 96, 3)

    # 5. track -> gallery frames with both objects
    gal = handler(track_btn, "click")()
    assert len(gal) >= 1 and gal[0].shape == (64, 96, 3)
    assert sorted(session.obj_masks) == [0, 1]
    assert session.masks.max() == 1

    # 6. reset object 1 -> only object 0 remains
    handler(reset_btn, "click")("1")
    assert sorted(session.states) == [0]

    # 7. inpaint with per-step progress
    progress_calls = []

    def progress(frac, desc=""):
        progress_calls.append((frac, desc))

    out_path, sbs_path = handler(inpaint_btn, "click")(
        "a cat", 2, 6.0, 42, progress=progress)
    assert out_path.endswith(".mp4") and sbs_path.endswith(".mp4")
    assert session.result.shape == (9, 64, 96, 3)
    assert session.side_by_side().shape == (9, 64, 96 * 3, 3)
    assert progress_calls, "per-step progress never fired"
    assert progress_calls[-1][0] == 1.0
    cap = cv2.VideoCapture(sbs_path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 96 * 3
    cap.release()

"""Flow utils + editing eval tests."""

import numpy as np

from videopainter_tpu.evaluate.eval_edit import (EditEvalConfig,
                                                 edit_sample_metrics,
                                                 run_edit_eval)
from videopainter_tpu.evaluate.flow_util import (endpoint_error,
                                                 flow_warping_error,
                                                 warp_with_flow)
from videopainter_tpu.evaluate.metrics import MetricsCalculator


def test_epe_and_warp():
    flow = np.zeros((8, 10, 2), np.float32)
    assert endpoint_error(flow, flow) == 0.0
    flow2 = flow + [3.0, 4.0]
    assert abs(endpoint_error(flow2, flow) - 5.0) < 1e-6
    img = np.arange(80, dtype=np.float32).reshape(8, 10, 1)
    shifted = warp_with_flow(img, np.full((8, 10, 2), [1.0, 0.0], np.float32))
    np.testing.assert_allclose(shifted[:, :-1, 0], img[:, 1:, 0])


def test_flow_warping_error_static_video():
    frames = np.tile(np.random.RandomState(0).rand(1, 16, 16, 3), (4, 1, 1, 1))
    zero_flow = lambda a, b: np.zeros((16, 16, 2), np.float32)
    assert flow_warping_error(frames, zero_flow) < 1e-6


def test_edit_metrics_and_harness(tmp_path):
    rng = np.random.RandomState(0)
    source = rng.rand(3, 32, 48, 3).astype(np.float32)
    masks = np.zeros((3, 32, 48), np.float32)
    masks[:, 8:20, 12:36] = 1.0
    edited = source.copy()
    edited[:, 8:20, 12:36] = rng.rand(3, 12, 24, 3)
    m = edit_sample_metrics(edited, source, masks, "", MetricsCalculator())
    assert m["background_psnr"] == float("inf")  # background untouched
    # corrupt background -> finite psnr
    edited2 = edited + 0.01
    m2 = edit_sample_metrics(np.clip(edited2, 0, 1), source, masks, "",
                             MetricsCalculator())
    assert np.isfinite(m2["background_psnr"])

    samples = [{"name": "a", "edited": edited, "source": source,
                "masks": masks, "edited_caption": ""}]
    summary = run_edit_eval(samples, EditEvalConfig(output_dir=str(tmp_path)))
    assert "background_ssim" in summary
    import os
    assert os.path.exists(tmp_path / "results.csv")

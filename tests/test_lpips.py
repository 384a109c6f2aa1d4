"""JAX-native LPIPS parity vs the torch reference forward.

Golden from tools/gen_goldens_lpips.py: the LPIPS-squeeze architecture used by
the reference's MetricsCalculator (/root/reference/evaluate/metrics.py:604)
with seeded random weights; distances for three image pairs including odd
spatial sizes (ceil-mode pooling edge cases).
"""

import numpy as np
import pytest

from videopainter_tpu.evaluate.lpips import (LpipsExtractor,
                                             convert_lpips_state_dict,
                                             lpips_forward)


@pytest.fixture(scope="module")
def lpips_golden(request):
    import pathlib

    path = pathlib.Path(__file__).parent / "goldens" / "lpips.npz"
    if not path.exists():
        pytest.skip("lpips golden missing — run tools/gen_goldens_lpips.py")
    return np.load(path)


@pytest.fixture(scope="module")
def lpips_params(lpips_golden):
    sd = {k[4:]: v for k, v in lpips_golden.items() if k.startswith("sd::")}
    return convert_lpips_state_dict(sd)


def test_lpips_golden_parity(lpips_golden, lpips_params):
    for i in range(int(lpips_golden["n_cases"])):
        a = lpips_golden[f"a{i}"][None] * 2 - 1
        b = lpips_golden[f"b{i}"][None] * 2 - 1
        d = float(lpips_forward(lpips_params, a, b)[0])
        assert abs(d - float(lpips_golden[f"d{i}"])) < 1e-4, (i, d)


def test_lpips_identity_zero(lpips_params):
    a = np.random.RandomState(0).rand(1, 48, 48, 3).astype(np.float32) * 2 - 1
    assert float(lpips_forward(lpips_params, a, a)[0]) < 1e-7


def test_lpips_extractor_npz(tmp_path, lpips_golden):
    """LpipsExtractor loads an npz state dict and matches the golden through
    the MetricsCalculator [0,1]-image contract."""
    sd = {k[4:]: v for k, v in lpips_golden.items() if k.startswith("sd::")}
    p = tmp_path / "lpips_sd.npz"
    np.savez(p, **sd)
    fn = LpipsExtractor(str(p))
    d = fn(lpips_golden["a0"], lpips_golden["b0"])
    assert abs(d - float(lpips_golden["d0"])) < 1e-4

    from videopainter_tpu.evaluate import MetricsCalculator

    calc = MetricsCalculator(lpips_fn=fn)
    mask = np.zeros(lpips_golden["a0"].shape[:2], np.float32)
    mask[8:40, 8:40] = 1.0
    out = calc.frame_metrics(lpips_golden["a0"], lpips_golden["b0"], mask=mask)
    assert "lpips" in out and "masked_lpips" in out
    assert abs(out["lpips"] - float(lpips_golden["d0"])) < 1e-4
    assert np.isfinite(out["masked_lpips"])

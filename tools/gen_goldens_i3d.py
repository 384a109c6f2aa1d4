"""I3D (FVID backbone) golden from the reference's bundled InceptionI3d port
(evaluate/metrics.py:360-598): random-normal state dict + fixed video ->
pre-logits features. Heavy external deps of metrics.py are stubbed; only the
self-contained torch InceptionI3d class is exercised.

Run offline: python tools/gen_goldens_i3d.py
Writes tests/goldens/i3d.npz.
"""

import sys
import types

import numpy as np
import torch


def _stub(name, **attrs):
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return m


class _Any:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self


_stub("clip", load=lambda *a, **k: (None, None))
_stub("openai", OpenAI=_Any)
tm = _stub("torchmetrics")
_stub("torchmetrics.image", PeakSignalNoiseRatio=_Any,
      StructuralSimilarityIndexMeasure=_Any)
_stub("torchmetrics.image.lpip", LearnedPerceptualImagePatchSimilarity=_Any)
_stub("torchmetrics.multimodal", clip_score=None)
_stub("torchmetrics.multimodal.clip_score", CLIPScore=_Any)
_stub("torchmetrics.regression", MeanAbsoluteError=_Any, MeanSquaredError=_Any)
tv = _stub("torchvision", transforms=None)
tvt = _stub("torchvision.transforms", Resize=_Any)
tv.transforms = tvt
_stub("skimage", measure=None)
_stub("skimage.measure")
_stub("skimage.metrics", structural_similarity=lambda *a, **k: 0.0)
_stub("utils", to_tensors=lambda: _Any())
try:
    import scipy  # noqa: F401
except ImportError:
    _stub("scipy", linalg=None)
    _stub("scipy.linalg")

sys.path.insert(0, "/root/reference/evaluate")
from metrics import InceptionI3d  # noqa: E402

OUT = "tests/goldens/i3d.npz"


def main():
    torch.manual_seed(0)
    model = InceptionI3d(num_classes=400, final_endpoint="Logits")
    model.eval()
    rng = np.random.RandomState(1)
    # overwrite with scaled random weights (init distributions vary) so the
    # golden exercises real (nontrivial) BN statistics
    sd = model.state_dict()
    for k, v in sd.items():
        if "running_var" in k or "num_batches" in k:
            sd[k] = torch.ones_like(v) if "var" in k else v
        elif "bn.weight" in k:
            sd[k] = torch.tensor(1 + rng.randn(*v.shape) * 0.1,
                                 dtype=torch.float32)
        else:
            sd[k] = torch.tensor(rng.randn(*v.shape) * 0.05,
                                 dtype=torch.float32)
    model.load_state_dict(sd)

    video = rng.rand(1, 3, 16, 64, 64).astype(np.float32) * 2 - 1  # [B,C,T,H,W]
    with torch.no_grad():
        feats = model.extract_features(torch.tensor(video))
    out = {"video": video, "features": feats.numpy()}
    for k, v in model.state_dict().items():
        out[f"sd::{k}"] = v.numpy()
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: features {out['features'].shape}")


if __name__ == "__main__":
    main()

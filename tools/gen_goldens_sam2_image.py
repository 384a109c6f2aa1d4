"""SAM2ImagePredictor golden: the torch single-image path (set_image ->
predict with point / box prompts, sam2_image_predictor.py:66-345) on the
same micro hi-res model as the video e2e golden.

Run offline: python tools/gen_goldens_sam2_image.py
Writes tests/goldens/sam2_image.npz.
"""

import importlib.util
import sys
import types

import numpy as np
import torch

# torchvision isn't installed; SAM2Transforms only needs ToTensor/Resize/
# Normalize, and our 64x64 input makes Resize the identity
tv = types.ModuleType("torchvision")
tvt = types.ModuleType("torchvision.transforms")


class ToTensor(torch.nn.Module):
    def forward(self, x):
        return torch.tensor(np.asarray(x, np.float32).transpose(2, 0, 1) / 255.0)

    __call__ = forward


class Resize(torch.nn.Module):
    def __init__(self, size):
        super().__init__()
        self.size = size if isinstance(size, (tuple, list)) else (size, size)

    def forward(self, x):
        assert x.shape[-2:] == tuple(self.size), "stub Resize is identity-only"
        return x


class Normalize(torch.nn.Module):
    def __init__(self, mean, std):
        super().__init__()
        self.mean = torch.tensor(mean)[:, None, None]
        self.std = torch.tensor(std)[:, None, None]

    def forward(self, x):
        return (x - self.mean) / self.std


tvt.ToTensor, tvt.Resize, tvt.Normalize = ToTensor, Resize, Normalize
tv.transforms = tvt
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.transforms", tvt)

spec = importlib.util.spec_from_file_location(
    "gen_e2e", "tools/gen_goldens_sam2_e2e_hires.py")
gen = importlib.util.module_from_spec(spec)
sys.modules["gen_e2e"] = gen
spec.loader.exec_module(gen)

from sam2.sam2_image_predictor import SAM2ImagePredictor  # noqa: E402

OUT = "tests/goldens/sam2_image.npz"


def main():
    model = gen.build_model()
    img = gen.make_video(t=1)[0]            # [64, 64, 3] uint8
    pred = SAM2ImagePredictor(model)
    # hardcoded for 1024 input in the reference; our micro model is 64
    pred._bb_feat_sizes = [(16, 16), (8, 8), (4, 4)]
    out = {"io::img": img}
    for k, v in model.state_dict().items():
        out[f"sd::{k}"] = v.detach().float().numpy()

    with torch.no_grad():
        pred.set_image(img)
        pts = np.array([[28.0, 28.0]], np.float32)
        lbl = np.array([1], np.int32)
        masks, iou, low = pred.predict(point_coords=pts, point_labels=lbl,
                                       multimask_output=True,
                                       return_logits=True)
        out["io::pt::coords"] = pts
        out["io::pt::labels"] = lbl
        out["io::pt::masks"] = np.asarray(masks)
        out["io::pt::iou"] = np.asarray(iou)
        out["io::pt::low"] = np.asarray(low)

        box = np.array([20.0, 16.0, 45.0, 40.0], np.float32)
        bmasks, biou, blow = pred.predict(box=box, multimask_output=False,
                                          return_logits=True)
        out["io::box::box"] = box
        out["io::box::masks"] = np.asarray(bmasks)
        out["io::box::iou"] = np.asarray(biou)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: point iou={out['io::pt::iou']}, "
          f"box iou={out['io::box::iou']}")


if __name__ == "__main__":
    main()

"""Automatic-mask-generator behavioral golden: torch SAM2AutomaticMaskGenerator
(app/sam2/automatic_mask_generator.py) on the micro hi-res model with an
8x8 point grid. torchvision's batched_nms is stubbed with a faithful greedy
NMS (sort by score, suppress IoU>thresh - torchvision semantics for one
category).

Run offline: python tools/gen_goldens_amg.py
Writes tests/goldens/amg.npz (masks + scores after NMS).
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import torch


def _box_iou_matrix(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def _nms(boxes, scores, thresh):
    order = torch.argsort(scores, descending=True)
    keep = []
    iou = _box_iou_matrix(boxes, boxes)
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return torch.tensor(keep, dtype=torch.long)


def _batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    offsets = idxs.to(boxes) * (boxes.max() + 1)
    return _nms(boxes + offsets[:, None], scores, iou_threshold)


tvo = types.ModuleType("torchvision.ops.boxes")
tvo.batched_nms = _batched_nms
tvo.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
class _ToTensor(torch.nn.Module):
    def forward(self, x):
        return torch.tensor(np.asarray(x, np.float32).transpose(2, 0, 1) / 255.0)

    __call__ = forward


class _Resize(torch.nn.Module):
    def __init__(self, size):
        super().__init__()

    def forward(self, x):
        return x  # identity: inputs are already image_size


class _Normalize(torch.nn.Module):
    def __init__(self, mean, std):
        super().__init__()
        self.mean = torch.tensor(mean)[:, None, None]
        self.std = torch.tensor(std)[:, None, None]

    def forward(self, x):
        return (x - self.mean) / self.std


tv = types.ModuleType("torchvision")
tvops = types.ModuleType("torchvision.ops")
tvt = types.ModuleType("torchvision.transforms")
tvt.ToTensor, tvt.Resize, tvt.Normalize = _ToTensor, _Resize, _Normalize
tvops.boxes = tvo
tv.ops = tvops
tv.transforms = tvt
for name, mod in [("torchvision", tv), ("torchvision.ops", tvops),
                  ("torchvision.ops.boxes", tvo),
                  ("torchvision.transforms", tvt)]:
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules.setdefault(name, mod)

spec = importlib.util.spec_from_file_location(
    "gen_e2e", "tools/gen_goldens_sam2_e2e_hires.py")
gen = importlib.util.module_from_spec(spec)
sys.modules["gen_e2e"] = gen
spec.loader.exec_module(gen)

from sam2.automatic_mask_generator import SAM2AutomaticMaskGenerator  # noqa: E402

OUT = "tests/goldens/amg.npz"


def main():
    model = gen.build_model()
    img = gen.make_video(t=1)[0]
    amg = SAM2AutomaticMaskGenerator(
        model, points_per_side=8, points_per_batch=16,
        pred_iou_thresh=0.45, stability_score_thresh=0.0,
        stability_score_offset=1.0, box_nms_thresh=0.7,
        crop_n_layers=0, min_mask_region_area=0, multimask_output=True)
    amg.predictor._bb_feat_sizes = [(16, 16), (8, 8), (4, 4)]
    with torch.no_grad():
        anns = amg.generate(img)
    anns.sort(key=lambda a: -a["predicted_iou"])
    out = {"io::img": img, "n_masks": np.array(len(anns))}
    for i, a in enumerate(anns):
        out[f"mask::{i}"] = a["segmentation"].astype(np.uint8)
        out[f"iou::{i}"] = np.float32(a["predicted_iou"])
        out[f"stab::{i}"] = np.float32(a["stability_score"])
    for k, v in model.state_dict().items():
        out[f"sd::{k}"] = v.detach().float().numpy()
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(anns)} masks, "
          f"ious={[round(float(a['predicted_iou']), 3) for a in anns]}")


if __name__ == "__main__":
    main()

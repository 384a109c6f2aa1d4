"""LPIPS golden: torch reference forward (SqueezeNet-1.1 trunk + LPIPS heads)
with seeded random weights -> distances for several image pairs.

The reference uses torchmetrics' LearnedPerceptualImagePatchSimilarity
(net_type='squeeze') (/root/reference/evaluate/metrics.py:604), which vendors
the LPIPS architecture of richzhang/PerceptualSimilarity. Neither torchmetrics
nor the lpips package is installed in this environment, so this tool contains
a faithful torch recreation of that forward pass (same module layout and
state-dict naming as the lpips package, so the converter also accepts real
checkpoints) and uses random weights as the numerics oracle.

Run offline: python tools/gen_goldens_lpips.py
Writes tests/goldens/lpips.npz.
"""

import numpy as np
import torch
import torch.nn as nn

OUT = "tests/goldens/lpips.npz"


class Fire(nn.Module):
    def __init__(self, inp, sq, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(inp, sq, 1)
        self.squeeze_activation = nn.ReLU(inplace=True)
        self.expand1x1 = nn.Conv2d(sq, e1, 1)
        self.expand1x1_activation = nn.ReLU(inplace=True)
        self.expand3x3 = nn.Conv2d(sq, e3, 3, padding=1)
        self.expand3x3_activation = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([self.expand1x1_activation(self.expand1x1(x)),
                          self.expand3x3_activation(self.expand3x3(x))], 1)


class SqueezeSlices(nn.Module):
    """squeezenet1_1 `features` split into the 7 LPIPS slices (lpips
    pretrained_networks.squeezenet layout + naming)."""

    def __init__(self):
        super().__init__()
        pool = lambda: nn.MaxPool2d(3, stride=2, ceil_mode=True)  # noqa: E731
        self.slice1 = nn.Sequential(nn.Conv2d(3, 64, 3, stride=2),
                                    nn.ReLU(inplace=True))
        self.slice2 = nn.Sequential(pool(), Fire(64, 16, 64, 64),
                                    Fire(128, 16, 64, 64))
        self.slice3 = nn.Sequential(pool(), Fire(128, 32, 128, 128),
                                    Fire(256, 32, 128, 128))
        self.slice4 = nn.Sequential(pool(), Fire(256, 48, 192, 192))
        self.slice5 = nn.Sequential(Fire(384, 48, 192, 192))
        self.slice6 = nn.Sequential(Fire(384, 64, 256, 256))
        self.slice7 = nn.Sequential(Fire(512, 64, 256, 256))

    def forward(self, x):
        taps = []
        for k in range(1, 8):
            x = getattr(self, f"slice{k}")(x)
            taps.append(x)
        return taps


class NetLinLayer(nn.Module):
    def __init__(self, chn):
        super().__init__()
        self.model = nn.Sequential(nn.Dropout(),
                                   nn.Conv2d(chn, 1, 1, bias=False))


class LPIPS(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])
        self.net = SqueezeSlices()
        chns = [64, 128, 256, 384, 384, 512, 512]
        for k, c in enumerate(chns):
            setattr(self, f"lin{k}", NetLinLayer(c))

    def forward(self, in0, in1):  # inputs in [-1, 1], NCHW
        f0 = self.net((in0 - self.shift) / self.scale)
        f1 = self.net((in1 - self.shift) / self.scale)
        val = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = getattr(self, f"lin{k}").model((a - b) ** 2)
            val = val + d.mean([2, 3], keepdim=True)
        return val


def main():
    torch.manual_seed(0)
    model = LPIPS().eval()
    rng = np.random.RandomState(1)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.startswith(("shift", "scale")):
            continue
        if "lin" in k:  # heads: nonnegative like the real checkpoints
            sd[k] = torch.tensor(np.abs(rng.randn(*v.shape)) * 0.1,
                                 dtype=torch.float32)
        else:
            sd[k] = torch.tensor(rng.randn(*v.shape) * 0.08,
                                 dtype=torch.float32)
    model.load_state_dict(sd)

    # odd sizes exercise ceil-mode pooling + the valid stride-2 stem conv
    cases = []
    for i, (h, w) in enumerate([(64, 64), (65, 63), (96, 130)]):
        a = rng.rand(h, w, 3).astype(np.float32)
        b = np.clip(a + rng.randn(h, w, 3).astype(np.float32) * 0.1, 0, 1)
        cases.append((a, b))
    out = {}
    with torch.no_grad():
        for i, (a, b) in enumerate(cases):
            ta = torch.tensor(a.transpose(2, 0, 1))[None] * 2 - 1
            tb = torch.tensor(b.transpose(2, 0, 1))[None] * 2 - 1
            d = float(model(ta, tb).flatten()[0])
            out[f"a{i}"], out[f"b{i}"], out[f"d{i}"] = a, b, np.float32(d)
    out["n_cases"] = np.int32(len(cases))
    for k, v in model.state_dict().items():
        out[f"sd::{k}"] = v.numpy()
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: " + ", ".join(f"d{i}={out[f'd{i}']:.6f}"
                                       for i in range(len(cases))))


if __name__ == "__main__":
    main()

"""Measure the PyTorch-CPU baseline for BASELINE.md.

The reference repo records no throughput numbers (SURVEY.md §6) and cannot
be imported here (its vendored smp needs timm/pretrainedmodels, absent).
This harness builds an architecturally identical SegCD
(resnet50-bottleneck encoder, unet decoder (256,128,64,32,16), shared
1-ch head, double encode/decode + abs/min fusion — the hot path of
segmentation_models_pytorch/decoders/unet/model.py:316-332) in plain
torch and measures train-step pairs/sec on CPU with the reference's
config (Adam lr=1e-3, bs=4, 256x256, BCE+Dice on sigmoid).

Writes benchmarks/baseline_measured.json; bench.py reads it for
vs_baseline.
"""

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.set_num_threads(os.cpu_count() or 1)
torch.manual_seed(1337)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


def make_layer(cin, width, blocks, stride):
    layers = [Bottleneck(cin, width, stride)]
    for _ in range(blocks - 1):
        layers.append(Bottleneck(width * 4, width))
    return nn.Sequential(*layers)


class ResNet50Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = make_layer(64, 64, 3, 1)
        self.layer2 = make_layer(256, 128, 4, 2)
        self.layer3 = make_layer(512, 256, 6, 2)
        self.layer4 = make_layer(1024, 512, 3, 2)

    def forward(self, x):
        f0 = x
        f1 = F.relu(self.bn1(self.conv1(x)))
        f2 = self.layer1(self.maxpool(f1))
        f3 = self.layer2(f2)
        f4 = self.layer3(f3)
        f5 = self.layer4(f4)
        return [f0, f1, f2, f3, f4, f5]


class ConvBnRelu(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class DecoderBlock(nn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.conv1 = ConvBnRelu(cin + cskip, cout)
        self.conv2 = ConvBnRelu(cout, cout)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], 1)
        return self.conv2(self.conv1(x))


class UnetDecoder(nn.Module):
    def __init__(self, enc=(3, 64, 256, 512, 1024, 2048),
                 dec=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = enc[1:][::-1]
        cins = [enc[0]] + list(dec[:-1])
        cskips = list(enc[1:]) + [0]
        self.blocks = nn.ModuleList([DecoderBlock(i, s, o)
                                     for i, s, o in zip(cins, cskips, dec)])

    def forward(self, feats):
        feats = feats[1:][::-1]
        x, skips = feats[0], feats[1:]
        for i, b in enumerate(self.blocks):
            x = b(x, skips[i] if i < len(skips) else None)
        return x


class SegCDTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = ResNet50Encoder()
        self.decoder = UnetDecoder()
        self.head = nn.Conv2d(16, 1, 3, 1, 1)

    def forward(self, a, b):
        d1 = self.decoder(self.encoder(a))
        d2 = self.decoder(self.encoder(b))
        m1, m2 = self.head(d1), self.head(d2)
        diffea = self.head(torch.abs(d1 - d2))
        diffseg = torch.abs(m1 - m2)
        return m1, m2, torch.min(diffea, diffseg)


def bce_dice(p, t):
    bce = F.binary_cross_entropy(p, t)
    inter = (p.reshape(-1) * t.reshape(-1)).sum()
    dice = 1 - (2 * inter + 1) / (p.sum() + t.sum() + 1)
    return bce + dice


def main(batch=4, size=256, iters=5, warmup=2):
    model = SegCDTorch()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    a = torch.randn(batch, 3, size, size)
    b = torch.randn(batch, 3, size, size)
    t = (torch.rand(batch, 1, size, size) > 0.8).float()

    def step():
        opt.zero_grad()
        _, _, diff = model(a, b)
        loss = bce_dice(torch.sigmoid(diff), t)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * iters / dt
    out = {
        "metric": "pairs_per_sec_cpu_torch",
        "value": pairs_per_sec,
        "config": {"batch": batch, "size": size, "iters": iters,
                   "threads": torch.get_num_threads()},
        "params_m": sum(p.numel() for p in model.parameters()) / 1e6,
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

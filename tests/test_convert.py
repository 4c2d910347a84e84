"""Golden parity: torch resnet18 forward (built inline with torchvision
naming) == our ResNetEncoder with converted weights. Validates the stage
contract, conv padding, BN eval math, maxpool AND the converter."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from stcd_tpu.convert.torch_to_flax import convert_resnet, convert_vgg16_features
from stcd_tpu.encoders.resnet import ResNetEncoder
from stcd_tpu.encoders.vgg import VGG16Features

torch.manual_seed(0)


class TVBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class TVResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TVBasicBlock(64, 64), TVBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TVBasicBlock(64, 128, 2), TVBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TVBasicBlock(128, 256, 2), TVBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TVBasicBlock(256, 512, 2), TVBasicBlock(512, 512))

    def forward(self, x):
        f1 = F.relu(self.bn1(self.conv1(x)))
        f2 = self.layer1(self.maxpool(f1))
        f3 = self.layer2(f2)
        f4 = self.layer3(f3)
        f5 = self.layer4(f4)
        return [x, f1, f2, f3, f4, f5]


def _randomize_bn_stats(model):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)


def test_resnet18_forward_parity(np_rng):
    tv = TVResNet18().eval()
    _randomize_bn_stats(tv)
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_resnet(sd, (2, 2, 2, 2))

    x = np_rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_feats = tv(torch.tensor(x))

    enc = ResNetEncoder(arch="resnet18")
    variables = {"params": params, "batch_stats": stats}
    feats = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats) == 6
    for i, (ours, theirs) in enumerate(zip(feats, torch_feats)):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, err_msg=f"stage {i}")


def test_vgg16_features_parity(np_rng):
    convs = []
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU())
            cin = v
    features = nn.Sequential(*layers).eval()
    sd = {f"features.{i}.{p}": t.numpy()
          for i, m in enumerate(features) if isinstance(m, nn.Conv2d)
          for p, t in m.state_dict().items()}
    params = convert_vgg16_features(sd)

    x = np_rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    taps = []
    h = torch.tensor(x)
    with torch.no_grad():
        for i, m in enumerate(features):
            h = m(h)
            if i in {3, 8, 15, 22, 29}:
                taps.append(h)
    ours = VGG16Features().apply({"params": params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(ours) == len(taps) == 5
    for i, (o, t) in enumerate(zip(ours, taps)):
        np.testing.assert_allclose(np.asarray(o),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4, err_msg=f"tap {i}")

"""Golden forward parity for encoder families whose upstream torch
implementations (Cadene pretrainedmodels, efficientnet_pytorch) are not
importable on this host: torch TWINS written here from the upstream
semantics — TF asymmetric SAME padding, ceil-mode stem pooling,
stride-on-conv1 SE bottlenecks, BN eps 1e-3 — validate our JAX encoders
numerically (the shape-only zoo tests cannot see padding/pooling window
misalignments; three such bugs were found by review in exactly these
families).

PROVENANCE NOTE (weaker guarantee than the ref-file goldens): these are
builder-authored twins, not the upstream code — a misunderstanding encoded
identically on both sides would pass. Mitigations: (1) every registered
name's out_channels is mechanically cross-checked against the reference's
own encoder tables in test_encoder_registry_crosscheck.py (zero
divergences), (2) checkpoint-key coverage is pinned by the upstream-naming
converter tests in test_convert_zoo.py, and (3) the families whose
reference files ARE loadable standalone (mix_transformer, mobileone, and
the whole bespoke zoo via tests/_ref_stubs.py) are golden-tested against
the reference's actual code instead."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


def _conv_w(w):
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _bn_params(bn):
    return ({"scale": bn.weight.detach().numpy(),
             "bias": bn.bias.detach().numpy()},
            {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()})


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.6, 1.4)
                mod.weight.normal_(1.0, 0.1)
                mod.bias.normal_(0, 0.1)


# ---------------------------------------------------------------------------
# se_resnet50 twin (Cadene senet.py semantics)
# ---------------------------------------------------------------------------

class TSEModule(tnn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        self.fc1 = tnn.Conv2d(c, c // reduction, 1)
        self.fc2 = tnn.Conv2d(c // reduction, c, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class TSEResNetBottleneck(tnn.Module):
    def __init__(self, in_c, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_c, planes, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.se = TSEModule(planes * 4)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.se(self.bn3(self.conv3(h)))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


class TSEResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        layers = []
        in_c = 64
        for li, (planes, n, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))):
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_c != planes * 4)
                blocks.append(TSEResNetBottleneck(in_c, planes, s, down))
                in_c = planes * 4
            layers.append(tnn.Sequential(*blocks))
        self.layers = tnn.ModuleList(layers)

    def forward(self, x):
        feats = [x]
        h = F.relu(self.bn1(self.conv1(x)))
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, 0, ceil_mode=True)  # Cadene ceil-mode pool
        for layer in self.layers:
            h = layer(h)
            feats.append(h)
        return feats


def _convert_se_resnet50(tv):
    p, s = {}, {}
    p["stem_conv1"] = {"kernel": _conv_w(tv.conv1.weight)}
    p["stem_bn1"], s["stem_bn1"] = _bn_params(tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            bp, bs = {}, {}
            for n in (1, 2, 3):
                bp[f"conv{n}"] = {"kernel": _conv_w(getattr(blk, f"conv{n}").weight)}
                bp[f"bn{n}"], bs[f"bn{n}"] = _bn_params(getattr(blk, f"bn{n}"))
            bp["se"] = {
                "fc1": {"kernel": _conv_w(blk.se.fc1.weight),
                        "bias": blk.se.fc1.bias.detach().numpy()},
                "fc2": {"kernel": _conv_w(blk.se.fc2.weight),
                        "bias": blk.se.fc2.bias.detach().numpy()}}
            if blk.down is not None:
                bp["downsample_conv"] = {"kernel": _conv_w(blk.down[0].weight)}
                bp["downsample_bn"], bs["downsample_bn"] = _bn_params(blk.down[1])
            p[f"layer{li}_block{bi}"] = bp
            s[f"layer{li}_block{bi}"] = bs
    return p, s


def test_se_resnet50_forward_parity():
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(4)
    tv = TSEResNet50()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 63, 63)).astype(np.float32)  # odd size:
    # exercises the ceil-mode pool's asymmetric windows
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_se_resnet50(tv)
    enc, _ = get_encoder("se_resnet50")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=3e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# efficientnet-b0 twin (efficientnet_pytorch semantics: TF SAME padding,
# swish, SE on input-channel budget, BN eps 1e-3)
# ---------------------------------------------------------------------------

def _same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    pad_h = max((-(-ih // s) - 1) * s + k - ih, 0)
    pad_w = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                     pad_h // 2, pad_h - pad_h // 2))


def _swish(x):
    return x * torch.sigmoid(x)


class TMBConv(tnn.Module):
    def __init__(self, in_c, out_c, k, stride, expand, se_ratio):
        super().__init__()
        self.k, self.stride = k, stride
        exp_c = in_c * expand
        self.expand_conv = (tnn.Conv2d(in_c, exp_c, 1, bias=False)
                            if expand != 1 else None)
        self.expand_bn = tnn.BatchNorm2d(exp_c, eps=1e-3) if expand != 1 else None
        self.dw = tnn.Conv2d(exp_c, exp_c, k, stride=stride, groups=exp_c,
                             bias=False)
        self.dw_bn = tnn.BatchNorm2d(exp_c, eps=1e-3)
        rd = max(1, int(in_c * se_ratio))
        self.se_reduce = tnn.Conv2d(exp_c, rd, 1)
        self.se_expand = tnn.Conv2d(rd, exp_c, 1)
        self.project = tnn.Conv2d(exp_c, out_c, 1, bias=False)
        self.project_bn = tnn.BatchNorm2d(out_c, eps=1e-3)
        self.skip = stride == 1 and in_c == out_c

    def forward(self, x):
        h = x
        if self.expand_conv is not None:
            h = _swish(self.expand_bn(self.expand_conv(h)))
        if getattr(self, "use_same_pad", True):
            h = _swish(self.dw_bn(self.dw(_same_pad(h, self.k, self.stride))))
        else:
            # dilated-twin mode: the ref patch replaces static SAME padding
            # with Identity; the conv's own (patched) padding applies
            h = _swish(self.dw_bn(self.dw(h)))
        s = F.adaptive_avg_pool2d(h, 1)
        s = torch.sigmoid(self.se_expand(_swish(self.se_reduce(s))))
        h = h * s
        h = self.project_bn(self.project(h))
        return h + x if self.skip else h


class TEffNetB0(tnn.Module):
    def __init__(self, base_blocks, stage_ends):
        """stage_ends: FLAT block indices (exclusive) ending smp stages
        2..5 — the reference's per-variant stage_idxs table
        (ref efficientnet.py:104-176; b0 = (3, 5, 9, 16), which puts the
        stage4/5 boundary one block INTO the 112-channel group)."""
        super().__init__()
        self.stage_ends = set(stage_ends)
        self.stem = tnn.Conv2d(3, 32, 3, stride=2, bias=False)
        self.stem_bn = tnn.BatchNorm2d(32, eps=1e-3)
        blocks = []
        self.group_of_block = []
        in_c = 32
        for gi, (k, r, s, e, _ic, oc, se) in enumerate(base_blocks):
            for i in range(r):
                blocks.append(TMBConv(in_c, oc, k, s if i == 0 else 1, e, se))
                self.group_of_block.append(gi)
                in_c = oc
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        feats = [x]
        h = _swish(self.stem_bn(self.stem(_same_pad(x, 3, 2))))
        feats.append(h)
        for bi, blk in enumerate(self.blocks):
            h = blk(h)
            if bi + 1 in self.stage_ends:
                feats.append(h)
        return feats


def _convert_effnet(tv):
    p = {"stem_conv": {"kernel": _conv_w(tv.stem.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn_params(tv.stem_bn)
    for bi, blk in enumerate(tv.blocks):
        bp, bs = {}, {}
        if blk.expand_conv is not None:
            bp["expand_conv"] = {"kernel": _conv_w(blk.expand_conv.weight)}
            bp["expand_bn"], bs["expand_bn"] = _bn_params(blk.expand_bn)
        bp["dw_conv"] = {"kernel": _conv_w(blk.dw.weight)}
        bp["dw_bn"], bs["dw_bn"] = _bn_params(blk.dw_bn)
        bp["se_reduce"] = {"kernel": _conv_w(blk.se_reduce.weight),
                           "bias": blk.se_reduce.bias.detach().numpy()}
        bp["se_expand"] = {"kernel": _conv_w(blk.se_expand.weight),
                           "bias": blk.se_expand.bias.detach().numpy()}
        bp["project_conv"] = {"kernel": _conv_w(blk.project.weight)}
        bp["project_bn"], bs["project_bn"] = _bn_params(blk.project_bn)
        p[f"block{bi}"] = bp
        s[f"block{bi}"] = bs
    return p, s


def test_efficientnet_b0_forward_parity():
    from stcd_tpu.encoders import get_encoder
    from stcd_tpu.encoders.efficientnet import _BASE_BLOCKS, _REF_STAGE_IDXS

    torch.manual_seed(6)
    tv = TEffNetB0(_BASE_BLOCKS, _REF_STAGE_IDXS["b0"])
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 3, 66, 66)).astype(np.float32)  # even size
    # after stride 2 -> TF SAME pads asymmetrically; symmetric k//2 differs
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_effnet(tv)
    enc, _ = get_encoder("efficientnet-b0")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# densenet121 twin (torchvision DenseNet + smp TransitionWithSkip taps)
# ---------------------------------------------------------------------------

class TDenseLayer(tnn.Module):
    def __init__(self, in_c, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(in_c)
        self.conv1 = tnn.Conv2d(in_c, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(F.relu(self.norm1(x)))
        h = self.conv2(F.relu(self.norm2(h)))
        return torch.cat([x, h], 1)


class TDenseNet121(tnn.Module):
    def __init__(self, init=64, growth=32, blocks=(6, 12, 24, 16)):
        super().__init__()
        self.conv0 = tnn.Conv2d(3, init, 7, stride=2, padding=3, bias=False)
        self.norm0 = tnn.BatchNorm2d(init)
        c = init
        self.blocks = tnn.ModuleList()
        self.trans_norm = tnn.ModuleList()
        self.trans_conv = tnn.ModuleList()
        for i, n in enumerate(blocks):
            layers = tnn.ModuleList()
            for _ in range(n):
                layers.append(TDenseLayer(c, growth))
                c += growth
            self.blocks.append(layers)
            if i < len(blocks) - 1:
                self.trans_norm.append(tnn.BatchNorm2d(c))
                self.trans_conv.append(tnn.Conv2d(c, c // 2, 1, bias=False))
                c = c // 2
        self.norm5 = tnn.BatchNorm2d(c)

    def forward(self, x):
        feats = [x]
        h = F.relu(self.norm0(self.conv0(x)))
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, 1)
        for i, layers in enumerate(self.blocks):
            for l in layers:
                h = l(h)
            if i < len(self.blocks) - 1:
                h = F.relu(self.trans_norm[i](h))
                feats.append(h)  # smp TransitionWithSkip: skip pre-conv/pool
                h = F.avg_pool2d(self.trans_conv[i](h), 2)
            else:
                feats.append(F.relu(self.norm5(h)))
        return feats


def _convert_densenet(tv):
    p = {"conv0": {"kernel": _conv_w(tv.conv0.weight)}}
    s = {}
    p["norm0"], s["norm0"] = _bn_params(tv.norm0)
    for i, layers in enumerate(tv.blocks, start=1):
        bp, bs = {}, {}
        for j, l in enumerate(layers, start=1):
            lp = {"conv1": {"kernel": _conv_w(l.conv1.weight)},
                  "conv2": {"kernel": _conv_w(l.conv2.weight)}}
            ls = {}
            lp["norm1"], ls["norm1"] = _bn_params(l.norm1)
            lp["norm2"], ls["norm2"] = _bn_params(l.norm2)
            bp[f"denselayer{j}"], bs[f"denselayer{j}"] = lp, ls
        p[f"denseblock{i}"], s[f"denseblock{i}"] = bp, bs
        if i <= len(tv.trans_norm):
            p[f"transition{i}_norm"], s[f"transition{i}_norm"] = _bn_params(
                tv.trans_norm[i - 1])
            p[f"transition{i}_conv"] = {"kernel": _conv_w(tv.trans_conv[i - 1].weight)}
    p["norm5"], s["norm5"] = _bn_params(tv.norm5)
    return p, s


def test_densenet121_forward_parity():
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(8)
    tv = TDenseNet121()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_densenet(tv)
    enc, ch = get_encoder("densenet121")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    assert tuple(g.shape[-1] for g in got) == tuple(ch)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# mobilenet_v2 twin (torchvision semantics)
# ---------------------------------------------------------------------------

class TInvertedResidual(tnn.Module):
    def __init__(self, in_c, out_c, t, stride):
        super().__init__()
        exp = in_c * t
        self.expand = None
        if t != 1:
            self.expand = tnn.Conv2d(in_c, exp, 1, bias=False)
            self.expand_bn = tnn.BatchNorm2d(exp)
        self.dw = tnn.Conv2d(exp, exp, 3, stride=stride, padding=1,
                             groups=exp, bias=False)
        self.dw_bn = tnn.BatchNorm2d(exp)
        self.project = tnn.Conv2d(exp, out_c, 1, bias=False)
        self.project_bn = tnn.BatchNorm2d(out_c)
        self.skip = stride == 1 and in_c == out_c

    def forward(self, x):
        h = x
        if self.expand is not None:
            h = F.relu6(self.expand_bn(self.expand(h)))
        h = F.relu6(self.dw_bn(self.dw(h)))
        h = self.project_bn(self.project(h))
        return h + x if self.skip else h


class TMobileNetV2(tnn.Module):
    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self):
        super().__init__()
        self.stem = tnn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False)
        self.stem_bn = tnn.BatchNorm2d(32)
        blocks, in_c = [], 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                blocks.append(TInvertedResidual(in_c, c, t, s if i == 0 else 1))
                in_c = c
        self.blocks = tnn.ModuleList(blocks)
        self.final = tnn.Conv2d(in_c, 1280, 1, bias=False)
        self.final_bn = tnn.BatchNorm2d(1280)

    def forward(self, x):
        feats = [x]
        h = F.relu6(self.stem_bn(self.stem(x)))
        for bi, blk in enumerate(self.blocks, start=1):
            h = blk(h)
            if bi in (1, 3, 6, 13):  # smp stage splits [:2],[2:4],[4:7],[7:14]
                feats.append(h)
        feats.append(F.relu6(self.final_bn(self.final(h))))
        return feats


def _convert_mobilenet_v2(tv):
    p = {"stem_conv": {"kernel": _conv_w(tv.stem.weight)},
         "final_conv": {"kernel": _conv_w(tv.final.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn_params(tv.stem_bn)
    p["final_bn"], s["final_bn"] = _bn_params(tv.final_bn)
    for bi, blk in enumerate(tv.blocks, start=1):
        bp, bs = {}, {}
        if blk.expand is not None:
            bp["expand_conv"] = {"kernel": _conv_w(blk.expand.weight)}
            bp["expand_bn"], bs["expand_bn"] = _bn_params(blk.expand_bn)
        bp["dw_conv"] = {"kernel": _conv_w(blk.dw.weight)}
        bp["dw_bn"], bs["dw_bn"] = _bn_params(blk.dw_bn)
        bp["project_conv"] = {"kernel": _conv_w(blk.project.weight)}
        bp["project_bn"], bs["project_bn"] = _bn_params(blk.project_bn)
        p[f"block{bi}"], s[f"block{bi}"] = bp, bs
    return p, s


def test_mobilenet_v2_forward_parity():
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(10)
    tv = TMobileNetV2()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_mobilenet_v2(tv)
    enc, ch = get_encoder("mobilenet_v2")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    assert tuple(g.shape[-1] for g in got) == tuple(ch)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# res2net50_26w_4s twin (timm res2net.Bottle2neck semantics)
# ---------------------------------------------------------------------------

class TBottle2neck(tnn.Module):
    def __init__(self, in_c, planes, base_width=26, scale=4, stride=1,
                 downsample=False):
        super().__init__()
        width = int((planes * base_width) // 64)
        self.scale, self.stride = scale, stride
        self.is_first = stride > 1 or downsample
        self.conv1 = tnn.Conv2d(in_c, width * scale, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width * scale)
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
             for _ in range(max(1, scale - 1))])
        self.bns = tnn.ModuleList(
            [tnn.BatchNorm2d(width) for _ in range(max(1, scale - 1))])
        self.conv3 = tnn.Conv2d(width * scale, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.pool = tnn.AvgPool2d(3, stride, padding=1)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        spx = torch.chunk(h, self.scale, 1)
        outs, sp = [], None
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            sp = spx[i] if (i == 0 or self.is_first) else sp + spx[i]
            sp = F.relu(bn(conv(sp)))
            outs.append(sp)
        if self.scale > 1:
            outs.append(self.pool(spx[-1]) if self.is_first else spx[-1])
        h = self.bn3(self.conv3(torch.cat(outs, 1)))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


class TRes2Net50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.layers = tnn.ModuleList()
        in_c = 64
        for planes, n, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2),
                                  (512, 3, 2)):
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_c != planes * 4)
                blocks.append(TBottle2neck(in_c, planes, stride=s,
                                           downsample=down))
                in_c = planes * 4
            self.layers.append(tnn.Sequential(*blocks))

    def forward(self, x):
        feats = [x]
        h = F.relu(self.bn1(self.conv1(x)))
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, 1)
        for layer in self.layers:
            h = layer(h)
            feats.append(h)
        return feats


def _convert_res2net(tv):
    p = {"stem_conv1": {"kernel": _conv_w(tv.conv1.weight)}}
    s = {}
    p["stem_bn1"], s["stem_bn1"] = _bn_params(tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            bp, bs = {}, {}
            bp["conv1"] = {"kernel": _conv_w(blk.conv1.weight)}
            bp["bn1"], bs["bn1"] = _bn_params(blk.bn1)
            for i, (conv, bn) in enumerate(zip(blk.convs, blk.bns)):
                bp[f"conv2_{i}"] = {"kernel": _conv_w(conv.weight)}
                bp[f"bn2_{i}"], bs[f"bn2_{i}"] = _bn_params(bn)
            bp["conv3"] = {"kernel": _conv_w(blk.conv3.weight)}
            bp["bn3"], bs["bn3"] = _bn_params(blk.bn3)
            if blk.down is not None:
                bp["downsample_conv"] = {"kernel": _conv_w(blk.down[0].weight)}
                bp["downsample_bn"], bs["downsample_bn"] = _bn_params(blk.down[1])
            p[f"layer{li}_block{bi}"] = bp
            s[f"layer{li}_block{bi}"] = bs
    return p, s


def test_res2net50_forward_parity():
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(12)
    tv = TRes2Net50()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(13)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_res2net(tv)
    enc, ch = get_encoder("timm-res2net50_26w_4s")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# dpn68 twin (Cadene pretrainedmodels dpn.py semantics: pre-activated
# BnActConv2d everywhere, dual residual+dense paths, BN eps 1e-3)
# ---------------------------------------------------------------------------

class TBnAct(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn = tnn.BatchNorm2d(c, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(x))


class TDualPathBlock(tnn.Module):
    def __init__(self, in_c, r, bw, inc, groups, block_type):
        super().__init__()
        self.bw, self.inc = bw, inc
        stride = 2 if block_type == "down" else 1
        self.stride = stride
        self.proj = block_type in ("proj", "down")
        if self.proj:
            self.w_bn = TBnAct(in_c)
            self.w = tnn.Conv2d(in_c, bw + 2 * inc, 1, stride=stride, bias=False)
        self.a_bn = TBnAct(in_c)
        self.a = tnn.Conv2d(in_c, r, 1, bias=False)
        self.b_bn = TBnAct(r)
        self.b = tnn.Conv2d(r, r, 3, stride=stride, padding=1, groups=groups,
                            bias=False)
        self.c_bn = TBnAct(r)
        self.c = tnn.Conv2d(r, bw + inc, 1, bias=False)

    def forward(self, x):
        x_in = torch.cat(x, 1) if isinstance(x, tuple) else x
        if self.proj:
            w = self.w(self.w_bn(x_in))
            s1, s2 = w[:, :self.bw], w[:, self.bw:]
        else:
            s1, s2 = x
        h = self.a(self.a_bn(x_in))
        h = self.b(self.b_bn(h))
        h = self.c(self.c_bn(h))
        out1, out2 = h[:, :self.bw], h[:, self.bw:]
        return s1 + out1, torch.cat([s2, out2], 1)


class TDPN68(tnn.Module):
    K_SEC, INC = (3, 4, 12, 3), (16, 32, 32, 64)

    def __init__(self):
        super().__init__()
        self.stem = tnn.Conv2d(3, 10, 3, stride=2, padding=1, bias=False)
        self.stem_bn = tnn.BatchNorm2d(10, eps=1e-3)
        self.groups_list = tnn.ModuleList()
        in_c = 10
        for i in range(4):
            bw = 64 * (2 ** i)  # small: bw factor 1
            r = (128 * bw) // 64
            inc = self.INC[i]
            blocks = [TDualPathBlock(in_c, r, bw, inc, 32,
                                     "proj" if i == 0 else "down")]
            in_c = bw + 3 * inc
            for _ in range(1, self.K_SEC[i]):
                blocks.append(TDualPathBlock(in_c, r, bw, inc, 32, "normal"))
                in_c += inc
            self.groups_list.append(tnn.ModuleList(blocks))
        self.final_bn = tnn.BatchNorm2d(in_c, eps=1e-3)

    def forward(self, x):
        feats = [x]
        h = F.relu(self.stem_bn(self.stem(x)))
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, 1)
        for i, blocks in enumerate(self.groups_list):
            for blk in blocks:
                h = blk(h)
            cat = torch.cat(h, 1)
            feats.append(F.relu(self.final_bn(cat)) if i == 3 else F.relu(cat))
        return feats


def _convert_dpn68(tv):
    p = {"stem_conv": {"kernel": _conv_w(tv.stem.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn_params(tv.stem_bn)
    for i, blocks in enumerate(tv.groups_list):
        for j, blk in enumerate(blocks, start=1):
            bp, bs = {}, {}
            if blk.proj:
                bp["c1x1_w"] = {"kernel": _conv_w(blk.w.weight)}
                bp["c1x1_w_bn"], bs["c1x1_w_bn"] = _bn_params(blk.w_bn.bn)
            bp["c1x1_a"] = {"kernel": _conv_w(blk.a.weight)}
            bp["c1x1_a_bn"], bs["c1x1_a_bn"] = _bn_params(blk.a_bn.bn)
            bp["c3x3_b"] = {"kernel": _conv_w(blk.b.weight)}
            bp["c3x3_b_bn"], bs["c3x3_b_bn"] = _bn_params(blk.b_bn.bn)
            bp["c1x1_c"] = {"kernel": _conv_w(blk.c.weight)}
            bp["c1x1_c_bn"], bs["c1x1_c_bn"] = _bn_params(blk.c_bn.bn)
            p[f"conv{i + 2}_{j}"] = bp
            s[f"conv{i + 2}_{j}"] = bs
    p["final_bn"], s["final_bn"] = _bn_params(tv.final_bn)
    return p, s


def test_dpn68_forward_parity():
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(14)
    tv = TDPN68()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(15)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_dpn68(tv)
    enc, ch = get_encoder("dpn68")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    assert tuple(g.shape[-1] for g in got) == tuple(ch)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# mobileone_s0: TRUE golden vs the reference's own vendored implementation
# (encoders/mobileone.py is torch-only and loads standalone)
# ---------------------------------------------------------------------------

def _convert_mobileone_block(blk):
    """ref MobileOneBlock (train form) -> our MobileOneConv params."""
    p, s = {}, {}
    for i, cb in enumerate(blk.rbr_conv):
        p[f"branch{i}_conv"] = {"kernel": _conv_w(cb.conv.weight)}
        p[f"branch{i}_bn"], s[f"branch{i}_bn"] = _bn_params(cb.bn)
    if blk.rbr_scale is not None:
        p["scale_conv"] = {"kernel": _conv_w(blk.rbr_scale.conv.weight)}
        p["scale_bn"], s["scale_bn"] = _bn_params(blk.rbr_scale.bn)
    if blk.rbr_skip is not None:
        p["identity_bn"], s["identity_bn"] = _bn_params(blk.rbr_skip)
    if not isinstance(blk.se, tnn.Identity):
        p["se_fc1"] = {"kernel": _conv_w(blk.se.reduce.weight),
                       "bias": blk.se.reduce.bias.detach().numpy()}
        p["se_fc2"] = {"kernel": _conv_w(blk.se.expand.weight),
                       "bias": blk.se.expand.bias.detach().numpy()}
    return p, s


@pytest.mark.parametrize("arch", ["mobileone_s0", "mobileone_s4"])
def test_mobileone_forward_parity(arch):
    import os
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.encoders import get_encoder

    mod = load_ref_smp_file("encoders.mobileone")
    cfg = {"mobileone_s0": dict(width_multipliers=(0.75, 1.0, 1.0, 2.0),
                                num_conv_branches=4, use_se=False),
           "mobileone_s4": dict(width_multipliers=(3.0, 3.5, 3.5, 4.0),
                                num_conv_branches=1, use_se=True)}[arch]
    torch.manual_seed(16)
    ref = mod.MobileOne(out_channels=(3, 0, 0, 0, 0, 0), depth=5, **cfg)
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.default_rng(17)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    p = {}
    s = {}
    p["stem"], s["stem"] = _convert_mobileone_block(ref.stage0)
    for si in range(1, 5):
        stage = getattr(ref, f"stage{si}")
        assert len(stage) % 2 == 0
        for b in range(len(stage) // 2):
            for part, blk in (("dw", stage[2 * b]), ("pw", stage[2 * b + 1])):
                bp, bs = _convert_mobileone_block(blk)
                p.setdefault(f"stage{si}_block{b}", {})[part] = bp
                s.setdefault(f"stage{si}_block{b}", {})[part] = bs

    enc, ch = get_encoder(arch)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# resnest twins (timm resnest semantics: deep 'd' stem, avg_down, avd pool,
# SplitAttn with rSoftMax radix-major layout)
# ---------------------------------------------------------------------------

class TSplitAttn(tnn.Module):
    def __init__(self, c, radix=2, groups=1):
        super().__init__()
        self.radix, self.groups, self.c = radix, groups, c
        self.conv = tnn.Conv2d(c, c * radix, 3, padding=1,
                               groups=groups * radix, bias=False)
        self.bn0 = tnn.BatchNorm2d(c * radix)
        v = c * radix // 4
        inter = max(32, int(v + 4) // 8 * 8)
        if inter < 0.9 * v:
            inter += 8
        self.fc1 = tnn.Conv2d(c, inter, 1, groups=groups)
        self.bn1 = tnn.BatchNorm2d(inter)
        self.fc2 = tnn.Conv2d(inter, c * radix, 1, groups=groups)

    def forward(self, x):
        h = F.relu(self.bn0(self.conv(x)))
        B, RC, H, W = h.shape
        hs = h.reshape(B, self.radix, RC // self.radix, H, W)
        gap = F.adaptive_avg_pool2d(hs.sum(dim=1), 1)
        a = self.fc2(F.relu(self.bn1(self.fc1(gap))))
        a = a.reshape(B, self.groups, self.radix, -1).transpose(1, 2)
        a = F.softmax(a, dim=1)
        a = a.reshape(B, -1, 1, 1)
        att = a.reshape(B, self.radix, RC // self.radix, 1, 1)
        return (att * hs).sum(dim=1)


class TResNestBottleneck(tnn.Module):
    def __init__(self, in_c, planes, radix=2, groups=1, base_width=64,
                 stride=1, downsample=False, avd_first=False):
        super().__init__()
        gw = int(planes * (base_width / 64.0)) * groups
        self.stride, self.avd_first = stride, avd_first
        self.conv1 = tnn.Conv2d(in_c, gw, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(gw)
        self.attn = TSplitAttn(gw, radix, groups)
        self.conv3 = tnn.Conv2d(gw, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down_conv = tnn.Conv2d(in_c, planes * 4, 1, bias=False)
            self.down_bn = tnn.BatchNorm2d(planes * 4)
            self.down = True

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        if self.stride > 1 and self.avd_first:
            h = F.avg_pool2d(h, 3, self.stride, padding=1)
        h = self.attn(h)
        if self.stride > 1 and not self.avd_first:
            h = F.avg_pool2d(h, 3, self.stride, padding=1)
        h = self.bn3(self.conv3(h))
        identity = x
        if self.down:
            identity = x
            if self.stride > 1:
                identity = F.avg_pool2d(identity, 2, 2)
            identity = self.down_bn(self.down_conv(identity))
        return F.relu(h + identity)


class TResNest(tnn.Module):
    def __init__(self, layers=(1, 1, 1, 1), stem_w=32, radix=2, groups=1,
                 base_width=64, avd_first=False):
        super().__init__()
        self.stem = tnn.ModuleList()
        cs = ((3, stem_w, 2), (stem_w, stem_w, 1), (stem_w, stem_w * 2, 1))
        for ic, oc, s in cs:
            self.stem.append(tnn.Sequential(
                tnn.Conv2d(ic, oc, 3, stride=s, padding=1, bias=False),
                tnn.BatchNorm2d(oc)))
        self.layers = tnn.ModuleList()
        in_c = stem_w * 2
        for li, (planes, n, stride) in enumerate(
                ((64, layers[0], 1), (128, layers[1], 2),
                 (256, layers[2], 2), (512, layers[3], 2))):
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_c != planes * 4)
                blocks.append(TResNestBottleneck(
                    in_c, planes, radix, groups, base_width, s, down, avd_first))
                in_c = planes * 4
            self.layers.append(tnn.Sequential(*blocks))

    def forward(self, x):
        feats = [x]
        h = x
        for stage in self.stem:
            h = F.relu(stage(h))
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, 1)
        for layer in self.layers:
            h = layer(h)
            feats.append(h)
        return feats


def _convert_resnest(tv):
    p, s = {}, {}
    for i, stem in enumerate(tv.stem, start=1):
        p[f"stem_conv{i}"] = {"kernel": _conv_w(stem[0].weight)}
        p[f"stem_bn{i}"], s[f"stem_bn{i}"] = _bn_params(stem[1])
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            bp, bs = {}, {}
            bp["conv1"] = {"kernel": _conv_w(blk.conv1.weight)}
            bp["bn1"], bs["bn1"] = _bn_params(blk.bn1)
            ap, asx = {}, {}
            ap["conv"] = {"kernel": _conv_w(blk.attn.conv.weight)}
            ap["bn0"], asx["bn0"] = _bn_params(blk.attn.bn0)
            ap["fc1"] = {"kernel": _conv_w(blk.attn.fc1.weight),
                         "bias": blk.attn.fc1.bias.detach().numpy()}
            ap["bn1"], asx["bn1"] = _bn_params(blk.attn.bn1)
            ap["fc2"] = {"kernel": _conv_w(blk.attn.fc2.weight),
                         "bias": blk.attn.fc2.bias.detach().numpy()}
            bp["conv2"], bs["conv2"] = ap, asx
            bp["conv3"] = {"kernel": _conv_w(blk.conv3.weight)}
            bp["bn3"], bs["bn3"] = _bn_params(blk.bn3)
            if blk.down:
                bp["downsample_conv"] = {"kernel": _conv_w(blk.down_conv.weight)}
                bp["downsample_bn"], bs["downsample_bn"] = _bn_params(blk.down_bn)
            p[f"layer{li}_block{bi}"] = bp
            s[f"layer{li}_block{bi}"] = bs
    return p, s


@pytest.mark.parametrize("arch,kw", [
    ("timm-resnest14d", dict(layers=(1, 1, 1, 1), stem_w=32, radix=2,
                             groups=1, base_width=64, avd_first=False)),
    ("timm-resnest50d_4s2x40d", dict(layers=(3, 4, 6, 3), stem_w=32, radix=4,
                                     groups=2, base_width=40, avd_first=True)),
])
def test_resnest_forward_parity(arch, kw):
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(18)
    tv = TResNest(**kw)
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(19)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_resnest(tv)
    enc, _ = get_encoder(arch)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# sknet twins (timm SelectiveKernel semantics: 3x3 paths at dilations 1/2,
# path-sum attention; sk18 split_input rd 1/8, skresnext50 full-input
# rd 1/16 divisor 32)
# ---------------------------------------------------------------------------

def _make_div(v, divisor=8, min_value=None):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class TSelectiveKernel(tnn.Module):
    def __init__(self, in_c, out_c, stride=1, groups=1, split_input=True,
                 rd_ratio=1 / 8, rd_divisor=8):
        super().__init__()
        self.split_input = split_input
        groups = min(out_c, groups)
        path_in = in_c // 2 if split_input else in_c
        self.paths = tnn.ModuleList()
        for d in (1, 2):
            self.paths.append(tnn.Sequential(
                tnn.Conv2d(path_in, out_c, 3, stride=stride, padding=d,
                           dilation=d, groups=groups, bias=False),
                tnn.BatchNorm2d(out_c)))
        rd = _make_div(out_c * rd_ratio, rd_divisor)
        self.fc_reduce = tnn.Conv2d(out_c, rd, 1, bias=False)
        self.bn = tnn.BatchNorm2d(rd)
        self.fc_select = tnn.Conv2d(rd, out_c * 2, 1)
        self.out_c = out_c

    def forward(self, x):
        xs = torch.chunk(x, 2, 1) if self.split_input else (x, x)
        feats = [F.relu(p(xi)) for p, xi in zip(self.paths, xs)]
        u = feats[0] + feats[1]
        a = F.adaptive_avg_pool2d(u, 1)
        a = self.fc_select(F.relu(self.bn(self.fc_reduce(a))))
        B = a.shape[0]
        a = F.softmax(a.view(B, 2, self.out_c, 1, 1), dim=1)
        return a[:, 0] * feats[0] + a[:, 1] * feats[1]


class TSKBasicBlock(tnn.Module):
    def __init__(self, in_c, planes, stride=1, downsample=False):
        super().__init__()
        self.sk = TSelectiveKernel(in_c, planes, stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        h = self.bn2(self.conv2(self.sk(x)))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


class TSKBottleneck(tnn.Module):
    def __init__(self, in_c, planes, stride=1, downsample=False,
                 cardinality=32, base_width=4):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * cardinality
        self.conv1 = tnn.Conv2d(in_c, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.sk = TSelectiveKernel(width, width, stride, groups=cardinality,
                                   split_input=False, rd_ratio=1 / 16,
                                   rd_divisor=32)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn3(self.conv3(self.sk(h)))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


class TSKNet(tnn.Module):
    def __init__(self, bottleneck, layers):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        e = 4 if bottleneck else 1
        self.layers = tnn.ModuleList()
        in_c = 64
        for planes, n, stride in ((64, layers[0], 1), (128, layers[1], 2),
                                  (256, layers[2], 2), (512, layers[3], 2)):
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or in_c != planes * e)
                cls = TSKBottleneck if bottleneck else TSKBasicBlock
                blocks.append(cls(in_c, planes, s, down))
                in_c = planes * e
            self.layers.append(tnn.Sequential(*blocks))

    def forward(self, x):
        feats = [x]
        h = F.relu(self.bn1(self.conv1(x)))
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, 1)
        for layer in self.layers:
            h = layer(h)
            feats.append(h)
        return feats


def _convert_sk(tv, bottleneck):
    p = {"stem_conv1": {"kernel": _conv_w(tv.conv1.weight)}}
    s = {}
    p["stem_bn1"], s["stem_bn1"] = _bn_params(tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            bp, bs = {}, {}
            skp, sks = {}, {}
            for i, path in enumerate(blk.sk.paths):
                skp[f"path{i}_conv"] = {"kernel": _conv_w(path[0].weight)}
                skp[f"path{i}_bn"], sks[f"path{i}_bn"] = _bn_params(path[1])
            skp["attn_fc1"] = {"kernel": _conv_w(blk.sk.fc_reduce.weight)}
            skp["attn_bn"], sks["attn_bn"] = _bn_params(blk.sk.bn)
            skp["attn_fc2"] = {"kernel": _conv_w(blk.sk.fc_select.weight),
                               "bias": blk.sk.fc_select.bias.detach().numpy()}
            bp["sk"], bs["sk"] = skp, sks
            if bottleneck:
                bp["conv1"] = {"kernel": _conv_w(blk.conv1.weight)}
                bp["bn1"], bs["bn1"] = _bn_params(blk.bn1)
                bp["conv3"] = {"kernel": _conv_w(blk.conv3.weight)}
                bp["bn3"], bs["bn3"] = _bn_params(blk.bn3)
            else:
                bp["conv2"] = {"kernel": _conv_w(blk.conv2.weight)}
                bp["bn2"], bs["bn2"] = _bn_params(blk.bn2)
            if blk.down is not None:
                bp["downsample_conv"] = {"kernel": _conv_w(blk.down[0].weight)}
                bp["downsample_bn"], bs["downsample_bn"] = _bn_params(blk.down[1])
            p[f"layer{li}_block{bi}"] = bp
            s[f"layer{li}_block{bi}"] = bs
    return p, s


@pytest.mark.parametrize("arch,bottleneck,layers", [
    ("timm-skresnet18", False, (2, 2, 2, 2)),
    ("timm-skresnext50_32x4d", True, (3, 4, 6, 3)),
])
def test_sknet_forward_parity(arch, bottleneck, layers):
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(20)
    tv = TSKNet(bottleneck, layers)
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(21)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    params, stats = _convert_sk(tv, bottleneck)
    enc, _ = get_encoder(arch)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# regnety_002 twin (timm regnet semantics: grouped bottleneck, SE ratio on
# block INPUT width, 1x1 downsample)
# ---------------------------------------------------------------------------

class TRegNetBlock(tnn.Module):
    def __init__(self, in_c, width, group_size, stride=1, se_ratio=0.0):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_c, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                groups=width // group_size, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.se = None
        if se_ratio > 0:
            rd = max(1, int(round(in_c * se_ratio)))
            self.se_fc1 = tnn.Conv2d(width, rd, 1)
            self.se_fc2 = tnn.Conv2d(rd, width, 1)
            self.se = True
        self.conv3 = tnn.Conv2d(width, width, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        self.down = None
        if stride != 1 or in_c != width:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, width, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(width))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        if self.se:
            s = F.adaptive_avg_pool2d(h, 1)
            s = torch.sigmoid(self.se_fc2(F.relu(self.se_fc1(s))))
            h = h * s
        h = self.bn3(self.conv3(h))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


class TRegNet(tnn.Module):
    def __init__(self, widths, depths, group_sizes, se_ratio=0.25):
        super().__init__()
        self.stem = tnn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False)
        self.stem_bn = tnn.BatchNorm2d(32)
        self.stages = tnn.ModuleList()
        in_c = 32
        for w, d, g in zip(widths, depths, group_sizes):
            blocks = []
            for b in range(d):
                blocks.append(TRegNetBlock(in_c, w, g,
                                           stride=2 if b == 0 else 1,
                                           se_ratio=se_ratio))
                in_c = w
            self.stages.append(tnn.Sequential(*blocks))

    def forward(self, x):
        feats = [x]
        h = F.relu(self.stem_bn(self.stem(x)))
        feats.append(h)
        for stage in self.stages:
            h = stage(h)
            feats.append(h)
        return feats


def _convert_regnet(tv):
    p = {"stem_conv": {"kernel": _conv_w(tv.stem.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn_params(tv.stem_bn)
    for si, stage in enumerate(tv.stages, start=1):
        for bi, blk in enumerate(stage):
            bp, bs = {}, {}
            for n in (1, 2, 3):
                bp[f"conv{n}"] = {"kernel": _conv_w(getattr(blk, f"conv{n}").weight)}
                bp[f"bn{n}"], bs[f"bn{n}"] = _bn_params(getattr(blk, f"bn{n}"))
            if blk.se:
                bp["se_fc1"] = {"kernel": _conv_w(blk.se_fc1.weight),
                                "bias": blk.se_fc1.bias.detach().numpy()}
                bp["se_fc2"] = {"kernel": _conv_w(blk.se_fc2.weight),
                                "bias": blk.se_fc2.bias.detach().numpy()}
            if blk.down is not None:
                bp["downsample_conv"] = {"kernel": _conv_w(blk.down[0].weight)}
                bp["downsample_bn"], bs["downsample_bn"] = _bn_params(blk.down[1])
            p[f"stage{si}_block{bi}"] = bp
            s[f"stage{si}_block{bi}"] = bs
    return p, s


def test_regnety_002_forward_parity():
    from stcd_tpu.encoders import get_encoder
    from stcd_tpu.encoders.regnet import generate_regnet

    widths, depths, group_sizes = generate_regnet("regnety_002")

    torch.manual_seed(22)
    tv = TRegNet(widths, depths, group_sizes)
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(23)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    p, s = _convert_regnet(tv)

    enc, _ = get_encoder("timm-regnety_002")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# gernet_s twin (timm ByobNet subset: basic / grouped-bottle blocks,
# conv1x1 shortcut, stride-1 tail + final 1x1 feature conv)
# ---------------------------------------------------------------------------

class TGERBlock(tnn.Module):
    def __init__(self, in_c, kind, c, stride=1, group_size=0, bottle_ratio=1.0):
        super().__init__()
        self.kind = kind
        if kind == "basic":
            self.conv1 = tnn.Conv2d(in_c, c, 3, stride=stride, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(c)
            self.conv2 = tnn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(c)
        else:
            mid = int(round(c * bottle_ratio))
            groups = mid // group_size if group_size else 1
            self.conv1 = tnn.Conv2d(in_c, mid, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(mid)
            self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1,
                                    groups=groups, bias=False)
            self.bn2 = tnn.BatchNorm2d(mid)
            self.conv3 = tnn.Conv2d(mid, c, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(c)
        self.down = None
        if stride != 1 or in_c != c:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, c, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(c))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        if self.kind == "basic":
            h = self.bn2(self.conv2(h))
        else:
            h = F.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


class TGERNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.stem = tnn.Conv2d(3, cfg["stem"], 3, stride=2, padding=1, bias=False)
        self.stem_bn = tnn.BatchNorm2d(cfg["stem"])
        self.stages = tnn.ModuleList()
        in_c = cfg["stem"]
        for kind, d, c, s, gs, br in cfg["blocks"]:
            blocks = []
            for b in range(d):
                blocks.append(TGERBlock(in_c, kind, c, s if b == 0 else 1,
                                        gs, br))
                in_c = c
            self.stages.append(tnn.Sequential(*blocks))
        self.final = tnn.Conv2d(in_c, cfg["features"], 1, bias=False)
        self.final_bn = tnn.BatchNorm2d(cfg["features"])

    def forward(self, x):
        feats = [x]
        h = F.relu(self.stem_bn(self.stem(x)))
        feats.append(h)
        for si, stage in enumerate(self.stages):
            h = stage(h)
            if si < 3:
                feats.append(h)
        feats.append(F.relu(self.final_bn(self.final(h))))
        return feats


def _convert_gernet(tv):
    p = {"stem_conv": {"kernel": _conv_w(tv.stem.weight)},
         "final_conv": {"kernel": _conv_w(tv.final.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn_params(tv.stem_bn)
    p["final_bn"], s["final_bn"] = _bn_params(tv.final_bn)
    for si, stage in enumerate(tv.stages):
        for bi, blk in enumerate(stage):
            bp, bs = {}, {}
            convs = (1, 2) if blk.kind == "basic" else (1, 2, 3)
            for n in convs:
                bp[f"conv{n}"] = {"kernel": _conv_w(getattr(blk, f"conv{n}").weight)}
                bp[f"bn{n}"], bs[f"bn{n}"] = _bn_params(getattr(blk, f"bn{n}"))
            if blk.down is not None:
                bp["shortcut_conv"] = {"kernel": _conv_w(blk.down[0].weight)}
                bp["shortcut_bn"], bs["shortcut_bn"] = _bn_params(blk.down[1])
            p[f"stage{si}_block{bi}"] = bp
            s[f"stage{si}_block{bi}"] = bs
    return p, s


def test_gernet_s_forward_parity():
    from stcd_tpu.encoders import get_encoder
    from stcd_tpu.encoders.gernet import _GERNET_CFGS

    cfg = _GERNET_CFGS["gernet_s"]

    torch.manual_seed(24)
    tv = TGERNet(cfg)
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(25)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    p, s = _convert_gernet(tv)

    enc, _ = get_encoder("timm-gernet_s")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# mobilenetv3_large_100 twin (timm semantics: hswish/relu per block,
# SE from block-input channels with hard-sigmoid gate, stage grouping
# stem+g0 | g1 | g2 | g3+g4 | g5+final-conv)
# ---------------------------------------------------------------------------

def _hsig(x):
    return F.relu6(x + 3.0) / 6.0


def _hswish(x):
    return x * _hsig(x)


class TV3Block(tnn.Module):
    def __init__(self, in_c, k, exp, out, se, act, stride):
        super().__init__()
        self.act = F.relu if act == "relu" else _hswish
        self.expand = None
        if exp != in_c:
            self.expand = tnn.Conv2d(in_c, exp, 1, bias=False)
            self.expand_bn = tnn.BatchNorm2d(exp)
        self.dw = tnn.Conv2d(exp, exp, k, stride=stride, padding=k // 2,
                             groups=exp, bias=False)
        self.dw_bn = tnn.BatchNorm2d(exp)
        self.se = None
        if se:
            rd = _make_div(in_c / 4, 8)
            self.se_reduce = tnn.Conv2d(exp, rd, 1)
            self.se_expand = tnn.Conv2d(rd, exp, 1)
            self.se = True
        self.project = tnn.Conv2d(exp, out, 1, bias=False)
        self.project_bn = tnn.BatchNorm2d(out)
        self.skip = stride == 1 and in_c == out

    def forward(self, x):
        h = x
        if self.expand is not None:
            h = self.act(self.expand_bn(self.expand(h)))
        h = self.act(self.dw_bn(self.dw(h)))
        if self.se:
            s = F.adaptive_avg_pool2d(h, 1)
            s = _hsig(self.se_expand(F.relu(self.se_reduce(s))))
            h = h * s
        return_h = self.project_bn(self.project(h))
        return return_h + x if self.skip else return_h


def test_mobilenetv3_large_forward_parity():
    from stcd_tpu.encoders import get_encoder
    from stcd_tpu.encoders.mobilenet import _V3_LARGE

    class TV3Large(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False)
            self.stem_bn = tnn.BatchNorm2d(16)
            blocks, in_c = [], 16
            for group in _V3_LARGE:
                for (k, e, c, se, act, s) in group:
                    blocks.append(TV3Block(in_c, k, e, c, se, act, s))
                    in_c = c
            self.blocks = tnn.ModuleList(blocks)
            self.final = tnn.Conv2d(in_c, 960, 1, bias=False)
            self.final_bn = tnn.BatchNorm2d(960)

        def forward(self, x):
            feats = [x]
            h = _hswish(self.stem_bn(self.stem(x)))
            ends = []
            n = 0
            for gi, group in enumerate(_V3_LARGE):
                n += len(group)
                ends.append(n)
            stage_end = {ends[0]: 1, ends[1]: 2, ends[2]: 3, ends[4]: 4}
            for bi, blk in enumerate(self.blocks, start=1):
                h = blk(h)
                if bi in stage_end:
                    feats.append(h)
            feats.append(_hswish(self.final_bn(self.final(h))))
            return feats

    torch.manual_seed(26)
    tv = TV3Large()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(27)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    p = {"stem_conv": {"kernel": _conv_w(tv.stem.weight)},
         "final_conv": {"kernel": _conv_w(tv.final.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = _bn_params(tv.stem_bn)
    p["final_bn"], s["final_bn"] = _bn_params(tv.final_bn)
    for bi, blk in enumerate(tv.blocks):
        bp, bs = {}, {}
        if blk.expand is not None:
            bp["expand_conv"] = {"kernel": _conv_w(blk.expand.weight)}
            bp["expand_bn"], bs["expand_bn"] = _bn_params(blk.expand_bn)
        bp["dw_conv"] = {"kernel": _conv_w(blk.dw.weight)}
        bp["dw_bn"], bs["dw_bn"] = _bn_params(blk.dw_bn)
        if blk.se:
            bp["se_reduce"] = {"kernel": _conv_w(blk.se_reduce.weight),
                               "bias": blk.se_reduce.bias.detach().numpy()}
            bp["se_expand"] = {"kernel": _conv_w(blk.se_expand.weight),
                               "bias": blk.se_expand.bias.detach().numpy()}
        bp["project_conv"] = {"kernel": _conv_w(blk.project.weight)}
        bp["project_bn"], bs["project_bn"] = _bn_params(blk.project_bn)
        p[f"block{bi}"], s[f"block{bi}"] = bp, bs

    enc, ch = get_encoder("timm-mobilenetv3_large_100")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


# ---------------------------------------------------------------------------
# senet154 + se_resnext50_32x4d twins (Cadene variant-specific paths:
# 3-conv stem, double-width conv1 + grouped conv2 SEBottleneck, k3
# downsample for senet154; grouped-width SEResNeXtBottleneck)
# ---------------------------------------------------------------------------

class TSENetVariantBlock(tnn.Module):
    def __init__(self, kind, in_c, planes, stride=1, downsample=False,
                 groups=64, base_width=4, down_k=1):
        super().__init__()
        if kind == "se":  # senet154 SEBottleneck
            c1, c2, g = planes * 2, planes * 4, groups
            s1, s2 = 1, stride
        else:  # se_resnext SEResNeXtBottleneck
            width = (planes * base_width // 64) * groups
            c1, c2, g = width, width, groups
            s1, s2 = 1, stride
        self.conv1 = tnn.Conv2d(in_c, c1, 1, stride=s1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c1)
        self.conv2 = tnn.Conv2d(c1, c2, 3, stride=s2, padding=1, groups=g,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(c2)
        self.conv3 = tnn.Conv2d(c2, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.se = TSEModule(planes * 4)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(in_c, planes * 4, down_k, stride=stride,
                           padding=down_k // 2, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.se(self.bn3(self.conv3(h)))
        identity = self.down(x) if self.down is not None else x
        return F.relu(h + identity)


@pytest.mark.parametrize("arch,kind,groups,dk,stem3", [
    ("senet154", "se", 64, 3, True),
    ("se_resnext50_32x4d", "se_resnext", 32, 1, False),
])
def test_senet_variants_forward_parity(arch, kind, groups, dk, stem3):
    from stcd_tpu.encoders import get_encoder

    layers = (3, 8, 36, 3) if arch == "senet154" else (3, 4, 6, 3)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            if stem3:
                self.stem = tnn.ModuleList()
                for ic, oc, s in ((3, 64, 2), (64, 64, 1), (64, 128, 1)):
                    self.stem.append(tnn.Sequential(
                        tnn.Conv2d(ic, oc, 3, stride=s, padding=1, bias=False),
                        tnn.BatchNorm2d(oc)))
                in_c = 128
            else:
                self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                in_c = 64
            self.layers = tnn.ModuleList()
            for li, (planes, n, stride) in enumerate(
                    ((64, layers[0], 1), (128, layers[1], 2),
                     (256, layers[2], 2), (512, layers[3], 2))):
                blocks = []
                this_dk = 1 if li == 0 else dk
                for b in range(n):
                    s = stride if b == 0 else 1
                    down = b == 0 and (s != 1 or in_c != planes * 4)
                    blocks.append(TSENetVariantBlock(
                        kind, in_c, planes, s, down, groups, 4, this_dk))
                    in_c = planes * 4
                self.layers.append(tnn.Sequential(*blocks))

        def forward(self, x):
            feats = [x]
            if stem3:
                h = x
                for st in self.stem:
                    h = F.relu(st(h))
            else:
                h = F.relu(self.bn1(self.conv1(x)))
            feats.append(h)
            h = F.max_pool2d(h, 3, 2, 0, ceil_mode=True)
            for layer in self.layers:
                h = layer(h)
                feats.append(h)
            return feats

    torch.manual_seed(28)
    tv = TNet()
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(29)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    p, s = {}, {}
    if stem3:
        for i, st in enumerate(tv.stem, start=1):
            p[f"stem_conv{i}"] = {"kernel": _conv_w(st[0].weight)}
            p[f"stem_bn{i}"], s[f"stem_bn{i}"] = _bn_params(st[1])
    else:
        p["stem_conv1"] = {"kernel": _conv_w(tv.conv1.weight)}
        p["stem_bn1"], s["stem_bn1"] = _bn_params(tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            bp, bs = {}, {}
            for n in (1, 2, 3):
                bp[f"conv{n}"] = {"kernel": _conv_w(getattr(blk, f"conv{n}").weight)}
                bp[f"bn{n}"], bs[f"bn{n}"] = _bn_params(getattr(blk, f"bn{n}"))
            bp["se"] = {
                "fc1": {"kernel": _conv_w(blk.se.fc1.weight),
                        "bias": blk.se.fc1.bias.detach().numpy()},
                "fc2": {"kernel": _conv_w(blk.se.fc2.weight),
                        "bias": blk.se.fc2.bias.detach().numpy()}}
            if blk.down is not None:
                bp["downsample_conv"] = {"kernel": _conv_w(blk.down[0].weight)}
                bp["downsample_bn"], bs["downsample_bn"] = _bn_params(blk.down[1])
            p[f"layer{li}_block{bi}"] = bp
            s[f"layer{li}_block{bi}"] = bs

    enc, _ = get_encoder(arch)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


def test_efficientnet_lite0_forward_parity():
    """timm tf_efficientnet_lite0: relu6 instead of swish, NO squeeze-excite,
    fixed 32-ch stem; TF SAME padding throughout."""
    from stcd_tpu.encoders import get_encoder
    from stcd_tpu.encoders.efficientnet import _BASE_BLOCKS

    class TMBConvLite(TMBConv):
        def forward(self, x):
            h = x
            if self.expand_conv is not None:
                h = F.relu6(self.expand_bn(self.expand_conv(h)))
            h = F.relu6(self.dw_bn(self.dw(_same_pad(h, self.k, self.stride))))
            h = self.project_bn(self.project(h))
            return h + x if self.skip else h

    class TEffLite(TEffNetB0):
        def __init__(self, base_blocks, stage_end_group):
            super().__init__(base_blocks, ())
            # lite is a TIMM naming: stages slice whole block GROUPS
            self.stage_end_group = stage_end_group
            blocks = []
            in_c = 32
            self.group_of_block = []
            for gi, (k, r, s, e, _ic, oc, se) in enumerate(base_blocks):
                for i in range(r):
                    blocks.append(TMBConvLite(in_c, oc, k, s if i == 0 else 1,
                                              e, se))
                    self.group_of_block.append(gi)
                    in_c = oc
            self.blocks = tnn.ModuleList(blocks)

        def forward(self, x):
            feats = [x]
            h = F.relu6(self.stem_bn(self.stem(_same_pad(x, 3, 2))))
            feats.append(h)
            for bi, blk in enumerate(self.blocks):
                h = blk(h)
                if (bi + 1 == len(self.blocks)
                        or self.group_of_block[bi + 1] != self.group_of_block[bi]):
                    if self.group_of_block[bi] in self.stage_end_group:
                        feats.append(h)
            return feats

    torch.manual_seed(30)
    tv = TEffLite(_BASE_BLOCKS, (1, 2, 4, 6))
    _randomize_bn(tv)
    tv.eval()
    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, 3, 66, 66)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))

    p, s = _convert_effnet(tv)
    # lite blocks carry no SE params
    for k in list(p):
        if k.startswith("block"):
            p[k].pop("se_reduce", None)
            p[k].pop("se_expand", None)
    enc, _ = get_encoder("timm-tf_efficientnet_lite0")
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")

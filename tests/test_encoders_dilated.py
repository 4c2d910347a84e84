"""Dilated-mode (output_stride 8/16) golden parity beyond ResNet
(ADVICE r1: DeepLabV3/+/PAN previously worked only with resnet encoders).

The torch twins are patched exactly like the reference's
``replace_strides_with_dilation`` (ref encoders/_utils.py:41-52: every
Conv2d in the dilated stage gets stride 1, dilation=rate, padding
(k//2)*rate; os=16 dilates stage 5 at rate 2, os=8 stages 4+5 at rates
2/4 — ref _base.py:34-57) and compared against our encoders built via
``get_encoder(..., output_stride=...)``.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

import test_golden_encoders_twins as twins
from stcd_tpu.encoders import get_encoder


def _patch_dilation(module, rate):
    """ref encoders/_utils.py replace_strides_with_dilation."""
    for mod in module.modules():
        if isinstance(mod, tnn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (rate, rate)
            kh, kw = mod.kernel_size
            mod.padding = ((kh // 2) * rate, (kw // 2) * rate)


def _compare(got, want, label):
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"{label} stage {i}")


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_se_resnet50_matches_torch(os_):
    torch.manual_seed(4)
    tv = twins.TSEResNet50()
    twins._randomize_bn(tv)
    tv.eval()
    if os_ == 16:
        _patch_dilation(tv.layers[3], 2)
    else:
        _patch_dilation(tv.layers[2], 2)
        _patch_dilation(tv.layers[3], 4)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_  # the point of dilation

    params, stats = twins._convert_se_resnet50(tv)
    enc, _ = get_encoder("se_resnet50", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"se_resnet50 os={os_}")


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_mobilenet_v2_matches_torch(os_):
    torch.manual_seed(10)
    tv = twins.TMobileNetV2()
    twins._randomize_bn(tv)
    tv.eval()
    # smp stages over torchvision features: stage4 = features[7:14] =
    # blocks[6:13] (0-based), stage5 = features[14:] = blocks[13:] + final
    stage4 = tnn.ModuleList(list(tv.blocks)[6:13])
    stage5 = tnn.ModuleList(list(tv.blocks)[13:] + [tv.final])
    if os_ == 16:
        _patch_dilation(stage5, 2)
    else:
        _patch_dilation(stage4, 2)
        _patch_dilation(stage5, 4)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    params, stats = twins._convert_mobilenet_v2(tv)
    enc, _ = get_encoder("mobilenet_v2", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"mobilenet_v2 os={os_}")


def test_dilated_unsupported_encoders_raise():
    """Families the reference itself refuses to dilate (pooling-based
    downsampling — ref densenet.py:56-58, vgg, inception*, xception,
    mix_transformer) must raise a clear error here too."""
    for name in ("densenet121", "vgg16", "inceptionv4", "inceptionresnetv2",
                 "xception", "mit_b0"):
        with pytest.raises(ValueError, match="dilated"):
            get_encoder(name, output_stride=16)


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_mobilenetv3_large_matches_torch(os_):
    from stcd_tpu.encoders.mobilenet import _V3_LARGE

    class TV3Large(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False)
            self.stem_bn = tnn.BatchNorm2d(16)
            blocks, in_c = [], 16
            for group in _V3_LARGE:
                for (k, e, c, se, act, s) in group:
                    blocks.append(twins.TV3Block(in_c, k, e, c, se, act, s))
                    in_c = c
            self.blocks = tnn.ModuleList(blocks)
            self.final = tnn.Conv2d(in_c, 960, 1, bias=False)
            self.final_bn = tnn.BatchNorm2d(960)

        def forward(self, x):
            import torch.nn.functional as F

            def hsw(v):
                return v * F.relu6(v + 3.0) / 6.0

            feats = [x]
            h = hsw(self.stem_bn(self.stem(x)))
            sizes = [len(g) for g in _V3_LARGE]
            ends = np.cumsum(sizes).tolist()
            stage_end = {ends[0]: 1, ends[1]: 2, ends[2]: 3, ends[4]: 4}
            for bi, blk in enumerate(self.blocks, start=1):
                h = blk(h)
                if bi in stage_end:
                    feats.append(h)
            feats.append(hsw(self.final_bn(self.final(h))))
            return feats

    torch.manual_seed(26)
    tv = TV3Large()
    twins._randomize_bn(tv)
    tv.eval()
    # stage4 = spec groups 3+4 (flat blocks 6..11), stage5 = group 5
    # (flat 12..14) + final conv
    stage4 = tnn.ModuleList(list(tv.blocks)[6:12])
    stage5 = tnn.ModuleList(list(tv.blocks)[12:] + [tv.final])
    if os_ == 16:
        _patch_dilation(stage5, 2)
    else:
        _patch_dilation(stage4, 2)
        _patch_dilation(stage5, 4)

    rng = np.random.default_rng(27)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    # twin-attr -> our params (same mapping as the mv3 forward-parity test)
    p = {"stem_conv": {"kernel": twins._conv_w(tv.stem.weight)},
         "final_conv": {"kernel": twins._conv_w(tv.final.weight)}}
    s = {}
    p["stem_bn"], s["stem_bn"] = twins._bn_params(tv.stem_bn)
    p["final_bn"], s["final_bn"] = twins._bn_params(tv.final_bn)
    for bi, blk in enumerate(tv.blocks):
        bp, bs = {}, {}
        if blk.expand is not None:
            bp["expand_conv"] = {"kernel": twins._conv_w(blk.expand.weight)}
            bp["expand_bn"], bs["expand_bn"] = twins._bn_params(blk.expand_bn)
        bp["dw_conv"] = {"kernel": twins._conv_w(blk.dw.weight)}
        bp["dw_bn"], bs["dw_bn"] = twins._bn_params(blk.dw_bn)
        if blk.se:
            bp["se_reduce"] = {"kernel": twins._conv_w(blk.se_reduce.weight),
                               "bias": blk.se_reduce.bias.detach().numpy()}
            bp["se_expand"] = {"kernel": twins._conv_w(blk.se_expand.weight),
                               "bias": blk.se_expand.bias.detach().numpy()}
        bp["project_conv"] = {"kernel": twins._conv_w(blk.project.weight)}
        bp["project_bn"], bs["project_bn"] = twins._bn_params(blk.project_bn)
        p[f"block{bi}"], s[f"block{bi}"] = bp, bs

    enc, _ = get_encoder("timm-mobilenetv3_large_100", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"mobilenetv3_large os={os_}")


def test_make_dilated_rates_formula():
    """The shared smp make_dilated rate formula (encoders/dilation.py):
    cumulative doubling INCLUDING the stage's own flag; unflagged stages
    keep rate 1 (ref _base.py:34-57)."""
    from stcd_tpu.encoders.dilation import make_dilated_rates

    assert make_dilated_rates((False, False, True)) == (1, 1, 2)   # os=16
    assert make_dilated_rates((False, True, True)) == (1, 2, 4)    # os=8
    assert make_dilated_rates((True, True, True)) == (2, 4, 8)     # os=4
    assert make_dilated_rates((False, False, False)) == (1, 1, 1)
    assert make_dilated_rates((True, False, True)) == (2, 1, 4)

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


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_regnety_002_matches_torch(os_):
    from stcd_tpu.encoders.regnet import generate_regnet

    widths, depths, gs = generate_regnet("regnety_002")
    torch.manual_seed(30)
    tv = twins.TRegNet(widths, depths, gs)
    twins._randomize_bn(tv)
    tv.eval()
    # features idx 2..5 = tv.stages[0..3]
    if os_ == 16:
        _patch_dilation(tv.stages[3], 2)
    else:
        _patch_dilation(tv.stages[2], 2)
        _patch_dilation(tv.stages[3], 4)

    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    p, s = twins._convert_regnet(tv)
    enc, _ = get_encoder("timm-regnety_002", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"regnety_002 os={os_}")


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_gernet_s_matches_torch(os_):
    from stcd_tpu.encoders.gernet import _GERNET_CFGS

    torch.manual_seed(32)
    tv = twins.TGERNet(_GERNET_CFGS["gernet_s"])
    twins._randomize_bn(tv)
    tv.eval()
    # feature idx 5 covers table stages 3..4 + the final 1x1 conv
    stage5 = tnn.ModuleList([tv.stages[3], tv.stages[4], tv.final])
    if os_ == 16:
        _patch_dilation(stage5, 2)
    else:
        _patch_dilation(tv.stages[2], 2)
        _patch_dilation(stage5, 4)

    rng = np.random.default_rng(33)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    p, s = twins._convert_gernet(tv)
    enc, _ = get_encoder("timm-gernet_s", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"gernet_s os={os_}")


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_dpn68_matches_torch(os_):
    torch.manual_seed(34)
    tv = twins.TDPN68()
    twins._randomize_bn(tv)
    tv.eval()
    # features idx 2..5 = groups_list[0..3] (conv2..conv5)
    if os_ == 16:
        _patch_dilation(tv.groups_list[3], 2)
    else:
        _patch_dilation(tv.groups_list[2], 2)
        _patch_dilation(tv.groups_list[3], 4)

    rng = np.random.default_rng(35)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    p, s = twins._convert_dpn68(tv)
    enc, _ = get_encoder("dpn68", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"dpn68 os={os_}")


@pytest.mark.parametrize("arch,bottleneck,layers", [
    ("timm-skresnet18", False, (2, 2, 2, 2)),
    ("timm-skresnext50_32x4d", True, (3, 4, 6, 3)),
])
@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_sknet_matches_torch(os_, arch, bottleneck, layers):
    """The reference's crude patch collapses BOTH SelectiveKernel paths
    (timm dilations 1/2) onto the SAME stage rate — matched here."""
    torch.manual_seed(36)
    tv = twins.TSKNet(bottleneck, layers)
    twins._randomize_bn(tv)
    tv.eval()
    if os_ == 16:
        _patch_dilation(tv.layers[3], 2)
    else:
        _patch_dilation(tv.layers[2], 2)
        _patch_dilation(tv.layers[3], 4)

    rng = np.random.default_rng(37)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    p, s = twins._convert_sk(tv, bottleneck)
    enc, _ = get_encoder(arch, output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"{arch} os={os_}")


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_mobileone_s0_matches_reference(os_):
    """Dilated golden vs the reference's OWN vendored mobileone.py with its
    stages patched by the reference's replace_strides_with_dilation."""
    import os as _os
    if not _os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    from _ref_stubs import load_ref_smp_file
    from test_golden_encoders_twins import (_convert_mobileone_block,
                                            _randomize_bn)

    mod = load_ref_smp_file("encoders.mobileone")
    torch.manual_seed(38)
    ref = mod.MobileOne(out_channels=(3, 0, 0, 0, 0, 0), depth=5,
                        width_multipliers=(0.75, 1.0, 1.0, 2.0),
                        num_conv_branches=4, use_se=False)
    _randomize_bn(ref)
    # damp the multiplicative BN randomization toward 1: with 46 stacked
    # randomized BNs this seed's activations reach ~1e5 and fp32
    # accumulation-order noise alone exceeds the 1e-3 rtol (the undilated
    # stages already differ by that much)
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.weight.data = 1.0 + 0.3 * (m.weight.data - 1.0)
    ref.eval()
    # features idx 4 = stage3, idx 5 = stage4 (ref get_stages)
    if os_ == 16:
        _patch_dilation(ref.stage4, 2)
    else:
        _patch_dilation(ref.stage3, 2)
        _patch_dilation(ref.stage4, 4)

    rng = np.random.default_rng(39)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    p, s = {}, {}
    p["stem"], s["stem"] = _convert_mobileone_block(ref.stage0)
    for si in range(1, 5):
        stage = getattr(ref, f"stage{si}")
        for b in range(len(stage) // 2):
            for part, blk in (("dw", stage[2 * b]), ("pw", stage[2 * b + 1])):
                bp, bs = _convert_mobileone_block(blk)
                p.setdefault(f"stage{si}_block{b}", {})[part] = bp
                s.setdefault(f"stage{si}_block{b}", {})[part] = bs

    enc, _ = get_encoder("mobileone_s0", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    # Looser, scale-aware tolerance: s0's 4 summed branches per conv over
    # 46 convs push random-weight activations to ~1e5, where fp32
    # accumulation-order noise alone exceeds rtol=1e-3 on isolated
    # elements near the ReLU cut (the UNdilated stages show the same
    # level). atol scales with each stage's magnitude.
    for i, (g, w) in enumerate(zip(got, want)):
        wn = w.numpy()
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   wn, rtol=5e-3,
                                   atol=max(5e-4, 1e-5 * np.abs(wn).max()),
                                   err_msg=f"mobileone_s0 os={os_} stage {i}")


@pytest.mark.parametrize("os_", [16, 8])
def test_dilated_efficientnet_b0_matches_torch(os_):
    """The efficientnet dilation quirk (ref _utils.py:50-52 'Kostyl'):
    static SAME padding becomes Identity and the patched symmetric
    (k//2)*rate padding applies — the twin emulates it by bypassing its
    _same_pad helper on patched blocks."""
    from stcd_tpu.encoders.efficientnet import _BASE_BLOCKS, _REF_STAGE_IDXS

    torch.manual_seed(40)
    tv = twins.TEffNetB0(_BASE_BLOCKS, _REF_STAGE_IDXS["b0"])
    twins._randomize_bn(tv)
    tv.eval()
    # the efficientnet_pytorch naming slices stages by FLAT block index
    # (ref stage_idxs b0 = (3, 5, 9, 16) — stage4 = blocks[5:9] reaches
    # one block INTO the 112-ch group, stage5 = blocks[9:16])
    if os_ == 16:
        dil_of_block = {bi: 2 for bi in range(9, 16)}
    else:
        dil_of_block = {**{bi: 2 for bi in range(5, 9)},
                        **{bi: 4 for bi in range(9, 16)}}
    for bi, blk in enumerate(tv.blocks):
        if bi in dil_of_block:
            _patch_dilation(blk, dil_of_block[bi])
            blk.use_same_pad = False

    rng = np.random.default_rng(41)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    assert want[-1].shape[-1] == 64 // os_

    p, s = twins._convert_effnet(tv)
    enc, _ = get_encoder("efficientnet-b0", output_stride=os_)
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _compare(got, want, f"efficientnet-b0 os={os_}")


def test_dilated_res2net_resnest_refuse():
    """The reference refuses dilation for res2net/resnest (ref
    timm_res2net.py:27-28, timm_resnest.py:27-28) — ours must too, at
    get_encoder time, while sknet (same encoder class) dilates."""
    for name in ("timm-res2net50_26w_4s", "timm-resnest14d"):
        with pytest.raises(ValueError, match="not support dilated"):
            get_encoder(name, output_stride=16)

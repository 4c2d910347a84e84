"""Upstream-checkpoint converters for the broadened encoder zoo
(stcd_tpu/convert/torch_to_flax.py round-2 section; VERDICT r1 item 5).

Each test emits a state_dict with the UPSTREAM key naming (what the
reference's pretrained_settings URLs actually serve: efficientnet_pytorch,
torchvision, timm, pretrainedmodels, SegFormer) from the already
forward-parity-validated torch twins in test_golden_encoders_twins.py,
runs the real converter over it, and asserts the resulting pytrees equal
the twin-validated conversion leaf-for-leaf. mit_b0 goes further: the
REFERENCE's own MixVisionTransformer (loaded standalone) provides both the
state_dict and the golden forward."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import test_golden_encoders_twins as twins
from stcd_tpu.convert.torch_to_flax import (
    convert_densenet,
    convert_efficientnet,
    convert_mix_transformer,
    convert_mobilenet_v2,
    convert_mobilenet_v3,
    convert_senet,
)


def _w(t):
    return t.detach().numpy()


def _put_conv(sd, name, conv):
    sd[name + ".weight"] = _w(conv.weight)
    if conv.bias is not None:
        sd[name + ".bias"] = _w(conv.bias)


def _put_bn(sd, name, bn):
    sd[name + ".weight"] = _w(bn.weight)
    sd[name + ".bias"] = _w(bn.bias)
    sd[name + ".running_mean"] = _w(bn.running_mean)
    sd[name + ".running_var"] = _w(bn.running_var)


def _assert_trees_equal(got, want, label):
    gl, gt = jax.tree_util.tree_flatten_with_path(got)[0], None
    wl = jax.tree_util.tree_flatten_with_path(want)[0]
    gpaths = {jax.tree_util.keystr(p): v for p, v in gl}
    wpaths = {jax.tree_util.keystr(p): v for p, v in wl}
    assert set(gpaths) == set(wpaths), (
        f"{label}: key sets differ: only-got={sorted(set(gpaths) - set(wpaths))[:5]} "
        f"only-want={sorted(set(wpaths) - set(gpaths))[:5]}")
    for k in gpaths:
        np.testing.assert_array_equal(np.asarray(gpaths[k]),
                                      np.asarray(wpaths[k]),
                                      err_msg=f"{label}:{k}")


def test_convert_efficientnet_upstream_keys():
    from stcd_tpu.encoders.efficientnet import _BASE_BLOCKS, _REF_STAGE_IDXS

    torch.manual_seed(6)
    tv = twins.TEffNetB0(_BASE_BLOCKS, _REF_STAGE_IDXS["b0"])
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "_conv_stem", tv.stem)
    _put_bn(sd, "_bn0", tv.stem_bn)
    for i, blk in enumerate(tv.blocks):
        b = f"_blocks.{i}"
        if blk.expand_conv is not None:
            _put_conv(sd, f"{b}._expand_conv", blk.expand_conv)
            _put_bn(sd, f"{b}._bn0", blk.expand_bn)
        _put_conv(sd, f"{b}._depthwise_conv", blk.dw)
        _put_bn(sd, f"{b}._bn1", blk.dw_bn)
        _put_conv(sd, f"{b}._se_reduce", blk.se_reduce)
        _put_conv(sd, f"{b}._se_expand", blk.se_expand)
        _put_conv(sd, f"{b}._project_conv", blk.project)
        _put_bn(sd, f"{b}._bn2", blk.project_bn)
    # model-level head keys the converter must ignore
    sd["_conv_head.weight"] = np.zeros((1280, 320, 1, 1), np.float32)

    params, stats = convert_efficientnet(sd)
    want_p, want_s = twins._convert_effnet(tv)
    _assert_trees_equal(params, want_p, "effnet params")
    _assert_trees_equal(stats, want_s, "effnet stats")


def _timm_effnet_sd(tv, with_se=True):
    """Emit the twin's weights under REAL timm EfficientNet naming
    (conv_stem/bn1 stem; stage-grouped blocks.{s}.{b}; InvertedResidual =
    conv_pw/bn1 + conv_dw/bn2 + se.conv_reduce/expand + conv_pwl/bn3;
    first-stage DepthwiseSeparableConv = conv_dw/bn1 + se + conv_pw/bn2
    — ref timm_efficientnet.py:96-133 wraps timm's EfficientNet)."""
    sd = {}
    _put_conv(sd, "conv_stem", tv.stem)
    _put_bn(sd, "bn1", tv.stem_bn)
    idx_in_stage, prev_stage = 0, None
    for i, blk in enumerate(tv.blocks):
        stage = tv.group_of_block[i]
        idx_in_stage = idx_in_stage + 1 if stage == prev_stage else 0
        prev_stage = stage
        b = f"blocks.{stage}.{idx_in_stage}"
        if blk.expand_conv is not None:  # InvertedResidual
            _put_conv(sd, f"{b}.conv_pw", blk.expand_conv)
            _put_bn(sd, f"{b}.bn1", blk.expand_bn)
            _put_conv(sd, f"{b}.conv_dw", blk.dw)
            _put_bn(sd, f"{b}.bn2", blk.dw_bn)
            if with_se:
                _put_conv(sd, f"{b}.se.conv_reduce", blk.se_reduce)
                _put_conv(sd, f"{b}.se.conv_expand", blk.se_expand)
            _put_conv(sd, f"{b}.conv_pwl", blk.project)
            _put_bn(sd, f"{b}.bn3", blk.project_bn)
        else:  # DepthwiseSeparableConv
            _put_conv(sd, f"{b}.conv_dw", blk.dw)
            _put_bn(sd, f"{b}.bn1", blk.dw_bn)
            if with_se:
                _put_conv(sd, f"{b}.se.conv_reduce", blk.se_reduce)
                _put_conv(sd, f"{b}.se.conv_expand", blk.se_expand)
            _put_conv(sd, f"{b}.conv_pw", blk.project)
            _put_bn(sd, f"{b}.bn2", blk.project_bn)
    # model-level head keys the converter must ignore
    sd["conv_head.weight"] = np.zeros((1280, 320, 1, 1), np.float32)
    sd["bn2.weight"] = np.zeros((1280,), np.float32)
    return sd


def test_convert_timm_efficientnet_upstream_keys():
    """timm-efficientnet-b* checkpoints use timm naming, not
    efficientnet_pytorch naming (round-2 review finding): the dedicated
    converter must map it onto the same flat block{i} tree the
    forward-parity-validated twin conversion produces."""
    from stcd_tpu.convert.torch_to_flax import convert_timm_efficientnet
    from stcd_tpu.encoders.efficientnet import _BASE_BLOCKS, _REF_STAGE_IDXS

    torch.manual_seed(6)
    tv = twins.TEffNetB0(_BASE_BLOCKS, _REF_STAGE_IDXS["b0"])
    twins._randomize_bn(tv)
    tv.eval()

    params, stats = convert_timm_efficientnet(_timm_effnet_sd(tv))
    want_p, want_s = twins._convert_effnet(tv)
    _assert_trees_equal(params, want_p, "timm effnet params")
    _assert_trees_equal(stats, want_s, "timm effnet stats")

    # lite variants: no SE modules anywhere
    params, _ = convert_timm_efficientnet(_timm_effnet_sd(tv, with_se=False))
    for k in want_p:
        if k.startswith("block"):
            want_p[k].pop("se_reduce", None)
            want_p[k].pop("se_expand", None)
    _assert_trees_equal(params, want_p, "timm effnet lite params")


def test_convert_mobilenet_v2_upstream_keys():
    torch.manual_seed(10)
    tv = twins.TMobileNetV2()
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "features.0.0", tv.stem)
    _put_bn(sd, "features.0.1", tv.stem_bn)
    for bi, blk in enumerate(tv.blocks, start=1):
        base = f"features.{bi}.conv"
        if blk.expand is not None:
            _put_conv(sd, f"{base}.0.0", blk.expand)
            _put_bn(sd, f"{base}.0.1", blk.expand_bn)
            _put_conv(sd, f"{base}.1.0", blk.dw)
            _put_bn(sd, f"{base}.1.1", blk.dw_bn)
            _put_conv(sd, f"{base}.2", blk.project)
            _put_bn(sd, f"{base}.3", blk.project_bn)
        else:
            _put_conv(sd, f"{base}.0.0", blk.dw)
            _put_bn(sd, f"{base}.0.1", blk.dw_bn)
            _put_conv(sd, f"{base}.1", blk.project)
            _put_bn(sd, f"{base}.2", blk.project_bn)
    _put_conv(sd, "features.18.0", tv.final)
    _put_bn(sd, "features.18.1", tv.final_bn)

    params, stats = convert_mobilenet_v2(sd)
    want_p, want_s = twins._convert_mobilenet_v2(tv)
    _assert_trees_equal(params, want_p, "mbv2 params")
    _assert_trees_equal(stats, want_s, "mbv2 stats")


def test_convert_mobilenet_v3_upstream_keys():
    """timm mobilenetv3_large_100 staged blocks.{s}.{b} naming flattens
    onto our block{j} in spec order; trailing ConvBnAct -> final_conv."""
    from stcd_tpu.encoders.mobilenet import _V3_LARGE

    class TV3Large(torch.nn.Module):
        def __init__(self):
            super().__init__()
            tnn = torch.nn
            self.stem = tnn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False)
            self.stem_bn = tnn.BatchNorm2d(16)
            blocks, in_c = [], 16
            for group in _V3_LARGE:
                for (k, e, c, se, act, s) in group:
                    blocks.append(twins.TV3Block(in_c, k, e, c, se, act, s))
                    in_c = c
            self.blocks = torch.nn.ModuleList(blocks)
            self.final = tnn.Conv2d(in_c, 960, 1, bias=False)
            self.final_bn = tnn.BatchNorm2d(960)

    torch.manual_seed(26)
    tv = TV3Large()
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "conv_stem", tv.stem)
    _put_bn(sd, "bn1", tv.stem_bn)
    group_sizes = [len(g) for g in _V3_LARGE]
    flat = 0
    for s_i, n in enumerate(group_sizes):
        for b_i in range(n):
            blk = tv.blocks[flat]
            base = f"blocks.{s_i}.{b_i}"
            if blk.expand is not None:  # InvertedResidual
                _put_conv(sd, f"{base}.conv_pw", blk.expand)
                _put_bn(sd, f"{base}.bn1", blk.expand_bn)
                _put_conv(sd, f"{base}.conv_dw", blk.dw)
                _put_bn(sd, f"{base}.bn2", blk.dw_bn)
                _put_conv(sd, f"{base}.conv_pwl", blk.project)
                _put_bn(sd, f"{base}.bn3", blk.project_bn)
            else:  # DepthwiseSeparableConv (stage 0)
                _put_conv(sd, f"{base}.conv_dw", blk.dw)
                _put_bn(sd, f"{base}.bn1", blk.dw_bn)
                _put_conv(sd, f"{base}.conv_pw", blk.project)
                _put_bn(sd, f"{base}.bn2", blk.project_bn)
            if blk.se:
                _put_conv(sd, f"{base}.se.conv_reduce", blk.se_reduce)
                _put_conv(sd, f"{base}.se.conv_expand", blk.se_expand)
            flat += 1
    _put_conv(sd, f"blocks.{len(group_sizes)}.0.conv", tv.final)
    _put_bn(sd, f"blocks.{len(group_sizes)}.0.bn1", tv.final_bn)

    params, stats = convert_mobilenet_v3(sd)

    # twin-validated expectation (mirrors test_mobilenetv3_large_forward_parity)
    want_p = {"stem_conv": {"kernel": twins._conv_w(tv.stem.weight)},
              "final_conv": {"kernel": twins._conv_w(tv.final.weight)}}
    want_s = {}
    want_p["stem_bn"], want_s["stem_bn"] = twins._bn_params(tv.stem_bn)
    want_p["final_bn"], want_s["final_bn"] = twins._bn_params(tv.final_bn)
    for bi, blk in enumerate(tv.blocks):
        bp, bs = {}, {}
        if blk.expand is not None:
            bp["expand_conv"] = {"kernel": twins._conv_w(blk.expand.weight)}
            bp["expand_bn"], bs["expand_bn"] = twins._bn_params(blk.expand_bn)
        bp["dw_conv"] = {"kernel": twins._conv_w(blk.dw.weight)}
        bp["dw_bn"], bs["dw_bn"] = twins._bn_params(blk.dw_bn)
        if blk.se:
            bp["se_reduce"] = {"kernel": twins._conv_w(blk.se_reduce.weight),
                               "bias": _w(blk.se_reduce.bias)}
            bp["se_expand"] = {"kernel": twins._conv_w(blk.se_expand.weight),
                               "bias": _w(blk.se_expand.bias)}
        bp["project_conv"] = {"kernel": twins._conv_w(blk.project.weight)}
        bp["project_bn"], bs["project_bn"] = twins._bn_params(blk.project_bn)
        want_p[f"block{bi}"], want_s[f"block{bi}"] = bp, bs

    _assert_trees_equal(params, want_p, "mbv3 params")
    _assert_trees_equal(stats, want_s, "mbv3 stats")


def test_convert_senet_upstream_keys():
    torch.manual_seed(4)
    tv = twins.TSEResNet50()
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "layer0.conv1", tv.conv1)
    _put_bn(sd, "layer0.bn1", tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            base = f"layer{li}.{bi}"
            for n in (1, 2, 3):
                _put_conv(sd, f"{base}.conv{n}", getattr(blk, f"conv{n}"))
                _put_bn(sd, f"{base}.bn{n}", getattr(blk, f"bn{n}"))
            _put_conv(sd, f"{base}.se_module.fc1", blk.se.fc1)
            _put_conv(sd, f"{base}.se_module.fc2", blk.se.fc2)
            if blk.down is not None:
                _put_conv(sd, f"{base}.downsample.0", blk.down[0])
                _put_bn(sd, f"{base}.downsample.1", blk.down[1])

    params, stats = convert_senet(sd)
    want_p, want_s = twins._convert_se_resnet50(tv)
    _assert_trees_equal(params, want_p, "senet params")
    _assert_trees_equal(stats, want_s, "senet stats")


def test_convert_senet154_three_conv_stem():
    """senet154's layer0 has conv1..3 (pretrainedmodels naming); the
    converter must emit stem_conv1..3/stem_bn1..3."""
    sd = {}
    tnn = torch.nn
    for ci, (ic, oc) in enumerate(((3, 64), (64, 64), (64, 128)), start=1):
        _put_conv(sd, f"layer0.conv{ci}", tnn.Conv2d(ic, oc, 3, bias=False))
        _put_bn(sd, f"layer0.bn{ci}", tnn.BatchNorm2d(oc))
    params, stats = convert_senet(sd)
    assert set(params) == {f"stem_conv{i}" for i in (1, 2, 3)} | {
        f"stem_bn{i}" for i in (1, 2, 3)}
    assert set(stats) == {f"stem_bn{i}" for i in (1, 2, 3)}


@pytest.mark.parametrize("legacy", [False, True])
def test_convert_densenet_upstream_keys(legacy):
    torch.manual_seed(8)
    tv = twins.TDenseNet121()
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "features.conv0", tv.conv0)
    _put_bn(sd, "features.norm0", tv.norm0)
    for i, layers in enumerate(tv.blocks, start=1):
        for j, l in enumerate(layers, start=1):
            base = f"features.denseblock{i}.denselayer{j}"
            for n in (1, 2):
                cname, nname = f"{base}.conv{n}", f"{base}.norm{n}"
                if legacy:  # pre-1.0 torchvision naming: norm.1 / conv.2
                    cname, nname = f"{base}.conv.{n}", f"{base}.norm.{n}"
                _put_conv(sd, cname, getattr(l, f"conv{n}"))
                _put_bn(sd, nname, getattr(l, f"norm{n}"))
    for i in range(1, 4):
        _put_bn(sd, f"features.transition{i}.norm", tv.trans_norm[i - 1])
        _put_conv(sd, f"features.transition{i}.conv", tv.trans_conv[i - 1])
    _put_bn(sd, "features.norm5", tv.norm5)

    params, stats = convert_densenet(sd)
    want_p, want_s = twins._convert_densenet(tv)
    _assert_trees_equal(params, want_p, f"densenet params legacy={legacy}")
    _assert_trees_equal(stats, want_s, f"densenet stats legacy={legacy}")


def test_convert_mit_b0_golden_vs_reference():
    """Full golden: the REFERENCE's own MixVisionTransformer (mit_b0
    config, loaded standalone via _ref_stubs) supplies the upstream
    state_dict AND the eval forward; our MixTransformerEncoder with the
    converted params must match every stage."""
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.encoders import get_encoder

    m = load_ref_smp_file("encoders.mix_transformer")
    cfg = dict(m.mix_transformer_encoders["mit_b0"]["params"])
    cfg.pop("out_channels")
    torch.manual_seed(14)
    ref = m.MixVisionTransformer(**{k: v for k, v in cfg.items()
                                    if k != "patch_size"})
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_mix_transformer(sd)

    rng = np.random.default_rng(15)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(torch.from_numpy(x)) \
            if hasattr(ref, "forward_features") else ref(torch.from_numpy(x))

    enc, ch = get_encoder("mit_b0")
    got = enc.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # got = [x, dummy, c1, c2, c3, c4]; want = [c1, c2, c3, c4]
    assert len(got) == 6 and len(want) == 4
    for i, w in enumerate(want):
        np.testing.assert_allclose(
            np.asarray(got[i + 2]).transpose(0, 3, 1, 2), w.numpy(),
            atol=5e-4, rtol=1e-3, err_msg=f"stage {i}")


@pytest.mark.parametrize("arch", ["mobileone_s0", "mobileone_s4"])
def test_convert_mobileone_reference_state_dict(arch):
    """Strongest converter golden in the zoo: the reference's own vendored
    MobileOne (encoders/mobileone.py, torch-only, loads standalone)
    provides BOTH the real state_dict keys and the golden forward."""
    import os
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_mobileone
    from stcd_tpu.encoders import get_encoder

    mod = load_ref_smp_file("encoders.mobileone")
    cfg = {"mobileone_s0": dict(width_multipliers=(0.75, 1.0, 1.0, 2.0),
                                num_conv_branches=4, use_se=False),
           "mobileone_s4": dict(width_multipliers=(3.0, 3.5, 3.5, 4.0),
                                num_conv_branches=1, use_se=True)}[arch]
    torch.manual_seed(23)
    ref = mod.MobileOne(out_channels=(3, 0, 0, 0, 0, 0), depth=5, **cfg)
    twins._randomize_bn(ref)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    params, stats = convert_mobileone(sd)
    rng = np.random.default_rng(24)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    enc, _ = get_encoder(arch)
    got = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for g, w in zip(got[1:], want[1:]):
        np.testing.assert_allclose(np.asarray(g),
                                   w.detach().numpy().transpose(0, 2, 3, 1),
                                   atol=1e-2, rtol=1e-3)


def test_convert_mobileone_rejects_fused():
    from stcd_tpu.convert.torch_to_flax import convert_mobileone
    with pytest.raises(ValueError, match="reparam_conv"):
        convert_mobileone({"stage0.reparam_conv.weight": np.zeros((8, 3, 3, 3))})


_VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
}


@pytest.mark.parametrize("arch,bn", [("vgg11", False), ("vgg13", True)])
def test_convert_vgg_upstream_keys(arch, bn):
    """torchvision make_layers twin (mechanical: Conv/BN/ReLU/MaxPool per
    cfg letter) emitted under the real `features.N` indices -> convert_vgg
    -> forward parity with our VGGEncoder at every pyramid level."""
    import torch.nn as tnn
    from stcd_tpu.convert.torch_to_flax import convert_vgg
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(31)
    layers = []
    in_c = 3
    for v in _VGG_CFGS[arch]:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
            if bn:
                layers.append(tnn.BatchNorm2d(v))
            layers.append(tnn.ReLU(inplace=True))
            in_c = v
    feats = tnn.Sequential(*layers)
    twins._randomize_bn(feats)
    feats.eval()

    sd = {f"features.{k}": v.numpy() for k, v in feats.state_dict().items()}
    params, stats = convert_vgg(sd)

    rng = np.random.default_rng(32)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    want = []
    with torch.no_grad():
        h = torch.from_numpy(x)
        for m in feats:
            if isinstance(m, tnn.MaxPool2d):
                want.append(h)
            h = m(h)
        want.append(h)  # after the final pool

    enc, _ = get_encoder(arch + ("_bn" if bn else ""))
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if stats:
        variables["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    got = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    assert len(got) == len(want) == 6
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g),
                                   w.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"{arch} stage {i}")


def test_convert_timm_res2net_upstream_keys():
    """timm res2net naming: layerL.B.{conv1,bn1,convs.N,bns.N,conv3,bn3,
    downsample.0/1} over the forward-parity-validated Bottle2neck twin."""
    from stcd_tpu.convert.torch_to_flax import convert_timm_res2net

    torch.manual_seed(12)
    tv = twins.TRes2Net50()
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "conv1", tv.conv1)
    _put_bn(sd, "bn1", tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            b = f"layer{li}.{bi}"
            _put_conv(sd, f"{b}.conv1", blk.conv1)
            _put_bn(sd, f"{b}.bn1", blk.bn1)
            for i, (conv, bn) in enumerate(zip(blk.convs, blk.bns)):
                _put_conv(sd, f"{b}.convs.{i}", conv)
                _put_bn(sd, f"{b}.bns.{i}", bn)
            _put_conv(sd, f"{b}.conv3", blk.conv3)
            _put_bn(sd, f"{b}.bn3", blk.bn3)
            if blk.down is not None:
                _put_conv(sd, f"{b}.downsample.0", blk.down[0])
                _put_bn(sd, f"{b}.downsample.1", blk.down[1])
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # head: ignored

    params, stats = convert_timm_res2net(sd)
    want_p, want_s = twins._convert_res2net(tv)
    _assert_trees_equal(params, want_p, "res2net params")
    _assert_trees_equal(stats, want_s, "res2net stats")


def test_convert_timm_resnest_upstream_keys():
    """timm resnest naming: deep stem conv1.{0,1,3,4,6}+bn1, SplAtConv2d
    conv2.{conv,bn0,fc1,bn1,fc2}, avg_down downsample.{1,2}."""
    from stcd_tpu.convert.torch_to_flax import convert_timm_resnest

    torch.manual_seed(18)
    tv = twins.TResNest(layers=(1, 1, 1, 1), stem_w=32, radix=2, groups=1,
                        base_width=64, avd_first=False)
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    for (ck, bk), stem in zip((("conv1.0", "conv1.1"), ("conv1.3", "conv1.4"),
                               ("conv1.6", "bn1")), tv.stem):
        _put_conv(sd, ck, stem[0])
        _put_bn(sd, bk, stem[1])
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            b = f"layer{li}.{bi}"
            _put_conv(sd, f"{b}.conv1", blk.conv1)
            _put_bn(sd, f"{b}.bn1", blk.bn1)
            _put_conv(sd, f"{b}.conv2.conv", blk.attn.conv)
            _put_bn(sd, f"{b}.conv2.bn0", blk.attn.bn0)
            _put_conv(sd, f"{b}.conv2.fc1", blk.attn.fc1)
            _put_bn(sd, f"{b}.conv2.bn1", blk.attn.bn1)
            _put_conv(sd, f"{b}.conv2.fc2", blk.attn.fc2)
            _put_conv(sd, f"{b}.conv3", blk.conv3)
            _put_bn(sd, f"{b}.bn3", blk.bn3)
            if blk.down:
                _put_conv(sd, f"{b}.downsample.1", blk.down_conv)
                _put_bn(sd, f"{b}.downsample.2", blk.down_bn)

    params, stats = convert_timm_resnest(sd)
    want_p, want_s = twins._convert_resnest(tv)
    _assert_trees_equal(params, want_p, "resnest params")
    _assert_trees_equal(stats, want_s, "resnest stats")


@pytest.mark.parametrize("bottleneck,layers", [(False, (2, 2, 2, 2)),
                                               (True, (3, 4, 6, 3))])
def test_convert_timm_sknet_upstream_keys(bottleneck, layers):
    """timm sknet naming: SelectiveKernel at conv1 (basic) / conv2
    (bottleneck) with paths.N ConvNormAct + attn.{fc_reduce,bn,fc_select};
    plain ConvNormAct for the other convs."""
    from stcd_tpu.convert.torch_to_flax import convert_timm_sknet

    torch.manual_seed(20)
    tv = twins.TSKNet(bottleneck, layers)
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "conv1", tv.conv1)
    _put_bn(sd, "bn1", tv.bn1)
    for li, layer in enumerate(tv.layers, start=1):
        for bi, blk in enumerate(layer):
            b = f"layer{li}.{bi}"
            sk_base = f"{b}.conv2" if bottleneck else f"{b}.conv1"
            for i, path in enumerate(blk.sk.paths):
                _put_conv(sd, f"{sk_base}.paths.{i}.conv", path[0])
                _put_bn(sd, f"{sk_base}.paths.{i}.bn", path[1])
            _put_conv(sd, f"{sk_base}.attn.fc_reduce", blk.sk.fc_reduce)
            _put_bn(sd, f"{sk_base}.attn.bn", blk.sk.bn)
            _put_conv(sd, f"{sk_base}.attn.fc_select", blk.sk.fc_select)
            if bottleneck:
                _put_conv(sd, f"{b}.conv1.conv", blk.conv1)
                _put_bn(sd, f"{b}.conv1.bn", blk.bn1)
                _put_conv(sd, f"{b}.conv3.conv", blk.conv3)
                _put_bn(sd, f"{b}.conv3.bn", blk.bn3)
            else:
                _put_conv(sd, f"{b}.conv2.conv", blk.conv2)
                _put_bn(sd, f"{b}.conv2.bn", blk.bn2)
            if blk.down is not None:
                _put_conv(sd, f"{b}.downsample.0", blk.down[0])
                _put_bn(sd, f"{b}.downsample.1", blk.down[1])

    params, stats = convert_timm_sknet(sd)
    want_p, want_s = twins._convert_sk(tv, bottleneck)
    _assert_trees_equal(params, want_p, "sknet params")
    _assert_trees_equal(stats, want_s, "sknet stats")


def test_convert_timm_regnet_upstream_keys():
    """timm regnet naming: stem.{conv,bn}; sS.bB (1-indexed) blocks of
    ConvNormAct conv1/2/3 + SEModule se.fc1/fc2 + ConvNormAct downsample."""
    import torch.nn.functional as F  # noqa: F401 (twin forward)
    from stcd_tpu.convert.torch_to_flax import convert_timm_regnet
    from stcd_tpu.encoders.regnet import generate_regnet

    widths, depths, group_sizes = generate_regnet("regnety_002")
    torch.manual_seed(22)
    stages, in_c = [], 32
    for w, d, g in zip(widths, depths, group_sizes):
        blocks = []
        for b in range(d):
            blocks.append(twins.TRegNetBlock(in_c, w, g,
                                             stride=2 if b == 0 else 1,
                                             se_ratio=0.25))
            in_c = w
        stages.append(blocks)
    import torch.nn as tnn
    stem = tnn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False)
    stem_bn = tnn.BatchNorm2d(32)
    for m in [stem_bn] + [blk for st in stages for blk in st]:
        twins._randomize_bn(m)

    sd = {}
    _put_conv(sd, "stem.conv", stem)
    _put_bn(sd, "stem.bn", stem_bn)
    want_p = {"stem_conv": {"kernel": twins._conv_w(stem.weight)}}
    want_s = {}
    want_p["stem_bn"], want_s["stem_bn"] = twins._bn_params(stem_bn)
    for si, blocks in enumerate(stages, start=1):
        for bi, blk in enumerate(blocks):
            b = f"s{si}.b{bi + 1}"
            bp, bs = {}, {}
            for n in (1, 2, 3):
                conv = getattr(blk, f"conv{n}")
                bn = getattr(blk, f"bn{n}")
                _put_conv(sd, f"{b}.conv{n}.conv", conv)
                _put_bn(sd, f"{b}.conv{n}.bn", bn)
                bp[f"conv{n}"] = {"kernel": twins._conv_w(conv.weight)}
                bp[f"bn{n}"], bs[f"bn{n}"] = twins._bn_params(bn)
            _put_conv(sd, f"{b}.se.fc1", blk.se_fc1)
            _put_conv(sd, f"{b}.se.fc2", blk.se_fc2)
            bp["se_fc1"] = {"kernel": twins._conv_w(blk.se_fc1.weight),
                            "bias": blk.se_fc1.bias.detach().numpy()}
            bp["se_fc2"] = {"kernel": twins._conv_w(blk.se_fc2.weight),
                            "bias": blk.se_fc2.bias.detach().numpy()}
            if blk.down is not None:
                _put_conv(sd, f"{b}.downsample.conv", blk.down[0])
                _put_bn(sd, f"{b}.downsample.bn", blk.down[1])
                bp["downsample_conv"] = {"kernel": twins._conv_w(blk.down[0].weight)}
                bp["downsample_bn"], bs["downsample_bn"] = twins._bn_params(blk.down[1])
            want_p[f"stage{si}_block{bi}"] = bp
            want_s[f"stage{si}_block{bi}"] = bs

    params, stats = convert_timm_regnet(sd)
    _assert_trees_equal(params, want_p, "regnet params")
    _assert_trees_equal(stats, want_s, "regnet stats")


def test_convert_timm_gernet_upstream_keys():
    """timm ByobNet naming for gernet: stem/final_conv ConvNormAct;
    stages.S.B blocks conv1_kxk+conv2_kxk (basic) or
    conv1_1x1+conv2_kxk+conv3_1x1 (bottle); ConvNormAct shortcut."""
    import torch.nn as tnn
    from stcd_tpu.convert.torch_to_flax import convert_timm_gernet
    from stcd_tpu.encoders.gernet import _GERNET_CFGS

    cfg = _GERNET_CFGS["gernet_s"]
    torch.manual_seed(24)
    stem = tnn.Conv2d(3, cfg["stem"], 3, stride=2, padding=1, bias=False)
    stem_bn = tnn.BatchNorm2d(cfg["stem"])
    stages, in_c = [], cfg["stem"]
    for kind, d, c, s, gs, br in cfg["blocks"]:
        blocks = []
        for b in range(d):
            blocks.append(twins.TGERBlock(in_c, kind, c,
                                          stride=s if b == 0 else 1,
                                          group_size=gs, bottle_ratio=br))
            in_c = c
        stages.append((kind, blocks))
    final = tnn.Conv2d(in_c, cfg["features"], 1, bias=False)
    final_bn = tnn.BatchNorm2d(cfg["features"])
    for m in [stem_bn, final_bn] + [blk for _, st in stages for blk in st]:
        twins._randomize_bn(m)

    sd = {}
    _put_conv(sd, "stem.conv", stem)
    _put_bn(sd, "stem.bn", stem_bn)
    want_p = {"stem_conv": {"kernel": twins._conv_w(stem.weight)},
              "final_conv": {"kernel": twins._conv_w(final.weight)}}
    want_s = {}
    want_p["stem_bn"], want_s["stem_bn"] = twins._bn_params(stem_bn)
    want_p["final_bn"], want_s["final_bn"] = twins._bn_params(final_bn)
    for si, (kind, blocks) in enumerate(stages):
        for bi, blk in enumerate(blocks):
            b = f"stages.{si}.{bi}"
            bp, bs = {}, {}
            if kind == "basic":
                pairs = (("conv1", "conv1_kxk"), ("conv2", "conv2_kxk"))
            else:
                pairs = (("conv1", "conv1_1x1"), ("conv2", "conv2_kxk"),
                         ("conv3", "conv3_1x1"))
            for ours, theirs in pairs:
                conv = getattr(blk, ours)
                bn = getattr(blk, "bn" + ours[-1])
                _put_conv(sd, f"{b}.{theirs}.conv", conv)
                _put_bn(sd, f"{b}.{theirs}.bn", bn)
                bp[ours] = {"kernel": twins._conv_w(conv.weight)}
                bp["bn" + ours[-1]], bs["bn" + ours[-1]] = twins._bn_params(bn)
            if blk.down is not None:
                _put_conv(sd, f"{b}.shortcut.conv", blk.down[0])
                _put_bn(sd, f"{b}.shortcut.bn", blk.down[1])
                bp["shortcut_conv"] = {"kernel": twins._conv_w(blk.down[0].weight)}
                bp["shortcut_bn"], bs["shortcut_bn"] = twins._bn_params(blk.down[1])
            want_p[f"stage{si}_block{bi}"] = bp
            want_s[f"stage{si}_block{bi}"] = bs
    _put_conv(sd, "final_conv.conv", final)
    _put_bn(sd, "final_conv.bn", final_bn)

    params, stats = convert_timm_gernet(sd)
    _assert_trees_equal(params, want_p, "gernet params")
    _assert_trees_equal(stats, want_s, "gernet stats")


def test_convert_dpn_upstream_keys():
    """Cadene pretrainedmodels dpn naming: features.conv1_1 InputBlock,
    features.convS_J DualPathBlocks (BnActConv2d: .bn + .conv, proj convs
    suffixed _s1/_s2 by stride), final features.conv5_bn_ac CatBnAct."""
    from stcd_tpu.convert.torch_to_flax import convert_dpn

    torch.manual_seed(14)
    tv = twins.TDPN68()
    twins._randomize_bn(tv)
    tv.eval()

    sd = {}
    _put_conv(sd, "features.conv1_1.conv", tv.stem)
    _put_bn(sd, "features.conv1_1.bn", tv.stem_bn)
    for i, blocks in enumerate(tv.groups_list):
        for j, blk in enumerate(blocks, start=1):
            b = f"features.conv{i + 2}_{j}"
            if blk.proj:
                w_name = "c1x1_w_s2" if blk.stride == 2 else "c1x1_w_s1"
                _put_conv(sd, f"{b}.{w_name}.conv", blk.w)
                _put_bn(sd, f"{b}.{w_name}.bn", blk.w_bn.bn)
            _put_conv(sd, f"{b}.c1x1_a.conv", blk.a)
            _put_bn(sd, f"{b}.c1x1_a.bn", blk.a_bn.bn)
            _put_conv(sd, f"{b}.c3x3_b.conv", blk.b)
            _put_bn(sd, f"{b}.c3x3_b.bn", blk.b_bn.bn)
            _put_conv(sd, f"{b}.c1x1_c.conv", blk.c)
            _put_bn(sd, f"{b}.c1x1_c.bn", blk.c_bn.bn)
    _put_bn(sd, "features.conv5_bn_ac.bn", tv.final_bn)
    sd["last_linear.weight"] = np.zeros((1000, 832, 1, 1), np.float32)

    params, stats = convert_dpn(sd)
    want_p, want_s = twins._convert_dpn68(tv)
    _assert_trees_equal(params, want_p, "dpn params")
    _assert_trees_equal(stats, want_s, "dpn stats")


class _TXSeparable(torch.nn.Module):
    """Cadene SeparableConv2d: depthwise .conv1 + .pointwise."""

    def __init__(self, in_c, out_c, k=3, stride=1, padding=1):
        super().__init__()
        import torch.nn as tnn
        self.conv1 = tnn.Conv2d(in_c, in_c, k, stride, padding, groups=in_c,
                                bias=False)
        self.pointwise = tnn.Conv2d(in_c, out_c, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.conv1(x))


class _TXBlock(torch.nn.Module):
    """Cadene xception Block: rep Sequential (ReLU/Separable/BN [+pool]),
    skip/skipbn 1x1 shortcut — attribute names give the REAL upstream
    state_dict keys."""

    def __init__(self, in_c, out_c, reps, strides=1, start_with_relu=True,
                 grow_first=True):
        super().__init__()
        import torch.nn as tnn
        rep = []
        filters = in_c
        if grow_first:
            rep += [tnn.ReLU(), _TXSeparable(in_c, out_c), tnn.BatchNorm2d(out_c)]
            filters = out_c
        for _ in range(reps - 1):
            rep += [tnn.ReLU(), _TXSeparable(filters, filters),
                    tnn.BatchNorm2d(filters)]
        if not grow_first:
            rep += [tnn.ReLU(), _TXSeparable(in_c, out_c), tnn.BatchNorm2d(out_c)]
        if not start_with_relu:
            rep = rep[1:]
        if strides != 1:
            rep.append(tnn.MaxPool2d(3, strides, 1))
        self.rep = tnn.Sequential(*rep)
        self.skip, self.skipbn = None, None
        if out_c != in_c or strides != 1:
            self.skip = tnn.Conv2d(in_c, out_c, 1, stride=strides, bias=False)
            self.skipbn = tnn.BatchNorm2d(out_c)

    def forward(self, x):
        h = self.rep(x)
        skip = self.skipbn(self.skip(x)) if self.skip is not None else x
        return h + skip


class _TXception(torch.nn.Module):
    """Cadene xception with OUR documented stem deviation (SAME padding on
    conv1/conv2 so the pyramid halves exactly; upstream uses padding=0)."""

    def __init__(self):
        super().__init__()
        import torch.nn as tnn
        self.conv1 = tnn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(32)
        self.conv2 = tnn.Conv2d(32, 64, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.block1 = _TXBlock(64, 128, 2, 2, start_with_relu=False)
        self.block2 = _TXBlock(128, 256, 2, 2)
        self.block3 = _TXBlock(256, 728, 2, 2)
        for i in range(4, 12):
            setattr(self, f"block{i}", _TXBlock(728, 728, 3, 1))
        self.block12 = _TXBlock(728, 1024, 2, 2, grow_first=False)
        self.conv3 = _TXSeparable(1024, 1536)
        self.bn3 = torch.nn.BatchNorm2d(1536)
        self.conv4 = _TXSeparable(1536, 2048)
        self.bn4 = torch.nn.BatchNorm2d(2048)

    def forward(self, x):
        import torch.nn.functional as F
        feats = [x]
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        feats.append(h)
        h = self.block1(h)
        feats.append(h)
        h = self.block2(h)
        feats.append(h)
        h = self.block3(h)
        for i in range(4, 12):
            h = getattr(self, f"block{i}")(h)
        feats.append(h)
        h = self.block12(h)
        h = F.relu(self.bn3(self.conv3(h)))
        h = self.bn4(self.conv4(h))  # smp stage 5 ends at bn4 (no relu)
        feats.append(h)
        return feats


def test_convert_xception_upstream_keys_and_forward():
    """First numeric golden for the xception family: the Cadene-faithful
    twin provides real state_dict keys AND the forward reference, so this
    validates the converter and the encoder architecture in one shot."""
    from stcd_tpu.convert.torch_to_flax import convert_xception
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(40)
    tv = _TXception()
    twins._randomize_bn(tv)
    tv.eval()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()
          if "num_batches" not in k}

    params, stats = convert_xception(sd)
    rng = np.random.default_rng(41)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(x))
    enc, ch = get_encoder("xception")
    got = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert tuple(g.shape[-1] for g in got) == tuple(ch)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


def _bc2d(in_c, out_c, k=3, stride=1):
    """Cadene BasicConv2d with OUR documented symmetric k//2 padding
    (upstream pads 0 on several convs; encoders/inception.py deviation).
    Attribute names (.conv/.bn) give the real upstream keys."""
    import torch.nn as tnn

    class _BC(tnn.Module):
        def __init__(self):
            super().__init__()
            kk = (k, k) if isinstance(k, int) else k
            self.conv = tnn.Conv2d(in_c, out_c, kk, stride,
                                   (kk[0] // 2, kk[1] // 2), bias=False)
            self.bn = tnn.BatchNorm2d(out_c, eps=1e-3)

        def forward(self, x):
            import torch.nn.functional as F
            return F.relu(self.bn(self.conv(x)))

    return _BC()


def _avgp(x):
    import torch.nn.functional as F
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


def _maxp(x):
    import torch.nn.functional as F
    return F.max_pool2d(x, 3, 2, 1)


def test_convert_inceptionv4_upstream_keys_and_forward():
    """First numeric golden for inceptionv4: Cadene-faithful twin (real
    features.N/branchN key layout) -> convert_inceptionv4 -> forward parity
    at all 6 pyramid taps."""
    import torch.nn as tnn
    from stcd_tpu.convert.torch_to_flax import convert_inceptionv4
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(50)

    class MixedA(tnn.Module):
        def __init__(self, in_c=384):
            super().__init__()
            self.branch0 = _bc2d(in_c, 96, 1)
            self.branch1 = tnn.Sequential(_bc2d(in_c, 64, 1), _bc2d(64, 96, 3))
            self.branch2 = tnn.Sequential(_bc2d(in_c, 64, 1), _bc2d(64, 96, 3),
                                          _bc2d(96, 96, 3))
            self.branch3 = tnn.Sequential(tnn.Identity(), _bc2d(in_c, 96, 1))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x), self.branch3[1](_avgp(x))], 1)

    class MixedB(tnn.Module):
        def __init__(self, in_c=1024):
            super().__init__()
            self.branch0 = _bc2d(in_c, 384, 1)
            self.branch1 = tnn.Sequential(_bc2d(in_c, 192, 1),
                                          _bc2d(192, 224, (1, 7)),
                                          _bc2d(224, 256, (7, 1)))
            self.branch2 = tnn.Sequential(_bc2d(in_c, 192, 1),
                                          _bc2d(192, 192, (7, 1)),
                                          _bc2d(192, 224, (1, 7)),
                                          _bc2d(224, 224, (7, 1)),
                                          _bc2d(224, 256, (1, 7)))
            self.branch3 = tnn.Sequential(tnn.Identity(), _bc2d(in_c, 128, 1))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x), self.branch3[1](_avgp(x))], 1)

    class MixedC(tnn.Module):
        def __init__(self, in_c=1536):
            super().__init__()
            self.branch0 = _bc2d(in_c, 256, 1)
            self.branch1_0 = _bc2d(in_c, 384, 1)
            self.branch1_1a = _bc2d(384, 256, (1, 3))
            self.branch1_1b = _bc2d(384, 256, (3, 1))
            self.branch2_0 = _bc2d(in_c, 384, 1)
            self.branch2_1 = _bc2d(384, 448, (3, 1))
            self.branch2_2 = _bc2d(448, 512, (1, 3))
            self.branch2_3a = _bc2d(512, 256, (1, 3))
            self.branch2_3b = _bc2d(512, 256, (3, 1))
            self.branch3 = tnn.Sequential(tnn.Identity(), _bc2d(in_c, 256, 1))

        def forward(self, x):
            b1 = self.branch1_0(x)
            b2 = self.branch2_2(self.branch2_1(self.branch2_0(x)))
            return torch.cat([
                self.branch0(x), self.branch1_1a(b1), self.branch1_1b(b1),
                self.branch2_3a(b2), self.branch2_3b(b2),
                self.branch3[1](_avgp(x))], 1)

    class Mixed3a(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = _bc2d(64, 96, 3, 2)

        def forward(self, x):
            return torch.cat([_maxp(x), self.conv(x)], 1)

    class Mixed4a(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = tnn.Sequential(_bc2d(160, 64, 1), _bc2d(64, 96, 3))
            self.branch1 = tnn.Sequential(_bc2d(160, 64, 1),
                                          _bc2d(64, 64, (1, 7)),
                                          _bc2d(64, 64, (7, 1)),
                                          _bc2d(64, 96, 3))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x)], 1)

    class Mixed5a(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = _bc2d(192, 192, 3, 2)

        def forward(self, x):
            return torch.cat([self.conv(x), _maxp(x)], 1)

    class RedA(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = _bc2d(384, 384, 3, 2)
            self.branch1 = tnn.Sequential(_bc2d(384, 192, 1),
                                          _bc2d(192, 224, 3),
                                          _bc2d(224, 256, 3, 2))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x), _maxp(x)], 1)

    class RedB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = tnn.Sequential(_bc2d(1024, 192, 1),
                                          _bc2d(192, 192, 3, 2))
            self.branch1 = tnn.Sequential(_bc2d(1024, 256, 1),
                                          _bc2d(256, 256, (1, 7)),
                                          _bc2d(256, 320, (7, 1)),
                                          _bc2d(320, 320, 3, 2))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x), _maxp(x)], 1)

    feats = [_bc2d(3, 32, 3, 2), _bc2d(32, 32, 3), _bc2d(32, 64, 3),
             Mixed3a(), Mixed4a(), Mixed5a(),
             MixedA(), MixedA(), MixedA(), MixedA(), RedA()]
    feats += [MixedB() for _ in range(7)] + [RedB()]
    feats += [MixedC() for _ in range(3)]
    tv = torch.nn.Module()
    tv.features = torch.nn.Sequential(*feats)
    twins._randomize_bn(tv)
    tv.eval()

    sd = {k: v.numpy() for k, v in tv.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_inceptionv4(sd)

    rng = np.random.default_rng(51)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    taps, want = {2, 4, 8, 14, 21}, []
    with torch.no_grad():
        h = torch.from_numpy(x)
        want.append(h)
        for i, m in enumerate(tv.features):
            h = m(h)
            if i in taps:
                want.append(h)
    enc, ch = get_encoder("inceptionv4")
    got = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert tuple(g.shape[-1] for g in got) == tuple(ch)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


def test_convert_inceptionresnetv2_upstream_keys_and_forward():
    """First numeric golden for inceptionresnetv2: Cadene-faithful twin
    (real named-attribute key layout incl. the biased residual up-convs)
    -> convert_inceptionresnetv2 -> forward parity at all 6 taps."""
    import torch.nn as tnn
    import torch.nn.functional as F
    from stcd_tpu.convert.torch_to_flax import convert_inceptionresnetv2
    from stcd_tpu.encoders import get_encoder

    torch.manual_seed(52)

    class Mixed5b(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = _bc2d(192, 96, 1)
            self.branch1 = tnn.Sequential(_bc2d(192, 48, 1), _bc2d(48, 64, 5))
            self.branch2 = tnn.Sequential(_bc2d(192, 64, 1), _bc2d(64, 96, 3),
                                          _bc2d(96, 96, 3))
            self.branch3 = tnn.Sequential(tnn.Identity(), _bc2d(192, 64, 1))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x), self.branch3[1](_avgp(x))], 1)

    class Block35(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = _bc2d(320, 32, 1)
            self.branch1 = tnn.Sequential(_bc2d(320, 32, 1), _bc2d(32, 32, 3))
            self.branch2 = tnn.Sequential(_bc2d(320, 32, 1), _bc2d(32, 48, 3),
                                          _bc2d(48, 64, 3))
            self.conv2d = tnn.Conv2d(128, 320, 1)

        def forward(self, x):
            up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x),
                                        self.branch2(x)], 1))
            return F.relu(x + 0.17 * up)

    class Mixed6a(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = _bc2d(320, 384, 3, 2)
            self.branch1 = tnn.Sequential(_bc2d(320, 256, 1),
                                          _bc2d(256, 256, 3),
                                          _bc2d(256, 384, 3, 2))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x), _maxp(x)], 1)

    class Block17(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = _bc2d(1088, 192, 1)
            self.branch1 = tnn.Sequential(_bc2d(1088, 128, 1),
                                          _bc2d(128, 160, (1, 7)),
                                          _bc2d(160, 192, (7, 1)))
            self.conv2d = tnn.Conv2d(384, 1088, 1)

        def forward(self, x):
            up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x)], 1))
            return F.relu(x + 0.10 * up)

    class Mixed7a(tnn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = tnn.Sequential(_bc2d(1088, 256, 1),
                                          _bc2d(256, 384, 3, 2))
            self.branch1 = tnn.Sequential(_bc2d(1088, 256, 1),
                                          _bc2d(256, 288, 3, 2))
            self.branch2 = tnn.Sequential(_bc2d(1088, 256, 1),
                                          _bc2d(256, 288, 3),
                                          _bc2d(288, 320, 3, 2))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x), _maxp(x)], 1)

    class Block8(tnn.Module):
        def __init__(self, scale=0.20, relu=True):
            super().__init__()
            self.scale, self.relu = scale, relu
            self.branch0 = _bc2d(2080, 192, 1)
            self.branch1 = tnn.Sequential(_bc2d(2080, 192, 1),
                                          _bc2d(192, 224, (1, 3)),
                                          _bc2d(224, 256, (3, 1)))
            self.conv2d = tnn.Conv2d(448, 2080, 1)

        def forward(self, x):
            up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x)], 1))
            out = x + self.scale * up
            return F.relu(out) if self.relu else out

    tv = tnn.Module()
    tv.conv2d_1a = _bc2d(3, 32, 3, 2)
    tv.conv2d_2a = _bc2d(32, 32, 3)
    tv.conv2d_2b = _bc2d(32, 64, 3)
    tv.conv2d_3b = _bc2d(64, 80, 1)
    tv.conv2d_4a = _bc2d(80, 192, 3)
    tv.mixed_5b = Mixed5b()
    tv.repeat = tnn.Sequential(*[Block35() for _ in range(10)])
    tv.mixed_6a = Mixed6a()
    tv.repeat_1 = tnn.Sequential(*[Block17() for _ in range(20)])
    tv.mixed_7a = Mixed7a()
    tv.repeat_2 = tnn.Sequential(*[Block8() for _ in range(9)])
    tv.block8 = Block8(scale=1.0, relu=False)
    tv.conv2d_7b = _bc2d(2080, 1536, 1)
    twins._randomize_bn(tv)
    tv.eval()

    sd = {k: v.numpy() for k, v in tv.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_inceptionresnetv2(sd)

    rng = np.random.default_rng(53)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        want = [h]
        h = tv.conv2d_2b(tv.conv2d_2a(tv.conv2d_1a(h)))
        want.append(h)
        h = tv.conv2d_4a(tv.conv2d_3b(_maxp(h)))
        want.append(h)
        h = tv.repeat(tv.mixed_5b(_maxp(h)))
        want.append(h)
        h = tv.repeat_1(tv.mixed_6a(h))
        want.append(h)
        h = tv.conv2d_7b(tv.block8(tv.repeat_2(tv.mixed_7a(h))))
        want.append(h)

    enc, ch = get_encoder("inceptionresnetv2")
    got = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert tuple(g.shape[-1] for g in got) == tuple(ch)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")

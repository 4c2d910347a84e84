"""Encoder-zoo coverage: every registered family obeys the smp stage
contract (ref encoders/resnet.py:1-24 docstring): depth+1 NHWC features,
f0 = input, each level exactly 2x smaller, channels per the registry's
out_channels table (which mirrors the reference's per-variant tables)."""

import jax
import jax.numpy as jnp
import pytest

from stcd_tpu.encoders import encoder_names, get_encoder

# one representative per family for shape-tracing (cheap: eval_shape only);
# the full variant list is covered by the registry-table test below
REPRESENTATIVES = [
    "resnet18", "resnext50_32x4d", "vgg11_bn", "mit_b0",
    "densenet121", "efficientnet-b0", "timm-tf_efficientnet_lite0",
    "mobilenet_v2", "timm-mobilenetv3_large_100",
    "timm-mobilenetv3_small_075", "se_resnet50", "se_resnext50_32x4d",
    "senet154", "xception", "inceptionv4", "inceptionresnetv2", "dpn68",
    "timm-regnetx_002", "timm-regnety_002", "timm-res2net50_26w_4s",
    "timm-resnest14d", "timm-skresnet18", "timm-skresnext50_32x4d",
    "timm-gernet_s", "mobileone_s0",
]

_VGG_LIKE = {"vgg"}  # vgg has no identity stage; first feature is full-res


def _expected_shapes(name, out_channels, size=64, depth=5):
    if name.startswith("vgg"):
        # smp vgg: 6 features, first at full res (64ch), last pooled /32
        return [(1, size // (2 ** i), size // (2 ** i), c)
                for i, c in enumerate(out_channels)]
    return [(1, size // (2 ** i), size // (2 ** i), c)
            for i, c in enumerate(out_channels)]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_stage_contract_shapes(name):
    size = 64
    module, oc = get_encoder(name)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    outs, _ = jax.eval_shape(
        lambda r, x: module.init_with_output(r, x, train=False),
        jax.random.PRNGKey(0), x)
    assert len(outs) == 6
    for i, (o, c) in enumerate(zip(outs, oc)):
        s = size // (2 ** i)
        assert o.shape == (1, s, s, c), (
            f"{name} stage {i}: got {o.shape}, want {(1, s, s, c)}")


def test_registry_covers_reference_families():
    names = set(encoder_names())
    # spot-check the reference's full variant lists (SURVEY.md §2.4)
    for required in [
        "resnet34", "resnet101", "resnet152", "resnext101_32x48d",
        "vgg13", "vgg19_bn", "densenet161", "densenet169", "densenet201",
        "efficientnet-b7", "timm-efficientnet-b8", "timm-efficientnet-l2",
        "timm-tf_efficientnet_lite4", "se_resnet101", "se_resnet152",
        "se_resnext101_32x4d", "dpn68b", "dpn92", "dpn98", "dpn107",
        "dpn131", "timm-regnetx_320", "timm-regnety_320",
        "timm-res2net101_26w_4s", "timm-res2net50_48w_2s",
        "timm-res2net50_14w_8s", "timm-res2next50", "timm-resnest269e",
        "timm-resnest50d_4s2x40d", "timm-resnest50d_1s4x24d",
        "timm-skresnet34", "timm-gernet_l", "mobileone_s4",
        "timm-mobilenetv3_large_minimal_100", "mit_b5",
    ]:
        assert required in names, required


def test_reference_out_channel_tables():
    """Channel contracts pinned to the reference's tables."""
    from stcd_tpu.encoders import encoder_out_channels as eoc
    assert eoc("densenet121") == (3, 64, 256, 512, 1024, 1024)
    assert eoc("densenet161") == (3, 96, 384, 768, 2112, 2208)
    assert eoc("densenet169") == (3, 64, 256, 512, 1280, 1664)
    assert eoc("densenet201") == (3, 64, 256, 512, 1792, 1920)
    assert eoc("efficientnet-b0") == (3, 32, 24, 40, 112, 320)
    assert eoc("efficientnet-b7") == (3, 64, 48, 80, 224, 640)
    assert eoc("timm-efficientnet-b8") == (3, 72, 56, 88, 248, 704)
    assert eoc("timm-efficientnet-l2") == (3, 136, 104, 176, 480, 1376)
    assert eoc("timm-tf_efficientnet_lite3") == (3, 32, 32, 48, 136, 384)
    assert eoc("mobilenet_v2") == (3, 16, 24, 32, 96, 1280)
    assert eoc("senet154") == (3, 128, 256, 512, 1024, 2048)
    assert eoc("se_resnext50_32x4d") == (3, 64, 256, 512, 1024, 2048)
    assert eoc("xception") == (3, 64, 128, 256, 728, 2048)
    assert eoc("inceptionv4") == (3, 64, 192, 384, 1024, 1536)
    assert eoc("inceptionresnetv2") == (3, 64, 192, 320, 1088, 1536)
    assert eoc("dpn68") == (3, 10, 144, 320, 704, 832)
    assert eoc("dpn92") == (3, 64, 336, 704, 1552, 2688)
    assert eoc("dpn98") == (3, 96, 336, 768, 1728, 2688)
    assert eoc("dpn107") == (3, 128, 376, 1152, 2432, 2688)
    assert eoc("dpn131") == (3, 128, 352, 832, 1984, 2688)
    assert eoc("timm-regnetx_002") == (3, 32, 24, 56, 152, 368)
    assert eoc("timm-regnety_320") == (3, 32, 232, 696, 1392, 3712)
    assert eoc("timm-res2net50_26w_4s") == (3, 64, 256, 512, 1024, 2048)
    assert eoc("timm-resnest101e") == (3, 128, 256, 512, 1024, 2048)
    assert eoc("timm-skresnet18") == (3, 64, 64, 128, 256, 512)
    assert eoc("timm-gernet_s") == (3, 13, 48, 48, 384, 1920)
    assert eoc("timm-gernet_m") == (3, 32, 128, 192, 640, 2560)
    assert eoc("mobileone_s0") == (3, 48, 48, 128, 256, 1024)
    assert eoc("mobileone_s4") == (3, 64, 192, 448, 896, 2048)
    assert eoc("timm-mobilenetv3_large_100") == (3, 16, 24, 40, 112, 960)
    assert eoc("timm-mobilenetv3_small_100") == (3, 16, 16, 24, 48, 576)
    assert eoc("timm-mobilenetv3_large_075") == (3, 16, 24, 32, 88, 720)


def test_tu_prefix_resolves_locally():
    m, oc = get_encoder("tu-resnet18")
    assert oc == (3, 64, 64, 128, 256, 512)
    with pytest.raises(KeyError):
        get_encoder("tu-nonexistent_model")


def test_real_forward_smallest():
    """One real (non-eval_shape) forward through a cheap new-family
    encoder to catch runtime-only issues (padding, pooling, splits)."""
    module, oc = get_encoder("timm-gernet_s")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    outs = module.apply(variables, x, train=False)
    assert [o.shape[-1] for o in outs] == list(oc)


def test_output_stride_dilated_encoder():
    """get_encoder(output_stride=...) parity (ref encoders/__init__.py:88,
    _base.py make_dilated): deepest stages dilate instead of stride."""
    import jax
    import jax.numpy as jnp
    from stcd_tpu.encoders import get_encoder

    enc, _ = get_encoder("resnet18", output_stride=16)
    feats, _ = enc.init_with_output(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4, 4]
    enc8, _ = get_encoder("resnet18", output_stride=8)
    feats8, _ = enc8.init_with_output(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[1] for f in feats8] == [64, 32, 16, 8, 8, 8]
    with pytest.raises(ValueError):
        get_encoder("mit_b0", output_stride=16)
    with pytest.raises(ValueError):
        get_encoder("resnet18", output_stride=4)


def test_preprocessing_fn_golden():
    """get_preprocessing_fn parity vs the reference's own preprocess_input
    (ref encoders/_preprocessing.py — numpy-only, loaded directly)."""
    import numpy as np
    from stcd_tpu.encoders import get_preprocessing_fn, get_preprocessing_params
    from _ref_stubs import load_ref_smp_file

    ref_mod = load_ref_smp_file("encoders._preprocessing")
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    for name, pretrained in (("resnet50", "imagenet"), ("dpn68", "imagenet"),
                             ("inceptionv4", "imagenet"),
                             ("xception", "imagenet"),
                             ("timm-efficientnet-b0", "advprop")):
        params = get_preprocessing_params(name, pretrained)
        want = ref_mod.preprocess_input(x.copy(), **params)
        got = get_preprocessing_fn(name, pretrained)(x)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6,
                                   err_msg=name)

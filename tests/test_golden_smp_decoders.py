"""Golden forward parity for the vendored smp decoder zoo vs our
decoders/ — reference decoder files are spec-loaded standalone
(tests/_ref_stubs.load_ref_smp_file); random encoder pyramids are fed to
both sides with converted weights."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/segmentation_models_pytorch"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
torch = pytest.importorskip("torch")


def _pyramid(channels, size, batch=2, seed=0):
    """Random NCHW feature pyramid halving from `size`."""
    rng = np.random.default_rng(seed)
    feats = []
    s = size
    for c in channels:
        feats.append(rng.standard_normal((batch, c, s, s)).astype(np.float32))
        s //= 2
    return feats


def _nhwc(feats):
    return [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]


def _populate_and_eval(ref, feats):
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(*[torch.from_numpy(f) + torch.randn_like(torch.from_numpy(f)) * 0.1
                  for f in feats])
    ref.eval()
    with torch.no_grad():
        return ref(*[torch.from_numpy(f) for f in feats]).numpy()


def _check(model, variables, feats, want, atol=3e-4):
    got = model.apply(variables, _nhwc(feats))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def _structure_match(template, params):
    t = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t == c, f"missing={sorted(t - c)[:6]} extra={sorted(c - t)[:6]}"


CHANNELS = (3, 64, 64, 128, 256, 512)


def test_fpn_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_fpn_decoder
    from stcd_tpu.decoders.fpn import FPNDecoder

    mod = load_ref_smp_file("decoders.fpn.decoder")
    torch.manual_seed(0)
    ref = mod.FPNDecoder(encoder_channels=CHANNELS).eval()
    feats = _pyramid(CHANNELS, 64)
    with torch.no_grad():
        want = ref(*[torch.from_numpy(f) for f in feats]).numpy()
    params, stats = convert_fpn_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = FPNDecoder()
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params)},
           feats, want)


def test_psp_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_psp_decoder
    from stcd_tpu.decoders.pspnet import PSPDecoder

    mod = load_ref_smp_file("decoders.pspnet.decoder")
    torch.manual_seed(1)
    ref = mod.PSPDecoder(encoder_channels=CHANNELS)
    # 12x12 final map divides evenly by pool sizes (1,2,3,6): torch
    # adaptive pooling == uniform-window mean
    feats = _pyramid(CHANNELS, 384)
    want = _populate_and_eval(ref, feats)
    params, stats = convert_psp_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = PSPDecoder()
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_linknet_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_linknet_decoder
    from stcd_tpu.decoders.linknet import LinknetDecoder

    mod = load_ref_smp_file("decoders.linknet.decoder")
    torch.manual_seed(2)
    ref = mod.LinknetDecoder(encoder_channels=CHANNELS, n_blocks=5)
    feats = _pyramid(CHANNELS, 64)
    want = _populate_and_eval(ref, feats)
    params, stats = convert_linknet_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = LinknetDecoder(n_blocks=5)
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_unetplusplus_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_unetplusplus_decoder
    from stcd_tpu.decoders.unetplusplus import UnetPlusPlusDecoder

    mod = load_ref_smp_file("decoders.unetplusplus.decoder")
    torch.manual_seed(3)
    ref = mod.UnetPlusPlusDecoder(
        encoder_channels=CHANNELS, decoder_channels=(256, 128, 64, 32, 16),
        n_blocks=5)
    feats = _pyramid(CHANNELS, 64)
    want = _populate_and_eval(ref, feats)
    params, stats = convert_unetplusplus_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = UnetPlusPlusDecoder(decoder_channels=(256, 128, 64, 32, 16))
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_manet_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_manet_decoder
    from stcd_tpu.decoders.manet import MAnetDecoder

    mod = load_ref_smp_file("decoders.manet.decoder")
    torch.manual_seed(4)
    ref = mod.MAnetDecoder(encoder_channels=CHANNELS,
                           decoder_channels=(256, 128, 64, 32, 16), n_blocks=5)
    feats = _pyramid(CHANNELS, 64)
    want = _populate_and_eval(ref, feats)
    params, stats = convert_manet_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = MAnetDecoder(decoder_channels=(256, 128, 64, 32, 16))
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_deeplabv3_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_deeplabv3_decoder
    from stcd_tpu.decoders.deeplabv3 import DeepLabV3Decoder

    mod = load_ref_smp_file("decoders.deeplabv3.decoder")
    torch.manual_seed(5)
    ref = mod.DeepLabV3Decoder(in_channels=512)
    feats = _pyramid(CHANNELS, 512)  # 512 -> last map 16x16 (dilation 12 pads)
    want = _populate_and_eval(ref, feats)
    params, stats = convert_deeplabv3_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = DeepLabV3Decoder()
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_deeplabv3plus_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_deeplabv3plus_decoder
    from stcd_tpu.decoders.deeplabv3 import DeepLabV3PlusDecoder

    mod = load_ref_smp_file("decoders.deeplabv3.decoder")
    torch.manual_seed(6)
    ref = mod.DeepLabV3PlusDecoder(encoder_channels=CHANNELS,
                                   output_stride=16)
    # output-stride-16 shapes: features[-4] at 1/4, features[-1] at 1/16
    rng = np.random.default_rng(6)
    sizes = (256, 128, 64, 32, 16, 16)
    feats = [rng.standard_normal((2, c, s, s)).astype(np.float32)
             for c, s in zip(CHANNELS, sizes)]
    want = _populate_and_eval(ref, feats)
    params, stats = convert_deeplabv3plus_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = DeepLabV3PlusDecoder(output_stride=16)
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_pan_decoder_parity():
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import convert_pan_decoder
    from stcd_tpu.decoders.pan import PANDecoder

    mod = load_ref_smp_file("decoders.pan.decoder")
    torch.manual_seed(7)
    ref = mod.PANDecoder(encoder_channels=CHANNELS, decoder_channels=32)
    feats = _pyramid(CHANNELS, 256)  # bottleneck 8x8: FPA downs stay valid
    want = _populate_and_eval(ref, feats)
    params, stats = convert_pan_decoder(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = PANDecoder(decoder_channels=32)
    template = model.init(jax.random.PRNGKey(0), _nhwc(feats))
    _structure_match(template, params)
    _check(model, {"params": jax.tree_util.tree_map(jnp.asarray, params),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
           feats, want)


def test_mit_b0_encoder_parity():
    """Vendored smp mix_transformer (mit_b0) vs our MixTransformerEncoder:
    all four transformer stages + the smp [x, dummy] contract."""
    from _ref_stubs import load_ref_smp_file
    from stcd_tpu.convert.torch_to_flax import _convert_mit_encoder
    from stcd_tpu.encoders.mix_transformer import MixTransformerEncoder

    mod = load_ref_smp_file("encoders.mix_transformer")
    torch.manual_seed(11)
    cfg = dict(mod.mix_transformer_encoders["mit_b0"]["params"])
    ref = mod.MixVisionTransformerEncoder(depth=5, **cfg).eval()

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        wants = [f.numpy() for f in ref(torch.from_numpy(x))]

    sd = {f"E.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params = {"mit": _convert_mit_encoder(sd, "E", (2, 2, 2, 2))}
    model = MixTransformerEncoder(variant="mit_b0")
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), jx)
    _structure_match(template, params)
    gots = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       jx)
    assert len(gots) == len(wants) == 6
    for i, (got, want) in enumerate(zip(gots, wants)):
        if want.shape[1] == 0:
            continue  # dummy level
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3,
                                   err_msg=f"mit stage {i}")

"""Golden forward parity vs the REFERENCE'S OWN ★ model file.

The STCD paper's models live in the modified
segmentation_models_pytorch/decoders/unet/model.py (SURVEY §2.4 ★):
UnetSeg :109-171, CDNet :174-238, SegCD :267-332, FFCTLCD :335-423.
Round-1 goldens exercised these only via builder-authored torch twins
(TVSegCD); these tests load the reference's real file through
_ref_stubs.load_ref_star_models — its UnetDecoder, SegmentationHead,
smp initialize() and forward logic are the reference's own code. Only
the encoder is the torchvision-faithful twin (torchvision is absent;
the twin's graph parity is pinned by test_convert.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _ref_stubs import load_ref_star_models  # noqa: E402
from test_convert import _randomize_bn_stats  # noqa: E402

from stcd_tpu.convert.torch_to_flax import convert_cdnet, convert_unetseg  # noqa: E402
from stcd_tpu.models import CDNet, FFCTLCD, SegCD, UnetSeg  # noqa: E402

DEC = (64, 32, 24, 16, 8)


def _build_ref(name, seed):
    ref = load_ref_star_models()
    torch.manual_seed(seed)
    model = getattr(ref, name)(encoder_name="resnet18", encoder_weights=None,
                               decoder_channels=DEC, classes=1).eval()
    _randomize_bn_stats(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, sd


def _pair(seed, n=1, hw=64):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, 3, hw, hw)).astype(np.float32),
            rng.normal(size=(n, 3, hw, hw)).astype(np.float32))


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def test_ref_unetseg_forward_parity():
    ref, sd = _build_ref("UnetSeg", 11)
    params, stats = convert_unetseg(sd, (2, 2, 2, 2))
    x, _ = _pair(1)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    ours = UnetSeg(encoder_name="resnet18", classes=1, decoder_channels=DEC)
    got = ours.apply({"params": params, "batch_stats": stats}, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), want.transpose(0, 2, 3, 1),
                               atol=5e-4)


def test_ref_segcd_forward_parity():
    ref, sd = _build_ref("SegCD", 22)
    params, stats = convert_unetseg(sd, (2, 2, 2, 2))
    a, b = _pair(2)
    with torch.no_grad():
        want = ref(torch.from_numpy(a), torch.from_numpy(b))
    ours = SegCD(encoder_name="resnet18", classes=1, decoder_channels=DEC)
    got = ours.apply({"params": params, "batch_stats": stats},
                     _nhwc(a), _nhwc(b))
    for i, (o, t) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(o),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=5e-4, err_msg=f"output {i}")


def test_ref_ffctlcd_forward_parity():
    ref, sd = _build_ref("FFCTLCD", 33)
    params, stats = convert_unetseg(sd, (2, 2, 2, 2))
    a, b = _pair(3)
    with torch.no_grad():
        want = ref(torch.from_numpy(a), torch.from_numpy(b))
    ours = FFCTLCD(encoder_name="resnet18", classes=1, decoder_channels=DEC)
    got = ours.apply({"params": params, "batch_stats": stats},
                     _nhwc(a), _nhwc(b))
    for i, (o, t) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(o),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=5e-4, err_msg=f"output {i}")


def test_ref_cdnet_forward_parity():
    """CDNet consumes two 5-level decoder-feature lists; its Deconv Block
    params are dead in the reference's forward (abs-diff only, :223-238).
    Channel widths are pinned to the hardcoded dim_out (ref :190)."""
    ref_mod = load_ref_star_models()
    torch.manual_seed(44)
    ref = ref_mod.CDNet(classes=1).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_cdnet(sd)

    rng = np.random.default_rng(4)
    chans, sizes = (256, 128, 64, 32, 16), (2, 4, 8, 16, 32)
    x1 = [rng.normal(size=(1, c, s, s)).astype(np.float32)
          for c, s in zip(chans, sizes)]
    x2 = [rng.normal(size=(1, c, s, s)).astype(np.float32)
          for c, s in zip(chans, sizes)]
    with torch.no_grad():
        want = ref([torch.from_numpy(t) for t in x1],
                   [torch.from_numpy(t) for t in x2]).numpy()

    ours = CDNet(classes=1)
    got = ours.apply({"params": params},
                     [_nhwc(t) for t in x1], [_nhwc(t) for t in x2])
    np.testing.assert_allclose(np.asarray(got), want.transpose(0, 2, 3, 1),
                               atol=5e-4)

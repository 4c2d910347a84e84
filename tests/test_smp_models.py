"""Shape tests for the smp model-assembly zoo (ref smp exports
__init__.py:7-18); create_model coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stcd_tpu.models.factory import create_model

H = W = 64


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 3), jnp.float32)


@pytest.mark.parametrize("arch,kwargs", [
    ("unetplusplus", {"decoder_channels": (32, 24, 16, 12, 8)}),
    ("manet", {"decoder_channels": (32, 24, 16, 12, 8)}),
    ("linknet", {}),
    ("fpn", {"decoder_pyramid_channels": 64, "decoder_segmentation_channels": 32}),
    ("pspnet", {"psp_out_channels": 64}),
    ("deeplabv3", {"decoder_channels": 64}),
    ("deeplabv3plus", {"decoder_channels": 64}),
])
def test_smp_arch_shapes(x, arch, kwargs):
    model = create_model(arch, encoder_name="resnet18", classes=3, **kwargs)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, H, W, 3), arch
    assert np.all(np.isfinite(np.asarray(out))), arch


def test_model_predict_method(x):
    """smp SegmentationModel.predict parity (ref base/model.py:41-56):
    model.predict(variables, x) == eval-mode forward, on both the smp
    assemblies (PredictMixin) and the star models."""
    import stcd_tpu

    model = create_model("unetplusplus", encoder_name="resnet18", classes=3,
                         decoder_channels=(32, 24, 16, 12, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(model.predict(variables, x)),
                                  np.asarray(model.apply(variables, x)))

    segcd = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                           decoder_channels=(32, 24, 16, 12, 8))
    vs = segcd.init(jax.random.PRNGKey(0), x, x)
    got = segcd.predict(vs, x, x)
    want = segcd.apply(vs, x, x)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pan_shapes():
    # PAN's FPA needs a bottleneck >= 8x8 (three maxpools), so 128 input
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 3), jnp.float32)
    model = create_model("pan", encoder_name="resnet18", classes=2)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 128, 128, 2)

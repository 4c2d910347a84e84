"""Golden value parity for the smp loss family vs the vendored reference
implementation (loaded via _ref_stubs.load_ref_smp_module — the losses
subpackage is torch-only). Ours take NHWC/channels-last; ref takes NCHW."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/segmentation_models_pytorch"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_losses():
    from _ref_stubs import load_ref_smp_module
    return load_ref_smp_module("losses")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    logits_bin = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
    target_bin = (rng.random((2, 1, 8, 8)) > 0.5).astype(np.float32)
    logits_mc = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    target_mc = rng.integers(0, 3, (2, 8, 8)).astype(np.int64)
    return logits_bin, target_bin, logits_mc, target_mc


def _ours_binary(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _close(ours, ref_val, atol=1e-5):
    np.testing.assert_allclose(float(ours), float(ref_val), atol=atol,
                               rtol=1e-4)


@pytest.mark.parametrize("name,kwargs", [
    ("DiceLoss", {}),
    ("JaccardLoss", {}),
    ("TverskyLoss", {"alpha": 0.3, "beta": 0.7}),
    ("FocalLoss", {}),
    ("MCCLoss", {}),
    ("LovaszLoss", {}),
])
def test_binary_losses_match(ref_losses, data, name, kwargs):
    import stcd_tpu.losses.smp as ours_mod
    logits, target, _, _ = data
    ref_kwargs = dict(kwargs)
    if name != "MCCLoss":
        ref_kwargs["mode"] = "binary"
    ref = getattr(ref_losses, name)(**ref_kwargs)
    want = ref(torch.from_numpy(logits), torch.from_numpy(target))
    ours_kwargs = dict(kwargs)
    if name != "MCCLoss":
        ours_kwargs["mode"] = "binary"
    got = getattr(ours_mod, name)(**ours_kwargs)(
        _ours_binary(logits), _ours_binary(target))
    _close(got, want)


@pytest.mark.parametrize("name,kwargs", [
    ("DiceLoss", {}),
    ("JaccardLoss", {}),
    ("TverskyLoss", {"alpha": 0.3, "beta": 0.7}),
    ("FocalLoss", {}),
    ("LovaszLoss", {}),
])
def test_multiclass_losses_match(ref_losses, data, name, kwargs):
    import stcd_tpu.losses.smp as ours_mod
    _, _, logits, target = data
    ref = getattr(ref_losses, name)(mode="multiclass", **kwargs)
    want = ref(torch.from_numpy(logits), torch.from_numpy(target))
    got = getattr(ours_mod, name)(mode="multiclass", **kwargs)(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target))
    _close(got, want)


def test_soft_bce_matches(ref_losses, data):
    from stcd_tpu.losses.smp import SoftBCEWithLogitsLoss
    logits, target, _, _ = data
    ref = ref_losses.SoftBCEWithLogitsLoss(smooth_factor=0.1)
    want = ref(torch.from_numpy(logits), torch.from_numpy(target))
    got = SoftBCEWithLogitsLoss(smooth_factor=0.1)(
        _ours_binary(logits), _ours_binary(target))
    _close(got, want)


def test_soft_ce_matches(ref_losses, data):
    from stcd_tpu.losses.smp import SoftCrossEntropyLoss
    _, _, logits, target = data
    ref = ref_losses.SoftCrossEntropyLoss(smooth_factor=0.1)
    want = ref(torch.from_numpy(logits), torch.from_numpy(target))
    got = SoftCrossEntropyLoss(smooth_factor=0.1)(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target))
    _close(got, want)

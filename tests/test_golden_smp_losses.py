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


def test_dice_binary_ignore_index(ref_losses, data):
    """ref dice.py binary branch masks y_pred AND y_true at ignored pixels."""
    from stcd_tpu.losses.smp import DiceLoss
    logits, target, _, _ = data
    t = target.copy()
    t[:, :, :3, :] = 255.0
    ref = ref_losses.DiceLoss(mode="binary", ignore_index=255)
    want = ref(torch.from_numpy(logits), torch.from_numpy(t))
    got = DiceLoss(mode="binary", ignore_index=255)(
        _ours_binary(logits), _ours_binary(t))
    _close(got, want)


def test_tversky_gamma_aggregation(ref_losses, data):
    """ref tversky.py: aggregate_loss = loss.mean() ** gamma (gamma on the
    mean, not per class)."""
    from stcd_tpu.losses.smp import TverskyLoss
    _, _, logits, target = data
    ref = ref_losses.TverskyLoss(mode="multiclass", alpha=0.3, beta=0.7,
                                 gamma=2.0)
    want = ref(torch.from_numpy(logits), torch.from_numpy(target))
    got = TverskyLoss(mode="multiclass", alpha=0.3, beta=0.7, gamma=2.0)(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target))
    _close(got, want)


def test_focal_reduced_threshold(ref_losses, data):
    """ref _functional.py:78: focal_term = ((1-pt)/reduced_threshold)^gamma."""
    from stcd_tpu.losses.smp import FocalLoss
    logits, target, _, _ = data
    ref = ref_losses.FocalLoss(mode="binary", reduced_threshold=0.25)
    want = ref(torch.from_numpy(logits), torch.from_numpy(target))
    got = FocalLoss(mode="binary", reduced_threshold=0.25)(
        _ours_binary(logits), _ours_binary(target))
    _close(got, want)


def test_soft_ce_ignore_mean_semantics(ref_losses, data):
    """ref soft_ce.py zeroes ignored positions but means over ALL elements."""
    from stcd_tpu.losses.smp import SoftCrossEntropyLoss
    _, _, logits, target = data
    t = target.copy()
    t[:, :4, :] = 255
    ref = ref_losses.SoftCrossEntropyLoss(smooth_factor=0.1, ignore_index=255)
    want = ref(torch.from_numpy(logits), torch.from_numpy(t))
    got = SoftCrossEntropyLoss(smooth_factor=0.1, ignore_index=255)(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(t))
    _close(got, want)


def test_lovasz_absent_class(ref_losses, data):
    """ref lovasz.py classes='present': classes absent from the batch are
    skipped and the mean runs over present classes only."""
    from stcd_tpu.losses.smp import LovaszLoss
    _, _, logits, target = data
    t = target.copy()
    t[t == 2] = 0  # class 2 absent
    ref = ref_losses.LovaszLoss(mode="multiclass")
    want = ref(torch.from_numpy(logits), torch.from_numpy(t))
    got = LovaszLoss(mode="multiclass")(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(t))
    _close(got, want)

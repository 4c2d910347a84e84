"""Golden parity for metrics/functional vs the vendored smp
implementation (ref segmentation_models_pytorch/metrics/functional.py):
get_stats across all three modes (+ threshold and ignore_index) and every
derived metric under micro/macro/weighted reductions."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/segmentation_models_pytorch"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_m():
    from _ref_stubs import load_ref_smp_module
    return load_ref_smp_module("metrics.functional")


def _stats_pair(ref_m, mode, **kw):
    import stcd_tpu.metrics.functional as ours
    rng = np.random.default_rng(3)
    if mode == "multiclass":
        out = rng.integers(0, 4, (4, 8, 8))
        tgt = rng.integers(0, 4, (4, 8, 8))
        if kw.get("ignore_index") is not None:
            tgt[0, :2] = kw["ignore_index"]
        r = ref_m.get_stats(torch.from_numpy(out), torch.from_numpy(tgt),
                            mode=mode, num_classes=4, **kw)
        o = ours.get_stats(jnp.asarray(out), jnp.asarray(tgt), mode=mode,
                           num_classes=4, **kw)
    else:
        out = rng.random((4, 2, 8, 8)).astype(np.float32)
        tgt = (rng.random((4, 2, 8, 8)) > 0.5).astype(np.int64)
        r = ref_m.get_stats(torch.from_numpy(out), torch.from_numpy(tgt),
                            mode=mode, threshold=0.5, **kw)
        # ours is channels-LAST for binary/multilabel
        o = ours.get_stats(jnp.asarray(out.transpose(0, 2, 3, 1)),
                           jnp.asarray(tgt.transpose(0, 2, 3, 1)), mode=mode,
                           threshold=0.5, **kw)
    return r, o


@pytest.mark.parametrize("mode,kw", [
    ("binary", {}),
    ("multilabel", {}),
    ("multiclass", {}),
    ("multiclass", {"ignore_index": -1}),
])
def test_get_stats_matches(ref_m, mode, kw):
    r, o = _stats_pair(ref_m, mode, **kw)
    for rv, ov in zip(r, o):
        np.testing.assert_array_equal(rv.numpy(), np.asarray(ov))


METRICS = ["f1_score", "iou_score", "accuracy", "precision", "recall",
           "sensitivity", "specificity", "balanced_accuracy",
           "positive_predictive_value", "negative_predictive_value",
           "false_negative_rate", "false_positive_rate",
           "false_discovery_rate", "false_omission_rate",
           "positive_likelihood_ratio", "negative_likelihood_ratio"]


@pytest.mark.parametrize("reduction", ["micro", "macro", "weighted",
                                       "micro-imagewise", "macro-imagewise"])
def test_derived_metrics_match(ref_m, reduction):
    import stcd_tpu.metrics.functional as ours
    r, o = _stats_pair(ref_m, "multiclass")
    kw = {"class_weights": [0.1, 0.2, 0.3, 0.4]} if "weighted" in reduction else {}
    for name in METRICS:
        want = getattr(ref_m, name)(*r, reduction=reduction, **kw)
        got = getattr(ours, name)(*o, reduction=reduction, **kw)
        np.testing.assert_allclose(np.asarray(got, np.float64),
                                   want.numpy(), atol=1e-5, rtol=1e-5,
                                   err_msg=f"{name} [{reduction}]")


def test_fbeta_matches(ref_m):
    import stcd_tpu.metrics.functional as ours
    r, o = _stats_pair(ref_m, "binary")
    want = ref_m.fbeta_score(*r, beta=2.0, reduction="micro")
    got = ours.fbeta_score(*o, beta=2.0, reduction="micro")
    np.testing.assert_allclose(float(got), float(want), atol=1e-6)


def test_weighted_imagewise_and_weighted_macro_match(ref_m):
    """The paths the original golden sweep skipped (round-2 review):
    weighted-imagewise (was num_classes x too large), macro WITH explicit
    class_weights (were silently discarded)."""
    import stcd_tpu.metrics.functional as ours
    r, o = _stats_pair(ref_m, "multiclass")
    w = [0.1, 0.2, 0.3, 0.4]
    for name in ("iou_score", "f1_score", "accuracy"):
        for reduction in ("weighted-imagewise", "macro", "macro-imagewise"):
            want = getattr(ref_m, name)(*r, reduction=reduction, class_weights=w)
            got = getattr(ours, name)(*o, reduction=reduction, class_weights=w)
            np.testing.assert_allclose(np.asarray(got, np.float64),
                                       want.numpy(), atol=1e-5, rtol=1e-5,
                                       err_msg=f"{name} [{reduction}] w={w}")


def test_get_stats_thresholds_target_too(ref_m):
    """ref :155-157 binarizes BOTH sides — 0/255 integer masks rely on it."""
    import stcd_tpu.metrics.functional as ours
    rng = np.random.default_rng(5)
    out = rng.random((2, 1, 8, 8)).astype(np.float32)
    tgt = (rng.random((2, 1, 8, 8)) > 0.5).astype(np.int64) * 255
    r = ref_m.get_stats(torch.from_numpy(out), torch.from_numpy(tgt),
                        mode="binary", threshold=0.5)
    o = ours.get_stats(jnp.asarray(out.transpose(0, 2, 3, 1)),
                       jnp.asarray(tgt.transpose(0, 2, 3, 1)),
                       mode="binary", threshold=0.5)
    for rv, ov in zip(r, o):
        np.testing.assert_array_equal(rv.numpy(), np.asarray(ov))


def test_get_stats_validation_matches_reference(ref_m):
    """Every ValueError the reference raises must raise here too
    (silently computing garbage was a round-2 review finding)."""
    import stcd_tpu.metrics.functional as ours
    rng = np.random.default_rng(6)
    out_f = rng.random((2, 1, 4, 4)).astype(np.float32)
    tgt_i = (rng.random((2, 1, 4, 4)) > 0.5).astype(np.int64)
    cases = [
        # (kwargs-for-both, note)
        (dict(mode="binary"), "float output without threshold"),
        (dict(mode="Binary", threshold=0.5), "unknown mode string"),
        (dict(mode="binary", threshold=0.5, ignore_index=255), "ignore_index in binary"),
        (dict(mode="multiclass", num_classes=4, threshold=0.5), "threshold in multiclass"),
    ]
    for kw, note in cases:
        with pytest.raises(ValueError):
            ref_m.get_stats(torch.from_numpy(out_f), torch.from_numpy(tgt_i), **kw)
        with pytest.raises(ValueError):
            ours.get_stats(jnp.asarray(out_f), jnp.asarray(tgt_i), **kw)
    # float target
    with pytest.raises(ValueError):
        ours.get_stats(jnp.asarray(tgt_i), jnp.asarray(out_f), mode="binary",
                       threshold=0.5)
    # shape mismatch
    with pytest.raises(ValueError):
        ours.get_stats(jnp.asarray(out_f), jnp.asarray(tgt_i[:, :, :2]),
                       mode="binary", threshold=0.5)
    # weighted reduction without class_weights
    r = ours.get_stats(jnp.asarray((out_f > 0.5).astype(np.int64)),
                       jnp.asarray(tgt_i), mode="binary")
    with pytest.raises(ValueError):
        ours.iou_score(*r, reduction="weighted")


def test_micro_nan_propagates_like_reference(ref_m):
    """ref :258-261 applies NO zero-division replacement on micro —
    an all-negative batch must return NaN, not 0 (review finding)."""
    import stcd_tpu.metrics.functional as ours
    z = np.zeros((2, 1), np.int64)
    tn = np.full((2, 1), 64, np.int64)
    want = ref_m.iou_score(torch.from_numpy(z), torch.from_numpy(z),
                           torch.from_numpy(z), torch.from_numpy(tn),
                           reduction="micro")
    got = ours.iou_score(jnp.asarray(z), jnp.asarray(z), jnp.asarray(z),
                         jnp.asarray(tn), reduction="micro")
    assert np.isnan(float(want)) and np.isnan(float(got))

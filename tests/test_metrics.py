"""Metric parity tests vs the reference's bincount confusion matrix
(train_sup.py:245-266) computed inline with numpy."""

import numpy as np
import jax.numpy as jnp

from stcd_tpu.metrics import (
    SegmentationMetric,
    confusion_matrix,
    get_stats,
    f1_score,
    iou_score,
    accuracy,
)


def _ref_cm(pred, label, num_classes=2):
    flat = num_classes * label.flatten() + pred.flatten()
    return np.bincount(flat, minlength=num_classes ** 2).reshape(num_classes, num_classes)


def test_confusion_matrix_matches_bincount(np_rng):
    pred = np_rng.integers(0, 2, size=(4, 32, 32))
    label = np_rng.integers(0, 2, size=(4, 32, 32))
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 2))
    np.testing.assert_array_equal(got, _ref_cm(pred, label))


def test_segmentation_metric_derived(np_rng):
    m = SegmentationMetric(2)
    preds, labels = [], []
    for _ in range(3):
        p = np_rng.integers(0, 2, size=(2, 16, 16))
        l = np_rng.integers(0, 2, size=(2, 16, 16))
        m.addBatch(jnp.asarray(p), jnp.asarray(l))
        preds.append(p)
        labels.append(l)
    cm = sum(_ref_cm(p, l) for p, l in zip(preds, labels)).astype(np.float64)

    np.testing.assert_allclose(m.OverallAccuracy(), np.diag(cm).sum() / cm.sum())
    np.testing.assert_allclose(m.Precision(), np.diag(cm) / cm.sum(0))
    np.testing.assert_allclose(m.Recall(), np.diag(cm) / cm.sum(1))
    p = np.diag(cm) / cm.sum(0)
    r = np.diag(cm) / cm.sum(1)
    np.testing.assert_allclose(m.F1score(), 2 * p * r / (p + r))
    inter = np.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    np.testing.assert_allclose(m.IntersectionOverUnion(), inter / union)
    np.testing.assert_allclose(m.meanIntersectionOverUnion(), np.mean(inter / union))


def test_get_stats_multiclass(np_rng):
    out = np_rng.integers(0, 3, size=(4, 16, 16))
    tgt = np_rng.integers(0, 3, size=(4, 16, 16))
    tp, fp, fn, tn = get_stats(jnp.asarray(out), jnp.asarray(tgt),
                               mode="multiclass", num_classes=3)
    tp, fp, fn, tn = map(np.asarray, (tp, fp, fn, tn))
    for n in range(4):
        for c in range(3):
            p = out[n] == c
            t = tgt[n] == c
            assert tp[n, c] == np.sum(p & t)
            assert fp[n, c] == np.sum(p & ~t)
            assert fn[n, c] == np.sum(~p & t)
            assert tn[n, c] == np.sum(~p & ~t)
    assert np.all(tp + fp + fn + tn == 16 * 16)


def test_get_stats_binary_threshold(np_rng):
    out = np_rng.uniform(size=(4, 16, 16, 1)).astype(np.float32)
    tgt = (np_rng.uniform(size=(4, 16, 16, 1)) > 0.5).astype(np.int32)
    tp, fp, fn, tn = get_stats(jnp.asarray(out), jnp.asarray(tgt),
                               mode="binary", threshold=0.5)
    binp = (out >= 0.5).astype(np.int32)
    for n in range(4):
        assert int(tp[n, 0]) == int(np.sum((binp[n] == 1) & (tgt[n] == 1)))


def test_micro_macro_reductions(np_rng):
    out = np_rng.integers(0, 2, size=(4, 16, 16))
    tgt = np_rng.integers(0, 2, size=(4, 16, 16))
    stats = get_stats(jnp.asarray(out), jnp.asarray(tgt), mode="multiclass",
                      num_classes=2)
    micro_f1 = float(f1_score(*stats, reduction="micro"))
    acc = float(accuracy(*stats, reduction="micro"))
    assert 0 <= micro_f1 <= 1 and 0 <= acc <= 1
    # micro f1 over a complete multiclass partition == overall accuracy
    np.testing.assert_allclose(micro_f1, np.mean(out == tgt), rtol=1e-6)
    macro_iou = float(iou_score(*stats, reduction="macro"))
    assert 0 <= macro_iou <= 1

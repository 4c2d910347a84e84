"""Functional metric suite.

Parity target: segmentation_models_pytorch/metrics/functional.py:61-780 —
``get_stats`` returning per-image, per-class (tp, fp, fn, tn) plus the
derived metrics with micro/macro/weighted(-imagewise) reductions.

All functions are pure jnp and jittable; stats tensors are (N, C) int32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_stats(output: jax.Array, target: jax.Array, mode: str,
              ignore_index: Optional[int] = None,
              threshold: Optional[float] = None,
              num_classes: Optional[int] = None
              ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """ref metrics/functional.py:61-163.

    binary/multilabel: output/target (N, C, ...) or (N, ..., C) —
    channel-last here; ``threshold`` binarizes the output.
    multiclass: output/target (N, ...) integer class maps, requires
    ``num_classes``; ``threshold`` must be None.
    """
    if mode == "multiclass":
        if threshold is not None:
            raise ValueError("threshold parameter is not supported for 'multiclass' mode")
        if num_classes is None:
            raise ValueError("num_classes attr should be specified for 'multiclass' mode")
        return _get_stats_multiclass(output, target, num_classes, ignore_index)
    if threshold is not None:
        output = (output >= threshold)
    return _get_stats_multilabel(output, target)


def _get_stats_multiclass(output, target, num_classes, ignore_index):
    n = output.shape[0]
    out = output.reshape(n, -1).astype(jnp.int32)
    tgt = target.reshape(n, -1).astype(jnp.int32)
    if ignore_index is not None:
        valid = (tgt != ignore_index)
        tgt = jnp.where(valid, tgt, num_classes)  # park ignored in an extra bin
        out = jnp.where(valid, out, num_classes + 1)  # never matches tgt bin
        n_valid = valid.sum(axis=1)
    else:
        n_valid = jnp.full((n,), out.shape[1], jnp.int32)
    oh_t = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
    oh_p = jax.nn.one_hot(out, num_classes, dtype=jnp.float32)
    tp = jnp.einsum("npc,npc->nc", oh_t, oh_p)
    fp = oh_p.sum(axis=1) - tp
    fn = oh_t.sum(axis=1) - tp
    tn = n_valid[:, None].astype(jnp.float32) - tp - fp - fn
    return (tp.astype(jnp.int32), fp.astype(jnp.int32),
            fn.astype(jnp.int32), tn.astype(jnp.int32))


def _get_stats_multilabel(output, target):
    # channel-last: (N, ..., C) -> (N, C, S)
    n, c = output.shape[0], output.shape[-1]
    out = output.reshape(n, -1, c).transpose(0, 2, 1).astype(jnp.float32)
    tgt = target.reshape(n, -1, c).transpose(0, 2, 1).astype(jnp.float32)
    tp = (out * tgt).sum(2)
    fp = out.sum(2) - tp
    fn = tgt.sum(2) - tp
    tn = out.shape[2] - (tp + fp + fn)
    return (tp.astype(jnp.int32), fp.astype(jnp.int32),
            fn.astype(jnp.int32), tn.astype(jnp.int32))


def _handle_zero_division(x, zero_division):
    nans = jnp.isnan(x)
    value = 0.0 if zero_division == "warn" else float(zero_division)
    return jnp.where(nans, value, x)


def _compute_metric(metric_fn, tp, fp, fn, tn, reduction: Optional[str] = None,
                    class_weights=None, zero_division="warn", **kwargs):
    """ref metrics/functional.py:237-341 reduction semantics."""
    tp, fp, fn, tn = (x.astype(jnp.float32) for x in (tp, fp, fn, tn))
    if class_weights is None and reduction is not None and "weighted" in reduction:
        class_weights = tp.sum(0) + fn.sum(0)
    class_weights = (jnp.asarray(class_weights, jnp.float32)
                     if class_weights is not None else jnp.array(1.0))
    class_weights = class_weights / jnp.sum(class_weights) if class_weights.ndim else class_weights

    if reduction == "micro":
        score = metric_fn(tp.sum(), fp.sum(), fn.sum(), tn.sum(), **kwargs)
        return _handle_zero_division(score, zero_division)
    if reduction == "macro" or reduction == "weighted":
        score = metric_fn(tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0), **kwargs)
        score = _handle_zero_division(score, zero_division)
        return jnp.sum(score * class_weights) if reduction == "weighted" else jnp.mean(score)
    if reduction == "micro-imagewise":
        score = metric_fn(tp.sum(1), fp.sum(1), fn.sum(1), tn.sum(1), **kwargs)
        return jnp.mean(_handle_zero_division(score, zero_division))
    if reduction in ("macro-imagewise", "weighted-imagewise"):
        score = metric_fn(tp, fp, fn, tn, **kwargs)
        score = _handle_zero_division(score, zero_division)
        per_img = (score * class_weights).sum(1) if reduction == "weighted-imagewise" \
            else score.mean(1)
        return jnp.mean(per_img)
    if reduction is None or reduction == "none":
        return _handle_zero_division(metric_fn(tp, fp, fn, tn, **kwargs), zero_division)
    raise ValueError(f"unknown reduction {reduction}")


def _fbeta(tp, fp, fn, tn, beta=1.0):
    b2 = beta ** 2
    return ((1 + b2) * tp) / ((1 + b2) * tp + b2 * fn + fp)


def _iou(tp, fp, fn, tn):
    return tp / (tp + fp + fn)


def _accuracy(tp, fp, fn, tn):
    return (tp + tn) / (tp + fp + fn + tn)


def _sensitivity(tp, fp, fn, tn):
    return tp / (tp + fn)


def _specificity(tp, fp, fn, tn):
    return tn / (tn + fp)


def _balanced_accuracy(tp, fp, fn, tn):
    return (_sensitivity(tp, fp, fn, tn) + _specificity(tp, fp, fn, tn)) / 2


def _ppv(tp, fp, fn, tn):
    return tp / (tp + fp)


def _npv(tp, fp, fn, tn):
    return tn / (tn + fn)


def _fnr(tp, fp, fn, tn):
    return fn / (fn + tp)


def _fpr(tp, fp, fn, tn):
    return fp / (fp + tn)


def _make(metric_fn):
    def metric(tp, fp, fn, tn, reduction=None, class_weights=None,
               zero_division="warn", **kwargs):
        return _compute_metric(metric_fn, tp, fp, fn, tn, reduction=reduction,
                               class_weights=class_weights,
                               zero_division=zero_division, **kwargs)
    return metric


fbeta_score = _make(_fbeta)
f1_score = _make(lambda tp, fp, fn, tn: _fbeta(tp, fp, fn, tn, beta=1.0))
iou_score = _make(_iou)
accuracy = _make(_accuracy)
sensitivity = _make(_sensitivity)
recall = sensitivity
specificity = _make(_specificity)
balanced_accuracy = _make(_balanced_accuracy)
positive_predictive_value = _make(_ppv)
precision = positive_predictive_value
negative_predictive_value = _make(_npv)
false_negative_rate = _make(_fnr)
false_positive_rate = _make(_fpr)
false_discovery_rate = _make(lambda tp, fp, fn, tn: 1.0 - _ppv(tp, fp, fn, tn))
false_omission_rate = _make(lambda tp, fp, fn, tn: 1.0 - _npv(tp, fp, fn, tn))
positive_likelihood_ratio = _make(lambda tp, fp, fn, tn:
                                  _sensitivity(tp, fp, fn, tn) / _fpr(tp, fp, fn, tn))
negative_likelihood_ratio = _make(lambda tp, fp, fn, tn:
                                  _fnr(tp, fp, fn, tn) / _specificity(tp, fp, fn, tn))

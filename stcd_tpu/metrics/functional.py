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
    # the reference's full validation surface (ref :114-148) — shapes and
    # dtypes are static under jit, so these are trace-time checks
    output, target = jnp.asarray(output), jnp.asarray(target)
    if jnp.issubdtype(target.dtype, jnp.floating):
        raise ValueError(f"Target should be one of the integer types, got {target.dtype}.")
    if jnp.issubdtype(output.dtype, jnp.floating) and threshold is None:
        raise ValueError(
            f"Output should be one of the integer types if ``threshold`` is not None, "
            f"got {output.dtype}.")
    if jnp.issubdtype(output.dtype, jnp.floating) and mode == "multiclass":
        raise ValueError(
            f"For ``multiclass`` mode ``output`` should be one of the integer types, "
            f"got {output.dtype}.")
    if mode not in {"binary", "multiclass", "multilabel"}:
        raise ValueError(
            f"``mode`` should be in ['binary', 'multiclass', 'multilabel'], got mode={mode}.")
    if mode == "multiclass" and threshold is not None:
        raise ValueError("``threshold`` parameter does not supported for this 'multiclass' mode")
    if output.shape != target.shape:
        raise ValueError(
            "Dimensions should match, but ``output`` shape is not equal to ``target`` "
            f"shape, {output.shape} != {target.shape}")
    if mode != "multiclass" and ignore_index is not None:
        raise ValueError(f"``ignore_index`` parameter is not supproted for '{mode}' mode")
    if mode == "multiclass":
        if num_classes is None:
            raise ValueError("``num_classes`` attribute should be not ``None`` for 'multiclass' mode.")
        if ignore_index is not None and 0 <= ignore_index <= num_classes - 1:
            raise ValueError(
                f"``ignore_index`` should be outside the class values range, but got class "
                f"values in range 0..{num_classes - 1} and ``ignore_index={ignore_index}``")
        return _get_stats_multiclass(output, target, num_classes, ignore_index)
    if threshold is not None:
        # ref :155-157 binarizes BOTH sides (0/255 masks rely on it)
        output = (output >= threshold)
        target = (target >= threshold)
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
    if zero_division == "warn" and not isinstance(x, jax.core.Tracer):
        # data-dependent warning is only observable outside jit tracing
        if bool(jnp.any(nans)):
            import warnings
            warnings.warn("Zero division in metric calculation!")
    value = 0.0 if zero_division == "warn" else float(zero_division)
    return jnp.where(nans, value, x)


def _compute_metric(metric_fn, tp, fp, fn, tn, reduction: Optional[str] = None,
                    class_weights=None, zero_division="warn", **kwargs):
    """ref metrics/functional.py:237-341 reduction semantics, exactly:
    explicit class_weights scale macro too; 'weighted*' without weights
    raises; micro gets NO zero-division replacement (NaN propagates)."""
    tp, fp, fn, tn = (x.astype(jnp.float32) for x in (tp, fp, fn, tn))
    if class_weights is None and reduction is not None and "weighted" in reduction:
        raise ValueError(f"Class weights should be provided for `{reduction}` reduction")
    class_weights = (jnp.asarray(class_weights, jnp.float32)
                     if class_weights is not None else jnp.array(1.0))
    class_weights = class_weights / jnp.sum(class_weights)

    if reduction == "micro":
        # ref :258-261: no _handle_zero_division on this branch
        return metric_fn(tp.sum(), fp.sum(), fn.sum(), tn.sum(), **kwargs)
    if reduction == "macro" or reduction == "weighted":
        score = metric_fn(tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0), **kwargs)
        score = _handle_zero_division(score, zero_division)
        score = score * class_weights
        return jnp.sum(score) if reduction == "weighted" else jnp.mean(score)
    if reduction == "micro-imagewise":
        score = metric_fn(tp.sum(1), fp.sum(1), fn.sum(1), tn.sum(1), **kwargs)
        return jnp.mean(_handle_zero_division(score, zero_division))
    if reduction in ("macro-imagewise", "weighted-imagewise"):
        score = metric_fn(tp, fp, fn, tn, **kwargs)
        score = _handle_zero_division(score, zero_division)
        # ref :290-293: both imagewise variants are (score.mean(0) * w).mean()
        return jnp.mean(score.mean(0) * class_weights)
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

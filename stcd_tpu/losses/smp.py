"""The segmentation_models_pytorch loss family (pure JAX).

Parity targets (ref segmentation_models_pytorch/losses/):
- DiceLoss               <- dice.py (soft dice over (batch, spatial) per class)
- JaccardLoss            <- jaccard.py
- FocalLoss              <- focal.py + _functional.py:focal_loss_with_logits
- TverskyLoss            <- tversky.py
- SoftBCEWithLogitsLoss  <- soft_bce.py
- SoftCrossEntropyLoss   <- soft_ce.py
- MCCLoss                <- mcc.py
- LovaszLoss             <- lovasz.py

Modes follow constants.py: 'binary' (N,1,H,W or N,H,W logits + 0/1 target),
'multiclass' (N,H,W,C logits + int target), 'multilabel' (N,H,W,C logits +
per-channel 0/1 target). Channel-last layout.

These are callables (loss objects), mirroring the reference's class-based
API but stateless/jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"
MULTILABEL_MODE = "multilabel"

_EPS = 1e-7


def _flatten_by_mode(y_pred: jax.Array, y_true: jax.Array, mode: str,
                     from_logits: bool, ignore_index: Optional[int]
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return (probs (C, B*S), targets (C, B*S), valid mask) per class.

    Mirrors dice.py's (N, C, HW) reshape with dims=(0, 2) reduction: we
    reduce over batch+space jointly per class.
    """
    if mode == BINARY_MODE:
        if y_pred.ndim == y_true.ndim + 1:
            y_pred = y_pred[..., 0]
        p = jax.nn.sigmoid(y_pred) if from_logits else y_pred
        p = p.reshape(1, -1).astype(jnp.float32)
        t = y_true.reshape(1, -1).astype(jnp.float32)
        valid = jnp.ones_like(t) if ignore_index is None else (
            y_true.reshape(1, -1) != ignore_index).astype(jnp.float32)
        t = t * valid
        return p * valid, t, valid
    if mode == MULTICLASS_MODE:
        c = y_pred.shape[-1]
        p = jax.nn.softmax(y_pred, axis=-1) if from_logits else y_pred
        p = p.reshape(-1, c).T.astype(jnp.float32)  # (C, BS)
        tt = y_true.reshape(-1).astype(jnp.int32)
        valid_row = jnp.ones_like(tt, jnp.float32) if ignore_index is None else (
            tt != ignore_index).astype(jnp.float32)
        oh = jax.nn.one_hot(jnp.where(valid_row > 0, tt, 0), c, dtype=jnp.float32).T
        oh = oh * valid_row[None, :]
        return p * valid_row[None, :], oh, jnp.broadcast_to(valid_row[None, :], oh.shape)
    if mode == MULTILABEL_MODE:
        c = y_pred.shape[-1]
        p = jax.nn.sigmoid(y_pred) if from_logits else y_pred
        p = p.reshape(-1, c).T.astype(jnp.float32)
        t = y_true.reshape(-1, c).T.astype(jnp.float32)
        valid = jnp.ones_like(t)
        if ignore_index is not None:
            valid = (y_true.reshape(-1, c).T != ignore_index).astype(jnp.float32)
            t = t * valid
        return p * valid, t, valid
    raise ValueError(f"unknown mode {mode}")


def _aggregate_classwise(loss_per_class: jax.Array, t_sums: jax.Array,
                         classes: Optional[Sequence[int]]) -> jax.Array:
    """ref dice.py: zero-out classes absent from y_true, select classes,
    then mean."""
    mask = (t_sums > 0).astype(jnp.float32)
    loss_per_class = loss_per_class * mask
    if classes is not None:
        loss_per_class = loss_per_class[jnp.asarray(classes)]
    return jnp.mean(loss_per_class)


@dataclasses.dataclass
class DiceLoss:
    """ref losses/dice.py (soft dice, per-class, mean over present classes)."""

    mode: str = BINARY_MODE
    classes: Optional[Sequence[int]] = None
    log_loss: bool = False
    from_logits: bool = True
    smooth: float = 0.0
    eps: float = _EPS
    ignore_index: Optional[int] = None

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        p, t, _ = _flatten_by_mode(y_pred, y_true, self.mode, self.from_logits,
                                   self.ignore_index)
        inter = jnp.sum(p * t, axis=1)
        card = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
        score = (2 * inter + self.smooth) / jnp.maximum(card + self.smooth, self.eps)
        loss = -jnp.log(jnp.maximum(score, self.eps)) if self.log_loss else 1.0 - score
        return _aggregate_classwise(loss, jnp.sum(t, axis=1), self.classes)


@dataclasses.dataclass
class JaccardLoss:
    """ref losses/jaccard.py (soft IoU)."""

    mode: str = BINARY_MODE
    classes: Optional[Sequence[int]] = None
    log_loss: bool = False
    from_logits: bool = True
    smooth: float = 0.0
    eps: float = _EPS

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        p, t, _ = _flatten_by_mode(y_pred, y_true, self.mode, self.from_logits, None)
        inter = jnp.sum(p * t, axis=1)
        union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) - inter
        score = (inter + self.smooth) / jnp.maximum(union + self.smooth, self.eps)
        loss = -jnp.log(jnp.maximum(score, self.eps)) if self.log_loss else 1.0 - score
        return _aggregate_classwise(loss, jnp.sum(t, axis=1), self.classes)


@dataclasses.dataclass
class TverskyLoss:
    """ref losses/tversky.py: dice with FP/FN weights alpha/beta, gamma power."""

    mode: str = BINARY_MODE
    classes: Optional[Sequence[int]] = None
    log_loss: bool = False
    from_logits: bool = True
    smooth: float = 0.0
    eps: float = _EPS
    alpha: float = 0.5
    beta: float = 0.5
    gamma: float = 1.0

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        p, t, _ = _flatten_by_mode(y_pred, y_true, self.mode, self.from_logits, None)
        tp = jnp.sum(p * t, axis=1)
        fp = jnp.sum(p * (1 - t), axis=1)
        fn = jnp.sum((1 - p) * t, axis=1)
        score = (tp + self.smooth) / jnp.maximum(
            tp + self.alpha * fp + self.beta * fn + self.smooth, self.eps)
        loss = -jnp.log(jnp.maximum(score, self.eps)) if self.log_loss else 1.0 - score
        # ref tversky.py aggregate_loss: gamma applies to the MEAN, not per class
        return _aggregate_classwise(loss, jnp.sum(t, axis=1),
                                    self.classes) ** self.gamma


def focal_loss_with_logits(output: jax.Array, target: jax.Array,
                           gamma: float = 2.0, alpha: Optional[float] = 0.25,
                           reduction: str = "mean", normalized: bool = False,
                           reduced_threshold: Optional[float] = None,
                           ignore_mask: Optional[jax.Array] = None) -> jax.Array:
    """ref losses/_functional.py:10-72."""
    target = target.astype(output.dtype)
    p = jax.nn.sigmoid(output)
    logpt = -(jnp.maximum(jax.nn.log_sigmoid(output), -100.0) * target
              + jnp.maximum(jax.nn.log_sigmoid(-output), -100.0) * (1 - target))
    pt = jnp.exp(-logpt)
    if reduced_threshold is None:
        focal_term = (1.0 - pt) ** gamma
    else:
        focal_term = ((1.0 - pt) / reduced_threshold) ** gamma
        focal_term = jnp.where(pt < reduced_threshold, 1.0, focal_term)
    loss = focal_term * logpt
    if alpha is not None:
        loss = loss * (alpha * target + (1 - alpha) * (1 - target))
    if ignore_mask is not None:
        loss = loss * ignore_mask
    if normalized:
        norm = jnp.maximum(jnp.sum(focal_term if ignore_mask is None
                                   else focal_term * ignore_mask), _EPS)
        loss = loss / norm
    if reduction == "mean":
        if ignore_mask is not None:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(ignore_mask), 1.0)
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


@dataclasses.dataclass
class FocalLoss:
    """ref losses/focal.py (binary/multilabel sigmoid focal; multiclass =
    per-class one-vs-rest)."""

    mode: str = BINARY_MODE
    alpha: Optional[float] = None
    gamma: float = 2.0
    ignore_index: Optional[int] = None
    reduction: str = "mean"
    normalized: bool = False
    reduced_threshold: Optional[float] = None

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        kw = dict(gamma=self.gamma, alpha=self.alpha, reduction=self.reduction,
                  normalized=self.normalized, reduced_threshold=self.reduced_threshold)
        if self.mode in (BINARY_MODE, MULTILABEL_MODE):
            if self.mode == BINARY_MODE and y_pred.ndim == y_true.ndim + 1:
                y_pred = y_pred[..., 0]
            out = y_pred.reshape(-1)
            tgt = y_true.reshape(-1)
            mask = None
            if self.ignore_index is not None:
                mask = (tgt != self.ignore_index).astype(jnp.float32)
                tgt = jnp.where(mask > 0, tgt, 0)
            return focal_loss_with_logits(out, tgt, ignore_mask=mask, **kw)
        # multiclass: sum of per-class binary focal (ref focal.py:82-96)
        num_classes = y_pred.shape[-1]
        t = y_true.astype(jnp.int32)
        mask = None
        if self.ignore_index is not None:
            mask = (t != self.ignore_index).astype(jnp.float32).reshape(-1)
        total = 0.0
        for cls in range(num_classes):
            cls_y_true = (t == cls).astype(jnp.float32).reshape(-1)
            cls_y_pred = y_pred[..., cls].reshape(-1)
            total = total + focal_loss_with_logits(cls_y_pred, cls_y_true,
                                                   ignore_mask=mask, **kw)
        return total


@dataclasses.dataclass
class SoftBCEWithLogitsLoss:
    """ref losses/soft_bce.py: BCEWithLogits + label smoothing + ignore."""

    weight: Optional[jax.Array] = None
    ignore_index: Optional[int] = -100
    reduction: str = "mean"
    smooth_factor: Optional[float] = None
    pos_weight: Optional[jax.Array] = None

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        y_true_f = y_true.astype(jnp.float32)
        if self.smooth_factor is not None:
            soft = (1 - y_true_f) * self.smooth_factor + y_true_f * (1 - self.smooth_factor)
        else:
            soft = y_true_f
        logp = jnp.maximum(jax.nn.log_sigmoid(y_pred), -100.0)
        log1mp = jnp.maximum(jax.nn.log_sigmoid(-y_pred), -100.0)
        pw = 1.0 if self.pos_weight is None else self.pos_weight
        loss = -(pw * soft * logp + (1 - soft) * log1mp)
        if self.weight is not None:
            loss = loss * self.weight
        if self.ignore_index is not None:
            not_ignored = (y_true != self.ignore_index).astype(jnp.float32)
            loss = loss * not_ignored
        if self.reduction == "mean":
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss


@dataclasses.dataclass
class SoftCrossEntropyLoss:
    """ref losses/soft_ce.py: label-smoothed multiclass CE with ignore."""

    reduction: str = "mean"
    smooth_factor: float = 0.0
    ignore_index: Optional[int] = -100
    dim: int = -1

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        c = y_pred.shape[-1]
        logp = jax.nn.log_softmax(y_pred.astype(jnp.float32), axis=-1)
        t = y_true.astype(jnp.int32)
        valid = jnp.ones(t.shape, jnp.float32) if self.ignore_index is None else (
            t != self.ignore_index).astype(jnp.float32)
        safe_t = jnp.where(valid > 0, t, 0)
        # one-hot select, not take_along_axis: TPU gathers run on the scalar
        # path (see losses/functional.py cross_entropy); identical values.
        nll = -jnp.sum(logp * jax.nn.one_hot(safe_t, c, dtype=logp.dtype),
                       axis=-1)
        smooth_loss = -jnp.mean(logp, axis=-1)
        sf = self.smooth_factor
        loss = (1 - sf) * nll + sf * smooth_loss
        loss = loss * valid
        if self.reduction == "mean":
            # ref soft_ce.py zeroes ignored positions but means over ALL
            # elements (not just the valid count)
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss


@dataclasses.dataclass
class MCCLoss:
    """ref losses/mcc.py: 1 - Matthews correlation (binary)."""

    eps: float = 1e-5

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        bs = y_true.shape[0]
        t = y_true.reshape(bs, -1).astype(jnp.float32)
        p = y_pred.reshape(bs, -1).astype(jnp.float32)
        tp = jnp.sum(p * t) + self.eps
        tn = jnp.sum((1 - p) * (1 - t)) + self.eps
        fp = jnp.sum(p * (1 - t)) + self.eps
        fn = jnp.sum((1 - p) * t) + self.eps
        numerator = tp * tn - fp * fn
        denominator = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        return 1.0 - numerator / denominator


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """ref losses/lovasz.py:27-39."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_hinge_flat(logits: jax.Array, labels: jax.Array) -> jax.Array:
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    grad = _lovasz_grad(labels[order])
    return jnp.sum(jax.nn.relu(errors_sorted) * grad)


def _lovasz_softmax_flat(probas: jax.Array, labels: jax.Array) -> jax.Array:
    """ref lovasz.py:112-134 with the default classes='present': classes
    absent from the batch contribute nothing and the mean runs over the
    present classes only."""
    c = probas.shape[-1]
    losses, present = [], []
    for cls in range(c):
        fg = (labels == cls).astype(jnp.float32)
        errors = jnp.abs(fg - probas[:, cls])
        order = jnp.argsort(-errors)
        losses.append(jnp.sum(errors[order] * _lovasz_grad(fg[order])))
        present.append(jnp.sum(fg) > 0)
    losses = jnp.stack(losses)
    present = jnp.stack(present).astype(jnp.float32)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


@dataclasses.dataclass
class LovaszLoss:
    """ref losses/lovasz.py (per_image=False variant)."""

    mode: str = BINARY_MODE
    from_logits: bool = True

    def __call__(self, y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
        if self.mode in (BINARY_MODE, MULTILABEL_MODE):
            logits = y_pred.reshape(-1)
            labels = y_true.reshape(-1).astype(jnp.float32)
            return _lovasz_hinge_flat(logits, labels)
        probas = jax.nn.softmax(y_pred, axis=-1) if self.from_logits else y_pred
        c = probas.shape[-1]
        return _lovasz_softmax_flat(probas.reshape(-1, c),
                                    y_true.reshape(-1).astype(jnp.int32))

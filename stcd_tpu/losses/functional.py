"""Loss functions used by the STCD training loops (pure JAX, jittable).

Parity targets:
- bce_dice          <- train_sup.py:312-338 (Dice + BCE_DICE classes)
- cd_loss           <- models/losses.py:24-34
- cross_entropy     <- models/losses.py:6-21
- focal_loss        <- models/losses.py:70-158 (FocalLoss)
- miou_loss         <- models/losses.py:170-203 (mIoULoss)
- mmiou_loss        <- models/losses.py:206-242 (mmIoULoss)
- contrastive_loss  <- train_stcd.py:334-385

All operate channel-last (NHWC); class-channel losses take logits of shape
(N, H, W, C) and integer targets (N, H, W).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stcd_tpu.layers.modules import resize_bilinear

_EPS = 1e-8


def bce_loss(probs: jax.Array, target: jax.Array) -> jax.Array:
    """torch nn.BCELoss(reduction='mean') on probabilities.

    torch clamps each element's log term at -100; reproduced here for
    bit-parity at saturated sigmoid outputs.
    """
    p = probs.astype(jnp.float32)
    t = target.astype(jnp.float32)

    # Saturated sigmoids (exactly 0/1 — bf16 logits reach them easily) must
    # give the torch-clamped value (-100) with a FINITE gradient. The guard
    # epsilon must be a normal fp32 (subnormals are flushed to 0 on TPU/XLA
    # backends, which would resurrect log(0) and nan gradients).
    eps = 1.2e-38

    def safe_log(x):
        return jnp.where(x < eps, -100.0,
                         jnp.maximum(jnp.log(jnp.maximum(x, eps)), -100.0))

    return -jnp.mean(t * safe_log(p) + (1.0 - t) * safe_log(1.0 - p))


def dice_loss(probs: jax.Array, target: jax.Array, smooth: float = 1.0) -> jax.Array:
    """Soft Dice on sigmoid outputs (ref train_sup.py:312-323 Dice)."""
    p = probs.astype(jnp.float32).reshape(-1)
    t = target.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(p * t)
    return 1.0 - (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def bce_dice(probs: jax.Array, target: jax.Array) -> jax.Array:
    """BCE + Dice on sigmoid outputs (ref train_sup.py:327-338 BCE_DICE)."""
    return bce_loss(probs, target) + dice_loss(probs, target)


def cd_loss(probs: jax.Array, target: jax.Array) -> jax.Array:
    """ref models/losses.py:24-34 (same terms as bce_dice)."""
    return dice_loss(probs, target) + bce_loss(probs, target)


def cross_entropy(logits: jax.Array, target: jax.Array,
                  weight: Optional[jax.Array] = None,
                  ignore_index: int = 255) -> jax.Array:
    """ref models/losses.py:6-21.

    logits: (N, H, W, C); target: (N, H, W) or (N, H, W, 1) int.
    If spatial sizes mismatch, logits are bilinearly resized to the target
    (align_corners=True, as the reference).
    Mean over non-ignored pixels; per-class ``weight`` applied as in
    torch F.cross_entropy (weighted mean).
    """
    if target.ndim == 4:
        target = target[..., 0]
    target = target.astype(jnp.int32)
    if logits.shape[1:3] != target.shape[1:3]:
        logits = resize_bilinear(logits, target.shape[1:3], align_corners=True)
    num_classes = logits.shape[-1]
    valid = target != ignore_index
    safe_t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # One-hot select instead of take_along_axis: on TPU the gather (and its
    # scatter-add backward) runs on the scalar path — profiled at ~30 ms per
    # call at bs32 256^2 in the ChangeFormerV6 step (34% of the step across
    # the 5 multi-scale calls) — while the one-hot multiply+reduce is a
    # vectorized VPU op.  Bitwise identical: the non-selected lanes
    # contribute exactly 0.0.
    onehot = jax.nn.one_hot(safe_t, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weight is not None:
        w = onehot @ jnp.asarray(weight, jnp.float32)
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), _EPS)


def focal_loss(logits: jax.Array, target: jax.Array,
               alpha: Optional[jax.Array] = None, gamma: float = 1.0,
               balance_index: int = 0, smooth: float = 1e-5,
               apply_nonlin: bool = True) -> jax.Array:
    """ref models/losses.py:70-158 (FocalLoss with softmax nonlin).

    logits: (N, H, W, C) (the reference takes N,C,d1,d2 and flattens);
    target: integer map broadcastable to (N, H, W).

    alpha semantics follow the reference: None -> ones; a length-C array is
    normalized then inverted (inverse class frequency); a float puts
    1-alpha on ``balance_index``... the float branch is reproduced too.
    """
    num_class = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) if apply_nonlin else logits.astype(jnp.float32)
    p = p.reshape(-1, num_class)
    t = target.reshape(-1).astype(jnp.int32)
    # Out-of-range ids fold to class 0 — the evident intent of the
    # reference's `idx[idx==225]=0` (:136, a typo for the 255 ignore id its
    # own get_alpha folds; torch's scatter_ would crash on a true 255).
    # Without this, one_hot(255) is all-zero -> pt = smooth -> each ignored
    # pixel silently contributes -log(smooth) ~ 11.5 to the loss.
    t = jnp.where((t < 0) | (t >= num_class), 0, t)

    if alpha is None:
        alpha_v = jnp.ones((num_class,), jnp.float32)
    else:
        alpha_arr = jnp.asarray(alpha, jnp.float32)
        if alpha_arr.ndim == 0:
            a = alpha_arr
            alpha_v = jnp.full((num_class,), (1.0 - a) / max(num_class - 1, 1))
            alpha_v = alpha_v.at[balance_index].set(a)
        else:
            alpha_arr = alpha_arr / jnp.sum(alpha_arr)
            alpha_v = 1.0 / alpha_arr  # inverse class frequency (ref :125-127)

    one_hot = jax.nn.one_hot(t, num_class, dtype=jnp.float32)
    if smooth:
        one_hot = jnp.clip(one_hot, smooth / (num_class - 1), 1.0 - smooth)
    pt = jnp.sum(one_hot * p, axis=1) + smooth
    logpt = jnp.log(pt)
    alpha_t = alpha_v[t]
    loss = -alpha_t * jnp.power(1.0 - pt, gamma) * logpt
    return jnp.mean(loss)


def _soft_iou_terms(logits: jax.Array, target: jax.Array, n_classes: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Shared soft-IoU numerator/denominator (ref models/losses.py:178-199)."""
    n = logits.shape[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    t = target.reshape(target.shape[0], -1).astype(jnp.int32)
    one_hot = jax.nn.one_hot(t, n_classes, dtype=jnp.float32)  # (N, HW, C)
    p = probs.reshape(n, -1, n_classes)
    inter = jnp.sum(p * one_hot, axis=1)
    union = jnp.sum(p + one_hot - p * one_hot, axis=1)
    return inter, union


def miou_loss(logits: jax.Array, target: jax.Array,
              weight: Optional[jax.Array] = None, n_classes: int = 2) -> jax.Array:
    """ref models/losses.py:170-203: -mean(w * inter / union)."""
    inter, union = _soft_iou_terms(logits, target, n_classes)
    w = jnp.ones((n_classes,), jnp.float32) if weight is None else jnp.asarray(weight, jnp.float32)
    return -jnp.mean(w * inter / (union + _EPS))


def mmiou_loss(logits: jax.Array, target: jax.Array, n_classes: int = 2) -> jax.Array:
    """ref models/losses.py:206-242: -min(iou) - mean(iou)."""
    inter, union = _soft_iou_terms(logits, target, n_classes)
    iou = inter / (union + _EPS)
    return -jnp.min(iou) - jnp.mean(iou)


def contrastive_loss(pred: jax.Array, cd_label: jax.Array,
                     pse_label: jax.Array) -> jax.Array:
    """Pixel contrastive/consistency loss (ref train_stcd.py:334-385).

    ``pred`` is the sigmoid change map over the *concatenated* real+pseudo
    batch (first half: real pairs; second half: pseudo pairs, see
    train_stcd.py:421-425). Where the two label sources agree (M) the
    pseudo prediction is pulled toward the real one; where they disagree
    (N) it is pulled toward (1 - real).
    """
    n = cd_label.shape[0]
    cd_pred = pred[:n].astype(jnp.float32)
    pse_pred = pred[n:].astype(jnp.float32)
    agree = (cd_label == pse_label).astype(jnp.float32)
    disagree = 1.0 - agree
    neg_cdpre = jnp.abs(cd_pred - 1.0)
    se_pos = (pse_pred - cd_pred) ** 2
    se_neg = (pse_pred - neg_cdpre) ** 2
    loss_pos = jnp.sum(se_pos * agree) / (jnp.sum(agree) + _EPS)
    loss_neg = jnp.sum(se_neg * disagree) / (jnp.sum(disagree) + _EPS)
    return loss_pos + loss_neg


def get_alpha(loader) -> "np.ndarray":
    """Class-occurrence scan over a labeled loader (ref models/losses.py:38-59).

    Accepts any iterable of batches with a 'label' (or 'L') entry; 255 is
    folded into class 0 as the reference does.
    """
    import numpy as np

    counts = None
    for batch in loader:
        lab = np.asarray(batch["label"] if "label" in batch else batch["L"])
        lab = lab.astype(np.int64)
        lab[lab == 255] = 0
        c = np.bincount(lab.reshape(-1))
        if counts is None:
            counts = c.astype(np.float64)
        else:
            if len(c) > len(counts):
                counts = np.pad(counts, (0, len(c) - len(counts)))
            counts[: len(c)] += c
    return counts

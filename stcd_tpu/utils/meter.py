"""smp utils parity: meters + fit-loop runners.

- AverageValueMeter <- segmentation_models_pytorch/utils/meter.py
- Epoch/TrainEpoch/ValidEpoch <- utils/train.py:73-115 (generic fit loop
  over (x, y) batches with a loss object and metric objects)
- IoU/Fscore/Accuracy/Recall/Precision metric objects <- utils/metrics.py
- Loss arithmetic (+, *) and the loss-object zoo (Jaccard/Dice/L1/MSE/
  CrossEntropy/NLL/BCE/BCEWithLogits) <- utils/base.py:24-68 +
  utils/losses.py:1-67
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import numpy as np

import jax
import jax.numpy as jnp


class AverageValueMeter:
    """ref utils/meter.py Meter/AverageValueMeter."""

    def __init__(self):
        self.reset()

    def add(self, value, n=1):
        self.val = value
        # ref meter.py accumulates the raw value (not value*n) and a
        # running sum of squares in `var`
        self.sum += value
        self.var += value * value
        self.n += n
        if self.n == 0:
            self.mean, self.std = np.nan, np.nan
        elif self.n == 1:
            self.mean = 0.0 + self.sum  # ref meter.py: sum, not value
            self.std = np.inf
            self.mean_old = self.mean
            self.m_s = 0.0
        else:
            self.mean = self.mean_old + (value - n * self.mean_old) / float(self.n)
            self.m_s += (value - self.mean_old) * (value - self.mean)
            self.mean_old = self.mean
            self.std = math.sqrt(self.m_s / (self.n - 1.0))

    def value(self):
        return self.mean, self.std

    def reset(self):
        self.n = 0
        self.sum = 0.0
        self.var = 0.0
        self.val = 0.0
        self.mean = np.nan
        self.mean_old = 0.0
        self.m_s = 0.0
        self.std = np.nan


def _threshold(x, threshold=None):
    return (x > threshold).astype(jnp.float32) if threshold is not None else x


def _activate(pr, activation):
    """ref utils metrics default activation=None (identity): the smp
    contract feeds model outputs straight in (models built with
    activation='sigmoid' already emit probabilities). Hardcoding sigmoid
    here double-activated such models — review finding."""
    from stcd_tpu.layers.modules import Activation
    return Activation(activation)(pr)


def _take_channels(ignore_channels, *xs):
    """ref utils/functional._take_channels: drop the ignored channels
    (channel-LAST here vs the reference's dim=1)."""
    if ignore_channels is None:
        return xs
    keep = [c for c in range(xs[0].shape[-1]) if c not in ignore_channels]
    return tuple(jnp.take(x, jnp.asarray(keep), axis=-1) for x in xs)


@dataclasses.dataclass
class IoU:
    """ref utils/metrics.py IoU (soft jaccard on activations)."""

    eps: float = 1e-7
    threshold: float = 0.5
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "iou_score"

    def __call__(self, pr, gt):
        pr = _threshold(_activate(pr, self.activation), self.threshold)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        inter = jnp.sum(gt * pr)
        union = jnp.sum(gt) + jnp.sum(pr) - inter + self.eps
        return (inter + self.eps) / union


@dataclasses.dataclass
class Fscore:
    eps: float = 1e-7
    beta: float = 1.0
    threshold: float = 0.5
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "fscore"

    def __call__(self, pr, gt):
        pr = _threshold(_activate(pr, self.activation), self.threshold)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        tp = jnp.sum(gt * pr)
        fp = jnp.sum(pr) - tp
        fn = jnp.sum(gt) - tp
        b2 = self.beta ** 2
        return ((1 + b2) * tp + self.eps) / ((1 + b2) * tp + b2 * fn + fp + self.eps)


@dataclasses.dataclass
class Accuracy:
    threshold: float = 0.5
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "accuracy"

    def __call__(self, pr, gt):
        pr = _threshold(_activate(pr, self.activation), self.threshold)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        return jnp.mean((pr == gt).astype(jnp.float32))


@dataclasses.dataclass
class Precision:
    """ref utils/metrics.py Precision: tp / (tp + fp)."""

    eps: float = 1e-7
    threshold: float = 0.5
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "precision"

    def __call__(self, pr, gt):
        pr = _threshold(_activate(pr, self.activation), self.threshold)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        tp = jnp.sum(gt * pr)
        fp = jnp.sum(pr) - tp
        return (tp + self.eps) / (tp + fp + self.eps)


@dataclasses.dataclass
class Recall:
    """ref utils/metrics.py Recall: tp / (tp + fn)."""

    eps: float = 1e-7
    threshold: float = 0.5
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "recall"

    def __call__(self, pr, gt):
        pr = _threshold(_activate(pr, self.activation), self.threshold)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        tp = jnp.sum(gt * pr)
        fn = jnp.sum(gt) - tp
        return (tp + self.eps) / (tp + fn + self.eps)


class Loss:
    """ref utils/base.py:24-68 Loss arithmetic: loss objects compose with
    ``+`` (SumOfLosses) and ``*`` scalar (MultipliedLoss), with composed
    ``__name__`` strings for the meter display."""

    def __add__(self, other):
        if isinstance(other, Loss):
            return SumOfLosses(self, other)
        raise ValueError("Loss should be inherited from `Loss` class")

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, value):
        if isinstance(value, (int, float)):
            return MultipliedLoss(self, value)
        raise ValueError("Loss should be inherited from `BaseLoss` class")

    def __rmul__(self, other):
        return self.__mul__(other)


class SumOfLosses(Loss):
    def __init__(self, l1, l2):
        self.l1, self.l2 = l1, l2
        self.__name__ = f"{l1.__name__} + {l2.__name__}"

    def __call__(self, *inputs):
        return self.l1(*inputs) + self.l2(*inputs)


class MultipliedLoss(Loss):
    def __init__(self, loss, multiplier):
        self.loss, self.multiplier = loss, multiplier
        if "+" in loss.__name__:
            self.__name__ = f"{multiplier} * ({loss.__name__})"
        else:
            self.__name__ = f"{multiplier} * {loss.__name__}"

    def __call__(self, *inputs):
        return self.multiplier * self.loss(*inputs)


@dataclasses.dataclass
class JaccardLoss(Loss):
    """ref utils/losses.py JaccardLoss: 1 - soft jaccard, eps=1."""

    eps: float = 1.0
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "jaccard_loss"

    def __call__(self, pr, gt):
        pr = _activate(pr, self.activation)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        inter = jnp.sum(gt * pr)
        union = jnp.sum(gt) + jnp.sum(pr) - inter + self.eps
        return 1.0 - (inter + self.eps) / union


@dataclasses.dataclass
class DiceLoss(Loss):
    """ref utils/losses.py DiceLoss: 1 - soft f-score, eps=1."""

    eps: float = 1.0
    beta: float = 1.0
    activation: object = None
    ignore_channels: object = None

    def __post_init__(self):
        self.__name__ = "dice_loss"

    def __call__(self, pr, gt):
        pr = _activate(pr, self.activation)
        pr, gt = _take_channels(self.ignore_channels, pr, gt)
        tp = jnp.sum(gt * pr)
        fp = jnp.sum(pr) - tp
        fn = jnp.sum(gt) - tp
        b2 = self.beta ** 2
        return 1.0 - ((1 + b2) * tp + self.eps) / (
            (1 + b2) * tp + b2 * fn + fp + self.eps)


class L1Loss(Loss):
    """ref utils/losses.py L1Loss (torch nn.L1Loss, mean reduction)."""

    __name__ = "l1_loss"

    def __call__(self, pr, gt):
        return jnp.mean(jnp.abs(pr - gt))


class MSELoss(Loss):
    """ref utils/losses.py MSELoss (torch nn.MSELoss, mean reduction)."""

    __name__ = "mse_loss"

    def __call__(self, pr, gt):
        return jnp.mean(jnp.square(pr - gt))


class CrossEntropyLoss(Loss):
    """ref utils/losses.py CrossEntropyLoss: softmax CE on logits with
    integer targets (channel-LAST here; torch is channel-first)."""

    __name__ = "cross_entropy_loss"

    def __call__(self, pr, gt):
        logp = jax.nn.log_softmax(pr, axis=-1)
        gt = gt.astype(jnp.int32)
        onehot = jax.nn.one_hot(gt, pr.shape[-1], dtype=logp.dtype)
        return -jnp.mean(jnp.sum(logp * onehot, axis=-1))


class NLLLoss(Loss):
    """ref utils/losses.py NLLLoss: mean -log_prob[target] (inputs are
    already log-probabilities, channel-last)."""

    __name__ = "nll_loss"

    def __call__(self, pr, gt):
        gt = gt.astype(jnp.int32)
        onehot = jax.nn.one_hot(gt, pr.shape[-1], dtype=pr.dtype)
        return -jnp.mean(jnp.sum(pr * onehot, axis=-1))


class BCELoss(Loss):
    """ref utils/losses.py BCELoss: binary CE on probabilities, with the
    torch log clamp at -100."""

    __name__ = "bce_loss"

    def __call__(self, pr, gt):
        log_p = jnp.clip(jnp.log(pr), -100.0)
        log_1mp = jnp.clip(jnp.log1p(-pr), -100.0)
        return -jnp.mean(gt * log_p + (1.0 - gt) * log_1mp)


class BCEWithLogitsLoss(Loss):
    """ref utils/losses.py BCEWithLogitsLoss: numerically stable sigmoid
    CE on logits."""

    __name__ = "bce_with_logits_loss"

    def __call__(self, pr, gt):
        import optax
        return jnp.mean(optax.sigmoid_binary_cross_entropy(pr, gt))


class Epoch:
    """Generic fit-loop epoch runner (ref utils/train.py)."""

    def __init__(self, apply_fn, loss, metrics: List, stage_name: str,
                 verbose: bool = True):
        self.apply_fn = apply_fn
        self.loss = loss
        self.metrics = metrics
        self.stage_name = stage_name
        self.verbose = verbose

    def batch_update(self, state, xs, y):
        raise NotImplementedError

    def run(self, state, dataloader):
        loss_meter = AverageValueMeter()
        metric_meters = {m.__name__: AverageValueMeter() for m in self.metrics}
        for batch in dataloader:
            if "image" in batch:
                xs = (jnp.asarray(batch["image"]),)
            elif "B" in batch:  # bi-temporal pair: the model gets BOTH
                xs = (jnp.asarray(batch["A"]), jnp.asarray(batch["B"]))
            else:
                xs = (jnp.asarray(batch["A"]),)
            y = jnp.asarray(batch["label"]).astype(jnp.float32)
            state, loss, pred = self.batch_update(state, xs, y)
            loss_meter.add(float(loss))
            for m in self.metrics:
                metric_meters[m.__name__].add(float(m(pred, y)))
        logs = {"loss": loss_meter.mean}
        logs.update({k: v.mean for k, v in metric_meters.items()})
        return state, logs


class ValidEpoch(Epoch):
    def __init__(self, apply_fn, loss, metrics, verbose=True):
        super().__init__(apply_fn, loss, metrics, "valid", verbose)
        self._jit_step = None

    def batch_update(self, state, xs, y):
        if self._jit_step is None:
            @jax.jit
            def step(state, xs, y):
                pred = self.apply_fn(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, *xs)
                return self.loss(pred, y), pred
            self._jit_step = step
        loss, pred = self._jit_step(state, xs, y)
        return state, loss, pred


class TrainEpoch(Epoch):
    def __init__(self, apply_fn, loss, metrics, tx=None, verbose=True):
        super().__init__(apply_fn, loss, metrics, "train", verbose)
        self.tx = tx  # optional optimizer override, applied at run() start
        self._jit_step = None

    def run(self, state, dataloader):
        if self.tx is not None and state.tx is not self.tx:
            # smp pattern: swap the optimizer (e.g. new lr) between epochs.
            # Keep Adam moments + step counter when the new tx has the same
            # opt_state structure; re-init only on a structure mismatch
            # (e.g. adam -> sgd), still preserving the step counter.
            new_struct = jax.tree_util.tree_structure(
                jax.eval_shape(self.tx.init, state.params))  # no allocation
            if new_struct == jax.tree_util.tree_structure(state.opt_state):
                state = state.replace(tx=self.tx)
            else:
                state = state.replace(tx=self.tx,
                                      opt_state=self.tx.init(state.params))
        return super().run(state, dataloader)

    def batch_update(self, state, xs, y):
        if self._jit_step is None:
            @jax.jit
            def step(state, xs, y):
                # derive the dropout key ON DEVICE: int(state.step) here
                # would block the host on the previous step every batch
                # (review finding)
                rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

                def loss_fn(params):
                    pred, mutated = self.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        *xs, True, mutable=["batch_stats"],
                        rngs={"dropout": rng})
                    return self.loss(pred, y), (mutated, pred)

                (loss, (mutated, pred)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(
                    grads=grads, batch_stats=mutated["batch_stats"])
                return state, loss, pred
            self._jit_step = step
        return self._jit_step(state, xs, y)

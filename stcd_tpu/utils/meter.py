"""smp utils parity: meters + fit-loop runners.

- AverageValueMeter <- segmentation_models_pytorch/utils/meter.py
- Epoch/TrainEpoch/ValidEpoch <- utils/train.py:73-115 (generic fit loop
  over (x, y) batches with a loss object and metric objects)
- IoU/Fscore/Accuracy/Recall/Precision metric objects <- utils/metrics.py
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
            self.mean = 0.0 + value
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


@dataclasses.dataclass
class IoU:
    """ref utils/metrics.py IoU (soft jaccard on activations)."""

    eps: float = 1e-7
    threshold: float = 0.5

    def __post_init__(self):
        self.__name__ = "iou_score"

    def __call__(self, pr, gt):
        pr = _threshold(jax.nn.sigmoid(pr) if pr.dtype != jnp.bool_ else pr,
                        self.threshold)
        inter = jnp.sum(gt * pr)
        union = jnp.sum(gt) + jnp.sum(pr) - inter + self.eps
        return (inter + self.eps) / union


@dataclasses.dataclass
class Fscore:
    eps: float = 1e-7
    beta: float = 1.0
    threshold: float = 0.5

    def __post_init__(self):
        self.__name__ = "fscore"

    def __call__(self, pr, gt):
        pr = _threshold(jax.nn.sigmoid(pr), self.threshold)
        tp = jnp.sum(gt * pr)
        fp = jnp.sum(pr) - tp
        fn = jnp.sum(gt) - tp
        b2 = self.beta ** 2
        return ((1 + b2) * tp + self.eps) / ((1 + b2) * tp + b2 * fn + fp + self.eps)


@dataclasses.dataclass
class Accuracy:
    threshold: float = 0.5

    def __post_init__(self):
        self.__name__ = "accuracy"

    def __call__(self, pr, gt):
        pr = _threshold(jax.nn.sigmoid(pr), self.threshold)
        return jnp.mean((pr == gt).astype(jnp.float32))


@dataclasses.dataclass
class Precision:
    """ref utils/metrics.py Precision: tp / (tp + fp)."""

    eps: float = 1e-7
    threshold: float = 0.5

    def __post_init__(self):
        self.__name__ = "precision"

    def __call__(self, pr, gt):
        pr = _threshold(jax.nn.sigmoid(pr), self.threshold)
        tp = jnp.sum(gt * pr)
        fp = jnp.sum(pr) - tp
        return (tp + self.eps) / (tp + fp + self.eps)


@dataclasses.dataclass
class Recall:
    """ref utils/metrics.py Recall: tp / (tp + fn)."""

    eps: float = 1e-7
    threshold: float = 0.5

    def __post_init__(self):
        self.__name__ = "recall"

    def __call__(self, pr, gt):
        pr = _threshold(jax.nn.sigmoid(pr), self.threshold)
        tp = jnp.sum(gt * pr)
        fn = jnp.sum(gt) - tp
        return (tp + self.eps) / (tp + fn + self.eps)


@dataclasses.dataclass
class JaccardLoss:
    """ref utils/losses.py JaccardLoss: 1 - soft jaccard, eps=1."""

    eps: float = 1.0

    def __post_init__(self):
        self.__name__ = "jaccard_loss"

    def __call__(self, pr, gt):
        pr = jax.nn.sigmoid(pr)
        inter = jnp.sum(gt * pr)
        union = jnp.sum(gt) + jnp.sum(pr) - inter + self.eps
        return 1.0 - (inter + self.eps) / union


@dataclasses.dataclass
class DiceLoss:
    """ref utils/losses.py DiceLoss: 1 - soft f-score, eps=1."""

    eps: float = 1.0
    beta: float = 1.0

    def __post_init__(self):
        self.__name__ = "dice_loss"

    def __call__(self, pr, gt):
        pr = jax.nn.sigmoid(pr)
        tp = jnp.sum(gt * pr)
        fp = jnp.sum(pr) - tp
        fn = jnp.sum(gt) - tp
        b2 = self.beta ** 2
        return 1.0 - ((1 + b2) * tp + self.eps) / (
            (1 + b2) * tp + b2 * fn + fp + self.eps)


class Epoch:
    """Generic fit-loop epoch runner (ref utils/train.py)."""

    def __init__(self, apply_fn, loss, metrics: List, stage_name: str,
                 verbose: bool = True):
        self.apply_fn = apply_fn
        self.loss = loss
        self.metrics = metrics
        self.stage_name = stage_name
        self.verbose = verbose

    def batch_update(self, state, x, y):
        raise NotImplementedError

    def run(self, state, dataloader):
        loss_meter = AverageValueMeter()
        metric_meters = {m.__name__: AverageValueMeter() for m in self.metrics}
        for batch in dataloader:
            x = jnp.asarray(batch["image"] if "image" in batch else batch["A"])
            y = jnp.asarray(batch["label"]).astype(jnp.float32)
            state, loss, pred = self.batch_update(state, x, y)
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

    def batch_update(self, state, x, y):
        if self._jit_step is None:
            @jax.jit
            def step(state, x, y):
                pred = self.apply_fn(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, x)
                return self.loss(pred, y), pred
            self._jit_step = step
        loss, pred = self._jit_step(state, x, y)
        return state, loss, pred


class TrainEpoch(Epoch):
    def __init__(self, apply_fn, loss, metrics, tx=None, verbose=True):
        super().__init__(apply_fn, loss, metrics, "train", verbose)
        self.tx = tx  # optional optimizer override, applied at run() start
        self._jit_step = None

    def run(self, state, dataloader):
        if self.tx is not None and state.tx is not self.tx:
            from stcd_tpu.train.state import TrainState
            state = TrainState.create_with_stats(
                apply_fn=state.apply_fn, params=state.params,
                batch_stats=state.batch_stats, tx=self.tx)
        return super().run(state, dataloader)

    def batch_update(self, state, x, y):
        if self._jit_step is None:
            @jax.jit
            def step(state, x, y, rng):
                def loss_fn(params):
                    pred, mutated = self.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        x, True, mutable=["batch_stats"],
                        rngs={"dropout": rng})
                    return self.loss(pred, y), (mutated, pred)

                (loss, (mutated, pred)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(
                    grads=grads, batch_stats=mutated["batch_stats"])
                return state, loss, pred
            self._jit_step = step
        return self._jit_step(state, x, y,
                              jax.random.PRNGKey(int(state.step)))

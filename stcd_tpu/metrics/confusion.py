"""Confusion-matrix segmentation metrics.

Parity target: the in-script ``SegmentationMetric`` accumulator triplicated
in train_sup.py:188-266 / train_pse_cd.py:304-382 / train_stcd.py:515-593.

Design: the per-batch count is a jittable device function
(``confusion_matrix``: one-hot matmul formulation of the reference's
``bincount(numClass * label + pred)``, train_sup.py:245-252); accumulation
happens on host in numpy float64, exactly like the reference, which keeps
its float64 matrix on CPU (reset() only moves to GPU for device=='cuda'
while callers pass 'cuda:0' — so it always stays on CPU; see SURVEY §5).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred: jax.Array, label: jax.Array, num_classes: int = 2) -> jax.Array:
    """Per-batch (num_classes, num_classes) int32 confusion counts.

    Rows = label, cols = pred (matches ``reshape(numClass, numClass)`` of
    ``bincount(numClass * label + pred)``, ref train_sup.py:245-252).

    Implemented as a one-hot matmul so it lowers onto the MXU instead of a
    scatter (TPU scatters serialize; the matmul formulation is ~free next
    to the model forward).
    """
    p = pred.reshape(-1).astype(jnp.int32)
    l = label.reshape(-1).astype(jnp.int32)
    if p.size > (1 << 24):
        # fp32 loses integer exactness past 2^24; a cell count could be
        # off. Static-shape check -> trace-time error, zero runtime cost.
        raise ValueError(
            f"confusion_matrix: {p.size} pixels in one batch exceeds the "
            "fp32-exact count range (2^24). Split the batch (accum_steps) "
            "or accumulate per-microbatch counts.")
    oh_l = jax.nn.one_hot(l, num_classes, dtype=jnp.float32)
    oh_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    cm = jnp.dot(oh_l.T, oh_p, preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


class SegmentationMetric:
    """Host-side float64 accumulator (ref train_sup.py:188-266).

    Method names mirror the reference class; all return numpy values.
    """

    def __init__(self, num_classes: int = 2):
        self.numClass = num_classes
        self.reset()

    def reset(self):
        self.confusionMatrix = np.zeros((self.numClass, self.numClass), np.float64)

    def addBatch(self, pred, label):
        """pred/label: int arrays (device or host), identical shapes."""
        cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(label), self.numClass)
        self.confusionMatrix += np.asarray(cm, np.float64)
        return self.confusionMatrix

    def getConfusionMatrix(self):
        return self.confusionMatrix

    # --- derived metrics (ref train_sup.py:196-243) ---
    def OverallAccuracy(self):
        return np.diag(self.confusionMatrix).sum() / self.confusionMatrix.sum()

    def Precision(self):
        return np.diag(self.confusionMatrix) / self.confusionMatrix.sum(0)

    def Recall(self):
        return np.diag(self.confusionMatrix) / self.confusionMatrix.sum(1)

    def F1score(self):
        p, r = self.Precision(), self.Recall()
        return 2 * p * r / (p + r)

    def IntersectionOverUnion(self):
        inter = np.diag(self.confusionMatrix)
        union = self.confusionMatrix.sum(1) + self.confusionMatrix.sum(0) - inter
        return inter / union

    def meanIntersectionOverUnion(self):
        return np.mean(self.IntersectionOverUnion())

    def Frequency_Weighted_Intersection_over_Union(self):
        freq = self.confusionMatrix.sum(1) / (self.confusionMatrix.sum() + 1e-8)
        inter = np.diag(self.confusionMatrix)
        iu = inter / (self.confusionMatrix.sum(1) + self.confusionMatrix.sum(0)
                      - inter + 1e-8)
        return (freq[freq > 0] * iu[freq > 0]).sum()

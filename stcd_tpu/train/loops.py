"""Epoch-level training loops for the three STCD stages.

Parity targets:
- train_seg      <- train_sup.py:112-185 (main/train_epoch)
- train_cd       <- train_pse_cd.py:199-301 (train_cd_epoch)
- train_semi_cd  <- train_stcd.py:388-512 (train_semi_cd)
Plus the gated utilities:
- generate_pseudo_labels <- train_pse_cd.py:128-179 / train_stcd.py:137-204
- select_reliable        <- train_pse_cd.py:87-126 / train_stcd.py:96-135

Loop shape matches the reference: per-iteration optimizer step with Poly
decay on the global step, per-epoch eval with the confusion-matrix
metrics, best checkpoint by class-1 IoU, periodic snapshots at
n/3, 2n/3, n (ref train_sup.py:175-183).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from stcd_tpu.data.io import save_jet_png, save_mask_png, write_list
from stcd_tpu.metrics.confusion import SegmentationMetric
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.utils.logging import ScalarLogger, Throughput


def _epoch_metrics(metric: SegmentationMetric) -> Dict[str, float]:
    return {
        "OA": float(metric.OverallAccuracy()),
        "precision": float(metric.Precision()[1]),
        "recall": float(metric.Recall()[1]),
        "F1": float(metric.F1score()[1]),
        "IoU": float(metric.IntersectionOverUnion()[1]),
        "mIoU": float(metric.meanIntersectionOverUnion()),
    }



# int32 per-cell counts wrap past 2^31; flush the device accumulator to the
# host float64 matrix well before that (2x margin).
_CM_FLUSH_PIXEL_BUDGET = 1 << 30


def _batch_pixels(batch) -> int:
    """Upper bound on confusion-matrix pixels one step contributes
    (host-side shape math only — no device sync). The semi-CD train step
    counts the full concatenated batch, hence the factor 2."""
    dims = [int(np.prod(v.shape[:3])) for v in batch.values()
            if hasattr(v, "ndim") and v.ndim >= 3]
    return 2 * max(dims) if dims else 0


def run_training(train_step, eval_step, state, train_loader, eval_loader,
                 n_epochs: int, save_dir: str, rng,
                 log_every: int = 10, eval_key: str = "IoU",
                 snapshot_epochs: Optional[set] = None,
                 logger: Optional[ScalarLogger] = None,
                 preemption=None, start_epoch: int = 1,
                 best: float = -1.0, best_epoch: int = 0):
    """Generic stage driver (the shared shape of all three train_*.py loops).

    Returns (state, best_metric, history).

    ``preemption``: optional train.preemption.PreemptionGuard. When it
    fires (SIGTERM), the loop saves a full resume point (save_last) and
    returns early — the interrupted epoch is NOT counted, so restarting
    with ``start_epoch``/``best``/``best_epoch`` from ``restore_last``
    re-runs it. ``best=-1.0`` default: the first epoch always saves a
    best artifact (the reference never writes one when IoU stays at 0.0 —
    a latent flaw its own load_model path trips over).
    """
    ckpt = CheckpointManager(save_dir)
    logger = logger or ScalarLogger(os.path.join(save_dir, "logs"))
    if snapshot_epochs is None:
        snapshot_epochs = {n_epochs // 3, n_epochs * 2 // 3, n_epochs}
    score = lambda em: 0.0 if np.isnan(em[eval_key]) else float(em[eval_key])
    history = []
    meter = Throughput()
    # keep the TensorBoard step axis aligned across a resume: the restored
    # state.step counts the optimizer steps already taken (0 for a fresh
    # state; weights-only stage hand-offs don't restore step). No
    # start_epoch gate — a run preempted DURING epoch 1 resumes with
    # start_epoch=1 but step>0, and restarting the axis at 0 would
    # overwrite the already-logged scalar range.
    global_step = int(jax.device_get(state.step))
    for epoch in range(start_epoch, n_epochs + 1):
        # per-epoch rate: without the reset the meter accumulates eval /
        # checkpoint / logging time from every prior epoch and reports a
        # steadily decaying "throughput" for a perfectly steady run
        meter.reset()
        train_metric = SegmentationMetric(2)
        # Accumulate confusion counts ON DEVICE and flush to the host
        # float64 matrix only periodically: np.asarray(out["cm"]) every step
        # would block until the step finishes and kill the async-dispatch
        # pipeline (the reference pays this via .cpu() per iteration,
        # train_pse_cd.py:230-236). int32 cells wrap past 2^31 pixels, so
        # the flush interval is a PIXEL budget, not a fixed step count
        # (128 steps overflow at batch>=256 @256^2 — review finding).
        cm_dev = None
        px_acc = 0
        for batch in train_loader:
            if preemption is not None and preemption.should_stop():
                # flush device counts, save a FULL resume point (the
                # interrupted epoch is re-run on restart) and leave
                if cm_dev is not None:
                    train_metric.confusionMatrix += np.asarray(cm_dev, np.float64)
                ckpt.save_last(state, epoch - 1, best, best_epoch)
                logger.flush()
                print(f"preemption: saved resume point at epoch {epoch - 1}; "
                      f"restart with --resume")
                return state, best, history
            rng, step_rng = jax.random.split(rng)
            names = batch.pop("name", None)
            state, out = train_step(state, batch, step_rng)
            cm_dev = out["cm"] if cm_dev is None else cm_dev + out["cm"]
            px_acc += _batch_pixels(batch)
            if px_acc >= _CM_FLUSH_PIXEL_BUDGET:
                train_metric.confusionMatrix += np.asarray(cm_dev, np.float64)
                cm_dev, px_acc = None, 0
            bs = next(iter(batch.values())).shape[0]
            meter.update(bs)
            if global_step % log_every == 0:
                logger.add_scalar("train/loss", float(out["loss"]), global_step)
                for k in ("seg_loss", "cd_loss", "ct_loss"):
                    if k in out:
                        logger.add_scalar(f"train/{k}", float(out[k]), global_step)
            global_step += 1
        if cm_dev is not None:
            train_metric.confusionMatrix += np.asarray(cm_dev, np.float64)
        tm = _epoch_metrics(train_metric)
        logger.add_scalar("train/F1", tm["F1"], epoch)
        logger.add_scalar("train/IoU", tm["IoU"], epoch)
        logger.add_scalar("train/imgs_per_sec", meter.rate(), epoch)

        em = evaluate(eval_step, state, eval_loader)
        for k, v in em.items():
            logger.add_scalar(f"val/{k}", v, epoch)
        history.append({"epoch": epoch, "train": tm, "val": em})
        if score(em) > best:
            best = score(em)
            best_epoch = epoch
            ckpt.save_best(state, best)
        if epoch in snapshot_epochs:
            ckpt.save_snapshot(state, epoch)
        ckpt.save_last(state, epoch, best, best_epoch)
        logger.flush()
    return state, best, history


def evaluate(eval_step, state, eval_loader) -> Dict[str, float]:
    metric = SegmentationMetric(2)
    cm_dev = None
    px_acc = 0
    for batch in eval_loader:
        batch = dict(batch)
        batch.pop("name", None)
        out = eval_step(state, batch)
        # device-side accumulation, flushed on the same int32 pixel budget
        # as the train loop (unbounded eval sets wrapped past 2^31 pixels
        # — review finding)
        cm_dev = out["cm"] if cm_dev is None else cm_dev + out["cm"]
        px_acc += _batch_pixels(batch)
        if px_acc >= _CM_FLUSH_PIXEL_BUDGET:
            metric.confusionMatrix += np.asarray(cm_dev, np.float64)
            cm_dev, px_acc = None, 0
    if cm_dev is not None:
        metric.confusionMatrix += np.asarray(cm_dev, np.float64)
    return _epoch_metrics(metric)


def generate_pseudo_labels(eval_step, state, loader, out_dir: str,
                           threshold: float = 0.7,
                           vis_dir: str = None) -> Dict[str, float]:
    """Thresholded sigmoid(diff) -> PNG x255 (ref train_pse_cd.py:128-179;
    threshold 0.5 variant at train_stcd.py:137-204). Accumulates F1/IoU vs
    the GT labels for reporting, as the reference does. ``vis_dir`` enables
    the reference's vis_feature block (train_stcd.py:157-164): the raw
    probability map is min-max-normalized and dumped JET-colorized."""
    metric = SegmentationMetric(2)
    os.makedirs(out_dir, exist_ok=True)
    for batch in loader:
        names = batch.pop("name")
        out = eval_step(state, batch)
        probs = np.asarray(out["probs"])
        preds = (probs > threshold).astype(np.uint8)
        labels = np.asarray(batch["label"]).astype(np.int64)
        metric.addBatch(preds.astype(np.int64), labels)
        for i, name in enumerate(names):
            save_mask_png(preds[i], os.path.join(out_dir, name))
            if vis_dir:
                save_jet_png(probs[i], os.path.join(vis_dir, name))
    return _epoch_metrics(metric)


def select_reliable(eval_steps, states, loader, list_dir: str):
    """Ensemble reliability ranking (ref train_stcd.py:96-135): for each
    sample, the K model predictions' mean pairwise IoU ranks stability;
    the top half goes to reliable_ids.txt, the rest to unreliable_ids.txt.

    ``states``: list of (eval_step-compatible) states from different epochs.
    """
    if len(states) < 2:
        raise ValueError(
            "reliability ranking needs >= 2 model states (the reference uses "
            "3 epoch snapshots + the current model, train_stcd.py:98-104); "
            f"got {len(states)} — are the *_model snapshots missing from "
            "--load_path?")
    id_to_reliability = []
    for batch in loader:
        names = batch.pop("name")
        preds = []
        for eval_step, st in zip(eval_steps, states):
            out = eval_step(st, batch)
            preds.append((np.asarray(out["probs"]) > 0.5).astype(np.int64))
        bs = preds[0].shape[0]
        for i in range(bs):
            mious = []
            for k in range(len(preds) - 1):
                a, b = preds[k][i], preds[-1][i]
                m = SegmentationMetric(2)
                m.addBatch(a, b)
                mious.append(m.meanIntersectionOverUnion())
            id_to_reliability.append((names[i], float(np.mean(mious))))
    id_to_reliability.sort(key=lambda x: x[1], reverse=True)
    half = len(id_to_reliability) // 2
    write_list([i for i, _ in id_to_reliability[:half]],
               os.path.join(list_dir, "reliable_ids.txt"))
    write_list([i for i, _ in id_to_reliability[half:]],
               os.path.join(list_dir, "unreliable_ids.txt"))
    return id_to_reliability

"""Config-driven CDTrainer / CDEvaluator.

Working equivalents of the reference's vestigial trainer/evaluator
(models/trainer.py:22-371, models/evaluator.py:19-193 — dead in the
reference tree due to missing imports; SURVEY.md headline facts), keeping
their semantics:

- optimizer choice sgd/adam/adamw (trainer.py:41-50: SGD momentum .99
  wd 5e-4; Adam wd 0; AdamW betas (.9,.999) wd .01)
- epoch-granular LR policies via get_scheduler (networks.py:26-57)
- loss choice ce/bce/cd_loss/fl/miou/mmiou (trainer.py:92-114), with
  get_alpha class-frequency scan for focal/miou
- multi-scale train/infer over list-valued predictions (trainer.py:280-311)
- full checkpoint save/resume {epoch_id, best_val_acc, best_epoch_id,
  model, optimizer} in last_ckpt/best_ckpt (trainer.py:130-186)
- per-epoch train/val acc curves as .npy (trainer.py:266-274)
- best-by-val-mF1 selection (trainer.py:358-366)
- CDEvaluator: best-ckpt load + eval loop + colorized mask dump
  (evaluator.py:68-121)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.data.augment import eval_preprocess, train_augment_pair
from stcd_tpu.data.io import save_mask_png
from stcd_tpu.layers.modules import upsample_nearest
from stcd_tpu.losses import functional as L
from stcd_tpu.metrics.confusion import SegmentationMetric, confusion_matrix
from stcd_tpu.models.factory import define_G
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.schedules import get_scheduler
from stcd_tpu.train.state import TrainState
from stcd_tpu.utils.logging import ScalarLogger


@dataclasses.dataclass
class TrainerConfig:
    """The args object the reference trainer expects (trainer.py:24-127),
    promoted to a real config."""

    net_G: str = "base_transformer_pos_s4_dd8"
    n_class: int = 2
    embed_dim: int = 64
    img_size: int = 256
    lr: float = 0.01
    optimizer: str = "sgd"
    lr_policy: str = "linear"
    lr_decay_iters: int = 50
    max_epochs: int = 100
    loss: str = "ce"
    multi_scale_train: bool = False
    multi_scale_infer: bool = False
    multi_pred_weights: Sequence[float] = (0.5, 0.5, 0.5, 0.8, 1.0)
    checkpoint_dir: str = "checkpoints"
    vis_dir: str = "vis"
    batch_size: int = 8
    seed: int = 1337
    dtype: Any = None
    # On-device input handling. Datasets yield raw [0,1] images (the
    # data/datasets.py design split keeps the host pipeline pure IO);
    # ``normalize`` applies ImageNet mean/std inside the jitted step and
    # ``augment`` applies the reference's train-time photometric pipeline
    # (ColorJitter/grayscale/blur with one shared jitter coin per pair,
    # ref data/dataset.py:404-411) to training batches. The augmented
    # path always ends in normalization (as the reference's transform
    # chain does), regardless of ``normalize``.
    normalize: bool = True
    augment: bool = False
    # beyond parity: GPipe pipeline parallelism over a 'stage' mesh axis
    # (parallel/pipeline.py) for the BIT family's transformer-decoder
    # stack. pp_stages devices each hold dec_depth/pp_stages blocks;
    # pp_microbatches (default pp_stages) splits the batch. Exact: the
    # pipelined step equals the sequential one (tests/test_pipeline_parallel.py).
    pp_stages: int = 1
    pp_microbatches: int = 0
    # beyond parity: tensor parallelism over a 'model' mesh axis —
    # wide conv kernels + the transformer families' attention/MLP Dense
    # kernels sharded Megatron-style (parallel/mesh.py param_sharding);
    # tp_axis x pp_stages must divide the device count. A memory lever;
    # numerically equal to the replicated step (tests/test_trainer.py).
    tp_axis: int = 1


def get_alpha_from_loader(loader) -> np.ndarray:
    """Class-frequency scan (ref models/losses.py:38-59 get_alpha);
    delegates to the canonical stcd_tpu.losses implementation."""
    from stcd_tpu.losses.functional import get_alpha
    return get_alpha(loader)


def _make_optimizer(cfg: TrainerConfig, schedule) -> optax.GradientTransformation:
    if cfg.optimizer == "sgd":
        return optax.chain(optax.add_decayed_weights(5e-4),
                           optax.sgd(schedule, momentum=0.99))
    if cfg.optimizer == "adam":
        return optax.adam(schedule)
    if cfg.optimizer == "adamw":
        return optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=0.01)
    raise NotImplementedError(cfg.optimizer)


def _as_list(pred):
    return pred if isinstance(pred, (list, tuple)) else [pred]


class CDTrainer:
    """args-driven training harness over the define_G zoo."""

    def __init__(self, cfg: TrainerConfig, dataloaders: dict,
                 alpha: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.dataloaders = dataloaders
        self.model = define_G(cfg.net_G, n_class=cfg.n_class,
                              embed_dim=cfg.embed_dim, img_size=cfg.img_size,
                              dtype=cfg.dtype)
        steps_per_epoch = max(len(dataloaders["train"]), 1)
        schedule = get_scheduler(cfg.lr_policy, cfg.lr, steps_per_epoch,
                                 max_epochs=cfg.max_epochs,
                                 lr_decay_iters=cfg.lr_decay_iters)
        self.tx = _make_optimizer(cfg, schedule)
        # alpha (class-frequency weights for fl/miou) is computed lazily at
        # train time: an evaluator-only CDTrainer must not pay a full pass
        # over the training set for a loss it never evaluates.
        self.alpha = alpha
        self.ckpt = CheckpointManager(cfg.checkpoint_dir)
        self.logger = ScalarLogger(os.path.join(cfg.checkpoint_dir, "logs"))
        self.best_val_acc = 0.0
        self.best_epoch_id = 0
        self.epoch_to_start = 0
        self._build_steps()

    # --- loss dispatch (ref trainer.py:92-114) ---
    def _pxl_loss(self, preds, gt):
        cfg = self.cfg
        losses = []
        weights = list(cfg.multi_pred_weights)
        sel = preds if cfg.multi_scale_train else preds[-1:]
        wsel = weights[: len(sel)] if cfg.multi_scale_train else [1.0]
        for w, pred in zip(wsel, sel):
            g = gt
            if pred.shape[1] != gt.shape[1]:
                factor = gt.shape[1] // pred.shape[1]
                g = gt[:, ::factor, ::factor]  # nearest downsample
            if cfg.loss == "ce":
                losses.append(w * L.cross_entropy(pred, g[..., 0].astype(jnp.int32)))
            elif cfg.loss in ("bce", "cd_loss"):
                if pred.shape[-1] != g.shape[-1]:
                    # torch nn.BCELoss raises on this mismatch; silent
                    # broadcasting would train every channel toward the
                    # same 1-channel mask (review finding)
                    raise ValueError(
                        f"loss={cfg.loss!r} needs prediction channels == "
                        f"label channels (got {pred.shape[-1]} vs "
                        f"{g.shape[-1]}); use n_class=1 or loss='ce'")
                fn = L.bce_loss if cfg.loss == "bce" else L.cd_loss
                losses.append(w * fn(jax.nn.sigmoid(pred.astype(jnp.float32)), g))
            elif cfg.loss == "fl":
                losses.append(w * L.focal_loss(pred, g[..., 0], alpha=self.alpha,
                                               gamma=2.0, smooth=1e-5))
            elif cfg.loss == "miou":
                a = self.alpha / np.sum(self.alpha)
                losses.append(w * L.miou_loss(pred, g[..., 0], weight=1.0 - a,
                                              n_classes=self.cfg.n_class))
            elif cfg.loss == "mmiou":
                losses.append(w * L.mmiou_loss(pred, g[..., 0],
                                               n_classes=self.cfg.n_class))
            else:
                raise NotImplementedError(cfg.loss)
        return sum(losses)

    def _final_pred(self, preds):
        """multi_scale_infer: average all scales at full res (ref :280-295)."""
        if not self.cfg.multi_scale_infer or len(preds) == 1:
            return preds[-1]
        full = preds[-1]
        acc = jnp.zeros_like(full)
        for p in preds:
            if p.shape[1] != full.shape[1]:
                p = upsample_nearest(p, full.shape[1] // p.shape[1])
            acc = acc + p
        return acc / len(preds)

    def _pred_to_labels(self, pred):
        if self.cfg.n_class > 1:
            return jnp.argmax(pred, axis=-1)
        # models emit logits (the sigmoid lives in the loss): threshold the
        # probability at 0.5, i.e. the logit at 0 — not the logit at 0.5
        return (jax.nn.sigmoid(pred.astype(jnp.float32))
                >= 0.5).astype(jnp.int32)[..., 0]

    def _build_steps(self):
        model = self.model

        self._tp_mesh = None
        if self.cfg.tp_axis > 1:
            from stcd_tpu.parallel.mesh import create_mesh, set_active_mesh
            n_dev = len(jax.devices())
            denom = self.cfg.tp_axis * self.cfg.pp_stages
            self._tp_mesh = create_mesh(
                data=n_dev // denom, model=self.cfg.tp_axis,
                stage=self.cfg.pp_stages)
            # route ops/attention off the un-GSPMD-partitionable Pallas
            # kernel for this run (ADVICE r3)
            set_active_mesh(self._tp_mesh)

        pp_fwd = None
        if self.cfg.pp_stages > 1:
            from stcd_tpu.models.bit import BASETransformer
            from stcd_tpu.models.changeformer import (
                ChangeFormerV4, ChangeFormerV5, ChangeFormerV6)
            from stcd_tpu.models.changevig import _VIGSiam
            from stcd_tpu.parallel.mesh import create_mesh
            from stcd_tpu.parallel.pipeline import (
                bit_pipeline_forward, changeformer_pipeline_forward,
                changevig_pipeline_forward)

            n_micro = self.cfg.pp_microbatches or self.cfg.pp_stages
            mesh = self._tp_mesh if self._tp_mesh is not None else create_mesh(
                data=len(jax.devices()) // self.cfg.pp_stages,
                stage=self.cfg.pp_stages)

            if isinstance(model, BASETransformer):
                def pp_fwd(params, batch_stats, a, b, train, rng=None):
                    return bit_pipeline_forward(
                        model, {"params": params, "batch_stats": batch_stats},
                        a, b, mesh=mesh, n_micro=n_micro, train=train)
            elif isinstance(model, (ChangeFormerV4, ChangeFormerV5,
                                    ChangeFormerV6)):
                # ChangeFormer V4/V5/V6: heterogeneous GPipe over the MiT
                # encoder's stages (VERDICT r2 item 5); pp_stages must
                # equal the encoder stage count (4; V4: 5). V1-V3 build
                # their encoder via _tenc() and never read
                # pipeline_encoder — accepting them here would silently
                # train sequentially while reserving the 'stage' axis
                # (ADVICE r3), so they fall through to the loud reject.
                def pp_fwd(params, batch_stats, a, b, train, rng=None):
                    out = changeformer_pipeline_forward(
                        model, {"params": params, "batch_stats": batch_stats},
                        a, b, mesh=mesh, n_micro=n_micro, train=train,
                        rngs=None if rng is None else {"dropout": rng})
                    return out
            elif isinstance(model, _VIGSiam):
                # ChangeVIG family: heterogeneous GPipe over the pyramid
                # ViG encoder's [2,2,6,2] DeepGCN stages (VERDICT r3
                # item 6); pp_stages must equal the stage count (4).
                # Pipelined encoder stages run frozen-BN (documented
                # deviation, VIGBackbone.pipeline).
                def pp_fwd(params, batch_stats, a, b, train, rng=None):
                    return changevig_pipeline_forward(
                        model, {"params": params, "batch_stats": batch_stats},
                        a, b, mesh=mesh, n_micro=n_micro, train=train,
                        rngs=None if rng is None else {"dropout": rng})
            else:
                raise NotImplementedError(
                    "pp_stages > 1 pipelines the BIT transformer-decoder "
                    "stack, the ChangeFormer V4-V6 MiT encoder stages, or "
                    "the ChangeVIG [2,2,6,2] DeepGCN stages; "
                    f"net_G={self.cfg.net_G!r} has none (use the "
                    "'data'/'space' axes)")

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, a, b, label, rng):
            aug_rng, drop_rng = jax.random.split(rng)
            if self.cfg.augment:
                a, b = train_augment_pair(aug_rng, a, b)
            elif self.cfg.normalize:
                a, b = eval_preprocess(a), eval_preprocess(b)

            def loss_fn(params):
                if pp_fwd is not None:
                    preds, new_stats = pp_fwd(params, state.batch_stats,
                                              a, b, True, drop_rng)
                    mutated = {"batch_stats": new_stats}
                else:
                    preds, mutated = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        a, b, True, mutable=["batch_stats"],
                        rngs={"dropout": drop_rng})
                preds = _as_list(preds)
                return self._pxl_loss(preds, label), (mutated, preds)

            (loss, (mutated, preds)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads,
                                          batch_stats=mutated["batch_stats"])
            final = self._final_pred(preds)
            cm = confusion_matrix(self._pred_to_labels(final),
                                  label[..., 0].astype(jnp.int32), self.cfg.n_class)
            return state, loss, cm

        @jax.jit
        def eval_step(state, a, b, label):
            if self.cfg.normalize or self.cfg.augment:
                a, b = eval_preprocess(a), eval_preprocess(b)
            if pp_fwd is not None:
                preds = _as_list(pp_fwd(state.params, state.batch_stats,
                                        a, b, False))
            else:
                preds = _as_list(state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    a, b))
            final = self._final_pred(preds)
            cm = confusion_matrix(self._pred_to_labels(final),
                                  label[..., 0].astype(jnp.int32), self.cfg.n_class)
            return final, cm

        self.train_step = train_step
        self.eval_step = eval_step

    def _init_state(self) -> TrainState:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        zeros = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        variables = self.model.init(rng, zeros, zeros)
        state = TrainState.create_with_stats(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=self.tx)
        if self._tp_mesh is not None:
            # tensor-parallel placement: params through the sharding map,
            # stats/opt replicated (cfg.tp_axis; parallel/mesh.py)
            from stcd_tpu.parallel.mesh import place_train_state
            state = place_train_state(self._tp_mesh, state)
        return state

    @staticmethod
    def scores(metric: SegmentationMetric) -> dict:
        """ConfuseMatrixMeter.get_scores equivalent: acc/miou/mf1 + per-class."""
        f1 = metric.F1score()
        iou = metric.IntersectionOverUnion()
        return {
            "acc": float(metric.OverallAccuracy()),
            "miou": float(np.nanmean(iou)),
            "mf1": float(np.nanmean(f1)),
            "iou_0": float(iou[0]), "iou_1": float(iou[-1]),
            "F1_0": float(f1[0]), "F1_1": float(f1[-1]),
            "precision_1": float(metric.Precision()[-1]),
            "recall_1": float(metric.Recall()[-1]),
        }

    def _run_epoch(self, state, loader, rng, training: bool):
        from stcd_tpu.train.loops import _CM_FLUSH_PIXEL_BUDGET

        metric = SegmentationMetric(self.cfg.n_class)
        # device-side accumulation with a periodic flush, like
        # train/loops.py — a float(loss)/np.asarray(cm) per step blocks
        # the async dispatch pipeline (review finding); the loss is
        # likewise summed on device so the reported value is the epoch
        # MEAN, not the last batch's sample
        loss_sum, n_steps = None, 0
        cm_dev, px_acc = None, 0
        for batch in loader:
            a = jnp.asarray(batch["A"])
            b = jnp.asarray(batch["B"])
            label = jnp.asarray(batch["label"]).astype(jnp.float32)
            if training:
                rng, step_rng = jax.random.split(rng)
                state, loss_dev, cm = self.train_step(state, a, b, label,
                                                      step_rng)
                loss_sum = loss_dev if loss_sum is None else loss_sum + loss_dev
                n_steps += 1
            else:
                _, cm = self.eval_step(state, a, b, label)
            cm_dev = cm if cm_dev is None else cm_dev + cm
            px_acc += int(np.prod(label.shape[:3]))
            if px_acc >= _CM_FLUSH_PIXEL_BUDGET:  # int32 cells wrap past 2^31
                metric.confusionMatrix += np.asarray(cm_dev, np.float64)
                cm_dev, px_acc = None, 0
        if cm_dev is not None:
            metric.confusionMatrix += np.asarray(cm_dev, np.float64)
        mean_loss = float(loss_sum) / n_steps if n_steps else 0.0
        return state, metric, mean_loss, rng

    def _ensure_alpha(self):
        if self.cfg.loss in ("fl", "miou") and self.alpha is None:
            self.alpha = get_alpha_from_loader(self.dataloaders["train"])

    def close(self) -> None:
        """Release the process-global mesh registration (ADVICE r4).

        A tp_axis>1 trainer registers its mesh via set_active_mesh so
        ops/attention routes off the un-partitionable Pallas kernel;
        without this reset a LATER trainer/model built in the same
        process with tp_axis=1 would inherit the stale 'model' axis.
        set_active_mesh itself clears jit caches on size change, so the
        residual cost of a missed close() is a recompile, not a
        mis-route — but tests and multi-trainer processes should still
        call close() (train_models does so on exit)."""
        if self._tp_mesh is not None:
            from stcd_tpu.parallel.mesh import set_active_mesh
            set_active_mesh(None)

    def train_models(self) -> TrainState:
        """ref trainer.py:316-371 (train/val loop + curves + checkpoints).
        Resets the process-global mesh registration on exit (close())."""
        if self._tp_mesh is not None:
            # re-register in case an earlier close() (or another trainer)
            # reset the global since __init__
            from stcd_tpu.parallel.mesh import set_active_mesh
            set_active_mesh(self._tp_mesh)
        try:
            return self._train_models()
        finally:
            self.close()

    def _train_models(self) -> TrainState:
        cfg = self.cfg
        self._ensure_alpha()
        state = self._init_state()
        restored = self.ckpt.restore_last(state, "last_ckpt")
        train_curve, val_curve = [], []
        if restored is not None:
            state, last_epoch, self.best_val_acc, self.best_epoch_id = restored
            if self._tp_mesh is not None:
                # re-place AFTER restore: orbax returns host arrays with
                # no sharding, which would silently drop the tp_axis
                # placement from _init_state (r3 review finding)
                from stcd_tpu.parallel.mesh import place_train_state
                state = place_train_state(self._tp_mesh, state)
            self.epoch_to_start = last_epoch + 1
            # resume the saved accuracy curves instead of clobbering them
            # (ref trainer.py:268-274 appends to the loaded .npy history)
            for name, curve in (("train_acc.npy", train_curve),
                                ("val_acc.npy", val_curve)):
                path = os.path.join(cfg.checkpoint_dir, name)
                if os.path.exists(path):
                    curve.extend(
                        np.load(path)[:self.epoch_to_start].tolist())
        rng = jax.random.PRNGKey(cfg.seed + 1)
        for epoch_id in range(self.epoch_to_start, cfg.max_epochs):
            state, m, loss, rng = self._run_epoch(
                state, self.dataloaders["train"], rng, training=True)
            tr = self.scores(m)
            train_curve.append(tr["mf1"])
            self.logger.add_scalar("train/mf1", tr["mf1"], epoch_id)
            self.logger.add_scalar("train/loss", loss, epoch_id)

            state, m, _, rng = self._run_epoch(
                state, self.dataloaders["val"], rng, training=False)
            va = self.scores(m)
            val_curve.append(va["mf1"])
            for k, v in va.items():
                self.logger.add_scalar(f"val/{k}", v, epoch_id)

            if va["mf1"] > self.best_val_acc:
                self.best_val_acc = va["mf1"]
                self.best_epoch_id = epoch_id
                self.ckpt.save_last(state, epoch_id, self.best_val_acc,
                                    self.best_epoch_id, name="best_ckpt")
            self.ckpt.save_last(state, epoch_id, self.best_val_acc,
                                self.best_epoch_id, name="last_ckpt")
            np.save(os.path.join(cfg.checkpoint_dir, "train_acc.npy"),
                    np.asarray(train_curve, np.float32))
            np.save(os.path.join(cfg.checkpoint_dir, "val_acc.npy"),
                    np.asarray(val_curve, np.float32))
            self.logger.flush()
        return state


class CDEvaluator:
    """ref models/evaluator.py:19-193 / basic_model.py:9-74: best-ckpt load,
    eval loop with score report, colorized prediction dump."""

    def __init__(self, cfg: TrainerConfig, dataloader):
        self.cfg = cfg
        self.dataloader = dataloader
        self.trainer = CDTrainer(cfg, {"train": dataloader, "val": dataloader})

    def load(self, ckpt_name: str = "best_ckpt") -> TrainState:
        state = self.trainer._init_state()
        path = os.path.join(self.cfg.checkpoint_dir, ckpt_name)
        # weights-only: evaluation must not depend on the training run's
        # optimizer choice (a full restore_last would fail restoring e.g.
        # an adamw opt_state into an evaluator built with the default sgd)
        if os.path.exists(path):
            return self.trainer.ckpt.load_weights(state, path)
        # Crash fallback: a crash inside save_last's swap window leaves a
        # complete '<name>.new' that is loadable IN PLACE. The evaluator is
        # a READER — it must never run repair()'s renames, because a LIVE
        # trainer may own the swap window right now (repair would quarantine
        # its half-written '.new' and crash its save — review finding).
        # Only the training process itself repairs, at resume time.
        new_path = path + ".new"
        if os.path.exists(new_path):
            try:
                return self.trainer.ckpt.load_weights(state, new_path)
            except Exception as exc:
                raise FileNotFoundError(
                    f"no checkpoint {ckpt_name} in {self.cfg.checkpoint_dir} "
                    f"({new_path} exists but is not restorable: a save may "
                    f"be in progress, or it is a partial-crash leftover — "
                    f"run resume/repair from the training entry point)"
                ) from exc
        raise FileNotFoundError(f"no checkpoint {ckpt_name} in "
                                f"{self.cfg.checkpoint_dir}")

    def eval_models(self, ckpt_name: str = "best_ckpt",
                    save_vis: bool = True) -> dict:
        state = self.load(ckpt_name)
        metric = SegmentationMetric(self.cfg.n_class)
        os.makedirs(self.cfg.vis_dir, exist_ok=True)
        for batch in self.dataloader:
            names = batch.get("name")
            a = jnp.asarray(batch["A"])
            b = jnp.asarray(batch["B"])
            label = jnp.asarray(batch["label"]).astype(jnp.float32)
            final, cm = self.trainer.eval_step(state, a, b, label)
            metric.confusionMatrix += np.asarray(cm, np.float64)
            if save_vis and names is not None:
                preds = np.asarray(self.trainer._pred_to_labels(final))
                # spread class ids over [0, 1] so save_mask_png's x255
                # keeps them distinct — ids >= 2 would wrap mod 256
                # (binary n_class=2 stays the exact {0, 255} format)
                denom = max(self.cfg.n_class - 1, 1)
                for i, name in enumerate(names):
                    save_mask_png(preds[i].astype(np.float32) / denom,
                                  os.path.join(self.cfg.vis_dir, name))
        return CDTrainer.scores(metric)

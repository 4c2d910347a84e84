"""Jitted train/eval step builders for the three STCD stages.

Parity targets:
- make_seg_steps      <- train_sup.py:112-185 (UnetSeg + BCE_DICE on sigmoid)
- make_cd_steps       <- train_pse_cd.py:199-301 (SegCD; loss on sigmoid(diff))
- make_semi_cd_steps  <- train_stcd.py:388-512 (concat real+pseudo batches;
                         seg_loss_A + cd_loss + ct_loss)

TPU-native details:
- Augmentation + ImageNet normalization run INSIDE the jitted step
  (stcd_tpu.data.augment), fused by XLA ahead of the first conv.
- Steps are plain jitted functions over global arrays; under a Mesh with a
  'data' axis the batch arrives sharded and XLA inserts the gradient psum
  (the DataParallel equivalent, SURVEY.md §2.5).
- Per-batch confusion counts are computed on device (one-hot matmul) and
  returned with the loss, so eval needs no D2H per-pixel traffic (the
  reference ships whole prediction maps to CPU every iteration,
  train_pse_cd.py:230-236).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from stcd_tpu.data.augment import eval_preprocess, train_augment
from stcd_tpu.losses.functional import bce_dice, contrastive_loss
from stcd_tpu.metrics.confusion import confusion_matrix


def _augment_pair(key, *imgs, enabled: bool):
    """Independent augmentation per temporal image (ref data/dataset.py:404-411)."""
    if not enabled:
        return tuple(eval_preprocess(x) for x in imgs)
    keys = jax.random.split(key, len(imgs))
    return tuple(train_augment(k, x) for k, x in zip(keys, imgs))


def _maybe_remat(apply_fn, remat: bool):
    """Optional coarse rematerialization: with remat=True the forward's
    activations are not saved; the backward recomputes them (trades ~33%
    FLOPs for activation memory — lets batch sizes grow past HBM)."""
    if not remat:
        return apply_fn
    return jax.checkpoint(apply_fn)


def make_seg_steps(model, augment: bool = True, remat: bool = False):
    """Supervised segmentation (stage 1). Returns (train_step, eval_step).

    train_step(state, batch{image,label}, rng) -> (state, metrics)
    eval_step(state, batch) -> {cm} confusion counts at threshold 0.5
    (ref train_sup.py:163: sigmoid > 0.5).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        aug_key, drop_key = jax.random.split(rng)
        (image,) = _augment_pair(aug_key, batch["image"], enabled=augment)
        label = batch["label"].astype(jnp.float32)

        def fwd(params, image, drop_key):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                image, True, mutable=["batch_stats"],
                rngs={"dropout": drop_key})

        fwd = _maybe_remat(fwd, remat)

        def loss_fn(params):
            pred, mutated = fwd(params, image, drop_key)
            probs = jax.nn.sigmoid(pred.astype(jnp.float32))
            return bce_dice(probs, label), (mutated, probs)

        (loss, (mutated, probs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"])
        cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                              batch["label"].astype(jnp.int32), 2)
        return state, {"loss": loss, "cm": cm}

    @jax.jit
    def eval_step(state, batch):
        image = eval_preprocess(batch["image"])
        pred = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, image)
        probs = jax.nn.sigmoid(pred.astype(jnp.float32))
        cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                              batch["label"].astype(jnp.int32), 2)
        return {"cm": cm, "probs": probs}

    return train_step, eval_step


def make_cd_steps(model, augment: bool = True, remat: bool = False):
    """Pseudo-change CD pretrain (stage 2; ref train_pse_cd.py:199-301).

    train_step(state, batch{A,B,label}, rng); loss = BCE_DICE(sigmoid(diff)).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        aug_key, drop_key = jax.random.split(rng)
        a, b = _augment_pair(aug_key, batch["A"], batch["B"], enabled=augment)
        label = batch["label"].astype(jnp.float32)

        def fwd(params, a, b, drop_key):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                a, b, True, mutable=["batch_stats"],
                rngs={"dropout": drop_key})

        fwd = _maybe_remat(fwd, remat)

        def loss_fn(params):
            (seg_a, seg_b, diff), mutated = fwd(params, a, b, drop_key)
            probs = jax.nn.sigmoid(diff.astype(jnp.float32))
            return bce_dice(probs, label), (mutated, probs)

        (loss, (mutated, probs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads, batch_stats=mutated["batch_stats"])
        cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                              batch["label"].astype(jnp.int32), 2)
        return state, {"loss": loss, "cm": cm}

    @jax.jit
    def eval_step(state, batch):
        a = eval_preprocess(batch["A"])
        b = eval_preprocess(batch["B"])
        seg_a, seg_b, diff = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, a, b)
        probs = jax.nn.sigmoid(diff.astype(jnp.float32))
        cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                              batch["label"].astype(jnp.int32), 2)
        return {"cm": cm, "probs": probs}

    return train_step, eval_step


def make_semi_cd_steps(model, augment: bool = True, remat: bool = False):
    """STCD fine-tune (stage 3; ref train_stcd.py:388-512).

    Batch carries both a synthesized pseudo-change pair (A, B with labels
    s_label_A, c_label) and a real pair (CA, CB, CL). Real+pseudo are
    concatenated along batch (ref :421-423), one SegCD forward, then
    loss = seg_loss_A + cd_loss + ct_loss (ref :445).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        aug_key, drop_key = jax.random.split(rng)
        a, b, ca, cb = _augment_pair(aug_key, batch["A"], batch["B"],
                                     batch["CA"], batch["CB"], enabled=augment)
        n = batch["A"].shape[0]
        data_a = jnp.concatenate([a, ca], axis=0)
        data_b = jnp.concatenate([b, cb], axis=0)
        s_label_a = batch["s_label_A"].astype(jnp.float32)
        cd_l = batch["c_label"].astype(jnp.float32)
        cl = batch["CL"].astype(jnp.float32)
        labels = jnp.concatenate([cd_l, cl], axis=0)

        def fwd(params, a_, b_, drop_key):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                a_, b_, True, mutable=["batch_stats"],
                rngs={"dropout": drop_key})

        fwd = _maybe_remat(fwd, remat)

        def loss_fn(params):
            (seg_a, seg_b, diff), mutated = fwd(params, data_a, data_b,
                                                drop_key)
            seg_probs = jax.nn.sigmoid(seg_a.astype(jnp.float32))
            cd_probs = jax.nn.sigmoid(diff.astype(jnp.float32))
            seg_loss_a = bce_dice(seg_probs[:n], s_label_a)
            cd_loss_v = bce_dice(cd_probs, labels)
            ct_loss = contrastive_loss(cd_probs, cd_l, cl)
            return seg_loss_a + cd_loss_v + ct_loss, (
                mutated, cd_probs, seg_loss_a, cd_loss_v, ct_loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        mutated, cd_probs, seg_loss_a, cd_loss_v, ct_loss = aux
        state = state.apply_gradients(grads=grads, batch_stats=mutated["batch_stats"])
        cm = confusion_matrix((cd_probs[:n] > 0.5).astype(jnp.int32),
                              batch["c_label"].astype(jnp.int32), 2)
        return state, {"loss": loss, "seg_loss": seg_loss_a,
                       "cd_loss": cd_loss_v, "ct_loss": ct_loss, "cm": cm}

    _, eval_step = make_cd_steps(model, augment=False)
    return train_step, eval_step

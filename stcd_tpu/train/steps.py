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

from stcd_tpu.data.augment import (eval_preprocess, train_augment,
                                   train_augment_pair)
from stcd_tpu.losses.functional import bce_dice, contrastive_loss
from stcd_tpu.metrics.confusion import confusion_matrix


def _augment_pairs(key, pairs, enabled: bool):
    """Augment a list of (img_a, img_b, jitter_p) temporal pairs: the
    ColorJitter apply-coin is SHARED within each pair (ref
    data/dataset.py:241-243 — both images jittered or neither; the
    synthesized stage-3 pair uses p=0.8, ref :354-356); grayscale/blur
    stay independent per image."""
    if not enabled:
        return tuple(eval_preprocess(x) for a, b, _ in pairs for x in (a, b))
    keys = jax.random.split(key, len(pairs))
    out = []
    for k, (a, b, jp) in zip(keys, pairs):
        out.extend(train_augment_pair(k, a, b, jitter_p=jp))
    return tuple(out)


def _maybe_remat(apply_fn, remat: bool):
    """Optional coarse rematerialization: with remat=True the forward's
    activations are not saved; the backward recomputes them (trades ~33%
    FLOPs for activation memory — lets batch sizes grow past HBM)."""
    if not remat:
        return apply_fn
    return jax.checkpoint(apply_fn)


def _split_micro(accum: int, *arrays):
    """Reshape leading batch dim N -> (accum, N // accum) for lax.scan."""
    n = arrays[0].shape[0]
    assert n % accum == 0, f"batch {n} not divisible by accum_steps {accum}"
    return tuple(a.reshape(accum, n // accum, *a.shape[1:]) for a in arrays)


def _accum_update(state, grad_fn, micro_xs, rng, accum: int, n_extras: int):
    """Gradient accumulation over microbatches via lax.scan.

    grad_fn(params, batch_stats, key, *micro) ->
        ((loss, (new_batch_stats, cm, extras_tuple)), grads)
    Gradients are averaged over microbatches (equivalent to one large
    batch for the mean-reduced losses); BatchNorm running stats update
    sequentially per microbatch (= training on that many smaller batches,
    documented deviation from a monolithic large batch). Peak activation
    memory is one microbatch."""
    zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    init = (state.batch_stats, zeros_g, jnp.zeros((), jnp.float32),
            jnp.zeros((2, 2), jnp.int32),
            tuple(jnp.zeros((), jnp.float32) for _ in range(n_extras)), rng)

    def body(carry, xs):
        bs, gacc, lacc, cmacc, eacc, key = carry
        key, sub = jax.random.split(key)
        (loss, (bs2, cm, extras)), grads = grad_fn(state.params, bs, sub, *xs)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
        eacc = tuple(e + x for e, x in zip(eacc, extras))
        return (bs2, gacc, lacc + loss, cmacc + cm, eacc, key), None

    (bs, gacc, loss, cm, extras, _), _ = jax.lax.scan(body, init, micro_xs)
    grads = jax.tree_util.tree_map(lambda g: g / accum, gacc)
    state = state.apply_gradients(grads=grads, batch_stats=bs)
    return state, loss / accum, cm, tuple(e / accum for e in extras)


def make_seg_steps(model, augment: bool = True, remat: bool = False,
                   accum_steps: int = 1):
    """Supervised segmentation (stage 1). Returns (train_step, eval_step).

    train_step(state, batch{image,label}, rng) -> (state, metrics)
    eval_step(state, batch) -> {cm} confusion counts at threshold 0.5
    (ref train_sup.py:163: sigmoid > 0.5).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        aug_key, drop_key = jax.random.split(rng)
        image = (train_augment(aug_key, batch["image"]) if augment
                 else eval_preprocess(batch["image"]))
        label = batch["label"].astype(jnp.float32)

        if accum_steps > 1:
            def micro_loss(params, bs, key, mi, ml):
                def fwd(p):
                    return state.apply_fn(
                        {"params": p, "batch_stats": bs}, mi, True,
                        mutable=["batch_stats"], rngs={"dropout": key})
                pred, mutated = _maybe_remat(fwd, remat)(params)
                probs = jax.nn.sigmoid(pred.astype(jnp.float32))
                cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                                      ml.astype(jnp.int32), 2)
                return bce_dice(probs, ml), (mutated["batch_stats"], cm, ())

            grad_fn = jax.value_and_grad(micro_loss, has_aux=True)
            micro = _split_micro(accum_steps, image, label)
            state, loss, cm, _ = _accum_update(state, grad_fn, micro, drop_key,
                                               accum_steps, 0)
            return state, {"loss": loss, "cm": cm}

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


def make_cd_steps(model, augment: bool = True, remat: bool = False,
                  accum_steps: int = 1):
    """Pseudo-change CD pretrain (stage 2; ref train_pse_cd.py:199-301).

    train_step(state, batch{A,B,label}, rng); loss = BCE_DICE(sigmoid(diff)).
    ``accum_steps > 1`` accumulates gradients over that many microbatches
    (batch leading dim must divide) for large effective batches in one
    microbatch's activation memory.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        aug_key, drop_key = jax.random.split(rng)
        a, b = _augment_pairs(aug_key, [(batch["A"], batch["B"], 0.5)],
                              enabled=augment)
        label = batch["label"].astype(jnp.float32)

        if accum_steps > 1:
            def micro_loss(params, bs, key, ma, mb, ml):
                def fwd(p):
                    return state.apply_fn(
                        {"params": p, "batch_stats": bs}, ma, mb, True,
                        mutable=["batch_stats"], rngs={"dropout": key})
                (_, _, diff), mutated = _maybe_remat(fwd, remat)(params)
                probs = jax.nn.sigmoid(diff.astype(jnp.float32))
                cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                                      ml.astype(jnp.int32), 2)
                return bce_dice(probs, ml), (mutated["batch_stats"], cm, ())

            grad_fn = jax.value_and_grad(micro_loss, has_aux=True)
            micro = _split_micro(accum_steps, a, b, label)
            state, loss, cm, _ = _accum_update(state, grad_fn, micro, drop_key,
                                               accum_steps, 0)
            return state, {"loss": loss, "cm": cm}

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


def make_semi_cd_steps(model, augment: bool = True, remat: bool = False,
                       accum_steps: int = 1):
    """STCD fine-tune (stage 3; ref train_stcd.py:388-512).

    Batch carries both a synthesized pseudo-change pair (A, B with labels
    s_label_A, c_label) and a real pair (CA, CB, CL). Real+pseudo are
    concatenated along batch (ref :421-423), one SegCD forward, then
    loss = seg_loss_A + cd_loss + ct_loss (ref :445).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        aug_key, drop_key = jax.random.split(rng)
        a, b, ca, cb = _augment_pairs(
            aug_key, [(batch["A"], batch["B"], 0.5),
                      (batch["CA"], batch["CB"], 0.8)], enabled=augment)
        n = batch["A"].shape[0]

        if accum_steps > 1:
            def micro_loss(params, bs, key, ma, mb, mca, mcb, msl, mcdl, mcl):
                m = ma.shape[0]
                da = jnp.concatenate([ma, mca], axis=0)
                db = jnp.concatenate([mb, mcb], axis=0)
                lab = jnp.concatenate([mcdl, mcl], axis=0)

                def fwd(p):
                    return state.apply_fn(
                        {"params": p, "batch_stats": bs}, da, db, True,
                        mutable=["batch_stats"], rngs={"dropout": key})
                (seg_a, _, diff), mutated = _maybe_remat(fwd, remat)(params)
                seg_probs = jax.nn.sigmoid(seg_a.astype(jnp.float32))
                cd_probs = jax.nn.sigmoid(diff.astype(jnp.float32))
                seg_loss_a = bce_dice(seg_probs[:m], msl)
                cd_loss_v = bce_dice(cd_probs, lab)
                ct_loss = contrastive_loss(cd_probs, mcdl, mcl)
                # ref train_stcd.py:436-437: train CM over the FULL
                # concatenated batch (synthesized + real halves)
                cm = confusion_matrix((cd_probs > 0.5).astype(jnp.int32),
                                      lab.astype(jnp.int32), 2)
                return seg_loss_a + cd_loss_v + ct_loss, (
                    mutated["batch_stats"], cm,
                    (seg_loss_a, cd_loss_v, ct_loss))

            grad_fn = jax.value_and_grad(micro_loss, has_aux=True)
            micro = _split_micro(
                accum_steps, a, b, ca, cb,
                batch["s_label_A"].astype(jnp.float32),
                batch["c_label"].astype(jnp.float32),
                batch["CL"].astype(jnp.float32))
            state, loss, cm, extras = _accum_update(
                state, grad_fn, micro, drop_key, accum_steps, 3)
            return state, {"loss": loss, "seg_loss": extras[0],
                           "cd_loss": extras[1], "ct_loss": extras[2],
                           "cm": cm}

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
        # ref train_stcd.py:436-437: train CM over the FULL concatenated
        # batch (synthesized + real halves)
        cm = confusion_matrix((cd_probs > 0.5).astype(jnp.int32),
                              labels.astype(jnp.int32), 2)
        return state, {"loss": loss, "seg_loss": seg_loss_a,
                       "cd_loss": cd_loss_v, "ct_loss": ct_loss, "cm": cm}

    _, eval_step = make_cd_steps(model, augment=False)
    return train_step, eval_step

"""Golden TRAINING-dynamics parity vs torch: N full optimizer steps of the
flagship SegCD stack match a torch twin end-to-end.

Forward parity is covered by test_convert/test_golden_*; this closes the
loop on everything behind the forward: autodiff gradients (conv/BN/pool/
resize/abs/min), train-mode BatchNorm batch statistics + running-stat
updates, the BCE+Dice loss gradient (ref train_pse_cd.py:436-462), Adam
(ref train_sup.py:307) and the per-iteration Poly(0.9) schedule (ref
train_sup.py:269-286) — by running the same weights, same batches, same
lr sequence through torch and through make_cd_steps and comparing the
per-step losses and the post-training eval forward.

Train-mode BN semantics note (caught by this very test): the reference
runs encoder(A) then encoder(B) sequentially (unet/model.py:319-320), so
each temporal image is normalized with its OWN batch statistics and the
running stats update twice per step. Our TPU-first default folds A/B into
one 2N batch (joint statistics, one update). Both are exercised here:
``siamese_batched=False`` reproduces the reference bit-for-bit; the folded
default is validated against a torch twin that concatenates the pair.

ORDERING CONSTRAINT (do not "simplify"): all JAX computation runs BEFORE
the torch training loop. On this AVX512-BF16 host, once torch executes a
training step (BCE backward + optimizer), XLA:CPU conv execution in the
same process silently degrades to reduced-precision (~3e-3 abs error —
shared oneDNN process state; torch no_grad forwards do NOT trigger it).
That, plus jax_default_matmul_precision=highest in conftest (XLA:CPU
otherwise runs f32 convs as bf16 passes on this host), keeps both sides
at true f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _poly_lr(step, base=1e-3, total=4, power=0.9):
    return base * max(1.0 - step / total, 0.0) ** power


def _bce_dice_torch(probs, label):
    bce = torch.nn.functional.binary_cross_entropy(probs, label,
                                                   reduction="mean")
    m1, m2 = probs.reshape(-1), label.reshape(-1)
    inter = (m1 * m2).sum()
    return bce + 1 - (2.0 * inter + 1.0) / (m1.sum() + m2.sum() + 1.0)


def _batches(seed, n_steps=4, bs=2, hw=32):
    rng = np.random.default_rng(seed)
    eval_pair = (rng.uniform(size=(1, 3, hw, hw)).astype(np.float32),
                 rng.uniform(size=(1, 3, hw, hw)).astype(np.float32))
    return eval_pair, [
        dict(A=rng.uniform(size=(bs, 3, hw, hw)).astype(np.float32),
             B=rng.uniform(size=(bs, 3, hw, hw)).astype(np.float32),
             label=(rng.uniform(size=(bs, 1, hw, hw)) > 0.7).astype(np.float32))
        for _ in range(n_steps)
    ]


def _imagenet_norm(x):
    """The train step normalizes inputs with ImageNet mean/std (our
    augment.eval_preprocess == ref data/dataset.py:129-130); mirror it."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return (x - mean) / std


def _torch_train(tv, batches, forward):
    opt = torch.optim.Adam(tv.parameters(), lr=1e-3, betas=(0.9, 0.999))
    losses = []
    tv.train()
    for t, batch in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = _poly_lr(t, total=len(batches))
        opt.zero_grad()
        diff = forward(tv, _imagenet_norm(torch.from_numpy(batch["A"])),
                       _imagenet_norm(torch.from_numpy(batch["B"])))
        probs = torch.sigmoid(diff)
        loss = _bce_dice_torch(probs, torch.from_numpy(batch["label"]))
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _ours_train_and_eval(model, params, stats, batches, eval_pair):
    from stcd_tpu.train.state import TrainState, adam_poly
    from stcd_tpu.train.steps import make_cd_steps

    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        tx=adam_poly(1e-3, num_epochs=2, iters_per_epoch=len(batches) // 2))
    train_step, _ = make_cd_steps(model, augment=False)
    losses = []
    for t, batch in enumerate(batches):
        jb = {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in batch.items()}
        state, metrics = train_step(state, jb, jax.random.PRNGKey(t))
        losses.append(float(metrics["loss"]))
    a, b = eval_pair
    got = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(a.transpose(0, 2, 3, 1)),
                      jnp.asarray(b.transpose(0, 2, 3, 1)))
    return losses, [np.asarray(o) for o in got]


def _torch_eval(tv, eval_pair):
    a, b = eval_pair
    tv.eval()
    with torch.no_grad():
        return tv(torch.from_numpy(a), torch.from_numpy(b))


def _setup():
    from test_convert import TVSegCD
    from stcd_tpu.convert.torch_to_flax import convert_unetseg

    torch.manual_seed(7)
    tv = TVSegCD()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_unetseg(sd, (2, 2, 2, 2))
    return tv, params, stats


def _compare(our_losses, torch_losses, got, want, eval_atol=1e-2):
    # Step 0 is a pure forward+loss on identical weights: tight.
    np.testing.assert_allclose(our_losses[0], torch_losses[0], atol=1e-5)
    # Later steps drift by design: Adam's per-param rescaling moves params
    # whose gradient is near zero by ~±lr regardless of magnitude, so fp32
    # noise in tiny gradients becomes O(lr)=1e-3 weight differences. The
    # check is that the trajectories track, not that they are bitwise equal.
    np.testing.assert_allclose(our_losses, torch_losses, atol=2e-3,
                               err_msg=f"ours={our_losses} torch={torch_losses}")
    for i, (o, t) in enumerate(zip(got, want)):
        np.testing.assert_allclose(o, t.numpy().transpose(0, 2, 3, 1),
                                   atol=eval_atol, err_msg=f"eval output {i}")


def test_training_dynamics_reference_semantics():
    """siamese_batched=False: bit-faithful reference dynamics (per-image
    train-mode BN stats, two sequential running-stat updates per step)."""
    from stcd_tpu.models import SegCD

    tv, params, stats = _setup()
    eval_pair, batches = _batches(21)
    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(64, 32, 24, 16, 8), siamese_batched=False)
    our_losses, got = _ours_train_and_eval(model, params, stats, batches,
                                           eval_pair)
    torch_losses = _torch_train(tv, batches, lambda m, a, b: m(a, b)[2])
    want = _torch_eval(tv, eval_pair)
    _compare(our_losses, torch_losses, got, want)


def test_training_dynamics_folded_siamese():
    """The TPU-default folded 2N-batch Siamese pass, against a torch twin
    that concatenates the pair (joint train-mode BN statistics)."""
    from stcd_tpu.models import SegCD

    tv, params, stats = _setup()
    eval_pair, batches = _batches(33)
    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(64, 32, 24, 16, 8))
    our_losses, got = _ours_train_and_eval(model, params, stats, batches,
                                           eval_pair)

    def folded_forward(m, a, b):
        n = a.shape[0]
        d = m.decoder(m.encoder(torch.cat([a, b], 0)))
        masks = m.segmentation_head(d)
        d1, d2 = d[:n], d[n:]
        m1, m2 = masks[:n], masks[n:]
        diffea = m.segmentation_head(torch.abs(d1 - d2))
        return torch.min(diffea, torch.abs(m1 - m2))

    torch_losses = _torch_train(tv, batches, folded_forward)
    want = _torch_eval(tv, eval_pair)
    _compare(our_losses, torch_losses, got, want)


def test_training_dynamics_semi_cd_stage3():
    """Stage-3 `train_semi_cd` dynamics (ref train_stcd.py:388-462): real and
    pseudo pairs concatenated along batch, loss = seg_loss_A + cd_loss +
    ct_loss with the masked-MSE contrastive term (:334-385). Validates the
    3-term composite gradient incl. the agreement/disagreement masks."""
    from stcd_tpu.models import SegCD
    from stcd_tpu.train.state import TrainState, adam_poly
    from stcd_tpu.train.steps import make_semi_cd_steps

    tv, params, stats = _setup()
    rng = np.random.default_rng(55)
    n_steps, bs, hw = 4, 2, 32
    batches = []
    for _ in range(n_steps):
        mk = lambda: rng.uniform(size=(bs, 3, hw, hw)).astype(np.float32)
        lab = lambda: (rng.uniform(size=(bs, 1, hw, hw)) > 0.7).astype(np.float32)
        batches.append(dict(A=mk(), B=mk(), CA=mk(), CB=mk(),
                            s_label_A=lab(), c_label=lab(), CL=lab()))
    eval_pair = (rng.uniform(size=(1, 3, hw, hw)).astype(np.float32),
                 rng.uniform(size=(1, 3, hw, hw)).astype(np.float32))

    # ---- ours first (JAX before any torch training; see module docstring)
    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(64, 32, 24, 16, 8), siamese_batched=False)
    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        tx=adam_poly(1e-3, num_epochs=2, iters_per_epoch=n_steps // 2))
    train_step, _ = make_semi_cd_steps(model, augment=False)
    our = {"loss": [], "seg_loss": [], "cd_loss": [], "ct_loss": []}
    for t, batch in enumerate(batches):
        jb = {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in batch.items()}
        state, metrics = train_step(state, jb, jax.random.PRNGKey(t))
        for k in our:
            our[k].append(float(metrics[k]))
    a, b = eval_pair
    got = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.asarray(a.transpose(0, 2, 3, 1)),
                      jnp.asarray(b.transpose(0, 2, 3, 1)))
    got = [np.asarray(o) for o in got]

    # ---- torch twin (ref train_stcd.py:421-456)
    opt = torch.optim.Adam(tv.parameters(), lr=1e-3, betas=(0.9, 0.999))
    tw = {"loss": [], "seg_loss": [], "cd_loss": [], "ct_loss": []}
    tv.train()
    for t, batch in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = _poly_lr(t, total=n_steps)
        opt.zero_grad()
        A, B, CA, CB = (torch.from_numpy(batch[k]) for k in ("A", "B", "CA", "CB"))
        sA = torch.from_numpy(batch["s_label_A"])
        cdl = torch.from_numpy(batch["c_label"])
        cl = torch.from_numpy(batch["CL"])
        data_a = _imagenet_norm(torch.cat([A, CA], 0))
        data_b = _imagenet_norm(torch.cat([B, CB], 0))
        seg_a, _, diff = tv(data_a, data_b)
        seg_probs = torch.sigmoid(seg_a)
        cd_probs = torch.sigmoid(diff)
        seg_loss_a = _bce_dice_torch(seg_probs[:bs], sA)
        cd_loss = _bce_dice_torch(cd_probs, torch.cat([cdl, cl], 0))
        cd_pred, pse_pred = cd_probs[:bs], cd_probs[bs:]
        M = (cdl == cl).float()
        N = 1.0 - M
        loss_pos = ((pse_pred - cd_pred) ** 2 * M).sum() / (M.sum() + 1e-8)
        loss_neg = ((pse_pred - (cd_pred - 1).abs()) ** 2 * N).sum() / (N.sum() + 1e-8)
        ct_loss = loss_pos + loss_neg
        loss = seg_loss_a + cd_loss + ct_loss
        loss.backward()
        opt.step()
        for k, v in (("loss", loss), ("seg_loss", seg_loss_a),
                     ("cd_loss", cd_loss), ("ct_loss", ct_loss)):
            tw[k].append(float(v.detach()))
    want = _torch_eval(tv, eval_pair)

    for k in ("loss", "seg_loss", "cd_loss", "ct_loss"):
        np.testing.assert_allclose(our[k][0], tw[k][0], atol=1e-5,
                                   err_msg=f"step-0 {k}")
        np.testing.assert_allclose(our[k], tw[k], atol=2e-3,
                                   err_msg=f"{k}: ours={our[k]} torch={tw[k]}")
    for i, (o, t) in enumerate(zip(got, want)):
        np.testing.assert_allclose(o, t.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-2, err_msg=f"eval output {i}")


def test_training_dynamics_seg_stage1():
    """Stage-1 `train_sup` dynamics (ref train_sup.py:112-185): UnetSeg
    single-image segmentation with BCE+Dice, Adam + per-iter Poly."""
    from test_convert import TVSegCD
    from stcd_tpu.convert.torch_to_flax import convert_unetseg
    from stcd_tpu.models import UnetSeg
    from stcd_tpu.train.state import TrainState, adam_poly
    from stcd_tpu.train.steps import make_seg_steps

    torch.manual_seed(9)
    tv = TVSegCD()  # encoder+decoder+head == UnetSeg applied to one image
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_unetseg(sd, (2, 2, 2, 2))

    rng = np.random.default_rng(77)
    n_steps, bs, hw = 4, 2, 32
    batches = [
        dict(image=rng.uniform(size=(bs, 3, hw, hw)).astype(np.float32),
             label=(rng.uniform(size=(bs, 1, hw, hw)) > 0.6).astype(np.float32))
        for _ in range(n_steps)
    ]

    # ---- ours first (JAX before torch training; see module docstring)
    model = UnetSeg(encoder_name="resnet18", classes=1,
                    decoder_channels=(64, 32, 24, 16, 8))
    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        tx=adam_poly(1e-3, num_epochs=2, iters_per_epoch=n_steps // 2))
    train_step, _ = make_seg_steps(model, augment=False)
    our_losses = []
    for t, batch in enumerate(batches):
        jb = {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in batch.items()}
        state, metrics = train_step(state, jb, jax.random.PRNGKey(t))
        our_losses.append(float(metrics["loss"]))

    # ---- torch twin: UnetSeg forward = head(decoder(encoder(x)))
    opt = torch.optim.Adam(tv.parameters(), lr=1e-3, betas=(0.9, 0.999))
    torch_losses = []
    tv.train()
    for t, batch in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = _poly_lr(t, total=n_steps)
        opt.zero_grad()
        x = _imagenet_norm(torch.from_numpy(batch["image"]))
        pred = tv.segmentation_head(tv.decoder(tv.encoder(x)))
        probs = torch.sigmoid(pred)
        loss = _bce_dice_torch(probs, torch.from_numpy(batch["label"]))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    np.testing.assert_allclose(our_losses[0], torch_losses[0], atol=1e-5)
    np.testing.assert_allclose(our_losses, torch_losses, atol=5e-3,
                               err_msg=f"ours={our_losses} torch={torch_losses}")

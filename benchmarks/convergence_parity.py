"""End-to-end convergence parity: the reference's own SegCD vs stcd_tpu.

VERDICT r1 weak #5: the +-0.1 F1 accuracy contract (BASELINE.json) has
never been exercised end-to-end — no LEVIR/WHU data or weights exist on
this host. This harness is the strongest substitute available: train the
REFERENCE'S OWN SegCD (its actual decoders/unet/model.py:286-332 +
decoder.py + base/, loaded via tests/_ref_stubs; only the encoder is a
torchvision-faithful twin since torchvision is absent) and our SegCD
from IDENTICAL initial weights on IDENTICAL batches of a learnable
synthetic change-detection task, with the reference's stage-2 training
semantics (Adam lr=1e-3, per-iter Poly(0.9) — ref train_pse_cd.py:385-402,
BCE_DICE on sigmoid(diff) — :451-462, eval threshold 0.5 best-by-IoU —
:269-301), and compare the converged val F1/IoU.

Three sides are trained:
  torch       — the reference code path (sequential encoder(A), encoder(B):
                per-image train-mode BN batch stats)
  jax_seq     — our SegCD(siamese_batched=False), the bit-faithful mode
  jax_folded  — our TPU-first 2N-batched Siamese default (joint BN stats)

Each side runs in its own subprocess: torch training corrupts XLA:CPU
conv precision process-wide on this host (CLAUDE.md), and separate
processes also guarantee no accidental state sharing.

Run:  python benchmarks/convergence_parity.py [--epochs 10 --n-train 48]
Prints one JSON line with per-side best F1/IoU and the deltas.
tests/test_convergence_parity.py runs a reduced configuration under the
slow marker.

``--stage 3`` switches both sides to the STCD fine-tune semantics (ref
train_stcd.py:388-462): per-step batches concatenate a synthesized
pseudo-change pair with a real pair, and the loss is seg_loss_A +
cd_loss + ct_loss where ct_loss is the REFERENCE'S OWN contrastive_loss
(:334-385) loaded from /root/reference/train_stcd.py itself
(_ref_stubs.load_ref_train_stcd), as is its BCE_DICE (:653-672).

``--stage 1`` switches to the supervised segmentation pretrain semantics
(ref train_sup.py:112-185): the reference's own UnetSeg
(decoders/unet/model.py:109-171) on single images, sigmoid + BCE_DICE
(:133-135, :327-338), eval threshold 0.5 best-by-IoU (:163-180).  Stage
1 has no Siamese fold, so the jax side has one mode and the report keys
are jax_best_f1/delta_f1.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- data

def _gen_pair(rng, size):
    """One learnable CD pair: shared textured background, bright
    'building' rectangles; change = rects removed from A or added in B
    (the synthetic analogue of the WHU pseudo-change pairs, ref
    data/dataset.py:299-313)."""
    base = rng.uniform(0.25, 0.5) + rng.normal(0.0, 0.04, (size, size, 1))
    bg = np.clip(np.broadcast_to(base, (size, size, 3)).copy()
                 + rng.normal(0.0, 0.02, (size, size, 3)), 0, 1)
    a = bg + rng.normal(0.0, 0.01, bg.shape)
    b = bg + rng.normal(0.0, 0.01, bg.shape)
    label = np.zeros((size, size), np.float32)

    def rect():
        h, w = rng.integers(8, 22, 2)
        return (rng.integers(0, size - h), rng.integers(0, size - w), h, w)

    def paint(img, r, color):
        y, x, h, w = r
        img[y:y + h, x:x + w] = color + rng.normal(0.0, 0.02, (h, w, 3))

    for _ in range(rng.integers(1, 4)):
        r, color = rect(), rng.uniform(0.65, 0.95, 3)
        paint(a, r, color)
        if rng.uniform() < 0.5:
            paint(b, r, color)
        else:
            label[r[0]:r[0] + r[2], r[1]:r[1] + r[3]] = 1.0
    for _ in range(rng.integers(0, 3)):
        r, color = rect(), rng.uniform(0.65, 0.95, 3)
        paint(b, r, color)
        label[r[0]:r[0] + r[2], r[1]:r[1] + r[3]] = 1.0

    return (np.clip(a, 0, 1).astype(np.float32).transpose(2, 0, 1),
            np.clip(b, 0, 1).astype(np.float32).transpose(2, 0, 1),
            label[None])


def gen_data(path, n_train, n_val, size, epochs, bs, seed):
    rng = np.random.default_rng(seed)
    def batch(n):
        trip = [_gen_pair(rng, size) for _ in range(n)]
        return tuple(np.stack([t[i] for t in trip]) for i in range(3))
    tr_a, tr_b, tr_l = batch(n_train)
    va_a, va_b, va_l = batch(n_val)
    iters = n_train // bs
    order = np.stack([rng.permutation(n_train)[:iters * bs].reshape(iters, bs)
                      for _ in range(epochs)])
    np.savez(path, train_A=tr_a, train_B=tr_b, train_label=tr_l,
             val_A=va_a, val_B=va_b, val_label=va_l,
             order=order.astype(np.int32))


# ------------------------------------------------------------- metrics

def _f1_iou(tp, fp, fn):
    """Class-1 F1/IoU — same formulas the ref SegmentationMetric derives
    from its confusion matrix (train_pse_cd.py:276-277)."""
    f1 = 2.0 * tp / max(2.0 * tp + fp + fn, 1e-12)
    iou = tp / max(tp + fp + fn, 1e-12)
    return f1, iou


def _poly_lr(step, total, base=1e-3, power=0.9):
    # ref Poly per-iteration factor (train_pse_cd.py:385-402); proven
    # equal to train.state.adam_poly in test_golden_training_dynamics.
    return base * max(1.0 - step / total, 0.0) ** power


DEC_CHANNELS = (64, 32, 24, 16, 8)

# --deployed (VERDICT r2 item 2): the jax side runs ON THE REAL CHIP with
# the deployed perf stack — bf16 compute dtype (params/BN fp32), the fused
# decoder (SegCD default), uint8 H2D transfer — while torch stays the
# fp32-CPU reference. Input images are pre-quantized to the uint8 grid at
# generation time so both sides see bit-identical pixels. Augmentation
# stays off on both sides (the parity protocol is deterministic); the
# Pallas augmentation kernel's equality with the jnp path is pinned
# separately on chip (BASELINE.md, 2.4e-6).
DEPLOYED = False

# Multi-seed null + ablation knobs (VERDICT r3 item 1). INIT_SEED varies
# the torch weight init (the jax side always copies init.npz, so both
# sides move together); the other three each peel one layer off the
# deployed perf stack to attribute the bf16-chip parity delta.
INIT_SEED = 1337
JAX_COMPUTE = "bf16"   # "fp32": chip run at fp32 compute dtype
TRANSFER = "uint8"     # "f32": ship float32 activations host->device
DECODER = "fused"      # "plain": reference-shaped unfused decoder


def _configure_jax_side():
    """CPU-parity default: force CPU + highest matmul precision (this
    host's XLA:CPU otherwise runs f32 convs as bf16 passes — CLAUDE.md).
    Deployed: leave the platform alone (the real axon TPU chip) and keep
    the default MXU precision — that IS the deployed configuration."""
    import jax
    if not DEPLOYED:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")


def _model_dtype():
    if DEPLOYED and JAX_COMPUTE == "bf16":
        import jax.numpy as jnp
        return jnp.bfloat16
    return None


def _decoder_fused():
    return DECODER == "fused"


def _image_nhwc(x):
    """CHW float batch -> NHWC device array. Deployed ships uint8 (exact:
    --deployed pre-quantized the data to the uint8 grid) and the jitted
    step scales 1/255 on device (data/augment.to_float01)."""
    import jax.numpy as jnp
    x = x.transpose(0, 2, 3, 1)
    if DEPLOYED and TRANSFER == "uint8":
        return jnp.asarray(np.round(x * 255.0).astype(np.uint8))
    return jnp.asarray(x)


def _jax_modes():
    """Deployed runs only the deployed default (folded Siamese batching);
    the CPU harness also exercises the bit-faithful sequential mode."""
    if DEPLOYED:
        return (("jax_folded", True),)
    return (("jax_folded", True), ("jax_seq", False))


# ----------------------------------------------------------- torch side

def run_torch(data_path, init_path, out_path, epochs):
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _ref_stubs import load_ref_star_models

    ref_unet = load_ref_star_models()
    # seed AFTER the load: importing the encoder twin (tests/test_convert)
    # seeds torch RNG to a fixed value at module import, so seeding before
    # would make the init seed-independent
    torch.manual_seed(INIT_SEED)
    model = ref_unet.SegCD(encoder_name="resnet18", encoder_weights=None,
                           decoder_channels=DEC_CHANNELS, classes=1)
    np.savez(init_path,
             **{k: v.numpy() for k, v in model.state_dict().items()})

    d = np.load(data_path)
    order = d["order"]
    total = order.shape[0] * order.shape[1]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def norm(x):
        return (torch.from_numpy(x) - mean) / std

    def bce_dice(probs, label):
        bce = torch.nn.functional.binary_cross_entropy(probs, label)
        m1, m2 = probs.reshape(-1), label.reshape(-1)
        inter = (m1 * m2).sum()
        return bce + 1 - (2.0 * inter + 1.0) / (m1.sum() + m2.sum() + 1.0)

    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    step, curve = 0, []
    for ep in range(epochs):
        model.train()
        for idx in order[ep]:
            for g in opt.param_groups:
                g["lr"] = _poly_lr(step, total)
            opt.zero_grad()
            _, _, diff = model(norm(d["train_A"][idx]), norm(d["train_B"][idx]))
            probs = torch.sigmoid(diff)
            loss = bce_dice(probs, torch.from_numpy(d["train_label"][idx]))
            loss.backward()
            opt.step()
            step += 1
        model.eval()
        tp = fp = fn = 0.0
        with torch.no_grad():
            for s in range(0, d["val_A"].shape[0], 8):
                sl = slice(s, s + 8)
                _, _, diff = model(norm(d["val_A"][sl]), norm(d["val_B"][sl]))
                pred = (torch.sigmoid(diff) > 0.5).numpy()
                lab = d["val_label"][sl] > 0.5
                tp += float(np.sum(pred & lab))
                fp += float(np.sum(pred & ~lab))
                fn += float(np.sum(~pred & lab))
        f1, iou = _f1_iou(tp, fp, fn)
        curve.append({"epoch": ep + 1, "f1": round(f1, 4), "iou": round(iou, 4),
                      "loss": round(float(loss.detach()), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "torch", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


# ----------------------------------------------------- stage-1 variants

def _gen_seg_sample(rng, size):
    """One stage-1 supervised-segmentation sample (the WHU A/A_label
    analogue, ref data/dataset.py:127-166): textured background plus
    bright 'building' rectangles; label = the buildings."""
    base = rng.uniform(0.25, 0.5) + rng.normal(0.0, 0.04, (size, size, 1))
    img = np.clip(np.broadcast_to(base, (size, size, 3)).copy()
                  + rng.normal(0.0, 0.02, (size, size, 3)), 0, 1)
    label = np.zeros((size, size), np.float32)
    for _ in range(rng.integers(1, 5)):
        h, w = rng.integers(8, 22, 2)
        y, x = rng.integers(0, size - h), rng.integers(0, size - w)
        img[y:y + h, x:x + w] = (rng.uniform(0.65, 0.95, 3)
                                 + rng.normal(0.0, 0.02, (h, w, 3)))
        label[y:y + h, x:x + w] = 1.0
    return (np.clip(img, 0, 1).astype(np.float32).transpose(2, 0, 1),
            label[None])


def gen_data_sup(path, n_train, n_val, size, epochs, bs, seed):
    rng = np.random.default_rng(seed)
    tr = [_gen_seg_sample(rng, size) for _ in range(n_train)]
    va = [_gen_seg_sample(rng, size) for _ in range(n_val)]
    iters = n_train // bs
    order = np.stack([rng.permutation(n_train)[:iters * bs].reshape(iters, bs)
                      for _ in range(epochs)])
    np.savez(path,
             train_img=np.stack([t[0] for t in tr]),
             train_label=np.stack([t[1] for t in tr]),
             val_img=np.stack([v[0] for v in va]),
             val_label=np.stack([v[1] for v in va]),
             order=order.astype(np.int32))


def run_torch_sup(data_path, init_path, out_path, epochs):
    """The reference's train_sup.py loop (:112-185) with the reference's
    OWN UnetSeg (decoders/unet/model.py:109-171 via _ref_stubs): sigmoid
    + BCE_DICE (:133-135, :327-338), per-iter Poly, eval threshold 0.5
    best-by-IoU (:163-180)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _ref_stubs import load_ref_star_models

    ref_unet = load_ref_star_models()
    # seed AFTER the load: importing the encoder twin (tests/test_convert)
    # seeds torch RNG to a fixed value at module import, so seeding before
    # would make the init seed-independent
    torch.manual_seed(INIT_SEED)
    model = ref_unet.UnetSeg(encoder_name="resnet18", encoder_weights=None,
                             decoder_channels=DEC_CHANNELS, classes=1)
    np.savez(init_path,
             **{k: v.numpy() for k, v in model.state_dict().items()})

    d = np.load(data_path)
    order = d["order"]
    total = order.shape[0] * order.shape[1]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def norm(x):
        return (torch.from_numpy(x) - mean) / std

    def bce_dice(probs, label):
        bce = torch.nn.functional.binary_cross_entropy(probs, label)
        m1, m2 = probs.reshape(-1), label.reshape(-1)
        inter = (m1 * m2).sum()
        return bce + 1 - (2.0 * inter + 1.0) / (m1.sum() + m2.sum() + 1.0)

    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    step, curve = 0, []
    for ep in range(epochs):
        model.train()
        for idx in order[ep]:
            for g in opt.param_groups:
                g["lr"] = _poly_lr(step, total)
            opt.zero_grad()
            probs = torch.sigmoid(model(norm(d["train_img"][idx])))
            loss = bce_dice(probs, torch.from_numpy(d["train_label"][idx]))
            loss.backward()
            opt.step()
            step += 1
        model.eval()
        tp = fp = fn = 0.0
        with torch.no_grad():
            for s in range(0, d["val_img"].shape[0], 8):
                sl = slice(s, s + 8)
                pred = (torch.sigmoid(model(norm(d["val_img"][sl])))
                        > 0.5).numpy()
                lab = d["val_label"][sl] > 0.5
                tp += float(np.sum(pred & lab))
                fp += float(np.sum(pred & ~lab))
                fn += float(np.sum(~pred & lab))
        f1, iou = _f1_iou(tp, fp, fn)
        curve.append({"epoch": ep + 1, "f1": round(f1, 4), "iou": round(iou, 4),
                      "loss": round(float(loss.detach()), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "torch", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


def run_jax_sup(data_path, init_path, out_path, epochs):
    import jax
    _configure_jax_side()
    import jax.numpy as jnp

    from stcd_tpu.convert.torch_to_flax import convert_unetseg
    from stcd_tpu.models import UnetSeg
    from stcd_tpu.train.state import TrainState, adam_poly
    from stcd_tpu.train.steps import make_seg_steps

    d = np.load(data_path)
    init = dict(np.load(init_path))
    order = d["order"]
    epochs_avail, iters = order.shape[0], order.shape[1]
    assert epochs <= epochs_avail

    def nhwc(x):
        return jnp.asarray(x.transpose(0, 2, 3, 1))

    params, stats = convert_unetseg(init, (2, 2, 2, 2))
    model = UnetSeg(encoder_name="resnet18", classes=1,
                    decoder_channels=DEC_CHANNELS, dtype=_model_dtype(),
                    decoder_fused=_decoder_fused())
    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        tx=adam_poly(1e-3, num_epochs=epochs, iters_per_epoch=iters))
    train_step, eval_step = make_seg_steps(model, augment=False)
    curve, t = [], 0
    for ep in range(epochs):
        for idx in order[ep]:
            batch = {"image": _image_nhwc(d["train_img"][idx]),
                     "label": nhwc(d["train_label"][idx])}
            state, metrics = train_step(state, batch, jax.random.PRNGKey(t))
            t += 1
        cm = np.zeros((2, 2), np.float64)
        for s in range(0, d["val_img"].shape[0], 8):
            sl = slice(s, s + 8)
            out = eval_step(state, {"image": _image_nhwc(d["val_img"][sl]),
                                    "label": nhwc(d["val_label"][sl])})
            cm += np.asarray(out["cm"], np.float64)
        f1, iou = _f1_iou(cm[1, 1], cm[0, 1], cm[1, 0])
        curve.append({"epoch": ep + 1, "f1": round(f1, 4),
                      "iou": round(iou, 4),
                      "loss": round(float(metrics["loss"]), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"jax": {"side": "jax", "curve": curve, "best_f1": best["f1"],
                       "best_iou": best["iou"]}}, open(out_path, "w"))


# ----------------------------------------------------- stage-3 variants

def _gen_semi_sample(rng, size):
    """One stage-3 pseudo-change sample (the SC/LEVIR seg-side analogue,
    ref data/dataset.py:299-313): A carries 'buildings'; B is A with a
    random subset of them removed (the diffusion-inpainting analogue).
    s_label_A = all buildings in A, c_label = the removed ones."""
    base = rng.uniform(0.25, 0.5) + rng.normal(0.0, 0.04, (size, size, 1))
    bg = np.clip(np.broadcast_to(base, (size, size, 3)).copy()
                 + rng.normal(0.0, 0.02, (size, size, 3)), 0, 1)
    a = bg + rng.normal(0.0, 0.01, bg.shape)
    b = bg + rng.normal(0.0, 0.01, bg.shape)
    s_label = np.zeros((size, size), np.float32)
    c_label = np.zeros((size, size), np.float32)
    for _ in range(rng.integers(2, 5)):
        h, w = rng.integers(8, 22, 2)
        y, x = rng.integers(0, size - h), rng.integers(0, size - w)
        color = rng.uniform(0.65, 0.95, 3)
        a[y:y + h, x:x + w] = color + rng.normal(0.0, 0.02, (h, w, 3))
        s_label[y:y + h, x:x + w] = 1.0
        if rng.uniform() < 0.5:  # building kept in B: no change
            b[y:y + h, x:x + w] = color + rng.normal(0.0, 0.02, (h, w, 3))
        else:  # removed from B ("inpainted away"): change
            c_label[y:y + h, x:x + w] = 1.0
    return (np.clip(a, 0, 1).astype(np.float32).transpose(2, 0, 1),
            np.clip(b, 0, 1).astype(np.float32).transpose(2, 0, 1),
            s_label[None], c_label[None])


def gen_data_semi(path, n_train, n_val, size, epochs, bs, seed):
    """Stage-3 data: per train index one synthesized pseudo-change sample
    (A, B, s_label_A, c_label) AND one real change pair (CA, CB, CL) —
    the LEVIR_Dataset 9-tuple minus names/s_label_B (unused by the live
    loss, ref train_stcd.py:426-434). Val = real pairs (ref eval loop
    uses CD_Dataset, :464-510)."""
    rng = np.random.default_rng(seed)
    pseudo = [_gen_semi_sample(rng, size) for _ in range(n_train)]
    real = [_gen_pair(rng, size) for _ in range(n_train)]
    val = [_gen_pair(rng, size) for _ in range(n_val)]
    iters = n_train // bs
    order = np.stack([rng.permutation(n_train)[:iters * bs].reshape(iters, bs)
                      for _ in range(epochs)])
    np.savez(path,
             train_A=np.stack([p[0] for p in pseudo]),
             train_B=np.stack([p[1] for p in pseudo]),
             train_sA=np.stack([p[2] for p in pseudo]),
             train_cl=np.stack([p[3] for p in pseudo]),
             train_CA=np.stack([r[0] for r in real]),
             train_CB=np.stack([r[1] for r in real]),
             train_CL=np.stack([r[2] for r in real]),
             val_A=np.stack([v[0] for v in val]),
             val_B=np.stack([v[1] for v in val]),
             val_label=np.stack([v[2] for v in val]),
             order=order.astype(np.int32))


def run_torch_semi(data_path, init_path, out_path, epochs):
    """The reference's train_semi_cd loop (train_stcd.py:388-462) run
    with the reference's OWN loss apparatus: its SegCD (real
    decoders/unet/model.py via _ref_stubs), its BCE_DICE (:653-672) and
    its contrastive_loss (:334-385), both loaded from the reference's
    train_stcd.py itself (load_ref_train_stcd)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _ref_stubs import load_ref_star_models, load_ref_train_stcd

    ref_ts = load_ref_train_stcd()  # also patches Tensor.cuda -> no-op
    ref_unet = load_ref_star_models()

    torch.manual_seed(INIT_SEED)
    model = ref_unet.SegCD(encoder_name="resnet18", encoder_weights=None,
                           decoder_channels=DEC_CHANNELS, classes=1)
    np.savez(init_path,
             **{k: v.numpy() for k, v in model.state_dict().items()})

    d = np.load(data_path)
    order = d["order"]
    total = order.shape[0] * order.shape[1]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def norm(x):
        return (torch.from_numpy(x) - mean) / std

    criterion = ref_ts.BCE_DICE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    step, curve = 0, []
    for ep in range(epochs):
        model.train()
        for idx in order[ep]:
            for g in opt.param_groups:
                g["lr"] = _poly_lr(step, total)
            opt.zero_grad()
            # ref :421-423: concat pseudo + real halves, one forward
            data_a = torch.cat([norm(d["train_A"][idx]),
                                norm(d["train_CA"][idx])], dim=0)
            data_b = torch.cat([norm(d["train_B"][idx]),
                                norm(d["train_CB"][idx])], dim=0)
            cd_l = torch.from_numpy(d["train_cl"][idx])
            cl = torch.from_numpy(d["train_CL"][idx])
            labels = torch.cat([cd_l, cl], dim=0)
            seg_a, _, diff = model(data_a, data_b)
            seg_probs = torch.sigmoid(seg_a)
            seg_loss_a = criterion(seg_probs[:len(idx)],
                                   torch.from_numpy(d["train_sA"][idx]))
            cd_probs = torch.sigmoid(diff)
            cd_loss = criterion(cd_probs, labels)
            ct_loss = ref_ts.contrastive_loss(cd_probs, cd_l, cl,
                                              [""] * len(idx))
            loss = seg_loss_a + cd_loss + ct_loss  # ref :445
            loss.backward()
            opt.step()
            step += 1
        model.eval()
        tp = fp = fn = 0.0
        with torch.no_grad():
            for s in range(0, d["val_A"].shape[0], 8):
                sl = slice(s, s + 8)
                _, _, diff = model(norm(d["val_A"][sl]), norm(d["val_B"][sl]))
                pred = (torch.sigmoid(diff) > 0.5).numpy()
                lab = d["val_label"][sl] > 0.5
                tp += float(np.sum(pred & lab))
                fp += float(np.sum(pred & ~lab))
                fn += float(np.sum(~pred & lab))
        f1, iou = _f1_iou(tp, fp, fn)
        curve.append({"epoch": ep + 1, "f1": round(f1, 4), "iou": round(iou, 4),
                      "loss": round(float(loss.detach()), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "torch", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


def run_jax_semi(data_path, init_path, out_path, epochs):
    import jax
    _configure_jax_side()
    import jax.numpy as jnp

    from stcd_tpu.convert.torch_to_flax import convert_unetseg
    from stcd_tpu.models import SegCD
    from stcd_tpu.train.state import TrainState, adam_poly
    from stcd_tpu.train.steps import make_semi_cd_steps

    d = np.load(data_path)
    init = dict(np.load(init_path))
    order = d["order"]
    epochs_avail, iters = order.shape[0], order.shape[1]
    assert epochs <= epochs_avail

    def nhwc(x):
        return jnp.asarray(x.transpose(0, 2, 3, 1))

    results = {}
    for mode, batched in _jax_modes():
        params, stats = convert_unetseg(init, (2, 2, 2, 2))
        model = SegCD(encoder_name="resnet18", classes=1,
                      decoder_channels=DEC_CHANNELS, siamese_batched=batched,
                      dtype=_model_dtype(), decoder_fused=_decoder_fused())
        state = TrainState.create_with_stats(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.asarray, params),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
            tx=adam_poly(1e-3, num_epochs=epochs, iters_per_epoch=iters))
        train_step, eval_step = make_semi_cd_steps(model, augment=False)
        curve, t = [], 0
        for ep in range(epochs):
            for idx in order[ep]:
                batch = {"A": _image_nhwc(d["train_A"][idx]),
                         "B": _image_nhwc(d["train_B"][idx]),
                         "CA": _image_nhwc(d["train_CA"][idx]),
                         "CB": _image_nhwc(d["train_CB"][idx]),
                         "s_label_A": nhwc(d["train_sA"][idx]),
                         "c_label": nhwc(d["train_cl"][idx]),
                         "CL": nhwc(d["train_CL"][idx])}
                state, metrics = train_step(state, batch, jax.random.PRNGKey(t))
                t += 1
            cm = np.zeros((2, 2), np.float64)
            for s in range(0, d["val_A"].shape[0], 8):
                sl = slice(s, s + 8)
                out = eval_step(state, {"A": _image_nhwc(d["val_A"][sl]),
                                        "B": _image_nhwc(d["val_B"][sl]),
                                        "label": nhwc(d["val_label"][sl])})
                cm += np.asarray(out["cm"], np.float64)
            f1, iou = _f1_iou(cm[1, 1], cm[0, 1], cm[1, 0])
            curve.append({"epoch": ep + 1, "f1": round(f1, 4),
                          "iou": round(iou, 4),
                          "loss": round(float(metrics["loss"]), 4)})
        best = max(curve, key=lambda c: c["iou"])
        results[mode] = {"side": mode, "curve": curve, "best_f1": best["f1"],
                         "best_iou": best["iou"]}
    json.dump(results, open(out_path, "w"))


# ------------------------------------------------------------- jax side

def run_jax(data_path, init_path, out_path, epochs):
    import jax
    _configure_jax_side()
    import jax.numpy as jnp

    from stcd_tpu.convert.torch_to_flax import convert_unetseg
    from stcd_tpu.models import SegCD
    from stcd_tpu.train.state import TrainState, adam_poly
    from stcd_tpu.train.steps import make_cd_steps

    d = np.load(data_path)
    init = dict(np.load(init_path))
    order = d["order"]
    epochs_avail, iters = order.shape[0], order.shape[1]
    assert epochs <= epochs_avail

    def nhwc(x):
        return jnp.asarray(x.transpose(0, 2, 3, 1))

    results = {}
    for mode, batched in _jax_modes():
        params, stats = convert_unetseg(init, (2, 2, 2, 2))
        model = SegCD(encoder_name="resnet18", classes=1,
                      decoder_channels=DEC_CHANNELS, siamese_batched=batched,
                      dtype=_model_dtype(), decoder_fused=_decoder_fused())
        state = TrainState.create_with_stats(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.asarray, params),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
            tx=adam_poly(1e-3, num_epochs=epochs, iters_per_epoch=iters))
        train_step, eval_step = make_cd_steps(model, augment=False)
        curve, t = [], 0
        for ep in range(epochs):
            for idx in order[ep]:
                batch = {"A": _image_nhwc(d["train_A"][idx]),
                         "B": _image_nhwc(d["train_B"][idx]),
                         "label": nhwc(d["train_label"][idx])}
                state, metrics = train_step(state, batch, jax.random.PRNGKey(t))
                t += 1
            cm = np.zeros((2, 2), np.float64)
            for s in range(0, d["val_A"].shape[0], 8):
                sl = slice(s, s + 8)
                out = eval_step(state, {"A": _image_nhwc(d["val_A"][sl]),
                                        "B": _image_nhwc(d["val_B"][sl]),
                                        "label": nhwc(d["val_label"][sl])})
                cm += np.asarray(out["cm"], np.float64)
            f1, iou = _f1_iou(cm[1, 1], cm[0, 1], cm[1, 0])
            curve.append({"epoch": ep + 1, "f1": round(f1, 4),
                          "iou": round(iou, 4),
                          "loss": round(float(metrics["loss"]), 4)})
        best = max(curve, key=lambda c: c["iou"])
        results[mode] = {"side": mode, "curve": curve, "best_f1": best["f1"],
                         "best_iou": best["iou"]}
    json.dump(results, open(out_path, "w"))


# ------------------------------------------------------------ orchestrate

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stage", type=int, choices=[1, 2, 3], default=2,
                    help="1 = supervised seg pretrain semantics "
                         "(train_sup.py: UnetSeg on single images); "
                         "2 = pseudo-change CD pretrain semantics "
                         "(train_pse_cd.py); 3 = STCD fine-tune semantics "
                         "(train_stcd.py: seg + cd + contrastive, "
                         "concatenated pseudo+real batches)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--side", choices=["torch", "jax"], default=None,
                    help="internal: run one side in this process")
    ap.add_argument("--deployed", action="store_true",
                    help="jax side on the REAL TPU chip with the deployed "
                         "perf stack (bf16, fused decoder, uint8 H2D); "
                         "images pre-quantized to the uint8 grid for both "
                         "sides. Run with --size 256 for the chip-scale "
                         "parity evidence (VERDICT r2 item 2).")
    ap.add_argument("--init-seed", type=int, default=1337,
                    help="torch weight-init seed (both sides share the "
                         "resulting init.npz); varied by parity_null.py "
                         "to build the seed-noise null distribution")
    ap.add_argument("--jax-compute", choices=["bf16", "fp32"],
                    default="bf16",
                    help="deployed ablation: chip compute dtype")
    ap.add_argument("--transfer", choices=["uint8", "f32"], default="uint8",
                    help="deployed ablation: host->device image dtype")
    ap.add_argument("--decoder", choices=["fused", "plain"], default="fused",
                    help="ablation: fused upsample+concat+conv decoder vs "
                         "the reference-shaped plain decoder")
    ap.add_argument("--reuse-torch", action="store_true",
                    help="skip the torch side if torch.json already exists "
                         "in --workdir (ablation sweeps vary the jax side "
                         "only; same --seed/--init-seed => identical data)")
    args = ap.parse_args(argv)

    global DEPLOYED, INIT_SEED, JAX_COMPUTE, TRANSFER, DECODER
    DEPLOYED = args.deployed
    INIT_SEED = args.init_seed
    JAX_COMPUTE = args.jax_compute
    TRANSFER = args.transfer
    DECODER = args.decoder

    torch_fn = {1: run_torch_sup, 2: run_torch, 3: run_torch_semi}[args.stage]
    jax_fn = {1: run_jax_sup, 2: run_jax, 3: run_jax_semi}[args.stage]
    gen_fn = {1: gen_data_sup, 2: gen_data, 3: gen_data_semi}[args.stage]

    wd = args.workdir or tempfile.mkdtemp(prefix="convergence_parity_")
    os.makedirs(wd, exist_ok=True)
    data, init = os.path.join(wd, "data.npz"), os.path.join(wd, "init.npz")

    if args.side == "torch":
        torch_fn(data, init, os.path.join(wd, "torch.json"), args.epochs)
        return None
    if args.side == "jax":
        jax_fn(data, init, os.path.join(wd, "jax.json"), args.epochs)
        return None

    gen_fn(data, args.n_train, args.n_val, args.size, args.epochs,
           args.bs, args.seed)
    if args.deployed:
        # snap images to the uint8 grid so the fp32 torch side and the
        # uint8-shipping jax side consume bit-identical pixel values
        d = dict(np.load(data))
        for k in d:
            if k.rsplit("_", 1)[-1] in ("A", "B", "CA", "CB", "img"):
                d[k] = (np.round(d[k] * 255.0) / 255.0).astype(np.float32)
        np.savez(data, **d)
    # append (not replace) PYTHONPATH: the axon TPU plugin loads via the
    # sitecustomize on the inherited path (CLAUDE.md) — required --deployed
    inherited = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.path.join(REPO, 'tests')}"
                          + (f":{inherited}" if inherited else ""))
    base = [sys.executable, os.path.abspath(__file__), "--workdir", wd,
            "--epochs", str(args.epochs), "--stage", str(args.stage),
            "--init-seed", str(args.init_seed),
            "--jax-compute", args.jax_compute,
            "--transfer", args.transfer, "--decoder", args.decoder]
    if args.deployed:
        base.append("--deployed")
    for side in ("torch", "jax"):  # torch first: it writes init.npz
        if side == "torch" and args.reuse_torch \
                and os.path.exists(os.path.join(wd, "torch.json")) \
                and os.path.exists(os.path.join(wd, "init.npz")):
            # ablation sweeps vary only the JAX side; with identical
            # --seed/--init-seed the regenerated data is bit-identical,
            # so the prior torch result is valid
            continue
        subprocess.run(base + ["--side", side], env=env, cwd=REPO, check=True)

    torch_res = json.load(open(os.path.join(wd, "torch.json")))
    jax_res = json.load(open(os.path.join(wd, "jax.json")))
    knobs = {"init_seed": args.init_seed, "seed": args.seed}
    if args.deployed:
        knobs.update(jax_compute=args.jax_compute, transfer=args.transfer,
                     decoder=args.decoder)
    if args.stage == 1:  # single jax mode: no Siamese fold in UnetSeg
        report = {
            "stage": 1,
            **knobs,
            "deployed": args.deployed,
            "torch_best_f1": torch_res["best_f1"],
            "torch_best_iou": torch_res["best_iou"],
            "jax_best_f1": jax_res["jax"]["best_f1"],
            "jax_best_iou": jax_res["jax"]["best_iou"],
            "delta_f1": round(abs(torch_res["best_f1"]
                                  - jax_res["jax"]["best_f1"]), 4),
            "contract": 0.1,
        }
        report["pass"] = report["delta_f1"] <= 0.1
        print(json.dumps(report))
        return report
    if args.deployed:  # single jax mode: the deployed (folded) config
        report = {
            "stage": args.stage,
            "deployed": True,
            **knobs,
            "size": args.size,
            "torch_best_f1": torch_res["best_f1"],
            "torch_best_iou": torch_res["best_iou"],
            "jax_folded_best_f1": jax_res["jax_folded"]["best_f1"],
            "jax_folded_best_iou": jax_res["jax_folded"]["best_iou"],
            "delta_f1_folded": round(abs(torch_res["best_f1"]
                                         - jax_res["jax_folded"]["best_f1"]),
                                     4),
            "torch_curve": torch_res["curve"],
            "jax_curve": jax_res["jax_folded"]["curve"],
            "contract": 0.1,
        }
        report["pass"] = report["delta_f1_folded"] <= 0.1
        print(json.dumps(report))
        return report
    report = {
        "stage": args.stage,
        "torch_best_f1": torch_res["best_f1"],
        "torch_best_iou": torch_res["best_iou"],
        "jax_seq_best_f1": jax_res["jax_seq"]["best_f1"],
        "jax_folded_best_f1": jax_res["jax_folded"]["best_f1"],
        "jax_seq_best_iou": jax_res["jax_seq"]["best_iou"],
        "jax_folded_best_iou": jax_res["jax_folded"]["best_iou"],
        "delta_f1_seq": round(abs(torch_res["best_f1"]
                                  - jax_res["jax_seq"]["best_f1"]), 4),
        "delta_f1_folded": round(abs(torch_res["best_f1"]
                                     - jax_res["jax_folded"]["best_f1"]), 4),
        "contract": 0.1,
    }
    report["pass"] = (report["delta_f1_seq"] <= 0.1
                      and report["delta_f1_folded"] <= 0.1)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()

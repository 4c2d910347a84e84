"""End-to-end convergence parity for the bespoke CD zoo: the reference's
OWN model files vs stcd_tpu's ports, under the CDTrainer protocol.

Extends the convergence evidence chain (convergence_parity.py: SegCD
stages 1-3; convergence_bit.py: BIT) to three more define_G families. The
torch side builds the REFERENCE'S OWN model (loaded file-by-file from
/root/reference/models via tests/_ref_stubs) and trains it with the
reference's own models/losses.py cross_entropy under the vestigial
CDTrainer's protocol (ref models/trainer.py:46-48 adam wd=0;
networks.py:40-43 linear per-epoch lr decay; trainer.py:311
multi_scale_train="False" -> train on output[-1]; argmax eval). The jax
side converts the torch init weights (convert/torch_to_flax.py) and runs
the identical protocol on identical batches. Best val F1/IoU are compared
to the +-0.1 contract.

Families (protocol = the CDTrainer loss that fits the head):
  siamunet_conc    ref models/SiamUnet_conc.py  (FC-Siam-conc; 2-class CE)
  dtcdscn          ref models/DTCDSCN.py CDNet34 (2-class CE)
  snunet           ref models/SNUNet.py SNUNet_ECAM (2-class CE)
  changeformer_v6  ref models/ChangeFormer.py ChangeFormerV6 (2-class CE on
                   the final multi-scale output, ref trainer.py:311; real
                   dropout/drop-path 0.1 + conv_diff Dropout .6 active on
                   both sides, independently sampled -> parity is
                   statistical under the +-0.1 contract)
  ifnet            ref models/DSIFN.py (1-channel head: ref models/losses.py
                   cd_loss = BCE+Dice on sigmoid, threshold-0.5 eval)
  unet_ef          ref models/Unet.py (FC-EF early fusion; 2-class CE)
  siamunet_crossconc ref models/SiamUnet_crossconc.py (interleave +
                   grouped-conv skip fusion; 2-class CE)

(ChangeGNNV2 is excluded: the reference's own class hardcodes a 256^2
pos_embed — EncoderV2's img_size arg is never forwarded, ChangeVIG.py:649
— so the ref model cannot run at the reduced resolutions this CPU harness
needs; its coverage is the golden forward/grad tests instead.)

Each side runs in its own subprocess (torch TRAINING corrupts XLA:CPU
conv precision process-wide — CLAUDE.md; torch must also run first since
it writes init.npz).

Run:  python benchmarks/convergence_zoo.py --model siamunet_conc
Prints one JSON line per model. tests/test_convergence_parity.py runs a
reduced configuration under the slow marker.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_parity import _f1_iou, gen_data  # noqa: E402

LR = 1e-3

# --deployed (VERDICT r3 item 2): jax side on the REAL chip in the
# deployed bf16 perf stack vs the fp32-CPU torch reference.
DEPLOYED = False

FAMILIES = {
    "siamunet_conc": dict(ref_module="SiamUnet_conc", ref_cls="SiamUnet_conc",
                          protocol="ce"),
    "dtcdscn": dict(ref_module="DTCDSCN", ref_cls="CDNet34", protocol="ce"),
    "snunet": dict(ref_module="SNUNet", ref_cls="SNUNet_ECAM", protocol="ce"),
    "changeformer_v6": dict(ref_module="ChangeFormer", ref_cls="ChangeFormerV6",
                            protocol="ce"),
    "ifnet": dict(ref_module="DSIFN", ref_cls="DSIFN", protocol="bce"),
    "unet_ef": dict(ref_module="Unet", ref_cls="Unet", protocol="ce"),
    "siamunet_crossconc": dict(ref_module="SiamUnet_crossconc",
                               ref_cls="SiamUnet_cross_conc", protocol="ce"),
}


def _build_ref(model_key):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _ref_stubs import load_ref_model_module

    fam = FAMILIES[model_key]
    mod = load_ref_model_module(fam["ref_module"])
    cls = getattr(mod, fam["ref_cls"])
    if model_key == "siamunet_conc":
        return cls(3, 2)
    if model_key == "dtcdscn":
        return cls(in_channels=3, num_classes=2)
    if model_key == "changeformer_v6":
        return cls(input_nc=3, output_nc=2, decoder_softmax=False,
                   embed_dim=256)
    if model_key == "ifnet":
        base = mod.vgg16_base()
        return cls(base, base)  # ref networks.py:166: shared instance
    if model_key in ("unet_ef", "siamunet_crossconc"):
        return cls(3, 2)  # ref networks.py:145,153 (input_nbr=3, n_class)
    return cls(in_ch=3, out_ch=2)  # snunet


def _build_jax(model_key, init, dtype=None):
    """Returns (flax module, params, batch_stats) from the torch init."""
    from stcd_tpu.convert import torch_to_flax as cv

    if model_key == "siamunet_conc":
        from stcd_tpu.models.siam_unet import SiamUnet
        params, stats = cv.convert_siam_unet(init, "conc")
        return SiamUnet(fusion="conc", label_nbr=2, dtype=dtype), params, stats
    if model_key == "dtcdscn":
        from stcd_tpu.models.dtcdscn import CDNet34
        params, stats = cv.convert_dtcdscn(init)
        return CDNet34(num_classes=2, dtype=dtype), params, stats
    if model_key == "changeformer_v6":
        from stcd_tpu.models.changeformer import ChangeFormerV6
        params, stats = cv.convert_changeformer_v6(init, depths=(3, 3, 4, 3))
        return (ChangeFormerV6(output_nc=2, decoder_softmax=False,
                               embed_dim=256, dtype=dtype), params, stats)
    if model_key == "ifnet":
        from stcd_tpu.models.dsifn import DSIFN
        params, stats = cv.convert_dsifn(init)
        return DSIFN(dtype=dtype), params, stats
    if model_key in ("unet_ef", "siamunet_crossconc"):
        from stcd_tpu.models.siam_unet import SiamUnet
        fusion = "ef" if model_key == "unet_ef" else "crossconc"
        params, stats = cv.convert_siam_unet(init, fusion)
        return SiamUnet(fusion=fusion, label_nbr=2, dtype=dtype), params, stats
    from stcd_tpu.models.snunet import SNUNetECAM
    params, stats = cv.convert_snunet(init, ecam=True)
    return SNUNetECAM(out_ch=2, dtype=dtype), params, stats


def _linear_factor(epoch, max_epochs):
    # ref networks.py:40-43 (LambdaLR, stepped per epoch)
    return 1.0 - epoch / float(max_epochs + 1)


def run_torch(model_key, data_path, init_path, out_path, epochs,
              init_seed=1337):
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _ref_stubs import load_ref_model_module

    ref_losses = load_ref_model_module("losses")
    torch.manual_seed(init_seed)
    model = _build_ref(model_key)
    np.savez(init_path,
             **{k: v.numpy() for k, v in model.state_dict().items()})

    d = np.load(data_path)
    order = d["order"]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def norm(x):
        return (torch.from_numpy(x) - mean) / std

    def fwd(a, b):
        out = model(a, b)
        return out[-1] if isinstance(out, (list, tuple)) else out

    proto = FAMILIES[model_key]["protocol"]
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=0)
    curve = []
    for ep in range(epochs):
        lr = LR * _linear_factor(ep, epochs)
        for g in opt.param_groups:
            g["lr"] = lr
        model.train()
        for idx in order[ep]:
            opt.zero_grad()
            logits = fwd(norm(d["train_A"][idx]), norm(d["train_B"][idx]))
            if proto == "ce":
                target = torch.from_numpy(d["train_label"][idx][:, 0]).long()
                loss = ref_losses.cross_entropy(logits, target)
            else:  # 1-channel head: ref models/losses.py cd_loss (BCE+Dice)
                target = torch.from_numpy(d["train_label"][idx][:, :1])
                loss = ref_losses.cd_loss(torch.sigmoid(logits), target)
            loss.backward()
            opt.step()
        model.eval()
        tp = fp = fn = 0.0
        with torch.no_grad():
            for s in range(0, d["val_A"].shape[0], 8):
                sl = slice(s, s + 8)
                logits = fwd(norm(d["val_A"][sl]), norm(d["val_B"][sl]))
                if proto == "ce":
                    pred = logits.argmax(1).numpy() == 1
                else:
                    pred = torch.sigmoid(logits).numpy()[:, 0] > 0.5
                lab = d["val_label"][sl][:, 0] > 0.5
                tp += float(np.sum(pred & lab))
                fp += float(np.sum(pred & ~lab))
                fn += float(np.sum(~pred & lab))
        f1, iou = _f1_iou(tp, fp, fn)
        curve.append({"epoch": ep + 1, "f1": round(f1, 4),
                      "iou": round(iou, 4),
                      "loss": round(float(loss.detach()), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "torch", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


def run_jax(model_key, data_path, init_path, out_path, epochs):
    import jax
    if not DEPLOYED:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import functools

    import jax.numpy as jnp
    import optax

    from stcd_tpu.data.augment import eval_preprocess, to_float01
    from stcd_tpu.losses.functional import cd_loss, cross_entropy
    from stcd_tpu.train.schedules import get_scheduler
    from stcd_tpu.train.state import TrainState

    d = np.load(data_path)
    init = dict(np.load(init_path))
    order = d["order"]
    iters = order.shape[1]
    proto = FAMILIES[model_key]["protocol"]

    def nhwc(x):
        x = x.transpose(0, 2, 3, 1)
        if DEPLOYED:  # ship uint8, scale 1/255 on device (to_float01)
            return jnp.asarray(np.round(x * 255.0).astype(np.uint8))
        return jnp.asarray(x)

    def _final(out):
        return out[-1] if isinstance(out, (list, tuple)) else out

    import jax.numpy as _jnp
    model, params, stats = _build_jax(
        model_key, init, dtype=_jnp.bfloat16 if DEPLOYED else None)
    schedule = get_scheduler("linear", LR, iters_per_epoch=iters,
                             max_epochs=epochs)
    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        tx=optax.adam(schedule))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, a, b, target, step):
        def loss_fn(p):
            logits, mut = state.apply_fn(
                {"params": p, "batch_stats": state.batch_stats},
                eval_preprocess(to_float01(a)),
                eval_preprocess(to_float01(b)), True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(
                    jax.random.PRNGKey(0), step)})
            logits = _final(logits)
            if proto == "ce":
                loss = cross_entropy(logits, target)
            else:
                loss = cd_loss(jax.nn.sigmoid(logits), target)
            return loss, mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads,
                                      batch_stats=mut["batch_stats"])
        return state, loss

    @jax.jit
    def eval_fwd(state, a, b):
        logits = _final(state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            eval_preprocess(to_float01(a)), eval_preprocess(to_float01(b))))
        if proto == "ce":
            return jnp.argmax(logits, -1)
        return (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)

    step_no = 0
    curve = []
    for ep in range(epochs):
        for idx in order[ep]:
            if proto == "ce":
                target = jnp.asarray(d["train_label"][idx][:, 0], jnp.int32)
            else:
                target = jnp.asarray(
                    d["train_label"][idx][:, :1].transpose(0, 2, 3, 1))
            state, loss = train_step(state, nhwc(d["train_A"][idx]),
                                     nhwc(d["train_B"][idx]), target,
                                     step_no)
            step_no += 1
        tp = fp = fn = 0.0
        for s in range(0, d["val_A"].shape[0], 8):
            sl = slice(s, s + 8)
            pred = np.asarray(eval_fwd(state, nhwc(d["val_A"][sl]),
                                       nhwc(d["val_B"][sl]))) == 1
            lab = d["val_label"][sl][:, 0] > 0.5
            tp += float(np.sum(pred & lab))
            fp += float(np.sum(pred & ~lab))
            fn += float(np.sum(~pred & lab))
        f1, iou = _f1_iou(tp, fp, fn)
        curve.append({"epoch": ep + 1, "f1": round(f1, 4),
                      "iou": round(iou, 4), "loss": round(float(loss), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "jax", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(FAMILIES), required=True)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--side", choices=["torch", "jax"], default=None)
    ap.add_argument("--init-seed", type=int, default=1337,
                    help="torch weight-init seed (null-distribution runs "
                         "re-train from a different init on the same data)")
    ap.add_argument("--torch-out", default="torch.json",
                    help="torch-side result filename inside the workdir")
    ap.add_argument("--init-out", default="init.npz",
                    help="torch-side init dump filename inside the workdir")
    ap.add_argument("--deployed", action="store_true",
                    help="jax side on the REAL TPU chip (bf16, uint8 H2D);"
                         " images pre-quantized to the uint8 grid for both"
                         " sides. Use --size 256 for chip-scale evidence.")
    args = ap.parse_args(argv)

    global DEPLOYED
    DEPLOYED = args.deployed

    wd = args.workdir or tempfile.mkdtemp(prefix=f"conv_{args.model}_")
    os.makedirs(wd, exist_ok=True)
    data, init = os.path.join(wd, "data.npz"), os.path.join(wd, "init.npz")

    if args.side == "torch":
        run_torch(args.model, data, os.path.join(wd, args.init_out),
                  os.path.join(wd, args.torch_out), args.epochs,
                  init_seed=args.init_seed)
        return None
    if args.side == "jax":
        run_jax(args.model, data, init, os.path.join(wd, "jax.json"),
                args.epochs)
        return None

    gen_data(data, args.n_train, args.n_val, args.size, args.epochs,
             args.bs, args.seed)
    if args.deployed:
        # snap images to the uint8 grid so both sides consume
        # bit-identical pixel values (convergence_parity.py protocol)
        dd = dict(np.load(data))
        for k in dd:
            if k.rsplit("_", 1)[-1] in ("A", "B"):
                dd[k] = (np.round(dd[k] * 255.0) / 255.0).astype(np.float32)
        np.savez(data, **dd)
    # APPEND the inherited PYTHONPATH: the axon TPU plugin loads via the
    # sitecustomize on it (CLAUDE.md) — required for --deployed
    inherited = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.path.join(REPO, 'tests')}"
                          + (f":{inherited}" if inherited else ""))
    base = [sys.executable, os.path.abspath(__file__), "--model", args.model,
            "--workdir", wd, "--epochs", str(args.epochs),
            "--init-seed", str(args.init_seed)]
    if args.deployed:
        base.append("--deployed")
    for side in ("torch", "jax"):  # torch first: it writes init.npz
        subprocess.run(base + ["--side", side], env=env, cwd=REPO, check=True)

    torch_res = json.load(open(os.path.join(wd, "torch.json")))
    jax_res = json.load(open(os.path.join(wd, "jax.json")))
    report = {
        "model": args.model,
        "deployed": args.deployed,
        "torch_best_f1": torch_res["best_f1"],
        "torch_best_iou": torch_res["best_iou"],
        "jax_best_f1": jax_res["best_f1"],
        "jax_best_iou": jax_res["best_iou"],
        "delta_f1": round(abs(torch_res["best_f1"] - jax_res["best_f1"]), 4),
        "contract": 0.1,
    }
    report["pass"] = report["delta_f1"] <= 0.1
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()

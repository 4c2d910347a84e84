"""End-to-end convergence parity for BIT: the reference's own
BASE_Transformer vs stcd_tpu's models/bit.py.

Extends the convergence-parity evidence chain (convergence_parity.py,
which covers the SegCD/UnetSeg flagship for all 3 stages) to the bespoke
transformer zoo: the REFERENCE'S OWN networks.py BASE_Transformer
('base_transformer_pos_s4_dd8', define_G key at networks.py:177-186) and
its OWN models/losses.py cross_entropy (:6-21) — both loaded from
/root/reference via tests/_ref_stubs — train from identical initial
weights on identical batches of the same learnable synthetic CD task,
with the vestigial CDTrainer's protocol (ref models/trainer.py:46-48
adam wd=0; networks.py:40-43 linear per-epoch lr decay; 2-class CE,
argmax eval). Converged val F1/IoU are compared to the +-0.1 contract.

Each side runs in its own subprocess (torch training corrupts XLA:CPU
conv precision process-wide — CLAUDE.md).

Run:  python benchmarks/convergence_bit.py [--epochs 10 --n-train 48]
Prints one JSON line. tests/test_convergence_parity.py runs a reduced
configuration under the slow marker.
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

BIT_KW = dict(token_len=4, resnet_stages_num=4, with_pos="learned",
              enc_depth=1, dec_depth=8)
LR = 1e-3

# --deployed (VERDICT r3 item 2): jax side on the REAL TPU chip in the
# deployed perf stack (bf16 compute, uint8 H2D) vs the fp32-CPU torch
# reference, with images pre-quantized to the uint8 grid for both sides
# — the same protocol as convergence_parity.py --deployed.
DEPLOYED = False


def _linear_factor(epoch, max_epochs):
    # ref networks.py:40-43: lr_l = 1.0 - epoch / (max_epochs + 1),
    # stepped once per epoch (LambdaLR semantics: factor(0)=1 for epoch 1)
    return 1.0 - epoch / float(max_epochs + 1)


def run_torch(data_path, init_path, out_path, epochs,
              init_seed=1337):
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _ref_stubs import load_ref_model_module

    net = load_ref_model_module("networks")
    ref_losses = load_ref_model_module("losses")

    torch.manual_seed(init_seed)
    model = net.BASE_Transformer(input_nc=3, output_nc=2, **BIT_KW)
    np.savez(init_path,
             **{k: v.numpy() for k, v in model.state_dict().items()})

    d = np.load(data_path)
    order = d["order"]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def norm(x):
        return (torch.from_numpy(x) - mean) / std

    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=0)
    curve = []
    for ep in range(epochs):
        lr = LR * _linear_factor(ep, epochs)
        for g in opt.param_groups:
            g["lr"] = lr
        model.train()
        for idx in order[ep]:
            opt.zero_grad()
            # BASE_Transformer returns a list; CDTrainer trains on [-1]
            # (ref trainer.py:311 multi_scale_train default "False")
            logits = model(norm(d["train_A"][idx]),
                           norm(d["train_B"][idx]))[-1]
            target = torch.from_numpy(
                d["train_label"][idx][:, 0]).long()  # (N,H,W)
            loss = ref_losses.cross_entropy(logits, target)
            loss.backward()
            opt.step()
        model.eval()
        tp = fp = fn = 0.0
        with torch.no_grad():
            for s in range(0, d["val_A"].shape[0], 8):
                sl = slice(s, s + 8)
                logits = model(norm(d["val_A"][sl]), norm(d["val_B"][sl]))[-1]
                pred = logits.argmax(1).numpy() == 1
                lab = d["val_label"][sl][:, 0] > 0.5
                tp += float(np.sum(pred & lab))
                fp += float(np.sum(pred & ~lab))
                fn += float(np.sum(~pred & lab))
        f1, iou = _f1_iou(tp, fp, fn)
        curve.append({"epoch": ep + 1, "f1": round(f1, 4), "iou": round(iou, 4),
                      "loss": round(float(loss.detach()), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "torch", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


def run_jax(data_path, init_path, out_path, epochs):
    import jax
    if not DEPLOYED:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import functools

    import jax.numpy as jnp
    import optax

    from stcd_tpu.convert.torch_to_flax import convert_bit
    from stcd_tpu.data.augment import eval_preprocess, to_float01
    from stcd_tpu.losses.functional import cross_entropy
    from stcd_tpu.models.bit import BASETransformer
    from stcd_tpu.train.schedules import get_scheduler
    from stcd_tpu.train.state import TrainState

    d = np.load(data_path)
    init = dict(np.load(init_path))
    order = d["order"]
    iters = order.shape[1]

    def nhwc(x):
        x = x.transpose(0, 2, 3, 1)
        if DEPLOYED:  # ship uint8, scale 1/255 on device (to_float01)
            return jnp.asarray(np.round(x * 255.0).astype(np.uint8))
        return jnp.asarray(x)

    params, stats = convert_bit(init, layers_per_stage=(2, 2, 2, 2),
                                enc_depth=BIT_KW["enc_depth"],
                                dec_depth=BIT_KW["dec_depth"],
                                resnet_stages_num=BIT_KW["resnet_stages_num"])
    model = BASETransformer(output_nc=2, **BIT_KW,
                            dtype=jnp.bfloat16 if DEPLOYED else None)
    schedule = get_scheduler("linear", LR, iters_per_epoch=iters,
                             max_epochs=epochs)
    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        tx=optax.adam(schedule))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, a, b, target):
        def loss_fn(p):
            logits, mut = state.apply_fn(
                {"params": p, "batch_stats": state.batch_stats},
                eval_preprocess(to_float01(a)),
                eval_preprocess(to_float01(b)), True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return cross_entropy(logits, target), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads,
                                      batch_stats=mut["batch_stats"])
        return state, loss

    @jax.jit
    def eval_fwd(state, a, b):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            eval_preprocess(to_float01(a)), eval_preprocess(to_float01(b)))
        return jnp.argmax(logits, -1)

    curve = []
    for ep in range(epochs):
        for idx in order[ep]:
            target = jnp.asarray(d["train_label"][idx][:, 0], jnp.int32)
            state, loss = train_step(state, nhwc(d["train_A"][idx]),
                                     nhwc(d["train_B"][idx]), target)
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
        curve.append({"epoch": ep + 1, "f1": round(f1, 4), "iou": round(iou, 4),
                      "loss": round(float(loss), 4)})
    best = max(curve, key=lambda c: c["iou"])
    json.dump({"side": "jax", "curve": curve, "best_f1": best["f1"],
               "best_iou": best["iou"]}, open(out_path, "w"))


def main(argv=None):
    ap = argparse.ArgumentParser()
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

    wd = args.workdir or tempfile.mkdtemp(prefix="convergence_bit_")
    os.makedirs(wd, exist_ok=True)
    data, init = os.path.join(wd, "data.npz"), os.path.join(wd, "init.npz")

    if args.side == "torch":
        run_torch(data, os.path.join(wd, args.init_out),
                  os.path.join(wd, args.torch_out), args.epochs,
                  init_seed=args.init_seed)
        return None
    if args.side == "jax":
        run_jax(data, init, os.path.join(wd, "jax.json"), args.epochs)
        return None

    gen_data(data, args.n_train, args.n_val, args.size, args.epochs,
             args.bs, args.seed)
    if args.deployed:
        # snap images to the uint8 grid so both sides consume
        # bit-identical pixel values (convergence_parity.py protocol)
        d = dict(np.load(data))
        for k in d:
            if k.rsplit("_", 1)[-1] in ("A", "B"):
                d[k] = (np.round(d[k] * 255.0) / 255.0).astype(np.float32)
        np.savez(data, **d)
    # APPEND the inherited PYTHONPATH: the axon TPU plugin loads via the
    # sitecustomize on it (CLAUDE.md) — required for --deployed
    inherited = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.path.join(REPO, 'tests')}"
                          + (f":{inherited}" if inherited else ""))
    base = [sys.executable, os.path.abspath(__file__), "--workdir", wd,
            "--epochs", str(args.epochs),
            "--init-seed", str(args.init_seed)]
    if args.deployed:
        base.append("--deployed")
    for side in ("torch", "jax"):  # torch first: it writes init.npz
        subprocess.run(base + ["--side", side], env=env, cwd=REPO, check=True)

    torch_res = json.load(open(os.path.join(wd, "torch.json")))
    jax_res = json.load(open(os.path.join(wd, "jax.json")))
    report = {
        "model": "base_transformer_pos_s4_dd8",
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

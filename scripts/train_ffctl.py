"""FFC-pair fine-tune — the reference's alternate `train_ffctl` loop.

Parity with /root/reference/train_stcd.py:229-331 (commented out of the
reference's own live path at :223; wired here for surface completeness):
a plain CD loop over FFC pairs — images from A/ and B/ labeled by the
generated ff_label/ maps (FFC_Dataset, ref data/dataset.py:215-257) —
with loss = BCE_DICE(sigmoid(diff)) only (ref :255-268: loss_all =
cd_loss; no seg or contrastive terms), per-iter Poly LR, per-epoch eval
on real CD pairs, best checkpoint by cd IoU (ref :322-328).

The model is FFCTLCD by default (the loop's namesake: feature-level
diffs across all encoder levels, ref unet/model.py:335-423); --net segcd
swaps in SegCD — both return (seg_A, seg_B, diff) and the reference
loop only consumes diff (ref :254-256).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from scripts.common import (base_parser, configure_host_transfer, make_mesh,
                            place_state, resume_and_guard)
from stcd_tpu.data.datasets import CDDataset, FFCDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.models import FFCTLCD, SegCD
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.loops import run_training
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps


def init_net(args):
    dtype = jnp.bfloat16 if args.bf16 else None
    dec = tuple(int(c) for c in args.decoder_channels.split(","))
    cls = {"ffctlcd": FFCTLCD, "segcd": SegCD}[args.net]
    model = cls(encoder_name=args.encoder, classes=1,
                decoder_channels=dec, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    example = jnp.zeros((args.batch_size, args.img_height, args.img_width, 3))
    return model, rng, example


def main():
    p = base_parser("LEVIR", "runs/LEVIR-FFCTL")
    p.add_argument("--net", choices=["ffctlcd", "segcd"], default="ffctlcd")
    args = p.parse_args()
    configure_host_transfer(args)
    print(args)
    mesh, sharding = make_mesh(args)

    model, rng, example = init_net(args)
    train_ds = FFCDataset(args.root_path, args.dataset_name, "train")
    val_ds = CDDataset(args.root_path, args.CDdataset_name, "val")
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.n_cpu, seed=args.seed,
                              sharding=sharding, drop_last=True)
    val_loader = DataLoader(val_ds, args.batch_size * 2, num_workers=args.n_cpu,
                            sharding=sharding)

    tx = optax.adam(poly_schedule(args.lr, args.n_epochs,
                                  max(len(train_loader), 1)))
    state = create_train_state(model, rng, (example, example), tx,
                               encoder_weights=args.encoder_weights)
    from scripts.common import pick_steps
    from stcd_tpu.parallel.spatial import make_spatial_cd_steps
    train_step, eval_step = pick_steps(
        mesh, model,
        lambda: make_cd_steps(model, augment=True, remat=args.remat,
                              accum_steps=args.accum_steps),
        lambda: make_spatial_cd_steps(model, mesh, augment=True), args)

    if args.load_model:
        # ref train_stcd.py:92-94: warm-start from the stage-2 checkpoint
        mgr = CheckpointManager(args.load_path)
        best = mgr.best_path()
        if best:
            state = mgr.load_weights(state, best)
            print(f"resumed weights from {best}")
        else:
            print("Will start from scratch")

    state, run_kwargs = resume_and_guard(args, state)
    state = place_state(mesh, state)  # TP/replicated placement on the mesh
    state, best, history = run_training(
        train_step, eval_step, state, train_loader, val_loader,
        n_epochs=args.n_epochs, save_dir=args.save_name, rng=rng,
        **run_kwargs)
    print(f"best cd IoU: {best:.4f}")


if __name__ == "__main__":
    main()

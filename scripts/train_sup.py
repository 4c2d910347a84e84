"""Stage 1 — supervised building-segmentation pretraining.

Parity with /root/reference/train_sup.py: UnetSeg(resnet50) on
{dataset}/A + A_label with BCE+Dice on the sigmoid output, Adam(1e-3) +
per-iteration Poly(0.9), per-epoch confusion-matrix eval, best checkpoint
by class-1 IoU, snapshots at n/3, 2n/3, n.

TPU-native: batch sharded over the device mesh's 'data' axis; photometric
augmentation runs inside the jitted step.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from scripts.common import (base_parser, configure_host_transfer, make_mesh,
                            place_state, resume_and_guard)
from stcd_tpu.data.datasets import WHUDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.models import UnetSeg
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.loops import run_training
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_seg_steps


def main():
    args = base_parser("WHU-AB", "runs/WHU-Seg").parse_args()
    configure_host_transfer(args)
    print(args)
    mesh, sharding = make_mesh(args)

    train_ds = WHUDataset(args.root_path, args.dataset_name, "train")
    val_ds = WHUDataset(args.root_path, args.dataset_name, "val")
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.n_cpu, seed=args.seed,
                              sharding=sharding, drop_last=True)
    val_loader = DataLoader(val_ds, args.batch_size * 2, num_workers=args.n_cpu,
                            sharding=sharding)

    dtype = jnp.bfloat16 if args.bf16 else None
    dec = tuple(int(c) for c in args.decoder_channels.split(","))
    model = UnetSeg(encoder_name=args.encoder, classes=1,
                    decoder_channels=dec, dtype=dtype)
    tx = optax.adam(poly_schedule(args.lr, args.n_epochs, len(train_loader)),
                    b1=0.9, b2=0.999)
    rng = jax.random.PRNGKey(args.seed)
    example = jnp.zeros((args.batch_size, args.img_height, args.img_width, 3))
    state = create_train_state(model, rng, (example,), tx,
                               encoder_weights=args.encoder_weights)

    if args.load_model:
        mgr = CheckpointManager(args.load_path)
        best = mgr.best_path()
        if best:
            state = mgr.load_weights(state, best)
            print(f"resumed weights from {best}")
        else:
            print("Will start from scratch")

    from scripts.common import pick_steps
    from stcd_tpu.parallel.spatial import make_spatial_seg_steps
    train_step, eval_step = pick_steps(
        mesh, model,
        lambda: make_seg_steps(model, augment=True, remat=args.remat,
                               accum_steps=args.accum_steps),
        lambda: make_spatial_seg_steps(model, mesh, augment=True), args)
    state, run_kwargs = resume_and_guard(args, state)
    state = place_state(mesh, state)  # TP/replicated placement on the mesh
    state, best, history = run_training(
        train_step, eval_step, state, train_loader, val_loader,
        n_epochs=args.n_epochs, save_dir=args.save_name, rng=rng,
        **run_kwargs)
    print(f"best IoU: {best:.4f}")


if __name__ == "__main__":
    main()

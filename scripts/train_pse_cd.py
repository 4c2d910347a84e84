"""Stage 2 — pseudo-change CD pretraining.

Parity with /root/reference/train_pse_cd.py: SegCD(resnet50) on
PSE_Dataset pairs labeled by pseudo_label_WHU/, loss BCE+Dice on
sigmoid(diff); gated utilities: ensemble reliability ranking
(--select_data, ref :87-126) and pseudo-label generation at threshold 0.7
into ff_label/ (--generate_label, ref :128-179).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from scripts.common import (base_parser, configure_host_transfer, make_mesh,
                            place_state, resume_and_guard)
from stcd_tpu.data.datasets import CDDataset, PSEDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.models import SegCD
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.loops import (
    generate_pseudo_labels,
    run_training,
    select_reliable,
)
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps


def init_seg_cd_net(args):
    dtype = jnp.bfloat16 if args.bf16 else None
    dec = tuple(int(c) for c in args.decoder_channels.split(","))
    model = SegCD(encoder_name=args.encoder, classes=1,
                  decoder_channels=dec, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    example = jnp.zeros((args.batch_size, args.img_height, args.img_width, 3))
    return model, rng, example


def main():
    args = base_parser("LEVIR", "runs/LEVIR-PseCD").parse_args()
    configure_host_transfer(args)
    print(args)
    mesh, sharding = make_mesh(args)

    model, rng, example = init_seg_cd_net(args)
    train_ds = PSEDataset(args.root_path, args.dataset_name, "train")
    val_ds = CDDataset(args.root_path, args.CDdataset_name, "val")
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.n_cpu, seed=args.seed,
                              sharding=sharding, drop_last=True)
    val_loader = DataLoader(val_ds, args.batch_size * 2, num_workers=args.n_cpu,
                            sharding=sharding)

    tx = optax.adam(poly_schedule(args.lr, args.n_epochs, max(len(train_loader), 1)))
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
        mgr = CheckpointManager(args.load_path)
        best = mgr.best_path()
        if best:
            state = mgr.load_weights(state, best)
            print(f"resumed weights from {best}")
        else:
            print("Will start from scratch")

    if args.select_data:
        # K=3 snapshot ensemble reliability ranking (ref train_pse_cd.py:87-126)
        mgr = CheckpointManager(args.load_path)
        import glob
        # "*_model" also matches "*_best_model" (a duplicate of the loaded
        # current weights) — keep only the plain epoch snapshots
        snaps = sorted(p for p in glob.glob(os.path.join(args.load_path, "*_model"))
                       if not p.endswith("_best_model"))[:3]
        states = [mgr.load_weights(state, s) for s in snaps] + [state]
        loader = DataLoader(CDDataset(args.root_path, args.CDdataset_name, "train"),
                            1, num_workers=args.n_cpu, sharding=None)
        select_reliable([eval_step] * len(states), states, loader,
                        os.path.join(args.root_path, args.CDdataset_name, "train", "list"))
        return

    if args.generate_label:
        loader = DataLoader(CDDataset(args.root_path, args.CDdataset_name, "train"),
                            1, num_workers=args.n_cpu, sharding=None,
                            drop_last=False)
        metrics = generate_pseudo_labels(
            eval_step, state, loader,
            os.path.join(args.root_path, args.CDdataset_name, "train", "ff_label"),
            threshold=0.7)
        print("pseudo-label metrics:", metrics)
        return

    state, run_kwargs = resume_and_guard(args, state)
    state = place_state(mesh, state)  # TP/replicated placement on the mesh
    state, best, history = run_training(
        train_step, eval_step, state, train_loader, val_loader,
        n_epochs=args.n_epochs, save_dir=args.save_name, rng=rng,
        **run_kwargs)
    print(f"best cd IoU: {best:.4f}")


if __name__ == "__main__":
    main()

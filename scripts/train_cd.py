"""define_G zoo training CLI — the reference's intended CDTrainer workflow.

The reference ships CDTrainer/CDEvaluator (models/trainer.py:22-371,
models/evaluator.py:19-193) as the config-driven harness for its bespoke
CD zoo, but both are dead code in its tree (broken `utils`/`misc.*`
imports — SURVEY.md headline facts). This CLI is the working equivalent
of the `main_cd.py`-style entry point those modules imply: argparse args
-> TrainerConfig -> CDTrainer.train_models() -> CDEvaluator score report
on the val split.

Data layout: {root}/{dataset}/{train,val}/{A,B,label,list/{split}.txt}
(CDDataset, ref data/dataset.py:169-212). ``--dataset_name synthetic``
runs on the in-memory SyntheticCDDataset for smoke/demo runs.

Training resumes automatically from {checkpoint_dir}/last_ckpt when one
exists (the reference trainer's own semantic, models/trainer.py:130-163).

Usage:
  python scripts/train_cd.py --net_G SNUNet --root_path data \
      --dataset_name LEVIR-CD --max_epochs 100 --loss ce --optimizer sgd \
      --checkpoint_dir runs/SNUNet [--augment] [--bf16]
  python scripts/train_cd.py --net_G SNUNet --checkpoint_dir runs/SNUNet \
      --eval_only [--vis_dir runs/SNUNet/vis]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import scripts.common  # noqa: F401  (STCD_FORCE_CPU + compile cache)

import jax.numpy as jnp

from stcd_tpu.data.datasets import CDDataset, SyntheticCDDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.train.trainer import CDEvaluator, CDTrainer, TrainerConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # the reference trainer's args object (models/trainer.py:24-127,
    # models/networks.py:26-57,138-215), defaults preserved
    p.add_argument("--net_G", default="base_transformer_pos_s4_dd8",
                   help="define_G key (ref models/networks.py:138-215)")
    p.add_argument("--n_class", type=int, default=2)
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--optimizer", default="sgd",
                   choices=("sgd", "adam", "adamw"))
    p.add_argument("--lr_policy", default="linear",
                   choices=("linear", "step", "exponential"))
    p.add_argument("--lr_decay_iters", type=int, default=50)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--loss", default="ce",
                   choices=("ce", "bce", "cd_loss", "fl", "miou", "mmiou"))
    p.add_argument("--multi_scale_train", action="store_true")
    p.add_argument("--multi_scale_infer", action="store_true")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--vis_dir", default=None,
                   help="prediction dump dir (default {checkpoint_dir}/vis)")
    # data
    p.add_argument("--root_path", default="data/")
    p.add_argument("--dataset_name", default="LEVIR-CD",
                   help="'synthetic' runs an in-memory smoke dataset")
    p.add_argument("--synthetic_length", type=int, default=8)
    p.add_argument("--n_cpu", type=int, default=4, help="host io threads")
    p.add_argument("--augment", action="store_true",
                   help="on-device photometric train augmentation "
                        "(ColorJitter/grayscale/blur, ref "
                        "data/dataset.py:404-411)")
    # compute
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype (params/BN stats stay fp32)")
    p.add_argument("--pp_stages", type=int, default=1,
                   help="GPipe pipeline parallelism over the BIT "
                        "transformer-decoder stack or the ChangeFormer "
                        "MiT encoder stages (parallel/pipeline.py)")
    p.add_argument("--pp_microbatches", type=int, default=0)
    p.add_argument("--tp_axis", type=int, default=1,
                   help="tensor parallelism over a 'model' mesh axis: "
                        "transformer attention/MLP Dense + wide conv "
                        "kernels sharded Megatron-style "
                        "(parallel/mesh.py param_sharding)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training; CDEvaluator on best_ckpt")
    p.add_argument("--eval_ckpt", default="best_ckpt",
                   choices=("best_ckpt", "last_ckpt"))
    return p


def make_loaders(args):
    if args.dataset_name == "synthetic":
        train_ds = SyntheticCDDataset(length=args.synthetic_length,
                                      size=args.img_size)
        val_ds = SyntheticCDDataset(length=max(args.synthetic_length // 2, 2),
                                    size=args.img_size, seed=1)
    else:
        train_ds = CDDataset(args.root_path, args.dataset_name, "train")
        val_ds = CDDataset(args.root_path, args.dataset_name, "val")
    train = DataLoader(train_ds, args.batch_size, shuffle=True,
                       num_workers=args.n_cpu, seed=args.seed, drop_last=True)
    val = DataLoader(val_ds, args.batch_size, num_workers=args.n_cpu)
    return {"train": train, "val": val}


def main():
    args = build_parser().parse_args()
    print(args)
    cfg = TrainerConfig(
        net_G=args.net_G, n_class=args.n_class, embed_dim=args.embed_dim,
        img_size=args.img_size, lr=args.lr, optimizer=args.optimizer,
        lr_policy=args.lr_policy, lr_decay_iters=args.lr_decay_iters,
        max_epochs=args.max_epochs, loss=args.loss,
        multi_scale_train=args.multi_scale_train,
        multi_scale_infer=args.multi_scale_infer,
        batch_size=args.batch_size, seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        vis_dir=args.vis_dir or os.path.join(args.checkpoint_dir, "vis"),
        dtype=jnp.bfloat16 if args.bf16 else None,
        augment=args.augment, pp_stages=args.pp_stages,
        pp_microbatches=args.pp_microbatches, tp_axis=args.tp_axis)
    loaders = make_loaders(args)

    if not args.eval_only:
        trainer = CDTrainer(cfg, loaders)
        trainer.train_models()
        print(f"training done; best val mF1 {trainer.best_val_acc:.4f} "
              f"@ epoch {trainer.best_epoch_id}")

    evaluator = CDEvaluator(cfg, loaders["val"])
    scores = evaluator.eval_models(args.eval_ckpt)
    print("val scores: " + " ".join(f"{k}={v:.4f}"
                                    for k, v in sorted(scores.items())))


if __name__ == "__main__":
    main()

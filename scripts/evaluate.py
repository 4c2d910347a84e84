"""Evaluate a checkpoint on a CD dataset: F1/IoU/OA/Precision/Recall +
optional prediction dump (the reference's inference entry, SURVEY.md §3.5).

Usage:
  python scripts/evaluate.py --root_path data --dataset_name LEVIR \
      --split val --load_path runs/STCD [--save_preds out_dir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from scripts.common import base_parser
from stcd_tpu.data.datasets import CDDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.models import SegCD
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.loops import evaluate, generate_pseudo_labels
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps


def main():
    p = base_parser("LEVIR", "runs/eval")
    p.add_argument("--split", default="val")
    p.add_argument("--save_preds", default=None)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization of the conv "
                        "compute (stcd_tpu/serving); calibrates on the "
                        "first batch of the eval set")
    args = p.parse_args()

    dec = tuple(int(c) for c in args.decoder_channels.split(","))
    dtype = jnp.bfloat16 if args.bf16 else None
    model = SegCD(encoder_name=args.encoder, classes=1, decoder_channels=dec,
                  dtype=dtype)
    example = jnp.zeros((1, args.img_height, args.img_width, 3))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (example, example), optax.sgd(0.0))
    mgr = CheckpointManager(args.load_path)
    best = mgr.best_path()
    if best is None:
        raise SystemExit(f"no *_best_model checkpoint under {args.load_path}")
    state = mgr.load_weights(state, best)
    print(f"loaded {best}")

    ds = CDDataset(args.root_path, args.dataset_name, args.split)
    loader = DataLoader(ds, args.batch_size, num_workers=args.n_cpu,
                        drop_last=False)
    if args.int8:
        from stcd_tpu.data.augment import eval_preprocess
        from stcd_tpu.metrics.confusion import confusion_matrix
        from stcd_tpu.serving import (calibrate_conv_scales, n_quantized_sites,
                                      quantize_fn)

        def base_fn(A, B):
            _, _, diff = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                eval_preprocess(A), eval_preprocess(B))
            return jax.nn.sigmoid(diff.astype(jnp.float32))

        first = next(iter(loader))
        scales = calibrate_conv_scales(base_fn, [(first["A"], first["B"])])
        print(f"int8: {n_quantized_sites(scales)}/{scales.shape[0]} "
              "conv sites quantized")
        qfwd = quantize_fn(base_fn, scales)

        @jax.jit
        def eval_step(_state, batch):
            probs = qfwd(batch["A"], batch["B"])
            cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                                  batch["label"].astype(jnp.int32), 2)
            return {"cm": cm, "probs": probs}
    else:
        _, eval_step = make_cd_steps(model, augment=False)
    if args.save_preds:
        metrics = generate_pseudo_labels(eval_step, state, loader,
                                         args.save_preds, args.threshold)
    else:
        metrics = evaluate(eval_step, state, loader)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()

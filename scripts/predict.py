"""Whole-scene change-map inference from two raster images of ANY size.

The reference's answer to large rasters is offline tiling to disk
(split.py:43-46) followed by per-tile inference inside gated train-script
blocks (train_stcd.py:137-204). This CLI replaces both: in-memory
tile/stitch sharded over the device mesh (stcd_tpu/data/tiled_inference).

Usage:
  python scripts/predict.py --image_a t1.png --image_b t2.png \
      --load_path runs/STCD --out change.png [--tile 256 --stride 128] \
      [--threshold 0.5] [--prob_out probs.npy]

Bespoke-zoo checkpoints (scripts/train_cd.py / CDTrainer): pass --net_G
with the define_G key; --load_path is then the CDTrainer checkpoint_dir
(best_ckpt preferred, last_ckpt fallback). The change probability is
softmax class-1 for n_class>=2 heads, sigmoid for 1-channel heads; the
final scale is used for multi-scale models (ref trainer.py:311).
  python scripts/predict.py --net_G SNUNet --load_path runs/SNUNet \
      --image_a t1.png --image_b t2.png --out change.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import scripts.common  # noqa: F401  (STCD_FORCE_CPU + compile cache)

import numpy as np

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.data.io import read_image, save_mask_png
from stcd_tpu.data.tiled_inference import predict_scene
from stcd_tpu.models import SegCD
from stcd_tpu.parallel.mesh import batch_sharding, create_mesh
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.state import create_train_state


def build_state(args):
    """Model + weights from args (shared with scripts/serve.py and
    scripts/export_model.py): SegCD by default, any define_G zoo model
    with --net_G; checkpoint resolution order is *_best_model,
    best_ckpt, last_ckpt, then an explicit path."""
    return build_model_and_state(args)[1]


def build_model_and_state(args):
    dtype = jnp.bfloat16 if args.bf16 else None
    if args.net_G:
        from stcd_tpu.models.factory import define_G
        model = define_G(args.net_G, n_class=args.n_class,
                         embed_dim=args.embed_dim, img_size=args.tile,
                         dtype=dtype)
    else:
        dec = tuple(int(c) for c in args.decoder_channels.split(","))
        model = SegCD(encoder_name=args.encoder, classes=1,
                      decoder_channels=dec, dtype=dtype)
    example = jnp.zeros((1, args.tile, args.tile, 3))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (example, example), optax.sgd(0.0))
    mgr = CheckpointManager(args.load_path)
    ckpt = mgr.best_path()
    if ckpt is None:
        # run dir without a *_best_model: CDTrainer's best_ckpt, then
        # last_ckpt (interrupted training), as the help text promises;
        # only treat load_path as an explicit checkpoint if it isn't a
        # run dir
        for name in ("best_ckpt", "last_ckpt"):
            cand = os.path.join(args.load_path, name)
            if os.path.isdir(cand):
                ckpt = cand
                break
        if ckpt is None:
            if os.path.exists(os.path.join(args.load_path, "_CHECKPOINT_METADATA")) \
                    or not os.path.isdir(args.load_path):
                ckpt = args.load_path
            else:
                sys.exit("no *_best_model, best_ckpt or last_ckpt under "
                         f"{args.load_path}")
    state = mgr.load_weights(state, ckpt)
    print(f"loaded {ckpt}")
    return model, state


def make_base_fn(args, state):
    """Change-probability forward (B,t,t,3)x2 -> (B,t,t,1) in [0,1]."""
    from stcd_tpu.data.augment import eval_preprocess

    if args.net_G:
        def base_fn(ta, tb):
            preds = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                eval_preprocess(ta), eval_preprocess(tb))
            if isinstance(preds, (list, tuple)):  # multi-scale: final only
                preds = preds[-1]
            preds = preds.astype(jnp.float32)
            if preds.shape[-1] > 1:
                # P(changed) = 1 - P(background); == softmax class 1 for
                # the binary n_class=2 heads
                sm = jax.nn.softmax(preds)
                return jnp.sum(sm[..., 1:], axis=-1, keepdims=True)
            return jax.nn.sigmoid(preds)
    else:
        def base_fn(ta, tb):
            _, _, diff = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                eval_preprocess(ta), eval_preprocess(tb))
            return jax.nn.sigmoid(diff.astype(jnp.float32))
    return base_fn


def add_model_args(p: argparse.ArgumentParser) -> None:
    """Model/checkpoint flags shared by predict.py and serve.py."""
    p.add_argument("--load_path", required=True,
                   help="checkpoint dir (best/last) or explicit checkpoint")
    p.add_argument("--encoder", default="resnet50")
    p.add_argument("--decoder_channels", default="256,128,64,32,16")
    p.add_argument("--net_G", default=None,
                   help="bespoke-zoo model key (stcd_tpu.models.factory."
                        "define_G); overrides the SegCD default — "
                        "--encoder/--decoder_channels are then ignored")
    p.add_argument("--n_class", type=int, default=2,
                   help="zoo head classes (with --net_G)")
    p.add_argument("--embed_dim", type=int, default=64,
                   help="zoo embed_dim (with --net_G)")
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization of the conv "
                        "compute (stcd_tpu/serving/quant.py; ~2x MXU rate "
                        "on v5e) — calibrates on the scene's own first "
                        "tiles, everything around the convs stays float")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_a", required=True)
    p.add_argument("--image_b", required=True)
    p.add_argument("--out", required=True, help="output change-mask PNG")
    p.add_argument("--prob_out", default=None, help="optional .npy of probs")
    p.add_argument("--stride", type=int, default=256)
    add_model_args(p)
    args = p.parse_args()

    a = read_image(args.image_a)
    b = read_image(args.image_b)
    assert a.shape == b.shape, f"scene shapes differ: {a.shape} vs {b.shape}"

    state = build_state(args)

    mesh = create_mesh(model=1)
    sharding = batch_sharding(mesh) if len(jax.devices()) > 1 else None

    base_fn = make_base_fn(args, state)

    if args.int8:
        from stcd_tpu.data.tiled_inference import tile_origins
        from stcd_tpu.serving import (calibrate_conv_scales, n_quantized_sites,
                                      quantize_fn)
        # slice just the calibration tiles — materializing the full scene
        # tile stack here (and again inside predict_scene) doubles the
        # peak memory on exactly the large rasters this CLI exists for
        cal = tile_origins(a.shape[0], a.shape[1], args.tile, args.stride)[:8]
        t = args.tile
        ca = jnp.asarray(np.stack([a[y:y + t, x:x + t] for y, x in cal]))
        cb = jnp.asarray(np.stack([b[y:y + t, x:x + t] for y, x in cal]))
        scales = calibrate_conv_scales(base_fn, [(ca, cb)])
        print(f"int8: {n_quantized_sites(scales)}/{scales.shape[0]} "
              "conv sites quantized")
        predict_fn = jax.jit(quantize_fn(base_fn, scales))
    else:
        predict_fn = jax.jit(base_fn)

    probs = predict_scene(
        predict_fn,
        a, b, tile=args.tile, stride=args.stride, sharding=sharding)
    mask = (probs[..., 0] > args.threshold).astype(np.uint8)
    save_mask_png(mask, args.out)
    if args.prob_out:
        np.save(args.prob_out, probs)
    changed = float(mask.mean())
    print(f"wrote {args.out} ({mask.shape[1]}x{mask.shape[0]}, "
          f"{changed:.2%} changed)")


if __name__ == "__main__":
    main()

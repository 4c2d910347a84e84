"""Export a trained CD model as a serialized StableHLO artifact for serving.

The reference has no serving/export story (checkpoints are raw torch
state_dicts, SURVEY.md §5); this is the TPU-native one: `jax.export`
captures the eval forward (weights baked in) as a portable, version-stable
StableHLO module that any JAX runtime — or anything that consumes
StableHLO — can load WITHOUT the model code:

    python scripts/export_model.py --load_path runs/stcd \
        --encoder resnet50 --batch_size 8 --out segcd.stablehlo

    # consumer side
    from jax import export
    fn = export.deserialize(open("segcd.stablehlo", "rb").read())
    mask_a, mask_b, change_logits = fn.call(a_batch, b_batch)

The exported signature is (A, B) NHWC float32 [0,1] un-normalized images;
ImageNet normalization is baked into the graph.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import common  # noqa: F401  (configures platform + cache)

import jax
import jax.numpy as jnp
from jax import export as jexport


def build_export(model, variables, height: int, width: int, batch: int,
                 normalize: bool = True, platforms=("cpu", "tpu")):
    """Capture the eval forward (weights closed over) as an Exported.

    ``platforms``: the artifact is lowered for each listed platform, so
    one file serves CPU canaries and TPU production alike."""
    from stcd_tpu.data.augment import eval_preprocess

    def forward(a, b):
        if normalize:
            a = eval_preprocess(a)
            b = eval_preprocess(b)
        return model.apply(variables, a, b)

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    return jexport.export(jax.jit(forward), platforms=platforms)(spec, spec)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", type=str, required=True,
                   help="checkpoint dir (best model is picked) or file")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--encoder", type=str, default="resnet50")
    p.add_argument("--decoder_channels", type=str, default="256,128,64,32,16")
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--raw_inputs", action="store_true",
                   help="skip baked-in ImageNet normalization")
    args = p.parse_args()

    from stcd_tpu.models import SegCD
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import TrainState, create_train_state, adam_poly

    model = SegCD(
        encoder_name=args.encoder, classes=1,
        decoder_channels=tuple(int(c) for c in args.decoder_channels.split(",")),
        dtype=jnp.bfloat16 if args.bf16 else None)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((1, args.img_height, args.img_width, 3)),) * 2,
        adam_poly(1e-3, 1, 1))
    mgr = CheckpointManager(args.load_path if os.path.isdir(args.load_path)
                            else (os.path.dirname(args.load_path) or "."))
    path = (args.load_path if not os.path.isdir(args.load_path)
            else mgr.best_path())
    if not path:
        raise FileNotFoundError(f"no checkpoint under {args.load_path}")
    state = mgr.load_weights(state, path)
    print(f"loaded {path}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exported = build_export(model, variables, args.img_height, args.img_width,
                            args.batch_size, normalize=not args.raw_inputs)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms})")

    # roundtrip smoke: deserialize and run one batch
    rt = jexport.deserialize(blob)
    outs = rt.call(jnp.zeros((args.batch_size, args.img_height, args.img_width, 3)),
                   jnp.zeros((args.batch_size, args.img_height, args.img_width, 3)))
    print("roundtrip outputs:", [tuple(o.shape) for o in outs])


if __name__ == "__main__":
    main()

"""Export a trained CD model as a serialized StableHLO artifact for serving.

The reference has no serving/export story (checkpoints are raw torch
state_dicts, SURVEY.md §5); this is the TPU-native one: `jax.export`
captures the eval forward (weights baked in) as a portable, version-stable
StableHLO module that any JAX runtime — or anything that consumes
StableHLO — can load WITHOUT the model code:

    python scripts/export_model.py --load_path runs/stcd \
        --encoder resnet50 --batch_size 8 --out segcd.stablehlo

    # any define_G zoo model (ref models/networks.py:138-215 keys):
    python scripts/export_model.py --load_path runs/SNUNet --net_G SNUNet \
        --batch_size 8 --out snunet.stablehlo

    # int8 serving forward (stcd_tpu/serving/quant.py) with the
    # calibration scales BAKED into the artifact:
    python scripts/export_model.py --load_path runs/stcd --int8 \
        --calib_npz calib.npz --out segcd_int8.stablehlo

    # consumer side
    from jax import export
    fn = export.deserialize(open("segcd.stablehlo", "rb").read())
    outs = fn.call(a_batch, b_batch)

Signatures: the default SegCD export returns (mask_a, mask_b,
change_logits); `--net_G` and/or `--int8` export the SERVING forward
(the same probability map `predict.py` computes: (B, H, W, 1) in [0,1],
multi-scale heads reduced to the final scale, n_class>1 heads
softmax-reduced to P(changed)). Inputs are NHWC float32 [0,1]
un-normalized images; ImageNet normalization is baked into the graph.
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


def build_serving_export(base_fn, height: int, width: int, batch: int,
                         platforms=("cpu", "tpu")):
    """Capture a serving forward (predict.make_base_fn — probability map,
    optionally already int8-quantized via serving.quantize_fn) as an
    Exported. Quantization interception happens at TRACE time, so the
    s8 conv compute and the calibration scales are baked into the
    StableHLO."""
    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    return jexport.export(jax.jit(base_fn), platforms=platforms)(spec, spec)


def _calibration_batches(args):
    """Calibration pairs for --int8: --calib_npz arrays 'A'/'B' of shape
    (n, H, W, 3) float in [0, 1]; without it, a uniform-random pair with
    a loud warning (valid artifact, unrepresentative scales)."""
    import numpy as np

    h, w = args.img_height, args.img_width
    if args.calib_npz:
        data = np.load(args.calib_npz)
        a, b = np.asarray(data["A"], np.float32), np.asarray(data["B"],
                                                             np.float32)
        assert a.shape[1:] == (h, w, 3) and b.shape == a.shape, (
            f"calib arrays must be (n, {h}, {w}, 3); got {a.shape}")
        return [(jnp.asarray(a), jnp.asarray(b))]
    print("warning: --int8 without --calib_npz calibrates on RANDOM "
          "inputs — export real tiles for production scales", flush=True)
    rng = np.random.default_rng(0)
    shape = (max(2, args.batch_size), h, w, 3)
    return [(jnp.asarray(rng.uniform(size=shape), jnp.float32),
             jnp.asarray(rng.uniform(size=shape), jnp.float32))]


def main():
    import predict

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--raw_inputs", action="store_true",
                   help="skip baked-in ImageNet normalization (default "
                        "SegCD logits export only)")
    p.add_argument("--calib_npz", default=None,
                   help="npz with 'A'/'B' (n,H,W,3) [0,1] calibration "
                        "tiles for --int8")
    predict.add_model_args(p)  # --load_path --net_G --int8 --bf16 ...
    args = p.parse_args()
    args.tile = args.img_height  # zoo img_size follows the export height

    model, state = predict.build_model_and_state(args)

    if args.net_G or args.int8:
        # serving forward: the same probability map predict.py serves
        base_fn = predict.make_base_fn(args, state)
        if args.int8:
            from stcd_tpu.serving import (calibrate_conv_scales,
                                          n_quantized_sites, quantize_fn)
            scales = calibrate_conv_scales(base_fn,
                                           _calibration_batches(args))
            print(f"int8: {n_quantized_sites(scales)}/{scales.shape[0]} "
                  "conv sites quantized")
            base_fn = quantize_fn(base_fn, scales)
        exported = build_serving_export(base_fn, args.img_height,
                                        args.img_width, args.batch_size)
    else:
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        exported = build_export(model, variables, args.img_height,
                                args.img_width, args.batch_size,
                                normalize=not args.raw_inputs)

    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms})")

    # roundtrip smoke: deserialize and run one batch
    rt = jexport.deserialize(blob)
    zeros = jnp.zeros((args.batch_size, args.img_height, args.img_width, 3))
    outs = rt.call(zeros, zeros)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    print("roundtrip outputs:", [tuple(o.shape) for o in outs])


if __name__ == "__main__":
    main()

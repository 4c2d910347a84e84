"""Convert torchvision .pth encoder weights to a flax msgpack checkpoint.

Usage:
  python scripts/convert_weights.py resnet50 /path/resnet50-0676ba61.pth out.msgpack
  python scripts/convert_weights.py vgg16 /path/vgg16-397923af.pth out.msgpack

The reference always trains from encoder_weights="imagenet"
(train_sup.py:303); on zero-egress TPU hosts the .pth files must be staged
and converted offline with this tool, then loaded via
stcd_tpu.convert.torch_to_flax.apply_encoder_weights.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flax import serialization

from stcd_tpu.convert.torch_to_flax import (
    convert_resnet,
    convert_unetseg,
    convert_vgg16_features,
    load_torch_state_dict,
)

_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
           "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
           "resnet152": (3, 8, 36, 3)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("arch", choices=list(_LAYERS) + ["vgg16"]
                   + [f"segcd_{n}" for n in _LAYERS])
    p.add_argument("torch_path")
    p.add_argument("out_path")
    args = p.parse_args()
    sd = load_torch_state_dict(args.torch_path)
    if args.arch == "vgg16":
        payload = {"params": convert_vgg16_features(sd)}
    elif args.arch.startswith("segcd_"):
        # full reference-trained SegCD/UnetSeg checkpoint
        params, stats = convert_unetseg(sd, _LAYERS[args.arch[len("segcd_"):]])
        payload = {"params": params, "batch_stats": stats}
    else:
        params, stats = convert_resnet(sd, _LAYERS[args.arch])
        payload = {"params": params, "batch_stats": stats}
    with open(args.out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()

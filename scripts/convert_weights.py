"""Convert upstream .pth encoder weights to a flax msgpack checkpoint.

Usage:
  python scripts/convert_weights.py resnet50 /path/resnet50-0676ba61.pth out.msgpack
  python scripts/convert_weights.py efficientnet-b4 /path/efficientnet-b4.pth out.msgpack
  python scripts/convert_weights.py mit_b2 /path/mit_b2.pth out.msgpack

The reference always trains from encoder_weights="imagenet"
(train_sup.py:303); on zero-egress TPU hosts the .pth files must be staged
and converted offline with this tool. Write the output to
$STCD_PRETRAINED_DIR/{encoder_name}.msgpack and every training script's
--encoder_weights imagenet (or create_model(encoder_weights="imagenet"))
resolves it automatically (stcd_tpu.convert.pretrained).

Covered families: resnet18..152 + resnext50/101 (torchvision/Instagram
naming), vgg11/13/16/19 ± _bn (torchvision; `vgg16_features` emits the
DSIFN tap-extractor tree instead), efficientnet-b0..b7
(efficientnet_pytorch naming), timm-efficientnet-b0..b8/l2 +
timm-tf_efficientnet_lite0..4 (timm naming), mobilenet_v2 (torchvision),
timm-mobilenetv3_* (timm naming), se_resnet50/101/152 +
se_resnext50/101_32x4d + senet154 (pretrainedmodels naming),
densenet121/161/169/201 (torchvision incl. legacy key renames),
mit_b0..b5 (SegFormer naming), mobileone_s0..s4 (official train-form,
golden vs the reference's own vendored code), timm-res2net*/res2next50,
timm-resnest*, timm-skresnet18/34 + timm-skresnext50_32x4d,
timm-regnetx/y_002..320, timm-gernet_s/m/l (timm 0.6.x naming),
dpn68..131 + xception + inceptionv4 + inceptionresnetv2
(pretrainedmodels naming), plus full reference-trained segcd_*
checkpoints. Every encoder family in the registry now has a converter.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flax import serialization

from stcd_tpu.convert.torch_to_flax import (
    convert_densenet,
    convert_efficientnet,
    convert_mix_transformer,
    convert_timm_efficientnet,
    convert_dpn,
    convert_inceptionresnetv2,
    convert_inceptionv4,
    convert_mobilenet_v2,
    convert_mobilenet_v3,
    convert_mobileone,
    convert_timm_gernet,
    convert_timm_regnet,
    convert_timm_res2net,
    convert_timm_resnest,
    convert_timm_sknet,
    convert_resnet,
    convert_senet,
    convert_unetseg,
    convert_vgg,
    convert_xception,
    convert_vgg16_features,
    load_torch_state_dict,
)

_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
           "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
           "resnet152": (3, 8, 36, 3),
           # resnext (torchvision/Instagram-WSL): identical key layout —
           # convert_resnet is shape-driven, kernels carry the group widths
           "resnext50_32x4d": (3, 4, 6, 3), "resnext101_32x4d": (3, 4, 23, 3),
           "resnext101_32x8d": (3, 4, 23, 3),
           "resnext101_32x16d": (3, 4, 23, 3),
           "resnext101_32x32d": (3, 4, 23, 3),
           "resnext101_32x48d": (3, 4, 23, 3)}

_EFFNETS = [f"efficientnet-b{i}" for i in range(8)]
_TIMM_EFFNETS = [f"timm-efficientnet-b{i}" for i in range(9)] + \
    ["timm-efficientnet-l2"] + \
    [f"timm-tf_efficientnet_lite{i}" for i in range(5)]
_MV3 = [f"timm-mobilenetv3_{m}_{t}" for m in ("large", "small")
        for t in ("075", "100", "minimal_100")]
_SENETS = ["se_resnet50", "se_resnet101", "se_resnet152",
           "se_resnext50_32x4d", "se_resnext101_32x4d", "senet154"]
_DENSENETS = ["densenet121", "densenet161", "densenet169", "densenet201"]
_MITS = [f"mit_b{i}" for i in range(6)]
_MOBILEONES = [f"mobileone_s{i}" for i in range(5)]
_VGGS = [f"vgg{n}{sfx}" for n in (11, 13, 16, 19) for sfx in ("", "_bn")]
_RES2NETS = (["timm-res2net50_" + v for v in
              ("14w_8s", "26w_4s", "26w_6s", "26w_8s", "48w_2s")]
             + ["timm-res2net101_26w_4s", "timm-res2next50"])
_RESNESTS = (["timm-resnest" + v for v in
              ("14d", "26d", "50d", "101e", "200e", "269e")]
             + ["timm-resnest50d_1s4x24d", "timm-resnest50d_4s2x40d"])
_SKNETS = ["timm-skresnet18", "timm-skresnet34", "timm-skresnext50_32x4d"]
_REGNETS = [f"timm-regnet{xy}_{w:03d}" for xy in "xy"
            for w in (2, 4, 6, 8, 16, 32, 40, 64, 80, 120, 160, 320)]
_GERNETS = ["timm-gernet_s", "timm-gernet_m", "timm-gernet_l"]
_DPNS = ["dpn68", "dpn68b", "dpn92", "dpn98", "dpn107", "dpn131"]
_CADENE_MISC = ["xception", "inceptionv4", "inceptionresnetv2"]


def convert(arch: str, sd) -> dict:
    """Dispatch an arch name to its converter; returns the msgpack payload."""
    if arch == "vgg16_features":
        # DSIFN's vgg16_base tap extractor (NOT the smp encoder tree)
        return {"params": convert_vgg16_features(sd)}
    if arch in _VGGS:
        params, stats = convert_vgg(sd)
        return {"params": params, "batch_stats": stats}
    if arch.startswith("segcd_"):
        params, stats = convert_unetseg(sd, _LAYERS[arch[len("segcd_"):]])
        return {"params": params, "batch_stats": stats}
    if arch in _LAYERS:
        params, stats = convert_resnet(sd, _LAYERS[arch])
        return {"params": params, "batch_stats": stats}
    if arch in _EFFNETS:
        params, stats = convert_efficientnet(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _TIMM_EFFNETS:
        # timm checkpoints use conv_stem/blocks.{s}.{b} naming, NOT the
        # efficientnet_pytorch _conv_stem/_blocks.N naming
        params, stats = convert_timm_efficientnet(sd)
        return {"params": params, "batch_stats": stats}
    if arch == "mobilenet_v2":
        params, stats = convert_mobilenet_v2(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _MV3:
        params, stats = convert_mobilenet_v3(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _SENETS:
        params, stats = convert_senet(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _DENSENETS:
        params, stats = convert_densenet(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _MITS:
        return {"params": convert_mix_transformer(sd)}
    if arch in _MOBILEONES:
        params, stats = convert_mobileone(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _RES2NETS:
        params, stats = convert_timm_res2net(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _RESNESTS:
        params, stats = convert_timm_resnest(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _SKNETS:
        params, stats = convert_timm_sknet(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _REGNETS:
        params, stats = convert_timm_regnet(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _GERNETS:
        params, stats = convert_timm_gernet(sd)
        return {"params": params, "batch_stats": stats}
    if arch in _DPNS:
        params, stats = convert_dpn(sd)
        return {"params": params, "batch_stats": stats}
    if arch == "xception":
        params, stats = convert_xception(sd)
        return {"params": params, "batch_stats": stats}
    if arch == "inceptionv4":
        params, stats = convert_inceptionv4(sd)
        return {"params": params, "batch_stats": stats}
    if arch == "inceptionresnetv2":
        params, stats = convert_inceptionresnetv2(sd)
        return {"params": params, "batch_stats": stats}
    raise KeyError(arch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("arch", choices=(list(_LAYERS) + ["vgg16_features"]
                                    + _VGGS
                                    + [f"segcd_{n}" for n in _LAYERS]
                                    + _EFFNETS + _TIMM_EFFNETS
                                    + ["mobilenet_v2"] + _MV3
                                    + _SENETS + _DENSENETS + _MITS
                                    + _MOBILEONES + _RES2NETS + _RESNESTS
                                    + _SKNETS + _REGNETS + _GERNETS + _DPNS
                                    + _CADENE_MISC))
    p.add_argument("torch_path")
    p.add_argument("out_path")
    args = p.parse_args()
    sd = load_torch_state_dict(args.torch_path)
    payload = convert(args.arch, sd)
    os.makedirs(os.path.dirname(args.out_path) or ".", exist_ok=True)
    with open(args.out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()

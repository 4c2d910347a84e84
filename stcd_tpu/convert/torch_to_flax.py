"""torch -> Flax weight conversion for the encoder zoo.

Accuracy parity depends on ImageNet-pretrained encoders
(encoder_weights="imagenet" in every reference init_* — train_sup.py:303);
TPU hosts have no torch-hub egress, so weights arrive as torch state_dicts
(.pth) converted offline with this module.

Supported layouts:
- torchvision ResNet state_dict ("conv1.weight", "bn1.*",
  "layer{1..4}.{i}.conv{1..3}.*", "...downsample.{0,1}.*")
  -> stcd_tpu.encoders.resnet.ResNetEncoder params/batch_stats.
- torchvision VGG16 features ("features.{idx}.weight/bias")
  -> stcd_tpu.encoders.vgg.VGG16Features / VGGEncoder.

Conventions: torch conv weights are OIHW -> flax HWIO; BN {weight,bias,
running_mean,running_var} -> {scale,bias} + batch_stats {mean,var};
Linear weights transpose.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def convert_resnet(sd: Dict[str, Any], layers_per_stage) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) pytrees for ResNetEncoder.

    ``layers_per_stage``: e.g. (2,2,2,2) for resnet18, (3,4,6,3) for resnet50.
    """
    sd = {k: v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers_per_stage, start=1):
        lp: dict = {}
        ls: dict = {}
        for bi in range(n_blocks):
            bp: dict = {}
            bs: dict = {}
            base = f"layer{li}.{bi}"
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"kernel": _conv(sd[f"{base}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[f"{base}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.1")
            lp[f"block{bi}"] = bp
            ls[f"block{bi}"] = bs
        params[f"layer{li}"] = lp
        stats[f"layer{li}"] = ls
    return params, stats


# torchvision vgg16 (no BN) conv indices in .features
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vgg16_features(sd: Dict[str, Any]) -> dict:
    """torchvision vgg16 .features -> VGG16Features params (13 convs)."""
    params = {}
    for our_idx, tv_idx in enumerate(_VGG16_CONV_IDX):
        params[f"conv{our_idx}"] = {
            "kernel": _conv(sd[f"features.{tv_idx}.weight"]),
            "bias": np.asarray(sd[f"features.{tv_idx}.bias"]),
        }
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict into numpy (torch required only here)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def apply_encoder_weights(variables: dict, encoder_path: Tuple[str, ...],
                          params: dict, stats: dict) -> dict:
    """Graft converted encoder weights into a model's variables dict at
    ``encoder_path`` (e.g. ("encoder",)). Returns a new variables dict."""
    import jax

    def set_at(tree, path, sub):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = sub

    new_params = _merge(_get(variables["params"], encoder_path), params)
    # BatchNorm-free encoders (mit_b0..b5 are LayerNorm-only) create no
    # batch_stats subtree at encoder_path — tolerate its absence instead
    # of KeyError'ing the whole graft.
    stats_tpl = _get_or_none(variables.get("batch_stats", {}), encoder_path)
    if stats_tpl is None and stats:
        raise ValueError(
            f"payload carries batch_stats but the model has none at "
            f"{'/'.join(encoder_path)} — converted weights for a different "
            "encoder family?")
    vp = _to_mutable(variables["params"])
    set_at(vp, encoder_path, new_params)
    out = {"params": vp}
    if "batch_stats" in variables:
        vs = _to_mutable(variables["batch_stats"])
        if stats_tpl is not None:
            set_at(vs, encoder_path, _merge(stats_tpl, stats))
        out["batch_stats"] = vs
    return out


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _get_or_none(tree, path):
    """_get, but None (not KeyError) when the path is absent."""
    for p in path:
        if not isinstance(tree, dict) or p not in tree:
            return None
        tree = tree[p]
    return tree


def _merge(template, new):
    """Structural merge with shape checks (template wins on missing keys)."""
    out = dict(_to_mutable(template))
    for k, v in new.items():
        if isinstance(v, dict):
            out[k] = _merge(template.get(k, {}), v)
        else:
            t = template.get(k)
            if t is not None and tuple(np.shape(t)) != tuple(np.shape(v)):
                raise ValueError(f"shape mismatch at {k}: "
                                 f"{np.shape(t)} vs {np.shape(v)}")
            out[k] = np.asarray(v)
    return out


def _conv_block(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """smp Conv2dReLU Sequential: {prefix}.0 = conv, {prefix}.1 = bn."""
    params = {"conv": {"kernel": _conv(sd[prefix + ".0.weight"])}}
    if prefix + ".0.bias" in sd:
        params["conv"]["bias"] = np.asarray(sd[prefix + ".0.bias"])
    stats = {}
    if prefix + ".1.weight" in sd and prefix + ".1.running_mean" in sd:
        params["bn"], stats["bn"] = _bn(sd, prefix + ".1")
    return params, stats


def convert_unet_decoder(sd: Dict[str, Any], n_blocks: int = 5,
                         prefix: str = "decoder") -> Tuple[dict, dict]:
    """smp UnetDecoder state_dict -> our UnetDecoder params/batch_stats.

    smp names: decoder.blocks.{i}.conv{1,2}.{0=conv,1=bn}.*
    (ref decoders/unet/decoder.py:8-43); ours: block{i}/conv{1,2}/{conv,bn}.
    """
    params, stats = {}, {}
    for i in range(n_blocks):
        bp, bs = {}, {}
        for cname in ("conv1", "conv2"):
            p, s = _conv_block(sd, f"{prefix}.blocks.{i}.{cname}")
            bp[cname] = p
            bs[cname] = s
        params[f"block{i}"] = {c: bp[c] for c in ("conv1", "conv2")}
        stats[f"block{i}"] = {c: bs[c] for c in ("conv1", "conv2") if bs[c]}
    return params, stats


def convert_unetseg(sd: Dict[str, Any], layers_per_stage,
                    n_blocks: int = 5) -> Tuple[dict, dict]:
    """Full smp UnetSeg/SegCD/FFCTLCD state_dict -> (params, batch_stats)
    for stcd_tpu.models.segcd models (encoder. + decoder. + segmentation_head.).

    Enables loading reference-trained checkpoints
    (torch.save(model.module.state_dict()), ref train_sup.py:175-183).
    """
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    enc_p, enc_s = convert_resnet(enc_sd, layers_per_stage)
    dec_p, dec_s = convert_unet_decoder(sd, n_blocks)
    head = {"conv": {"kernel": _conv(sd["segmentation_head.0.weight"]),
                     "bias": np.asarray(sd["segmentation_head.0.bias"])}}
    params = {"encoder": enc_p, "decoder": dec_p, "segmentation_head": head}
    stats = {"encoder": enc_s, "decoder": dec_s}
    return params, stats


def convert_cdnet(sd: Dict[str, Any]) -> dict:
    """smp CDNet head state_dict -> stcd_tpu.models.CDNet params (no BN).

    Ref unet/model.py:174-238: AttBlock = Sequential(conv3x3, ReLU,
    ChannelSpatialSELayer) then cd1/cd2. The Deconv{1..5} Block params are
    dead code in the reference (Block.forward returns abs(x1-x2) without
    touching its conv, :223-238) and are skipped.
    """
    def conv(prefix):
        return {"kernel": _conv(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"])}

    def fc(prefix):
        return {"kernel": _dense(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"])}

    return {
        "att_conv": conv("AttBlock.block.0"),
        "att_se": {"cSE": {"fc1": fc("AttBlock.block.2.cSE.fc1"),
                           "fc2": fc("AttBlock.block.2.cSE.fc2")},
                   "sSE": {"conv": conv("AttBlock.block.2.sSE.conv")}},
        "cd1": conv("cd1"),
        "cd2": conv("cd2"),
    }


def _convT_2x(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> flax
    nn.ConvTranspose(transpose_kernel=True) kernel (kH, kW, O, I)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convT_s1_as_conv(w) -> np.ndarray:
    """Stride-1 ConvTranspose2d(k=3, p=1) == Conv2d with the spatially
    flipped, IO-swapped kernel (see stcd_tpu.models.siam_unet docstring).
    torch (I, O, kH, kW) -> flax nn.Conv HWIO (kH, kW, I, O) after flip."""
    w = np.flip(np.asarray(w), (2, 3))
    return np.transpose(w, (2, 3, 0, 1))


_SIAM_STAGE_CONVS = (2, 2, 3, 3)
_SIAM_DEC_NAMES = {3: ("conv43d", "conv42d", "conv41d"),
                   2: ("conv33d", "conv32d", "conv31d"),
                   1: ("conv22d", "conv21d")}


def convert_siam_unet(sd: Dict[str, Any], fusion: str = "diff"
                      ) -> Tuple[dict, dict]:
    """FC-EF / FC-Siam state_dict (ref models/{Unet,SiamUnet_*}.py) ->
    stcd_tpu.models.siam_unet.SiamUnet params/batch_stats.

    Encoder convs are Conv2d; ALL decoder convs in the reference are
    ConvTranspose2d — stride-2 upconvs map onto our ConvTranspose2x
    (transpose_kernel=True) and stride-1 `conv*d` layers onto nn.Conv via
    the flip+swap equivalence.
    """
    def cbdr(name):
        p = {"conv": {"kernel": _conv(sd[f"{name}.weight"]),
                      "bias": np.asarray(sd[f"{name}.bias"])}}
        bn_p, bn_s = _bn(sd, "bn" + name[len("conv"):])
        p["bn"] = bn_p
        return p, {"bn": bn_s}

    def cbdr_transposed(name):
        p = {"conv": {"kernel": _convT_s1_as_conv(sd[f"{name}.weight"]),
                      "bias": np.asarray(sd[f"{name}.bias"])}}
        bn_p, bn_s = _bn(sd, "bn" + name[len("conv"):])
        p["bn"] = bn_p
        return p, {"bn": bn_s}

    params, stats = {"encoder": {}}, {"encoder": {}}
    for s, n in enumerate(_SIAM_STAGE_CONVS):
        for i in range(n):
            name = f"conv{s + 1}{i + 1}"
            params["encoder"][name], stats["encoder"][name] = cbdr(name)

    for stage, names in _SIAM_DEC_NAMES.items():
        up = f"upconv{stage + 1}"
        params[up] = {"ConvTranspose_0": {
            "kernel": _convT_2x(sd[f"{up}.weight"]),
            "bias": np.asarray(sd[f"{up}.bias"])}}
        for name in names:
            params[name], stats[name] = cbdr_transposed(name)

    params["upconv1"] = {"ConvTranspose_0": {
        "kernel": _convT_2x(sd["upconv1.weight"]),
        "bias": np.asarray(sd["upconv1.bias"])}}
    params["conv12d"], stats["conv12d"] = cbdr_transposed("conv12d")
    params["conv11d"] = {"kernel": _convT_s1_as_conv(sd["conv11d.weight"]),
                         "bias": np.asarray(sd["conv11d.bias"])}

    if fusion == "crossconc":
        for s in range(1, 5):
            # ref cross_conc{s} (SiamUnet_crossconc.py:11-33,119-122):
            # diff = Sequential(grouped Conv 2C->C, BN, ReLU),
            # conv_res = Sequential(Conv C->C, BN), final ReLU
            base = f"cross_conc{s}"
            p = {"diff_conv": {"kernel": _conv(sd[f"{base}.diff.0.weight"]),
                               "bias": np.asarray(sd[f"{base}.diff.0.bias"])},
                 "res_conv": {"kernel": _conv(sd[f"{base}.conv_res.0.weight"]),
                              "bias": np.asarray(sd[f"{base}.conv_res.0.bias"])}}
            s_ = {}
            p["diff_bn"], s_["diff_bn"] = _bn(sd, f"{base}.diff.1")
            p["res_bn"], s_["res_bn"] = _bn(sd, f"{base}.conv_res.1")
            params[base], stats[base] = p, s_
    return params, stats


def convert_snunet(sd: Dict[str, Any], ecam: bool = True) -> Tuple[dict, dict]:
    """Reference SNUNet state_dict (models/SNUNet.py SNUNet_ECAM /
    Siam_NestedUNet_Conc) -> stcd_tpu.models.snunet params/batch_stats."""
    body_p, body_s = {}, {}
    nodes = (["conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0"]
             + [f"conv{i}_{j}" for j in (1, 2, 3, 4) for i in range(4 - j + 1)])
    for name in nodes:
        p, s = {}, {}
        for c in ("conv1", "conv2"):
            p[c] = {"kernel": _conv(sd[f"{name}.{c}.weight"]),
                    "bias": np.asarray(sd[f"{name}.{c}.bias"])}
        for b in ("bn1", "bn2"):
            p[b], s[b] = _bn(sd, f"{name}.{b}")
        body_p[name], body_s[name] = p, s
    ups = [f"Up{i}_{j}" for j in (0, 1, 2, 3) for i in (1, 2, 3, 4)]
    for name in ups:
        k = f"{name}.up.weight"
        if k in sd:
            body_p[name] = {"ConvTranspose_0": {
                "kernel": _convT_2x(sd[k]),
                "bias": np.asarray(sd[f"{name}.up.bias"])}}
    params = {"body": body_p}
    stats = {"body": body_s}
    if ecam:
        for att in ("ca", "ca1"):
            params[att] = {
                "fc1": {"kernel": _conv(sd[f"{att}.fc1.weight"])},
                "fc2": {"kernel": _conv(sd[f"{att}.fc2.weight"])}}
    else:
        for i in (1, 2, 3, 4):
            params[f"final{i}"] = {
                "kernel": _conv(sd[f"final{i}.weight"]),
                "bias": np.asarray(sd[f"final{i}.bias"])}
    params["conv_final"] = {"kernel": _conv(sd["conv_final.weight"]),
                            "bias": np.asarray(sd["conv_final.bias"])}
    return params, stats


def _dense(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))  # torch (O, I) -> flax (I, O)


def _two_layer_conv(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """help_funcs TwoLayerConv2d Sequential(conv bias=False, BN, ReLU, conv)."""
    p = {"conv1": {"kernel": _conv(sd[f"{prefix}.0.weight"])},
         "conv2": {"kernel": _conv(sd[f"{prefix}.3.weight"]),
                   "bias": np.asarray(sd[f"{prefix}.3.bias"])}}
    p["bn"], s = _bn(sd, f"{prefix}.1")
    return p, {"bn": s}


def _bit_transformer(sd: Dict[str, Any], prefix: str, depth: int,
                     cross: bool) -> dict:
    """help_funcs Transformer / TransformerDecoder state_dict -> our
    models.bit.Transformer/TransformerDecoder params. Layer i keys:
    {prefix}.layers.{i}.0 = Residual(PreNorm(Attention/Cross_Attention)),
    {prefix}.layers.{i}.1 = Residual(PreNorm(FeedForward))."""
    out = {}
    for i in range(depth):
        a = f"{prefix}.layers.{i}.0.fn"
        f = f"{prefix}.layers.{i}.1.fn"
        out[f"norm_attn{i}"] = {"scale": np.asarray(sd[f"{a}.norm.weight"]),
                                "bias": np.asarray(sd[f"{a}.norm.bias"])}
        if cross:
            attn = {k: {"kernel": _dense(sd[f"{a}.fn.{k}.weight"])}
                    for k in ("to_q", "to_k", "to_v")}
        else:
            attn = {"to_qkv": {"kernel": _dense(sd[f"{a}.fn.to_qkv.weight"])}}
        attn["to_out"] = {"kernel": _dense(sd[f"{a}.fn.to_out.0.weight"]),
                          "bias": np.asarray(sd[f"{a}.fn.to_out.0.bias"])}
        out[f"attn{i}"] = attn
        out[f"norm_ff{i}"] = {"scale": np.asarray(sd[f"{f}.norm.weight"]),
                              "bias": np.asarray(sd[f"{f}.norm.bias"])}
        out[f"ff{i}"] = {
            "Dense_0": {"kernel": _dense(sd[f"{f}.fn.net.0.weight"]),
                        "bias": np.asarray(sd[f"{f}.fn.net.0.bias"])},
            "Dense_1": {"kernel": _dense(sd[f"{f}.fn.net.3.weight"]),
                        "bias": np.asarray(sd[f"{f}.fn.net.3.bias"])}}
    return out


def convert_bit(sd: Dict[str, Any], layers_per_stage=(2, 2, 2, 2),
                enc_depth: int = 1, dec_depth: int = 1,
                resnet_stages_num: int = 5) -> Tuple[dict, dict]:
    """Reference BIT (networks.py BASE_Transformer / ResNet) state_dict ->
    stcd_tpu.models.bit.BASETransformer / ResNetCD params/batch_stats.

    resnet_stages_num < 5 drops the torchvision layers the dilated
    backbone never runs (forward_single stops at layer{stages-1},
    ref networks.py:291-296)."""
    resnet_sd = {k[len("resnet."):]: v for k, v in sd.items()
                 if k.startswith("resnet.")}
    enc_p, enc_s = convert_resnet(resnet_sd,
                                  layers_per_stage[:resnet_stages_num - 1])
    params = {"backbone": {
        "ResNetEncoder_0": enc_p,
        "conv_pred": {"kernel": _conv(sd["conv_pred.weight"]),
                      "bias": np.asarray(sd["conv_pred.bias"])}}}
    stats = {"backbone": {"ResNetEncoder_0": enc_s}}
    params["classifier"], stats["classifier"] = _two_layer_conv(sd, "classifier")
    if "conv_a.weight" in sd:
        params["conv_a"] = {"kernel": _conv(sd["conv_a.weight"])}
    if "pos_embedding" in sd:
        params["pos_embedding"] = np.asarray(sd["pos_embedding"])
    if "pos_embedding_decoder" in sd:  # (1, C, H, W) -> (1, H, W, C)
        params["pos_embedding_decoder"] = np.transpose(
            np.asarray(sd["pos_embedding_decoder"]), (0, 2, 3, 1))
    if any(k.startswith("transformer.") for k in sd):
        params["transformer"] = _bit_transformer(
            sd, "transformer", enc_depth, cross=False)
    if any(k.startswith("transformer_decoder.") for k in sd):
        params["transformer_decoder"] = _bit_transformer(
            sd, "transformer_decoder", dec_depth, cross=True)
    return params, stats


def _ln(sd: Dict[str, Any], prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _linear(sd: Dict[str, Any], prefix: str) -> dict:
    p = {"kernel": _dense(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _conv_b(sd: Dict[str, Any], prefix: str) -> dict:
    p = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def convert_changeformer_v6(sd: Dict[str, Any],
                            depths=(3, 3, 4, 3)) -> Tuple[dict, dict]:
    """Reference ChangeFormerV6 state_dict (ChangeFormer.py:1669-1701:
    EncoderTransformer_v3 'Tenc_x2' + DecoderTransformer_v3 'TDec_x2') ->
    stcd_tpu.models.changeformer.ChangeFormerV6 params/batch_stats."""
    enc_p = _convert_mit_encoder(sd, "Tenc_x2", depths)

    dec_p: dict = {}
    dec_s: dict = {}
    for k in (1, 2, 3, 4):
        dec_p[f"linear_c{k}"] = _linear(sd, f"TDec_x2.linear_c{k}.proj")
        dc, ds = {}, {}
        for j, off in ((0, 0), (1, 4)):
            base = f"TDec_x2.diff_c{k}"
            dc[f"conv{j}"] = _conv_b(sd, f"{base}.{off}")
            dc[f"prelu{j}"] = np.asarray(sd[f"{base}.{off + 1}.weight"])
            dc[f"bn{j}"], ds[f"bn{j}"] = _bn(sd, f"{base}.{off + 2}")
        dec_p[f"diff_c{k}"], dec_s[f"diff_c{k}"] = dc, ds
        mp = {"conv1": _conv_b(sd, f"TDec_x2.make_pred_c{k}.0"),
              "conv2": _conv_b(sd, f"TDec_x2.make_pred_c{k}.3")}
        mp["bn"], bn_s = _bn(sd, f"TDec_x2.make_pred_c{k}.2")
        dec_p[f"make_pred_c{k}"] = mp
        dec_s[f"make_pred_c{k}"] = {"bn": bn_s}
    dec_p["linear_fuse_conv"] = _conv_b(sd, "TDec_x2.linear_fuse.0")
    dec_p["linear_fuse_bn"], dec_s["linear_fuse_bn"] = _bn(
        sd, "TDec_x2.linear_fuse.1")
    for name in ("convd2x", "convd1x"):
        dec_p[name] = {"ConvTranspose_0": {
            "kernel": _convT_2x(sd[f"TDec_x2.{name}.conv2d.weight"]),
            "bias": np.asarray(sd[f"TDec_x2.{name}.conv2d.bias"])}}
    for name in ("dense_2x", "dense_1x"):
        dec_p[name] = {
            "conv1": _conv_b(sd, f"TDec_x2.{name}.0.conv1.conv2d"),
            "conv2": _conv_b(sd, f"TDec_x2.{name}.0.conv2.conv2d")}
    dec_p["change_probability"] = _conv_b(sd, "TDec_x2.change_probability.conv2d")
    return ({"Tenc_x2": enc_p, "TDec_x2": dec_p}, {"TDec_x2": dec_s})


def convert_dtcdscn(sd: Dict[str, Any], layers=(3, 4, 6, 3)) -> Tuple[dict, dict]:
    """Reference DTCDSCN CDNet_model/CDNet34 state_dict -> stcd_tpu
    models.dtcdscn.CDNetModel params/batch_stats. Only the live CD path is
    mapped (the dual-task decoders are commented out in the reference
    forward, DTCDSCN.py:257-294)."""
    params: dict = {"firstconv": {"kernel": _conv(sd["firstconv.weight"])}}
    stats: dict = {}
    params["firstbn"], stats["firstbn"] = _bn(sd, "firstbn")

    for k, n_blocks in enumerate(layers, start=1):
        lp, ls = {}, {}
        for i in range(n_blocks):
            base = f"encoder{k}.{i}"
            bp = {"conv1": {"kernel": _conv(sd[f"{base}.conv1.weight"])},
                  "conv2": {"kernel": _conv(sd[f"{base}.conv2.weight"])},
                  "se": {"fc1": {"kernel": _dense(sd[f"{base}.se.fc.0.weight"])},
                         "fc2": {"kernel": _dense(sd[f"{base}.se.fc.2.weight"])}}}
            bs = {}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{base}.bn1")
            bp["bn2"], bs["bn2"] = _bn(sd, f"{base}.bn2")
            if f"{base}.downsample.0.weight" in sd:
                bp["down_conv"] = {
                    "kernel": _conv(sd[f"{base}.downsample.0.weight"])}
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{base}.downsample.1")
            lp[f"block{i}"], ls[f"block{i}"] = bp, bs
        params[f"encoder{k}"], stats[f"encoder{k}"] = lp, ls

    params["dblock_master"] = {
        f"dilate{i}": _conv_b(sd, f"dblock_master.dilate{i}")
        for i in (1, 2, 3, 4)}

    for k in (1, 2, 3, 4):
        base = f"decoder{k}_master"
        dp = {"conv1": _conv_b(sd, f"{base}.conv1"),
              "conv3": _conv_b(sd, f"{base}.conv3"),
              "scse": {"ce1": {"kernel": _conv(sd[f"{base}.scse.channel_excitation.0.weight"])},
                       "ce2": {"kernel": _conv(sd[f"{base}.scse.channel_excitation.2.weight"])},
                       "se": {"kernel": _conv(sd[f"{base}.scse.spatial_se.0.weight"])}},
              "deconv2": {"kernel": _convT_2x(sd[f"{base}.deconv2.weight"]),
                          "bias": np.asarray(sd[f"{base}.deconv2.bias"])}}
        ds = {}
        for nm in ("norm1", "norm2", "norm3"):
            dp[nm], ds[nm] = _bn(sd, f"{base}.{nm}")
        params[base], stats[base] = dp, ds

    params["finaldeconv1_master"] = {
        "kernel": _convT_2x(sd["finaldeconv1_master.weight"]),
        "bias": np.asarray(sd["finaldeconv1_master.bias"])}
    params["finalconv2_master"] = _conv_b(sd, "finalconv2_master")
    params["finalconv3_master"] = _conv_b(sd, "finalconv3_master")
    return params, stats


def convert_dsifn(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Reference DSIFN state_dict (models/DSIFN.py:64-188, shared
    vgg16_base instance as t1_base/t2_base) -> stcd_tpu.models.dsifn.DSIFN
    params/batch_stats. The defined-but-unused ca1/bn_ca1/bn_ca2 layers
    (the reference forward skips them, DSIFN.py:131-133) are not mapped."""
    params: dict = {"base": {}}
    stats: dict = {}
    for our_idx, tv_idx in enumerate(_VGG16_CONV_IDX):
        params["base"][f"conv{our_idx}"] = _conv_b(
            sd, f"t1_base.features.{tv_idx}")

    branch_convs = {1: ("o1_conv1", "o1_conv2"),
                    2: ("o2_conv1", "o2_conv2", "o2_conv3"),
                    3: ("o3_conv1", "o3_conv2", "o3_conv3"),
                    4: ("o4_conv1", "o4_conv2", "o4_conv3"),
                    5: ("o5_conv1", "o5_conv2", "o5_conv3")}
    heads = {1: "o1_conv3", 2: "o2_conv4", 3: "o3_conv4",
             4: "o4_conv4", 5: "o5_conv4"}
    for k in (1, 2, 3, 4, 5):
        for name in branch_convs[k]:
            p = {"conv": _conv_b(sd, f"{name}.0"),
                 "prelu": np.asarray(sd[f"{name}.1.weight"])}
            p["bn"], bn_s = _bn(sd, f"{name}.2")
            params[name] = p
            stats[name] = {"bn": bn_s}
        params[heads[k]] = _conv_b(sd, heads[k])
        params[f"sa{k}"] = {"conv1": {
            "kernel": _conv(sd[f"sa{k}.conv1.weight"])}}
        params[f"bn_sa{k}"], stats[f"bn_sa{k}"] = _bn(sd, f"bn_sa{k}")
        if k > 1:
            params[f"ca{k}"] = {
                "fc1": {"kernel": _conv(sd[f"ca{k}.fc1.weight"])},
                "fc2": {"kernel": _conv(sd[f"ca{k}.fc2.weight"])}}
            params[f"trans_conv{k - 1}"] = {"ConvTranspose_0": {
                "kernel": _convT_2x(sd[f"trans_conv{k - 1}.weight"]),
                "bias": np.asarray(sd[f"trans_conv{k - 1}.bias"])}}
    return params, stats


def _convert_mit_encoder(sd: Dict[str, Any], prefix: str, depths) -> dict:
    """MiT/SegFormer-style encoder state_dict subtree ({prefix}.patch_embed*/
    block*/norm*) -> our SegFormerEncoder params. Unused reference modules
    (patch_block*/pnorm*, ChangeFormer.py:52-90 — dead in forward) are
    skipped."""
    enc_p: dict = {}
    n_stages = len(depths)
    for s in range(1, n_stages + 1):
        pe = f"{prefix}.patch_embed{s}"
        enc_p[f"patch_embed{s}"] = {"proj": _conv_b(sd, f"{pe}.proj"),
                                    "norm": _ln(sd, f"{pe}.norm")}
        for i in range(depths[s - 1]):
            base = f"{prefix}.block{s}.{i}"
            attn = {"q": _linear(sd, f"{base}.attn.q"),
                    "kv": _linear(sd, f"{base}.attn.kv"),
                    "proj": _linear(sd, f"{base}.attn.proj")}
            if f"{base}.attn.sr.weight" in sd:
                attn["sr"] = _conv_b(sd, f"{base}.attn.sr")
                attn["norm"] = _ln(sd, f"{base}.attn.norm")
            enc_p[f"block{s}_{i}"] = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": attn,
                "mlp": {"fc1": _linear(sd, f"{base}.mlp.fc1"),
                        "fc2": _linear(sd, f"{base}.mlp.fc2"),
                        "dw": {"dwconv": _conv_b(sd, f"{base}.mlp.dwconv.dwconv")}},
            }
        enc_p[f"norm{s}"] = _ln(sd, f"{prefix}.norm{s}")
    return enc_p


def _residual_block(sd: Dict[str, Any], prefix: str) -> dict:
    """ChangeFormerBaseNetworks ResidualBlock inside nn.Sequential:
    {prefix}.0.conv{1,2}.conv2d."""
    return {"conv1": _conv_b(sd, f"{prefix}.0.conv1.conv2d"),
            "conv2": _conv_b(sd, f"{prefix}.0.conv2.conv2d")}


def _upsample_conv(sd: Dict[str, Any], prefix: str) -> dict:
    return {"ConvTranspose_0": {
        "kernel": _convT_2x(sd[f"{prefix}.conv2d.weight"]),
        "bias": np.asarray(sd[f"{prefix}.conv2d.bias"])}}


def convert_changeformer_v1(sd: Dict[str, Any],
                            depths=(3, 4, 6, 3)) -> Tuple[dict, dict]:
    """ChangeFormerV1 (ref :644-674): Tenc + convprojection_base +
    ConvLayer head -> our models.changeformer.ChangeFormerV1."""
    cp = {}
    for name in ("convd16x", "convd8x", "convd4x", "convd2x", "convd1x"):
        cp[name] = _upsample_conv(sd, f"convproj.{name}")
    for name in ("dense_4", "dense_3", "dense_2", "dense_1"):
        cp[name] = _residual_block(sd, f"convproj.{name}")
    params = {"Tenc": _convert_mit_encoder(sd, "Tenc", depths),
              "convproj": cp,
              "change_probability": _conv_b(sd, "change_probability.conv2d")}
    return params, {}


def _tdec_common(sd: Dict[str, Any], prefix: str) -> dict:
    return {f"linear_c{k}": _linear(sd, f"{prefix}.linear_c{k}.proj")
            for k in (1, 2, 3, 4)}


def convert_changeformer_v2(sd: Dict[str, Any],
                            depths=(3, 4, 6, 3)) -> Tuple[dict, dict]:
    """ChangeFormerV2 (ref :918-948): Tenc + TDec fuse head."""
    td = _tdec_common(sd, "TDec")
    td["linear_fuse"] = _conv_b(sd, "TDec.linear_fuse")
    td["convd2x"] = _upsample_conv(sd, "TDec.convd2x")
    td["convd1x"] = _upsample_conv(sd, "TDec.convd1x")
    td["dense_2x"] = _residual_block(sd, "TDec.dense_2x")
    td["dense_1x"] = _residual_block(sd, "TDec.dense_1x")
    td["change_probability"] = _conv_b(sd, "TDec.change_probability.conv2d")
    return {"Tenc": _convert_mit_encoder(sd, "Tenc", depths), "TDec": td}, {}


def convert_changeformer_v3(sd: Dict[str, Any],
                            depths=(3, 4, 6, 3)) -> Tuple[dict, dict]:
    """ChangeFormerV3 (ref :951-973): Tenc + TDecV2 (pixel-shuffle head)."""
    td = _tdec_common(sd, "TDec")
    td["linear_fuse"] = _conv_b(sd, "TDec.linear_fuse")
    td["pix_shuffle_conv"] = _conv_b(sd, "TDec.pix_shuffle_conv")
    return {"Tenc": _convert_mit_encoder(sd, "Tenc", depths), "TDec": td}, {}


def convert_changeformer_v4(sd: Dict[str, Any],
                            depths=(3, 3, 4, 12, 3)) -> Tuple[dict, dict]:
    """ChangeFormerV4 (ref :1309-1338): 5-stage EncoderTransformer_x2 +
    DecoderTransformer_x2 -> our ChangeFormerV4. The decoder's
    convd1x/dense_1x are defined but unused in the reference forward
    (:1294-1297) and are skipped."""
    dec_p: dict = {}
    dec_s: dict = {}
    for k in (1, 2, 3, 4, 5):
        dec_p[f"linear_c{k}"] = _linear(sd, f"TDec_x2.linear_c{k}.proj")
        dc, ds = {}, {}
        for j, off in ((0, 0), (1, 4)):
            base = f"TDec_x2.diff_c{k}"
            dc[f"conv{j}"] = _conv_b(sd, f"{base}.{off}")
            dc[f"prelu{j}"] = np.asarray(sd[f"{base}.{off + 1}.weight"])
            dc[f"bn{j}"], ds[f"bn{j}"] = _bn(sd, f"{base}.{off + 2}")
        dec_p[f"diff_c{k}"], dec_s[f"diff_c{k}"] = dc, ds
        mp = {"conv1": _conv_b(sd, f"TDec_x2.make_pred_c{k}.0"),
              "conv2": _conv_b(sd, f"TDec_x2.make_pred_c{k}.3")}
        mp["bn"], bn_s = _bn(sd, f"TDec_x2.make_pred_c{k}.2")
        dec_p[f"make_pred_c{k}"] = mp
        dec_s[f"make_pred_c{k}"] = {"bn": bn_s}
    dec_p["linear_fuse"] = _conv_b(sd, "TDec_x2.linear_fuse")
    dec_p["convd2x"] = _upsample_conv(sd, "TDec_x2.convd2x")
    dec_p["dense_2x"] = _residual_block(sd, "TDec_x2.dense_2x")
    dec_p["change_probability"] = _conv_b(sd, "TDec_x2.change_probability.conv2d")
    return ({"Tenc_x2": _convert_mit_encoder(sd, "Tenc_x2", depths),
             "TDec_x2": dec_p}, {"TDec_x2": dec_s})


def convert_fpn_decoder(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """smp FPNDecoder state_dict -> our decoders.fpn.FPNDecoder params.
    Keys: p5, p{4,3,2}.skip_conv, seg_blocks.{i}.block.{j}.block.{0=conv
    bias-free, 1=GroupNorm} (ref decoders/fpn/decoder.py)."""
    params = {"p5": _conv_b(sd, "p5")}
    for name in ("p4", "p3", "p2"):
        params[f"{name}_skip"] = _conv_b(sd, f"{name}.skip_conv")
    for i, n_up in enumerate((3, 2, 1, 0)):
        for j in range(max(n_up, 1)):
            base = f"seg_blocks.{i}.block.{j}.block"
            params[f"seg{i}_{j}"] = {
                "conv": {"kernel": _conv(sd[f"{base}.0.weight"])},
                "gn": {"scale": np.asarray(sd[f"{base}.1.weight"]),
                       "bias": np.asarray(sd[f"{base}.1.bias"])}}
    return params, {}


def convert_psp_decoder(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """smp PSPDecoder -> our decoders.pspnet.PSPDecoder.
    psp.blocks.{i}.pool.1 = Conv2dReLU (BN disabled for pool_size=1)."""
    params, stats = {}, {}
    for i in range(4):
        p, s = _conv_block(sd, f"psp.blocks.{i}.pool.1")
        params[f"psp{i}"] = p
        if s:
            stats[f"psp{i}"] = s
    params["conv"], conv_s = _conv_block(sd, "conv")
    if conv_s:
        stats["conv"] = conv_s
    return params, stats


def convert_linknet_decoder(sd: Dict[str, Any],
                            n_blocks: int = 5) -> Tuple[dict, dict]:
    """smp LinknetDecoder -> our decoders.linknet.LinknetDecoder.
    blocks.{i}.block.{0=Conv2dReLU, 1=TransposeX2(convT, bn, relu),
    2=Conv2dReLU}."""
    params, stats = {}, {}
    for i in range(n_blocks):
        base = f"blocks.{i}.block"
        bp, bs = {}, {}
        bp["conv1"], bs["conv1"] = _conv_block(sd, f"{base}.0")
        bp["transpose"] = {
            "kernel": _convT_2x(sd[f"{base}.1.0.weight"]),
            "bias": np.asarray(sd[f"{base}.1.0.bias"])}
        if f"{base}.1.1.running_mean" in sd:
            bp["transpose_bn"], bs["transpose_bn"] = _bn(sd, f"{base}.1.1")
        bp["conv2"], bs["conv2"] = _conv_block(sd, f"{base}.2")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = {k: v for k, v in bs.items() if v}
    return params, stats


def convert_unetplusplus_decoder(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """smp UnetPlusPlusDecoder -> our decoders.unetplusplus
    (nested nodes share the x_{depth}_{layer} naming on both sides)."""
    params, stats = {}, {}
    nodes = sorted({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    for node in nodes:
        bp, bs = {}, {}
        for cname in ("conv1", "conv2"):
            bp[cname], bs[cname] = _conv_block(sd, f"blocks.{node}.{cname}")
        params[node] = bp
        stats[node] = {k: v for k, v in bs.items() if v}
    return params, stats


def convert_manet_decoder(sd: Dict[str, Any],
                          n_blocks: int = 5) -> Tuple[dict, dict]:
    """smp MAnetDecoder -> our decoders.manet.MAnetDecoder.
    center = PAB; blocks.{i} = MFAB (with skip) or DecoderBlock (last)."""
    params = {"center": {
        "top": _conv_b(sd, "center.top_conv"),
        "center": _conv_b(sd, "center.center_conv"),
        "bottom": _conv_b(sd, "center.bottom_conv"),
        "out_conv": _conv_b(sd, "center.out_conv")}}
    stats: dict = {}
    for i in range(n_blocks):
        base = f"blocks.{i}"
        bp, bs = {}, {}
        if f"{base}.hl_conv.0.0.weight" in sd:  # MFAB
            bp["hl1"], bs["hl1"] = _conv_block(sd, f"{base}.hl_conv.0")
            bp["hl2"], bs["hl2"] = _conv_block(sd, f"{base}.hl_conv.1")
            for ours, ref in (("se_hl", "SE_hl"), ("se_ll", "SE_ll")):
                bp[ours] = {"fc1": _conv_b(sd, f"{base}.{ref}.1"),
                            "fc2": _conv_b(sd, f"{base}.{ref}.3")}
        bp["conv1"], bs["conv1"] = _conv_block(sd, f"{base}.conv1")
        bp["conv2"], bs["conv2"] = _conv_block(sd, f"{base}.conv2")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = {k: v for k, v in bs.items() if v}
    return params, stats


def _aspp(sd: Dict[str, Any], prefix: str, separable: bool) -> Tuple[dict, dict]:
    """smp ASPP -> our decoders.deeplabv3.ASPP params/batch_stats."""
    p, s = {}, {}
    p["b0_conv"] = {"kernel": _conv(sd[f"{prefix}.convs.0.0.weight"])}
    p["b0_bn"], s["b0_bn"] = _bn(sd, f"{prefix}.convs.0.1")
    for i in (1, 2, 3):
        if separable:
            bp, bs = {}, {}
            bp["dw"] = {"kernel": _conv(sd[f"{prefix}.convs.{i}.0.0.weight"])}
            bp["pw"] = {"kernel": _conv(sd[f"{prefix}.convs.{i}.0.1.weight"])}
            bp["bn"], bs["bn"] = _bn(sd, f"{prefix}.convs.{i}.1")
            p[f"b{i}"], s[f"b{i}"] = bp, bs
        else:
            p[f"b{i}_conv"] = {"kernel": _conv(sd[f"{prefix}.convs.{i}.0.weight"])}
            p[f"b{i}_bn"], s[f"b{i}_bn"] = _bn(sd, f"{prefix}.convs.{i}.1")
    p["pool_conv"] = {"kernel": _conv(sd[f"{prefix}.convs.4.1.weight"])}
    p["pool_bn"], s["pool_bn"] = _bn(sd, f"{prefix}.convs.4.2")
    p["project_conv"] = {"kernel": _conv(sd[f"{prefix}.project.0.weight"])}
    p["project_bn"], s["project_bn"] = _bn(sd, f"{prefix}.project.1")
    return p, s


def convert_deeplabv3_decoder(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """smp DeepLabV3Decoder (Sequential: ASPP, Conv, BN, ReLU)."""
    params, stats = {}, {}
    params["aspp"], stats["aspp"] = _aspp(sd, "0", separable=False)
    params["conv"] = {"kernel": _conv(sd["1.weight"])}
    params["bn"], stats["bn"] = _bn(sd, "2")
    return params, stats


def convert_deeplabv3plus_decoder(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """smp DeepLabV3PlusDecoder."""
    params, stats = {}, {}
    params["aspp"], stats["aspp"] = _aspp(sd, "aspp.0", separable=True)
    sep_p, sep_s = {}, {}
    sep_p["dw"] = {"kernel": _conv(sd["aspp.1.0.weight"])}
    sep_p["pw"] = {"kernel": _conv(sd["aspp.1.1.weight"])}
    sep_p["bn"], sep_s["bn"] = _bn(sd, "aspp.2")
    params["aspp_sep"], stats["aspp_sep"] = sep_p, sep_s
    params["block1_conv"] = {"kernel": _conv(sd["block1.0.weight"])}
    params["block1_bn"], stats["block1_bn"] = _bn(sd, "block1.1")
    b2_p, b2_s = {}, {}
    b2_p["dw"] = {"kernel": _conv(sd["block2.0.0.weight"])}
    b2_p["pw"] = {"kernel": _conv(sd["block2.0.1.weight"])}
    b2_p["bn"], b2_s["bn"] = _bn(sd, "block2.1")
    params["block2"], stats["block2"] = b2_p, b2_s
    return params, stats


def convert_pan_decoder(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """smp PANDecoder -> our decoders.pan.PANDecoder (FPA + 3 GAU)."""
    def cbr(prefix):
        p = {"conv": _conv_b(sd, f"{prefix}.conv")}
        p["bn"], s = _bn(sd, f"{prefix}.bn")
        return p, {"bn": s}

    params, stats = {}, {}
    fpa_p, fpa_s = {}, {}
    for ours, ref in (("branch1", "branch1.1"), ("mid", "mid.0"),
                      ("down1", "down1.1"), ("down2", "down2.1"),
                      ("down3a", "down3.1"), ("down3b", "down3.2"),
                      ("conv1", "conv1"), ("conv2", "conv2")):
        fpa_p[ours], fpa_s[ours] = cbr(f"fpa.{ref}")
    params["fpa"], stats["fpa"] = fpa_p, fpa_s
    for k in (1, 2, 3):
        gp, gs = {}, {}
        gp["conv1"], gs["conv1"] = cbr(f"gau{k}.conv1.1")
        gp["conv2"], gs["conv2"] = cbr(f"gau{k}.conv2")
        params[f"gau{k}"], stats[f"gau{k}"] = gp, gs
    return params, stats


# ---------------------------------------------------------------------------
# ChangeVIG / pyramid ViG (ref models/ChangeVIG.py, models/pyramid_vig.py;
# the Grapher contract is stcd_tpu.models.gcn_lib — the reference's gcn_lib
# dependency is missing from its tree, tests/_ref_gcn_lib.py mirrors ours)
# ---------------------------------------------------------------------------

def _conv1x1_dense(sd: Dict[str, Any], prefix: str) -> dict:
    """torch 1x1 Conv2d (O,I,1,1) -> flax nn.Dense kernel (I,O)."""
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, 0, 0].T
    p = {"kernel": w}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _seq_conv_bn(sd, prefix, ic, ib, name, p, s, dense=False):
    """ref Sequential conv@ic + BN@ib -> our {name}_conv / {name}_bn."""
    p[f"{name}_conv"] = (_conv1x1_dense(sd, f"{prefix}.{ic}") if dense
                         else _conv_b(sd, f"{prefix}.{ic}"))
    p[f"{name}_bn"], s[f"{name}_bn"] = _bn(sd, f"{prefix}.{ib}")


def _convert_grapher(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    p, s = {}, {}
    p["fc1_conv"] = _conv1x1_dense(sd, f"{prefix}.fc1.0")
    p["fc1_bn"], s["fc1_bn"] = _bn(sd, f"{prefix}.fc1.1")
    gc_p = {"conv": _conv1x1_dense(sd, f"{prefix}.graph_conv.0")}
    gc_p["bn"], gc_s = _bn(sd, f"{prefix}.graph_conv.1")
    p["graph_conv"] = {"nn": gc_p}
    s["graph_conv"] = {"nn": {"bn": gc_s}}
    p["fc2_conv"] = _conv1x1_dense(sd, f"{prefix}.fc2.0")
    p["fc2_bn"], s["fc2_bn"] = _bn(sd, f"{prefix}.fc2.1")
    return p, s


def _convert_vig_backbone(sd: Dict[str, Any], prefix: str,
                          blocks=(2, 2, 6, 2)) -> Tuple[dict, dict]:
    """ref EncoderV1/V2/EncoderVIG_V20_2/DeepGCN state_dict subtree ->
    stcd_tpu.models.changevig.VIGBackbone params/batch_stats."""
    p: dict = {}
    s: dict = {}
    stem_p, stem_s = {}, {}
    for name, ic, ib in (("c1", 0, 1), ("c2", 3, 4), ("c3", 6, 7)):
        _seq_conv_bn(sd, f"{prefix}.stem.convs", ic, ib, name, stem_p, stem_s)
    p["stem"], s["stem"] = stem_p, stem_s
    p["pos_embed"] = np.transpose(
        np.asarray(sd[f"{prefix}.pos_embed"]), (0, 2, 3, 1))
    seq = 0
    idx = 0
    for i, nb in enumerate(blocks):
        if i > 0:
            dp, ds = {}, {}
            _seq_conv_bn(sd, f"{prefix}.backbone.{seq}.conv", 0, 1, "c", dp, ds)
            p[f"down{i}"], s[f"down{i}"] = dp, ds
            seq += 1
        for _ in range(nb):
            p[f"grapher{idx}"], s[f"grapher{idx}"] = _convert_grapher(
                sd, f"{prefix}.backbone.{seq}.0")
            fp, fs = {}, {}
            _seq_conv_bn(sd, f"{prefix}.backbone.{seq}.1.fc1", 0, 1, "fc1", fp, fs)
            _seq_conv_bn(sd, f"{prefix}.backbone.{seq}.1.fc2", 0, 1, "fc2", fp, fs)
            p[f"ffn{idx}"], s[f"ffn{idx}"] = fp, fs
            idx += 1
            seq += 1
    return p, s


def _convert_fuse_block(sd: Dict[str, Any], prefix: str,
                        has_diff: bool) -> Tuple[dict, dict]:
    """Cross_ConCat / Sub / Abs / Conc / conv_diff_V20 (ref ChangeVIG.py:
    315-347, 667-751, 921-953): optional grouped `diff` conv then
    conv_res + 1x1/3x3/1x1 bottleneck."""
    p, s = {}, {}
    if has_diff:
        _seq_conv_bn(sd, f"{prefix}.diff", 0, 1, "diff", p, s)
    _seq_conv_bn(sd, f"{prefix}.conv_res", 0, 1, "conv_res", p, s)
    for name, ic, ib in (("conv1", 0, 1), ("conv2", 3, 4), ("conv3", 6, 7)):
        _seq_conv_bn(sd, f"{prefix}.conv", ic, ib, name, p, s)
    return p, s


def _convert_global_local(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """ref Global_Local (:350-391). The reference's `bt` BN is defined but
    never used in forward and is skipped."""
    p = {"channel_conv": _conv_b(sd, f"{prefix}.channel_conv"),
         "spatial_conv": _conv_b(sd, f"{prefix}.spatial_conv")}
    s = {}
    p["channel_bn"], s["channel_bn"] = _bn(sd, f"{prefix}.channel_bn")
    for k in (1, 2, 3, 4, 5):
        p[f"local_conv{k}"] = _conv_b(sd, f"{prefix}.local_conv{k}")
    p["local_bn"], s["local_bn"] = _bn(sd, f"{prefix}.local_bn")
    return p, s


def _convert_hffm(sd: Dict[str, Any], prefix: str,
                  mode: str) -> Tuple[dict, dict]:
    """HFFM (:408-415) / HFFM_Compare (:754-773): fuse + Global_Local.
    ref attr is `cross_conc` for crossconc mode, `diff` for sub/abs/conc."""
    ref_fuse = "cross_conc" if mode == "crossconc" else "diff"
    fp, fs = _convert_fuse_block(sd, f"{prefix}.{ref_fuse}",
                                 has_diff=mode in ("crossconc", "conc"))
    gp, gs = _convert_global_local(sd, f"{prefix}.global_local")
    return {"fuse": fp, "global_local": gp}, {"fuse": fs, "global_local": gs}


def _convert_vffm(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """ref VFFM (:418-460)."""
    p = {"up": {"kernel": _convT_2x(sd[f"{prefix}.up.up.weight"]),
                "bias": np.asarray(sd[f"{prefix}.up.up.bias"])}}
    s: dict = {}
    for branch, i0 in (("global_avg", 1), ("global_max", 1), ("local_att", 0)):
        _seq_conv_bn(sd, f"{prefix}.{branch}", i0, i0 + 1,
                     f"{branch}_1", p, s)
        _seq_conv_bn(sd, f"{prefix}.{branch}", i0 + 3, i0 + 4,
                     f"{branch}_2", p, s)
    return p, s


def _convert_csam_v20(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """ref csam_V20 (:956-994)."""
    p = {"conv1_1": _conv_b(sd, f"{prefix}.conv1_1"),
         "liner1": _linear(sd, f"{prefix}.liner1"),
         "liner2": _linear(sd, f"{prefix}.liner2"),
         "conv2_1": _conv_b(sd, f"{prefix}.conv2_1"),
         "conv2_2": _conv_b(sd, f"{prefix}.conv2_2")}
    s = {}
    p["bn1"], s["bn1"] = _bn(sd, f"{prefix}.batch_normal1")
    p["bt"], s["bt"] = _bn(sd, f"{prefix}.bt")
    return p, s


def _convert_aff(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """ref AFF (:996-1028)."""
    p, s = {}, {}
    for ours, ref, i0 in (("local1", "local_att", 0), ("local2", "local_att", 3),
                          ("global1", "global_att", 1),
                          ("global2", "global_att", 4)):
        _seq_conv_bn(sd, f"{prefix}.{ref}", i0, i0 + 1, ours, p, s)
    return p, s


def _convert_final_head(sd: Dict[str, Any], prefix: str) -> dict:
    """convd2x/dense_2x/convd1x/dense_1x/change_probability -> our
    _FinalHead ('head' / inline on DecoderVIG)."""
    return {"convd2x": _upsample_conv(sd, f"{prefix}.convd2x"),
            "dense_2x": _residual_block(sd, f"{prefix}.dense_2x"),
            "convd1x": _upsample_conv(sd, f"{prefix}.convd1x"),
            "dense_1x": _residual_block(sd, f"{prefix}.dense_1x"),
            "change_probability": _conv_b(sd, f"{prefix}.change_probability.conv2d")}


def convert_changevig_decoder_v1(sd: Dict[str, Any],
                                 prefix: str = "decoder") -> Tuple[dict, dict]:
    """ref DecoderV1 (ChangeVIG.py:101-281, MLP heads) -> our DecoderV1."""
    p: dict = {}
    s: dict = {}
    for k in (1, 2, 3, 4):
        p[f"linear_c{k}"] = _linear(sd, f"{prefix}.decoder_heads_c{k}.proj")
        dc, ds = {}, {}
        for j, off in ((0, 0), (1, 4)):
            base = f"{prefix}.diff_c{k}"
            dc[f"conv{j}"] = _conv_b(sd, f"{base}.{off}")
            dc[f"prelu{j}"] = np.asarray(sd[f"{base}.{off + 1}.weight"])
            dc[f"bn{j}"], ds[f"bn{j}"] = _bn(sd, f"{base}.{off + 2}")
        p[f"diff_c{k}"], s[f"diff_c{k}"] = dc, ds
        mp = {"conv1": _conv_b(sd, f"{prefix}.make_pred_c{k}.0"),
              "conv2": _conv_b(sd, f"{prefix}.make_pred_c{k}.3")}
        mp["bn"], bn_s = _bn(sd, f"{prefix}.make_pred_c{k}.2")
        p[f"make_pred_c{k}"] = mp
        s[f"make_pred_c{k}"] = {"bn": bn_s}
    p["linear_fuse_conv"] = _conv_b(sd, f"{prefix}.linear_fuse.0")
    p["linear_fuse_bn"], s["linear_fuse_bn"] = _bn(sd, f"{prefix}.linear_fuse.1")
    p["head"] = _convert_final_head(sd, prefix)
    return p, s


def convert_changevig_decoder_v2(sd: Dict[str, Any], prefix: str = "decoder",
                                 mode: str = "crossconc") -> Tuple[dict, dict]:
    """ref DecoderV2 (:537-631) / DecoderV2_Compare (:775-863)."""
    p: dict = {}
    s: dict = {}
    for k in (1, 2, 3, 4):
        p[f"hffm{k}"], s[f"hffm{k}"] = _convert_hffm(
            sd, f"{prefix}.hffm{k}", mode)
    for k in (1, 2, 3):
        p[f"vffm{k}"], s[f"vffm{k}"] = _convert_vffm(sd, f"{prefix}.vffm{k}")
    p["head"] = _convert_final_head(sd, prefix)
    return p, s


def convert_changevig_decoder_v20(sd: Dict[str, Any],
                                  prefix: str = "TDec_x2") -> Tuple[dict, dict]:
    """ref DecoderVIG_V20_2 (:1105-1239)."""
    p: dict = {}
    s: dict = {}
    for k in (1, 2, 3, 4):
        p[f"diff_c{k}"], s[f"diff_c{k}"] = _convert_fuse_block(
            sd, f"{prefix}.diff_c{k}", has_diff=True)
        p[f"csam{k}"], s[f"csam{k}"] = _convert_csam_v20(sd, f"{prefix}.csam{k}")
    for k in (1, 2, 3):
        p[f"aff{k}"], s[f"aff{k}"] = _convert_aff(sd, f"{prefix}.aff{k}")
    for k in (2, 3, 4):
        p[f"trans_conv{k}"] = {
            "kernel": _convT_2x(sd[f"{prefix}.trans_conv{k}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.trans_conv{k}.bias"])}
    p["head"] = _convert_final_head(sd, prefix)
    return p, s


def convert_changevig(sd: Dict[str, Any], model: str,
                      blocks=(2, 2, 6, 2)) -> Tuple[dict, dict]:
    """Full ref ChangeVIG models -> ours. `model` in {gnn_v1, gnn_v2,
    gnn_v2_sub, gnn_v2_abs, gnn_v2_conc, vig_v20_2}."""
    if model == "vig_v20_2":
        enc_p, enc_s = _convert_vig_backbone(sd, "VIG_x2", blocks)
        dec_p, dec_s = convert_changevig_decoder_v20(sd, "TDec_x2")
        return ({"encoder": enc_p, "TDec_x2": dec_p},
                {"encoder": enc_s, "TDec_x2": dec_s})
    enc_p, enc_s = _convert_vig_backbone(sd, "encoder", blocks)
    if model == "gnn_v1":
        dec_p, dec_s = convert_changevig_decoder_v1(sd, "decoder")
    else:
        mode = {"gnn_v2": "crossconc", "gnn_v2_sub": "sub",
                "gnn_v2_abs": "abs", "gnn_v2_conc": "conc"}[model]
        dec_p, dec_s = convert_changevig_decoder_v2(sd, "decoder", mode)
    return ({"encoder": enc_p, "decoder": dec_p},
            {"encoder": enc_s, "decoder": dec_s})


def patch_first_conv(params: dict, new_in_channels: int,
                     default_in_channels: int = 3) -> dict:
    """smp encoders/_utils.py patch_first_conv equivalent on a CONVERTED
    encoder params pytree (HWIO kernels): adapt the stem conv so pretrained
    RGB weights drive non-RGB inputs.

    - new == 1: sum the input-channel dim (grayscale reuse);
    - otherwise: cycle source channels (i % default) and rescale by
      default/new, exactly as the reference does (:27-37).
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    target_idx = None
    for i, (path, leaf) in enumerate(flat):
        if (getattr(leaf, "ndim", 0) == 4
                and leaf.shape[2] == default_in_channels):
            target_idx = i
            break
    if target_idx is None:
        raise ValueError("no stem conv with "
                         f"{default_in_channels} input channels found")
    leaves = [leaf for _, leaf in flat]
    w = np.asarray(leaves[target_idx])
    if new_in_channels == default_in_channels:
        return params
    if new_in_channels == 1:
        neww = w.sum(axis=2, keepdims=True)
    else:
        idx = [i % default_in_channels for i in range(new_in_channels)]
        neww = w[:, :, idx, :] * (default_in_channels / new_in_channels)
    leaves[target_idx] = neww.astype(w.dtype)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Encoder-zoo converters, round 2 (VERDICT item 5): the families smp users
# actually pass as encoder_name. Each maps the UPSTREAM checkpoint naming
# (the .pth files the reference's pretrained_settings URLs serve) onto our
# encoder param/batch_stats layout.
# ---------------------------------------------------------------------------


def _scan_indices(sd: Dict[str, Any], pattern: str) -> list:
    """Sorted unique integer captures of a single-{} format pattern."""
    import re
    rx = re.compile("^" + pattern.replace("{}", r"(\d+)"))
    found = {int(m.group(1)) for k in sd if (m := rx.match(k))}
    return sorted(found)


def convert_efficientnet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """efficientnet_pytorch state_dict (the reference's encoders/
    efficientnet.py:31-60 EfficientNet base; url_map checkpoints) ->
    EfficientNetEncoder params/batch_stats. Works for b0..b7 (block count
    discovered from the keys). Head (_conv_head/_bn1/_fc) is dropped —
    the smp encoder contract keeps features only."""
    params = {"stem_conv": {"kernel": _conv(sd["_conv_stem.weight"])}}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "_bn0")
    for i in _scan_indices(sd, "_blocks.{}."):
        base = f"_blocks.{i}"
        bp, bs = {}, {}
        if f"{base}._expand_conv.weight" in sd:
            bp["expand_conv"] = {"kernel": _conv(sd[f"{base}._expand_conv.weight"])}
            bp["expand_bn"], bs["expand_bn"] = _bn(sd, f"{base}._bn0")
        bp["dw_conv"] = {"kernel": _conv(sd[f"{base}._depthwise_conv.weight"])}
        bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}._bn1")
        if f"{base}._se_reduce.weight" in sd:
            bp["se_reduce"] = {"kernel": _conv(sd[f"{base}._se_reduce.weight"]),
                               "bias": np.asarray(sd[f"{base}._se_reduce.bias"])}
            bp["se_expand"] = {"kernel": _conv(sd[f"{base}._se_expand.weight"]),
                               "bias": np.asarray(sd[f"{base}._se_expand.bias"])}
        bp["project_conv"] = {"kernel": _conv(sd[f"{base}._project_conv.weight"])}
        bp["project_bn"], bs["project_bn"] = _bn(sd, f"{base}._bn2")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    return params, stats


def convert_timm_efficientnet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm EfficientNet state_dict (the reference's encoders/
    timm_efficientnet.py:96-133 EfficientNetBaseEncoder wraps
    timm.models.efficientnet.EfficientNet: ``conv_stem``/``bn1`` stem +
    stage-grouped ``blocks.{s}.{b}`` with ``conv_pw/conv_dw/conv_pwl``
    naming and ``se.conv_reduce/se.conv_expand``) -> EfficientNetEncoder
    params/batch_stats with the same flat ``block{i}`` layout as
    convert_efficientnet. Covers timm-efficientnet-b0..b8/l2 and the
    tf_efficientnet_lite variants (no SE modules). The classifier head
    (``conv_head``/``bn2``/``classifier``) is dropped.

    NOTE: timm checkpoints are NOT efficientnet_pytorch checkpoints —
    `efficientnet-b*` names use convert_efficientnet (``_conv_stem``/
    ``_blocks.N`` naming); `timm-*` names use this converter.
    """
    params = {"stem_conv": {"kernel": _conv(sd["conv_stem.weight"])}}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    flat = 0
    for s in _scan_indices(sd, "blocks.{}."):
        for b in _scan_indices(sd, f"blocks.{s}.{{}}."):
            base = f"blocks.{s}.{b}"
            bp, bs = {}, {}
            if f"{base}.conv_pwl.weight" in sd:  # InvertedResidual
                bp["expand_conv"] = {"kernel": _conv(sd[f"{base}.conv_pw.weight"])}
                bp["expand_bn"], bs["expand_bn"] = _bn(sd, f"{base}.bn1")
                bp["dw_conv"] = {"kernel": _conv(sd[f"{base}.conv_dw.weight"])}
                bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}.bn2")
                proj, proj_bn = f"{base}.conv_pwl", f"{base}.bn3"
            else:  # DepthwiseSeparableConv (first stage): conv_pw projects
                bp["dw_conv"] = {"kernel": _conv(sd[f"{base}.conv_dw.weight"])}
                bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}.bn1")
                proj, proj_bn = f"{base}.conv_pw", f"{base}.bn2"
            if f"{base}.se.conv_reduce.weight" in sd:  # absent in lite
                bp["se_reduce"] = {
                    "kernel": _conv(sd[f"{base}.se.conv_reduce.weight"]),
                    "bias": np.asarray(sd[f"{base}.se.conv_reduce.bias"])}
                bp["se_expand"] = {
                    "kernel": _conv(sd[f"{base}.se.conv_expand.weight"]),
                    "bias": np.asarray(sd[f"{base}.se.conv_expand.bias"])}
            bp["project_conv"] = {"kernel": _conv(sd[f"{proj}.weight"])}
            bp["project_bn"], bs["project_bn"] = _bn(sd, proj_bn)
            params[f"block{flat}"] = bp
            stats[f"block{flat}"] = bs
            flat += 1
    return params, stats


def convert_mobilenet_v2(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """torchvision mobilenet_v2 state_dict (ref encoders/mobilenet.py) ->
    MobileNetV2Encoder params/batch_stats."""
    params = {"stem_conv": {"kernel": _conv(sd["features.0.0.weight"])}}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "features.0.1")
    blocks = [i for i in _scan_indices(sd, "features.{}.")
              if f"features.{i}.conv.0.0.weight" in sd
              or f"features.{i}.conv.1.weight" in sd]
    for i in blocks:
        base = f"features.{i}.conv"
        bp, bs = {}, {}
        if f"{base}.1.0.weight" in sd:  # expand + dw + project
            bp["expand_conv"] = {"kernel": _conv(sd[f"{base}.0.0.weight"])}
            bp["expand_bn"], bs["expand_bn"] = _bn(sd, f"{base}.0.1")
            bp["dw_conv"] = {"kernel": _conv(sd[f"{base}.1.0.weight"])}
            bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}.1.1")
            proj, proj_bn = f"{base}.2", f"{base}.3"
        else:  # first block: dw + project only
            bp["dw_conv"] = {"kernel": _conv(sd[f"{base}.0.0.weight"])}
            bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}.0.1")
            proj, proj_bn = f"{base}.1", f"{base}.2"
        bp["project_conv"] = {"kernel": _conv(sd[f"{proj}.weight"])}
        bp["project_bn"], bs["project_bn"] = _bn(sd, proj_bn)
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    last = max(_scan_indices(sd, "features.{}."))
    params["final_conv"] = {"kernel": _conv(sd[f"features.{last}.0.weight"])}
    params["final_bn"], stats["final_bn"] = _bn(sd, f"features.{last}.1")
    return params, stats


def convert_mobilenet_v3(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm mobilenetv3 state_dict (ref encoders/timm_mobilenetv3.py) ->
    MobileNetV3Encoder params/batch_stats. timm's staged blocks.{s}.{b}
    flatten (in order) onto our block{j}; the trailing ConvBnAct stage is
    final_conv/final_bn."""
    params = {"stem_conv": {"kernel": _conv(sd["conv_stem.weight"])}}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    bidx = 0
    for s in _scan_indices(sd, "blocks.{}."):
        for b in _scan_indices(sd, f"blocks.{s}.{{}}."):
            base = f"blocks.{s}.{b}"
            if f"{base}.conv.weight" in sd:  # trailing ConvBnAct
                params["final_conv"] = {"kernel": _conv(sd[f"{base}.conv.weight"])}
                params["final_bn"], stats["final_bn"] = _bn(sd, f"{base}.bn1")
                continue
            bp, bs = {}, {}
            if f"{base}.conv_pwl.weight" in sd:  # InvertedResidual
                bp["expand_conv"] = {"kernel": _conv(sd[f"{base}.conv_pw.weight"])}
                bp["expand_bn"], bs["expand_bn"] = _bn(sd, f"{base}.bn1")
                bp["dw_conv"] = {"kernel": _conv(sd[f"{base}.conv_dw.weight"])}
                bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}.bn2")
                bp["project_conv"] = {"kernel": _conv(sd[f"{base}.conv_pwl.weight"])}
                bp["project_bn"], bs["project_bn"] = _bn(sd, f"{base}.bn3")
            else:  # DepthwiseSeparableConv (first stage)
                bp["dw_conv"] = {"kernel": _conv(sd[f"{base}.conv_dw.weight"])}
                bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{base}.bn1")
                bp["project_conv"] = {"kernel": _conv(sd[f"{base}.conv_pw.weight"])}
                bp["project_bn"], bs["project_bn"] = _bn(sd, f"{base}.bn2")
            if f"{base}.se.conv_reduce.weight" in sd:
                bp["se_reduce"] = {
                    "kernel": _conv(sd[f"{base}.se.conv_reduce.weight"]),
                    "bias": np.asarray(sd[f"{base}.se.conv_reduce.bias"])}
                bp["se_expand"] = {
                    "kernel": _conv(sd[f"{base}.se.conv_expand.weight"]),
                    "bias": np.asarray(sd[f"{base}.se.conv_expand.bias"])}
            params[f"block{bidx}"] = bp
            stats[f"block{bidx}"] = bs
            bidx += 1
    return params, stats


def convert_senet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """pretrainedmodels senet state_dict (ref encoders/senet.py:
    se_resnet50/101/152, se_resnext50/101_32x4d, senet154) ->
    SENetEncoder params/batch_stats."""
    params: dict = {}
    stats: dict = {}
    # stem: layer0.conv1[/bn1[/conv2/bn2/conv3/bn3]] (senet154 has 3 convs)
    for ci in (1, 2, 3):
        if f"layer0.conv{ci}.weight" not in sd:
            break
        params[f"stem_conv{ci}"] = {"kernel": _conv(sd[f"layer0.conv{ci}.weight"])}
        params[f"stem_bn{ci}"], stats[f"stem_bn{ci}"] = _bn(sd, f"layer0.bn{ci}")
    for li in (1, 2, 3, 4):
        for bi in _scan_indices(sd, f"layer{li}.{{}}."):
            base = f"layer{li}.{bi}"
            bp, bs = {}, {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv(sd[f"{base}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{base}.bn{ci}")
            bp["se"] = {
                "fc1": {"kernel": _conv(sd[f"{base}.se_module.fc1.weight"]),
                        "bias": np.asarray(sd[f"{base}.se_module.fc1.bias"])},
                "fc2": {"kernel": _conv(sd[f"{base}.se_module.fc2.weight"]),
                        "bias": np.asarray(sd[f"{base}.se_module.fc2.bias"])}}
            if f"{base}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[f"{base}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.1")
            params[f"layer{li}_block{bi}"] = bp
            stats[f"layer{li}_block{bi}"] = bs
    return params, stats


def _densenet_normalize_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision legacy densenet checkpoints name layers 'norm.1' etc.;
    apply the same regex rename the reference does
    (ref encoders/densenet.py:60-73)."""
    import re
    pattern = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|"
        r"running_mean|running_var))$")
    out = {}
    for k, v in sd.items():
        m = pattern.match(k)
        if m:
            k = m.group(1) + m.group(2)
        out[k] = v
    return out


def convert_densenet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """torchvision densenet state_dict (ref encoders/densenet.py) ->
    DenseNetEncoder params/batch_stats (121/169/201/161; block/layer
    counts discovered from keys)."""
    sd = _densenet_normalize_keys(sd)
    params = {"conv0": {"kernel": _conv(sd["features.conv0.weight"])}}
    stats: dict = {}
    params["norm0"], stats["norm0"] = _bn(sd, "features.norm0")
    for di in _scan_indices(sd, "features.denseblock{}."):
        dbp, dbs = {}, {}
        for li in _scan_indices(sd, f"features.denseblock{di}.denselayer{{}}."):
            base = f"features.denseblock{di}.denselayer{li}"
            lp, ls = {}, {}
            for ni in (1, 2):
                lp[f"conv{ni}"] = {"kernel": _conv(sd[f"{base}.conv{ni}.weight"])}
                lp[f"norm{ni}"], ls[f"norm{ni}"] = _bn(sd, f"{base}.norm{ni}")
            dbp[f"denselayer{li}"] = lp
            dbs[f"denselayer{li}"] = ls
        params[f"denseblock{di}"] = dbp
        stats[f"denseblock{di}"] = dbs
    for ti in _scan_indices(sd, "features.transition{}."):
        params[f"transition{ti}_conv"] = {
            "kernel": _conv(sd[f"features.transition{ti}.conv.weight"])}
        params[f"transition{ti}_norm"], stats[f"transition{ti}_norm"] = _bn(
            sd, f"features.transition{ti}.norm")
    params["norm5"], stats["norm5"] = _bn(sd, "features.norm5")
    return params, stats


def _ln(sd: Dict[str, Any], prefix: str) -> dict:
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _linear(sd: Dict[str, Any], prefix: str) -> dict:
    p = {"kernel": _dense(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    return p


def convert_mix_transformer(sd: Dict[str, Any]) -> dict:
    """SegFormer MiT state_dict (ref encoders/mix_transformer.py mit_b0..b5)
    -> MixTransformerEncoder params ({"mit": {...}}; no batch_stats —
    LayerNorm only)."""
    mit: dict = {}
    for i in (1, 2, 3, 4):
        pe = f"patch_embed{i}"
        mit[pe] = {"proj": {"kernel": _conv(sd[f"{pe}.proj.weight"]),
                            "bias": np.asarray(sd[f"{pe}.proj.bias"])},
                   "norm": _ln(sd, f"{pe}.norm")}
        for j in _scan_indices(sd, f"block{i}.{{}}."):
            base = f"block{i}.{j}"
            attn = {"q": _linear(sd, f"{base}.attn.q"),
                    "kv": _linear(sd, f"{base}.attn.kv"),
                    "proj": _linear(sd, f"{base}.attn.proj")}
            if f"{base}.attn.sr.weight" in sd:
                attn["sr"] = {"kernel": _conv(sd[f"{base}.attn.sr.weight"]),
                              "bias": np.asarray(sd[f"{base}.attn.sr.bias"])}
                attn["norm"] = _ln(sd, f"{base}.attn.norm")
            mit[f"block{i}_{j}"] = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": attn,
                "mlp": {
                    "fc1": _linear(sd, f"{base}.mlp.fc1"),
                    "fc2": _linear(sd, f"{base}.mlp.fc2"),
                    "dw": {"dwconv": {
                        "kernel": _conv(sd[f"{base}.mlp.dwconv.dwconv.weight"]),
                        "bias": np.asarray(sd[f"{base}.mlp.dwconv.dwconv.bias"])}},
                },
            }
        mit[f"norm{i}"] = _ln(sd, f"norm{i}")
    return {"mit": mit}


def _mobileone_block(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """One train-form (unfused) MobileOneBlock: rbr_conv branches +
    optional rbr_scale / rbr_skip / SE (ref encoders/mobileone.py:75-153).
    Branch/scale/skip presence is inferred from the keys themselves."""
    p: dict = {}
    s: dict = {}
    i = 0
    while f"{prefix}.rbr_conv.{i}.conv.weight" in sd:
        p[f"branch{i}_conv"] = {
            "kernel": _conv(sd[f"{prefix}.rbr_conv.{i}.conv.weight"])}
        p[f"branch{i}_bn"], s[f"branch{i}_bn"] = _bn(
            sd, f"{prefix}.rbr_conv.{i}.bn")
        i += 1
    if f"{prefix}.rbr_scale.conv.weight" in sd:
        p["scale_conv"] = {"kernel": _conv(sd[f"{prefix}.rbr_scale.conv.weight"])}
        p["scale_bn"], s["scale_bn"] = _bn(sd, f"{prefix}.rbr_scale.bn")
    if f"{prefix}.rbr_skip.weight" in sd:
        p["identity_bn"], s["identity_bn"] = _bn(sd, f"{prefix}.rbr_skip")
    if f"{prefix}.se.reduce.weight" in sd:
        p["se_fc1"] = {"kernel": _conv(sd[f"{prefix}.se.reduce.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.se.reduce.bias"])}
        p["se_fc2"] = {"kernel": _conv(sd[f"{prefix}.se.expand.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.se.expand.bias"])}
    return p, s


def convert_mobileone(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Official/smp-vendored MobileOne TRAIN-form (unfused) state_dict ->
    MobileOneEncoder params/batch_stats (ref encoders/mobileone.py:
    stage0 stem + stage1..4 alternating depthwise/pointwise block pairs).
    Fused inference-form checkpoints (reparam_conv.* keys) are rejected:
    the encoder trains with the over-parameterized branches."""
    if any(k.endswith("reparam_conv.weight") for k in sd):
        raise ValueError(
            "fused (inference-form) MobileOne checkpoint: convert the "
            "unfused train-form weights instead (reparam_conv.* found)")
    params: dict = {}
    stats: dict = {}
    params["stem"], stats["stem"] = _mobileone_block(sd, "stage0")
    for si in range(1, 5):
        b = 0
        while f"stage{si}.{2 * b}.rbr_conv.0.conv.weight" in sd:
            bp: dict = {}
            bs: dict = {}
            for part, idx in (("dw", 2 * b), ("pw", 2 * b + 1)):
                bp[part], bs[part] = _mobileone_block(sd, f"stage{si}.{idx}")
            params[f"stage{si}_block{b}"] = bp
            stats[f"stage{si}_block{b}"] = bs
            b += 1
    return params, stats


def convert_vgg(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """torchvision VGG11/13/16/19 (+_bn) state_dict -> VGGEncoder
    params/batch_stats (ref encoders/vgg.py wraps torchvision make_layers;
    our encoder numbers convs sequentially as conv0.. with optional bnN).
    Walks features.* in index order: 4D weights are convs; a following
    features.{i+1}.running_mean marks the _bn variant. classifier.* keys
    (absent from the encoder) are ignored."""
    params: dict = {}
    stats: dict = {}
    conv_idx = 0
    idxs = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("features.")})
    for i in idxs:
        w = sd.get(f"features.{i}.weight")
        if w is None or np.asarray(w).ndim != 4:
            continue
        params[f"conv{conv_idx}"] = {
            "kernel": _conv(w),
            "bias": np.asarray(sd[f"features.{i}.bias"])}
        if f"features.{i + 1}.running_mean" in sd:
            params[f"bn{conv_idx}"], stats[f"bn{conv_idx}"] = _bn(
                sd, f"features.{i + 1}")
        conv_idx += 1
    return params, stats


# ---------------------------------------------------------------------------
# timm / pretrainedmodels encoder families (round-2 zoo completion).
# Naming follows the upstream checkpoints the reference's
# pretrained_settings URL tables serve (timm 0.6.x / Cadene
# pretrainedmodels); validated structurally against the forward-parity
# twins in tests/test_convert_zoo.py (timm itself is absent on this host).
# ---------------------------------------------------------------------------


def _conv_entry(sd, key, bias_key=None):
    e = {"kernel": _conv(sd[key])}
    if bias_key is not None and bias_key in sd:
        e["bias"] = np.asarray(sd[bias_key])
    return e


def _conv_bias(sd, prefix, out_if_missing=True):
    """Conv with a bias our flax module declares; upstream variants that
    drop the bias are mapped to zeros (mathematically identical)."""
    e = {"kernel": _conv(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        e["bias"] = np.asarray(sd[prefix + ".bias"])
    elif out_if_missing:
        e["bias"] = np.zeros(e["kernel"].shape[-1], np.float32)
    return e


def convert_timm_res2net(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm res2net50/101_26w_*s + res2next50 -> TimmResNetEncoder
    (Bottle2neck: conv1/bn1, convs.N/bns.N hierarchy, conv3/bn3,
    Sequential downsample)."""
    p: dict = {"stem_conv1": _conv_entry(sd, "conv1.weight")}
    s: dict = {}
    p["stem_bn1"], s["stem_bn1"] = _bn(sd, "bn1")
    for li in range(1, 5):
        b = 0
        while f"layer{li}.{b}.conv1.weight" in sd:
            base = f"layer{li}.{b}"
            bp = {"conv1": _conv_entry(sd, f"{base}.conv1.weight"),
                  "conv3": _conv_entry(sd, f"{base}.conv3.weight")}
            bs: dict = {}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{base}.bn1")
            bp["bn3"], bs["bn3"] = _bn(sd, f"{base}.bn3")
            i = 0
            while f"{base}.convs.{i}.weight" in sd:
                bp[f"conv2_{i}"] = _conv_entry(sd, f"{base}.convs.{i}.weight")
                bp[f"bn2_{i}"], bs[f"bn2_{i}"] = _bn(sd, f"{base}.bns.{i}")
                i += 1
            if f"{base}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv_entry(
                    sd, f"{base}.downsample.0.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.1")
            p[f"layer{li}_block{b}"] = bp
            s[f"layer{li}_block{b}"] = bs
            b += 1
    return p, s


def convert_timm_resnest(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm resnest14d..269e (+4s2x40d/1s4x24d) -> TimmResNetEncoder
    (deep 3-conv stem under conv1.{0,3,6}+bn1; SplAtConv2d conv2 subtree;
    avg_down downsample at Sequential indices 1/2)."""
    p: dict = {}
    s: dict = {}
    for i, (ck, bk) in enumerate((("conv1.0", "conv1.1"),
                                  ("conv1.3", "conv1.4"),
                                  ("conv1.6", "bn1"))):
        p[f"stem_conv{i + 1}"] = _conv_entry(sd, ck + ".weight")
        p[f"stem_bn{i + 1}"], s[f"stem_bn{i + 1}"] = _bn(sd, bk)
    for li in range(1, 5):
        b = 0
        while f"layer{li}.{b}.conv1.weight" in sd:
            base = f"layer{li}.{b}"
            bp = {"conv1": _conv_entry(sd, f"{base}.conv1.weight"),
                  "conv3": _conv_entry(sd, f"{base}.conv3.weight")}
            bs: dict = {}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{base}.bn1")
            bp["bn3"], bs["bn3"] = _bn(sd, f"{base}.bn3")
            c2p = {"conv": _conv_entry(sd, f"{base}.conv2.conv.weight"),
                   "fc1": _conv_bias(sd, f"{base}.conv2.fc1"),
                   "fc2": _conv_bias(sd, f"{base}.conv2.fc2")}
            c2s: dict = {}
            c2p["bn0"], c2s["bn0"] = _bn(sd, f"{base}.conv2.bn0")
            c2p["bn1"], c2s["bn1"] = _bn(sd, f"{base}.conv2.bn1")
            bp["conv2"], bs["conv2"] = c2p, c2s
            if f"{base}.downsample.1.weight" in sd:
                bp["downsample_conv"] = _conv_entry(
                    sd, f"{base}.downsample.1.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.2")
            p[f"layer{li}_block{b}"] = bp
            s[f"layer{li}_block{b}"] = bs
            b += 1
    return p, s


def _sk_subtree(sd: Dict[str, Any], base: str) -> Tuple[dict, dict]:
    """timm SelectiveKernel (paths.N ConvNormAct + SelectiveKernelAttn)."""
    p: dict = {}
    s: dict = {}
    for i in (0, 1):
        p[f"path{i}_conv"] = _conv_entry(sd, f"{base}.paths.{i}.conv.weight")
        p[f"path{i}_bn"], s[f"path{i}_bn"] = _bn(sd, f"{base}.paths.{i}.bn")
    p["attn_fc1"] = _conv_entry(sd, f"{base}.attn.fc_reduce.weight")
    p["attn_bn"], s["attn_bn"] = _bn(sd, f"{base}.attn.bn")
    p["attn_fc2"] = _conv_bias(sd, f"{base}.attn.fc_select")
    return p, s


def convert_timm_sknet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm skresnet18/34 (SelectiveKernelBasic: SK at conv1, ConvNormAct
    conv2) and skresnext50_32x4d (SelectiveKernelBottleneck: ConvNormAct
    conv1/conv3, SK at conv2) -> TimmResNetEncoder."""
    p: dict = {"stem_conv1": _conv_entry(sd, "conv1.weight")}
    s: dict = {}
    p["stem_bn1"], s["stem_bn1"] = _bn(sd, "bn1")
    bottleneck = "layer1.0.conv3.conv.weight" in sd
    for li in range(1, 5):
        b = 0
        while (f"layer{li}.{b}.conv1.conv.weight" in sd
               or f"layer{li}.{b}.conv1.paths.0.conv.weight" in sd):
            base = f"layer{li}.{b}"
            bp: dict = {}
            bs: dict = {}
            if bottleneck:
                bp["conv1"] = _conv_entry(sd, f"{base}.conv1.conv.weight")
                bp["bn1"], bs["bn1"] = _bn(sd, f"{base}.conv1.bn")
                bp["sk"], bs["sk"] = _sk_subtree(sd, f"{base}.conv2")
                bp["conv3"] = _conv_entry(sd, f"{base}.conv3.conv.weight")
                bp["bn3"], bs["bn3"] = _bn(sd, f"{base}.conv3.bn")
            else:
                bp["sk"], bs["sk"] = _sk_subtree(sd, f"{base}.conv1")
                bp["conv2"] = _conv_entry(sd, f"{base}.conv2.conv.weight")
                bp["bn2"], bs["bn2"] = _bn(sd, f"{base}.conv2.bn")
            if f"{base}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv_entry(
                    sd, f"{base}.downsample.0.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.1")
            p[f"layer{li}_block{b}"] = bp
            s[f"layer{li}_block{b}"] = bs
            b += 1
    return p, s


def convert_timm_regnet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm regnetx/y_002..320 -> RegNetEncoder (stages s1..s4, blocks
    b1.. 1-indexed; ConvNormAct conv1/2/3; SEModule fc1/fc2 in regnety;
    ConvNormAct downsample)."""
    p: dict = {"stem_conv": _conv_entry(sd, "stem.conv.weight")}
    s: dict = {}
    p["stem_bn"], s["stem_bn"] = _bn(sd, "stem.bn")
    for si in range(1, 5):
        b = 1
        while f"s{si}.b{b}.conv1.conv.weight" in sd:
            base = f"s{si}.b{b}"
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = _conv_entry(sd, f"{base}.conv{ci}.conv.weight")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{base}.conv{ci}.bn")
            if f"{base}.se.fc1.weight" in sd:
                bp["se_fc1"] = _conv_bias(sd, f"{base}.se.fc1")
                bp["se_fc2"] = _conv_bias(sd, f"{base}.se.fc2")
            if f"{base}.downsample.conv.weight" in sd:
                bp["downsample_conv"] = _conv_entry(
                    sd, f"{base}.downsample.conv.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.bn")
            p[f"stage{si}_block{b - 1}"] = bp
            s[f"stage{si}_block{b - 1}"] = bs
            b += 1
    return p, s


def convert_timm_gernet(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """timm gernet_s/m/l (ByobNet: ConvNormAct stem/final_conv; stages.S.B
    basic blocks conv1_kxk/conv2_kxk or bottle blocks
    conv1_1x1/conv2_kxk/conv3_1x1; ConvNormAct shortcut)."""
    p: dict = {"stem_conv": _conv_entry(sd, "stem.conv.weight")}
    s: dict = {}
    p["stem_bn"], s["stem_bn"] = _bn(sd, "stem.bn")
    for si in range(5):
        b = 0
        while (f"stages.{si}.{b}.conv1_kxk.conv.weight" in sd
               or f"stages.{si}.{b}.conv1_1x1.conv.weight" in sd):
            base = f"stages.{si}.{b}"
            bp: dict = {}
            bs: dict = {}
            if f"{base}.conv1_1x1.conv.weight" in sd:  # bottle
                names = (("conv1", "conv1_1x1"), ("conv2", "conv2_kxk"),
                         ("conv3", "conv3_1x1"))
            else:  # basic
                names = (("conv1", "conv1_kxk"), ("conv2", "conv2_kxk"))
            for ours, theirs in names:
                bp[ours] = _conv_entry(sd, f"{base}.{theirs}.conv.weight")
                bn_name = "bn" + ours[-1]
                bp[bn_name], bs[bn_name] = _bn(sd, f"{base}.{theirs}.bn")
            if f"{base}.shortcut.conv.weight" in sd:
                bp["shortcut_conv"] = _conv_entry(
                    sd, f"{base}.shortcut.conv.weight")
                bp["shortcut_bn"], bs["shortcut_bn"] = _bn(
                    sd, f"{base}.shortcut.bn")
            p[f"stage{si}_block{b}"] = bp
            s[f"stage{si}_block{b}"] = bs
            b += 1
    p["final_conv"] = _conv_entry(sd, "final_conv.conv.weight")
    p["final_bn"], s["final_bn"] = _bn(sd, "final_conv.bn")
    return p, s


def convert_dpn(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Cadene pretrainedmodels dpn68/68b/92/98/107/131 -> DPNEncoder.
    Upstream: features.conv1_1 InputBlock; features.convS_J DualPathBlock
    with BnActConv2d submodules (c1x1_w_s1/_s2, c1x1_a, c3x3_b, c1x1_c) or
    the b-variant CatBnAct + twin plain convs (c1x1_c1/c1x1_c2); final
    features.conv5_bn_ac CatBnAct."""
    sd = {k[len("features."):] if k.startswith("features.") else k: v
          for k, v in sd.items()}
    p: dict = {"stem_conv": _conv_entry(sd, "conv1_1.conv.weight")}
    s: dict = {}
    p["stem_bn"], s["stem_bn"] = _bn(sd, "conv1_1.bn")
    for si in range(2, 6):
        j = 1
        while f"conv{si}_{j}.c1x1_a.conv.weight" in sd:
            base = f"conv{si}_{j}"
            bp: dict = {}
            bs: dict = {}
            for wname in ("c1x1_w_s1", "c1x1_w_s2"):
                if f"{base}.{wname}.conv.weight" in sd:
                    bp["c1x1_w"] = _conv_entry(sd, f"{base}.{wname}.conv.weight")
                    bp["c1x1_w_bn"], bs["c1x1_w_bn"] = _bn(
                        sd, f"{base}.{wname}.bn")
            for cname in ("c1x1_a", "c3x3_b"):
                bp[cname] = _conv_entry(sd, f"{base}.{cname}.conv.weight")
                bp[f"{cname}_bn"], bs[f"{cname}_bn"] = _bn(
                    sd, f"{base}.{cname}.bn")
            if f"{base}.c1x1_c.conv.weight" in sd:
                bp["c1x1_c"] = _conv_entry(sd, f"{base}.c1x1_c.conv.weight")
                bp["c1x1_c_bn"], bs["c1x1_c_bn"] = _bn(sd, f"{base}.c1x1_c.bn")
            else:  # b-variant: CatBnAct + two plain convs
                bp["c1x1_c_bn"], bs["c1x1_c_bn"] = _bn(sd, f"{base}.c1x1_c.bn")
                bp["c1x1_c1"] = _conv_entry(sd, f"{base}.c1x1_c1.weight")
                bp["c1x1_c2"] = _conv_entry(sd, f"{base}.c1x1_c2.weight")
            p[base] = bp
            s[base] = bs
            j += 1
    p["final_bn"], s["final_bn"] = _bn(sd, "conv5_bn_ac.bn")
    return p, s


def convert_xception(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Cadene pretrainedmodels xception -> XceptionEncoder. Upstream:
    conv1/bn1/conv2/bn2 stem, block{1..12}.rep Sequential mixing ReLU /
    SeparableConv2d (.conv1 depthwise + .pointwise) / BatchNorm2d (+ an
    optional parameterless MaxPool), block skip/skipbn, then conv3/bn3 +
    conv4/bn4 SeparableConvs. rep indices shift with start_with_relu, so
    sepconvs/bns are taken in Sequential-index order rather than at fixed
    positions. Padding matches torch exactly (encoders/xception.py,
    incl. the smp padding patch; numerically golden-tested)."""
    p: dict = {}
    s: dict = {}
    for c, b in (("conv1", "bn1"), ("conv2", "bn2")):
        p[c] = {"kernel": _conv(sd[f"{c}.weight"])}
        p[b], s[b] = _bn(sd, b)
    for blk in range(1, 13):
        bp: dict = {}
        bs: dict = {}
        rep = f"block{blk}.rep"
        sep_idx = sorted(int(k.split(".")[2]) for k in sd
                         if k.startswith(rep + ".") and k.endswith(".conv1.weight"))
        bn_idx = sorted(int(k.split(".")[2]) for k in sd
                        if k.startswith(rep + ".") and k.endswith(".running_mean")
                        and len(k.split(".")) == 4)
        for n, i in enumerate(sep_idx, start=1):
            bp[f"sepconv{n}"] = {
                "depthwise": {"kernel": _conv(sd[f"{rep}.{i}.conv1.weight"])},
                "pointwise": {"kernel": _conv(sd[f"{rep}.{i}.pointwise.weight"])}}
        for n, i in enumerate(bn_idx, start=1):
            bp[f"bn{n}"], bs[f"bn{n}"] = _bn(sd, f"{rep}.{i}")
        if f"block{blk}.skip.weight" in sd:
            bp["skip_conv"] = {"kernel": _conv(sd[f"block{blk}.skip.weight"])}
            bp["skip_bn"], bs["skip_bn"] = _bn(sd, f"block{blk}.skipbn")
        p[f"block{blk}"] = bp
        s[f"block{blk}"] = bs
    for c, b in (("conv3", "bn3"), ("conv4", "bn4")):
        p[c] = {"depthwise": {"kernel": _conv(sd[f"{c}.conv1.weight"])},
                "pointwise": {"kernel": _conv(sd[f"{c}.pointwise.weight"])}}
        p[b], s[b] = _bn(sd, b)
    return p, s


def _basic_conv(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    """Cadene BasicConv2d (.conv + .bn) -> our BasicConv subtree."""
    bnp, bns = _bn(sd, prefix + ".bn")
    return ({"conv": {"kernel": _conv(sd[prefix + ".conv.weight"])}, "bn": bnp},
            {"bn": bns})


def convert_inceptionv4(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Cadene pretrainedmodels inceptionv4 -> InceptionV4Encoder. Upstream
    is features.{0..21} (BasicConv2d stem, Mixed_3a/4a/5a, 4x Inception_A,
    Reduction_A, 7x Inception_B, Reduction_B, 3x Inception_C with
    branchN[_Ma/b] submodules). Padding matches torch exactly
    (encoders/inception.py, incl. the smp padding patch; golden-tested)."""
    pairs = [("conv1", "features.0"), ("conv2", "features.1"),
             ("conv3", "features.2"), ("mixed3a_conv", "features.3.conv"),
             ("mixed5a_conv", "features.5.conv")]
    for i in range(2):
        pairs.append((f"mixed4a_b0_{i}", f"features.4.branch0.{i}"))
    for i in range(4):
        pairs.append((f"mixed4a_b1_{i}", f"features.4.branch1.{i}"))
    for a in range(4):  # Inception_A x4 at features.6..9
        base = f"features.{6 + a}"
        pairs += [(f"inceptionA{a}_b0", f"{base}.branch0"),
                  (f"inceptionA{a}_b3", f"{base}.branch3.1")]
        pairs += [(f"inceptionA{a}_b1_{i}", f"{base}.branch1.{i}")
                  for i in range(2)]
        pairs += [(f"inceptionA{a}_b2_{i}", f"{base}.branch2.{i}")
                  for i in range(3)]
    pairs.append(("redA_b0", "features.10.branch0"))
    pairs += [(f"redA_b1_{i}", f"features.10.branch1.{i}") for i in range(3)]
    for b in range(7):  # Inception_B x7 at features.11..17
        base = f"features.{11 + b}"
        pairs += [(f"inceptionB{b}_b0", f"{base}.branch0"),
                  (f"inceptionB{b}_b3", f"{base}.branch3.1")]
        pairs += [(f"inceptionB{b}_b1_{i}", f"{base}.branch1.{i}")
                  for i in range(3)]
        pairs += [(f"inceptionB{b}_b2_{i}", f"{base}.branch2.{i}")
                  for i in range(5)]
    pairs += [(f"redB_b0_{i}", f"features.18.branch0.{i}") for i in range(2)]
    pairs += [(f"redB_b1_{i}", f"features.18.branch1.{i}") for i in range(4)]
    for c in range(3):  # Inception_C x3 at features.19..21
        base = f"features.{19 + c}"
        pairs += [(f"inceptionC{c}_b0", f"{base}.branch0"),
                  (f"inceptionC{c}_b1_0", f"{base}.branch1_0"),
                  (f"inceptionC{c}_b1_1a", f"{base}.branch1_1a"),
                  (f"inceptionC{c}_b1_1b", f"{base}.branch1_1b"),
                  (f"inceptionC{c}_b2_0", f"{base}.branch2_0"),
                  (f"inceptionC{c}_b2_1", f"{base}.branch2_1"),
                  (f"inceptionC{c}_b2_2", f"{base}.branch2_2"),
                  (f"inceptionC{c}_b2_3a", f"{base}.branch2_3a"),
                  (f"inceptionC{c}_b2_3b", f"{base}.branch2_3b"),
                  (f"inceptionC{c}_b3", f"{base}.branch3.1")]
    params: dict = {}
    stats: dict = {}
    for ours, theirs in pairs:
        params[ours], stats[ours] = _basic_conv(sd, theirs)
    return params, stats


def convert_inceptionresnetv2(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Cadene pretrainedmodels inceptionresnetv2 -> InceptionResNetV2Encoder
    (named stem convs, mixed_5b/6a/7a, repeat/repeat_1/repeat_2 residual
    stacks whose .conv2d up-projections carry a bias, final block8 +
    conv2d_7b)."""
    pairs = [("conv1a", "conv2d_1a"), ("conv2a", "conv2d_2a"),
             ("conv2b", "conv2d_2b"), ("conv3b", "conv2d_3b"),
             ("conv4a", "conv2d_4a"), ("conv7b", "conv2d_7b"),
             ("m5b_b0", "mixed_5b.branch0"), ("m5b_b3", "mixed_5b.branch3.1")]
    pairs += [(f"m5b_b1_{i}", f"mixed_5b.branch1.{i}") for i in range(2)]
    pairs += [(f"m5b_b2_{i}", f"mixed_5b.branch2.{i}") for i in range(3)]
    pairs += [("m6a_b0", "mixed_6a.branch0")]
    pairs += [(f"m6a_b1_{i}", f"mixed_6a.branch1.{i}") for i in range(3)]
    pairs += [(f"m7a_b0_{i}", f"mixed_7a.branch0.{i}") for i in range(2)]
    pairs += [(f"m7a_b1_{i}", f"mixed_7a.branch1.{i}") for i in range(2)]
    pairs += [(f"m7a_b2_{i}", f"mixed_7a.branch2.{i}") for i in range(3)]
    up_convs = []
    for i in range(10):  # Block35 stack
        base = f"repeat.{i}"
        pairs += [(f"block35_{i}_b0", f"{base}.branch0")]
        pairs += [(f"block35_{i}_b1_{j}", f"{base}.branch1.{j}")
                  for j in range(2)]
        pairs += [(f"block35_{i}_b2_{j}", f"{base}.branch2.{j}")
                  for j in range(3)]
        up_convs.append((f"block35_{i}_up", f"{base}.conv2d"))
    for i in range(20):  # Block17 stack
        base = f"repeat_1.{i}"
        pairs += [(f"block17_{i}_b0", f"{base}.branch0")]
        pairs += [(f"block17_{i}_b1_{j}", f"{base}.branch1.{j}")
                  for j in range(3)]
        up_convs.append((f"block17_{i}_up", f"{base}.conv2d"))
    for i in range(9):  # Block8 stack
        base = f"repeat_2.{i}"
        pairs += [(f"block8_{i}_b0", f"{base}.branch0")]
        pairs += [(f"block8_{i}_b1_{j}", f"{base}.branch1.{j}")
                  for j in range(3)]
        up_convs.append((f"block8_{i}_up", f"{base}.conv2d"))
    pairs += [("block8_final_b0", "block8.branch0")]
    pairs += [(f"block8_final_b1_{j}", f"block8.branch1.{j}")
              for j in range(3)]
    up_convs.append(("block8_final_up", "block8.conv2d"))

    params: dict = {}
    stats: dict = {}
    for ours, theirs in pairs:
        params[ours], stats[ours] = _basic_conv(sd, theirs)
    for ours, theirs in up_convs:
        params[ours] = {"kernel": _conv(sd[theirs + ".weight"]),
                        "bias": np.asarray(sd[theirs + ".bias"])}
    return params, stats

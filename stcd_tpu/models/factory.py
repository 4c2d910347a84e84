"""Model factory: ``create_model`` (smp API, ref __init__.py:27-66) and
``define_G`` (bespoke-zoo factory keyed by net_G string,
ref models/networks.py:138-215)."""

from __future__ import annotations

from stcd_tpu.models import segcd as _segcd
from stcd_tpu.models import siam_unet as _siam
from stcd_tpu.models import smp_models as _smp


_ARCHS = {
    "unet": _segcd.Unet,
    "unetseg": _segcd.UnetSeg,
    "segcd": _segcd.SegCD,
    "ffctlcd": _segcd.FFCTLCD,
    "unetplusplus": _smp.UnetPlusPlus,
    "manet": _smp.MAnet,
    "linknet": _smp.Linknet,
    "fpn": _smp.FPN,
    "pspnet": _smp.PSPNet,
    "deeplabv3": _smp.DeepLabV3,
    "deeplabv3plus": _smp.DeepLabV3Plus,
    "pan": _smp.PAN,
}


def create_model(arch: str, encoder_name: str = "resnet34", encoder_weights=None,
                 in_channels: int = 3, classes: int = 1, dtype=None, **kwargs):
    """smp.create_model parity (ref segmentation_models_pytorch/__init__.py:27-66).

    Additional archs (unetplusplus, fpn, ...) register into ``_ARCHS`` as
    their decoders land.
    """
    arch_l = arch.lower()
    if arch_l not in _ARCHS:
        raise KeyError(f"Wrong architecture `{arch}`. Available: {sorted(_ARCHS)}")
    if in_channels != 3:
        # flax infers conv input channels from the first input, so models
        # here accept any channel count at init — but silently accepting
        # the kwarg would skip smp's pretrained first-conv adaptation
        # (review finding). Loud until that path is wired end-to-end.
        if encoder_weights is not None:
            raise NotImplementedError(
                f"in_channels={in_channels} with pretrained weights needs the "
                "first-conv adaptation: load via convert.pretrained and apply "
                "convert.torch_to_flax.patch_first_conv to the payload first.")
        import logging
        logging.getLogger(__name__).info(
            "create_model(in_channels=%d): flax infers input channels from "
            "the first forward — build your example inputs with %d channels.",
            in_channels, in_channels)
    if encoder_weights is not None:
        # Resolve eagerly so a bad path fails HERE (the reference loads —
        # or 404s — inside get_encoder, ref encoders/__init__.py:83-86;
        # silent random init would be a semantic divergence). The resolved
        # path rides on the module and is grafted by create_train_state.
        from stcd_tpu.convert.pretrained import resolve_encoder_weights
        encoder_weights = resolve_encoder_weights(encoder_weights, encoder_name)
    return _ARCHS[arch_l](encoder_name=encoder_name,
                          encoder_weights=encoder_weights, classes=classes,
                          dtype=dtype, **kwargs)


def register_arch(name: str, cls) -> None:
    _ARCHS[name.lower()] = cls


def define_G(net_G: str, n_class: int = 2, embed_dim: int = 64,
             img_size: int = 256, dtype=None, **kwargs):
    """Bespoke CD-zoo factory (ref models/networks.py:138-215).

    Mirrors the reference's net_G keys. Entries raise a clear error until
    their model family lands (the zoo is built out incrementally).
    """
    if net_G == "Unet":
        return _siam.UnetEF(label_nbr=n_class, dtype=dtype)
    if net_G == "SiamUnet_sub":
        return _siam.SiamUnetSub(label_nbr=n_class, dtype=dtype)
    if net_G == "SiamUnet_abs":
        return _siam.SiamUnetDiff(label_nbr=n_class, dtype=dtype)
    if net_G == "SiamUnet_conc":
        return _siam.SiamUnetConc(label_nbr=n_class, dtype=dtype)
    if net_G == "SiamUnet_cross_conc":
        return _siam.SiamUnetCrossConc(label_nbr=n_class, dtype=dtype)

    if net_G == "DTCDSCN":
        from stcd_tpu.models.dtcdscn import CDNet34
        return CDNet34(num_classes=n_class, dtype=dtype)
    if net_G == "IFNet":
        from stcd_tpu.models.dsifn import DSIFN
        return DSIFN(dtype=dtype)
    if net_G == "SNUNet":
        from stcd_tpu.models.snunet import SNUNetECAM
        return SNUNetECAM(out_ch=n_class, dtype=dtype)

    # the reference HARDCODES output_nc=2 for the BIT family regardless of
    # n_class (ref networks.py:171-184) — matched, so converted reference
    # checkpoints always fit (review finding)
    if net_G == "base_resnet18":
        from stcd_tpu.models.bit import ResNetCD
        return ResNetCD(output_nc=2, output_sigmoid=False, dtype=dtype)
    if net_G == "base_transformer_pos_s4":
        from stcd_tpu.models.bit import BASETransformer
        return BASETransformer(output_nc=2, token_len=4, resnet_stages_num=4,
                               with_pos="learned", dtype=dtype)
    if net_G == "base_transformer_pos_s4_dd8":
        from stcd_tpu.models.bit import BASETransformer
        return BASETransformer(output_nc=2, token_len=4, resnet_stages_num=4,
                               with_pos="learned", enc_depth=1, dec_depth=8, dtype=dtype)
    if net_G == "base_transformer_pos_s4_dd8_dedim8":
        from stcd_tpu.models.bit import BASETransformer
        return BASETransformer(output_nc=2, token_len=4, resnet_stages_num=4,
                               with_pos="learned", enc_depth=1, dec_depth=8,
                               decoder_dim_head=8, dtype=dtype)

    if net_G.startswith("ChangeFormerV"):
        from stcd_tpu.models import changeformer as _cf
        version = net_G[len("ChangeFormerV"):]
        cls = getattr(_cf, f"ChangeFormerV{version}")
        if version in ("5", "6"):
            return cls(embed_dim=embed_dim, dtype=dtype)
        return cls(dtype=dtype)

    if net_G == "ChangeGNNV1":
        from stcd_tpu.models.changevig import ChangeGNNV1
        return ChangeGNNV1(embed_dim=embed_dim, dtype=dtype)
    if net_G == "ChangeGNNV2":
        from stcd_tpu.models.changevig import ChangeGNNV2
        return ChangeGNNV2(embed_dim=embed_dim, img_size=img_size, dtype=dtype)
    if net_G in ("ChangeGNNV2_sub", "ChangeGNNV2_abs", "ChangeGNNV2_conc"):
        from stcd_tpu.models.changevig import ChangeGNNV2Compare
        return ChangeGNNV2Compare(embed_dim=embed_dim, img_size=img_size,
                                  diff_mode=net_G.split("_")[-1], dtype=dtype)
    if net_G == "GNN":
        from stcd_tpu.models.changevig import VIG
        return VIG(embed_dim=embed_dim, dtype=dtype)

    raise NotImplementedError(f"Generator model name [{net_G}] is not recognized")

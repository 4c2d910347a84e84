from stcd_tpu.decoders.unet import DecoderBlock, CenterBlock, UnetDecoder  # noqa: F401

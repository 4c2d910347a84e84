from stcd_tpu.layers.modules import (  # noqa: F401
    Activation,
    AttentionGate,
    ConvBNReLU,
    SCSEModule,
    ClassificationHead,
    SegmentationHead,
    ConvTranspose2x,
    max_pool,
    upsample_nearest,
    upsample_bilinear,
    resize_bilinear,
    pad_replicate_to,
)
from stcd_tpu.layers.se import (  # noqa: F401
    ChannelSELayer,
    SpatialSELayer,
    ChannelSpatialSELayer,
)

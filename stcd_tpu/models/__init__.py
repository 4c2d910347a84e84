from stcd_tpu.models.segcd import Unet, UnetSeg, SegCD, FFCTLCD, CDNet  # noqa: F401
from stcd_tpu.models.siam_unet import (  # noqa: F401
    SiamUnet,
    UnetEF,
    SiamUnetDiff,
    SiamUnetConc,
    SiamUnetSub,
    SiamUnetCrossConc,
)
from stcd_tpu.models.factory import create_model, define_G  # noqa: F401

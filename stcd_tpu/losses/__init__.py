from stcd_tpu.losses.functional import (  # noqa: F401
    bce_loss,
    dice_loss,
    bce_dice,
    cd_loss,
    cross_entropy,
    focal_loss,
    miou_loss,
    mmiou_loss,
    contrastive_loss,
)
from stcd_tpu.losses.smp import (  # noqa: F401
    DiceLoss,
    JaccardLoss,
    FocalLoss,
    TverskyLoss,
    SoftBCEWithLogitsLoss,
    SoftCrossEntropyLoss,
    MCCLoss,
    LovaszLoss,
    BINARY_MODE,
    MULTICLASS_MODE,
    MULTILABEL_MODE,
)

"""Serving-side utilities (beyond parity — the reference has no serving
story beyond the eval loops in its train_*.py scripts).

- quant: post-training int8 quantization of the eval forward (the MXU
  runs s8 x s8 -> s32 at 2x the bf16 rate on v5e).
"""

from stcd_tpu.serving.quant import (  # noqa: F401
    calibrate_conv_scales,
    n_quantized_sites,
    quantize_fn,
)

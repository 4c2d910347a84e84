"""Serving-side utilities (beyond parity — the reference has no serving
story beyond the eval loops in its train_*.py scripts).

- quant: post-training int8 quantization of the eval forward (the MXU
  runs s8 x s8 -> s32 at 2x the bf16 rate on v5e).
- server: micro-batching HTTP inference server (cross-request tile
  batching into fixed-shape device steps; scripts/serve.py CLI).
"""

from stcd_tpu.serving.quant import (  # noqa: F401
    calibrate_conv_scales,
    n_quantized_sites,
    quantize_fn,
)
from stcd_tpu.serving.server import BatchingEngine, serve  # noqa: F401

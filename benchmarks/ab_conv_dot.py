"""A/B: SegCD(resnet50) bs=64 256x256 bf16 train step with pointwise
convs lowered as dot_general (stcd_tpu.layers.conv.Conv) vs the plain
conv_general_dilated lowering (STCD_DOT_1X1=0).

The dot lowering lets XLA fuse the BatchNorm statistics reductions into
the matmul epilogue (benchmarks/bench_conv_bn_epilogue.py measured
dot+stats at 0-3% over the bare dot, while conv+stats is 1.03-2.95x
slower on the bottleneck 1x1 shapes).

Run on the real chip:  nohup python benchmarks/ab_conv_dot.py \
    > /tmp/ab_conv_dot.log 2>&1 &
"""

import os

from segcd_ab import ab, run_variant


def _off():
    os.environ["STCD_DOT_1X1"] = "0"
    return run_variant({"dot_1x1": False})


def _on():
    os.environ["STCD_DOT_1X1"] = "1"
    return run_variant({"dot_1x1": True})


if __name__ == "__main__":
    ab("conv_dot_1x1", _off, _on)

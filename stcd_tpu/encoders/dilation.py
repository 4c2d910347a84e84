"""Shared smp ``make_dilated`` dilation-rate formula.

The reference dilates whole stages by patching every conv in the stage
(ref segmentation_models_pytorch/encoders/_base.py:34-47 make_dilated +
_utils.py replace_strides_with_dilation): the k-th flagged stage runs at
the cumulative doubling INCLUDING its own flag, e.g. output_stride=8 on a
3-flag encoder -> flags (False, True, True) -> rates (1, 2, 4).

One definition, used by every stage-uniform encoder (senet, mobilenet
v2/v3, ...); torchvision-style resnet implements its finer-grained
per-block semantics separately (encoders/resnet.py).
"""

from typing import Sequence, Tuple


def make_dilated_rates(flags: Sequence[bool]) -> Tuple[int, ...]:
    """Per-flag dilation rates: ``rates[k] = 2**sum(flags[:k+1])`` when
    ``flags[k]`` is set, else 1 (stage keeps its stride)."""
    return tuple(2 ** sum(map(bool, flags[: k + 1])) if flags[k] else 1
                 for k in range(len(flags)))

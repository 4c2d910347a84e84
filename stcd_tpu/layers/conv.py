"""Drop-in ``nn.Conv`` that lowers pointwise convolutions as matmuls.

Why: on TPU, XLA cannot fuse follow-up reductions into a
``convolution`` op, so every BatchNorm after a conv pays a separate
full read of the activation for its mean/var statistics — measured at
~19% of the SegCD(resnet50) train step (docs/DESIGN.md "Step-time
profile"). A ``dot_general`` DOES take epilogue fusions: measured on
chip (benchmarks/bench_conv_bn_epilogue.py), ``dot + sum + sum(x^2)``
costs 0-3% over the bare dot, while the identical math expressed as a
1x1 ``conv_general_dilated`` + stats passes is 1.03-2.95x slower.
ResNet bottlenecks are ~2/3 pointwise convs (the 4x expand produces
the biggest BN'd tensors), so routing the pointwise case through the
MXU's native matmul both speeds the op itself and makes the BN
statistics (and any other elementwise/reduce consumer) fusable.

The class is a strict behavioral superset of ``flax.linen.Conv``: the
parameter tree, initializers, dtype promotion, bias handling, masking,
and every non-pointwise case are flax's own (we only inject
``conv_general_dilated``, the documented extension point). A
convolution qualifies for the dot path iff: all kernel spatial dims
are 1, strides 1, no lhs/rhs dilation, ``feature_group_count == 1``,
and the padding is a no-op for a 1x1 kernel ('SAME'/'VALID'/all-zero
pairs). The backward pass of a dot is two dots, so the kernel-gradient
and input-gradient convolutions are replaced for free as well.

Reference parity: this changes HOW 1x1 convs are computed, not what —
same contraction, same MXU f32 accumulation (mathematically identical
to the conv lowering up to reduction order; pinned by
tests/test_conv_dot.py against ``nn.Conv``).

Set ``STCD_DOT_1X1=0`` to fall back to ``lax.conv_general_dilated``
everywhere (A/B toggle, read at trace time).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
from jax import lax
import jax.numpy as jnp
from flax import linen as nn


def _is_noop_padding(padding: Any) -> bool:
    if isinstance(padding, str):
        # for a 1x1 undilated kernel SAME == VALID == no padding
        return padding in ("SAME", "VALID")
    try:
        return all(p == 0 for pair in padding for p in pair)
    except TypeError:
        return False


def _all_ones(v: Any) -> bool:
    if v is None:
        return True
    if isinstance(v, int):
        return v == 1
    return all(int(e) == 1 for e in v)


def pointwise_dot_conv(
    inputs: jax.Array,
    kernel: jax.Array,
    strides: Sequence[int],
    padding: Any,
    lhs_dilation: Any = None,
    rhs_dilation: Any = None,
    dimension_numbers: Any = None,
    feature_group_count: int = 1,
    precision: Any = None,
) -> jax.Array:
    """``lax.conv_general_dilated`` signature; pointwise case -> dot."""
    spatial = kernel.shape[:-2]
    pointwise = (
        os.environ.get("STCD_DOT_1X1", "1") != "0"
        and all(int(k) == 1 for k in spatial)
        and _all_ones(strides)
        and _all_ones(lhs_dilation)
        and _all_ones(rhs_dilation)
        and feature_group_count == 1
        and _is_noop_padding(padding)
    )
    if not pointwise:
        return lax.conv_general_dilated(
            inputs,
            kernel,
            strides,
            padding,
            lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            precision=precision,
        )
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    # flax always passes channels-last inputs; (..., C) -> (M, C) is a
    # free reshape (minor dim unchanged)
    y = lax.dot_general(
        inputs.reshape(-1, cin),
        kernel.reshape(cin, cout),
        (((1,), (0,)), ((), ())),
        precision=precision,
    )
    return y.reshape(inputs.shape[:-1] + (cout,))


class Conv(nn.Conv):
    """``flax.linen.Conv`` with the pointwise-as-dot lowering (see module
    docstring). Identical parameter tree and semantics."""

    conv_general_dilated: Any = pointwise_dot_conv

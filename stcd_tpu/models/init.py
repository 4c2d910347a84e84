"""Weight re-initialization (ref models/networks.py:85-116 init_weights,
:119-135 init_net): normal | xavier | kaiming | orthogonal applied to all
conv/dense kernels in a param tree, BN scales ~ N(1, gain), biases zeroed.

The reference applies this to every define_G model after construction;
here it is an optional functional pass over the initialized params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import traverse_util


def init_weights(params: Any, rng: jax.Array, init_type: str = "normal",
                 init_gain: float = 0.02, batch_stats: Any = None) -> Any:
    """Pass ``batch_stats`` to restrict the N(1, gain) scale perturbation
    to true BatchNorm gammas: the reference's init_func matches classname
    'BatchNorm2d' only (networks.py:111-113), leaving LayerNorm weights at
    exactly 1.0 — but flax LayerNorm params are ALSO named 'scale', so
    without the batch_stats discriminator every transformer LayerNorm
    would get noised (review finding)."""
    flat = traverse_util.flatten_dict(params)
    bn_prefixes = None
    if batch_stats is not None:
        # a BN's params at (..., 'bn', 'scale') pair with batch_stats at
        # (..., 'bn', 'mean'/'var')
        bn_prefixes = {path[:-1]
                       for path in traverse_util.flatten_dict(batch_stats)}
    out = {}
    keys = jax.random.split(rng, len(flat))
    for k_rng, (path, value) in zip(keys, sorted(flat.items())):
        name = path[-1]
        is_bn_scale = (name == "scale"
                       and (bn_prefixes is None or path[:-1] in bn_prefixes))
        v = value
        if name == "kernel" and hasattr(value, "ndim") and value.ndim >= 2:
            if init_type == "normal":
                v = init_gain * jax.random.normal(k_rng, value.shape, value.dtype)
            elif init_type == "xavier":
                # ref init.xavier_normal_(w, gain=init_gain): std scales BY
                # the gain itself (default 0.02), not gain/0.02
                v = jax.nn.initializers.xavier_normal()(k_rng, value.shape,
                                                        value.dtype) * init_gain
            elif init_type == "kaiming":
                v = jax.nn.initializers.kaiming_normal()(k_rng, value.shape,
                                                         value.dtype)
            elif init_type == "orthogonal":
                v = jax.nn.initializers.orthogonal(scale=init_gain)(
                    k_rng, value.shape, value.dtype)
            else:
                raise NotImplementedError(
                    f"initialization method [{init_type}] is not implemented")
        elif is_bn_scale:  # BatchNorm gamma ~ N(1, gain) (ref :111-113);
            # LayerNorm scales stay exactly 1 like the reference
            v = 1.0 + init_gain * jax.random.normal(k_rng, value.shape, value.dtype)
        elif name == "bias":
            v = jnp.zeros_like(value)
        out[path] = v
    return traverse_util.unflatten_dict(out)

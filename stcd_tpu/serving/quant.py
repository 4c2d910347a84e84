"""Post-training int8 quantization of the eval/serving forward.

TPU rationale: the v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate
(394 vs 197 peak TOPS), and int8 activations halve the HBM bytes a conv
reads. Measured on this chip (benchmarks/bench_int8_conv.py) the
compute-bound SegCD encoder shapes run 2-3x faster in int8.

Design — quantize the CONV COMPUTE only, leave the graph float:

- per conv call site, the activation is quantized per-TENSOR symmetric
  (scale calibrated offline as the max |x| seen over calibration
  batches), the kernel per-OUTPUT-CHANNEL symmetric (scale from the
  weights themselves at trace time);
- the contraction runs int8 x int8 -> int32 on the MXU;
- the result is immediately rescaled to float, so everything around the
  conv (eval-mode BN apply, residual adds, SE gates, sigmoids, the
  min(diffea, diffseg) fusion...) is numerically untouched. XLA fuses
  the quantize/dequantize elementwise work into neighboring ops the
  same way it fuses BN applies, so the float detour costs no extra HBM
  pass.

No model changes: the zoo instantiates `flax.linen.Conv` at ~190 sites,
so instead of threading a flag through every module this works by
intercepting ``lax.conv_general_dilated`` during TRACING (flax
late-binds it through the ``jax.lax`` module namespace). The same two
functions therefore serve SegCD, ChangeFormer, the FC-Siam family, ...
Call sites are identified by deterministic trace order — the same
forward always hits the same convs in the same sequence, which is also
what makes the calibration scales line up with the quantized trace.

Skipped (left in float): grouped/depthwise convs (VPU-bound on TPU, no
MXU win), convs with fewer than ``min_in_channels`` input channels (the
RGB stem and the lane-padded full-res decoder tail — measured <=1.2x
and accuracy-critical), and int8 inputs' own stem normalization.

The reference has no quantized path (fp32 eval only); this is a
beyond-parity serving feature. The eval protocol (sigmoid > 0.5,
ref train_sup.py:163) is unchanged — only conv internals are int8.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_PATCH_LOCK = threading.RLock()


@contextlib.contextmanager
def _intercept_convs(handler_factory):
    """Swap ``jax.lax.conv_general_dilated`` for a wrapper during tracing.

    ``handler_factory(orig)`` returns the replacement. Reentrant-locked:
    tracing is single-threaded here and nested interception would break
    site numbering, so the lock also serializes concurrent callers.
    """
    with _PATCH_LOCK:
        orig = jax.lax.conv_general_dilated
        jax.lax.conv_general_dilated = handler_factory(orig)
        try:
            yield
        finally:
            jax.lax.conv_general_dilated = orig


_CONV_ARG_NAMES = ("window_strides", "padding", "lhs_dilation",
                   "rhs_dilation", "dimension_numbers",
                   "feature_group_count", "batch_group_count", "precision",
                   "preferred_element_type")


def _normalize_conv_args(args, kwargs) -> dict:
    """Fold positional conv_general_dilated args (after lhs, rhs) into a
    kwargs dict so handlers see one canonical form."""
    merged = dict(kwargs)
    for name, val in zip(_CONV_ARG_NAMES, args):
        merged[name] = val
    return merged


def _site_quantizable(lhs, rhs, kwargs, min_in_channels: int) -> bool:
    if kwargs.get("feature_group_count", 1) != 1:
        return False  # depthwise/grouped: VPU-bound, no MXU win
    if kwargs.get("batch_group_count", 1) != 1:
        return False
    if not (jnp.issubdtype(lhs.dtype, jnp.floating)
            and jnp.issubdtype(rhs.dtype, jnp.floating)):
        return False  # already integer (or bool) — not ours to touch
    dn = kwargs.get("dimension_numbers")
    dnums = jax.lax.conv_dimension_numbers(lhs.shape, rhs.shape, dn)
    cin = rhs.shape[dnums.rhs_spec[1]]
    return cin >= min_in_channels


def _conv_dnums(lhs, rhs, kwargs):
    return jax.lax.conv_dimension_numbers(
        lhs.shape, rhs.shape, kwargs.get("dimension_numbers"))


def calibrate_conv_scales(fn: Callable, batches: Sequence,
                          min_in_channels: int = 16) -> np.ndarray:
    """Run ``fn`` (a closed eval forward, e.g. ``lambda a, b:
    model.apply(vars, a, b)``) over calibration batches and return the
    per-conv-site max |activation| in trace order, shape ``(n_sites,)``.

    Non-quantizable sites (grouped / narrow / integer) still occupy a
    slot (value NaN) so indices line up with ``quantize_fn``.
    """
    def collecting(*xs):
        maxes: List[jax.Array] = []

        def factory(orig):
            def wrapper(lhs, rhs, *a, **k):
                kk = _normalize_conv_args(a, k)
                if _site_quantizable(lhs, rhs, kk, min_in_channels):
                    maxes.append(jnp.max(jnp.abs(lhs))
                                 .astype(jnp.float32))
                else:
                    maxes.append(jnp.asarray(jnp.nan, jnp.float32))
                return orig(lhs, rhs, **kk)
            return wrapper

        with _intercept_convs(factory):
            out = fn(*xs)
        del out
        return jnp.stack(maxes) if maxes else jnp.zeros((0,), jnp.float32)

    # one jitted callable for ALL batches: rebuilding it per batch would
    # retrace (and re-lower) the whole forward each iteration — minutes
    # per batch on the tunneled-TPU host for zero benefit
    collecting = jax.jit(collecting)

    scales: Optional[np.ndarray] = None
    for batch in batches:
        args = batch if isinstance(batch, (tuple, list)) else (batch,)
        batch_maxes = np.asarray(collecting(*args))
        if scales is None:
            scales = batch_maxes
        else:
            if scales.shape != batch_maxes.shape:
                raise ValueError(
                    f"conv-site count changed across calibration batches "
                    f"({scales.shape[0]} vs {batch_maxes.shape[0]}) — "
                    "fn must trace the same graph for every batch")
            scales = np.fmax(scales, batch_maxes)  # fmax keeps NaN slots
    if scales is None:
        raise ValueError("no calibration batches given")
    return scales


def n_quantized_sites(act_scales: np.ndarray) -> int:
    """Number of conv sites :func:`quantize_fn` will actually run in int8:
    finite AND strictly positive scales (NaN marks non-quantizable sites,
    0 marks calibration inputs that were identically zero — both stay
    float)."""
    s = np.asarray(act_scales)
    return int((np.isfinite(s) & (s > 0)).sum())


def quantize_fn(fn: Callable, act_scales: np.ndarray,
                min_in_channels: int = 16) -> Callable:
    """Wrap a closed eval forward so every quantizable conv runs int8.

    ``act_scales`` comes from :func:`calibrate_conv_scales` with the SAME
    ``min_in_channels``. The returned callable is jit-compatible (the
    interception happens while tracing its body).
    """
    act_scales = np.asarray(act_scales, np.float32)

    def quantized(*args, **kwargs):
        site = [0]

        def factory(orig):
            def wrapper(lhs, rhs, *a, **k):
                kk = _normalize_conv_args(a, k)
                i = site[0]
                site[0] += 1
                if i >= act_scales.shape[0]:
                    raise ValueError(
                        f"conv site {i} beyond calibration table "
                        f"({act_scales.shape[0]} sites) — calibrate with "
                        "the same forward")
                quantizable = _site_quantizable(lhs, rhs, kk, min_in_channels)
                # scale 0 means the site's input was identically zero on
                # every calibration batch (e.g. a ReLU-dead block or a
                # nodata collar) — quantizing with a floored scale would
                # saturate real activations to ~0; leave the site in float
                if (not quantizable or not np.isfinite(act_scales[i])
                        or act_scales[i] <= 0.0):
                    return orig(lhs, rhs, **kk)
                dnums = _conv_dnums(lhs, rhs, kk)
                a_s = jnp.float32(float(act_scales[i]) / 127.0)
                xq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / a_s),
                              -127, 127).astype(jnp.int8)
                # per-output-channel kernel scale
                out_dim = dnums.rhs_spec[0]
                red_axes = tuple(d for d in range(rhs.ndim) if d != out_dim)
                w_abs = jnp.max(jnp.abs(rhs.astype(jnp.float32)),
                                axis=red_axes, keepdims=True)
                w_s = jnp.maximum(w_abs, 1e-30) / 127.0
                wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / w_s),
                              -127, 127).astype(jnp.int8)
                k2 = dict(kk)
                k2["preferred_element_type"] = jnp.int32
                k2.pop("precision", None)
                y = orig(xq, wq, **k2)
                # broadcast the channel scale onto the conv output dim
                y_chan = dnums.out_spec[1]
                scale_shape = [1] * y.ndim
                scale_shape[y_chan] = y.shape[y_chan]
                w_s_out = w_s.reshape(-1)  # (Cout,)
                deq = (a_s * w_s_out).reshape(scale_shape)
                # keep the graph's dtype contract: emit what the float
                # conv would have (bf16 models stay bf16 downstream)
                out_dtype = kk.get("preferred_element_type") or \
                    jnp.result_type(lhs, rhs)
                return (y.astype(jnp.float32) * deq).astype(out_dtype)
            return wrapper

        with _intercept_convs(factory):
            out = fn(*args, **kwargs)
        expected = int(act_scales.shape[0])
        if site[0] != expected:
            raise ValueError(
                f"quantized trace hit {site[0]} conv sites but the "
                f"calibration table has {expected} — fn changed")
        return out

    return quantized

"""Core Flax building blocks (NHWC, TPU-native).

Functional parity targets (cited as reference file:line):
- ConvBNReLU        <- segmentation_models_pytorch/base/modules.py:10-47 (Conv2dReLU)
- SCSEModule        <- segmentation_models_pytorch/base/modules.py:50-63
- Activation        <- segmentation_models_pytorch/base/modules.py:84-116
- AttentionGate     <- segmentation_models_pytorch/base/modules.py:119-131
- SegmentationHead  <- segmentation_models_pytorch/base/heads.py:5-10
- ClassificationHead<- segmentation_models_pytorch/base/heads.py:13-22
- ConvTranspose2x   <- torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
                        used by models/SiamUnet_diff.py:52 etc.
- pad_replicate_to  <- torch ReplicationPad2d shape fixups
                        (models/SiamUnet_diff.py:149-173)

Design notes (TPU-first):
- Everything is NHWC; convs use flax.linen.Conv which lowers to XLA
  convolutions that tile directly onto the MXU.
- BatchNorm uses flax's batch_stats collection. Under pjit/sharding data
  parallelism the batch mean/var are computed over the *global* batch
  (XLA inserts the cross-replica reductions), which exactly matches the
  reference's single-device full-batch BN statistics.
- ``dtype`` is the compute dtype (bf16 for performance runs); parameters are
  kept in float32 (``param_dtype``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

Dtype = Any


def max_pool(x: jax.Array, window: int = 2, stride: int = 2, padding: int = 0) -> jax.Array:
    """NHWC max pool. torch F.max_pool2d(kernel, stride, padding) parity.

    Inside a manual spatial shard_map body (parallel/spatial.py) the
    rows are a local strip: route through the halo-exchange variant."""
    from stcd_tpu.parallel.spatial import active_space_axis, max_pool_spatial
    if active_space_axis() is not None and x.ndim == 4:
        return max_pool_spatial(x, window, stride, padding)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        pads,
    )


def avg_pool_global(x: jax.Array) -> jax.Array:
    """Global average pool NHWC -> (N, 1, 1, C). torch AdaptiveAvgPool2d(1)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest 2x upsample, NHWC. torch F.interpolate(mode='nearest') parity.

    Implemented as reshape+broadcast (pure data movement; XLA fuses this
    into the consumer, so no extra HBM roundtrip).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def resize_bilinear(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize NHWC to (H, W).

    align_corners=False matches torch F.interpolate(mode='bilinear',
    align_corners=False) == jax.image.resize(method='linear').
    align_corners=True reproduces torch's align_corners grid, needed by
    models/losses.py:18 (cross_entropy upsample).
    """
    n, h, w, c = x.shape
    th, tw = size
    if (h, w) == (th, tw):
        return x
    if not align_corners:
        return jax.image.resize(x, (n, th, tw, c), method="linear")
    # align_corners=True: sample positions i * (h-1)/(th-1).
    def coords(t_out, t_in):
        if t_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(t_out, dtype=jnp.float32) * ((t_in - 1) / (t_out - 1))

    ys, xs = coords(th, h), coords(tw, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None].astype(x.dtype)
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None].astype(x.dtype)
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    top = a * (1 - wx) + b * wx
    bot = cc * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def upsample_bilinear(x: jax.Array, scale: int = 2, align_corners: bool = False) -> jax.Array:
    n, h, w, c = x.shape
    return resize_bilinear(x, (h * scale, w * scale), align_corners=align_corners)


def pad_replicate_to(x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """Replication-pad bottom/right so spatial dims match ``target_hw``.

    torch ReplicationPad2d((0, dw, 0, dh)) parity (models/SiamUnet_diff.py:149).
    No-op for the power-of-two sizes used in training; kept for odd shapes.
    """
    h, w = x.shape[1], x.shape[2]
    dh, dw = target_hw[0] - h, target_hw[1] - w
    if dh == 0 and dw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="edge")


_ACTIVATIONS: dict = {
    None: lambda x: x,
    "identity": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
    "softmax": jax.nn.softmax,
    "softmax2d": lambda x: jax.nn.softmax(x, axis=-1),  # channel axis in NHWC
    "logsoftmax": jax.nn.log_softmax,
    "tanh": jnp.tanh,
    "argmax": lambda x: jnp.argmax(x),
    "argmax2d": lambda x: jnp.argmax(x, axis=-1),
    "clamp": lambda x: jnp.clip(x, 0, 1),
    "relu": jax.nn.relu,
}


def Activation(name: Union[str, Callable, None]) -> Callable[[jax.Array], jax.Array]:
    """Activation-by-name (ref base/modules.py:84-116). Returns a callable."""
    if callable(name):
        return name
    if name not in _ACTIVATIONS:
        raise ValueError(
            f"Activation should be callable/sigmoid/softmax/logsoftmax/tanh/"
            f"argmax/argmax2d/clamp/None; got {name}"
        )
    return _ACTIVATIONS[name]


class PredictMixin:
    """smp ``SegmentationModel.predict`` parity (ref base/model.py:41-56:
    eval mode + no_grad forward). Stateless Flax form: pass the variables
    explicitly; the forward is jitted and cached per model instance.

    >>> masks = model.predict(variables, images)
    """

    def predict(self, variables, *inputs):
        from stcd_tpu import predict

        return predict(self, variables, *inputs)


class ConvBNReLU(nn.Module):
    """Conv2d + (BatchNorm) + ReLU (ref base/modules.py:10-47 Conv2dReLU).

    Conv bias is disabled when batchnorm is on, matching the reference.

    ``use_batchnorm="inplace"`` (the reference's optional InPlaceABN path,
    ref base/modules.py:4-7,29-35) is intentionally NOT implemented:
    InPlaceABN is a CUDA memory-saving fused activated-BN; the TPU-native
    equivalent of that memory saving is XLA op fusion plus
    ``jax.checkpoint`` rematerialisation (the ``--remat`` training flag).
    Requesting it raises with this explanation (docs/DESIGN.md).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_batchnorm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.use_batchnorm == "inplace":
            raise ValueError(
                "use_batchnorm='inplace' (InPlaceABN) is a CUDA memory "
                "optimization with no TPU counterpart; use plain batchnorm "
                "with the --remat flag (jax.checkpoint) for the same "
                "activation-memory saving.")
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=not self.use_batchnorm,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_batchnorm:
            x = MPBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x)
        return nn.relu(x)


class ConvTranspose2x(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1) — exact 2x upsampling.

    torch semantics: out = (H-1)*2 - 2*1 + 3 + 1 = 2H. The equivalent
    lax.conv_transpose padding is (k-1-p, k-1-p+output_padding) = (1, 2)
    per spatial dim. Used by the FC-Siam decoder upconvs
    (models/SiamUnet_diff.py:52,65,78,87).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        return nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(2, 2),
            padding=((k - 2, k - 1), (k - 2, k - 1)),
            use_bias=self.use_bias,
            transpose_kernel=True,  # torch weight-layout semantics
            dtype=self.dtype,
        )(x)


class SCSEModule(nn.Module):
    """Concurrent spatial & channel SE (ref base/modules.py:50-63).

    x * cSE(x) + x * sSE(x); cSE uses 1x1 convs over the pooled vector.
    """

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        # channel squeeze-excite
        s = avg_pool_global(x)
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype, name="cse_fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="cse_fc2")(s)
        cse = jax.nn.sigmoid(s)
        # spatial squeeze-excite
        t = nn.Conv(1, (1, 1), dtype=self.dtype, name="sse_conv")(x)
        sse = jax.nn.sigmoid(t)
        return x * cse + x * sse


class AttentionGate(nn.Module):
    """Optional attention wrapper (ref base/modules.py:119-131).

    kind=None -> identity; kind='scse' -> SCSEModule.
    """

    kind: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind is None:
            return x
        if self.kind == "scse":
            return SCSEModule(dtype=self.dtype)(x)
        raise ValueError(f"Attention {self.kind} is not implemented")


class SegmentationHead(nn.Module):
    """3x3 conv head + optional bilinear upsample + activation
    (ref base/heads.py:5-10)."""

    out_channels: int
    kernel_size: int = 3
    activation: Union[str, Callable, None] = None
    upsampling: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            padding=[(p, p)] * 2,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.upsampling > 1:
            # torch UpsamplingBilinear2d uses align_corners=True
            x = upsample_bilinear(x, self.upsampling, align_corners=True)
        return Activation(self.activation)(x)


class ClassificationHead(nn.Module):
    """Pool + flatten + dropout + linear + activation (ref base/heads.py:13-22)."""

    classes: int
    pooling: str = "avg"
    dropout: float = 0.2
    activation: Union[str, Callable, None] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.pooling not in ("max", "avg"):
            raise ValueError(f"Pooling should be one of ('max', 'avg'), got {self.pooling}.")
        if self.pooling == "avg":
            x = jnp.mean(x, axis=(1, 2))
        else:
            x = jnp.max(x, axis=(1, 2))
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.classes, dtype=self.dtype)(x)
        return Activation(self.activation)(x)


class Dropout2d(nn.Module):
    """Channel-wise dropout (torch nn.Dropout2d): zeroes whole feature maps.

    broadcast over H, W in NHWC. Used all over the FC-Siam family
    (models/SiamUnet_diff.py:20 etc.).
    """

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.Dropout(self.rate, broadcast_dims=(1, 2), deterministic=not train)(x)

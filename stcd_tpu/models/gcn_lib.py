"""gcn_lib equivalent — KNN graph convolution for ViG (NHWC, TPU-native).

The reference imports ``Grapher, act_layer`` from an external ``gcn_lib``
package that is NOT vendored (models/pyramid_vig.py:17; SURVEY.md headline
facts) — the ViG models cannot run in the reference tree. This module
reimplements the behavior from the ViG paper / public gcn_lib semantics:

- dense KNN graph over pixel-node features (optionally against an
  avg-pooled, reduce-ratio-r downsampled node set), with a fixed 2D
  sin-cos relative-position bias added to the pairwise similarities;
- dilated neighbor selection (top k*d then every d-th);
- MRConv (max-relative) / EdgeConv aggregation;
- Grapher: 1x1 conv+BN -> graph conv (2x widening) -> 1x1 conv+BN,
  with DropPath residual.

TPU-first formulation: pairwise similarity is one batched matmul on the
MXU; top_k is jax.lax.top_k; neighbor gather is a one-hot MXU
contraction against the (pooled, M<=256) node table — see
gather_neighbors. Everything is static-shape and jit-friendly.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm


def act_layer(name: str):
    """gcn_lib.act_layer parity: {relu, prelu->relu, leakyrelu, gelu, hswish}."""
    return {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "hswish": nn.hard_swish,
    }[name]


def _get_2d_sincos_pos_embed(embed_dim: int, grid_hw) -> np.ndarray:
    """MAE-style 2D sin-cos position embedding, (gh*gw, embed_dim)."""
    gh, gw = (grid_hw, grid_hw) if isinstance(grid_hw, int) else grid_hw
    dim_half = embed_dim // 2
    omega = 1.0 / 10000 ** (np.arange(dim_half // 2, dtype=np.float64)
                            / (dim_half / 2.0))
    gy, gx = np.meshgrid(np.arange(gh, dtype=np.float64),
                         np.arange(gw, dtype=np.float64), indexing="ij")

    def embed(pos):
        out = np.einsum("n,d->nd", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([embed(gx), embed(gy)], axis=1)  # (N, embed_dim)


def relative_pos_bias(channels: int, n: int, m: int,
                      grid_hw=None) -> jnp.ndarray:
    """The Grapher's fixed relative-position bias: negative scaled gram
    matrix of 2D sin-cos embeddings, resized to (n, m). ``grid_hw`` gives
    the (h, w) node grid for non-square maps; default assumes square."""
    pe = _get_2d_sincos_pos_embed(
        channels, grid_hw if grid_hw is not None else int(round(n ** 0.5)))
    if pe.shape[0] != n:  # ValueError (not assert): must survive python -O
        raise ValueError(
            f"relative_pos_bias: node grid {pe.shape[0]} != n={n}; pass "
            "grid_hw=(h, w) for non-square node counts (ADVICE r2: the "
            "factored form no longer resizes the first node axis, so the "
            "default square-grid assumption must hold exactly)")
    if pe.shape[1] == 0:
        # channels < 4 leaves no sin-cos frequencies (dim_half // 2 == 0).
        # The unfactored gram formulation silently produced an all-NaN
        # bias here (0/0); no positional information exists, so the
        # correct degenerate bias is zero. Real ViG configs (>= 48 ch)
        # never hit this — only toy/test shapes do.
        return jnp.zeros((1, n, m), jnp.float32)
    pe_j = jnp.asarray(pe, jnp.float32)  # (n, d) — the only HLO constant
    if n != m:
        # The resize acts on the SECOND node axis only and is linear in
        # its input, so resize(pe @ pe.T) == pe @ resize(pe).T (same 1-D
        # triangle/antialias kernel either way — jax.image.resize is
        # separable and the untouched axes get identity weights).
        # Factoring through pe keeps the trace to an (n, d) constant and
        # an (n, d)x(d, m) matmul instead of materializing the (n, n)
        # gram (~67 MB of HLO constant per stage-1 Grapher at 256²
        # input, a pure compile-memory cost).
        pe_m = jax.image.resize(pe_j, (m, pe_j.shape[1]), method="linear")
    else:
        pe_m = pe_j
    bias = (-2.0 / pe.shape[1]) * jnp.einsum(
        "nd,md->nm", pe_j, pe_m, precision=jax.lax.Precision.HIGHEST)
    return bias[None]  # (1, n, m)


def knn_graph(x: jax.Array, y: jax.Array, k: int, dilation: int = 1,
              rel_pos: Optional[jax.Array] = None) -> jax.Array:
    """Dense dilated KNN: indices (B, N, k) of each x-node's neighbors in y.

    Similarity = -||x_i - y_j||^2 over L2-NORMALIZED features (public
    gcn_lib DenseDilatedKnnGraph applies F.normalize(x, p=2, dim=1) to
    both node sets before the distance — review finding; the ranking is
    not scale-invariant without it) + relative-pos bias, computed as one
    MXU matmul; top (k*dilation) then stride-dilation selection. Only
    neighbor SELECTION is normalized; gathered features stay raw.
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xf = xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-12)
    yf = yf / jnp.maximum(jnp.linalg.norm(yf, axis=-1, keepdims=True), 1e-12)
    x2 = jnp.sum(xf * xf, axis=-1, keepdims=True)  # (B, N, 1)
    y2 = jnp.sum(yf * yf, axis=-1)[:, None, :]  # (B, 1, M)
    sim = 2.0 * jnp.einsum("bnc,bmc->bnm", xf, yf,
                           preferred_element_type=jnp.float32) - x2 - y2
    if rel_pos is not None:
        sim = sim + rel_pos
    kk = min(k * dilation, y.shape[1])
    _, idx = jax.lax.top_k(sim, kk)
    return idx[:, :, ::dilation][:, :, :k]


# Above this one-hot size the MXU contraction stops paying for itself;
# fall back to the dynamic gather (module-level so tests can exercise
# both branches on tiny shapes).
ONEHOT_GATHER_BUDGET_BYTES = 1 << 29  # 512 MB


def gather_neighbors(neighbors: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, M, C) table + (B, N, k) indices -> (B, N, k, C) neighbor feats.

    TPU formulation: when the node table is small (ViG pools it to
    M <= 256 at every stage, models/changevig.py reduce_ratios), the
    dynamic gather is a one-hot contraction on the MXU instead of
    jnp.take_along_axis — TPU gathers run on the scalar/sparse path and
    their scatter-add backward is worse (the xplane trace of a
    ChangeGNNV2 train step showed ~26% of device time in these two).
    The one-hot matmul is exact (each output row sums one value and
    M-1 zeros) and its backward is another matmul. Falls back to
    take_along_axis when the (B*N*k, M) one-hot would not be worth
    materializing.
    """
    b, m, c = neighbors.shape
    _, n, k = idx.shape
    if b * n * k * m * neighbors.dtype.itemsize > ONEHOT_GATHER_BUDGET_BYTES:
        return jnp.take_along_axis(neighbors[:, :, None, :], idx[..., None],
                                   axis=1)
    onehot = jax.nn.one_hot(idx, m, dtype=neighbors.dtype)  # (B, N, k, M)
    return jnp.einsum("bnkm,bmc->bnkc", onehot, neighbors,
                      preferred_element_type=neighbors.dtype)


class BasicConv(nn.Module):
    """1x1 conv + BN + act over node features (gcn_lib BasicConv on (B,C,N,1))."""

    features: int
    act: str = "gelu"
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="conv")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return act_layer(self.act)(x)


class MRConv(nn.Module):
    """Max-Relative graph conv (conv='mr'): concat-interleave
    [x, max_j(x_j - x_i)] -> BasicConv."""

    features: int
    act: str = "gelu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, neighbors, idx, train=False):
        # x: (B, N, C); neighbors: (B, M, C); idx: (B, N, k)
        b, n, c = x.shape
        k = idx.shape[-1]
        gathered = gather_neighbors(neighbors, idx)  # (B, N, k, C)
        x_j = jnp.max(gathered - x[:, :, None, :], axis=2)  # (B, N, C)
        h = jnp.stack([x, x_j], axis=-1).reshape(b, n, 2 * c)  # channel interleave
        return BasicConv(self.features, self.act, dtype=self.dtype, name="nn")(h, train)


class EdgeConv(nn.Module):
    """EdgeConv (conv='edge'): max_j BasicConv(cat(x_i, x_j - x_i))."""

    features: int
    act: str = "gelu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, neighbors, idx, train=False):
        b, n, c = x.shape
        k = idx.shape[-1]
        gathered = gather_neighbors(neighbors, idx)  # (B, N, k, C)
        xi = jnp.broadcast_to(x[:, :, None, :], gathered.shape)
        h = jnp.concatenate([xi, gathered - xi], axis=-1)
        h = BasicConv(self.features, self.act, dtype=self.dtype, name="nn")(h, train)
        return jnp.max(h, axis=2)


class Grapher(nn.Module):
    """gcn_lib.Grapher parity: fc1 -> dynamic graph conv (2x width) -> fc2,
    DropPath residual; KNN against an r-downsampled node set with a fixed
    relative-position bias (ref usage: models/pyramid_vig.py:136-140,
    models/ChangeVIG.py:498-502)."""

    kernel_size: int = 9
    dilation: int = 1
    conv: str = "mr"
    act: str = "gelu"
    r: int = 1
    drop_path: float = 0.0
    relative_pos: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        # x: NHWC map
        b, h, w, c = x.shape
        shortcut = x
        hfeat = nn.Dense(c, dtype=self.dtype, name="fc1_conv")(x)
        hfeat = MPBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="fc1_bn")(hfeat)
        nodes = hfeat.reshape(b, h * w, c)
        if self.r > 1:
            pooled = nn.avg_pool(hfeat, (self.r, self.r), strides=(self.r, self.r))
            nbrs = pooled.reshape(b, -1, c)
        else:
            nbrs = nodes
        rel = None
        if self.relative_pos:
            rel = relative_pos_bias(c, h * w, nbrs.shape[1], grid_hw=(h, w))
        idx = knn_graph(nodes, nbrs, self.kernel_size, self.dilation, rel)
        conv_cls = MRConv if self.conv == "mr" else EdgeConv
        out = conv_cls(2 * c, self.act, dtype=self.dtype,
                       name="graph_conv")(nodes, nbrs, idx, train)
        out = out.reshape(b, h, w, 2 * c)
        out = nn.Dense(c, dtype=self.dtype, name="fc2_conv")(out)
        out = MPBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32, name="fc2_bn")(out)
        if train and self.drop_path > 0:
            from stcd_tpu.models.changeformer import drop_path
            out = drop_path(out, self.drop_path, False, self.make_rng("dropout"))
        return out + shortcut

"""BIT — Bitemporal Image Transformer (NHWC).

Parity targets:
- TwoLayerConv2d      <- models/help_funcs.py:7-15
- FeedForward         <- :52-63
- Attention           <- :117-152 (vanilla MHSA, scale = dim**-0.5 — the
                         reference scales by the MODEL dim, not head dim)
- Cross_Attention     <- :66-114 (optional no-softmax mode)
- Transformer         <- :154-167 (PreNorm + Residual)
- TransformerDecoder  <- :170-186 (PreNorm2/Residual2 cross-attn)
- ResNetCD            <- models/networks.py:223-304 (dilated resnet18
                         backbone, |f1-f2|, 4x bilinear up, 2-conv head)
- BASETransformer     <- models/networks.py:307-441 (semantic tokenizer via
                         spatial-attention einsum, shared encoder over
                         concatenated tokens, per-image decoder)

TPU notes: token counts are tiny (token_len=4) — attention math stays in
plain einsum (MXU); the backbone is the Siamese hot path and runs
2N-batched.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.encoders.resnet import ResNetEncoder
from stcd_tpu.layers.modules import resize_bilinear, upsample_nearest

Dtype = Any


class TwoLayerConv2d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        p = self.kernel_size // 2
        x = nn.Conv(c, (self.kernel_size,) * 2, padding=[(p, p)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                       padding=[(p, p)] * 2, dtype=self.dtype, name="conv2")(x)


class FeedForward(nn.Module):
    hidden_dim: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(d, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class Attention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = x.shape[-1]
        inner = self.dim_head * self.heads
        scale = d ** -0.5  # NOTE: model-dim scaling (ref help_funcs.py:122)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shp = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head
                                  ).transpose(0, 2, 1, 3)
        q, k, v = shp(q), shp(k), shp(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        out = nn.Dense(d, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class CrossAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    softmax: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, m, train=False):
        d = x.shape[-1]
        inner = self.dim_head * self.heads
        scale = d ** -0.5
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(m)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(m)
        shp = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head
                                  ).transpose(0, 2, 1, 3)
        q, k, v = shp(q), shp(k), shp(v)
        if self.softmax:
            from stcd_tpu.ops.attention import cross_attention
            out = cross_attention(q, k, v, scale=scale)
        else:
            dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                              preferred_element_type=jnp.float32) * scale
            out = jnp.einsum("bhij,bhjd->bhid", dots.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        out = nn.Dense(d, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class Transformer(nn.Module):
    depth: int
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 64
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn{i}")(x)
            x = x + Attention(self.heads, self.dim_head, self.dropout,
                              dtype=self.dtype, name=f"attn{i}")(h, train)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff{i}")(x)
            x = x + FeedForward(self.mlp_dim, self.dropout, dtype=self.dtype,
                                name=f"ff{i}")(h, train)
        return x


class TransformerDecoder(nn.Module):
    depth: int
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 64
    dropout: float = 0.0
    softmax: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, m, train=False):
        for i in range(self.depth):
            norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn{i}")
            x = x + CrossAttention(self.heads, self.dim_head, self.dropout,
                                   self.softmax, dtype=self.dtype,
                                   name=f"attn{i}")(norm(x), norm(m), train)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff{i}")(x)
            x = x + FeedForward(self.mlp_dim, self.dropout, dtype=self.dtype,
                                name=f"ff{i}")(h, train)
        return x


class _DilatedBackbone(nn.Module):
    """forward_single (ref networks.py:280-304): dilated resnet to 1/8
    (stages per resnet_stages_num), optional nearest 2x up, conv_pred->32."""

    backbone: str = "resnet18"
    resnet_stages_num: int = 5
    if_upsample_2x: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        from stcd_tpu.parallel.mesh import constrain_spatial

        depth = {3: 3, 4: 4, 5: 5}[self.resnet_stages_num]
        feats = ResNetEncoder(arch=self.backbone, depth=depth,
                              replace_stride_with_dilation=(False, True, True),
                              dtype=self.dtype)(x, train)
        h = feats[-1]
        h_in = h.shape[1]
        if self.if_upsample_2x:
            h = upsample_nearest(h, 2)
        h = nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv_pred")(h)
        # re-enter the spatial layout on an elementwise copy AFTER the
        # conv (prev_h = the pre-upsample height): when the deep maps ran
        # batch-parallel (below the >= 2-rows floor), transitioning
        # through conv_pred's spatial partitioner corrupts its backward
        # (parallel/mesh._space_shardable); no-op without a 'space' mesh
        return constrain_spatial(h, prev_h=h_in)


class ResNetCD(nn.Module):
    """base_resnet18 (ref networks.py:223-279)."""

    output_nc: int = 2
    backbone: str = "resnet18"
    resnet_stages_num: int = 5
    output_sigmoid: bool = False
    if_upsample_2x: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train=False):
        n = x1.shape[0]
        f = _DilatedBackbone(self.backbone, self.resnet_stages_num,
                             self.if_upsample_2x, dtype=self.dtype,
                             name="backbone")(jnp.concatenate([x1, x2], 0), train)
        x = jnp.abs(f[:n] - f[n:])
        if not self.if_upsample_2x:
            x = upsample_nearest(x, 2)
        x = resize_bilinear(x, (x.shape[1] * 4, x.shape[2] * 4))
        x = TwoLayerConv2d(self.output_nc, dtype=self.dtype, name="classifier")(x, train)
        if self.output_sigmoid:
            x = jax.nn.sigmoid(x)
        return x


class BASETransformer(nn.Module):
    """BIT (ref networks.py:307-441)."""

    output_nc: int = 2
    with_pos: Optional[str] = "learned"
    resnet_stages_num: int = 5
    token_len: int = 4
    token_trans: bool = True
    enc_depth: int = 1
    dec_depth: int = 1
    dim_head: int = 64
    decoder_dim_head: int = 64
    tokenizer: bool = True
    if_upsample_2x: bool = True
    pool_mode: str = "max"
    pool_size: int = 2
    backbone: str = "resnet18"
    decoder_softmax: bool = True
    with_decoder_pos: Optional[str] = None
    with_decoder: bool = True
    output_sigmoid: bool = False
    dtype: Optional[Dtype] = None
    # Optional GPipe routing of the transformer_decoder stack (beyond
    # parity): dict(mesh=, n_micro=, stage_axis=) — see
    # parallel/pipeline.bit_pipeline_forward. None = sequential decoder.
    # Static hyperparameter: the SAME checkpoint runs either way.
    pipeline_decoder: Optional[Any] = None

    def _semantic_tokens(self, x, conv_a):
        """Spatial-attention tokenizer (ref :359-367)."""
        b, h, w, c = x.shape
        att = conv_a(x).reshape(b, h * w, -1)  # (b, n, L)
        att = jax.nn.softmax(att, axis=1)  # softmax over spatial dim
        feats = x.reshape(b, h * w, c)
        return jnp.einsum("bnl,bnc->blc", att, feats,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    @nn.compact
    def __call__(self, x1, x2, train=False):
        n = x1.shape[0]
        dim = 32
        f = _DilatedBackbone(self.backbone, self.resnet_stages_num,
                             self.if_upsample_2x, dtype=self.dtype,
                             name="backbone")(jnp.concatenate([x1, x2], 0), train)
        # CNN<->transformer boundary pin (no-op without a 'space' mesh):
        # under TPxSP the transformer's 'model'-sharded Dense backward
        # would otherwise send a 'model'-sharded cotangent into the
        # space-sharded backbone, producing the feature x spatial
        # partitioned grad-convs GSPMD miscompiles (parallel/mesh
        # _space_shardable docstring). The constraint's transpose pins
        # the cotangent to the same P('data','space') layout.
        from stcd_tpu.parallel.mesh import constrain_spatial
        f = constrain_spatial(f)
        f1, f2 = f[:n], f[n:]

        token_len = self.token_len
        if self.tokenizer:
            conv_a = nn.Conv(token_len, (1, 1), use_bias=False, dtype=self.dtype,
                             name="conv_a")
            token1 = self._semantic_tokens(f1, conv_a)
            token2 = self._semantic_tokens(f2, conv_a)
        else:
            token_len = self.pool_size ** 2

            def pool_tokens(x):
                b, h, w, c = x.shape
                ph = h // self.pool_size
                xr = x.reshape(b, self.pool_size, ph, self.pool_size, w // self.pool_size, c)
                if self.pool_mode == "max":
                    t = xr.max(axis=(2, 4))
                else:
                    t = xr.mean(axis=(2, 4))
                return t.reshape(b, token_len, c)

            token1, token2 = pool_tokens(f1), pool_tokens(f2)

        if self.token_trans:
            tokens = jnp.concatenate([token1, token2], axis=1)
            if self.with_pos == "learned":
                pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                                 (1, token_len * 2, dim))
                tokens = tokens + pos
            tokens = Transformer(self.enc_depth, 8, self.dim_head, 2 * dim,
                                 dtype=self.dtype, name="transformer")(tokens, train)
            token1, token2 = jnp.split(tokens, 2, axis=1)

        if self.with_decoder:
            dec = TransformerDecoder(self.dec_depth, 8, self.decoder_dim_head,
                                     2 * dim, softmax=self.decoder_softmax,
                                     dtype=self.dtype, name="transformer_decoder")

            if self.with_decoder_pos in ("fix", "learned"):
                pos_dec = self.param("pos_embedding_decoder",
                                     nn.initializers.normal(1.0),
                                     (1, f1.shape[1], f1.shape[2], dim))
            else:
                pos_dec = None

            def decode(x, m):
                b, h, w, c = x.shape
                if pos_dec is not None:
                    x = x + pos_dec
                xx = x.reshape(b, h * w, c)
                if self.pipeline_decoder is not None and not self.is_initializing():
                    # GPipe the depth-D block stack over the 'stage' mesh
                    # axis; params are read directly (dec is never called,
                    # so this path shares the sequential param structure)
                    from stcd_tpu.parallel.pipeline import pipelined_decoder_apply
                    out = pipelined_decoder_apply(
                        dec, self.variables["params"]["transformer_decoder"],
                        xx, m, **self.pipeline_decoder)
                else:
                    out = dec(xx, m, train)
                return out.reshape(b, h, w, c)

            f1 = decode(f1, token1)
            f2 = decode(f2, token2)
        else:
            f1 = f1 + token1.sum(axis=1)[:, None, None, :]
            f2 = f2 + token2.sum(axis=1)[:, None, None, :]

        x = jnp.abs(f1 - f2)
        if not self.if_upsample_2x:
            x = upsample_nearest(x, 2)
        x = resize_bilinear(x, (x.shape[1] * 4, x.shape[2] * 4))
        x = TwoLayerConv2d(self.output_nc, dtype=self.dtype, name="classifier")(x, train)
        if self.output_sigmoid:
            x = jax.nn.sigmoid(x)
        return x

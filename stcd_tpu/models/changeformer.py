"""ChangeFormer V1-V6 — Siamese SegFormer-style transformer CD (NHWC).

Parity targets (ref models/ChangeFormer.py):
- OverlapPatchEmbed      :195-236 (conv k=p s=s pad=p//2 + LayerNorm)
- Mlp (MixFFN) + DWConv  :260-295, 512-523
- Attention (SRA)        :298-358 (spatial-reduction attention: KV from a
                           sr_ratio-strided conv + LayerNorm)
- Block                  :505-510 (prenorm attn/mlp with DropPath)
- EncoderTransformer     :23-193   (Tenc :525-531; scales /4../32)
- EncoderTransformer_x2  :975-1137 (5 stages; scales /2../32)
- EncoderTransformer_v3  :1342-1473 (scales /4../32)
- MLP proj               :677-688
- conv_diff/make_prediction :1138-1157
- ConvLayer/UpsampleConvLayer/ResidualBlock <- ChangeFormerBaseNetworks.py:85-120
- convprojection_base    :591-643
- TDec                   :691-790, TDecV2 :793-871 (PixelShuffle 4x head)
- DecoderTransformer_x2  :1159-1306, DecoderTransformer_v3 :1475-1631
- ChangeFormerV1..V6     :644,918,951,1309,1634,1669

TPU notes: attention is einsum-based (MXU); the SRA KV reduction is a
strided conv XLA maps to the MXU. The Siamese encoder runs 2N-batched.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import resize_bilinear

Dtype = Any


def drop_path(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask / keep


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, False, rng)


class OverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=(self.stride,) * 2, padding=[(p, p)] * 2,
                    dtype=self.dtype, name="proj")(x)
        # ref :210 builds this norm as PLAIN nn.LayerNorm (eps 1e-5), not
        # via the encoder's norm_layer partial (review finding)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class DWConv(nn.Module):
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, feature_group_count=c,
                       dtype=self.dtype, name="dwconv")(x)


class MixFFN(nn.Module):
    hidden: int
    drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = DWConv(dtype=self.dtype, name="dw")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(d, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class SRAttention(nn.Module):
    """Spatial-reduction attention (ref :298-358). Operates on NHWC maps."""

    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)
        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio,) * 2, strides=(self.sr_ratio,) * 2,
                            dtype=self.dtype, name="sr")(x)
            # plain nn.LayerNorm in the ref (:317), eps 1e-5
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(kv_in)
        else:
            kv_in = x
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, m, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        scale = hd ** -0.5
        from stcd_tpu.ops.attention import cross_attention
        if train and self.attn_drop > 0.0:
            # in-kernel attention-matrix dropout: a stateless hash mask
            # recomputed in the fused forward AND backward (and matched
            # bit-for-bit by the einsum fallback), so V6's real training
            # config (attn_drop=0.1, ref :1682) rides the flash path —
            # the (N, M) matrix/mask never touches HBM
            seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            out = cross_attention(q, k, v, scale=scale,
                                  dropout_rate=self.attn_drop,
                                  dropout_seed=seed)
        else:
            out = cross_attention(q, k, v, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6  # the encoder's norm_layer partial; V4 uses 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        h = SRAttention(self.num_heads, self.sr_ratio, self.qkv_bias,
                        self.attn_drop, self.drop, dtype=self.dtype, name="attn")(h, train)
        x = x + DropPath(self.drop_path_rate, name="dp1")(h, train)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        h = MixFFN(c * self.mlp_ratio, self.drop, dtype=self.dtype, name="mlp")(h, train)
        return x + DropPath(self.drop_path_rate, name="dp2")(h, train)


class SegFormerStage(nn.Module):
    """One MiT encoder stage (patch embed + blocks + norm) with child
    names matching SegFormerEncoder's flat layout, so an encoder param
    subset applies directly — the unit the heterogeneous GPipe pipelines
    (parallel/pipeline.gpipe_hetero; VERDICT r2 item 5)."""

    index: int  # 0-based stage
    dim: int
    depth: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    patch: int
    stride: int
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    dpr: Sequence[float] = ()
    norm_eps: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        s = self.index
        x = OverlapPatchEmbed(self.patch, self.stride, self.dim,
                              dtype=self.dtype, name=f"patch_embed{s + 1}")(x)
        for i in range(self.depth):
            x = Block(self.num_heads, self.mlp_ratio, self.sr_ratio,
                      self.qkv_bias, self.drop, self.attn_drop,
                      self.dpr[i] if i < len(self.dpr) else 0.0,
                      norm_eps=self.norm_eps, dtype=self.dtype,
                      name=f"block{s + 1}_{i}")(x, train)
        return nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                            name=f"norm{s + 1}")(x)


class SegFormerEncoder(nn.Module):
    """Parameterized MiT encoder covering EncoderTransformer (/4 first
    stride), EncoderTransformer_x2 (/2 first stride, 5 stages) and
    EncoderTransformer_v3."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    first_patch: int = 7
    first_stride: int = 4
    patch_size: int = 3
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6  # Tenc/V5/V6 pass partial(LayerNorm, eps=1e-6);
    # V4's EncoderTransformer_x2 defaults to nn.LayerNorm (1e-5)
    dtype: Optional[Dtype] = None
    # Optional heterogeneous-GPipe routing of the stage chain (beyond
    # parity): dict(mesh=, n_micro=, stage_axis=) with the 'stage' axis
    # sized len(embed_dims). None = sequential. Static hyperparameter:
    # the SAME checkpoint runs either way (init always runs sequential).
    pipeline: Optional[Any] = None

    def _stage_cfg(self, s):
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        cur = sum(self.depths[:s])
        return dict(
            index=s, dim=self.embed_dims[s], depth=self.depths[s],
            num_heads=self.num_heads[s], mlp_ratio=self.mlp_ratios[s],
            sr_ratio=self.sr_ratios[s],
            patch=self.first_patch if s == 0 else self.patch_size,
            stride=self.first_stride if s == 0 else 2,
            qkv_bias=self.qkv_bias, drop=self.drop_rate,
            attn_drop=self.attn_drop_rate,
            dpr=tuple(dpr[cur:cur + self.depths[s]]),
            norm_eps=self.norm_eps, dtype=self.dtype)

    def _pipelined(self, x, train) -> List[jax.Array]:
        """Route the stage chain through gpipe_hetero: each mesh 'stage'
        device owns one encoder stage; the per-stage feature pyramid is
        emitted through the collect_aux channel (device-resident slot
        buffers — earlier features never ride the inter-stage ring).
        Under train, each stage folds its own dropout key from one base
        key (masks are then shared across microbatches of a stage —
        valid dropout, noted deviation from sequential)."""
        from stcd_tpu.parallel.pipeline import gpipe_hetero

        cfg = dict(self.pipeline)
        params = self.variables["params"]
        n_stages = len(self.embed_dims)
        needs_rng = train and (self.drop_rate > 0 or self.attn_drop_rate > 0
                               or self.drop_path_rate > 0)
        base_key = self.make_rng("dropout") if needs_rng else None
        stage_fns, stage_params = [], []
        for s in range(n_stages):
            blk = SegFormerStage(**self._stage_cfg(s))
            keys = ([f"patch_embed{s + 1}", f"norm{s + 1}"]
                    + [f"block{s + 1}_{i}" for i in range(self.depths[s])])
            sub = {"params": {k: params[k] for k in keys}}
            if needs_rng:
                sub["key"] = jax.random.fold_in(base_key, s)

            def fn(p, xx, blk=blk):
                rngs = {"dropout": p["key"]} if "key" in p else None
                y = blk.apply({"params": p["params"]}, xx, train, rngs=rngs)
                return y, y  # next-stage input AND this stage's feature

            stage_fns.append(fn)
            stage_params.append(sub)
        _, feats = gpipe_hetero(stage_fns, stage_params, x,
                                mesh=cfg["mesh"], n_micro=cfg["n_micro"],
                                stage_axis=cfg.get("stage_axis", "stage"),
                                collect_aux=True)
        return list(feats)

    @nn.compact
    def __call__(self, x, train=False) -> List[jax.Array]:
        if self.pipeline is not None and not self.is_initializing():
            return self._pipelined(x, train)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs = []
        cur = 0
        for s, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            patch = self.first_patch if s == 0 else self.patch_size
            stride = self.first_stride if s == 0 else 2
            x = OverlapPatchEmbed(patch, stride, dim, dtype=self.dtype,
                                  name=f"patch_embed{s + 1}")(x)
            for i in range(depth):
                x = Block(self.num_heads[s], self.mlp_ratios[s], self.sr_ratios[s],
                          self.qkv_bias, self.drop_rate, self.attn_drop_rate,
                          dpr[cur + i], norm_eps=self.norm_eps, dtype=self.dtype,
                          name=f"block{s + 1}_{i}")(x, train)
            x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                             name=f"norm{s + 1}")(x)
            outs.append(x)
            cur += depth
        return outs


class ConvDiff(nn.Module):
    """conv_diff (ref :1138-1149): 2x (Conv -> PReLU -> BN -> Dropout .6)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"conv{i}")(x)
            alpha = self.param(f"prelu{i}", nn.initializers.constant(0.25), (1,))
            # keep the compute dtype: fp32 alpha would promote bf16
            # activations through the PReLU/BN/Dropout chain
            x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
            x = MPBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.Dropout(0.6, deterministic=not train, name=f"do{i}")(x)
        return x


class MakePrediction(nn.Module):
    """make_prediction (ref :1151-1157)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        # ref reduces to out_channels at conv1 already (Conv(in, out) ->
        # ReLU -> BN(out) -> Conv(out, out), ChangeFormer.py:1151-1157)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="conv2")(x)


class UpsampleConvLayer(nn.Module):
    """ConvTranspose(k=4, s=2, p=1): exact 2x (ref BaseNetworks :98-105)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                padding=((2, 2), (2, 2)), transpose_kernel=True,
                                dtype=self.dtype)(x)


class ResidualBlock(nn.Module):
    """x + 0.1 * conv(relu(conv(x))) (ref BaseNetworks :108-120)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.relu(nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                            name="conv1")(x))
        h = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv2")(h)
        return x + h * 0.1


def _up2_bilinear(x):
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)."""
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)


class DecoderTransformerV3(nn.Module):
    """ref :1475-1631 — per-scale linear proj, conv_diff(cat) + cascaded
    2x-upsampled deeper diff, 4 side preds, 4-scale fuse, 2x conv-transpose
    ups + residual blocks."""

    embedding_dim: int = 64
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, f1, f2, train=False):
        dt = self.dtype
        e = self.embedding_dim
        outs = []
        target_hw = f1[0].shape[1:3]
        prev = None
        ups = []
        for s in (3, 2, 1, 0):
            proj = nn.Dense(e, dtype=dt, name=f"linear_c{s + 1}")
            a, b = proj(f1[s]), proj(f2[s])
            d = ConvDiff(e, dtype=dt, name=f"diff_c{s + 1}")(
                jnp.concatenate([a, b], axis=-1), train)
            if prev is not None:
                d = d + _up2_bilinear(prev)
            outs.append(MakePrediction(self.output_nc, dtype=dt,
                                       name=f"make_pred_c{s + 1}")(d, train))
            ups.append(d if s == 0 else resize_bilinear(d, target_hw, False))
            prev = d
        _c = nn.Conv(e, (1, 1), dtype=dt, name="linear_fuse_conv")(
            jnp.concatenate(ups, axis=-1))
        _c = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                          dtype=jnp.float32, name="linear_fuse_bn")(_c)
        x = UpsampleConvLayer(e, dtype=dt, name="convd2x")(_c)
        x = ResidualBlock(dtype=dt, name="dense_2x")(x)
        x = UpsampleConvLayer(e, dtype=dt, name="convd1x")(x)
        x = ResidualBlock(dtype=dt, name="dense_1x")(x)
        cp = nn.Conv(self.output_nc, (3, 3), padding=[(1, 1)] * 2, dtype=dt,
                     name="change_probability")(x)
        outs.append(cp)
        if self.decoder_softmax:
            outs = [jax.nn.sigmoid(o) for o in outs]
        return outs


class DecoderTransformerX2(nn.Module):
    """ref :1159-1306 — 5-scale variant; deeper diff is concatenated (not
    added) into the next conv_diff; final head = convd2x + residual + conv."""

    embedding_dim: int = 64
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, f1, f2, train=False):
        dt = self.dtype
        e = self.embedding_dim
        outs, ups = [], []
        target_hw = f1[0].shape[1:3]
        prev = None
        for s in (4, 3, 2, 1, 0):
            proj = nn.Dense(e, dtype=dt, name=f"linear_c{s + 1}")
            a, b = proj(f1[s]), proj(f2[s])
            cat = [a, b] if prev is None else [_up2_bilinear(prev), a, b]
            d = ConvDiff(e, dtype=dt, name=f"diff_c{s + 1}")(
                jnp.concatenate(cat, axis=-1), train)
            outs.append(MakePrediction(self.output_nc, dtype=dt,
                                       name=f"make_pred_c{s + 1}")(d, train))
            ups.append(d if s == 0 else resize_bilinear(d, target_hw, False))
            prev = d
        _c = nn.Conv(e, (1, 1), dtype=dt, name="linear_fuse")(
            jnp.concatenate(ups, axis=-1))
        x = UpsampleConvLayer(e, dtype=dt, name="convd2x")(_c)
        x = ResidualBlock(dtype=dt, name="dense_2x")(x)
        cp = nn.Conv(self.output_nc, (3, 3), padding=[(1, 1)] * 2, dtype=dt,
                     name="change_probability")(x)
        outs.append(cp)
        if self.decoder_softmax:
            outs = [jax.nn.sigmoid(o) for o in outs]
        return outs


class TDec(nn.Module):
    """ref :691-790 — SegFormer fuse head over (already-differenced) features."""

    embedding_dim: int = 32
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats, train=False):
        dt = self.dtype
        e = self.embedding_dim
        target_hw = feats[0].shape[1:3]
        ups = []
        for s in (3, 2, 1, 0):
            h = nn.Dense(e, dtype=dt, name=f"linear_c{s + 1}")(feats[s])
            ups.append(h if s == 0 else resize_bilinear(h, target_hw, False))
        _c = nn.Conv(e, (1, 1), dtype=dt, name="linear_fuse")(
            jnp.concatenate(ups, axis=-1))
        x = UpsampleConvLayer(e, dtype=dt, name="convd2x")(_c)
        x = ResidualBlock(dtype=dt, name="dense_2x")(x)
        x = UpsampleConvLayer(e, dtype=dt, name="convd1x")(x)
        x = ResidualBlock(dtype=dt, name="dense_1x")(x)
        cp = nn.Conv(self.output_nc, (3, 3), padding=[(1, 1)] * 2, dtype=dt,
                     name="change_probability")(x)
        if self.decoder_softmax:
            cp = jax.nn.softmax(cp, axis=-1)
        return cp


class TDecV2(nn.Module):
    """ref :793-871 — abs-diff of per-scale projections, 1x1 fuse, conv +
    PixelShuffle(4) head."""

    embedding_dim: int = 64
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, f1, f2, train=False):
        dt = self.dtype
        e = self.embedding_dim
        target_hw = f1[0].shape[1:3]
        diffs = []
        for s in (3, 2, 1, 0):
            proj = nn.Dense(e, dtype=dt, name=f"linear_c{s + 1}")
            a, b = proj(f1[s]), proj(f2[s])
            if s != 0:
                a = resize_bilinear(a, target_hw, False)
                b = resize_bilinear(b, target_hw, False)
            diffs.append(jnp.abs(a - b))
        _c = nn.Conv(e, (1, 1), dtype=dt, name="linear_fuse")(
            jnp.concatenate(diffs, axis=-1))
        x = nn.relu(nn.Conv(16 * self.output_nc, (3, 3), padding=[(1, 1)] * 2,
                            dtype=dt, name="pix_shuffle_conv")(_c))
        # PixelShuffle(4), NHWC. torch semantics: output channel c at
        # sub-position (dy, dx) reads input channel c*16 + dy*4 + dx, so the
        # channel dim factors as (o, dy, dx) with o slowest.
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, self.output_nc, 4, 4)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * 4, w * 4, self.output_nc)
        if self.decoder_softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x


class ConvProjectionBase(nn.Module):
    """convprojection_base (ref :591-643): cascaded 2x transposed-conv ups
    with residual blocks and skip additions down the (diff) pyramid."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats):
        dt = self.dtype
        x = UpsampleConvLayer(320, dtype=dt, name="convd16x")(feats[3])
        x = ResidualBlock(dtype=dt, name="dense_4")(x) + feats[2]
        x = UpsampleConvLayer(128, dtype=dt, name="convd8x")(x)
        x = ResidualBlock(dtype=dt, name="dense_3")(x) + feats[1]
        x = UpsampleConvLayer(64, dtype=dt, name="convd4x")(x)
        x = ResidualBlock(dtype=dt, name="dense_2")(x) + feats[0]
        x = UpsampleConvLayer(16, dtype=dt, name="convd2x")(x)
        x = ResidualBlock(dtype=dt, name="dense_1")(x)
        return UpsampleConvLayer(8, dtype=dt, name="convd1x")(x)


def _tenc(dtype):
    """Tenc (ref :525-531)."""
    return SegFormerEncoder(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
                            num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
                            qkv_bias=True, drop_path_rate=0.1, dtype=dtype,
                            name="Tenc")


class _SiamBase(nn.Module):
    input_nc: int = 3
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None
    # Optional heterogeneous-GPipe routing of the MiT encoder stages
    # (SegFormerEncoder.pipeline): dict(mesh=, n_micro=, stage_axis=).
    # None = sequential; same checkpoint runs either way.
    pipeline_encoder: Optional[Any] = None

    def encode_pair(self, enc, x1, x2, train):
        n = x1.shape[0]
        feats = enc(jnp.concatenate([x1, x2], axis=0), train)
        return [f[:n] for f in feats], [f[n:] for f in feats]


class ChangeFormerV1(_SiamBase):
    """ref :644-675: abs-diff of Tenc features -> conv projection -> head."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(_tenc(self.dtype), x1, x2, train)
        di = [jnp.abs(a - b) for a, b in zip(f1, f2)]
        cp = ConvProjectionBase(dtype=self.dtype, name="convproj")(di)
        cp = nn.Conv(self.output_nc, (3, 3), padding=[(1, 1)] * 2,
                     dtype=self.dtype, name="change_probability")(cp)
        if self.decoder_softmax:
            cp = jax.nn.softmax(cp, axis=-1)
        return cp


class ChangeFormerV2(_SiamBase):
    """ref :918-949: abs-diff -> TDec."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(_tenc(self.dtype), x1, x2, train)
        di = [jnp.abs(a - b) for a, b in zip(f1, f2)]
        cp = TDec(32, self.output_nc, self.decoder_softmax, dtype=self.dtype,
                  name="TDec")(di, train)
        if self.decoder_softmax:
            # ref quirk MATCHED: softmax applied inside TDec (:787-788)
            # AND again in ChangeFormerV2.forward (:945-946) —
            # softmax(softmax(logits))
            cp = jax.nn.softmax(cp, axis=-1)
        return cp


class ChangeFormerV3(_SiamBase):
    """ref :951-973: Tenc + TDecV2 (PixelShuffle head)."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(_tenc(self.dtype), x1, x2, train)
        return TDecV2(64, self.output_nc, self.decoder_softmax, dtype=self.dtype,
                      name="TDec")(f1, f2, train)


class ChangeFormerV4(_SiamBase):
    """ref :1309-1338: 5-stage x2 encoder + x2 decoder. Returns multi-scale list."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        enc = SegFormerEncoder(
            embed_dims=(32, 64, 128, 320, 512), depths=(3, 3, 4, 12, 3),
            num_heads=(2, 2, 4, 8, 16), mlp_ratios=(2, 2, 2, 2, 2),
            sr_ratios=(8, 4, 2, 1, 1), first_patch=7, first_stride=2,
            qkv_bias=False, norm_eps=1e-5, dtype=self.dtype,
            pipeline=self.pipeline_encoder, name="Tenc_x2")
        f1, f2 = self.encode_pair(enc, x1, x2, train)
        return DecoderTransformerX2(256, self.output_nc, self.decoder_softmax,
                                    dtype=self.dtype, name="TDec_x2")(f1, f2, train)


class ChangeFormerV5(_SiamBase):
    """ref :1634-1667. Returns multi-scale prediction list (last = full res)."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, x1, x2, train=False):
        # The reference passes patch_size=4 (:1646), which makes stages 2-4
        # come out (H/2+1)-sized and its own decoder crash on the shape
        # mismatch at ChangeFormer.py:1582 — reference V5 cannot execute on
        # ANY input size (verified; dead code like gcn_lib). We keep V5's
        # depths/heads but use the standard patch-3 embeds so it runs.
        enc = SegFormerEncoder(
            embed_dims=(64, 128, 320, 512), depths=(3, 6, 16, 3),
            num_heads=(1, 2, 5, 8), sr_ratios=(8, 4, 2, 1), first_patch=7,
            first_stride=4, patch_size=3, qkv_bias=True, drop_path_rate=0.1,
            dtype=self.dtype, pipeline=self.pipeline_encoder,
            name="Tenc_x2")
        f1, f2 = self.encode_pair(enc, x1, x2, train)
        return DecoderTransformerV3(self.embed_dim, self.output_nc,
                                    self.decoder_softmax, dtype=self.dtype,
                                    name="TDec_x2")(f1, f2, train)


class ChangeFormerV6(_SiamBase):
    """ref :1669-1701 (the define_G 'ChangeFormerV6'). Multi-scale list out."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, x1, x2, train=False):
        # ref passes patch_size=7 (:1682) — ALL four patch embeds are 7x7
        enc = SegFormerEncoder(
            embed_dims=(64, 128, 320, 512), depths=(3, 3, 4, 3),
            num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1), first_patch=7,
            first_stride=4, patch_size=7, qkv_bias=True, drop_rate=0.1,
            attn_drop_rate=0.1, drop_path_rate=0.1, dtype=self.dtype,
            pipeline=self.pipeline_encoder, name="Tenc_x2")
        f1, f2 = self.encode_pair(enc, x1, x2, train)
        return DecoderTransformerV3(self.embed_dim, self.output_nc,
                                    self.decoder_softmax, dtype=self.dtype,
                                    name="TDec_x2")(f1, f2, train)

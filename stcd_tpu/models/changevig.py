"""ChangeVIG — graph-neural-network change detection (NHWC).

Parity targets:
- Stem/Downsample/FFN  <- models/pyramid_vig.py:41-101
- VIGBackbone (DeepGCN/EncoderV1/V2/EncoderVIG_V20_2 — identical bodies,
  ref pyramid_vig.py:103-174, ChangeVIG.py:26-99, :463-534, :1031-1103):
  Stem(/4) + pos_embed, stages of [Grapher + FFN] with Downsample between,
  feature taps at flattened block indices {1, 4, 11, 14} for blocks
  [2,2,6,2] -> 4-level pyramid at /4 /8 /16 /32.
- Cross_ConCat   <- ChangeVIG.py:315-347 (interleave + grouped conv + two
  conv branches summed)
- Global_Local   <- :350-391 (channel(2,1)-conv + spatial gate * x + local
  multi-kernel depthwise branch)
- HFFM / VFFM    <- :408-415 / :418-460
- Sub/Abs/Conc   <- :667-751 (HFFM_Compare diff modes)
- conv_diff_V20  <- :921-953, csam_V20 <- :956-994, AFF <- :996-1028
- DecoderV1 (ChangeFormer-style diff cascade) <- :101-281
- DecoderV2 / DecoderV2_Compare (HFFM+VFFM) <- :537-631 / :768-863
- DecoderVIG_V20_2 <- :1105-1239
- ChangeGNNV1/V2/V2_Compare, VIG_V20_2 <- :284,:634,:865,:1242

The Grapher/KNN machinery is stcd_tpu.models.gcn_lib (the reference's
gcn_lib dependency is missing from its tree).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import resize_bilinear
from stcd_tpu.models.changeformer import (
    ConvDiff,
    MakePrediction,
    ResidualBlock,
    UpsampleConvLayer,
    drop_path,
)
from stcd_tpu.models.gcn_lib import Grapher, act_layer

# one-shot flag for the pipelined-train frozen-BN warning (ADVICE r4)
_PP_TRAIN_WARNED = False

Dtype = Any


def _bn(train, dtype, name):
    return MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


def _conv_bn(x, feats, k, name, train, dtype, stride=1, groups=1, use_bias=True):
    p = k // 2
    x = nn.Conv(feats, (k, k), strides=(stride, stride), padding=[(p, p)] * 2,
                feature_group_count=groups, use_bias=use_bias, dtype=dtype,
                name=name + "_conv")(x)
    return _bn(train, dtype, name + "_bn")(x)


class Stem(nn.Module):
    """ref pyramid_vig.py:66-85: conv s2 -> conv s2 -> conv s1, BN+act."""

    out_dim: int
    act: str = "gelu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        a = act_layer(self.act)
        x = a(_conv_bn(x, self.out_dim // 2, 3, "c1", train, self.dtype, stride=2))
        x = a(_conv_bn(x, self.out_dim, 3, "c2", train, self.dtype, stride=2))
        return _conv_bn(x, self.out_dim, 3, "c3", train, self.dtype)


class Downsample(nn.Module):
    """ref pyramid_vig.py:88-101."""

    out_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        return _conv_bn(x, self.out_dim, 3, "c", train, self.dtype, stride=2)


class FFN(nn.Module):
    """ref pyramid_vig.py:41-63: 1x1+BN -> act -> 1x1+BN, DropPath residual."""

    hidden: int
    act: str = "gelu"
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        shortcut = x
        h = _conv_bn(x, self.hidden, 1, "fc1", train, self.dtype)
        h = act_layer(self.act)(h)
        h = _conv_bn(h, c, 1, "fc2", train, self.dtype)
        if train and self.drop_path > 0:
            h = drop_path(h, self.drop_path, False, self.make_rng("dropout"))
        return h + shortcut


class VIGStage(nn.Module):
    """One pipeline stage of ``VIGBackbone``: the optional Downsample plus
    the stage's Grapher/FFN pairs. Submodule names match the sequential
    parent exactly (``down{i}``, ``grapher{idx}``, ``ffn{idx}``), so the
    SAME parameter tree slices per stage — any checkpoint runs pipelined
    unchanged (the gpipe_hetero routing, VERDICT r3 item 6)."""

    stage: int
    blocks: Sequence[int] = (2, 2, 6, 2)
    channels: Sequence[int] = (80, 160, 400, 640)
    k: int = 9
    conv: str = "mr"
    act: str = "gelu"
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        n_blocks = sum(self.blocks)
        dpr = [self.drop_path_rate * i / max(n_blocks - 1, 1)
               for i in range(n_blocks)]
        max_dilation = 49 // self.k
        reduce_ratios = [4, 2, 1, 1]
        i = self.stage
        ch = self.channels[i]
        idx0 = sum(self.blocks[:i])
        if i > 0:
            x = Downsample(ch, dtype=self.dtype, name=f"down{i}")(x, train)
        for j in range(self.blocks[i]):
            idx = idx0 + j
            x = Grapher(self.k, min(idx // 4 + 1, max_dilation), self.conv,
                        self.act, reduce_ratios[i], dpr[idx],
                        dtype=self.dtype, name=f"grapher{idx}")(x, train)
            x = FFN(ch * 4, self.act, dpr[idx], dtype=self.dtype,
                    name=f"ffn{idx}")(x, train)
        return x


class VIGBackbone(nn.Module):
    """Pyramid ViG encoder (ref pyramid_vig.py:103-174 DeepGCN and its
    ChangeVIG copies). Returns 4 features at /4 /8 /16 /32."""

    blocks: Sequence[int] = (2, 2, 6, 2)
    channels: Sequence[int] = (80, 160, 400, 640)
    k: int = 9
    conv: str = "mr"
    act: str = "gelu"
    drop_path_rate: float = 0.0
    img_size: int = 256
    dtype: Optional[Dtype] = None
    # Optional heterogeneous-GPipe routing of the 4 pyramid stages
    # (VERDICT r3 item 6): dict(mesh=, n_micro=, stage_axis=) with the
    # 'stage' axis sized len(blocks). None = sequential. Static
    # hyperparameter: the SAME checkpoint runs either way (init always
    # runs sequential). Inside the pipeline the stages run with
    # train=False — BN uses (frozen) running statistics and DropPath is
    # inactive — a DOCUMENTED deviation (docs/SCALING.md): per-microbatch
    # BN batch stats would diverge from sequential semantics anyway, and
    # the decoder (outside the pipeline) keeps full train-mode BN.
    pipeline: Optional[Any] = None

    def _stage_keys(self, s: int):
        idx0 = sum(self.blocks[:s])
        keys = [] if s == 0 else [f"down{s}"]
        for j in range(self.blocks[s]):
            keys += [f"grapher{idx0 + j}", f"ffn{idx0 + j}"]
        return keys

    def _pipelined(self, x, train) -> List[jax.Array]:
        """Route the stage chain through gpipe_hetero: each mesh 'stage'
        device owns one pyramid stage; the per-stage feature emits
        through the collect_aux channel (device-resident slot buffers).
        The stem + pos_embed run before the pipeline (data-parallel,
        cheap), mirroring how the taps land on stage ENDS (the sequential
        taps {1,4,11,14} for (2,2,6,2) are exactly the stage outputs)."""
        from stcd_tpu.parallel.pipeline import gpipe_hetero

        if train:
            # one-shot runtime signal for the documented deviation above:
            # a from-scratch pp run normalizes the whole encoder with
            # frozen (init-valued) BN running stats (ADVICE r4)
            global _PP_TRAIN_WARNED
            if not _PP_TRAIN_WARNED:
                _PP_TRAIN_WARNED = True
                import logging
                logging.getLogger(__name__).warning(
                    "VIGBackbone.pipeline with train=True: pipelined "
                    "encoder stages run frozen-BN / no-DropPath "
                    "(documented deviation, docs/SCALING.md); from-scratch "
                    "pp training normalizes with init-valued running stats")

        cfg = dict(self.pipeline)
        params = self.variables["params"]
        stats = self.variables.get("batch_stats", {})

        h = Stem(self.channels[0], self.act, dtype=self.dtype,
                 name="stem")(x, train)
        hw = self.img_size // 4
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, hw, hw, self.channels[0]))
        if h.shape[1:3] != (hw, hw):
            pos = jax.image.resize(
                pos, (1, h.shape[1], h.shape[2], pos.shape[-1]), "linear")
        h = h + pos

        stage_fns, stage_params = [], []
        for s in range(len(self.blocks)):
            blk = VIGStage(stage=s, blocks=tuple(self.blocks),
                           channels=tuple(self.channels), k=self.k,
                           conv=self.conv, act=self.act,
                           drop_path_rate=self.drop_path_rate,
                           dtype=self.dtype)
            keys = self._stage_keys(s)
            sub = {"params": {k: params[k] for k in keys},
                   "batch_stats": {k: stats[k] for k in keys
                                   if k in stats}}

            def fn(p, xx, blk=blk):
                # train=False inside the pipeline: frozen BN running
                # stats, no DropPath (documented deviation above)
                return (y := blk.apply(p, xx, False)), y

            stage_fns.append(fn)
            stage_params.append(sub)
        _, feats = gpipe_hetero(stage_fns, stage_params, h,
                                mesh=cfg["mesh"], n_micro=cfg["n_micro"],
                                stage_axis=cfg.get("stage_axis", "stage"),
                                collect_aux=True)
        return list(feats)

    @nn.compact
    def __call__(self, x, train=False) -> List[jax.Array]:
        if self.pipeline is not None and not self.is_initializing():
            return self._pipelined(x, train)
        n_blocks = sum(self.blocks)
        dpr = [self.drop_path_rate * i / max(n_blocks - 1, 1) for i in range(n_blocks)]
        max_dilation = 49 // self.k
        reduce_ratios = [4, 2, 1, 1]
        taps = {1, 4, 11, 14} if tuple(self.blocks) == (2, 2, 6, 2) else None

        h = Stem(self.channels[0], self.act, dtype=self.dtype, name="stem")(x, train)
        hw = self.img_size // 4
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, hw, hw, self.channels[0]))
        if h.shape[1:3] != (hw, hw):  # tolerate other input sizes
            pos = jax.image.resize(pos, (1, h.shape[1], h.shape[2], pos.shape[-1]),
                                   "linear")
        h = h + pos

        outs = []
        idx = 0
        seq_idx = 0  # flattened module index incl. Downsamples (ref taps)
        for i, (nb, ch) in enumerate(zip(self.blocks, self.channels)):
            if i > 0:
                h = Downsample(ch, dtype=self.dtype, name=f"down{i}")(h, train)
                seq_idx += 1
            for j in range(nb):
                h = Grapher(self.k, min(idx // 4 + 1, max_dilation), self.conv,
                            self.act, reduce_ratios[i], dpr[idx], dtype=self.dtype,
                            name=f"grapher{idx}")(h, train)
                h = FFN(ch * 4, self.act, dpr[idx], dtype=self.dtype,
                        name=f"ffn{idx}")(h, train)
                idx += 1
                if taps is not None and seq_idx in taps:
                    outs.append(h)
                seq_idx += 1
            if taps is None:
                outs.append(h)  # tap at each stage end for non-(2,2,6,2) configs
        return outs


class _PairGroupedConv(nn.Module):
    """The ref's 3x3 conv with feature_group_count=c over the (a, b)
    channel interleave (group i sees (a_i, b_i)), computed as two TRUE
    depthwise convs summed: out_i = K[:,:,0,i] * a_i + K[:,:,1,i] * b_i.

    XLA:TPU handles depthwise (1 channel/group) convs well but lowers the
    2-channels-per-group form catastrophically — the xplane trace showed
    these four convs (one per stage tap) + their kernel grads + layout
    copies at ~23% of the ChangeGNNV2 train step. Param tree is identical
    to the nn.Conv it replaces (kernel (3,3,2,c), bias (c,)); the
    interleaved input is never materialized. Exact up to one f32 add
    reassociation.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b):
        c = a.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 2, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        a, b, kernel, bias = nn.dtypes.promote_dtype(a, b, kernel, bias,
                                                     dtype=self.dtype)

        def dw(x, k):  # k (3,3,c) -> depthwise HWIO (3,3,1,c)
            return jax.lax.conv_general_dilated(
                x, k[:, :, None, :], window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        return dw(a, kernel[:, :, 0]) + dw(b, kernel[:, :, 1]) + bias


class CrossConCat(nn.Module):
    """ref ChangeVIG.py:315-347."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, train=False):
        n, h, w, c = a.shape
        x = _PairGroupedConv(dtype=self.dtype, name="diff_conv")(a, b)
        x = nn.relu(_bn(train, self.dtype, "diff_bn")(x))
        res = _conv_bn(x, self.out_channels, 3, "conv_res", train, self.dtype)
        o2 = self.out_channels // 2
        y = nn.relu(_conv_bn(x, o2, 1, "conv1", train, self.dtype))
        y = nn.relu(_conv_bn(y, o2, 3, "conv2", train, self.dtype))
        y = _conv_bn(y, self.out_channels, 1, "conv3", train, self.dtype)
        return nn.relu(res + y)


class _DiffFuse(nn.Module):
    """Sub/Abs/Conc fusion (ref :667-751): diff -> conv_res + bottleneck."""

    out_channels: int
    mode: str = "sub"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, train=False):
        if self.mode == "sub":
            x = a - b
        elif self.mode == "abs":
            x = jnp.abs(a - b)
        else:  # conc
            x = jnp.concatenate([a, b], axis=-1)
            x = nn.relu(_conv_bn(x, a.shape[-1], 3, "diff", train, self.dtype))
        res = _conv_bn(x, self.out_channels, 3, "conv_res", train, self.dtype)
        o2 = self.out_channels // 2
        y = nn.relu(_conv_bn(x, o2, 1, "conv1", train, self.dtype))
        y = nn.relu(_conv_bn(y, o2, 3, "conv2", train, self.dtype))
        y = _conv_bn(y, self.out_channels, 1, "conv3", train, self.dtype)
        return nn.relu(res + y)


class GlobalLocal(nn.Module):
    """ref :350-391: (channel (2,1)-grouped conv gate * spatial gate) * x +
    local multi-kernel grouped-conv branch."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        stat = jnp.concatenate([avg, mx], axis=1)  # (N,2,1,C)
        ch = nn.Conv(c, (2, 1), padding="VALID", feature_group_count=c,
                     dtype=self.dtype, name="channel_conv")(stat)  # (N,1,1,C)
        ch = nn.relu(_bn(train, self.dtype, "channel_bn")(ch))
        s_avg = jnp.mean(x, axis=-1, keepdims=True)
        s_max = jnp.max(x, axis=-1, keepdims=True)
        sp = nn.Conv(1, (5, 5), padding=[(2, 2)] * 2, dtype=self.dtype,
                     name="spatial_conv")(jnp.concatenate([s_avg, s_max], -1))
        sp = nn.relu(sp)
        gated = jax.nn.sigmoid(ch * sp) * x
        l1 = nn.Conv(c, (1, 1), feature_group_count=c, dtype=self.dtype,
                     name="local_conv1")(x)
        l2 = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, feature_group_count=c,
                     dtype=self.dtype, name="local_conv2")(x)
        l3 = nn.Conv(c, (7, 7), padding=[(3, 3)] * 2, feature_group_count=c,
                     dtype=self.dtype, name="local_conv3")(x)
        loc = nn.Conv(c, (1, 1), dtype=self.dtype, name="local_conv4")(
            jnp.concatenate([l1, l2, l3], axis=-1))
        loc = nn.relu(_bn(train, self.dtype, "local_bn")(loc))
        loc = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      name="local_conv5")(loc)
        return gated + loc


class HFFM(nn.Module):
    """ref :408-415 (cross-concat variant) / HFFM_Compare :565-577."""

    out_channels: int
    mode: str = "crossconc"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, train=False):
        if self.mode == "crossconc":
            h = CrossConCat(self.out_channels, dtype=self.dtype, name="fuse")(a, b, train)
        else:
            h = _DiffFuse(self.out_channels, self.mode, dtype=self.dtype,
                          name="fuse")(a, b, train)
        return GlobalLocal(dtype=self.dtype, name="global_local")(h, train)


class VFFM(nn.Module):
    """ref :418-460: upsample high, AFF-style gate between low and high."""

    r: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, low, high, train=False):
        c = low.shape[-1]
        inter = c // self.r
        high = nn.ConvTranspose(c, (2, 2), strides=(2, 2), transpose_kernel=True,
                                dtype=self.dtype, name="up")(high)
        mixed = low + high

        def branch(x, name, pool=None):
            if pool == "avg":
                x = jnp.mean(x, axis=(1, 2), keepdims=True)
            elif pool == "max":
                x = jnp.max(x, axis=(1, 2), keepdims=True)
            x = nn.relu(_conv_bn(x, inter, 1, name + "_1", train, self.dtype))
            return _conv_bn(x, c, 1, name + "_2", train, self.dtype)

        wei = jax.nn.sigmoid(branch(mixed, "global_avg", "avg")
                             + branch(mixed, "global_max", "max")
                             + branch(mixed, "local_att"))
        return 2 * low * wei + 2 * high * (1 - wei)


# ref conv_diff_V20 (:921-953) is byte-identical math to Cross_ConCat
# (:315-347): interleave + grouped conv, then conv_res + bottleneck.
ConvDiffV20 = CrossConCat


class CSAMV20(nn.Module):
    """ref :956-994: channel (2,1)-conv + Linear MLP gate, spatial 3x3x2
    gate; BN((sig(ch) + sig(sp)) * x)."""

    ratio: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        stat = jnp.concatenate([avg, mx], axis=1)  # (N,2,1,C)
        ch = nn.Conv(c, (2, 1), padding="VALID", feature_group_count=c,
                     dtype=self.dtype, name="conv1_1")(stat)
        ch = nn.gelu(_bn(train, self.dtype, "bn1")(ch), approximate=False)
        ch = nn.Dense(c // self.ratio, use_bias=False, dtype=self.dtype,
                      name="liner1")(ch)
        ch = nn.relu(ch)
        ch = nn.Dense(c, dtype=self.dtype, name="liner2")(ch)
        s_avg = jnp.mean(x, axis=-1, keepdims=True)
        s_max = jnp.max(x, axis=-1, keepdims=True)
        sp = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                     dtype=self.dtype, name="conv2_1")(
            jnp.concatenate([s_avg, s_max], -1))
        sp = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                     dtype=self.dtype, name="conv2_2")(nn.relu(sp))
        out = (jax.nn.sigmoid(ch) + jax.nn.sigmoid(sp)) * x
        return _bn(train, self.dtype, "bt")(out)


class AFF(nn.Module):
    """ref :996-1028: attentional feature fusion gate."""

    r: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, residual, train=False):
        c = x.shape[-1]
        inter = c // self.r
        xa = x + residual
        xl = nn.relu(_conv_bn(xa, inter, 1, "local1", train, self.dtype))
        xl = _conv_bn(xl, c, 1, "local2", train, self.dtype)
        g = jnp.mean(xa, axis=(1, 2), keepdims=True)
        xg = nn.relu(_conv_bn(g, inter, 1, "global1", train, self.dtype))
        xg = _conv_bn(xg, c, 1, "global2", train, self.dtype)
        wei = jax.nn.sigmoid(xl + xg)
        return 2 * x * wei + 2 * residual * (1 - wei)


class _FinalHead(nn.Module):
    """convd2x + residual + convd1x + residual + 3x3 pred (shared by the
    V2/V20_2 decoders)."""

    embedding_dim: int
    output_nc: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        e, dt = self.embedding_dim, self.dtype
        x = UpsampleConvLayer(e, dtype=dt, name="convd2x")(x)
        x = ResidualBlock(dtype=dt, name="dense_2x")(x)
        x = UpsampleConvLayer(e, dtype=dt, name="convd1x")(x)
        x = ResidualBlock(dtype=dt, name="dense_1x")(x)
        return nn.Conv(self.output_nc, (3, 3), padding=[(1, 1)] * 2, dtype=dt,
                       name="change_probability")(x)


class DecoderV1(nn.Module):
    """ref ChangeVIG.py:101-281 — the ChangeFormerV5-style diff cascade."""

    embedding_dim: int = 256
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, f1, f2, train=False):
        dt, e = self.dtype, self.embedding_dim
        outs, ups = [], []
        target_hw = f1[0].shape[1:3]
        prev = None
        for s in (3, 2, 1, 0):
            proj = nn.Dense(e, dtype=dt, name=f"linear_c{s + 1}")
            a, b = proj(f1[s]), proj(f2[s])
            d = ConvDiff(e, dtype=dt, name=f"diff_c{s + 1}")(
                jnp.concatenate([a, b], axis=-1), train)
            if prev is not None:
                d = d + resize_bilinear(prev, (prev.shape[1] * 2, prev.shape[2] * 2))
            outs.append(MakePrediction(self.output_nc, dtype=dt,
                                       name=f"make_pred_c{s + 1}")(d, train))
            ups.append(d if s == 0 else resize_bilinear(d, target_hw, False))
            prev = d
        _c = nn.Conv(e, (1, 1), dtype=dt, name="linear_fuse_conv")(
            jnp.concatenate(ups, axis=-1))
        _c = _bn(train, dt, "linear_fuse_bn")(_c)
        cp = _FinalHead(e, self.output_nc, dtype=dt, name="head")(_c)
        outs.append(cp)
        if self.decoder_softmax:
            outs = [jax.nn.sigmoid(o) for o in outs]
        return outs


class DecoderV2(nn.Module):
    """ref :537-631 (mode='crossconc') / DecoderV2_Compare :768-863."""

    embedding_dim: int = 256
    output_nc: int = 2
    decoder_softmax: bool = False
    mode: str = "crossconc"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, f1, f2, train=False):
        dt, e = self.dtype, self.embedding_dim
        h4 = HFFM(e, self.mode, dtype=dt, name="hffm4")(f1[3], f2[3], train)
        h3 = HFFM(e, self.mode, dtype=dt, name="hffm3")(f1[2], f2[2], train)
        h2 = HFFM(e, self.mode, dtype=dt, name="hffm2")(f1[1], f2[1], train)
        h1 = HFFM(e, self.mode, dtype=dt, name="hffm1")(f1[0], f2[0], train)
        v3 = VFFM(dtype=dt, name="vffm3")(h3, h4, train)
        v2 = VFFM(dtype=dt, name="vffm2")(h2, v3, train)
        c = VFFM(dtype=dt, name="vffm1")(h1, v2, train)
        cp = _FinalHead(e, self.output_nc, dtype=dt, name="head")(c)
        if self.decoder_softmax:
            cp = jax.nn.sigmoid(cp)
        return [cp]


class DecoderVIGV20(nn.Module):
    """ref :1105-1239: conv_diff_V20 + CSAM + transposed-conv up + AFF cascade."""

    embedding_dim: int = 256
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, f1, f2, train=False):
        dt, e = self.dtype, self.embedding_dim

        def up2(x, name):
            return nn.ConvTranspose(e, (2, 2), strides=(2, 2), transpose_kernel=True,
                                    dtype=dt, name=name)(x)

        c4 = CSAMV20(dtype=dt, name="csam4")(
            ConvDiffV20(e, dtype=dt, name="diff_c4")(f1[3], f2[3], train), train)
        c4 = up2(c4, "trans_conv4")
        c3 = CSAMV20(dtype=dt, name="csam3")(
            ConvDiffV20(e, dtype=dt, name="diff_c3")(f1[2], f2[2], train), train)
        c3 = up2(AFF(dtype=dt, name="aff3")(c3, c4, train), "trans_conv3")
        c2 = CSAMV20(dtype=dt, name="csam2")(
            ConvDiffV20(e, dtype=dt, name="diff_c2")(f1[1], f2[1], train), train)
        c2 = up2(AFF(dtype=dt, name="aff2")(c2, c3, train), "trans_conv2")
        c1 = CSAMV20(dtype=dt, name="csam1")(
            ConvDiffV20(e, dtype=dt, name="diff_c1")(f1[0], f2[0], train), train)
        c1 = AFF(dtype=dt, name="aff1")(c1, c2, train)
        cp = _FinalHead(e, self.output_nc, dtype=dt, name="head")(c1)
        if self.decoder_softmax:
            cp = jax.nn.sigmoid(cp)
        return [cp]


class _VIGSiam(nn.Module):
    output_nc: int = 2
    embed_dim: int = 256
    decoder_softmax: bool = False
    img_size: int = 256
    dtype: Optional[Dtype] = None
    # Optional heterogeneous-GPipe routing of the ViG encoder's 4 stages
    # over a 'stage' mesh axis (VERDICT r3 item 6; VIGBackbone.pipeline
    # docstring for semantics/deviations). Wired by CDTrainer pp_stages
    # via parallel/pipeline.changevig_pipeline_forward.
    pipeline_encoder: Optional[Any] = None
    embed_dims = (80, 160, 400, 640)

    def encode_pair(self, x1, x2, train):
        enc = VIGBackbone(blocks=(2, 2, 6, 2), channels=self.embed_dims,
                          img_size=self.img_size, dtype=self.dtype,
                          pipeline=self.pipeline_encoder, name="encoder")
        n = x1.shape[0]
        feats = enc(jnp.concatenate([x1, x2], axis=0), train)
        return [f[:n] for f in feats], [f[n:] for f in feats]


class ChangeGNNV1(_VIGSiam):
    """ref :284-313."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(x1, x2, train)
        return DecoderV1(self.embed_dim, self.output_nc, self.decoder_softmax,
                         dtype=self.dtype, name="decoder")(f1, f2, train)


class ChangeGNNV2(_VIGSiam):
    """ref :634-664 (HFFM cross-concat + VFFM decoder)."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(x1, x2, train)
        return DecoderV2(self.embed_dim, self.output_nc, self.decoder_softmax,
                         mode="crossconc", dtype=self.dtype,
                         name="decoder")(f1, f2, train)


class ChangeGNNV2Compare(_VIGSiam):
    """ref :865-918 with diff_mode in {sub, abs, conc}."""

    diff_mode: str = "sub"

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(x1, x2, train)
        return DecoderV2(self.embed_dim, self.output_nc, self.decoder_softmax,
                         mode=self.diff_mode, dtype=self.dtype,
                         name="decoder")(f1, f2, train)


class VIG(_VIGSiam):
    """VIG_V20_2 (ref :1242-1276, define_G key 'GNN')."""

    @nn.compact
    def __call__(self, x1, x2, train=False):
        f1, f2 = self.encode_pair(x1, x2, train)
        return DecoderVIGV20(self.embed_dim, self.output_nc, self.decoder_softmax,
                             dtype=self.dtype, name="TDec_x2")(f1, f2, train)


def pvig_ti(img_size=224, dtype=None):
    """ref pyramid_vig.py:178-199."""
    return VIGBackbone(blocks=(2, 2, 6, 2), channels=(48, 96, 240, 384),
                       img_size=img_size, dtype=dtype)


def pvig_s(img_size=224, dtype=None):
    """ref pyramid_vig.py:203-224."""
    return VIGBackbone(blocks=(2, 2, 6, 2), channels=(80, 160, 400, 640),
                       img_size=img_size, dtype=dtype)


def pvig_m(img_size=224, dtype=None):
    """ref pyramid_vig.py m-config: blocks [2,2,16,2], ch (96,192,384,768)."""
    return VIGBackbone(blocks=(2, 2, 16, 2), channels=(96, 192, 384, 768),
                       img_size=img_size, dtype=dtype)


def pvig_b(img_size=224, dtype=None):
    """ref pyramid_vig.py b-config: blocks [2,2,18,2], ch (128,256,512,1024)."""
    return VIGBackbone(blocks=(2, 2, 18, 2), channels=(128, 256, 512, 1024),
                       img_size=img_size, dtype=dtype)

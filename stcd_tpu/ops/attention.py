"""Fused cross-attention Pallas TPU kernel.

Targets the framework's attention hot paths (SURVEY.md §3.4 fusion
targets): ChangeFormer's SRA attention (softmax(QK^T)V with
conv-downsampled KV — ref models/ChangeFormer.py:336-358) and BIT's
token cross-attention (models/help_funcs.py:66-152). In both, the KV set
is small (sr-reduced or token_len) while Q covers every pixel, so the
whole KV block fits VMEM and the kernel tiles over Q only — the (N, M)
attention matrix never touches HBM (XLA's einsum path materializes it:
16 MB/head for 512^2 stage-1).

Forward and backward are both Pallas kernels tiled over Q: the backward
recomputes each tile's softmax from (q, k, v) and accumulates dk/dv in
VMEM across the Q tiles (flash-style), so the (N, M) attention matrix
never touches HBM in training either — the einsum backward would
materialize four f32 (N, M) temporaries.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, m_valid):
    q = q_ref[0].astype(jnp.float32)  # (block_n, D)
    k = k_ref[0].astype(jnp.float32)  # (M, D)
    v = v_ref[0].astype(jnp.float32)  # (M, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if m_valid != k.shape[0]:  # mask out KV padding rows
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < m_valid, s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd(q, k, v, scale, block_n, interpret):
    bh, n, d = q.shape
    m = k.shape[1]
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, m_pad - m), (0, d_pad - d)))

    kernel = functools.partial(_attention_kernel, scale=scale, m_valid=m)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
        grid=(bh, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_cross_attention(q, k, v, scale, block_n, interpret):
    return _flash_fwd(q, k, v, scale, block_n, interpret)


def _fwd(q, k, v, scale, block_n, interpret):
    return _flash_fwd(q, k, v, scale, block_n, interpret), (q, k, v)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, m_valid):
    """One Q tile: recompute the tile's softmax, emit its dq block and
    accumulate its dk/dv partials into the (f32) outputs, which stay
    resident in VMEM across the sequential Q-tile grid dimension (their
    index_map is constant in i)."""
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (block_n, D)
    k = k_ref[0].astype(jnp.float32)  # (M, D)
    v = v_ref[0].astype(jnp.float32)  # (M, D)
    g = g_ref[0].astype(jnp.float32)  # (block_n, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if m_valid != k.shape[0]:  # exp(-inf)=0: padded KV rows drop out of
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)  # p AND the
        s = jnp.where(col < m_valid, s, -jnp.inf)              # dk/dv sums
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (block_n, M)
    # padded Q rows have g == 0, so their dv/dk contributions vanish and
    # their (garbage) dq rows are sliced off by the caller
    dv_part = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dsoft = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.dot(dsoft, k, preferred_element_type=jnp.float32) * scale
    dk_part = jax.lax.dot_general(dsoft, q, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_part
        dv_ref[0] = dv_part

    @pl.when(i != 0)
    def _accum():
        dk_ref[0] += dk_part
        dv_ref[0] += dv_part


def _bwd(scale, block_n, interpret, res, g):
    q, k, v = res
    bh, n, d = q.shape
    m = k.shape[1]
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    kernel = functools.partial(_attention_bwd_kernel, scale=scale, m_valid=m)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, m_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, m_pad, d_pad), jnp.float32),
        ],
        grid=(bh, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp)
    return (dq[:, :n, :d],
            dk[:, :m, :d].astype(k.dtype),
            dv[:, :m, :d].astype(v.dtype))


_flash_cross_attention.defvjp(_fwd, _bwd)


def cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: Optional[float] = None, block_n: int = 512,
                    use_pallas: Optional[bool] = None) -> jax.Array:
    """softmax(q k^T * scale) v over (B, H, N, D) q and (B, H, M, D) kv.

    use_pallas=None auto-selects: the Pallas kernel on TPU when N is large
    enough to benefit; einsum elsewhere (CPU tests exercise the kernel via
    interpret mode in tests/test_ops.py).
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if use_pallas is None:
        platform = jax.devices()[0].platform
        # worth fusing when Q is large AND KV has enough rows to amortize
        # the 128-row VMEM padding; tiny-token KV (BIT decode, M=4) is
        # faster on the plain einsum path (benchmarks/bench_attention.py:
        # SRA shapes 1.35-1.44x, M=4 0.59x)
        use_pallas = platform in ("tpu", "axon") and n >= 1024 and m >= 64
    if not use_pallas:
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    block = min(block_n, _round_up(n, 128))
    out = _flash_cross_attention(qf, kf, vf, float(scale), block, False)
    return out.reshape(b, h, n, d)


def cross_attention_interpret(q, k, v, scale=None, block_n=256):
    """Interpreter-mode path for CPU tests of the kernel itself."""
    b, h, n, d = q.shape
    m = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    out = _flash_cross_attention(q.reshape(b * h, n, d), k.reshape(b * h, m, d),
                                 v.reshape(b * h, m, d), float(scale),
                                 min(block_n, _round_up(n, 8)), True)
    return out.reshape(b, h, n, d)

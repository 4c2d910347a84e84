"""Pallas TPU kernel for BatchNorm statistics (sum, sum-of-squares).

STATUS: measured and REJECTED as a perf lever — kept as the documented
experiment, NOT wired into MPBatchNorm. On the real v5e chip
(benchmarks/bench_bnstats.py) this kernel never beats XLA's fused
convert+multiply reduce: 1.02x of jnp at C=1024, 1.1-1.2x at C=256-512,
and 2.4-6.5x slower on the lane-folded narrow-channel shapes (the fold's
(bm//8, 8, lanes) in-VMEM reshape serializes on the VPU). The companion
diagnostic (benchmarks/bench_bnstats_diag.py) shows even a bare Pallas
matmul runs ~2.1x slower than XLA's dot on the skinny-K decoder shapes,
so the BN-stat reduce fusions sitting 5-20x above the naive read
roofline in step traces is a layout/hardware floor XLA already reaches,
not a scheduling gap a custom kernel can close. See BASELINE.md
"Round-2 lever measured and REJECTED (BN-stats Pallas kernel)".

The SegCD/CFv6 train-step traces attribute ~19% of step time to BN
statistic reduce fusions, and the per-event device times run well above
the HBM read roofline of the tensor being reduced (BASELINE.md
"Step-time profile"). This kernel computes both sums in one
read-roofline pass: grid over row tiles of the (M, C) view, f32
accumulators resident in VMEM, one flush at the end.

Layout trick for narrow channels: decoder/stem tensors have C in
{16, 32, 64}; a (bm, C) block would fill only C of the 128 lanes. Since
the (M, C) view of a row-major NHWC tensor is contiguous, we fold
f = 128 // C consecutive rows onto the lane axis — the kernel reduces a
(M/f, 128) view at full lane occupancy and the (8, f*C) partial is
refolded to (C,) outside (an epsilon-sized reshape+sum).

Semantics match stcd_tpu.layers.norm.MPBatchNorm's reduction: upcast the
bf16 activation to f32, then sum / sum-of-squares over all leading dims
(f32 accumulation; tile-sequential order instead of XLA's split-tree
order, so results agree to f32 round-off, not bitwise).

The op carries
- a custom_vjp (d sum = g1, d sumsq = 2*x*g2 — plain jnp, fuses into the
  surrounding elementwise passes), and
- a custom_partitioning rule: a batch/spatial-sharded activation stays
  sharded, each device reduces its own shard, and the partials are
  jax.lax.psum'd over the mesh axes that shard the reduced dims (a
  pallas_call is otherwise opaque to GSPMD and the operand would be
  all-gathered). A channel-sharded operand keeps its C sharding on the
  outputs with no cross-device reduction on C.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    xf = x_ref[:].astype(jnp.float32)
    bm, lanes = xf.shape
    ps1 = jnp.sum(xf.reshape(bm // 8, 8, lanes), 0)
    ps2 = jnp.sum((xf * xf).reshape(bm // 8, 8, lanes), 0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += ps1
    s2_ref[:] += ps2


def _pick_block(m: int, lanes: int) -> int:
    """Largest row-tile that divides m, is a multiple of 8, and keeps the
    input block around 1 MB (bf16) so double-buffered DMA + the f32
    upcast temporaries stay well under the VMEM budget."""
    target = max(8, (1 << 19) // max(lanes, 1))
    bm = 8
    while bm * 2 <= target and m % (bm * 2) == 0:
        bm *= 2
    return bm


def supports_pallas(shape) -> bool:
    """True if the (..., C) shape maps onto the kernel's tiling rules."""
    c = shape[-1]
    m = 1
    for d in shape[:-1]:
        m *= d
    if m == 0 or c == 0:
        return False
    fold = 128 // c if (c < 128 and 128 % c == 0) else 1
    if m % (fold * 8) != 0:
        return False
    return (m // fold) % _pick_block(m // fold, fold * c) == 0


def _stats_pallas_raw(interpret: bool, x: jax.Array):
    """(M, C) -> (sum, sumsq) f32[C] over rows."""
    m, c = x.shape
    fold = 128 // c if (c < 128 and 128 % c == 0) else 1
    x2 = x.reshape(m // fold, fold * c)
    lanes = fold * c
    bm = _pick_block(m // fold, lanes)
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=(m // fold // bm,),
        in_specs=[pl.BlockSpec((bm, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((8, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(x2)
    return (jnp.sum(s1.reshape(8 * fold, c), 0),
            jnp.sum(s2.reshape(8 * fold, c), 0))


# --- GSPMD partitioning ---------------------------------------------------

def _arg_spec(mesh, arg_infos):
    info = arg_infos[-1]
    s = getattr(info, "sharding", None)
    if s is None or getattr(s, "spec", None) is None:
        return None, mesh
    return s.spec, getattr(s, "mesh", mesh)


def _row_axes(spec):
    """Mesh axis names that shard the reduced (row) dim of the (M, C) view."""
    if spec is None or len(spec) < 1 or spec[0] is None:
        return ()
    p = spec[0]
    return tuple(p) if isinstance(p, tuple) else (p,)


def _c_spec(spec):
    if spec is None or len(spec) < 2:
        return None
    return spec[1]


def _cp_infer(interpret, mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec, m = _arg_spec(mesh, arg_infos)
    return (NamedSharding(m, P(_c_spec(spec))),) * 2


def _cp_partition(interpret, mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec, m = _arg_spec(mesh, arg_infos)
    arg_shardings = (NamedSharding(m, spec if spec is not None else P()),)
    out_shardings = (NamedSharding(m, P(_c_spec(spec))),) * 2
    reduce_axes = _row_axes(spec)

    def lower_fn(x):
        # the kernel runs on the per-device SHARD, whose row count may
        # break the tiling even when the global shape passed
        # supports_pallas (e.g. rows sharded 2-way: m=16,fold=2 globally
        # tiles fine, but the m=8 shard gives grid=(0,) and the output
        # buffers are never written). Re-gate on the shard shape and use
        # the numerically-identical jnp reduction when it doesn't tile.
        if supports_pallas(x.shape):
            s1, s2 = _stats_pallas_raw(interpret, x)
        else:
            xf = x.astype(jnp.float32)
            s1, s2 = jnp.sum(xf, 0), jnp.sum(xf * xf, 0)
        if reduce_axes:
            s1 = jax.lax.psum(s1, reduce_axes)
            s2 = jax.lax.psum(s2, reduce_axes)
        return s1, s2

    return m, lower_fn, out_shardings, arg_shardings


_stats_cp = custom_partitioning(_stats_pallas_raw, static_argnums=(0,))
_stats_cp.def_partition(
    partition=_cp_partition,
    infer_sharding_from_operands=_cp_infer,
    # Shardy propagation rule: rows are a contracted factor, channels are
    # shared by the operand and both results.
    sharding_rule="m c -> c, c")


# --- public op with gradients ----------------------------------------------

def _impl(x, interpret):
    return _stats_cp(interpret, x.reshape(-1, x.shape[-1]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def bn_stats_pallas(x: jax.Array, interpret: bool = False):
    """sum(x) and sum(x*x) over all leading dims, f32[C] each.

    Reduction semantics match the jnp path in MPBatchNorm (f32 upcast of
    the input, f32 accumulation) to f32 round-off. Gate with
    ``supports_pallas(x.shape)``; call sites fall back to jnp otherwise.
    """
    return _impl(x, interpret)


def _fwd(x, interpret):
    return _impl(x, interpret), x


def _bwd(interpret, x, g):
    g1, g2 = g
    dx = g1.astype(jnp.float32) + 2.0 * x.astype(jnp.float32) * g2
    return (dx.astype(x.dtype),)


bn_stats_pallas.defvjp(_fwd, _bwd)

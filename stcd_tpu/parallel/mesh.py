"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(SURVEY.md §2.5); the TPU-native equivalent is a jax.sharding.Mesh with a
'data' axis: batches are sharded over it, parameters replicated, and XLA
inserts the psum for gradients during jit compilation. Two beyond-parity
axes are provisioned:

- 'model': tensor-parallel sharding of the widest conv kernels.
- 'space': spatial partitioning — NHWC activations sharded along H, with
  GSPMD inserting the conv/pool halo exchanges. This is the TPU answer to
  the reference's offline raster tiling (split.py:43-46) for TRAINING:
  large-resolution steps whose per-device batch would otherwise be < 1
  image (e.g. 512²+ fine-tunes) scale over 'space' instead of 'data'.
- 'stage': GPipe pipeline parallelism for the transformer block stacks
  (parallel/pipeline.py) — manual shard_map over this axis only; the
  other axes stay GSPMD-automatic so DPxPP composes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: Optional[int] = None, model: int = 1, space: int = 1,
                stage: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * space * stage)
    assert data * model * space * stage == n, \
        f"mesh {data}x{model}x{space}x{stage} != {n} devices"
    # Composed space x {model, stage} geometry is ACCEPTED since round 5:
    # the manual shard_map 'space' implementation (parallel/spatial.py —
    # explicit halo exchange, GSPMD never sees the axis) makes it exact
    # (tests/test_spatial_shardmap.py::test_dp_tp_sp_2x2x2_direct_grads).
    # The GSPMD-automatic spatial path still miscompiles conv kernel
    # gradients on such meshes (round-4 discovery; standalone repro
    # tools/gspmd_repro.py), so ITS entry point — batch_sharding(...,
    # spatial=True) — rejects the composed geometry instead, and
    # set_spatial_mesh refuses to arm the GSPMD layout pins for it.
    arr = np.asarray(devices).reshape(data, model, space, stage)
    return Mesh(arr, ("data", "model", "space", "stage"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest.

    With ``spatial=True`` additionally shard NHWC dim 1 (image rows) over
    'space' — GSPMD partitions every conv/pool/resize spatially and
    inserts the halo exchanges (collective-permutes of the kernel-overlap
    rows) automatically. This GSPMD-automatic spatial path is only exact
    on 2-axis data x space meshes: with a size>1 'model'/'stage' axis on
    the mesh the partitioner miscompiles conv kernel gradients (round-4
    discovery, standalone repro tools/gspmd_repro.py) — composed meshes
    must use the MANUAL implementation (parallel/spatial.py), which
    takes its batches data-sharded only (rows enter via shard_map).
    """
    if spatial:
        shape = dict(mesh.shape)
        if shape.get("space", 1) > 1 and (
                shape.get("model", 1) > 1 or shape.get("stage", 1) > 1):
            raise ValueError(
                "GSPMD-automatic spatial sharding on a mesh composing "
                "'space' with 'model'/'stage' > 1: the partitioner "
                "miscompiles conv kernel gradients on this geometry "
                "(tools/gspmd_repro.py). Use the manual halo-exchange "
                "implementation instead: parallel/spatial.py "
                "make_spatial_cd_steps / spatial_context "
                "(docs/SCALING.md 'Spatial partitioning').")
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_train_state(mesh: Mesh, state):
    """Place a TrainState onto ``mesh``: params through the
    tensor-parallel ``param_sharding`` map (pure replication when the
    'model' axis is 1), batch_stats replicated, and opt_state subtrees
    that MIRROR the param tree (Adam's mu/nu) sharded with the same map —
    replicating the moments under tp_axis>1 would hold full fp32 Adam
    state on every device, negating the TP memory lever (ADVICE r3), and
    the first donated train_step would silently re-shard it anyway. The
    single canonical placement used by the CLI scripts, CDTrainer and the
    driver dryrun — call it AFTER any checkpoint restore (restored arrays
    arrive with no sharding).

    Composed space x {model, stage} meshes imply the MANUAL spatial path
    (their GSPMD entry raises), so conv-kernel TP is enabled for them
    (param_sharding manual_space) automatically."""
    repl = NamedSharding(mesh, P())
    shape = dict(mesh.shape)
    manual_sp = shape.get("space", 1) > 1 and (
        shape.get("model", 1) > 1 or shape.get("stage", 1) > 1)
    shard_map_tree = param_sharding(mesh, state.params,
                                    manual_space=manual_sp)
    params_def = jax.tree_util.tree_structure(state.params)

    def _mirrors_params(node):
        try:
            return jax.tree_util.tree_structure(node) == params_def
        except Exception:
            return False

    def _place_opt(node):
        if _mirrors_params(node):
            return jax.device_put(node, shard_map_tree)
        return jax.device_put(node, repl)

    return state.replace(
        params=jax.device_put(state.params, shard_map_tree),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.tree_util.tree_map(_place_opt, state.opt_state,
                                         is_leaf=_mirrors_params),
    )


# --- spatial-partitioning activation constraints (VERDICT r2 item 3) ---
# Under a 'space' axis > 1, GSPMD left to its own devices re-shards the
# encoder bottleneck (H collapsed to 1) into a degenerate H-over-space +
# batch-replicated layout for the first decoder transposed-conv, hitting
# an "Involuntary full rematerialization" (spmd_partitioner.cc:652,
# MULTICHIP_r02.json). The fix: models pin NHWC activations to
# P('data', 'space') wherever every space-shard keeps >= 2 rows, and to
# P('data') (space-replicated) at the tiny deep maps — so space-sharded
# activations never bounce through a conv-spatial-partitioned layout.
# Disabled (no-op) unless the run registers its mesh here.

_SPATIAL_MESH: Optional[Mesh] = None
_ACTIVE_MESH: Optional[Mesh] = None
# model-axis sizes returned by model_axis_size() since the last cache
# flush — i.e. the sizes some live compiled trace may have captured
_MODEL_AXIS_OBSERVED: set = set()


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Record the run's active mesh (CLI scripts, CDTrainer, the driver
    dryrun). Feeds two consumers: `set_spatial_mesh` (the 'space'-axis
    activation pinning) and `model_axis_size` (ops/attention routes away
    from the un-partitionable Pallas kernel under a real 'model' axis —
    ADVICE r3). None resets both.

    `model_axis_size()` is read at TRACE time, so a step jitted before
    this call would keep the wrong attention route in its executable
    cache forever (ADVICE r4). Guard: if any trace may have observed a
    different model-axis size, drop the jit caches here so the next step
    call re-traces under the new mesh — ordering is then a one-time
    recompile cost, never a silent mis-route."""
    global _ACTIVE_MESH
    new_size = 1 if mesh is None else int(dict(mesh.shape).get("model", 1))
    if _MODEL_AXIS_OBSERVED and new_size not in _MODEL_AXIS_OBSERVED:
        import logging
        logging.getLogger(__name__).info(
            "set_active_mesh: model-axis size changed (%s -> %d); "
            "clearing jax caches so stale traces re-route",
            sorted(_MODEL_AXIS_OBSERVED), new_size)
        jax.clear_caches()
        _MODEL_AXIS_OBSERVED.clear()
    _ACTIVE_MESH = mesh
    set_spatial_mesh(mesh)


def model_axis_size() -> int:
    """Size of the active mesh's 'model' (tensor-parallel) axis; 1 when
    no mesh is registered. Records the returned size so `set_active_mesh`
    can invalidate traces compiled under a different mesh (ADVICE r4)."""
    m = _ACTIVE_MESH
    size = 1 if m is None else int(dict(m.shape).get("model", 1))
    _MODEL_AXIS_OBSERVED.add(size)
    return size


def set_spatial_mesh(mesh: Optional[Mesh]) -> None:
    """Enable `constrain_spatial` inside model code for this process.
    Call with the active mesh when its 'space' axis > 1 (scripts/common.py
    make_mesh and the driver dryrun do); None — or a mesh without a real
    'space' axis — disables (the default: zero effect on 1-axis runs).

    Inside a manual shard_map spatial body (parallel/spatial.py) the
    'space' axis is manual and the constrain_* pins below no-op
    regardless of what is registered here — the pins only act on
    GSPMD-automatic traces."""
    global _SPATIAL_MESH
    if mesh is not None and dict(mesh.shape).get("space", 1) > 1:
        _SPATIAL_MESH = mesh
    else:
        _SPATIAL_MESH = None


def constrain_replicated(x):
    """Pin an in-graph intermediate to FULL replication on the active
    spatial mesh (identity when none is registered).

    Guard for an upstream GSPMD value-miscompile found in round 4: on a
    mesh with BOTH an idle 'model' axis and a 'space' axis, a conv whose
    kernel operand is a derived intermediate (e.g. a slice of a wider
    parameter) lets sharding propagation assign the kernel a 'model'
    sharding, and the resulting feature-partitioned + spatially-
    partitioned conv computes wrong values (minimal repro in
    tests/test_parallel.py::test_gspmd_conv_kernel_slice_hazard; f64
    error ~3e2 on a 2x2x2 mesh, exact once the kernel is pinned).
    Model code pins derived conv kernels with this before use.

    No-op inside a manual shard_map spatial body (the 'space' axis is
    manual there; halos make the conv exact without pins)."""
    m = _SPATIAL_MESH
    if m is None or _in_manual_space():
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, P()))


def _in_manual_space() -> bool:
    from stcd_tpu.parallel.spatial import active_space_axis
    return active_space_axis() is not None


def _space_shardable(h: int, sp: int) -> bool:
    """The >= 2-rows-per-shard rule: a map is space-sharded only when H
    divides evenly AND every shard keeps at least 2 rows. 1-row shards
    are not just wasteful — round 4 found the GSPMD partitioner computes
    WRONG conv-kernel GRADIENTS (f64 error ~2e2, loss exact) when a
    strided residual diamond is followed by a halo conv at 1 row/shard
    (tests/test_parallel.py::test_spatial_backward_tiny_maps); >= 2 rows
    per shard is exact in the same repro."""
    return h % sp == 0 and h // sp >= 2


def constrain_spatial(x, prev_h: Optional[int] = None,
                      out_h: Optional[int] = None):
    """Pin a (traced) NHWC activation to the canonical spatial-partition
    layout; identity when no spatial mesh is registered or x is not 4-D.

    ``prev_h``: the producing block's INPUT height. When that input was
    too short to space-shard (the _space_shardable rule, e.g. the 1-row
    encoder bottleneck) the producing conv must run batch-parallel on
    both sides — so the output is first pinned to P('data') and only the
    copy is re-pinned to P('data', 'space'). The space transition then
    happens on an elementwise copy (a local slice) instead of through the
    conv's spatial partitioner, which is what triggered the involuntary-
    full-rematerialization resharding (spmd_partitioner.cc:652).

    ``out_h``: the CONSUMING stage's output height. When the stage this
    activation feeds will shrink below the _space_shardable floor, the
    whole stage must run batch-parallel (pinning only its output is NOT
    enough — the wrong-gradient miscompile lives in the stage interior),
    so the input is pinned P('data'). Used by the encoders' stage loop.

    No-op inside a manual shard_map spatial body: there the 'space' axis
    is manual (halo exchange handles correctness) and a constraint
    naming it would be invalid."""
    m = _SPATIAL_MESH
    if m is None or getattr(x, "ndim", 0) != 4 or _in_manual_space():
        return x
    sp = m.shape["space"]
    if not _space_shardable(x.shape[1], sp) or (
            out_h is not None and not _space_shardable(out_h, sp)):
        # too short to split (or feeding a too-short stage): batch-parallel
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(m, P("data")))
    if prev_h is not None and not _space_shardable(prev_h, sp):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(m, P("data")))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(m, P("data", "space")))


# Attention projections that split the (heads * head_dim) inner dim over
# 'model' (column parallel: each device computes its share of heads), and
# output projections that consume the sharded inner dim (row parallel:
# partial products psum-reduced by GSPMD). Matched by Flax module name,
# gated on the parent attention module ("attn*": BIT's Attention /
# CrossAttention, ChangeFormer's SRAttention) so e.g. OverlapPatchEmbed's
# "proj" conv or SE-block "fc1/fc2" squeeze layers are never touched.
_ATTN_COL = ("q", "kv", "to_qkv", "to_q", "to_k", "to_v")
_ATTN_ROW = ("proj", "to_out")


def param_sharding(mesh: Mesh, params, min_size_to_shard: int = 2 ** 20,
                   manual_space: bool = False):
    """Tensor-parallel sharding map over the 'model' axis. Returns a
    pytree of shardings (replicated where no rule applies; with model=1
    pure replication — the data-parallel baseline).

    Three rule families:
    - transformer attention (BIT models/bit.py Attention/CrossAttention;
      ChangeFormer models/changeformer.py SRAttention :100-141): qkv-style
      Dense kernels column-parallel ``P(None, 'model')`` (bias
      ``P('model')``), output projections row-parallel ``P('model', None)``
      — the Megatron layout: per-head attention math stays device-local,
      one reduction at the block output.
    - transformer MLP (BIT FeedForward ff*/Dense_0..1; ChangeFormer
      MixFFN mlp/fc1, mlp/dw/dwconv, mlp/fc2): hidden dim sharded —
      fc1 column-parallel, the depthwise conv's per-channel kernels
      sharded with it, fc2 row-parallel.
    - widest conv kernels (>= min_size_to_shard) over output channels —
      the CNN-family fallback rule.
    """
    model_axis = mesh.shape["model"]
    repl = NamedSharding(mesh, P())

    def spec_for(path, x):
        if model_axis == 1 or not hasattr(x, "ndim"):
            return repl
        keys = [p.key for p in path if hasattr(p, "key")]
        parent = keys[-2] if len(keys) >= 2 else ""
        grand = keys[-3] if len(keys) >= 3 else ""
        leaf = keys[-1] if keys else ""
        in_attn = grand.startswith("attn")
        in_ffn = grand.startswith("ff") and parent.startswith("Dense_")
        in_mlp = "mlp" in keys

        # manual_space: the run shards 'space' via the MANUAL shard_map
        # implementation (parallel/spatial.py) — GSPMD never sees the
        # axis, so the TPxSP suppressions below (which guard the GSPMD
        # partitioner miscompiles) do not apply and conv/MLP kernels may
        # take 'model' freely.
        space_axis = 1 if manual_space else dict(mesh.shape).get("space", 1)
        if space_axis > 1:
            # under TPxSP the MLP family keeps 'model' off entirely: its
            # depthwise conv would otherwise be feature-partitioned (see
            # the conv guard below), and a replicated dwconv between
            # sharded fc1/fc2 only trades the win for reshards
            in_mlp = in_ffn = False

        col = ((parent in _ATTN_COL and in_attn)
               or (parent == "fc1" and in_mlp)
               or (in_ffn and parent == "Dense_0"))
        row = ((parent in _ATTN_ROW and in_attn)
               or (parent == "fc2" and in_mlp)
               or (in_ffn and parent == "Dense_1"))
        if col and leaf == "kernel" and x.ndim == 2 \
                and x.shape[1] % model_axis == 0:
            return NamedSharding(mesh, P(None, "model"))
        if col and leaf == "bias" and x.ndim == 1 \
                and x.shape[0] % model_axis == 0:
            return NamedSharding(mesh, P("model"))
        if row and leaf == "kernel" and x.ndim == 2 \
                and x.shape[0] % model_axis == 0:
            return NamedSharding(mesh, P("model", None))
        # CONV kernels never take the 'model' axis when the mesh also has
        # a real 'space' axis: a feature-partitioned conv meeting a
        # spatially-partitioned input is value-MISCOMPILED by the current
        # GSPMD partitioner (f64 error ~3e1 on a 2x2x2 mesh; minimal
        # repro tests/test_parallel.py::test_gspmd_conv_kernel_slice_hazard
        # and docs/SCALING.md "TPxSP composition"). Attention Dense TP
        # above composes fine — under TPxSP only the attention blocks
        # shard over 'model' and convs stay replicated.
        if parent == "dwconv" and in_mlp \
                and x.shape[-1] % model_axis == 0:
            # MixFFN's depthwise conv acts per-channel on the fc1-sharded
            # hidden dim: shard its kernels/bias identically so the hidden
            # activations never leave the device between fc1 and fc2
            if leaf == "kernel" and x.ndim == 4:
                return NamedSharding(mesh, P(None, None, None, "model"))
            if leaf == "bias" and x.ndim == 1:
                return NamedSharding(mesh, P("model"))
        if (x.ndim == 4 and x.size >= min_size_to_shard
                and space_axis == 1
                and x.shape[-1] % model_axis == 0):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return repl

    return jax.tree_util.tree_map_with_path(spec_for, params)

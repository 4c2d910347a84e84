"""Multi-host SPMD setup.

The reference has no distributed capability at all (single-process
nn.DataParallel, SURVEY.md §2.5); the TPU-native scale-out is:

1. ``initialize()`` once per process (no-op single-host) — JAX's
   coordination service wires all hosts into one SPMD program.
2. ``create_mesh()`` (parallel/mesh.py) over ``jax.devices()`` — which
   after initialize() spans ALL hosts' chips; data-parallel batches ride
   ICI within a slice and DCN across slices, with XLA inserting the
   collectives.
3. ``DataLoader(..., process_index/process_count)`` (data/loader.py)
   partitions the dataset per host; each host device_puts its
   addressable shard and jit assembles the global array.

Single-host multi-chip needs none of this — create_mesh() alone.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize for multi-host runs; silently a no-op
    when single-process (TPU pods auto-discover via the TPU runtime, so
    all-None arguments are valid there)."""
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" in str(e).lower():  # initialize() called twice: no-op
            return
        raise  # genuine multi-host failure must NOT degrade to single-host
    except ValueError as e:
        # auto-discovery with all-None args on a non-pod host raises
        # "coordinator_address should be defined" — that IS the single-host
        # case. Anything else (bad explicit args) re-raises.
        if (coordinator_address is None and num_processes is None
                and "coordinator_address" in str(e)):
            return
        raise


def global_batch_sharding(mesh):
    """Sharding for a global batch assembled from per-process shards:
    batch dim over 'data' (same as single-host; jax.make_array_from_
    process_local_data handles the host boundary)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P("data"))


def assemble_global_batch(mesh, local_batch: dict, sharding=None) -> dict:
    """Build global jax.Arrays from each process's local numpy batch
    (multi-host path; on one host this is just device_put+shard).

    This is THE host-boundary assembly — DataLoader's multi-host branch
    (data/loader.py place()) routes through it with its own ``sharding``
    so there is a single implementation to fix.

    Partial final batches (drop_last=False, e.g. the val loaders in
    scripts/train_*.py) may not divide the data-axis device count, which
    ``make_array_from_process_local_data`` rejects. Mirroring the
    single-host fallback in data/loader.py place(), such a batch is
    allgathered to every process and placed replicated — pjit reshards.
    All processes hold equal local counts (DataLoader's equal-count
    partitioning), so every process takes the same branch."""
    if sharding is None:
        sharding = global_batch_sharding(mesh)
    arrays = {k: v for k, v in local_batch.items() if hasattr(v, "shape")}
    out = {k: v for k, v in local_batch.items() if not hasattr(v, "shape")}
    try:
        for k, v in arrays.items():
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    except ValueError:
        # indivisible (partial) global batch: replicate it everywhere
        from jax.experimental import multihost_utils
        gathered = {k: multihost_utils.process_allgather(v, tiled=True)
                    for k, v in arrays.items()}
        out.update(jax.device_put(gathered))
    return out

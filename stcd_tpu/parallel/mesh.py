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
    arr = np.asarray(devices).reshape(data, model, space, stage)
    return Mesh(arr, ("data", "model", "space", "stage"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest.

    With ``spatial=True`` additionally shard NHWC dim 1 (image rows) over
    'space' — GSPMD partitions every conv/pool/resize spatially and
    inserts the halo exchanges (collective-permutes of the kernel-overlap
    rows) automatically.
    """
    if spatial:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, min_size_to_shard: int = 2 ** 20):
    """Optionally shard the largest conv kernels over 'model' (output
    channels); everything else replicated. Returns a pytree of shardings.

    With model=1 this is pure replication — the data-parallel baseline.
    """
    model_axis = mesh.shape["model"]

    def spec_for(x):
        if (model_axis > 1 and hasattr(x, "ndim") and x.ndim == 4
                and x.size >= min_size_to_shard and x.shape[-1] % model_axis == 0):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)

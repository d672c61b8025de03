"""Device mesh / sharding layer.

The reference is strictly single-GPU (SURVEY.md §2c) — this layer is new
design.  Strategy on a v5e slice:

* **data axis**: NeRF/descriptor training shards the camera/ray batch;
  gradients are reduced by XLA-inserted ``psum`` over ICI (no NCCL analog
  needed — we only annotate shardings).
* **point axis**: point-cloud kernels (Chamfer/ICP NN, pose scoring) shard
  the query points; reductions are global ``min``/``sum`` collectives.

Everything goes through ``jax.jit`` with ``NamedSharding`` annotations; no
pmap/shard_map is required for these embarrassingly-parallel axes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading dimension over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def shard_leading(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a pytree with its leading dim sharded over the mesh."""
    sh = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

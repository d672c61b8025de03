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


def auto_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """The production default: a 1-D data mesh over all local devices, or
    None when the host is single-device (sharding constraints are skipped
    and programs compile exactly as before)."""
    devs = jax.devices()
    if len(devs) < min_devices:
        return None
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def constrain(x, mesh: Optional[Mesh], spec: tuple):
    """with_sharding_constraint under an optional mesh.

    ``spec`` is a PartitionSpec tuple, e.g. ``(DATA_AXIS,)`` to shard the
    leading axis or ``(None, DATA_AXIS)`` for the second.  With mesh=None
    this is the identity, so single-device paths are untouched.
    """
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n (for sharding-divisible batches)."""
    return ((n + k - 1) // k) * k


def largest_divisor_mesh_size(batch: int, n_devices: int) -> int:
    """Largest d <= n_devices with batch % d == 0 — the widest data mesh a
    non-divisible batch can still shard over (instead of falling all the
    way back to one device)."""
    for d in range(min(batch, n_devices), 0, -1):
        if batch % d == 0:
            return d
    return 1


def cached_or_fresh(cache_fn, fresh_fn, *key):
    """Use the lru_cache'd factory when the key is hashable, else build
    fresh.  Probes hash() explicitly so a genuine TypeError raised INSIDE
    the factory propagates instead of silently disabling the trace cache."""
    try:
        hash(key)
    except TypeError:
        return fresh_fn()
    return cache_fn(*key)

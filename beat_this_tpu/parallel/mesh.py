"""Device mesh + sharding helpers for data-parallel training and batched
inference.

The reference is strictly single-GPU (SURVEY.md §2.3: no DDP/NCCL anywhere);
the TPU-native replacement is SPMD under `jax.jit` over an explicit
`jax.sharding.Mesh`: the batch axis is sharded over the "data" mesh axis,
parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduce over ICI automatically. The mesh axis is explicit from day one so
the same step function scales from 1 chip to a pod slice (and to multi-host
DCN meshes) without code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the first `n_devices` (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a pytree of host arrays on the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def usable_data_devices(batch_size: int, n_devices: int | None = None) -> int:
    """Largest device count <= n_devices that evenly divides `batch_size`
    (data-parallel sharding requires the batch axis to split evenly)."""
    if n_devices is None:
        n_devices = len(jax.devices())
    for d in range(min(batch_size, n_devices), 0, -1):
        if batch_size % d == 0:
            return d
    return 1

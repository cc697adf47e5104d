"""Device mesh + sharding helpers: the TPU-native scale-out layer.

The reference is strictly single-device (SURVEY.md §2.3: no DDP, no
torch.distributed, no collectives).  Scale-out here is idiomatic JAX SPMD:
a 1-D ``('data',)`` mesh, batches sharded over the 'data' axis, parameters /
optimizer state / schedule replicated, and XLA inserting the gradient
all-reduce over ICI when the jitted train step consumes sharded batches.
The same code path runs single-chip (mesh of 1) and multi-chip; tests
exercise an 8-way virtual CPU mesh.

The model (~130M params at the paper config) fits per-chip, so no TP/PP is
warranted (SURVEY.md §2.3); detection sweeps shard by sample over the same
axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Leading (batch) axis split over 'data'; trailing axes replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a host batch onto the mesh, split along the batch axis."""
    return jax.device_put(batch, batch_sharding(mesh, np.ndim(batch)))

"""Device mesh + sharding rules.

The reference's only distribution strategy is DDP data parallelism over NCCL
(external/train.py:53-61, SURVEY.md §2.10). TPU-native equivalent: a
`jax.sharding.Mesh` with a `data` axis; batches are sharded on their leading axis,
parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduces over ICI. An optional `model` axis is reserved for spatial/clip
sharding of high-res video features (degenerate context parallelism, SURVEY §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of [B, ...] arrays sharded over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)

"""Multi-host initialization + cross-process eval aggregation.

TPU-native equivalent of the reference's NCCL process-group setup
(tools/train.py:126-134 init_dist + external/test.py:78-170 multi-GPU result
collection, SURVEY.md §5.8): one `jax.distributed.initialize` call wires every
host into the same XLA runtime; `global_mesh` spans all devices; eval results
aggregate either on-device (`process_allgather`) or through the same
shared-tmpdir file scheme the reference uses.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX. No-op on a single host; arguments default to
    the TPU pod environment variables when launched by the platform."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def global_mesh(n_model: int = 1) -> Mesh:
    """Data x model mesh over ALL devices of ALL processes (DCN x ICI aware
    ordering comes from jax.devices() itself)."""
    devices = np.asarray(jax.devices())
    n_data = len(devices) // n_model
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def allgather_results(local: list, tmpdir: str | None = None) -> list | None:
    """Gather per-process python result lists.

    With a shared filesystem, mirrors the reference's tmpdir+pickle collection
    (external/test.py:100-170): every process dumps part_{rank}.pkl, process 0
    concatenates. Returns the full list on process 0, None elsewhere."""
    if jax.process_count() == 1:
        return local
    assert tmpdir is not None, "multi-host gather needs a shared tmpdir"
    os.makedirs(tmpdir, exist_ok=True)
    rank = jax.process_index()
    with open(os.path.join(tmpdir, f"part_{rank}.pkl"), "wb") as f:
        pickle.dump(local, f)
    # barrier via a tiny collective
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vknet_allgather")
    if rank != 0:
        return None
    out = []
    for r in range(jax.process_count()):
        with open(os.path.join(tmpdir, f"part_{r}.pkl"), "rb") as f:
            out.extend(pickle.load(f))
    return out

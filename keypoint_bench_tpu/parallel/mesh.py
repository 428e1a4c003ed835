"""Device mesh construction and sharding helpers.

The reference has no distributed story (SURVEY.md §2.7: single device,
sequential subprocess sweeps). Here the scale axis is the pair/frame batch:
pairs shard over the 'data' mesh axis; the 'model' axis is reserved for
tensor-parallel shardings (LightGlue heads) on larger meshes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host bring-up: `jax.distributed.initialize` wrapper (the
    NCCL/MPI-equivalent backend of SURVEY.md §2.7 — one call per host before
    any mesh construction; afterwards jax.devices() spans the slice and the
    same pjit/shard_map code runs over ICI+DCN). On single-host
    environments (like this one) it is a no-op unless a coordinator is
    given."""
    import jax
    if coordinator is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)

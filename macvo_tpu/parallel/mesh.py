"""Device mesh utilities for single-host and multi-host scale-out.

The reference has no distributed backend (its concurrency is a spawned child
process + mp.Pipe, SURVEY.md §2.0 P1/P6); TPU-native scaling is a
``jax.sharding.Mesh`` over which everything pjit-shards:

* ``data`` axis — sequences (batched odometry, training batch),
* ``obs`` axis — observation blocks of the bundle-adjustment solve.

Multi-host pods use one JAX process per host (``init_distributed``); the
collectives then ride ICI within a slice and DCN across slices with no code
changes here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over the available devices. Default: 1-D 'data' mesh of all
    devices; pass e.g. ``axis_sizes=(4, 2), axis_names=("data", "obs")`` for
    a 2-D layout."""
    devices = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,)
    devices = devices[: int(np.prod(axis_sizes))].reshape(tuple(axis_sizes))
    return Mesh(devices, tuple(axis_names))


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-controller initialization for multi-host pods
    (wraps ``jax.distributed.initialize``; no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))

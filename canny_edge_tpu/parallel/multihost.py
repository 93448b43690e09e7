"""Multi-host orchestration: DCN process group + host-sharded streaming.

The reference is strictly single-process (SURVEY.md §2.2).  This module
provides the N-host runway:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper (coordinator
  discovery via env or args); no-op on a single host.
* :func:`global_mesh` — a ("data","y","x") mesh over *all* processes'
  devices; with the batch axis laid out across hosts, batch sharding rides
  DCN while the spatial axes stay within a slice and ride ICI.
* :func:`host_local_stream_config` — which slice of a global frame stream
  this host feeds (round-robin, matching StreamingRunner's host sharding).
* :func:`aggregate_stats` — cross-host reduction of StreamStats via
  jax.experimental.multihost_utils.

On this single-host environment everything degrades to identity; the same
code runs unchanged on a pod slice.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Join the distributed runtime; returns (process_id, num_processes).

    Arguments default from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (the standard multi-host launch contract).  A single
    process with no coordinator configured skips initialization.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes in (None, 1):
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(data: int | None = None, y: int | None = None,
                x: int | None = None):
    """Mesh over all processes' devices, batch axis across hosts.

    Device order follows jax.devices() (grouped by process), so with
    ``data = process_count * per_host_data`` the data axis maps host-major:
    batch sharding crosses DCN, spatial (y, x) sharding stays device-local
    to each host's slice and rides ICI.
    """
    from .sharded import make_mesh

    import jax

    if data is None:
        data = jax.process_count()
    return make_mesh(jax.devices(), data=data, y=y, x=x)


@dataclass
class HostStreamConfig:
    host_id: int
    num_hosts: int
    batch_size: int


def host_local_stream_config(batch_size: int) -> HostStreamConfig:
    import jax

    return HostStreamConfig(host_id=jax.process_index(),
                            num_hosts=jax.process_count(),
                            batch_size=batch_size)


def aggregate_stats(stats) -> dict:
    """Sum StreamStats across hosts (frames, batches, MP); max of seconds."""
    import jax

    if jax.process_count() == 1:
        return stats.to_dict()
    from jax.experimental import multihost_utils

    local = np.array([stats.frames, stats.batches, stats.mp], np.float64)
    summed = multihost_utils.process_allgather(local).sum(axis=0)
    secs = float(multihost_utils.process_allgather(
        np.array([stats.seconds])).max())
    return {
        "frames": int(summed[0]), "batches": int(summed[1]),
        "mp": float(summed[2]), "seconds": secs,
        "fps": float(summed[0] / secs) if secs else 0.0,
        "mp_per_s": float(summed[2] / secs) if secs else 0.0,
        "hosts": int(jax.process_count()),
    }

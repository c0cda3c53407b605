"""Multi-host (multi-slice) initialization helpers.

The reference is single-process/single-device (SURVEY.md §2.9b). For
multi-host TPU pods: call `initialize()` once at program start (before any
jax device use); the global mesh then spans all hosts' devices, batches are
host-sharded deterministically (`data.pipeline.host_shard` +
`jax.make_array_from_process_local_data`), and collectives ride ICI within a
slice / DCN across slices — all placed by GSPMD from the shardings.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process (or already initialized)."""
    if num_processes is None:
        num_processes = int(os.environ.get("NFDPM_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("NFDPM_COORDINATOR", None),
            num_processes=num_processes,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("NFDPM_PROCESS_ID", "0")),
        )
    except RuntimeError:
        pass  # already initialized


def process_info():
    return {"process_index": jax.process_index(), "process_count": jax.process_count()}


def global_batch_from_local(mesh, local_batch):
    """Assemble a globally-sharded array from this host's local batch slice
    (deterministic per-host data sharding, SURVEY.md §5.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local_batch
    )


def distribute_batch(mesh, global_batch):
    """Multi-host data path in one call: every host loads the SAME global
    batch (the host data pipeline is deterministic, data/pipeline.py Loader),
    takes its process's slice (`data.pipeline.host_shard`), and assembles the
    globally-sharded array. Single-process: plain device_put onto the mesh."""
    from ..data.pipeline import host_shard

    if jax.process_count() == 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(global_batch,
                              NamedSharding(mesh, P("data")))
    local = host_shard(global_batch, jax.process_index(), jax.process_count())
    return global_batch_from_local(mesh, local)

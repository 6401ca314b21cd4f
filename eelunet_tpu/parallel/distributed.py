"""Multi-host runtime initialization.

The reference has no distributed communication layer at all (SURVEY.md §2.8).
On TPU pods the idiom is one JAX process per host: ``jax.distributed.
initialize()`` wires the processes together, after which ``jax.devices()``
spans the slice and the same ``Mesh``/``NamedSharding`` code paths scale —
collectives ride ICI within a slice and DCN across slices, inserted by XLA.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime if this looks like a
    multi-host job; no-op (returns False) for single-process runs.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > TPU metadata autodetection
    (initialize() with no args, which self-configures on Cloud TPU).
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else os.environ.get("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")

    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES") and os.environ.get("EELUNET_TPU_AUTO_DISTRIBUTED"):
        jax.distributed.initialize()
        return True
    return False


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """Host 0 — the only process that should write logs/history. (Orbax
    checkpoint saves stay collective: every process calls save() and orbax's
    own multihost protocol elects the writer.)"""
    return jax.process_index() == 0


def sync_seed(seed: Optional[int]) -> int:
    """Resolve a training seed that is identical on every process.

    The shuffle order must match across hosts for the per-process batch
    slices to partition each global batch (data/pipeline.DataLoader
    process_shard). A None seed is drawn on host 0 and broadcast.
    """
    import numpy as np

    if seed is None:
        seed = int(np.random.randint(0, 10000))
    if jax.process_count() == 1:
        return seed
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(jax.numpy.int32(seed)))


def assemble_global_batch(array, sharding):
    """Place one process-local numpy batch onto the mesh as a global array.

    Single-process: plain ``device_put`` (unchanged fast path). Multi-process:
    ``jax.make_array_from_process_local_data`` — works uniformly for both
    cases we feed it: a 'data'-sharded batch (each process holds its
    contiguous slice of the global batch) and a fully-replicated batch (each
    process holds the complete array, e.g. eval loaders, which are not
    process-sharded — every host evaluates the full split so tail batches and
    metric sums need no cross-host reassembly).
    """
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    import numpy as np

    return jax.make_array_from_process_local_data(sharding, np.asarray(array))


def process_shard_spec() -> Optional[tuple]:
    """(process_index, process_count) for DataLoader process_shard, or None
    when single-process."""
    return (jax.process_index(), jax.process_count()) if jax.process_count() > 1 else None

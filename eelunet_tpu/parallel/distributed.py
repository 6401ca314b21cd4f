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
    """Host 0 — the only process that should write checkpoints/logs."""
    return jax.process_index() == 0

"""Multi-host initialization and process-level helpers.

The reference's multi-node story is Lightning's DDP spawn + NCCL process
groups (SURVEY.md §5.8); the JAX equivalent is `jax.distributed.initialize`
(one process per host, all devices joined into one global mesh) plus
host-local batch sharding. Single-process runs are a no-op.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("xmmsr")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host JAX runtime when configured; no-op otherwise.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers only set the environment.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=(
            num_processes
            if num_processes is not None
            else int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        ),
        # `process_id or env` would discard an explicit process_id=0 (rank 0
        # is falsy) and let a stale env var steal its slot
        process_id=(
            process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0"))
        ),
    )
    log.info(
        "Joined distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_primary() -> bool:
    """Rank-zero guard (the reference's rank_zero_* decorators)."""
    return jax.process_index() == 0

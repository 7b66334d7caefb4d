"""Multi-host bootstrap + cross-process reductions (NCCL/torchrun replacement).

Rebuild of the reference's distributed init (train_tools.py:362-403: env-var
RANK/WORLD_SIZE + NCCL process group via torchrun) the JAX way
(SURVEY.md §5.8): `jax.distributed.initialize` from coordinator env vars, a
global mesh over all processes' devices, and host-side scalar reductions via
multihost utils.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-process JAX from args or env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, with
    torchrun-style MASTER_ADDR/WORLD_SIZE/RANK accepted as fallbacks).

    Single-process when no coordinator is configured — mirroring the
    reference's degrade-to-local behavior (train_tools.py:376-384).

    Returns {"process_id", "num_processes", "local_devices", "global_devices"}.
    """
    coordinator_address = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or (
            f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
            if "MASTER_ADDR" in os.environ and "RANK" in os.environ
            else None
        )
    )
    if coordinator_address is not None:
        num_processes = int(
            num_processes
            or os.environ.get("JAX_NUM_PROCESSES")
            or os.environ.get("WORLD_SIZE", 1)
        )
        process_id = int(
            process_id
            if process_id is not None
            else os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK", 0))
        )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_reduce_mean(x: float) -> float:
    """Mean of a host scalar across processes (reference
    train_tools.py:630-650 all_reduce/world_size for logging)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(x, np.float64))
    return float(np.mean(arr))


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (reference train_tools.py:402)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)

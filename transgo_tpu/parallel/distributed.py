"""Multi-host initialization helper.

On a pod slice every host runs the same single-controller program;
``jax.distributed.initialize`` wires the hosts together and ``jax.devices()``
then spans the slice. The pipeline needs no further changes: the mesh covers
all devices, games/batches shard over ``data``, gradients psum over ICI
(SURVEY.md section 7 stage 6 — this subsumes the reference's Ray layer).
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize multi-host JAX when configured; no-op on one host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted (TPU pods usually need no arguments at all —
    jax.distributed.initialize() autodetects on Cloud TPU).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None
    )
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None
    )
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True

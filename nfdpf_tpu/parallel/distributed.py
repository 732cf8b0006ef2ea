"""Multi-host bring-up helpers.

The reference is strictly single-process/single-device (SURVEY.md §2.7);
this module is the new framework's multi-host entry glue: call
``initialize()`` once per process before building a mesh, and the
(`data`, `particle`) mesh from `parallel.mesh.make_mesh` then spans every
chip of every host (XLA lays DCN-crossing collectives automatically).

Typical pod-slice launch (one process per host):

    from nfdpf_tpu.parallel import distributed, mesh
    distributed.initialize()                  # no-op single-process
    m = mesh.make_mesh(particle=jax.device_count() // 8)
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
    """``jax.distributed.initialize`` with env-var fallbacks.

    Reads ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when args are omitted.  A no-op when neither args nor
    env vars request a multi-process setup (single-host dev boxes, tests, and
    TPU pod runtimes where jax auto-detects topology).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_str = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None
    )
    pid_str = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None
    )
    if coordinator_address is None and num_processes is None:
        return  # single-process; jax auto-detects TPU pod runtimes itself
    if coordinator_address is not None and (
        num_processes is None or process_id is None
    ):
        # jax.distributed.initialize only tolerates None for these on
        # auto-detecting runtimes (TPU pods / SLURM); fail with a clear
        # message instead of forwarding Nones it will choke on.
        raise ValueError(
            "initialize(coordinator_address=...) also needs num_processes "
            "and process_id (flags or JAX_NUM_PROCESSES/JAX_PROCESS_ID env)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0

"""Multi-host runtime initialization.

The reference scales across hosts as fully independent Slurm ranks
(heyhi/__init__.py:361-406; no cross-rank communication).  The TPU-native
framework instead runs one SPMD program over all hosts' devices: call
:func:`initialize` once per process before any jax computation, then
build the global mesh with :func:`global_mesh` — the shard_map programs
in rebel_tpu.parallel.mesh run unchanged, with gradient psums riding ICI
within a slice and DCN across slices.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize wrapper: no-ops on a single process,
    auto-detects cluster env (TPU pods, Slurm) when args are None."""
    if num_processes == 1:
        log.info("single-process runtime; skipping jax.distributed")
        return
    if coordinator_address is None and num_processes is None:
        # Auto-detect from the cluster environment WITHOUT touching the
        # backend: jax.process_count() would initialize XLA (making the
        # later jax.distributed.initialize fail) and always reports 1
        # before distributed init anyway.  jax.distributed's own
        # detectors (TPU pod metadata, SLURM_*, OMPI_*) cover the
        # multi-host cases; a plain single-host launch has none of
        # those markers.
        import os

        multi_tpu = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        markers = ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
                   "MEGASCALE_COORDINATOR_ADDRESS")
        if not multi_tpu and not any(os.environ.get(m) for m in markers):
            log.info("no cluster env detected; skipping jax.distributed")
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def global_mesh(axis: str = "data") -> Mesh:
    """One data axis over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis,))

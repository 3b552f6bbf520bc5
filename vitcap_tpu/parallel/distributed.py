"""Multi-host bootstrap + cross-host utilities.

TPU-native replacement for the reference's NCCL process-group init
(/root/reference/src/tools/torch_common.py:125-142 ensure_init_process_group
and the MPI env-rank plumbing in tools/common.py:528-548): one
`jax.distributed.initialize()` per host; collectives ride ICI/DCN through
jitted computations instead of explicit NCCL calls.
"""

from __future__ import annotations

import logging
import os
from typing import Optional


def ensure_init_distributed(coordinator_address: Optional[str] = None,
                            num_processes: Optional[int] = None,
                            process_id: Optional[int] = None) -> None:
    """Idempotent multi-host init.  On single-host (or TPU pods where the
    runtime autodetects topology) all arguments may be None.

    Env fallbacks mirror the reference's rank plumbing: MASTER_ADDR/PORT,
    WORLD_SIZE, RANK (or OMPI_COMM_WORLD_*)."""
    import jax
    if getattr(ensure_init_distributed, "_done", False):
        return
    # NB: do NOT call jax.process_count()/jax.devices() here — they
    # initialize the XLA backend, after which jax.distributed.initialize
    # refuses to run; inspect the distributed client state instead
    if getattr(jax._src.distributed.global_state, "client", None) \
            is not None:
        ensure_init_distributed._done = True
        return
    env = os.environ
    coordinator_address = coordinator_address or (
        f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '8476')}"
        if "MASTER_ADDR" in env else None)
    num_processes = num_processes or int(
        env.get("WORLD_SIZE", env.get("OMPI_COMM_WORLD_SIZE", 0)) or 0) \
        or None
    process_id = process_id if process_id is not None else (
        int(env["RANK"]) if "RANK" in env else
        int(env["OMPI_COMM_WORLD_RANK"])
        if "OMPI_COMM_WORLD_RANK" in env else None)
    if coordinator_address is None and num_processes is None:
        logging.info("single-host jax; skipping distributed init")
        ensure_init_distributed._done = True
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    ensure_init_distributed._done = True
    logging.info("jax.distributed initialized: process %d/%d, %d local / %d "
                 "global devices", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())


def barrier(name: str = "barrier") -> None:
    """Host barrier (reference `synchronize`, torch_common.py:191-210)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def any_process(flag: bool) -> bool:
    """Cross-process OR of a host-side bool (single-process: identity).
    Used to make preemption shutdown collective: every process must agree
    to stop at the same step boundary, else peers hang in the next
    step's gradient psum waiting for an exited rank."""
    import jax
    if jax.process_count() == 1:
        return flag
    import numpy as np
    from jax.experimental import multihost_utils
    return bool(np.asarray(
        multihost_utils.process_allgather(np.array([flag]))).any())


def all_gather_host(values) -> list:
    """Gather small host values from every process (reference
    concat_all_gather analogue for python objects)."""
    import jax
    if jax.process_count() == 1:
        return [values]
    from jax.experimental import multihost_utils
    return list(multihost_utils.process_allgather(values))

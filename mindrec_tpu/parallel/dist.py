"""Multi-process (multi-host) bootstrap.

The reference's cluster formation (SURVEY §2.3 collectives row) has
three bootstrap styles: scheduler-env dynamic networking
(``MS_SCHED_HOST/MS_SCHED_PORT/MS_ROLE/...``), mpirun, and Ascend
rank-table files.  On TPU all three collapse to
``jax.distributed.initialize`` with a coordinator endpoint — the
"scheduler" role.  This module reads either the JAX-style env vars or
the reference-style ``MR_SCHED_HOST``/``MR_SCHED_PORT``/
``MR_WORKER_NUM``/``MR_ROLE`` set (name-parity with the MS_* family so
launch scripts translate 1:1).
"""

from __future__ import annotations

import os

import jax


def initialize_from_env(timeout_s: int = 300) -> dict:
    """Initialize jax.distributed from env vars if a cluster is declared.

    Recognized (first match wins):
      * COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID  (JAX style)
      * MR_SCHED_HOST / MR_SCHED_PORT / MR_WORKER_NUM / MR_WORKER_ID
        (reference MS_* name parity)

    Returns a dict describing the topology (single-process if no env).
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if coord is None and "MR_SCHED_HOST" in os.environ:
        host = os.environ["MR_SCHED_HOST"]
        port = os.environ.get("MR_SCHED_PORT", "11272")
        coord = f"{host}:{port}"
        nproc = os.environ.get("MR_WORKER_NUM")
        pid = os.environ.get("MR_WORKER_ID")
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
            initialization_timeout=timeout_s,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "coordinator": coord,
    }

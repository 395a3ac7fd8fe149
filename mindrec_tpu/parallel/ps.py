"""Three-role cluster topology (scheduler / table servers / workers).

Reference parity (SURVEY §2.3 "Parameter-server runtime", §3.3): the
reference launch scripts spawn one MS_SCHED + S MS_PSERVER + W MS_WORKER
processes, all running the same entrypoint, differentiated by env vars
(``run_parameter_server_distribute_train.sh:28-75``).  The TPU-native
split is:

* **scheduler**  → the ``jax.distributed`` coordinator (workers only;
  table servers don't join the device mesh);
* **server**     → ``native/table_server.cc`` processes holding table
  shards (RAM cap + SSD spill server-side);
* **worker**     → trainer processes; their cached embedding tables use
  :class:`mindrec_tpu.ops.remote.RemoteTier` pointed at the servers.

Env contract (MS_* name parity so reference launch scripts translate):

=====================  ==========================================
``MR_ROLE``            ``MR_SCHED`` | ``MR_PSERVER`` | ``MR_WORKER``
``MR_SCHED_HOST/PORT`` coordinator endpoint (workers' rendezvous)
``MR_SERVER_NUM``      number of table servers
``MR_SERVER_HOSTS``    comma list "host:port,..." of table servers
                       (default: sched host, ports base..base+S-1)
``MR_SERVER_PORT``     this server's listen port (server role)
``MR_WORKER_NUM``      number of worker processes
``MR_WORKER_ID``       this worker's process id
=====================  ==========================================

A single entrypoint calls :func:`run_role`: the server role blocks
serving tables; scheduler/worker roles return and run training (the
scheduler is worker 0, exactly like ``jax.distributed``'s coordinator).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from mindrec_tpu.parallel.dist import initialize_from_env


@dataclass
class PsTopology:
    role: str                      # "sched" | "server" | "worker"
    server_addrs: list[str] = field(default_factory=list)
    worker_id: int = 0
    worker_num: int = 1
    dist: dict | None = None


def topology_from_env() -> PsTopology:
    role_env = os.environ.get("MR_ROLE", "MR_WORKER").upper()
    role = {"MR_SCHED": "sched", "MR_PSERVER": "server",
            "MR_WORKER": "worker"}.get(role_env, "worker")
    n_srv = int(os.environ.get("MR_SERVER_NUM", "0"))
    hosts = os.environ.get("MR_SERVER_HOSTS")
    if hosts:
        addrs = [h.strip() for h in hosts.split(",") if h.strip()]
    elif n_srv:
        base_host = os.environ.get("MR_SCHED_HOST", "127.0.0.1")
        base_port = int(os.environ.get("MR_SERVER_PORT_BASE", "18900"))
        addrs = [f"{base_host}:{base_port + i}" for i in range(n_srv)]
    else:
        addrs = []
    return PsTopology(
        role=role,
        server_addrs=addrs,
        worker_id=int(os.environ.get("MR_WORKER_ID", "0")),
        worker_num=int(os.environ.get("MR_WORKER_NUM", "1")),
    )


def run_role(topo: PsTopology | None = None) -> PsTopology:
    """Act on the role. Server role: exec the table server (blocks).
    Sched/worker roles: join the jax.distributed mesh and return."""
    topo = topo or topology_from_env()
    if topo.role == "server":
        from mindrec_tpu.ops.remote import server_binary_path

        port = int(os.environ.get(
            "MR_SERVER_PORT",
            topo.server_addrs[0].rsplit(":", 1)[1] if topo.server_addrs
            else "18900",
        ))
        cmd = [str(server_binary_path()), "--port", str(port)]
        if d := os.environ.get("MR_SPILL_DIR"):
            cmd += ["--spill-dir", d]
        # MR_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE handled by the binary
        os.execv(cmd[0], cmd)  # never returns
    # scheduler == worker 0's coordinator: both just join the mesh
    topo.dist = initialize_from_env()
    return topo

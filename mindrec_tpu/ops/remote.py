"""Remote embedding tier — client for the C++ table server.

This is the worker side of the framework's parameter-server-role
equivalent (SURVEY §2.3 "Parameter-server runtime": the reference spawns
MS_PSERVER processes holding table shards with a RAM cap + SSD spill —
``run_parameter_server_distribute_train.sh:39-75``,
``run_parameter_server_standalone_train_terabyte_scale_model.sh:35-42``).

:class:`RemoteTier` implements the same ``read``/``write``/``flush``
interface as :class:`mindrec_tpu.ops.cache.HostTier`, so
:class:`CachedEmbeddingTable` composes either transparently — the cache
hierarchy becomes **device HBM arena ↔ (remote host RAM ↔ remote SSD)**
with sharding across any number of server processes
(``shard = splitmix64(id) % n_servers`` for power-law balance).

Wire protocol: see ``native/table_server.cc`` header comment.
"""

from __future__ import annotations

import os
import socket
import struct
import subprocess
import time
from pathlib import Path

import numpy as np

_SPLITMIX_C1 = 0xBF58476D1CE4E5B9
_SPLITMIX_C2 = 0x94D049BB133111EB
_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (matches table_server.cc's Splitmix64)."""
    with np.errstate(over="ignore"):
        x = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(_SPLITMIX_C1)) & np.uint64(_MASK)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(_SPLITMIX_C2)) & np.uint64(_MASK)
        return x ^ (x >> np.uint64(31))


class _Conn:
    """One table on one server."""

    def __init__(self, addr: str, table: str, dim: int, init_std: float,
                 seed: int, init_bias: float = 0.0, timeout_s: float = 30.0):
        host, port = addr.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)), timeout=timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.dim = dim
        name = table.encode()[:32].ljust(32, b"\0")
        self.sock.sendall(
            b"MREC" + struct.pack("<I", dim) + name
            + struct.pack("<ffQ", init_std, init_bias, seed)
        )
        magic = self._recv(8)
        if magic[:4] != b"MRSV" or struct.unpack("<I", magic[4:])[0] != dim:
            raise ConnectionError(f"table server handshake failed for {table}@{addr}")

    def _recv(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("table server closed connection")
            buf += chunk
        return bytes(buf)

    def read(self, ids: np.ndarray) -> np.ndarray:
        n = ids.shape[0]
        self.sock.sendall(struct.pack("<BI", 1, n) + ids.astype("<i8").tobytes())
        raw = self._recv(n * self.dim * 4)
        return np.frombuffer(raw, "<f4").reshape(n, self.dim).copy()

    def write(self, ids: np.ndarray, rows: np.ndarray) -> None:
        n = ids.shape[0]
        self.sock.sendall(
            struct.pack("<BI", 2, n) + ids.astype("<i8").tobytes()
            + np.ascontiguousarray(rows, "<f4").tobytes()
        )
        self._recv(1)

    def flush(self) -> None:
        self.sock.sendall(struct.pack("<BI", 3, 0))
        self._recv(1)

    def stats(self) -> tuple[int, int]:
        self.sock.sendall(struct.pack("<BI", 4, 0))
        ram, ssd = struct.unpack("<QQ", self._recv(16))
        return ram, ssd

    def shutdown_server(self) -> None:
        self.sock.sendall(struct.pack("<BI", 5, 0))
        try:
            self._recv(1)
        except ConnectionError:
            pass

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


class RemoteTier:
    """HostTier-compatible tier backed by N table-server shards.

    ``addrs`` — list of "host:port" server endpoints; ids are sharded by
    ``splitmix64(id) % len(addrs)`` so skewed (power-law) id
    distributions still balance across servers.
    """

    def __init__(self, addrs, table: str, dim: int, init_std: float = 0.01,
                 seed: int = 0, init_bias: float = 0.0):
        if isinstance(addrs, str):
            addrs = [addrs]
        self.dim = dim
        self.conns = [
            _Conn(a, table, dim, init_std, seed, init_bias) for a in addrs
        ]

    def _shard(self, ids: np.ndarray) -> np.ndarray:
        if len(self.conns) == 1:
            return np.zeros(ids.shape[0], np.int64)
        return (_splitmix64(ids.view(np.uint64) if ids.dtype == np.int64
                            else ids.astype(np.uint64))
                % np.uint64(len(self.conns))).astype(np.int64)

    def read(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, np.int64).reshape(-1)
        if ids.shape[0] == 0:
            return np.zeros((0, self.dim), np.float32)
        shard = self._shard(ids)
        out = np.empty((ids.shape[0], self.dim), np.float32)
        for s, conn in enumerate(self.conns):
            m = shard == s
            if m.any():
                out[m] = conn.read(ids[m])
        return out

    def write(self, ids: np.ndarray, rows: np.ndarray) -> None:
        ids = np.asarray(ids, np.int64).reshape(-1)
        if ids.shape[0] == 0:
            return
        rows = np.asarray(rows, np.float32).reshape(ids.shape[0], self.dim)
        shard = self._shard(ids)
        for s, conn in enumerate(self.conns):
            m = shard == s
            if m.any():
                conn.write(ids[m], rows[m])

    def flush(self) -> None:
        for conn in self.conns:
            conn.flush()

    def stats(self):
        return [c.stats() for c in self.conns]

    def close(self):
        for c in self.conns:
            c.close()


class _HashConn:
    """One hash-store shard on one server (wire: table_server.cc MRHS)."""

    def __init__(self, addr: str, name: str, capacity: int, slot_base: int,
                 permit: int, evict: int, timeout_s: float = 30.0):
        host, port = addr.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)), timeout=timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        nm = name.encode()[:32].ljust(32, b"\0")
        self.sock.sendall(
            b"MRHS" + nm + struct.pack("<qqqq", capacity, slot_base, permit, evict)
        )
        magic = _Conn._recv(self, 8)
        if magic[:4] != b"MRSV":
            raise ConnectionError(f"hash-store handshake failed for {name}@{addr}")

    _recv = _Conn._recv
    close = _Conn.close

    def lookup(self, keys: np.ndarray, force: bool) -> np.ndarray:
        n = keys.shape[0]
        self.sock.sendall(
            struct.pack("<BIB", 10, n, 1 if force else 0)
            + keys.astype("<i8").tobytes()
        )
        return np.frombuffer(self._recv(n * 8), "<i8").copy()

    def evict(self) -> np.ndarray:
        self.sock.sendall(struct.pack("<BI", 11, 0))
        (m,) = struct.unpack("<I", self._recv(4))
        return np.frombuffer(self._recv(m * 8), "<i8").copy() if m else np.empty(0, np.int64)

    def items(self):
        self.sock.sendall(struct.pack("<BI", 12, 0))
        (m,) = struct.unpack("<I", self._recv(4))
        if not m:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        keys = np.frombuffer(self._recv(m * 8), "<i8").copy()
        slots = np.frombuffer(self._recv(m * 8), "<i8").copy()
        return keys, slots

    def erase(self, keys: np.ndarray):
        n = keys.shape[0]
        self.sock.sendall(struct.pack("<BI", 13, n) + keys.astype("<i8").tobytes())
        self._recv(1)

    def size(self) -> int:
        self.sock.sendall(struct.pack("<BI", 14, 0))
        return struct.unpack("<Q", self._recv(8))[0]


class RemoteHashStore:
    """Distributed MapParameter: the dynamic-vocab id->slot map sharded
    across table servers by key hash (reference: the hash table lives in
    the PS and registers per-rank cache state,
    ``mindspore_rec/ops/embedding.py:163-182``).

    Drop-in for :class:`mindrec_tpu.native.hashstore.HashStore`
    (lookup_or_insert / evict / items / erase / __len__), so
    :class:`HashEmbeddingLookup` and ``DynamicEmbeddingAdapter`` take it
    via their ``store`` parameter.  Server shard ``s`` owns keys with
    ``splitmix64(key) % S == s`` and allocates GLOBAL arena slots in
    ``[s*capacity/S, (s+1)*capacity/S)``, so every data-parallel worker
    sees one consistent id->slot mapping and replicated arenas stay
    aligned.

    Note: each connected worker's lookup advances the shared step clock,
    so admission/eviction thresholds count CLUSTER steps — the same
    server-side-clock semantics the reference's PS hash table has.
    """

    def __init__(self, addrs, name: str, capacity: int,
                 permit_threshold: int = 1, evict_threshold: int = 0x7FFFFFFF):
        if isinstance(addrs, str):
            addrs = [addrs]
        n_srv = len(addrs)
        self.capacity = capacity
        cap_per = capacity // n_srv
        self.conns = [
            _HashConn(a, name, cap_per, s * cap_per, permit_threshold,
                      evict_threshold)
            for s, a in enumerate(addrs)
        ]

    def __len__(self):
        return sum(c.size() for c in self.conns)

    def _shard(self, keys: np.ndarray) -> np.ndarray:
        if len(self.conns) == 1:
            return np.zeros(keys.shape[0], np.int64)
        return (
            _splitmix64(keys.view(np.uint64) if keys.dtype == np.int64
                        else keys.astype(np.uint64))
            % np.uint64(len(self.conns))
        ).astype(np.int64)

    def lookup_or_insert(self, keys: np.ndarray, force: bool = False) -> np.ndarray:
        keys = np.asarray(keys, np.int64).reshape(-1)
        out = np.empty(keys.shape[0], np.int64)
        shard = self._shard(keys)
        for s, conn in enumerate(self.conns):
            m = shard == s
            if m.any():
                out[m] = conn.lookup(keys[m], force)
        return out

    def evict(self) -> np.ndarray:
        return np.concatenate([c.evict() for c in self.conns])

    def items(self):
        ks, ss = zip(*[c.items() for c in self.conns])
        return np.concatenate(ks), np.concatenate(ss)

    def erase(self, keys: np.ndarray):
        keys = np.asarray(keys, np.int64).reshape(-1)
        shard = self._shard(keys)
        for s, conn in enumerate(self.conns):
            m = shard == s
            if m.any():
                conn.erase(keys[m])

    def close(self):
        for c in self.conns:
            c.close()


def server_binary_path() -> Path:
    return Path(__file__).resolve().parent.parent / "native" / "mindrec_table_server"


def launch_table_server(port: int, ram_mb: int | None = None,
                        spill_dir: str | None = None,
                        wait_s: float = 10.0) -> subprocess.Popen:
    """Spawn a table-server process on localhost and wait until it accepts.

    Builds the binary with make on first use if missing (reference
    launch scripts spawn MS_PSERVER roles the same lazy way).
    """
    binary = server_binary_path()
    if not binary.exists():
        subprocess.run(
            ["make", "-C", str(binary.parent), "mindrec_table_server"],
            check=True, capture_output=True,
        )
    cmd = [str(binary), "--port", str(port)]
    if ram_mb is not None:
        cmd += ["--ram-mb", str(ram_mb)]
    if spill_dir is not None:
        cmd += ["--spill-dir", spill_dir]
    env = dict(os.environ)
    env.pop("MR_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE", None)  # CLI wins in tests
    proc = subprocess.Popen(cmd, env=env)
    deadline = time.monotonic() + wait_s
    while time.monotonic() < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            return proc
        except OSError:
            if proc.poll() is not None:
                raise RuntimeError(f"table server exited rc={proc.returncode}")
            time.sleep(0.05)
    proc.kill()
    raise TimeoutError(f"table server on :{port} did not come up")


def stop_table_server(addr: str) -> None:
    """Graceful shutdown via the protocol (flushes spill files)."""
    try:
        c = _Conn(addr, "__ctl__", 1, 0.0, 0)
        c.shutdown_server()
        c.close()
    except (OSError, ConnectionError):
        pass

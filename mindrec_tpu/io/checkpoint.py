"""Checkpoint save/restore.

Parity targets (SURVEY §5 checkpoint/resume):
* interval + keep_max retention (reference ``ModelCheckpoint`` /
  ``CheckpointConfig``; online learning saves every 100 steps keep 5 —
  ``examples/online_learning/online_train.py:81-82``),
* per-rank sliced checkpoints for sharded tables
  (``integrated_save=False`` mode,
  ``train_and_eval_parameter_server_distribute.py:130-131``),
* merge of sliced checkpoints for eval/serving
  (``models/wide_deep/eval.py:84-105``).

Format: one ``.npz`` per (checkpoint, process) holding flat path-keyed
arrays; sharded arrays are saved as the local addressable shards plus an
index describing global shape/sharding so :func:`merge_sliced` can
reassemble a full table.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in leaves:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )
        out[key] = leaf
    return out, treedef


def _host_copy(x) -> np.ndarray:
    """Host snapshot that OWNS a PRIVATE buffer.  Two aliasing hazards:
    a plain ndarray leaf is the caller's live array (mutated on the
    next step while the async writer serializes), and on the CPU
    backend ``np.asarray`` of a jax.Array can be a zero-copy view of a
    device buffer a donating step overwrites.  So: plain ndarrays copy
    unconditionally; converted arrays copy unless numpy proves the
    conversion produced a fresh owning buffer."""
    if isinstance(x, np.ndarray):
        return x.copy()
    out = np.asarray(x)
    if out.base is None and out.flags.owndata:
        return out
    return out.copy()


def _snapshot(state, force_sliced: bool) -> tuple[dict, dict]:
    """Fetch the state to host NOW (the only part that must be
    synchronous with training): -> (arrays, index)."""
    flat, _ = _flatten(state)
    arrays = {}
    index = {}
    for key, leaf in flat.items():
        arr = leaf
        sliced = isinstance(arr, jax.Array) and (
            not arr.is_fully_addressable
            or (force_sliced and len(arr.sharding.device_set) > 1)
        )
        if sliced:
            # save only this process's shards (sliced checkpoint)
            shards = [s for s in arr.addressable_shards]
            for s in shards:
                arrays[f"{key}@@shard{s.index}"] = _host_copy(s.data)
            index[key] = {
                "global_shape": list(arr.shape),
                "sliced": True,
            }
        else:
            arrays[key] = _host_copy(arr)
            index[key] = {"global_shape": list(np.shape(arr)), "sliced": False}
    return arrays, index


def _write(
    directory: Path,
    prefix: str,
    rank: int,
    step: int,
    arrays: dict,
    index: dict,
    keep_max: int | None,
) -> str:
    """Serialize + fsync + rename (atomic against process AND machine
    crash: the temp file is fsynced before the rename and the directory
    after it, so the final name can never point at truncated data)."""
    path = directory / f"{prefix}-{step:010d}-r{rank}.npz"
    # leading "." hides it from latest_checkpoint/retention globs; the
    # .npz suffix keeps np.savez from appending one
    tmp = directory / f".{prefix}-{step:010d}-r{rank}.tmp.npz"
    np.savez(tmp, __index__=json.dumps(index), **arrays)
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)
    dfd = os.open(directory, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    if keep_max is not None:
        _apply_retention(directory, prefix, rank, keep_max)
    return str(path)


def save_checkpoint(
    directory: str | os.PathLike,
    state,
    step: int,
    prefix: str = "ckpt",
    keep_max: int | None = None,
    process_index: int | None = None,
    force_sliced: bool = False,
) -> str:
    """Save a pytree state. Returns the written file path."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    rank = process_index if process_index is not None else jax.process_index()
    arrays, index = _snapshot(state, force_sliced)
    return _write(directory, prefix, rank, step, arrays, index, keep_max)


class AsyncCheckpointer:
    """Orbax-style asynchronous checkpointing (SURVEY §5: the TPU
    equivalent of the reference's per-step PS-server checkpoints is a
    sharded async save): :meth:`save` fetches the state to host
    synchronously — device buffers are immutable, so training may
    continue (and donate/overwrite its own copies) immediately — then
    serializes + writes on a background thread, overlapping disk IO
    with the next steps.

    At most one write is in flight; a second :meth:`save` first waits
    for the previous one (online-learning cadence: save every N steps,
    the write has N steps of slack).  Call :meth:`wait_until_finished`
    before reading the file or exiting."""

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="mrec-ckpt"
        )
        self._pending = None

    def save(
        self,
        directory: str | os.PathLike,
        state,
        step: int,
        prefix: str = "ckpt",
        keep_max: int | None = None,
        process_index: int | None = None,
        force_sliced: bool = False,
    ):
        """Snapshot now, write in the background.  Returns a future
        whose ``.result()`` is the written path."""
        self.wait_until_finished()
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        rank = (
            process_index if process_index is not None else jax.process_index()
        )
        arrays, index = _snapshot(state, force_sliced)
        self._pending = self._pool.submit(
            _write, directory, prefix, rank, step, arrays, index, keep_max
        )
        return self._pending

    def wait_until_finished(self) -> str | None:
        """Block until the in-flight write (if any) lands; returns its
        path.  Re-raises any background write error."""
        if self._pending is None:
            return None
        pending, self._pending = self._pending, None
        return pending.result()

    def close(self):
        self.wait_until_finished()
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _apply_retention(directory: Path, prefix: str, rank: int, keep_max: int):
    pat = re.compile(rf"^{re.escape(prefix)}-(\d+)-r{rank}\.npz$")
    files = sorted(
        (f for f in directory.iterdir() if pat.match(f.name)),
        key=lambda f: int(pat.match(f.name).group(1)),
    )
    for f in files[:-keep_max] if keep_max > 0 else []:
        f.unlink()


def latest_checkpoint(directory: str | os.PathLike, prefix: str = "ckpt", rank: int = 0):
    directory = Path(directory)
    pat = re.compile(rf"^{re.escape(prefix)}-(\d+)-r{rank}\.npz$")
    best, best_step = None, -1
    if not directory.exists():
        return None, -1
    for f in directory.iterdir():
        m = pat.match(f.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = f, int(m.group(1))
    return (str(best), best_step) if best else (None, -1)


def restore_checkpoint(path: str | os.PathLike, like, shardings=None):
    """Restore into the structure of ``like`` (a template pytree).

    ``shardings``: optional pytree of ``jax.sharding.Sharding`` matching
    ``like`` — each restored leaf is ``device_put`` onto it, so a sliced
    checkpoint saved on one mesh can resume directly onto a *different*
    topology (the reference's strategy-ckpt reload under auto-parallel,
    ``models/wide_deep/eval.py:84-105``).  When omitted, leaves of
    ``like`` that are committed sharded ``jax.Array``\\ s contribute their
    own sharding; plain arrays restore to host numpy as before."""
    z = np.load(path, allow_pickle=False)
    index = json.loads(str(z["__index__"]))
    flat_like, treedef = _flatten_with_treedef(like)
    flat_sh = (
        [s for _, s in _flatten_with_treedef(shardings)[0]]
        if shardings is not None
        else [_leaf_sharding(leaf) for _, leaf in flat_like]
    )
    leaves = []
    for (key, leaf), sh in zip(flat_like, flat_sh):
        info = index.get(key)
        if info is None:
            raise KeyError(f"checkpoint missing key {key}")
        if info["sliced"]:
            arr = _merge_shards(z, key, tuple(info["global_shape"]))
        else:
            arr = z[key]
        arr = np.asarray(arr).astype(np.asarray(leaf).dtype)
        if sh is not None:
            leaves.append(jax.device_put(arr, sh))
        else:
            leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _leaf_sharding(leaf):
    """The sharding to restore onto, inferred from a template leaf:
    only committed, explicitly-sharded jax.Arrays opt in (a bare
    ``jnp.asarray`` template keeps the legacy host-restore behavior)."""
    if isinstance(leaf, jax.Array):
        try:
            sh = leaf.sharding
        except Exception:
            return None
        if isinstance(sh, jax.sharding.NamedSharding):
            return sh
    return None


def _flatten_with_treedef(tree):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in leaves:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )
        out.append((key, leaf))
    return out, treedef


def _merge_shards(z, key: str, global_shape):
    """Merge sliced-save shards of one array (the reference's
    ``merge_sliced_parameter`` equivalent, ``eval.py:84-105``)."""
    out = np.zeros(global_shape, dtype=None)
    initialized = False
    for name in z.files:
        if not name.startswith(f"{key}@@shard"):
            continue
        idx_str = name.split("@@shard", 1)[1]
        slices = _parse_index(idx_str, global_shape)
        data = z[name]
        if not initialized:
            out = np.zeros(global_shape, dtype=data.dtype)
            initialized = True
        out[slices] = data
    if not initialized:
        raise KeyError(f"no shards found for {key}")
    return out


def _parse_index(idx_str: str, global_shape):
    """Parse the string form of a shard index tuple, e.g.
    '(slice(0, 512, None), slice(None, None, None))'."""
    slices = []
    for m in re.finditer(r"slice\(([^)]*)\)", idx_str):
        parts = [p.strip() for p in m.group(1).split(",")]
        vals = [None if p == "None" else int(p) for p in parts]
        slices.append(slice(*vals))
    if not slices:
        return tuple(slice(None) for _ in global_shape)
    return tuple(slices)


def merge_sliced(paths: list[str], like):
    """Merge per-rank sliced checkpoints into one full state (reference
    strategy-ckpt merge at eval, ``eval.py:84-105``)."""
    zs = [np.load(p, allow_pickle=False) for p in paths]
    index = json.loads(str(zs[0]["__index__"]))
    flat_like, treedef = _flatten_with_treedef(like)
    leaves = []
    for key, leaf in flat_like:
        info = index[key]
        if info["sliced"]:
            out = None
            for z in zs:
                for name in z.files:
                    if name.startswith(f"{key}@@shard"):
                        data = z[name]
                        if out is None:
                            out = np.zeros(info["global_shape"], dtype=data.dtype)
                        out[_parse_index(name.split("@@shard", 1)[1], info["global_shape"])] = data
            leaves.append(jax.numpy.asarray(out))
        else:
            leaves.append(jax.numpy.asarray(zs[0][key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)

"""Hierarchical-cache training adapter (TB-scale embedding tables).

The reference's embedding-cache training mode (SURVEY §2.3/§3.3):
workers hold a ``vocab_cache_size``-row HBM cache of each table; misses
pull rows from host/parameter-server tiers (RAM cap + SSD spill), and
evicted dirty rows — **with their optimizer state** — flow back out
(control surface ``mindspore_rec/ops/embedding.py:163-182``; terabyte
scale knobs ``run_parameter_server_standalone_train_terabyte_scale_model.sh:35-42``).

TPU-native execution model:

* the model is built with ``vocab_size = cache_rows``; the jitted step
  trains on dense **slot** ids with fully static shapes;
* one C++ LRU (``native/cache.cc``) serves all tables sharing the id
  space (Criteo models: wide + deep see the same ids), emitting the
  batch's slot mapping plus padded load/evict lists;
* :meth:`apply_swap` is a single jitted device function that scatters
  loaded rows into each table's storage (and each optimizer-state
  arena) and gathers evicted rows out, `max_swap`-padded so the step
  never recompiles;
* evicted rows are written back to per-table tiers — host RAM/SSD
  (:class:`~mindrec_tpu.ops.cache.HostTier`) or remote table servers
  (:class:`~mindrec_tpu.ops.remote.RemoteTier`, the PS-server role) —
  param rows with N(0, 0.01) lazy init, FTRL ``accum`` with its 1.0
  init, everything else zero-init.

Per-step protocol (see :func:`cached_train_step`):

    prep   = adapter.prepare(batch)          # host: LRU + tier reads
    state  = adapter.apply_swap(state, prep) # device: swap in/out
    adapter.writeback(prep)                  # host: persist evicted
    batch  = adapter.transform(batch, prep)  # ids -> slots
    state, loss = step_fn(state, batch)      # the ordinary jitted step
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mindrec_tpu.ops.cache import HostTier, LruCache
from mindrec_tpu.train.step import is_wide_key


def _swap_storage(spec, storage, load_slots, load_rows, evict_slots):
    """Static-shape device swap on one table in its storage convention.

    ``load_rows [k, emb_dim]``; slot lists are padded with
    ``spec.dummy_id``.  Evicted rows are gathered BEFORE the load
    scatter so a slot recycled within one batch round-trips correctly.
    Returns (new_storage, evicted_rows [k, emb_dim]).
    """
    if spec.row_packed:
        # [rows, 128] packed storage: logical slot s lives at
        # (s // pack, lanes [(s % pack) * d, +d)).  Pad slots all target
        # the dummy row's window with zero rows — duplicate (row, lane)
        # scatter coordinates only ever repeat the dummy's zeros.
        p, d = spec.pack, spec.emb_dim
        lane0 = (evict_slots % p)[:, None] * d + jnp.arange(d)[None, :]
        evicted = storage[(evict_slots // p)[:, None], lane0]
        lane1 = (load_slots % p)[:, None] * d + jnp.arange(d)[None, :]
        new = storage.at[(load_slots // p)[:, None], lane1].set(
            load_rows.astype(storage.dtype)
        )
        return new, evicted
    if not spec.feature_major:
        evicted = storage[evict_slots]
        return storage.at[load_slots].set(load_rows), evicted
    r, d = spec.fold, spec.emb_dim
    if r == 1:
        evicted = storage[:d, evict_slots].T
        dp = storage.shape[0]
        rows_t = load_rows.T
        if dp > d:
            rows_t = jnp.concatenate(
                [rows_t, jnp.zeros((dp - d, rows_t.shape[1]), rows_t.dtype)]
            )
        return storage.at[:, load_slots].set(rows_t), evicted
    # folded scalar table (emb_dim == 1): element scatter/gather
    evicted = storage[evict_slots % r, evict_slots // r][:, None]
    new = storage.at[load_slots % r, load_slots // r].set(load_rows[:, 0])
    return new, evicted


class CachedTrainingAdapter:
    """Glue for cache-mode training of any model whose ``table_specs``
    tables share one id space.

    Parameters
    ----------
    model : a zoo model built with ``vocab_size = cache_rows``
    virtual_vocab : the full (possibly TB-scale) vocab size
    cache_rows : HBM-resident rows per table (reference
        ``vocab_cache_size``)
    max_swap : static per-step swap budget (pad target)
    ram_bytes / spill_dir : HostTier knobs (ignored with remote_addrs)
    remote_addrs : list of "host:port" table servers -> RemoteTier mode
    """

    FTRL_ACCUM_INIT = 1.0

    def __init__(self, model, virtual_vocab: int, cache_rows: int,
                 max_swap: int, ram_bytes: int | None = None,
                 spill_dir: str | None = None, remote_addrs=None,
                 seed: int = 0, io_workers: int | None = None):
        """``io_workers``: thread-pool width for the per-tier reads in
        :meth:`prepare` (2 tables x 3 tiers = 6 independent reads on the
        criteo models; they were serial through r4 — ~60 ms of the
        255 ms host chain at zipf 1.3).  None = one thread per tier."""
        self.model = model
        self.cache_rows = cache_rows
        self.max_swap = max_swap
        self.lru = LruCache(cache_rows)
        self._shadow: dict[int, int] = {}  # id -> slot (for flush_all)
        self.tables = {}  # name -> (path, spec)
        self.tiers = {}   # name -> {"param": tier, <state>: tier}
        for name, (path, spec) in model.table_specs.items():
            key = "/".join(map(str, path))
            wide = is_wide_key(key)
            states = ("accum", "linear") if wide else ("m", "v")
            self.tables[name] = (path, spec)
            self.tiers[name] = self._make_tiers(
                name, spec.emb_dim, states, virtual_vocab, ram_bytes,
                spill_dir, remote_addrs, seed,
            )
        self._swap_jit = jax.jit(self._swap_all)
        n_tiers = sum(len(t) for t in self.tiers.values())
        from concurrent.futures import ThreadPoolExecutor

        self._io = ThreadPoolExecutor(
            max_workers=io_workers or max(n_tiers, 1),
            thread_name_prefix="cache-io",
        )

    def _make_tiers(self, name, dim, states, vocab, ram_bytes, spill_dir,
                    remote_addrs, seed):
        def mk(table_name, std, bias):
            if remote_addrs:
                from mindrec_tpu.ops.remote import RemoteTier

                return RemoteTier(remote_addrs, table_name, dim,
                                  init_std=std, seed=seed, init_bias=bias)
            init = None
            if std == 0.0:
                init = lambda n, b=bias, d=dim: np.full((n, d), b, np.float32)
            return HostTier(vocab, dim, ram_bytes, spill_dir, init_fn=init,
                            seed=seed)

        tiers = {"param": mk(f"{name}", 0.01, 0.0)}
        for s in states:
            bias = self.FTRL_ACCUM_INIT if s == "accum" else 0.0
            tiers[s] = mk(f"{name}.{s}", 0.0, bias)
        return tiers

    # -- host side -----------------------------------------------------

    def prepare(self, batch: dict) -> dict:
        """LRU lookup + tier reads for this batch's ids (one host step)."""
        ids = np.asarray(batch["ids"], np.int64)
        slots, load_ids, load_slots, evict_ids, evict_slots = self.lru.lookup(
            ids.reshape(-1)
        )
        if (slots < 0).any():
            raise RuntimeError(
                "cache thrash: batch touches more distinct ids than cache_rows"
            )
        if load_ids.shape[0] > self.max_swap or evict_ids.shape[0] > self.max_swap:
            raise RuntimeError(
                f"swap overflow: load={load_ids.shape[0]} "
                f"evict={evict_ids.shape[0]} > max_swap={self.max_swap}"
            )
        # shape-bucketed swap: pad to the next power of two (floor 256)
        # instead of always max_swap — steady-state cache traffic is a
        # small fraction of the cold-start worst case, and the swap
        # buffers travel host->device every step, so moving max_swap
        # rows when 2k suffice wastes PCIe/HBM bandwidth.  The jitted
        # swap re-traces once per bucket (a handful over a run).
        n = max(load_ids.shape[0], evict_ids.shape[0], 1)
        k = min(self.max_swap, max(256, 1 << (n - 1).bit_length()))
        for i, s in zip(load_ids.tolist(), load_slots.tolist()):
            self._shadow[i] = s
        for i in evict_ids.tolist():
            self._shadow.pop(i, None)

        dummy = self.cache_rows  # == spec.dummy_id (vocab_size=cache_rows)

        def pad(a):
            out = np.full(k, dummy, np.int32)
            out[: a.shape[0]] = a
            return out

        def read_one(tier, d):
            r = np.zeros((k, d), np.float32)
            if load_ids.shape[0]:
                r[: load_ids.shape[0]] = tier.read(load_ids)
            return jnp.asarray(r)

        # the per-tier reads are independent (each tier owns its own
        # RAM/SSD state) — fan them out on the io pool
        futs = {
            name: {
                tname: self._io.submit(read_one, tier, tiers["param"].dim)
                for tname, tier in tiers.items()
            }
            for name, tiers in self.tiers.items()
        }
        load_rows = {
            name: {tname: f.result() for tname, f in per.items()}
            for name, per in futs.items()
        }
        return {
            "slots": slots.reshape(ids.shape).astype(np.int32),
            "load_slots": jnp.asarray(pad(load_slots)),
            "evict_slots": jnp.asarray(pad(evict_slots)),
            "load_rows": load_rows,
            "load_ids": load_ids,
            "evict_ids": evict_ids,
        }

    def transform(self, batch: dict, prep: dict) -> dict:
        out = dict(batch)
        out["ids"] = prep["slots"]
        return out

    def writeback(self, prep: dict) -> None:
        """Persist the evicted rows captured by :meth:`apply_swap`."""
        evict_ids = prep["evict_ids"]
        if evict_ids.shape[0] == 0:
            return
        n = evict_ids.shape[0]
        for name, per in prep["evicted"].items():
            for tname, rows in per.items():
                # slice ON DEVICE before fetching: only the n real
                # evicted rows cross the link, not the padded buffer
                self.tiers[name][tname].write(
                    evict_ids, np.asarray(rows[:n])
                )

    # -- device side ---------------------------------------------------

    def _swap_all(self, state, load_slots, evict_slots, load_rows):
        params = state.params
        opt_w = dict(state.opt_w)
        opt_d = dict(state.opt_d)
        evicted = {}
        for name, (path, spec) in self.tables.items():
            key = "/".join(map(str, path))
            per_out = {}
            node = _get(params, path)
            new, ev = _swap_storage(
                spec, node, load_slots, load_rows[name]["param"], evict_slots
            )
            params = _set(params, path, new)
            per_out["param"] = ev
            opt_state = opt_w if key in opt_w else opt_d
            st = dict(opt_state[key])
            for tname in self.tiers[name]:
                if tname == "param":
                    continue
                new_s, ev_s = _swap_storage(
                    spec, st[tname], load_slots, load_rows[name][tname],
                    evict_slots,
                )
                st[tname] = new_s
                per_out[tname] = ev_s
            opt_state[key] = st
            evicted[name] = per_out
        return state._replace(params=params, opt_w=opt_w, opt_d=opt_d), evicted

    def apply_swap(self, state, prep: dict):
        """Jitted device swap; stores evicted rows into ``prep``."""
        state, evicted = self._swap_jit(
            state, prep["load_slots"], prep["evict_slots"], prep["load_rows"]
        )
        prep["evicted"] = evicted
        return state

    # -- checkpoint ----------------------------------------------------

    def flush_all(self, state) -> None:
        """Write every resident row (params + opt state) to the tiers."""
        if not self._shadow:
            return
        ids = np.fromiter(self._shadow.keys(), np.int64)
        slots = np.fromiter(self._shadow.values(), np.int64)
        from mindrec_tpu.ops.embedding import read_rows

        for name, (path, spec) in self.tables.items():
            key = "/".join(map(str, path))
            node = _get(state.params, path)
            self.tiers[name]["param"].write(ids, read_rows(spec, node, slots))
            opt_state = state.opt_w if key in state.opt_w else state.opt_d
            for tname in self.tiers[name]:
                if tname == "param":
                    continue
                self.tiers[name][tname].write(
                    ids, read_rows(spec, opt_state[key][tname], slots)
                )
        for tiers in self.tiers.values():
            for t in tiers.values():
                t.flush()


def cached_train_step(adapter: CachedTrainingAdapter, step_fn, state, batch):
    """One cache-mode training step (see module docstring protocol)."""
    prep = adapter.prepare(batch)
    state = adapter.apply_swap(state, prep)
    adapter.writeback(prep)
    return step_fn(state, adapter.transform(batch, prep))


class AsyncCachedTrainer:
    """Pipelined cache-mode training: a dedicated host worker runs the
    serial LRU/tier chain (``writeback(b) -> prepare(b+1)``) while the
    main thread stages device swaps and dispatches train steps.

    The host operations execute in EXACTLY the serial protocol's order
    (prepare(1), writeback(1), prepare(2), ...) — only the device-side
    dispatch overlaps them — so results are bit-identical to driving
    :func:`cached_train_step` in a loop (tests/test_cached.py pins it).
    Through r4 the host chain (LRU lookup + tier IO + staging) and the
    device work took turns; this plus the threaded per-tier reads is
    the round-5 answer to "make the cache/TB host side concurrent".

    Usage::

        trainer = AsyncCachedTrainer(adapter, step_fn, state)
        for batch in data:
            losses = trainer.step(batch)   # returns PREVIOUS losses
        state = trainer.finish()
    """

    def __init__(self, adapter: CachedTrainingAdapter, step_fn, state):
        import queue
        import threading

        self.adapter = adapter
        self.step_fn = step_fn
        self.state = state
        self.losses = None
        # depth is fixed at 1: writeback(b) on the worker reads the
        # evicted-rows handles that apply_swap(b) on the MAIN thread
        # installs into prep — the 1-deep handoff guarantees the worker
        # only reaches writeback(b) after step(b+1) was fed, which
        # follows the main thread's apply_swap(b)
        self._in_q = queue.Queue(maxsize=1)
        self._out_q = queue.Queue(maxsize=1)
        self._err = None
        self._thread = threading.Thread(
            target=self._worker, name="cache-prep", daemon=True
        )
        self._thread.start()

    def _worker(self):
        prev_prep = None
        while True:
            item = self._in_q.get()
            if item is None:
                if prev_prep is not None:
                    try:
                        self.adapter.writeback(prev_prep)
                    except Exception as e:  # surfaced by finish()
                        self._err = e
                self._out_q.put(None)
                return
            batch = item
            try:
                if prev_prep is not None:
                    # blocks on the device swap that produced the
                    # evicted rows — i.e. overlaps step(b) on device
                    self.adapter.writeback(prev_prep)
                prep = self.adapter.prepare(batch)
            except Exception as e:
                self._err = e
                self._out_q.put(None)
                return
            prev_prep = prep
            self._out_q.put((batch, prep))

    def step(self, batch):
        """Feed one batch; runs the device work for the OLDEST prepared
        batch (None until the pipeline fills).  Returns that step's
        losses handle (device values, not fetched)."""
        self._in_q.put(batch)
        return self._drain_one()

    def _drain_one(self):
        item = self._out_q.get()
        if item is None:
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            return self.losses
        b, prep = item
        st = self.adapter.apply_swap(self.state, prep)
        st, losses = self.step_fn(st, self.adapter.transform(b, prep))
        self.state = st
        self.losses = losses
        return losses

    def finish(self):
        """Drain the pipeline; returns the final TrainState."""
        self._in_q.put(None)
        while True:
            item = self._out_q.get()
            if item is None:
                break
            b, prep = item
            st = self.adapter.apply_swap(self.state, prep)
            st, self.losses = self.step_fn(
                st, self.adapter.transform(b, prep)
            )
            self.state = st
        self._thread.join()
        if self._err is not None:
            raise self._err
        return self.state


def _get(params, path):
    node = params
    for p in path:
        node = node[p]
    return node


def _set(params, path, value):
    if not path:
        return value
    out = dict(params)
    out[path[0]] = _set(params[path[0]], path[1:], value)
    return out

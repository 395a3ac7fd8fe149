"""Dynamic (hash) embedding training adapter.

Ties the host hash store (MapParameter equivalent,
``native/hashstore.cc``) into the jitted training loop, reproducing the
reference's dynamic-embedding mode
(``models/wide_deep/src/wide_and_deep.py:221-229``: W&D built with
``HashEmbeddingLookup`` when ``dynamic_embedding=True``):

* the model is constructed with ``vocab_size = capacity`` and trains on
  dense *slot* ids — static shapes, zero graph changes;
* :meth:`transform_batch` maps raw (arbitrary int64) feature ids to
  slots on the host, applying admission (ids under the
  ``permit_filter_value`` threshold hit the dummy row) and advancing
  the eviction clock;
* :meth:`evict` erases expired keys and resets their arena + optimizer
  state rows to the initial distribution so recycled slots start fresh
  (the reference's known-risk eviction path, RELEASE.md:6);
* :meth:`export_tables` / :meth:`import_tables` give incremental
  (key-wise) checkpointing of live features (RELEASE.md:18).
"""

from __future__ import annotations

import numpy as np

from mindrec_tpu.native.hashstore import HashStore
from mindrec_tpu.ops.embedding import read_rows, write_rows


class DynamicEmbeddingAdapter:
    """One instance serves all tables that share the id space (the
    criteo models' wide+deep tables share ids)."""

    def __init__(
        self,
        capacity: int,
        permit_filter_value: int = 1,
        evict_filter_value: int = 0x7FFFFFFF,
        seed: int = 0,
        store=None,
        remote_addrs=None,
        table_name: str = "dyn",
    ):
        """``remote_addrs`` (list of "host:port" table servers) switches
        the id->slot map to the DISTRIBUTED hash store sharded across the
        servers (reference: MapParameter lives in the PS,
        ``mindspore_rec/ops/embedding.py:163-182``) — every data-parallel
        worker then sees one consistent mapping.  ``store`` injects any
        HashStore-compatible object directly."""
        if permit_filter_value < 1 or evict_filter_value < 1:
            raise ValueError("filter thresholds must be >= 1")
        self.capacity = capacity
        if store is not None:
            self.store = store
        elif remote_addrs:
            from mindrec_tpu.ops.remote import RemoteHashStore

            self.store = RemoteHashStore(
                remote_addrs, table_name, capacity,
                permit_threshold=permit_filter_value,
                evict_threshold=evict_filter_value,
            )
        else:
            self.store = HashStore(
                capacity=capacity,
                permit_threshold=permit_filter_value,
                evict_threshold=evict_filter_value,
            )
        self.dummy_slot = capacity  # model built with vocab_size=capacity
        self._rng = np.random.default_rng(seed)

    # -- hot path ------------------------------------------------------

    def transform_batch(self, batch: dict) -> dict:
        """Raw ids -> arena slots (host side, one step of the clock)."""
        ids = np.asarray(batch["ids"])
        slots = self.store.lookup_or_insert(ids.reshape(-1))
        slots = np.where(slots < 0, self.dummy_slot, slots)
        out = dict(batch)
        out["ids"] = slots.reshape(ids.shape).astype(np.int32)
        return out

    def evict(self, state, tables) -> tuple:
        """Erase expired keys; reset freed arena rows (params re-init,
        optimizer state zeroed).  Returns (state, n_evicted).

        ``tables``: the model's ``table_specs`` dict
        (``{name: (path, EmbeddingTableSpec)}``) or a list of
        ``(path, spec)`` pairs — the spec carries the storage convention
        (feature-major / fold) of each table.
        """
        tables = _norm_tables(tables)
        freed = self.store.evict()
        if freed.size == 0:
            return state, 0
        params = state.params
        opt_w = dict(state.opt_w)
        opt_d = dict(state.opt_d)
        for path, spec in tables:
            key = "/".join(map(str, path))
            node = _get(params, path)
            fresh = self._rng.normal(0, 0.01, (freed.size, spec.emb_dim)).astype(np.float32)
            params = _set(params, path, write_rows(spec, node, freed, fresh))
            zeros = np.zeros((freed.size, spec.emb_dim), np.float32)
            for opt_state in (opt_w, opt_d):
                if key in opt_state:
                    opt_state[key] = {
                        k: (write_rows(spec, v, freed, zeros)
                            if getattr(v, "shape", None) == node.shape else v)
                        for k, v in opt_state[key].items()
                    }
        return state._replace(params=params, opt_w=opt_w, opt_d=opt_d), freed.size

    # -- incremental checkpoint ---------------------------------------

    def export_tables(self, params, tables) -> dict:
        """{path_str: rows [n_live, emb_dim]} for all admitted keys."""
        tables = _norm_tables(tables)
        keys, slots = self.store.items()
        out = {"__keys__": keys}
        for path, spec in tables:
            out["/".join(map(str, path))] = read_rows(spec, _get(params, path), slots)
        return out

    def import_tables(self, params, blob: dict, tables):
        tables = _norm_tables(tables)
        keys = blob["__keys__"]
        slots = self.store.lookup_or_insert(keys, force=True)
        ok = slots >= 0
        for path, spec in tables:
            key = "/".join(map(str, path))
            node = _get(params, path)
            params = _set(
                params, path, write_rows(spec, node, slots[ok], blob[key][ok])
            )
        return params


def _norm_tables(tables):
    if isinstance(tables, dict):
        return list(tables.values())
    return list(tables)


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

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
import jax
import jax.numpy as jnp

from mindrec_tpu.native.hashstore import HashStore


class DynamicEmbeddingAdapter:
    """One instance serves all tables that share the id space (the
    criteo models' wide+deep tables share ids)."""

    def __init__(
        self,
        capacity: int,
        permit_filter_value: int = 1,
        evict_filter_value: int = 0x7FFFFFFF,
        seed: int = 0,
    ):
        if permit_filter_value < 1 or evict_filter_value < 1:
            raise ValueError("filter thresholds must be >= 1")
        self.capacity = capacity
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

    def evict(self, state, table_paths: list[tuple]) -> tuple:
        """Erase expired keys; reset freed arena rows (params re-init,
        optimizer state zeroed).  Returns (state, n_evicted)."""
        freed = self.store.evict()
        if freed.size == 0:
            return state, 0
        freed_j = jnp.asarray(freed.astype(np.int32))
        params = _deep_mutate(state.params, table_paths, freed_j, self._rng)
        opt_w = {k: (_reset_state_rows(v, freed_j) if _is_table_key(k, table_paths) else v)
                 for k, v in state.opt_w.items()}
        opt_d = {k: (_reset_state_rows(v, freed_j) if _is_table_key(k, table_paths) else v)
                 for k, v in state.opt_d.items()}
        return state._replace(params=params, opt_w=opt_w, opt_d=opt_d), freed.size

    # -- incremental checkpoint ---------------------------------------

    def export_tables(self, params, table_paths: list[tuple]) -> dict:
        """{path_str: (keys, rows)} for all live (admitted) features."""
        keys, slots = self.store.items()
        out = {"__keys__": keys}
        for path in table_paths:
            node = params
            for p in path:
                node = node[p]
            out["/".join(map(str, path))] = np.asarray(node)[slots]
        return out

    def import_tables(self, params, blob: dict, table_paths: list[tuple]):
        keys = blob["__keys__"]
        slots = self.store.lookup_or_insert(keys, force=True)
        ok = slots >= 0
        sj = jnp.asarray(slots[ok].astype(np.int32))
        for path in table_paths:
            node = params
            for p in path[:-1]:
                node = node[p]
            key = "/".join(map(str, path))
            rows = jnp.asarray(blob[key][ok])
            node[path[-1]] = node[path[-1]].at[sj].set(rows)
        return params


def _is_table_key(key: str, table_paths) -> bool:
    return any(key == "/".join(map(str, p)) for p in table_paths)


def _reset_state_rows(leaf_state, freed_j):
    def reset(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] > int(freed_j.max() if freed_j.size else -1):
            return x.at[freed_j].set(0.0)
        return x

    return jax.tree.map(reset, leaf_state)


def _deep_mutate(params, table_paths, freed_j, rng):
    """Functionally reset table rows at freed slots."""

    def visit(node, path_rest):
        if not path_rest:
            fresh = jnp.asarray(
                rng.normal(0, 0.01, (freed_j.shape[0], node.shape[1])).astype(np.float32)
            )
            return node.at[freed_j].set(fresh)
        head = path_rest[0]
        out = dict(node)
        out[head] = visit(node[head], path_rest[1:])
        return out

    for path in table_paths:
        params = visit(params, list(path))
    return params

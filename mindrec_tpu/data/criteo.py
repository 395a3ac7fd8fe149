"""Criteo-style CTR datasets: packed records, sharding, synthetic data.

Mirrors the reference dataset behavior
(``models/wide_deep/src/datasets.py``):

* records are packed **1000 samples per row** on disk and a batch of
  ``batch_size`` is assembled from ``batch_size / line_per_sample``
  packed rows (``datasets.py:262,320``) — large sequential IO instead
  of per-sample reads;
* shard by ``(num_shards, shard_id)`` for data parallelism
  (``datasets.py:245-254,304-312``);
* three on-disk formats in the reference (mindrecord/tfrecord/h5); here
  the native format is sharded ``.npz`` with the same packed layout,
  plus a synthetic generator for tests/benchmarks.

Batch layout produced: ``{"ids": [B,F] int32, "wts": [B,F] f32,
"label": [B,1] f32}``.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from pathlib import Path
from typing import Iterator

import numpy as np


# Criteo-Kaggle categorical cardinalities (C1..C26) — the published
# per-field vocab sizes of the reference's benchmark dataset family
# (same list the DLRM/criteo literature uses).  Used to synthesize
# field-realistic id traffic: the reference's throughput numbers were
# measured on real criteo data whose fields span 4 orders of magnitude
# in cardinality (benchmarks/README.md:27: criteo 1-day, vocab 5.86M).
CRITEO_KAGGLE_CAT_CARDINALITIES = (
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18,
    15, 286181, 105, 142572,
)
N_DENSE_FIELDS = 13  # int columns, bucketized into small id ranges


def criteo_field_sizes(vocab_size: int, field_size: int = 39) -> np.ndarray:
    """Per-field id-range sizes proportional to the real criteo schema,
    scaled so they sum to ``vocab_size``.  Fields beyond the 39-column
    criteo layout cycle through the categorical list."""
    dense = [64.0] * min(N_DENSE_FIELDS, field_size)
    n_cat = field_size - len(dense)
    cats = [
        float(CRITEO_KAGGLE_CAT_CARDINALITIES[i % 26]) for i in range(n_cat)
    ]
    base = np.array(dense + cats, np.float64)
    small = base < 10000
    fixed = base[small].sum()
    scale = max(vocab_size - fixed, 1) / max(base[~small].sum(), 1)
    sizes = np.where(small, base, np.maximum(base * scale, 4.0)).astype(np.int64)
    # exact sum: dump the rounding remainder into the largest field
    sizes[np.argmax(sizes)] += vocab_size - sizes.sum()
    return np.maximum(sizes, 1)


class SyntheticCriteo:
    """Synthetic criteo-like stream with a power-law id distribution.

    The skewed (zipf-ish) id distribution matters: it exercises the
    duplicate-heavy unique path and cache hit behavior like real criteo
    traffic (reference's scaling axis, SURVEY §2.5).

    ``fields="uniform"`` gives every field an equal vocab slice;
    ``fields="criteo"`` sizes the 39 field ranges like the real criteo
    schema (13 small bucketized dense columns + 26 categoricals whose
    cardinalities span 3 to ~10M), which is what the reference's
    benchmark numbers were actually measured on.
    """

    def __init__(
        self,
        batch_size: int,
        field_size: int = 39,
        vocab_size: int = 200000,
        steps: int = 100,
        seed: int = 0,
        zipf_a: float = 1.1,
        label_noise: float = 0.25,
        model_seed: int = 777,
        fields: str = "uniform",
    ):
        self.batch_size = batch_size
        self.field_size = field_size
        self.vocab_size = vocab_size
        self.steps = steps
        self.seed = seed
        self.zipf_a = zipf_a
        self.label_noise = label_noise
        if fields == "criteo":
            sizes = criteo_field_sizes(vocab_size, field_size)
        elif fields == "uniform":
            per_field = max(vocab_size // field_size, 1)
            sizes = np.full(field_size, per_field, np.int64)
        else:
            raise ValueError(f"fields must be uniform|criteo, got {fields}")
        self._field_sizes = sizes
        self._field_offsets = np.concatenate(
            [[0], np.cumsum(sizes)[:-1]]
        ).astype(np.int64)
        # hidden linear model so AUC is learnable; seeded independently of
        # `seed` so train/eval streams share one ground-truth model
        rng = np.random.default_rng(model_seed)
        self._hidden_w = rng.normal(0, 1.0, size=vocab_size).astype(np.float32)

    def __len__(self):
        return self.steps

    def get_batch(self, step: int) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed + step)
        b, f = self.batch_size, self.field_size
        raw = rng.zipf(self.zipf_a, size=(b, f)).astype(np.int64)
        ids = (raw % self._field_sizes[None, :]) + self._field_offsets[None, :]
        ids = (ids % self.vocab_size).astype(np.int32)
        wts = np.ones((b, f), np.float32)
        logit = self._hidden_w[ids].mean(axis=1) * 3.0
        p = 1.0 / (1.0 + np.exp(-logit))
        noise = rng.uniform(size=b)
        label = ((1 - self.label_noise) * p + self.label_noise * noise > 0.5).astype(
            np.float32
        )[:, None]
        return {"ids": ids, "wts": wts, "label": label}

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        for s in range(self.steps):
            yield self.get_batch(s)


# ---------------------------------------------------------------------------
# packed on-disk format (.npz shards, 1000-sample packing parity)
# ---------------------------------------------------------------------------

LINE_PER_SAMPLE = 1000  # reference packing factor (datasets.py:262)


def write_packed_shards(
    out_dir: str | os.PathLike,
    batches: Iterator[dict[str, np.ndarray]],
    rows_per_shard: int = 256,
    line_per_sample: int = LINE_PER_SAMPLE,
):
    """Pack a sample stream into sharded npz files with
    ``line_per_sample`` samples per packed row."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    buf_ids, buf_wts, buf_lab = [], [], []
    shard_idx = 0
    rows: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def flush_shard():
        nonlocal shard_idx, rows
        if not rows:
            return
        ids = np.stack([r[0] for r in rows])
        wts = np.stack([r[1] for r in rows])
        lab = np.stack([r[2] for r in rows])
        np.savez(out / f"part-{shard_idx:05d}.npz", ids=ids, wts=wts, label=lab)
        shard_idx += 1
        rows = []

    for batch in batches:
        n = batch["ids"].shape[0]
        for i in range(n):
            buf_ids.append(batch["ids"][i])
            buf_wts.append(batch["wts"][i])
            buf_lab.append(batch["label"][i])
            if len(buf_ids) == line_per_sample:
                rows.append(
                    (
                        np.stack(buf_ids),
                        np.stack(buf_wts),
                        np.stack(buf_lab),
                    )
                )
                buf_ids, buf_wts, buf_lab = [], [], []
                if len(rows) == rows_per_shard:
                    flush_shard()
    flush_shard()
    return shard_idx


class PackedCriteoDataset:
    """Reader over packed npz shards with reference batching semantics:
    a batch of B samples = B / line_per_sample packed rows
    (``datasets.py:262,320``), sharded by (num_shards, shard_id)."""

    def __init__(
        self,
        data_dir: str | os.PathLike,
        batch_size: int,
        num_shards: int = 1,
        shard_id: int = 0,
        line_per_sample: int = LINE_PER_SAMPLE,
        drop_remainder: bool = True,
    ):
        if batch_size % line_per_sample != 0:
            raise ValueError(
                f"batch_size ({batch_size}) must be a multiple of "
                f"line_per_sample ({line_per_sample})"
            )
        self.files = sorted(Path(data_dir).glob("part-*.npz"))
        if not self.files:
            raise FileNotFoundError(f"no part-*.npz under {data_dir}")
        self.batch_size = batch_size
        self.rows_per_batch = batch_size // line_per_sample
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.line_per_sample = line_per_sample
        self.drop_remainder = drop_remainder

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        pend_i, pend_w, pend_l = [], [], []
        for fi, f in enumerate(self.files):
            if fi % self.num_shards != self.shard_id:
                continue
            z = np.load(f)
            ids, wts, lab = z["ids"], z["wts"], z["label"]
            for r in range(ids.shape[0]):
                pend_i.append(ids[r])
                pend_w.append(wts[r])
                pend_l.append(lab[r])
                if len(pend_i) == self.rows_per_batch:
                    yield self._assemble(pend_i, pend_w, pend_l)
                    pend_i, pend_w, pend_l = [], [], []
        if pend_i and not self.drop_remainder:
            yield self._assemble(pend_i, pend_w, pend_l)

    def _assemble(self, pi, pw, pl):
        ids = np.concatenate(pi, axis=0).astype(np.int32)
        wts = np.concatenate(pw, axis=0).astype(np.float32)
        lab = np.concatenate(pl, axis=0).reshape(-1, 1).astype(np.float32)
        return {"ids": ids, "wts": wts, "label": lab}


class PrefetchToDevice:
    """Async host->device prefetch (the reference's *dataset sink / device
    queue* equivalent, ``rec_model.py:124-131``): a background thread
    stages the next batches on device while the current step runs."""

    def __init__(self, it, depth: int = 2, sharding=None):
        import jax

        self._jax = jax
        self.it = iter(it)
        self.depth = depth
        self.sharding = sharding
        self.q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, batch):
        jax = self._jax
        if self.sharding is not None:
            return {
                k: jax.device_put(v, self.sharding[k] if isinstance(self.sharding, dict) else self.sharding)
                for k, v in batch.items()
            }
        return {k: jax.device_put(v) for k, v in batch.items()}

    def _worker(self):
        try:
            for batch in self.it:
                self.q.put(self._put(batch))
        finally:
            self.q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            raise StopIteration
        return item

"""The composed online-learning story under EVICTION (VERDICT r3 item
6): Kafka-stub stream -> dynamic-hash admission -> online training with
periodic eviction -> incremental hash-table export -> serving reload —
all in one run.

Reference axis: online learning (``README.md:207-246``) + MapParameter
admission/eviction (``mindspore_rec/ops/embedding.py:136-144``) +
incremental import/export (``RELEASE.md:18``).  Eviction DURING
training is the reference's known-risk path (cache-eviction core-dump
fix, ``RELEASE.md:6``) — here it must keep the stream training, reset
freed rows, and leave the exported table loadable by a fresh serving
process.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


@pytest.fixture(autouse=True)
def _force_wire_fallback(monkeypatch):
    monkeypatch.setitem(sys.modules, "kafka", None)
    monkeypatch.setitem(sys.modules, "kafka.admin", None)


from mindrec_tpu import RecModel  # noqa: E402
from mindrec_tpu.data.kafka_stub import StubKafkaBroker  # noqa: E402
from mindrec_tpu.data.kafka_wire import MiniKafkaProducer  # noqa: E402
from mindrec_tpu.data.streaming import KafkaSource, create_topic  # noqa: E402
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel  # noqa: E402
from mindrec_tpu.train import optim  # noqa: E402
from mindrec_tpu.train.callbacks import Callback, EvictionCallback  # noqa: E402
from mindrec_tpu.train.dynamic import DynamicEmbeddingAdapter  # noqa: E402

CAP = 512
B, F = 16, 4
CFG = WideDeepConfig(
    batch_size=B, field_size=F, vocab_size=CAP, emb_dim=8,
    deep_layer_dim=(16,), use_mixed_precision=False, sparse=True,
    dynamic_embedding=True, loss_scale=1.0,
)


def _phase_ids(rng, phase: int, first_step: bool):
    """Raw int64 ids from a per-phase window: early-phase ids go idle
    later and must be EVICTED; the window repeats across the phase's
    steps so the admission threshold (2) is clearable.  On the phase's
    FIRST step one singleton id appears (once ever) — it must never be
    admitted."""
    base = 10**12 + phase * 10**6
    ids = base + np.random.default_rng(phase).integers(0, 40, size=(B, F))
    ids[0, :] = base + rng.integers(0, 40, size=F)  # fresh row each step
    if first_step:
        ids[0, 0] = base + 999_999  # singleton (seen in 1 step only)
    return ids


def test_kafka_eviction_export_reload(tmp_path):
    steps = 12
    rng = np.random.default_rng(0)
    with StubKafkaBroker() as bootstrap:
        create_topic("dyn_stream", num_partitions=1,
                     bootstrap_servers=bootstrap)
        prod = MiniKafkaProducer(bootstrap)
        for s in range(steps):
            phase = s // 4  # ids rotate every 4 steps
            ids = _phase_ids(rng, phase, first_step=(s % 4 == 0))
            msg = {
                "ids": ids.tolist(),
                "label": rng.integers(0, 2, (B, 1)).tolist(),
            }
            prod.send("dyn_stream", json.dumps(msg).encode(), partition=0)
        prod.flush()

        adapter = DynamicEmbeddingAdapter(
            capacity=CAP, permit_filter_value=2, evict_filter_value=3,
        )
        model = RecModel(
            WideDeepModel(CFG),
            optim.ftrl(loss_scale=1.0),
            optim.lazy_adam(loss_scale=1.0),
        )
        tables = model.model.table_specs
        export_path = tmp_path / "incremental.npz"
        ev = EvictionCallback(
            adapter, tables, every_steps=4, export_path=export_path
        )
        losses = []

        class Rec(Callback):
            def on_train_step_end(self, ctx):
                losses.append(float(ctx.net_outputs[1]))

        src = KafkaSource(
            "dyn_stream", [0], bootstrap_servers=bootstrap, count=1,
            idle_timeout_ms=500, auto_offset_reset="earliest",
        )

        def batches():
            seen = 0
            for msgs in src:
                for m in msgs:
                    d = json.loads(m)
                    raw = {
                        "ids": np.asarray(d["ids"], np.int64),
                        "wts": np.ones((B, F), np.float32),
                        "label": np.asarray(d["label"], np.float32),
                    }
                    yield adapter.transform_batch(raw)
                    seen += 1
                if seen >= steps:
                    return

        model.online_train(batches(), callbacks=[ev, Rec()])

    assert len(losses) == steps and all(np.isfinite(l) for l in losses)
    # eviction really fired mid-stream (phase-0 ids idle >= 3 steps by
    # the step-8 eviction point) and training continued after it
    assert ev.evicted_total > 0, "no keys were evicted"
    assert ev.exports >= 1 and export_path.exists()

    blob = dict(np.load(export_path))
    live_keys = blob["__keys__"]
    assert live_keys.size > 0
    # admission: the per-phase singleton ids (seen in one step only,
    # permit threshold 2) were never admitted
    singles = {10**12 + p * 10**6 + 999_999 for p in range(3)}
    assert not (set(live_keys.tolist()) & singles)

    # --- serving reload: fresh process = fresh store + fresh arenas ---
    serve_adapter = DynamicEmbeddingAdapter(capacity=CAP)
    params_srv = model.state.params
    for name, (path, spec) in tables.items():
        node = params_srv
        for h in path[:-1]:
            node = node[h]
        import jax.numpy as jnp

        def set_path(tree, path, val):
            if len(path) == 1:
                out = dict(tree)
                out[path[0]] = val
                return out
            out = dict(tree)
            out[path[0]] = set_path(tree[path[0]], path[1:], val)
            return out

        params_srv = set_path(
            params_srv, list(path), jnp.zeros_like(node[path[-1]])
        )
    params_srv = serve_adapter.import_tables(params_srv, blob, tables)

    # predictions for live keys must match the trainer bit-for-bit:
    # same dense params, table rows restored through the export under a
    # DIFFERENT slot permutation
    serve_ids = np.asarray(live_keys)[
        np.random.default_rng(1).integers(0, live_keys.size, (B, F))
    ]
    wts = np.ones((B, F), np.float32)
    slots_train = adapter.transform_batch(
        {"ids": serve_ids, "wts": wts, "label": np.zeros((B, 1), np.float32)}
    )
    slots_srv = serve_adapter.transform_batch(
        {"ids": serve_ids, "wts": wts, "label": np.zeros((B, 1), np.float32)}
    )
    p_train = np.asarray(
        model.model.predict(model.state.params, slots_train["ids"], wts)
    )
    p_srv = np.asarray(
        model.model.predict(params_srv, slots_srv["ids"], wts)
    )
    np.testing.assert_allclose(p_srv, p_train, rtol=1e-6, atol=1e-7)

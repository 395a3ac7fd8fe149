"""Kafka surface, exercised END-TO-END against the in-repo
wire-protocol stub broker (VERDICT r2 item 8): producer (the
examples/kafka_producer.py path) -> StubKafkaBroker -> KafkaSource ->
CriteoFeatureEngineer -> RecModel.online_train.

Reference pipeline: ``examples/online_learning/producer.py:35-78`` ->
Kafka -> ``read_kafka.py:5-41`` -> ``consumer.py:9-31``."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


@pytest.fixture(autouse=True)
def _force_wire_fallback(monkeypatch):
    """Deterministically exercise the in-repo wire clients: the stub
    broker speaks only the v0 subset (no ApiVersions handshake), so
    kafka-python — when installed — must not be auto-selected here."""
    monkeypatch.setitem(sys.modules, "kafka", None)
    monkeypatch.setitem(sys.modules, "kafka.admin", None)

from mindrec_tpu.data.kafka_stub import StubKafkaBroker
from mindrec_tpu.data.kafka_wire import (
    MiniKafkaClient,
    MiniKafkaConsumer,
    MiniKafkaProducer,
    decode_message_set,
    encode_message_set,
)
from mindrec_tpu.data.streaming import KafkaSource, create_topic
from mindrec_tpu.data.preprocess import N_CAT, N_DENSE, collect_stats


def test_message_set_roundtrip_and_crc():
    vals = [b"a", b"hello world", b"", b"x" * 1000]
    data = encode_message_set(vals, base_offset=7)
    got = decode_message_set(data)
    assert [v for _, v in got] == vals
    assert [o for o, _ in got] == [7, 8, 9, 10]
    # corrupt one payload byte -> CRC failure
    bad = bytearray(data)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_message_set(bytes(bad))
    # truncated tail is dropped, earlier messages survive
    assert [v for _, v in decode_message_set(data[:-3])] == vals[:-1]


def test_wire_client_against_stub():
    with StubKafkaBroker() as bootstrap:
        c = MiniKafkaClient(bootstrap)
        assert c.create_topic("t", num_partitions=2) == 0
        assert c.create_topic("t", num_partitions=2) == 36  # exists
        md = c.metadata(["t"])
        assert md["t"]["error"] == 0
        assert set(md["t"]["partitions"]) == {0, 1}
        off0 = c.produce("t", 0, [b"m0", b"m1"])
        off1 = c.produce("t", 0, [b"m2"])
        assert (off0, off1) == (0, 2)
        hw, recs = c.fetch("t", 0, 0)
        assert hw == 3 and [v for _, v in recs] == [b"m0", b"m1", b"m2"]
        hw, recs = c.fetch("t", 0, 2)
        assert [v for _, v in recs] == [b"m2"]
        c.close()


def test_producer_consumer_roundtrip():
    with StubKafkaBroker() as bootstrap:
        create_topic("rt", num_partitions=2, bootstrap_servers=bootstrap)
        prod = MiniKafkaProducer(
            bootstrap_servers=bootstrap,
            value_serializer=lambda v: json.dumps(v).encode(),
        )
        for p in range(2):
            for i in range(5):
                prod.send("rt", value={"p": p, "i": i}, partition=p)
        prod.flush()
        prod.close()
        cons = MiniKafkaConsumer(bootstrap_servers=bootstrap,
                                 consumer_timeout_ms=500,
                                 auto_offset_reset="earliest")
        cons.assign([("rt", 0), ("rt", 1)])
        got = [json.loads(r.value) for r in cons]
        cons.close()
        assert len(got) == 10
        assert {(g["p"], g["i"]) for g in got} == {
            (p, i) for p in range(2) for i in range(5)
        }


def _criteo_row(rng):
    label = int(rng.uniform() > 0.7)
    dense = [str(int(rng.integers(0, 50))) for _ in range(N_DENSE)]
    cats = [f"v{int(rng.integers(0, 4))}" for _ in range(N_CAT)]
    return "\t".join([str(label)] + dense + cats)


def test_kafka_online_train_end_to_end(tmp_path):
    """The full reference online-learning chain over real sockets:
    kafka_producer.produce (2 partitions) -> stub broker -> KafkaSource
    -> CriteoFeatureEngineer -> RecModel.online_train."""
    from kafka_producer import produce  # examples/, mini-client fallback

    from mindrec_tpu import RecModel
    from mindrec_tpu.data.streaming import CriteoFeatureEngineer
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

    rng = np.random.default_rng(0)
    rows = [_criteo_row(rng) for _ in range(64)]
    # repeat rows so every cat value clears the count>6 threshold
    tsv = tmp_path / "day0.tsv"
    tsv.write_text("\n".join(rows * 3) + "\n")
    stats = collect_stats([str(tsv)], workers=1)

    with StubKafkaBroker() as bootstrap:
        create_topic("criteo_stream", num_partitions=2,
                     bootstrap_servers=bootstrap)
        for part in range(2):
            produce(str(tsv), "criteo_stream", part, 2, bootstrap,
                    rows_per_msg=16)
        fe = CriteoFeatureEngineer(stats)
        src = KafkaSource("criteo_stream", [0, 1],
                          bootstrap_servers=bootstrap, count=2,
                          idle_timeout_ms=500,
                          auto_offset_reset="earliest")

        def batches():
            for msgs in src:
                rows = [r for m in msgs for r in json.loads(m)]
                yield fe(rows)

        cfg = WideDeepConfig(
            batch_size=32, field_size=N_DENSE + N_CAT,
            vocab_size=stats.vocab_size, emb_dim=4, deep_layer_dim=(8,),
            use_mixed_precision=False, loss_scale=1.0,
        )
        rm = RecModel(WideDeepModel(cfg))
        losses = []

        from mindrec_tpu.train.callbacks import Callback

        class Rec(Callback):
            def on_train_step_end(self, ctx):
                losses.append(float(ctx.net_outputs[1]))

        rm.online_train(batches(), callbacks=[Rec()])
    # 192 rows over 2 partitions = 12 msgs of 16 rows; KafkaSource
    # yields every 2 msgs -> 6 batches of 32 rows
    assert len(losses) == 6
    assert all(np.isfinite(l) for l in losses)

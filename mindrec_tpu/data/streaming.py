"""Online-learning streaming pipeline.

Re-designs the reference's Kafka -> MindPandas-channel -> GeneratorDataset
chain (``examples/online_learning/``, SURVEY §2.4/§3.2) with
framework-native pieces:

* :class:`Channel` / :class:`DataSender` / :class:`DataReceiver` — an
  in-process (or multiprocess via ``multiprocessing.Queue``) sharded
  channel replacing the MindPandas distributed channel
  (``consumer.py:56-83``: sender shards frames by device count,
  receiver pulls its shard).
* :class:`StreamingDataset` — adapter exposing a receiver as an
  unbounded batch iterator (reference ``StreamingDataset`` with fake
  ``len = 2**20 - 1``, ``online_train.py:30-45``).
* :class:`KafkaSource` — optional Kafka consumer (gated import; the
  reference's ``read_kafka.py`` yields frames every ``count`` msgs).
* :class:`CriteoFeatureEngineer` — per-row min-max scale + cat2id with
  OOV, the reference consumer's ``get_weight``/``get_id``
  (``consumer.py:9-31``).
"""

from __future__ import annotations

import queue as queue_mod
import threading
from typing import Iterator, Optional

import numpy as np


class Channel:
    """N-shard in-process channel (MindPandas ``channel`` equivalent)."""

    def __init__(self, num_shards: int = 1, capacity: int = 64):
        self.num_shards = num_shards
        self.queues = [queue_mod.Queue(maxsize=capacity) for _ in range(num_shards)]

    def sender(self) -> "DataSender":
        return DataSender(self)

    def receiver(self, shard_id: int) -> "DataReceiver":
        return DataReceiver(self, shard_id)


class DataSender:
    """Sends batches round-robin (or explicitly) to channel shards
    (reference ``DataSender.send`` sharded by device count)."""

    def __init__(self, channel: Channel):
        self.channel = channel
        self._rr = 0

    def send(self, item, shard_id: Optional[int] = None):
        if shard_id is None:
            shard_id = self._rr % self.channel.num_shards
            self._rr += 1
        self.channel.queues[shard_id].put(item)

    def close(self):
        for q in self.channel.queues:
            q.put(_EOS)


_EOS = object()


class DataReceiver:
    """Receives this shard's stream (reference ``DataReceiver.recv``)."""

    def __init__(self, channel: Channel, shard_id: int):
        self.channel = channel
        self.shard_id = shard_id

    def recv(self, timeout: Optional[float] = None):
        item = self.channel.queues[self.shard_id].get(timeout=timeout)
        if item is _EOS:
            raise StopIteration
        return item


class StreamingDataset:
    """Unbounded dataset over a receiver (reference ``StreamingDataset``,
    ``online_train.py:30-45``: fake huge len, per-item recv)."""

    FAKE_LEN = 2**20 - 1  # reference parity

    def __init__(self, receiver: DataReceiver):
        self.receiver = receiver

    def __len__(self):
        return self.FAKE_LEN

    def __iter__(self) -> Iterator:
        while True:
            try:
                yield self.receiver.recv()
            except StopIteration:
                return
            except queue_mod.Empty:
                return


class CriteoFeatureEngineer:
    """Streaming feature engineering (reference consumer ``get_weight`` /
    ``get_id``, ``examples/online_learning/consumer.py:9-31``): min-max
    scale the 13 dense columns, map the 26 categorical columns through
    cat2id with per-column OOV buckets."""

    def __init__(self, stats):
        # stats: mindrec_tpu.data.preprocess.CriteoStats
        self.stats = stats

    def __call__(self, raw_rows: list[list[str]]) -> dict[str, np.ndarray]:
        from mindrec_tpu.data.preprocess import transform_rows

        lines = ["\t".join(r) for r in raw_rows]
        ids, wts, labels = [], [], []
        for i, w, l in transform_rows(iter(lines), self.stats):
            ids.append(i)
            wts.append(w)
            labels.append(l)
        return {
            "ids": np.stack(ids).astype(np.int32),
            "wts": np.stack(wts).astype(np.float32),
            "label": np.array(labels, np.float32)[:, None],
        }


def create_topic(topic: str, num_partitions: int = 2,
                 bootstrap_servers: str = "localhost:9092",
                 replication_factor: int = 1):
    """Create a Kafka topic (reference admin helper,
    ``examples/online_learning/kafka_client.py:1-10``).  Gated on
    kafka-python being installed."""
    try:
        from kafka.admin import KafkaAdminClient, NewTopic  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("kafka-python is required for create_topic") from e
    admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
    admin.create_topics(
        [NewTopic(name=topic, num_partitions=num_partitions,
                  replication_factor=replication_factor)]
    )
    admin.close()


class KafkaSource:
    """Kafka topic-partition reader (reference ``read_kafka.py:5-41``):
    yields lists of messages, one list per ``count`` consumed.  Gated on
    kafka-python being installed."""

    def __init__(self, topic: str, partitions, bootstrap_servers="localhost:9092", count: int = 1000):
        try:
            from kafka import KafkaConsumer, TopicPartition  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "kafka-python is required for KafkaSource; install it or "
                "use Channel/DataSender for in-process streaming"
            ) from e
        self._consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)
        self._consumer.assign(
            [TopicPartition(topic, p) for p in partitions]
        )
        self.count = count

    def __iter__(self):
        buf = []
        for msg in self._consumer:
            buf.append(msg.value)
            if len(buf) >= self.count:
                yield buf
                buf = []


def feed_channel_from_iterator(it, channel: Channel, num_shards: Optional[int] = None, daemon: bool = True) -> threading.Thread:
    """Producer thread: round-robin an iterator's batches into a channel
    (the reference's producer/consumer split, in-process)."""
    sender = channel.sender()

    def work():
        try:
            for item in it:
                sender.send(item)
        finally:
            sender.close()

    t = threading.Thread(target=work, daemon=daemon)
    t.start()
    return t

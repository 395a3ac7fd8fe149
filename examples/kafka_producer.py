"""Stream criteo TSV rows into Kafka (reference
``examples/online_learning/producer.py:35-78``): N producer processes,
each feeding one topic partition with JSON-serialized rows.

Usage:
  python examples/kafka_producer.py --file day_0 --topic criteo_stream \
      --partitions 2 [--bootstrap localhost:9092] [--rows-per-msg 1000]

Pairs with ``mindrec_tpu.data.streaming.KafkaSource`` on the consumer
side; create the topic first with ``streaming.create_topic``.
"""

import argparse
import json
import multiprocessing as mp
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _make_producer(bootstrap: str):
    """kafka-python when installed, else the in-repo wire client
    (``mindrec_tpu/data/kafka_wire.py``) — same send/flush surface."""
    try:
        from kafka import KafkaProducer  # type: ignore
    except ImportError:
        from mindrec_tpu.data.kafka_wire import MiniKafkaProducer

        return MiniKafkaProducer(
            bootstrap_servers=bootstrap,
            value_serializer=lambda v: json.dumps(v).encode(),
        )
    return KafkaProducer(
        bootstrap_servers=bootstrap,
        value_serializer=lambda v: json.dumps(v).encode(),
    )


def produce(path: str, topic: str, partition: int, num_partitions: int,
            bootstrap: str, rows_per_msg: int):
    producer = _make_producer(bootstrap)
    buf = []
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % num_partitions != partition:
                continue
            buf.append(line.rstrip("\n").split("\t"))
            if len(buf) >= rows_per_msg:
                producer.send(topic, value=buf, partition=partition)
                buf = []
    if buf:
        producer.send(topic, value=buf, partition=partition)
    producer.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", required=True, help="criteo TSV day file")
    ap.add_argument("--topic", default="criteo_stream")
    ap.add_argument("--partitions", type=int, default=2)
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--rows-per-msg", type=int, default=1000)
    args = ap.parse_args()

    procs = [
        mp.Process(
            target=produce,
            args=(args.file, args.topic, p, args.partitions,
                  args.bootstrap, args.rows_per_msg),
        )
        for p in range(args.partitions)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    print(f"streamed {args.file} into {args.topic} over {args.partitions} partitions")


if __name__ == "__main__":
    main()

"""Messaging sinks with gated clients: PubSub, Pulsar, Event Hubs, NATS,
Pravega, RabbitMQ, RocketMQ (reference modules of the same names).

Each sink's DISTINCTIVE behavior — the part worth re-expressing — is its
record shaping and partition/ordering strategy, which is pure logic over
the record frame and fully testable offline:

- PubSub: ordering key from record key or constant
  (PubSubChangeConsumer.java:262-274); gzip above a size threshold
  (PubSubChangeConsumerConfig.java:168-175); batch thresholds
  (:48-71 — elements/delay/bytes).
- RocketMQ: queue = hash(key) % queue_count (SelectMessageQueueByHash,
  RocketMqChangeConsumer.java:159-185).
- Event Hubs: partition id / partition key / hash routing with
  batch-per-partition (EventHubsChangeConsumer.java:108-222,
  DynamicPartitionRoutingStrategy.java:8-18).
- NATS JetStream: subject = destination, sync-with-retries or async+
  await-all (NatsJetStreamChangeConsumer.java:213-258).
- Pravega: routing key = record key; transactional batch = all-or-none
  per epoch (PravegaChangeConsumer.java:81,120-160) — maps to the
  idempotent-epoch property of foreachBatch.
- RabbitMQ (stream): super-stream partition by key hash
  (RabbitMqStreamNativeChangeConsumerConfig.java:173-189).

The client I/O for all of these rides RemoteBulkSink; clients are gated
imports (none of the libs ship in this container)."""

from __future__ import annotations

import gzip
import zlib
from typing import Any

from debezium_server_spark.sinks.base import register_sink
from debezium_server_spark.sinks.remote import RemoteBulkSink


def ordering_key(record: dict[str, Any], mode: str = "key", constant: str = "") -> str:
    """PubSub ordering key (PubSubChangeConsumer.java:262-274)."""
    if mode == "constant":
        return constant
    return record.get("key_json") or ""


def maybe_compress(payload: bytes, threshold: int = 0) -> tuple[bytes, bool]:
    """gzip payloads above threshold bytes (PubSubChangeConsumerConfig
    .java:168-175); returns (body, compressed?)."""
    if threshold and len(payload) >= threshold:
        return gzip.compress(payload, mtime=0), True
    return payload, False


def stable_key_hash(key: str) -> int:
    """Portable deterministic key hash for queue/partition selection
    (RocketMqChangeConsumer.java:166, EventHubs HashFunction)."""
    return zlib.crc32((key or "").encode()) & 0x7FFFFFFF


def select_queue(record: dict[str, Any], queue_count: int) -> int:
    return stable_key_hash(record.get("key_json") or "") % queue_count


def route_partition(record: dict[str, Any], strategy: str, partition_count: int) -> int | None:
    """EventHubs routing strategies (DynamicPartitionRoutingStrategy)."""
    if strategy == "explicit":
        p = record.get("partition")
        if p is not None and p >= partition_count:
            raise ValueError(f"partition {p} >= count {partition_count}")
        return p
    if strategy == "hash":
        return stable_key_hash(record.get("key_json") or "") % partition_count
    return None  # round-robin / service-assigned


class _GatedClientSink(RemoteBulkSink):
    """Common base: real client lib absent in this container → make_client
    raises with guidance; dry_run_dir exercises the full delivery path."""

    client_lib = ""

    def make_client(self) -> Any:
        raise RuntimeError(
            f"{self.name} sink requires {self.client_lib!r} (not installed); "
            "pass dry_run_dir=... for offline delivery"
        )


@register_sink
class PubSubSink(_GatedClientSink):
    name = "pubsub"
    client_lib = "google-cloud-pubsub"
    batch_size = 100  # reference element threshold (:48-71)

    def __init__(self, ordering_mode: str = "key", gzip_threshold: int = 0, **kwargs: Any):
        super().__init__(**kwargs)
        self.ordering_mode = ordering_mode
        self.gzip_threshold = int(self.config.get("gzip.threshold.bytes", gzip_threshold))

    def to_record(self, row) -> dict[str, Any]:
        rec = super().to_record(row)
        rec["ordering_key"] = ordering_key(rec, self.ordering_mode)
        body, compressed = maybe_compress(
            (rec.get("value_json") or "").encode(), self.gzip_threshold
        )
        rec["body"] = body
        rec["compressed"] = compressed
        return rec


@register_sink
class PubSubLiteSink(PubSubSink):
    name = "pubsublite"


@register_sink
class PulsarSink(_GatedClientSink):
    name = "pulsar"
    client_lib = "pulsar-client"


@register_sink
class EventHubsSink(_GatedClientSink):
    name = "eventhubs"
    client_lib = "azure-eventhub"

    def __init__(self, strategy: str = "hash", partition_count: int = 4, **kwargs: Any):
        super().__init__(**kwargs)
        self.strategy = strategy
        self.partition_count = int(self.config.get("partition.count", partition_count))

    def to_record(self, row) -> dict[str, Any]:
        rec = super().to_record(row)
        rec["target_partition"] = route_partition(rec, self.strategy, self.partition_count)
        return rec


@register_sink
class NatsJetStreamSink(_GatedClientSink):
    name = "nats-jetstream"
    client_lib = "nats-py"


@register_sink
class NatsStreamingSink(_GatedClientSink):
    name = "nats-streaming"
    client_lib = "nats-py"


@register_sink
class PravegaSink(_GatedClientSink):
    name = "pravega"
    client_lib = "pravega-client"


@register_sink
class RabbitMqSink(_GatedClientSink):
    name = "rabbitmq"
    client_lib = "pika"


@register_sink
class RabbitMqStreamSink(_GatedClientSink):
    name = "rabbitmqstream"
    client_lib = "rstream"

    def __init__(self, super_stream_partitions: int = 3, **kwargs: Any):
        super().__init__(**kwargs)
        self.super_stream_partitions = super_stream_partitions

    def to_record(self, row) -> dict[str, Any]:
        rec = super().to_record(row)
        rec["super_stream_partition"] = select_queue(rec, self.super_stream_partitions)
        return rec


@register_sink
class RocketMqSink(_GatedClientSink):
    name = "rocketmq"
    client_lib = "rocketmq-client-python"

    def __init__(self, queue_count: int = 4, **kwargs: Any):
        super().__init__(**kwargs)
        self.queue_count = queue_count

    def to_record(self, row) -> dict[str, Any]:
        rec = super().to_record(row)
        rec["queue_id"] = select_queue(rec, self.queue_count)
        return rec

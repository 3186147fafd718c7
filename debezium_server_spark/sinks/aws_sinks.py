"""AWS sinks: Kinesis, SQS, SNS (reference modules debezium-server-kinesis
/sqs/sns).

Re-expressed behaviors:
- Kinesis: group by destination stream, PutRecords ≤500, partition key =
  record key, partial-failure retry of failed entries only
  (KinesisChangeConsumer.java:123-210).
- SQS: queue per destination; FIFO queues get MessageGroupId from the key
  and MessageDeduplicationId from a header or the record hash
  (SqsChangeConsumer.java:87-88,133-136).
- SNS: topic-per-destination or fixed ARN; FIFO group/dedup
  (SnsChangeConsumerConfig.java:69-96).

boto3 is present but no credentials/endpoint in this container — clients
are built lazily; record shaping (the testable logic) is pure.
"""

from __future__ import annotations

import hashlib
from typing import Any

from debezium_server_spark.sinks.base import register_sink
from debezium_server_spark.sinks.remote import RemoteBulkSink

KINESIS_MAX_BATCH = 500  # hard API cap (KinesisChangeConsumerConfig.java:18)


def kinesis_entry(record: dict[str, Any], null_key: str = "default") -> dict[str, Any]:
    return {
        "Data": (record.get("value_json") or "").encode(),
        "PartitionKey": record.get("key_json") or null_key,
    }


def sqs_entry(record: dict[str, Any], idx: int, fifo: bool) -> dict[str, Any]:
    entry = {
        "Id": str(idx),
        "MessageBody": record.get("value_json") or "{}",
    }
    if fifo:  # group = key → per-key order; dedup = header override or body hash
        entry["MessageGroupId"] = record.get("key_json") or "default"
        headers = record.get("headers_map") or {}
        entry["MessageDeduplicationId"] = headers.get(
            "dedup-id",
            hashlib.sha256(entry["MessageBody"].encode()).hexdigest()[:32],
        )
    return entry


@register_sink
class KinesisSink(RemoteBulkSink):
    name = "kinesis"
    batch_size = KINESIS_MAX_BATCH

    def __init__(self, region: str = "us-east-1", **kwargs: Any):
        super().__init__(**kwargs)
        self.region = self.config.get("region", region)
        self.batch_size = min(self.batch_size, KINESIS_MAX_BATCH)

    def make_client(self) -> Any:
        import boto3

        return boto3.client("kinesis", region_name=self.region)

    def send_chunk(self, client: Any, records: list[dict[str, Any]]) -> list[int]:
        # records in one chunk share a destination only after
        # group_by_destination; otherwise split per stream here
        by_stream: dict[str, list[tuple[int, dict]]] = {}
        for i, r in enumerate(records):
            by_stream.setdefault(r["destination"], []).append((i, kinesis_entry(r, self.null_key)))
        failed: list[int] = []
        for stream, entries in by_stream.items():
            resp = client.put_records(StreamName=stream, Records=[e for _, e in entries])
            # partial-failure retry: only failed entries resend (:166-201)
            for (orig_idx, _), result in zip(entries, resp.get("Records", [])):
                if "ErrorCode" in result:
                    failed.append(orig_idx)
        return failed


@register_sink
class SqsSink(RemoteBulkSink):
    name = "sqs"
    batch_size = 10  # SQS SendMessageBatch cap

    def __init__(self, queue_url: str = "", **kwargs: Any):
        super().__init__(**kwargs)
        self.queue_url = self.config.get("queue.url", queue_url)
        self.fifo = self.queue_url.endswith(".fifo")

    def make_client(self) -> Any:
        import boto3

        return boto3.client("sqs")

    def send_chunk(self, client: Any, records: list[dict[str, Any]]) -> list[int]:
        entries = [sqs_entry(r, i, self.fifo) for i, r in enumerate(records)]
        resp = client.send_message_batch(QueueUrl=self.queue_url, Entries=entries)
        return [int(f["Id"]) for f in resp.get("Failed", [])]


@register_sink
class SnsSink(RemoteBulkSink):
    name = "sns"
    batch_size = 10  # SNS PublishBatch cap

    def __init__(self, topic_arn_template: str = "", **kwargs: Any):
        super().__init__(**kwargs)
        # fixed ARN or per-destination template with {destination}
        self.topic_arn_template = self.config.get("topic.arn", topic_arn_template)
        self.fifo = self.topic_arn_template.endswith(".fifo")

    def make_client(self) -> Any:
        import boto3

        return boto3.client("sns")

    def send_chunk(self, client: Any, records: list[dict[str, Any]]) -> list[int]:
        failed: list[int] = []
        by_topic: dict[str, list[tuple[int, dict]]] = {}
        for i, r in enumerate(records):
            arn = self.topic_arn_template.format(destination=r["destination"])
            entry = sqs_entry(r, i, self.fifo)  # same batch-entry shape
            entry["Message"] = entry.pop("MessageBody")
            by_topic.setdefault(arn, []).append((i, entry))
        for arn, entries in by_topic.items():
            resp = client.publish_batch(
                TopicArn=arn, PublishBatchRequestEntries=[e for _, e in entries]
            )
            failed.extend(int(f["Id"]) for f in resp.get("Failed", []))
        return failed

"""RemoteBulkSink: the shared shape of every bulk remote writer.

Generalizes the reference's per-sink consumers (§2.3-2.4): shape the
batch declaratively (JVM-side), then `foreachPartition` with a per-task
client, fixed-size chunks, retry with backoff, and partial-failure
retry of only the failed records (KinesisChangeConsumer.java:142-201,
RedisStreamChangeConsumer.java:146-260, HttpChangeConsumer.java:155-199).

Scale: all record shaping happens before the Python boundary; each task
streams its partition through bounded chunks (no per-task buffering of
the whole partition), so memory is O(chunk), throughput is
partition-parallel, and a failed chunk retries without replaying the
batch.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from debezium_server_spark.sinks.base import BaseSink
from debezium_server_spark.utils.retry import RetryPolicy, execute_with_retry

LOG = logging.getLogger(__name__)


class RemoteBulkSink(BaseSink):
    """Template: subclasses define `make_client`, `to_record`, and
    `send_chunk(client, records) -> failed_indices`."""

    name = "remote-bulk"
    batch_size = 500  # reference default (KinesisChangeConsumerConfig.java:18)

    def __init__(self, dry_run_dir: str | None = None, **kwargs: Any):
        super().__init__(**kwargs)
        self.batch_size = int(self.config.get("batch.size", self.batch_size))
        self.retry_policy = RetryPolicy(
            max_retries=int(self.config.get("retries", 5)),
            initial_delay_s=float(self.config.get("retry.interval.s", 1.0)),
        )
        # dry-run: write chunks to local files instead of a remote service
        # (test/bench path; also the offline-smoke mode for missing clients)
        self.dry_run_dir = dry_run_dir

    # -- subclass surface --------------------------------------------------
    def make_client(self) -> Any:
        raise NotImplementedError

    def record_frame(self, df: DataFrame) -> DataFrame:
        """Declarative record shaping — runs JVM-side before the Python
        boundary. Default: destination + JSON key/value + header map."""
        return df.select(
            F.col("destination"),
            F.to_json(F.col("key")).alias("key_json"),
            F.to_json(F.col("value")).alias("value_json"),
            F.when(
                F.col("headers").isNotNull(), F.map_from_entries(F.col("headers"))
            ).alias("headers_map"),
            F.col("partition"),
        )

    def to_record(self, row: Row) -> dict[str, Any]:
        return row.asDict(recursive=True)

    def send_chunk(self, client: Any, records: list[dict[str, Any]]) -> list[int]:
        """Deliver one chunk; return indices of records that failed and
        should be retried (partial-failure retry)."""
        raise NotImplementedError

    # -- delivery ----------------------------------------------------------
    def _deliver(self, client: Any, records: list[dict[str, Any]]) -> None:
        pending = records
        def attempt() -> None:
            nonlocal pending
            failed = self.send_chunk(client, pending)
            if failed:
                pending = [pending[i] for i in failed]
                raise RuntimeError(f"{len(failed)} records failed")
        execute_with_retry(attempt, description=f"{self.name} chunk",
                           policy=self.retry_policy)

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        frame = self.record_frame(df)
        sink = self
        dry_dir = self.dry_run_dir

        def run_partition(rows: Iterator[Row]) -> None:
            client = _DryRunClient(dry_dir) if dry_dir else sink.make_client()
            chunk: list[dict[str, Any]] = []
            for row in rows:
                chunk.append(sink.to_record(row))
                if len(chunk) >= sink.batch_size:
                    sink._send(client, chunk)
                    chunk = []
            if chunk:
                sink._send(client, chunk)
            close = getattr(client, "close", None)
            if close:
                close()

        frame.rdd.foreachPartition(run_partition)

    def _send(self, client: Any, chunk: list[dict[str, Any]]) -> None:
        if isinstance(client, _DryRunClient):
            client.write(self.name, chunk)
        else:
            self._deliver(client, chunk)


class _DryRunClient:
    """Collects chunks to local JSONL files (one per task) — used by tests
    and by offline smoke runs when the real client lib is absent."""

    def __init__(self, root: str):
        import os
        import uuid

        os.makedirs(root, exist_ok=True)
        self.path = f"{root}/part-{uuid.uuid4().hex}.jsonl"

    def write(self, sink_name: str, chunk: Iterable[dict[str, Any]]) -> None:
        import json

        with open(self.path, "a") as f:
            for rec in chunk:
                f.write(json.dumps({"sink": sink_name, **rec}, default=str) + "\n")

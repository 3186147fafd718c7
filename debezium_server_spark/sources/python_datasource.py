"""`debezium-changelog` — a first-class Spark data source for change logs.

SURVEY.md §4 flags the one "deeper integration" worth doing beyond plain
DataFrame composition: a DataSourceV2-style source so the snapshot+stream
union reads as `spark.readStream.format("debezium-changelog")`. PySpark 4
exposes exactly that integration point as the Python DataSource API
(`pyspark.sql.datasource`), so the source registers like any built-in
format and Spark owns scheduling/offsets/recovery.

Semantics mirror the reference's engine loop: a directory of JSONL
change-event files is the transport (the FileStreamSource analog the
reference uses in its own tests, TestConfigSource.java:66-70); each
event is the BatchEvent surface `{destination, key, value, headers,
partition}` (DefaultChangeConsumer.java:86, BaseChangeConsumer.java:
101-108) with key/value kept as raw JSON text — typing happens
downstream per destination (the dynamic-schema hard part, SURVEY.md
§7.3(b)).

Offset model: files are processed in sorted-name order; the stream
offset is `{"last_file": basename}` — the name of the last processed
file, stable under insertions/deletions before the cursor (a bare
count is not). One input partition per new file —
at scale each micro-batch fans file parsing across executors, and a
file is the atomic replay unit (identical to the reference's
offset-per-source-position contract: replay from the last committed
offset, at-least-once, DefaultChangeConsumer.java / SURVEY.md §3.2
step 5).

Why per-file partitions are enough: CDC transports deliver many
moderate files (one per flush interval), not one giant file; the
parallelism unit the engine needs is "files per trigger", which Spark
schedules across the cluster. For the 100 TB batch path use the
parquet/JSON readers — this source is the *streaming tail*.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FORMAT_NAME = "debezium-changelog"

#: BatchEvent surface; key/value/headers as raw JSON text (typed later).
EVENT_SCHEMA = StructType(
    [
        StructField("destination", StringType()),
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("headers", StringType()),
        StructField("partition", IntegerType()),
    ]
)


def _sorted_files(path: str) -> list[str]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(
        os.path.join(path, n)
        for n in names
        if n.endswith((".json", ".jsonl")) and not n.startswith(".")
    )


def _parse_line(line: str):
    line = line.strip()
    if not line:
        return None
    ev = json.loads(line)

    def _txt(v):
        if v is None:
            return None
        return v if isinstance(v, str) else json.dumps(v)

    return (
        ev.get("destination"),
        _txt(ev.get("key")),
        _txt(ev.get("value")),
        _txt(ev.get("headers")),
        ev.get("partition"),
    )


@dataclass
class FilePartition(InputPartition):
    path: str


class _FileReaderMixin:
    def read(self, partition: FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                row = _parse_line(line)
                if row is not None:
                    yield row


class ChangelogBatchReader(_FileReaderMixin, DataSourceReader):
    """Snapshot-style batch read: every file currently in the directory."""

    def __init__(self, options):
        self.path = options.get("path")

    def partitions(self):
        return [FilePartition(p) for p in _sorted_files(self.path)]


class ChangelogStreamReader(_FileReaderMixin, DataSourceStreamReader):
    """Streaming tail: new files since the last committed offset.

    Offset model: the offset is the *basename of the last processed
    file* (`{"last_file": name}`), not a count. Name comparison is
    stable under insertions before the cursor and under deletions —
    writers with non-monotonic names (e.g. the companion
    changelog-export sink's random part-<uuid>.jsonl) can at worst
    deliver a late-sorting file that lands before the cursor, which is
    skipped *deterministically* rather than silently corrupting the
    window the way an index slice would (re-reading processed files and
    dropping the newest). For strictly-once delivery, writers should use
    monotonic names (the native FileStreamSource tracks the seen-file
    set; a single watermark name is the bounded-state analog).
    """

    def __init__(self, options):
        self.path = options.get("path")

    def initialOffset(self):
        return {"last_file": ""}

    def latestOffset(self):
        files = _sorted_files(self.path)
        return {"last_file": os.path.basename(files[-1]) if files else ""}

    @staticmethod
    def _cursor(offset) -> str:
        # Tolerate a checkpoint written by the old count-based model:
        # treat any legacy offset as "start of directory" (at-least-once
        # replay, the engine contract) rather than failing the stream.
        return offset.get("last_file", "")

    def partitions(self, start, end):
        # The planned range is authoritative: Spark commits `end` no
        # matter what we return here, so truncating would silently drop
        # files. Per-trigger file caps belong in the offset planning the
        # engine owns (the native file source's maxFilesPerTrigger —
        # sources/file_source.py); the Python API exposes no ReadLimit.
        lo, hi = self._cursor(start), self._cursor(end)
        return [
            FilePartition(p)
            for p in _sorted_files(self.path)
            if lo < os.path.basename(p) <= hi
        ]

    def commit(self, end):
        # Spark checkpoints offsets itself; nothing external to ack —
        # the reference's record.commit() analog is the checkpoint write.
        pass


class ChangelogDataSource(DataSource):
    """`spark.read.format("debezium-changelog").option("path", dir)` /
    `spark.readStream.format(...)`. Register once per session via
    `register_changelog_source(spark)`."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema):
        return ChangelogBatchReader(self.options)

    def streamReader(self, schema):
        return ChangelogStreamReader(self.options)


def register_changelog_source(spark) -> None:
    spark.dataSource.register(ChangelogDataSource)

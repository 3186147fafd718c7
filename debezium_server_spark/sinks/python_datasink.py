"""`changelog-export` — a Spark data *sink* with two-phase commit.

The counterpart of `sources/python_datasource.py` and the second §4
"deeper integration" candidate (a v2 Table sink): PySpark 4's
DataSourceStreamWriter gives the engine-level transactional protocol the
reference implements by hand in its Pravega sink — every event of a
batch inside one transaction, committed at the end, aborted wholesale on
failure (PravegaChangeConsumer.java:81,120-160).

Protocol here:
- executors write their partition's rows to `data/part-<uuid>.jsonl`
  (staged: present on disk but NOT visible),
- `commit(messages, batchId)` runs once on the driver and atomically
  publishes the batch by writing a manifest
  `_manifests/<batchId>.json` listing the staged files,
- `abort(...)` deletes the staged files,
- **replayed epochs are no-ops**: a manifest that already exists means
  this batchId was published by a previous incarnation — the late
  duplicate is discarded, upgrading at-least-once replay to
  exactly-once visibility (same idea as the epoch-idempotent parquet
  upsert sink, sinks/parquet_sink.py).

Readers list manifests and read only manifested files
(`read_exported`). Unmanifested stragglers from a crashed epoch are
invisible garbage, collected by any later `vacuum_unmanifested` call —
visibility never depends on filesystem atomicity, only on the manifest
write, which is a single rename-free small file per epoch.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

FORMAT_NAME = "changelog-export"


@dataclass
class FileCommit(WriterCommitMessage):
    path: str
    n_rows: int


def _write_partition(data_dir: str, iterator) -> FileCommit:
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
            n += 1
    return FileCommit(path=path, n_rows=n)


def _manifest_is_published(path: str) -> bool:
    """True only if the manifest exists AND parses.

    Manifests are written via os.replace so a torn file should be
    impossible, but defense-in-depth: an unreadable manifest is treated
    as absent so the replayed epoch re-publishes instead of discarding
    the only copy of the batch.
    """
    try:
        with open(path) as f:
            json.load(f)
        return True
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return False


class _ManifestMixin:
    def _publish(self, messages, manifest_name: str) -> None:
        files = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None and m.n_rows > 0
        ]
        # zero-row partitions still staged empty files: drop them
        for m in messages:
            if m is not None and m.n_rows == 0 and os.path.exists(m.path):
                os.remove(m.path)
        mdir = os.path.join(self.root, "_manifests")
        os.makedirs(mdir, exist_ok=True)
        # Crash-atomic publish: write to a hidden temp name, fsync, then
        # os.replace() — readers and replayed epochs can never observe a
        # torn manifest (same pattern as parquet_sink.py / incremental
        # snapshot watermarks).
        final = os.path.join(mdir, manifest_name)
        tmp = os.path.join(mdir, f".{manifest_name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump({"files": files}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)

    def _discard(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ChangelogExportStreamWriter(_ManifestMixin, DataSourceStreamWriter):
    def __init__(self, options):
        self.root = options.get("path")

    def write(self, iterator) -> FileCommit:
        return _write_partition(os.path.join(self.root, "data"), iterator)

    def commit(self, messages, batchId: int) -> None:
        if _manifest_is_published(
            os.path.join(self.root, "_manifests", f"{batchId}.json")
        ):
            # replayed epoch: already published by a previous run —
            # discard the duplicate stage, keep the committed truth
            self._discard(messages)
            return
        self._publish(messages, f"{batchId}.json")

    def abort(self, messages, batchId: int) -> None:
        self._discard(messages)


class ChangelogExportBatchWriter(_ManifestMixin, DataSourceWriter):
    def __init__(self, options):
        self.root = options.get("path")

    def write(self, iterator) -> FileCommit:
        return _write_partition(os.path.join(self.root, "data"), iterator)

    def commit(self, messages) -> None:
        self._publish(messages, f"batch-{uuid.uuid4().hex}.json")

    def abort(self, messages) -> None:
        self._discard(messages)


class ChangelogExportDataSource(DataSource):
    """`df.write.format("changelog-export").option("path", dir)` /
    `df.writeStream.format(...)`."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema, overwrite: bool):
        return ChangelogExportBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return ChangelogExportStreamWriter(self.options)


def register_changelog_sink(spark) -> None:
    spark.dataSource.register(ChangelogExportDataSource)


def manifested_files(root: str) -> list[str]:
    mdir = os.path.join(root, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out: list[str] = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith(".") or name.endswith(".tmp"):
            continue
        with open(os.path.join(mdir, name)) as f:
            out.extend(e["path"] for e in json.load(f)["files"])
    return out


def read_exported(spark, root: str, schema=None):
    """Read back ONLY committed (manifested) rows."""
    files = manifested_files(root)
    if not files:
        return None
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)


def vacuum_unmanifested(root: str) -> int:
    """Delete staged files no manifest references (crashed epochs)."""
    data = os.path.join(root, "data")
    if not os.path.isdir(data):
        return 0
    keep = {os.path.abspath(p) for p in manifested_files(root)}
    n = 0
    for name in os.listdir(data):
        p = os.path.abspath(os.path.join(data, name))
        if p not in keep:
            os.remove(p)
            n += 1
    return n

"""Snapshot → streaming handoff: overlap dedup, marker-based restart,
and the snapshot-epoch batch path (the reference's two-phase lifecycle,
SURVEY.md §3.1-3.2)."""

import json
import os

from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
from debezium_server_spark.sources.file_source import changelog_batch, changelog_stream
from debezium_server_spark.streaming.handoff import (
    SNAPSHOT_EPOCH,
    snapshot_lsn_marker,
    snapshot_then_stream,
)
from tests.fixtures import (
    CUSTOMERS_KEY_SCHEMA,
    CUSTOMERS_ROW_SCHEMA,
    DEST,
    event,
)


def _write(path, events, name):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _snapshot_events():
    # consistent state at lsn=10: customers 1 and 2
    return [
        event(1, "r", None, (1, "Ann", "A", "ann@x.com"), lsn=10),
        event(2, "r", None, (2, "Bob", "B", "bob@x.com"), lsn=10),
    ]


def _log_events():
    # the log OVERLAPS the snapshot (lsn ≤ 10 already materialized) then
    # moves on: update 1, delete 2, insert 3
    return [
        event(1, "c", None, (1, "Ann", "A", "ann@x.com"), lsn=9),
        event(2, "c", None, (2, "Bob", "B", "bob@x.com"), lsn=10),
        event(1, "u", (1, "Ann", "A", "ann@x.com"),
              (1, "Ann", "Updated", "ann@x.com"), lsn=11),
        event(2, "d", (2, "Bob", "B", "bob@x.com"), None, lsn=12),
        event(3, "c", None, (3, "Cyn", "C", "cyn@x.com"), lsn=13),
    ]


def test_handoff_dedups_overlap_and_applies_tail(spark, tmp_path):
    snapdir, logdir = str(tmp_path / "snap"), str(tmp_path / "log")
    ckpt, state = str(tmp_path / "ckpt"), str(tmp_path / "state")
    _write(snapdir, _snapshot_events(), "snap.jsonl")
    _write(logdir, _log_events(), "log.jsonl")

    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    q = snapshot_then_stream(
        changelog_batch(spark, snapdir, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA),
        changelog_stream(spark, logdir, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA),
        sink, ckpt,
    )
    q.awaitTermination(120)

    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert set(rows) == {1, 3}, "update applied, delete applied, insert applied"
    assert rows[1]["last_name"] == "Updated"
    assert snapshot_lsn_marker(ckpt) == 10


def test_restart_skips_snapshot_and_resumes_stream(spark, tmp_path):
    snapdir, logdir = str(tmp_path / "snap"), str(tmp_path / "log")
    ckpt, state = str(tmp_path / "ckpt"), str(tmp_path / "state")
    _write(snapdir, _snapshot_events(), "snap.jsonl")
    _write(logdir, _log_events(), "log.jsonl")

    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    snap = changelog_batch(spark, snapdir, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    stream = changelog_stream(spark, logdir, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    snapshot_then_stream(snap, stream, sink, ckpt).awaitTermination(120)

    # restart: snapshot must NOT re-run (marker present); new log events
    # flow from Spark's checkpointed offsets
    seen_epochs = []

    def spying_sink(df, epoch_id):
        seen_epochs.append(epoch_id)
        sink(df, epoch_id)

    _write(logdir, [
        event(4, "c", None, (4, "Dee", "D", "dee@x.com"), lsn=14),
    ], "log2.jsonl")
    snapshot_then_stream(snap, stream, spying_sink, ckpt).awaitTermination(120)

    assert SNAPSHOT_EPOCH not in seen_epochs, "snapshot re-ran on restart"
    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert set(rows) == {1, 3, 4}


def test_empty_snapshot_streams_everything(spark, tmp_path):
    snapdir, logdir = str(tmp_path / "snap"), str(tmp_path / "log")
    ckpt, state = str(tmp_path / "ckpt"), str(tmp_path / "state")
    _write(snapdir, [], "empty.jsonl")
    _write(logdir, _log_events(), "log.jsonl")

    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    q = snapshot_then_stream(
        changelog_batch(spark, snapdir, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA),
        changelog_stream(spark, logdir, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA),
        sink, ckpt,
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert set(rows) == {1, 3}, "with no snapshot, the whole log replays"

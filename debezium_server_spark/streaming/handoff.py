"""Snapshot → streaming handoff: the CDC connector's core lifecycle.

The reference engine bulk-reads consistent state first (op='r' snapshot
events), records the log position the snapshot was consistent with, then
tails the change log strictly *after* that position
(SURVEY.md §3.1-3.2; the snapshot-completed flag surfaces through
streaming/metrics.py like DebeziumMetrics' snapshotCompleted).

Spark shape: phase 1 is a plain batch write through the SAME pipeline
stages and sink (`Pipeline.run_batch`), phase 2 a Structured Streaming
query whose source is filtered to `lsn > snapshot_lsn`. Crash safety
comes from two pieces:

- a JSON marker next to the stream checkpoint records the snapshot LSN
  once phase 1 commits — a restart skips the (possibly huge) re-read and
  resumes the stream from Spark's own checkpointed offsets;
- the sink stays idempotent (epoch-keyed upsert), so a crash *between*
  snapshot commit and marker write only costs a harmless re-upsert.

At 100 TB the snapshot is the dominant phase; it runs as a fully
parallel batch job (partitioned JDBC reads / parquet scans), not through
the micro-batch path, so snapshot throughput scales with the cluster
while the stream phase stays a cheap tail.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from debezium_server_spark.streaming.pipeline import Pipeline, SinkFn, Stage

#: Epoch id used for the snapshot batch — distinct from every streaming
#: epoch (those start at 0), so epoch-keyed idempotent sinks treat the
#: snapshot as its own committed unit.
SNAPSHOT_EPOCH = -1


def _marker_path(checkpoint_location: str) -> str:
    return os.path.join(checkpoint_location, "snapshot_completed.json")


def snapshot_lsn_marker(checkpoint_location: str) -> int | None:
    """The recorded snapshot LSN, or None while the snapshot phase is
    still owed. (The reference keeps this flag in its offset store.)"""
    try:
        with open(_marker_path(checkpoint_location)) as f:
            return json.load(f)["snapshot_lsn"]
    except FileNotFoundError:
        return None


def snapshot_then_stream(
    snapshot_events: DataFrame,
    stream_source: DataFrame,
    sink: SinkFn,
    checkpoint_location: str,
    stages: list[Stage] | None = None,
    lsn_col: str = "value.source.lsn",
) -> StreamingQuery:
    """Run the two-phase CDC lifecycle and return the streaming query.

    `snapshot_events` is a *batch* frame of op='r' events carrying the
    log position they are consistent with in `lsn_col`; `stream_source`
    is the streaming changelog. Events at or below the snapshot LSN are
    filtered out of the stream — the snapshot already materialized them —
    which de-duplicates the overlap window every log-based CDC source
    has between "read consistent state" and "start tailing".
    """
    stages = list(stages or [])
    lsn = snapshot_lsn_marker(checkpoint_location)
    if lsn is None:
        row = snapshot_events.agg(
            F.max(F.col(lsn_col)).alias("lsn")
        ).first()
        lsn = row["lsn"] if row["lsn"] is not None else -1
        Pipeline(snapshot_events, stages).run_batch(sink, SNAPSHOT_EPOCH)
        os.makedirs(checkpoint_location, exist_ok=True)
        with open(_marker_path(checkpoint_location), "w") as f:
            json.dump({"snapshot_lsn": lsn}, f)
    tail = stream_source.filter(F.col(lsn_col) > F.lit(lsn))
    return Pipeline(tail, stages).start(sink, checkpoint_location)

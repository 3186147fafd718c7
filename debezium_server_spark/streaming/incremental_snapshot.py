"""Signal-triggered incremental snapshot (the DBLog algorithm, Spark-first).

The reference exposes `execute-snapshot` signals that re-snapshot chosen
tables WHILE streaming continues (signal channels
`debezium.source.signal.enabled.channels=source,in-process`,
TestConfigSource.java:42; REST trigger SignalResource.java:32-43). The
upstream implementation follows the DBLog paper: read the table in
PK-ordered chunks; around each chunk write low/high watermarks into the
log; snapshot rows whose keys were changed by log events inside the
watermark window are DISCARDED (the log event is newer), everything else
is emitted as op='r' READ events interleaved into the stream.

Spark-first translation — the pieces map cleanly onto micro-batches:

- **Chunk plan.** One column-pruned pass computes PK split points with
  `percentile_approx(pk, [1/n .. (n-1)/n])` — the driver holds only the
  ~n_chunks boundary values. (The reference pages serially with
  `ORDER BY pk LIMIT chunk`; a percentile chunk plan is the parallel
  equivalent and each chunk filter pushes down to the scan.)
- **Watermark window = the micro-batch.** A chunk runs between two
  micro-batches of the change stream, so the batch's own keys ARE the
  low/high watermark window: `chunk ⟕ anti-join batch_keys` drops
  exactly the rows the log already superseded. No extra log writes.
- **Resume.** Chunk progress lives in a JSON state file next to the
  checkpoint (the reference keeps it in connector offsets): a restart
  re-plans nothing and continues at `next_chunk`. Chunk epochs are
  deterministic (`-(seq·10⁶ + chunk + 2)`), so an epoch-idempotent sink
  de-duplicates a chunk that committed right before a crash.
- **Scale.** Each chunk is an independent bounded parallel read; chunk
  size bounds sink batch memory, not scan parallelism. Snapshot work
  interleaves 1:1 with stream batches (`chunks_per_batch`), which is the
  same pacing knob the reference exposes
  (`incremental.snapshot.chunk.size`).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.sources.jdbc_source import rows_to_snapshot_events

SinkFn = Callable[[DataFrame, int], None]


def plan_chunks(rows: DataFrame, pk: str, chunk_size: int) -> list:
    """PK split points for ~chunk_size rows per chunk. Single
    column-pruned aggregation; driver memory is O(n_chunks)."""
    total = rows.count()
    n_chunks = max(1, -(-total // chunk_size))
    if n_chunks == 1:
        return []
    probs = [i / n_chunks for i in range(1, n_chunks)]
    [row] = rows.select(
        F.percentile_approx(pk, probs, 10_000).alias("b")
    ).collect()
    # dedupe (skewed pks can repeat a boundary) while preserving order
    out, seen = [], set()
    for b in row.b:
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out


def chunk_filter(rows: DataFrame, pk: str, boundaries: list, idx: int) -> DataFrame:
    """Half-open PK range for chunk `idx` — (b[i-1], b[i]]; first chunk is
    unbounded below, last unbounded above. Plain range predicates, so the
    parquet/JDBC scan prunes to the chunk."""
    c = F.col(pk)
    n = len(boundaries) + 1
    if idx < 0 or idx >= n:
        raise IndexError(f"chunk {idx} of {n}")
    pred = F.lit(True)
    if idx > 0:
        pred = pred & (c > F.lit(boundaries[idx - 1]))
    if idx < len(boundaries):
        pred = pred & (c <= F.lit(boundaries[idx]))
    return rows.filter(pred)


@dataclass
class SnapshotRequest:
    """One `execute-snapshot` signal: which table, how to read it."""

    table: str                      # data-collection name, e.g. "customers"
    rows: Callable[[], DataFrame]   # fresh row frame per chunk (re-reads source)
    pk: str = "id"
    key_columns: tuple[str, ...] = ("id",)
    chunk_size: int = 1024
    topic_prefix: str = "cdc"


class IncrementalSnapshotCoordinator:
    """Drives chunked re-snapshots between micro-batches of a running
    pipeline. Wire it in as a sink wrapper::

        coord = IncrementalSnapshotCoordinator(sink, state_path)
        signal_channel.register("execute-snapshot", coord.signal_handler(registry))
        pipeline.start(coord.wrap(sink), ckpt, signal_channel=channel)
    """

    def __init__(self, state_path: str, chunks_per_batch: int = 1) -> None:
        self.state_path = state_path
        self.chunks_per_batch = chunks_per_batch
        self._pending: list[SnapshotRequest] = []
        self._active: SnapshotRequest | None = None

    # -- state file ----------------------------------------------------
    def _load(self) -> dict:
        try:
            with open(self.state_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"seq": 0, "done": True}

    def _save(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    # -- control plane -------------------------------------------------
    def request(self, req: SnapshotRequest) -> None:
        self._pending.append(req)

    def signal_handler(self, registry: dict[str, SnapshotRequest]):
        """Handler for SignalChannel.register("execute-snapshot", ...).
        Signal data mirrors the reference's shape:
        {"data-collections": ["customers"], "chunk-size": 512}."""

        def handle(signal, _context) -> None:
            for name in signal.data.get("data-collections", []):
                if name in registry:
                    req = registry[name]
                    size = signal.data.get("chunk-size")
                    if size:
                        req = SnapshotRequest(
                            req.table, req.rows, req.pk, req.key_columns,
                            int(size), req.topic_prefix,
                        )
                    self.request(req)

        return handle

    # -- data plane ----------------------------------------------------
    def resume(self, registry: dict[str, SnapshotRequest]) -> None:
        """After a restart: if the state file says a snapshot was mid-
        flight, re-activate it (the reference stores the same progress in
        its offsets and does exactly this)."""
        state = self._load()
        if not state.get("done") and state.get("table") in registry:
            self._active = registry[state["table"]]

    def on_batch(self, batch_df: DataFrame, sink: SinkFn) -> int:
        """Run up to `chunks_per_batch` chunks, deduped against the keys
        of the just-delivered micro-batch. Returns chunks run."""
        if self._active is None and self._pending:
            self._activate(self._pending.pop(0))
        if self._active is None:
            return 0
        req = self._active
        state = self._load()
        ran = 0
        window_keys = None
        if batch_df is not None:
            window_keys = (
                batch_df.filter(F.col("destination") == f"{req.topic_prefix}.{req.table}")
                .select(*[F.col(f"key.{k}").alias(k) for k in req.key_columns])
                .distinct()
            )
        while ran < self.chunks_per_batch and not state["done"]:
            idx = state["next_chunk"]
            chunk = chunk_filter(req.rows(), req.pk, state["boundaries"], idx)
            if window_keys is not None:
                chunk = chunk.join(window_keys, list(req.key_columns), "left_anti")
            events = rows_to_snapshot_events(
                chunk, req.table, req.key_columns, req.topic_prefix
            )
            sink(events, -(state["seq"] * 1_000_000 + idx + 2))
            ran += 1
            state["next_chunk"] = idx + 1
            state["done"] = state["next_chunk"] >= len(state["boundaries"]) + 1
            self._save(state)
        if state["done"]:
            self._active = None
        return ran

    def _activate(self, req: SnapshotRequest) -> None:
        self._active = req
        prev = self._load()
        state = {
            "seq": prev.get("seq", 0) + 1,
            "table": req.table,
            "boundaries": plan_chunks(req.rows(), req.pk, req.chunk_size),
            "next_chunk": 0,
            "done": False,
        }
        # an empty table still snapshots as one (empty) chunk
        self._save(state)

    def wrap(self, sink: SinkFn) -> SinkFn:
        """The foreachBatch function: deliver the stream batch first (log
        events win inside the watermark window), then advance the
        snapshot."""

        def batch_fn(df: DataFrame, epoch_id: int) -> None:
            sink(df, epoch_id)
            self.on_batch(df, sink)

        return batch_fn

"""Deterministic batch→stream replay: run a stateful streaming operator
over a static fixture table and hand back its output as a plain
DataFrame.

This is the bridge that lets genuinely-streaming operators (pattern
automata, watermark-sealed rankings — state machines with no batch SQL
equivalent) appear in the driver-checked catalog as rows-only entries:
the fixture is materialized as a time-ordered multi-file copy, replayed
one file per micro-batch with `availableNow`, and the append-mode output
lands in an in-memory table. Every step is deterministic — range
partitioning by event time fixes the file split, file-name order fixes
the batch order, and the operators sort within each batch — so the row
set is identical across runs and engines.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

#: Metrics of the most recent replay_stream call (wall-clock-free
#: state-store observables pulled from the query's progress events):
#: {"n_batches": int, "peak_state_rows": int, "state_bytes": int}.
#: A module-level mailbox rather than a changed return type so the 20+
#: catalog replay entries keep their (spark, sf_dir) -> DataFrame
#: contract; the scaling harness reads it right after each call.
LAST_REPLAY_METRICS: dict = {}

#: Replay-only session settings (set around query start, captured
#: per-query, restored immediately; long-running production pipelines
#: keep the engine defaults):
#:
#: - minBatchesToRetain: the default 100 keeps every delta/offset file
#:   of a <=5-batch replay — 2 is enough to commit the final batch and
#:   skips the retention bookkeeping.
#: - maintenanceInterval: background state-store snapshot/cleanup
#:   threads are pure overhead for a query that lives ~2 s.
#: - checkpointFileManagerClass: Spark 4.1's default checkpoint manager
#:   goes through the FileContext API wrapped in a checksum layer —
#:   measured ~125 ms of offset/commit/state log round-trips per
#:   micro-batch on this harness's tmpfs checkpoints (walCommit +
#:   commitOffsets + latestOffset ≈ 40 ms each). The replay checkpoint
#:   is throwaway per-call state deleted in the caller's finally block,
#:   so its crash-recovery guarantees are irrelevant; the plain
#:   FileSystem-based manager (rename-based atomic writes, no checksum
#:   wrapper) measured the calibration replay 3.33 → 1.92 s median
#:   (8-replay A/B, fresh JVMs, rows identical).
#:
#: Exported (module-level) so a caller running several replays
#: CONCURRENTLY can pre-set the same values on the session: the
#: per-call set/restore below then writes identical values from every
#: thread and the restore window cannot expose a mid-flight query to
#: the non-replay defaults.
REPLAY_SESSION_CONFS: dict[str, str] = {
    "spark.sql.streaming.minBatchesToRetain": "2",
    "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
    "spark.sql.streaming.checkpointFileManagerClass":
        "org.apache.spark.sql.execution.streaming.checkpointing"
        ".FileSystemBasedCheckpointFileManager",
}


def replay_stream(
    spark: SparkSession,
    df: DataFrame,
    transform,
    ts_col: str = "ts",
    n_batches: int = 4,
    output_mode: str = "append",
    shuffle_partitions: int = 8,
    batch_col: str | None = None,
) -> DataFrame:
    """Write `df` as `n_batches` time-range files, open them as a
    1-file-per-trigger stream, apply `transform(stream) -> stream`, run
    to completion (availableNow), and return the collected output.

    The no-data batch Spark appends after the last file advances the
    watermark to max(event time) - delay, so EventTimeTimeout-based
    finalization (e.g. trending_topk) fires for every window the
    watermark conclusively passes; trailing windows deterministically
    stay open and are excluded from the output.
    """
    # Replay fixture + checkpoint are throwaway per-call state on the
    # hot path (21 catalog replays per bench run, each writing a
    # multi-file fixture, 5 offset/commit log entries, and per-partition
    # state deltas): put them on tmpfs when the host has one. Override
    # with SPARK_GRAFT_REPLAY_TMP; falls back to the default tempdir.
    tmp_root = os.environ.get(
        "SPARK_GRAFT_REPLAY_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    work = tempfile.mkdtemp(prefix="spark_graft_replay_", dir=tmp_root)
    # finally-scoped cleanup: the memory sink owns the result rows, so
    # the fixture + checkpoint are deletable on EVERY exit — success,
    # timeout, or a transform()/start() failure. Without the finally, a
    # failing replay leaks a parquet fixture + state deltas into the
    # RAM-backed tmpfs default (round-4 review finding).
    try:
        return _replay_in_workdir(
            spark, df, transform, ts_col, n_batches, output_mode,
            shuffle_partitions, batch_col, work)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _replay_in_workdir(
    spark: SparkSession,
    df: DataFrame,
    transform,
    ts_col: str,
    n_batches: int,
    output_mode: str,
    shuffle_partitions: int,
    batch_col: str | None,
    work: str,
) -> DataFrame:
    src = os.path.join(work, "src")
    if batch_col is not None:
        # Caller-pinned micro-batches: one file per ascending batch_col
        # value, written under names that sort in batch order. Oracles
        # that must model PER-BATCH watermark progression (e.g. the
        # dropDuplicatesWithinWatermark eviction lag) need the batch
        # boundaries to be exact arithmetic on the data — not
        # repartitionByRange's sampled splits.
        import shutil

        from pyspark.sql import functions as _F

        os.makedirs(src)
        vals = [r[0] for r in
                df.select(batch_col).distinct().orderBy(batch_col).collect()]
        for i, v in enumerate(vals):
            tmp = os.path.join(work, f"b{i}")
            (
                df.filter(_F.col(batch_col) == v).drop(batch_col)
                .coalesce(1).sortWithinPartitions(ts_col)
                .write.parquet(tmp)
            )
            part = next(f for f in os.listdir(tmp)
                        if f.startswith("part-") and f.endswith(".parquet"))
            shutil.move(os.path.join(tmp, part),
                        os.path.join(src, f"part-{i:05d}.parquet"))
            shutil.rmtree(tmp)
        df = df.drop(batch_col)
    else:
        (
            df.repartitionByRange(n_batches, ts_col)
            .sortWithinPartitions(ts_col)
            .write.parquet(src)
        )
    # FileStreamSource orders new files by modification time; parallel
    # part-file writes get near-identical mtimes, so replay order could
    # diverge from time-range order (a later-range batch first would
    # advance the watermark and late-drop entire earlier files). Pin
    # mtimes to the part-file name order, which repartitionByRange made
    # the event-time order.
    parts = sorted(
        f for f in os.listdir(src)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    base = int(os.path.getmtime(os.path.join(src, parts[0])))
    for i, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + i, base + i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = "replay_" + uuid.uuid4().hex
    # update mode: the memory sink APPENDS each batch's updated rows, so
    # the collected table holds every intermediate emission — callers
    # extract the final state per key (e.g. argmax of a monotone counter)
    #
    # shuffle_partitions: a streaming query instantiates one state store
    # per shuffle partition per stateful operator PER MICRO-BATCH; at
    # replay scale (<=100k rows, 5 batches) 32 partitions are pure
    # overhead — a stream-stream join pays ~200 state-store tasks per
    # batch. 8 cuts the fixed cost ~4x; results are partition-invariant
    # (every entry re-sorts, the driver compares sorted). The session
    # value is restored after the query captures its own copy at start.
    #
    # REPLAY_SESSION_CONFS (rationale at the module-level definition)
    # are replay-only settings, set/restored around query start and
    # captured per-query exactly like shuffle_partitions.
    _replay_confs = dict(REPLAY_SESSION_CONFS)
    _replay_confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    prev = {k: spark.conf.get(k, None) for k in _replay_confs}
    for k, v in _replay_confs.items():
        spark.conf.set(k, v)
    try:
        q = (
            transform(stream)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(availableNow=True)
            .start()
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    if not q.awaitTermination(300):
        # a hung state-store batch would otherwise surface as a
        # partially-populated memory table masquerading as a completed
        # replay — fail loudly instead
        q.stop()
        raise TimeoutError(
            f"streaming replay {name!r} still running after 300s; "
            "aborted to avoid returning a partial memory table"
        )
    try:
        progress = q.recentProgress
        LAST_REPLAY_METRICS.clear()
        LAST_REPLAY_METRICS.update({
            "n_batches": len(progress),
            "peak_state_rows": max(
                (so["numRowsTotal"] for p in progress
                 for so in p.get("stateOperators", [])), default=0),
            "state_bytes": max(
                (int(so.get("customMetrics", {})
                     .get("stateOnCurrentVersionSizeBytes", 0))
                 for p in progress
                 for so in p.get("stateOperators", [])), default=0),
        })
    except Exception:  # metrics are best-effort observability
        LAST_REPLAY_METRICS.clear()
    return spark.table(name)

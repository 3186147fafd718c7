"""End-to-end flagship invariants: stream_cdc_corpus_card composes the
CDC half (snapshot→stream handoff → parquet-upsert latest state) with
the curation half (quality gate → incremental band dedup → data card).
The DuckDB oracle checks exact values; these tests pin the STRUCTURAL
invariants that survive fixture changes, so a regression localizes
(CDC state wrong vs curation wrong vs card arithmetic wrong)."""

from pyspark.sql import functions as F

from debezium_server_spark.plans.catalog import CATALOG, load


def test_cdc_corpus_card_invariants(spark, sf_dir):
    card = CATALOG["stream_cdc_corpus_card"].spark_fn(spark, sf_dir)
    rows = card.collect()
    assert rows, "card must have one row per source"
    assert card.columns == [
        "source", "n_state", "n_quality_drop", "n_dup_drop",
        "n_corpus", "kept_bp", "corpus_tokens",
    ]

    # CDC phase: the materialized state is exactly the non-deleted docs
    # (latest-wins leaves one row per surviving key, op=d removes)
    docs = load(spark, sf_dir, "documents")
    expected_state = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 11 != 0)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_state = {r["source"]: r["n_state"] for r in rows}
    assert got_state == expected_state

    # curation phase: every state doc is accounted for exactly once
    for r in rows:
        assert r["n_state"] == (
            r["n_quality_drop"] + r["n_dup_drop"] + r["n_corpus"]
        ), f"row conservation violated for {r['source']}"
        assert r["kept_bp"] == r["n_corpus"] * 10000 // r["n_state"]
        if r["n_corpus"] > 0:
            assert r["corpus_tokens"] > 0

    # the dedup stage must actually drop something on these fixtures
    # (the fixture generator plants near-dup pairs) and the quality gate
    # must pass most docs — catches a silently-empty corpus
    total = sum(r["n_state"] for r in rows)
    kept = sum(r["n_corpus"] for r in rows)
    dup = sum(r["n_dup_drop"] for r in rows)
    assert dup > 0, "incremental dedup dropped nothing — index dead?"
    assert kept > total // 2, "corpus suspiciously small"


def test_cdc_corpus_card_is_deterministic(spark, sf_dir):
    """Two full executions (fresh temp dirs, fresh streaming queries,
    fresh epoch markers) must produce identical cards — the entry's
    whole design claim (lsn-ordered latest-wins + pinned increments)."""
    fn = CATALOG["stream_cdc_corpus_card"].spark_fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b


def _flagship_frames(spark, sf_dir):
    """The flagship's envelope derivation (snapshot r@1, %5 updates u@2,
    %11 deletes d@3), compact test-local twin."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text")

    def env(df, op, lsn):
        after = F.struct(F.col("doc_id"), F.col("source"),
                         F.col("lang"), F.col("text"))
        if op == "d":
            after = F.when(F.lit(False), after)
        return df.select(
            F.lit("corpus.docs").alias("destination"),
            F.struct(F.col("doc_id")).alias("key"),
            F.struct(
                F.lit(op).alias("op"), after.alias("after"),
                F.struct(F.lit(lsn).cast("long").alias("lsn"))
                 .alias("source"),
                F.lit(lsn).cast("long").alias("ts_ms")).alias("value"))

    snapshot = env(docs, "r", 1)
    updates = env(
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("text", F.concat(F.lit("updated "), F.col("text"))),
        "u", 2)
    deletes = env(docs.filter(F.col("doc_id") % 11 == 0), "d", 3)
    return snapshot, updates, deletes


def _write_stream_files(work, snapshot, updates, deletes):
    import os
    import shutil

    src = os.path.join(work, "stream")
    os.makedirs(src)
    for i, frame in enumerate((updates, deletes)):
        part_dir = os.path.join(work, f"b{i}")
        frame.coalesce(1).write.parquet(part_dir)
        part = next(f for f in os.listdir(part_dir)
                    if f.startswith("part-") and f.endswith(".parquet"))
        shutil.move(os.path.join(part_dir, part),
                    os.path.join(src, f"part-{i:05d}.parquet"))
        shutil.rmtree(part_dir)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = int(os.path.getmtime(os.path.join(src, parts[0])))
    for i, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + i, base + i))
    return src


def _run_flagship(spark, sf_dir, work, crash_stream_epoch=None,
                  crash_between_corpus_epochs=False):
    """Drive the composed flagship (CDC stream -> upsert state ->
    two-epoch corpus ingest); optionally fault-inject. Returns the
    three persisted artifacts as sorted row-tuples."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from debezium_server_spark.sinks.corpus_sink import CorpusIngestSink
    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
    from debezium_server_spark.streaming.handoff import snapshot_then_stream

    snapshot, updates, deletes = _flagship_frames(spark, sf_dir)
    src = _write_stream_files(work, snapshot, updates, deletes)
    schema = snapshot.schema
    ckpt = os.path.join(work, "ckpt")
    sink = ParquetUpsertSink(root_path=os.path.join(work, "state"),
                             key_fields=("doc_id",))

    def start(wrapped_sink):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return snapshot_then_stream(snapshot, stream, wrapped_sink, ckpt)

    if crash_stream_epoch is not None:
        def crashing(df, epoch_id):
            sink(df, epoch_id)  # write commits BEFORE the crash:
            if epoch_id == crash_stream_epoch:  # at-least-once replay
                raise RuntimeError("injected crash after sink write")
        q = start(crashing)
        try:
            q.awaitTermination(300)
            raise AssertionError("injected crash did not surface")
        except StreamingQueryException:
            pass
        # restart from checkpoint: snapshot marker skips phase 1, the
        # failed epoch replays, the epoch-keyed sink skips the re-write
        q = start(sink)
    else:
        q = start(sink)
    assert q.awaitTermination(300), "stream phase still running"

    state = sink.read_table(spark, "corpus.docs").select(
        "doc_id", "source", "lang", "text").localCheckpoint(eager=True)

    corpus_root = os.path.join(work, "corpus")
    epochs = (state.filter(F.col("doc_id") % 2 == 0),
              state.filter(F.col("doc_id") % 2 == 1))

    def to_env(inc):
        return inc.select(F.struct(
            F.struct(F.col("doc_id"), F.col("text")).alias("after")
        ).alias("value"))

    ingest = CorpusIngestSink(root_path=corpus_root)
    ingest.handle(to_env(epochs[0]), 0)
    if crash_between_corpus_epochs:
        # crash after epoch 0 committed: a fresh process (new sink
        # instance) replays epoch 0 — the marker must make it a no-op —
        # then proceeds to epoch 1
        ingest = CorpusIngestSink(root_path=corpus_root)
        ingest.handle(to_env(epochs[0]), 0)
    ingest.handle(to_env(epochs[1]), 1)

    state_rows = sorted(map(tuple, state.collect()))
    corpus_rows = sorted(map(tuple, ingest.read_corpus(spark)
                             .select("doc_id", "text").collect()))
    index_rows = sorted(map(tuple, spark.read.parquet(
        ingest.index_path).collect()))
    return state_rows, corpus_rows, index_rows


def test_flagship_crash_recovery_is_replay_identical(spark, sf_dir, tmp_path):
    """Round-4 verdict #4: the reference's delivery guarantee is
    at-least-once replay + idempotent commit (fault-injection model of
    RedisStreamIT.java:95-120 — pause sink, insert, resume). Kill the
    composed flagship (a) mid-stream after the first epoch's sink write
    but before its checkpoint commit, and (b) between corpus epoch 0
    and 1 with a process swap + epoch-0 replay; both recovered runs
    must produce state/corpus/band-index identical to the uninterrupted
    run."""
    baseline = _run_flagship(spark, sf_dir, str(tmp_path / "a"))
    crashed_stream = _run_flagship(spark, sf_dir, str(tmp_path / "b"),
                                   crash_stream_epoch=0)
    crashed_corpus = _run_flagship(spark, sf_dir, str(tmp_path / "c"),
                                   crash_between_corpus_epochs=True)
    assert crashed_stream == baseline
    assert crashed_corpus == baseline

"""Incremental snapshot (streaming/incremental_snapshot.py): chunk plan,
watermark-window dedup, crash resume."""

import json

from pyspark.sql import functions as F

from debezium_server_spark.streaming.incremental_snapshot import (
    IncrementalSnapshotCoordinator,
    SnapshotRequest,
    chunk_filter,
    plan_chunks,
)


def _table(spark, n=20):
    return spark.range(1, n + 1).select(
        F.col("id").cast("int"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def test_chunks_partition_the_table(spark):
    t = _table(spark)
    bounds = plan_chunks(t, "id", chunk_size=6)
    n_chunks = len(bounds) + 1
    assert n_chunks >= 3
    seen = []
    for i in range(n_chunks):
        chunk_ids = [r.id for r in chunk_filter(t, "id", bounds, i).collect()]
        assert len(chunk_ids) <= 6 + 3  # percentile split points are approximate
        seen += chunk_ids
    assert sorted(seen) == list(range(1, 21))  # disjoint AND complete


def test_single_chunk_table(spark):
    t = _table(spark, n=3)
    assert plan_chunks(t, "id", chunk_size=100) == []
    assert chunk_filter(t, "id", [], 0).count() == 3


def _collecting_sink(store):
    def sink(df, epoch_id):
        store.append((epoch_id, {r["key"]["id"] for r in df.collect()}))
    return sink


def test_window_keys_are_skipped(spark, tmp_path):
    coord = IncrementalSnapshotCoordinator(
        str(tmp_path / "s.json"), chunks_per_batch=99
    )
    coord.request(SnapshotRequest(
        "customers", lambda: _table(spark), pk="id", key_columns=("id",),
        chunk_size=8,
    ))
    # a micro-batch that changed keys 5 and 6 while the snapshot ran
    batch = spark.createDataFrame(
        [("cdc.customers", (5,)), ("cdc.customers", (6,))],
        "destination string, key struct<id:int>",
    )
    delivered = []
    assert coord.on_batch(batch, _collecting_sink(delivered)) >= 2
    snap_ids = set().union(*[ids for _, ids in delivered])
    assert snap_ids == set(range(1, 21)) - {5, 6}, "log-superseded keys dropped"
    epochs = [e for e, _ in delivered]
    assert len(set(epochs)) == len(epochs) and all(e < 0 for e in epochs)


def test_resume_continues_at_next_chunk(spark, tmp_path):
    state = str(tmp_path / "s.json")
    req = SnapshotRequest(
        "customers", lambda: _table(spark), pk="id", key_columns=("id",),
        chunk_size=5,
    )
    c1 = IncrementalSnapshotCoordinator(state, chunks_per_batch=2)
    c1.request(req)
    first = []
    c1.on_batch(None, _collecting_sink(first))
    assert not json.load(open(state))["done"]

    # "crash": a fresh coordinator picks up from the state file
    c2 = IncrementalSnapshotCoordinator(state, chunks_per_batch=99)
    c2.resume({"customers": req})
    rest = []
    c2.on_batch(None, _collecting_sink(rest))
    assert json.load(open(state))["done"]
    all_ids = set().union(*[ids for _, ids in first + rest])
    assert all_ids == set(range(1, 21))
    # chunk epochs never repeat across the restart
    epochs = [e for e, _ in first + rest]
    assert len(set(epochs)) == len(epochs)


def test_signal_handler_chunk_size_override(spark, tmp_path):
    from debezium_server_spark.streaming.signals import Signal

    coord = IncrementalSnapshotCoordinator(str(tmp_path / "s.json"))
    base = SnapshotRequest("customers", lambda: _table(spark), pk="id")
    handler = coord.signal_handler({"customers": base})
    handler(Signal("s1", "execute-snapshot",
                   {"data-collections": ["customers", "unknown"],
                    "chunk-size": 4}), None)
    assert len(coord._pending) == 1
    assert coord._pending[0].chunk_size == 4

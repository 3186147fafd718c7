"""Hash-bucketed upsert sink: only buckets touched by a batch are
rewritten; untouched buckets hard-link (same inode) across versions."""

import os

from pyspark.sql import functions as F

from debezium_server_spark.sinks.parquet_sink import (
    BUCKET_COL,
    ParquetUpsertSink,
    VersionedParquetTable,
)
from tests.fixtures import DEST, event


def _batch(spark, events):
    from tests.fixtures import customers_changelog_df

    return customers_changelog_df(spark, events)


def _inodes(vdir):
    out = {}
    for b in os.listdir(vdir):
        if b.startswith(BUCKET_COL):
            out[b] = sorted(
                os.stat(os.path.join(vdir, b, f)).st_ino
                for f in os.listdir(os.path.join(vdir, b))
                if os.path.isfile(os.path.join(vdir, b, f))
            )
    return out


def test_untouched_buckets_hard_link_across_versions(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",), n_buckets=8)

    # epoch 0: seed many keys so several buckets exist
    seed = [event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
            for i in range(1, 33)]
    sink(_batch(spark, seed), 0)

    table = VersionedParquetTable(os.path.join(state, DEST), n_buckets=8)
    v1 = table.data_path()
    v1_inodes = _inodes(v1)
    assert len(v1_inodes) > 2, "seed should span several buckets"

    # epoch 1: touch exactly one key → at most one bucket rewritten
    sink(_batch(spark, [
        event(1, "u", (1, "n1", "x", "1@x.com"),
              (1, "n1b", "x", "1@x.com"), lsn=100),
    ]), 1)
    v2 = table.data_path()
    assert v2 != v1
    v2_inodes = _inodes(v2)

    touched = [b for b in v1_inodes
               if v2_inodes.get(b) != v1_inodes[b]]
    untouched = [b for b in v1_inodes if b not in touched]
    assert len(touched) == 1, f"exactly one bucket rewritten, got {touched}"
    for b in untouched:
        assert v2_inodes[b] == v1_inodes[b], "untouched bucket not linked"

    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert rows[1]["first_name"] == "n1b" and len(rows) == 32


def test_delete_all_keys_yields_empty_readable_state(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",), n_buckets=4)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1),
    ]), 0)
    sink(_batch(spark, [
        event(1, "d", (1, "a", "b", "a@x.com"), None, lsn=2),
    ]), 1)
    result = sink.read_table(spark, DEST)
    assert result is None or result.count() == 0


def test_bucket_count_persists_over_instances(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",), n_buckets=4)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1),
    ]), 0)
    # a later instance configured differently must follow the table meta
    other = ParquetUpsertSink(root_path=state, key_fields=("id",), n_buckets=64)
    assert other._table(DEST).n_buckets == 4
    other(_batch(spark, [
        event(2, "c", None, (2, "c", "d", "c@x.com"), lsn=2),
    ]), 1)
    assert {r["id"] for r in other.read_table(spark, DEST).collect()} == {1, 2}


def test_merge_reads_only_touched_buckets(spark, tmp_path):
    """The merge scan must carry a partition filter on the bucket column
    (partition pruning = the file-skipping story at 100 TB)."""
    state = str(tmp_path / "state")
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",), n_buckets=8)
    seed = [event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
            for i in range(1, 17)]
    sink(_batch(spark, seed), 0)
    table = sink._table(DEST)
    current = table.read(spark)
    one_bucket = current.filter(F.col(BUCKET_COL).isin([3]))
    plan = one_bucket._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "__bucket" in plan


def test_append_sink_compaction_preserves_rows(spark, tmp_path):
    from debezium_server_spark.sinks.parquet_sink import ParquetAppendSink

    root = str(tmp_path / "log")
    sink = ParquetAppendSink(root_path=root)
    for epoch in range(5):  # five micro-batches → ≥5 small files
        sink(_batch(spark, [
            event(epoch * 10 + i, "c", None,
                  (epoch * 10 + i, "n", "x", "n@x.com"), lsn=epoch * 10 + i)
            for i in range(3)
        ]), epoch)
    before = spark.read.parquet(root)
    n_rows = before.count()
    epochs = {r["__epoch"] for r in before.select("__epoch").distinct().collect()}

    stats = sink.compact(spark)
    dest, (files_before, files_after) = next(iter(stats.items()))
    assert files_before >= 5 and files_after < files_before

    after = spark.read.parquet(root)
    assert after.count() == n_rows
    assert {r["__epoch"] for r in after.select("__epoch").distinct().collect()} == epochs


def test_fanout_delivers_to_all_sinks(spark, tmp_path):
    from debezium_server_spark.sinks.base import FanoutSink
    from debezium_server_spark.sinks.parquet_sink import (
        ParquetAppendSink,
        ParquetUpsertSink,
    )

    upsert = ParquetUpsertSink(root_path=str(tmp_path / "state"), key_fields=("id",))
    applog = ParquetAppendSink(root_path=str(tmp_path / "log"))
    fan = FanoutSink([upsert, applog])

    fan(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1),
        event(1, "u", (1, "a", "b", "a@x.com"), (1, "a2", "b", "a@x.com"), lsn=2),
    ]), 0)

    rows = {r["id"]: r for r in upsert.read_table(spark, DEST).collect()}
    assert rows[1]["first_name"] == "a2", "upsert sink got latest state"
    log = spark.read.parquet(str(tmp_path / "log"))
    assert log.count() == 2, "append sink got every event"

"""Auto-maintenance policy (round-7 verdict #6): compaction/expiry/
vacuum applied INSIDE ParquetUpsertSink.handle under a declarative
MaintenancePolicy — probe bounded to touched buckets, cadence modular
in the epoch — with invariance tests where maintenance fires
mid-stream."""

import os

import pytest
from pyspark.sql import functions as F

from debezium_server_spark.sinks.parquet_sink import (
    BUCKET_COL,
    MaintenancePolicy,
    ParquetUpsertSink,
)

SCHEMA = ("destination string, key struct<id:long>, "
          "value struct<op:string, before struct<id:long,name:string,day:long>, "
          "after struct<id:long,name:string,day:long>, "
          "source struct<lsn:long>, ts_ms long>, "
          "headers array<struct<key:string,value:string>>, partition int")


def ev(key, op, name, lsn, day=0):
    after = (None if op == "d"
             else {"id": key, "name": name, "day": day})
    return {"destination": "t", "key": {"id": key},
            "value": {"op": op, "before": None, "after": after,
                      "source": {"lsn": lsn}, "ts_ms": lsn},
            "headers": [], "partition": 0}


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("fmt", ["versioned", "delta", "iceberg"])
def test_live_file_counts_probe(spark, tmp_path, fmt):
    """live_file_counts reports per-bucket live files; the restricted
    probe only reports requested buckets (the O(touched) contract)."""
    from debezium_server_spark.sinks.delta_log import DeltaLogTable
    from debezium_server_spark.sinks.iceberg_meta import IcebergTable
    from debezium_server_spark.sinks.parquet_sink import (
        VersionedParquetTable,
    )

    cls = {"versioned": VersionedParquetTable, "delta": DeltaLogTable,
           "iceberg": IcebergTable}[fmt]
    table = cls(str(tmp_path / fmt), n_buckets=4)
    df = spark.range(16).withColumn(BUCKET_COL,
                                    table.bucket_expr(("id",)))
    table.commit(df.coalesce(1), epoch_id=0)
    counts0 = table.live_file_counts()
    assert counts0 and all(n == 1 for n in counts0.values())
    # append-only commit stacks a second file into each bucket
    table.commit(df.coalesce(1), epoch_id=1, touched_buckets=[])
    counts1 = table.live_file_counts()
    assert set(counts1) == set(counts0)
    assert all(n == 2 for n in counts1.values())
    some = sorted(counts1)[:2]
    probe = table.live_file_counts(buckets=some)
    assert sorted(probe) == some


@pytest.mark.parametrize("fmt", ["versioned", "delta", "iceberg"])
def test_threshold_compaction_compacts_only_offending_buckets(
        spark, tmp_path, fmt):
    """The policy's compaction trigger: buckets over the file-count
    threshold compact to one file; untouched buckets keep their
    files; state is unchanged."""
    from debezium_server_spark.sinks.delta_log import DeltaLogTable
    from debezium_server_spark.sinks.iceberg_meta import IcebergTable
    from debezium_server_spark.sinks.parquet_sink import (
        VersionedParquetTable,
    )

    cls = {"versioned": VersionedParquetTable, "delta": DeltaLogTable,
           "iceberg": IcebergTable}[fmt]
    sink = ParquetUpsertSink(
        str(tmp_path / fmt), key_fields=("id",), n_buckets=4,
        table_format=fmt,
        maintenance=MaintenancePolicy(compact_files_per_bucket=1))
    table = cls(str(tmp_path / fmt / "t"), n_buckets=4)
    df = spark.range(16).withColumn(BUCKET_COL,
                                    table.bucket_expr(("id",)))
    table.commit(df.coalesce(1), epoch_id=0)
    table.commit(df.filter(F.col("id") < 0).coalesce(1), epoch_id=1,
                 touched_buckets=[])  # no rows: no new files
    # inflate every bucket to 2 files
    table.commit(df.coalesce(1), epoch_id=2, touched_buckets=[])
    before = table.live_file_counts()
    assert all(n == 2 for n in before.values())
    touched = sorted(before)[:2]
    sink._run_maintenance(spark, "t", table, epoch_id=3,
                          touched=touched)
    after = table.live_file_counts()
    for b in touched:
        assert after[b] == 1, f"bucket {b} not compacted: {after}"
    for b in set(before) - set(touched):
        assert after[b] == 2, "untouched bucket rewritten"


@pytest.mark.parametrize("fmt", ["versioned", "delta", "iceberg"])
def test_policy_mid_stream_invariance(spark, tmp_path, fmt):
    """E2E: the same epoch sequence with an aggressive policy
    (threshold compaction + per-epoch vacuum) must materialize the
    IDENTICAL final state as the policy-free run — maintenance firing
    mid-stream may never change query results, and epoch-idempotent
    replay must still be detected afterwards."""
    batches = [
        [ev(1, "c", "a", 1), ev(2, "c", "b", 2), ev(3, "c", "c", 3)],
        [ev(1, "u", "a2", 4), ev(4, "c", "d", 5)],
        [ev(2, "d", None, 6), ev(5, "c", "e", 7)],
        [ev(5, "u", "e2", 8), ev(6, "c", "f", 9)],
    ]
    pol = MaintenancePolicy(compact_files_per_bucket=1,
                            vacuum_every_epochs=2,
                            vacuum_retention_seconds=0.0)
    states = {}
    for name, maint in (("plain", None), ("policy", pol)):
        sink = ParquetUpsertSink(str(tmp_path / f"{fmt}_{name}"),
                                 key_fields=("id",), n_buckets=4,
                                 table_format=fmt, maintenance=maint)
        for epoch, rows in enumerate(batches):
            sink(_batch(spark, rows), epoch)
        # replay of the last epoch is still detected as idempotent
        sink(_batch(spark, batches[-1]), len(batches) - 1)
        states[name] = sorted(
            (r["id"], r["name"])
            for r in sink.read_table(spark, "t").collect())
    assert states["policy"] == states["plain"]
    assert states["plain"] == [(1, "a2"), (3, "c"), (4, "d"),
                               (5, "e2"), (6, "f")]


def test_expire_policy_fires_on_cadence(spark, tmp_path):
    """TTL expiry wired into handle: on every Kth epoch rows matching
    the condition vanish; other rows survive."""
    sink = ParquetUpsertSink(
        str(tmp_path / "ttl"), key_fields=("id",), n_buckets=4,
        maintenance=MaintenancePolicy(expire_every_epochs=2,
                                      expire_condition="day < 10"))
    sink(_batch(spark, [ev(1, "c", "old", 1, day=1),
                        ev(2, "c", "new", 2, day=20)]), 1)  # no fire
    assert sorted(r["id"] for r in
                  sink.read_table(spark, "t").collect()) == [1, 2]
    sink(_batch(spark, [ev(3, "c", "new2", 3, day=30)]), 2)  # fires
    assert sorted(r["id"] for r in
                  sink.read_table(spark, "t").collect()) == [2, 3]


def test_vacuum_policy_deletes_unreferenced_files(spark, tmp_path):
    """Delta layer: per-epoch vacuum keeps the physical file count
    bounded — files superseded by later merges are removed from disk
    (retention 0: embedded single-writer)."""
    pol = MaintenancePolicy(vacuum_every_epochs=1,
                            vacuum_retention_seconds=0.0)
    roots = {}
    for name, maint in (("plain", None), ("vac", pol)):
        sink = ParquetUpsertSink(str(tmp_path / name),
                                 key_fields=("id",), n_buckets=2,
                                 table_format="delta", maintenance=maint)
        for epoch in range(5):
            sink(_batch(spark, [ev(1, "c" if epoch == 0 else "u",
                                   f"v{epoch}", epoch + 1)]), epoch)
        roots[name] = str(tmp_path / name / "t")
        assert [r["name"] for r in
                sink.read_table(spark, "t").collect()] == ["v4"]

    def nfiles(root):
        return sum(1 for dp, _, fs in os.walk(root) for f in fs
                   if f.endswith(".parquet") and "_delta_log" not in dp)

    assert nfiles(roots["vac"]) < nfiles(roots["plain"])


def test_config_surface_builds_policy(tmp_path):
    """The dotted property surface reaches the sink as a typed
    MaintenancePolicy (strings coerced)."""
    from debezium_server_spark.sinks import get_sink

    sink = get_sink(
        "parquet-upsert", root_path=str(tmp_path),
        key_fields=("id",),
        maintenance_compact_files_per_bucket="8",
        maintenance_expire_every_epochs="100",
        maintenance_expire_condition="day < 10",
        maintenance_vacuum_every_epochs="50",
        maintenance_vacuum_retention_seconds="3600",
        maintenance_keep_snapshots="3")
    pol = sink.maintenance
    assert pol == MaintenancePolicy(
        compact_files_per_bucket=8, expire_every_epochs=100,
        expire_condition="day < 10", vacuum_every_epochs=50,
        vacuum_retention_seconds=3600.0, keep_snapshots=3)


def test_catalog_entry_pins_auto_maintenance_policy(spark, sf_dir):
    """PIN-TEST GATE: `lake_auto_maintenance_roundtrip`'s policy
    (epochs: snapshot, +1.0 twice on %7 keys as ABSOLUTE upserts,
    +0.5 on %11 keys, then %13 TTL expiry; always-compact threshold
    firing between merges) recomputed independently with pandas from
    the raw orders parquet — maintenance may never change the
    upsert-semantics result."""
    import os

    import pandas as pd

    from debezium_server_spark.plans.catalog import CATALOG

    got = (CATALOG["lake_auto_maintenance_roundtrip"]
           .spark_fn(spark, sf_dir).toPandas()
           .sort_values("bucket").reset_index(drop=True))

    raw = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_orderkey", "o_totalprice"])
    k = raw["o_orderkey"]
    price = (raw["o_totalprice"]
             + (k % 7 == 0) * 2.0 + (k % 11 == 0) * 0.5)
    kept = k % 13 != 0
    exp = (pd.DataFrame({"bucket": (k[kept] % 16).astype("int64"),
                         "p": price[kept]})
           .groupby("bucket", as_index=False)
           .agg(n_rows=("p", "size"), sum_price=("p", "sum")))
    exp["sum_price"] = (exp["sum_price"] * 10000).apply(
        lambda v: float(int(v)) / 10000)
    assert list(got["bucket"]) == list(exp["bucket"])
    assert list(got["n_rows"]) == list(exp["n_rows"])
    for g, e in zip(got["sum_price"], exp["sum_price"]):
        assert abs(g - e) < 1e-3, (g, e)

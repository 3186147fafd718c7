"""Differential test of the three ParquetUpsertSink storage layers:
the SAME randomized CDC batch sequence (creates/updates/deletes with
out-of-order LSNs, multi-epoch) must materialize IDENTICAL final state
through `versioned`, `delta`, and `iceberg` — the storage layer is an
implementation detail of the epoch-idempotent MERGE contract, so any
divergence is a bug in one of the table implementations (lost DELETED
entry, wrong manifest carry-forward, stale checkpoint seed, ...)."""

import random

import pytest

from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
from tests.fixtures import DEST, event


def _random_batches(seed: int, n_epochs: int = 4, keyspace: int = 30):
    """Deterministic random CDC stream: per-key last-op wins by lsn."""
    rng = random.Random(seed)
    lsn = 0
    alive: set[int] = set()
    batches = []
    for _ in range(n_epochs):
        batch = []
        for _ in range(rng.randint(3, 12)):
            lsn += 1
            k = rng.randint(1, keyspace)
            if k in alive and rng.random() < 0.3:
                batch.append(event(k, "d", (k, f"n{k}", "x", f"{k}@x.com"),
                                   None, lsn=lsn))
                alive.discard(k)
            elif k in alive:
                batch.append(event(k, "u", (k, f"n{k}", "x", f"{k}@x.com"),
                                   (k, f"n{k}v{lsn}", "x", f"{k}@x.com"),
                                   lsn=lsn))
            else:
                batch.append(event(k, "c", None,
                                   (k, f"n{k}v{lsn}", "x", f"{k}@x.com"),
                                   lsn=lsn))
                alive.add(k)
        batches.append(batch)
    return batches


@pytest.mark.parametrize("seed", [11, 23])
def test_three_storage_layers_materialize_identically(spark, tmp_path, seed):
    from tests.fixtures import customers_changelog_df

    batches = _random_batches(seed)
    states = {}
    for fmt in ("versioned", "delta", "iceberg"):
        sink = ParquetUpsertSink(root_path=str(tmp_path / fmt),
                                 key_fields=("id",), n_buckets=4,
                                 table_format=fmt)
        for epoch, batch in enumerate(batches):
            sink(customers_changelog_df(spark, batch), epoch)
        out = sink.read_table(spark, DEST)
        states[fmt] = sorted(
            (r["id"], r["first_name"], r["last_name"], r["email"])
            for r in out.select("id", "first_name", "last_name",
                                "email").collect())
    assert states["versioned"] == states["delta"] == states["iceberg"]
    assert states["versioned"], "empty final state defeats the test"


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_maintenance_preserves_state(spark, tmp_path, fmt):
    """Compaction (and for Iceberg, snapshot expiry + orphan vacuum)
    are REARRANGEMENTS: after any random batch history, state before
    == state after, epoch bookkeeping intact."""
    from tests.fixtures import customers_changelog_df

    sink = ParquetUpsertSink(root_path=str(tmp_path / fmt),
                             key_fields=("id",), n_buckets=4,
                             table_format=fmt)
    for epoch, batch in enumerate(_random_batches(seed=7)):
        sink(customers_changelog_df(spark, batch), epoch)
    table = sink._table(DEST)
    before = sorted((r["id"], r["first_name"])
                    for r in sink.read_table(spark, DEST).collect())
    last = table.last_epoch()
    table.compact(spark)
    if fmt == "iceberg":
        table.expire_snapshots(keep_last=1)
        table.vacuum(retention_seconds=0)
    after_table = sink._table(DEST)  # reopen from disk
    after = sorted((r["id"], r["first_name"])
                   for r in sink.read_table(spark, DEST).collect())
    assert after == before
    assert after_table.last_epoch() == last


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_erase_keys_works_on_lake_layers(spark, tmp_path, fmt):
    """GDPR hard-delete (erase_keys) over the lake storage layers:
    only the targets vanish, the erase is a normal bucket-touched
    commit, and a second erase is a no-op."""
    from tests.fixtures import customers_changelog_df

    sink = ParquetUpsertSink(root_path=str(tmp_path / fmt),
                             key_fields=("id",), n_buckets=4,
                             table_format=fmt)
    sink(customers_changelog_df(spark, [
        event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
        for i in range(1, 11)
    ]), 0)
    erase = spark.createDataFrame([(3,), (7,)], "id long")
    n = sink.erase_keys(spark, DEST, erase)
    assert n == 2
    left = sorted(r["id"] for r in sink.read_table(spark, DEST).collect())
    assert left == [1, 2, 4, 5, 6, 8, 9, 10]
    assert sink.erase_keys(spark, DEST, erase) == 0


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_lake_fsck_clean_then_detects_corruption(spark, tmp_path, fmt):
    """tools/lake_fsck.py: clean after a real history (incl. compaction
    + evolution), and it actually DETECTS a missing/shrunk data file."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import lake_fsck

    from tests.fixtures import customers_changelog_df

    sink = ParquetUpsertSink(root_path=str(tmp_path / fmt),
                             key_fields=("id",), n_buckets=4,
                             table_format=fmt)
    for epoch, batch in enumerate(_random_batches(seed=3)):
        sink(customers_changelog_df(spark, batch), epoch)
    table = sink._table(DEST)
    table.compact(spark)
    assert lake_fsck.fsck(table.path) == []
    # corrupt: truncate one live data file
    if fmt == "delta":
        rel = sorted(table._live_files())[0]
        victim = os.path.join(table.path, rel)
    else:
        meta = table._current_metadata()
        victim = sorted(table._live_files(
            meta, table.current_version()))[0]
    with open(victim, "r+b") as f:
        f.truncate(10)
    errors = lake_fsck.fsck(table.path)
    assert errors and any("mismatch" in e or "missing" in e
                          for e in errors)


def test_lake_fsck_detects_corrupt_delta_checkpoint(spark, tmp_path):
    """The checkpoint-vs-JSON-replay check must replay from JSON ALONE
    (ADVICE r06: seeding the replay from the checkpoint under test was
    a tautology that could never fire). Pin: drop one `add` row from a
    written checkpoint and assert fsck reports the divergence."""
    import os
    import sys

    import pyarrow.parquet as pq_mod
    import pyarrow as pa

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import lake_fsck

    from debezium_server_spark.sinks.delta_log import (
        BUCKET_COL, DeltaLogTable)

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4,
                          checkpoint_interval=2)
    for epoch in range(2):  # checkpoint lands at v1
        df = spark.range(epoch * 4, epoch * 4 + 4).withColumn(
            BUCKET_COL, table.bucket_expr(("id",)))
        table.commit(df, epoch_id=epoch, touched_buckets=[])
    ck = table._read_last_checkpoint()
    assert ck is not None
    assert lake_fsck.fsck(table.path) == []
    # corrupt: remove the last `add` row from the checkpoint parquet
    ck_path = table._checkpoint_path(ck["version"])
    t = pq_mod.read_table(ck_path)
    rows = t.to_pylist()
    add_idx = [i for i, r in enumerate(rows) if r["add"] is not None]
    rows.pop(add_idx[-1])
    pq_mod.write_table(
        pa.Table.from_pylist(rows, schema=t.schema), ck_path)
    errors = lake_fsck.fsck(table.path)
    assert any("checkpoint live set != JSON replay" in e for e in errors)


@pytest.mark.parametrize("n_epochs,keyspace", [(4, 30), (8, 120)])
def test_iceberg_reader_is_oracle_for_delta_after_maintenance(
        spark, tmp_path, n_epochs, keyspace):
    """Delta external validation, cheapest available step (round-6
    verdict #7): no Delta engine exists in this container, but the
    Iceberg twin's reader IS externally validated (the bundled Java
    Avro jar reads its manifests) — so after the same epoch sequence
    PLUS maintenance (full compaction, snapshot expiry, vacuum) PLUS a
    GDPR erase on both layers, the Iceberg read serves as the oracle
    for the Delta read, at two history scales."""
    from tests.fixtures import customers_changelog_df

    batches = _random_batches(seed=31, n_epochs=n_epochs,
                              keyspace=keyspace)
    states = {}
    for fmt in ("delta", "iceberg"):
        sink = ParquetUpsertSink(root_path=str(tmp_path / fmt),
                                 key_fields=("id",), n_buckets=4,
                                 table_format=fmt)
        for epoch, batch in enumerate(batches):
            sink(customers_changelog_df(spark, batch), epoch)
        table = sink._table(DEST)
        table.compact(spark)  # full rewrite on both layers
        if fmt == "iceberg":
            table.expire_snapshots(keep_last=1)
        table.vacuum(retention_seconds=0)
        erase = spark.createDataFrame([(5,), (11,)], "id long")
        sink.erase_keys(spark, DEST, erase)
        states[fmt] = sorted(
            (r["id"], r["first_name"], r["last_name"], r["email"])
            for r in sink.read_table(spark, DEST)
            .select("id", "first_name", "last_name", "email").collect())
    assert states["delta"] == states["iceberg"]
    assert states["delta"], "empty final state defeats the test"
    assert not any(i in (5, 11) for i, *_ in states["delta"])


def test_lake_fsck_detects_checkpoint_record_drift(spark, tmp_path):
    """Beyond the path-set check: an add record whose `size` disagrees
    between checkpoint and JSON replay (same path) must be flagged."""
    import os
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import lake_fsck

    from debezium_server_spark.sinks.delta_log import (
        BUCKET_COL, DeltaLogTable)

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4,
                          checkpoint_interval=2)
    for epoch in range(2):
        df = spark.range(epoch * 4, epoch * 4 + 4).withColumn(
            BUCKET_COL, table.bucket_expr(("id",)))
        table.commit(df, epoch_id=epoch, touched_buckets=[])
    ck = table._read_last_checkpoint()
    ck_path = table._checkpoint_path(ck["version"])
    t = pq_mod.read_table(ck_path)
    rows = t.to_pylist()
    for r in rows:
        if r["add"] is not None:
            r["add"]["size"] += 7  # drift the record, keep the path
            break
    pq_mod.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                       ck_path)
    errors = lake_fsck.fsck(table.path)
    assert any("disagrees with JSON on size" in e for e in errors)


@pytest.mark.parametrize("fmt", ["versioned", "delta", "iceberg"])
def test_key_dtype_widening_upserts_not_duplicates(spark, tmp_path, fmt):
    """Upstream key widening (int -> long envelopes after a source
    ALTER) must keep hashing the same logical key into its original
    bucket: the bucket function is pinned to the creation-time key
    dtype, so the batch keys are cast back to the stored type (before
    this fix, the widened key hashed to a DIFFERENT bucket — stranding
    the old row — and the long-typed file crashed the next merge
    read). A key the stored type cannot represent raises a migration
    error instead of silently rehashing."""
    sch_int = (
        "destination string, key struct<id:int>, "
        "value struct<op:string, before struct<id:int,name:string>, "
        "after struct<id:int,name:string>, source struct<lsn:long>, "
        "ts_ms long>, "
        "headers array<struct<key:string,value:string>>, partition int")
    sch_long = sch_int.replace("id:int", "id:long")

    def ev(key, name, lsn):
        return {"destination": DEST, "key": {"id": key},
                "value": {"op": "u", "before": None,
                          "after": {"id": key, "name": name},
                          "source": {"lsn": lsn}, "ts_ms": lsn},
                "headers": [], "partition": 0}

    sink = ParquetUpsertSink(root_path=str(tmp_path / fmt),
                             key_fields=("id",), n_buckets=8,
                             table_format=fmt)
    sink(spark.createDataFrame([ev(5, "a", 1)], sch_int), 0)
    sink(spark.createDataFrame([ev(5, "b", 2)], sch_long), 1)
    rows = sink.read_table(spark, DEST).collect()
    assert [(r["id"], r["name"]) for r in rows] == [(5, "b")]
    with pytest.raises(ValueError, match="migration"):
        sink(spark.createDataFrame([ev(2 ** 40, "c", 3)], sch_long), 2)


@pytest.mark.parametrize("fmt", ["versioned", "delta", "iceberg"])
def test_flat_table_explicit_append_is_not_a_full_rewrite(
        spark, tmp_path, fmt):
    """Found round 8 (while pinning the ADVICE flat-compact fix): on
    an UNBUCKETED frame all three layers silently overrode the
    caller's explicit `touched_buckets=[]` (append, remove nothing)
    into `None` (full rewrite) — a flat-table append deleted the
    table's prior contents. The default (None) must stay a full
    rewrite; the explicit empty list must append."""
    from debezium_server_spark.sinks.delta_log import DeltaLogTable
    from debezium_server_spark.sinks.iceberg_meta import IcebergTable
    from debezium_server_spark.sinks.parquet_sink import VersionedParquetTable

    cls = {"versioned": VersionedParquetTable, "delta": DeltaLogTable,
           "iceberg": IcebergTable}[fmt]
    table = cls(str(tmp_path / fmt), n_buckets=4)
    table.commit(spark.range(0, 4), epoch_id=0)
    table.commit(spark.range(4, 8), epoch_id=1, touched_buckets=[])
    got = sorted(r["id"] for r in table.read(spark).collect())
    assert got == list(range(8)), f"{fmt}: flat append lost rows: {got}"
    # the default stays a full rewrite
    table.commit(spark.range(100, 102), epoch_id=2)
    got = sorted(r["id"] for r in table.read(spark).collect())
    assert got == [100, 101], f"{fmt}: default full rewrite broken: {got}"


@pytest.mark.parametrize("fmt", ["versioned", "delta", "iceberg"])
def test_read_schema_is_control_plane_truth(spark, tmp_path, fmt):
    """read_schema (the hot paths' O(1) substitute for the full read's
    O(live-files) file index) must agree with the full read on names
    and dtypes — before AND after schema evolution — and be None on an
    empty table."""
    from pyspark.sql import functions as F

    from debezium_server_spark.sinks.delta_log import DeltaLogTable
    from debezium_server_spark.sinks.iceberg_meta import IcebergTable
    from debezium_server_spark.sinks.parquet_sink import (
        BUCKET_COL,
        VersionedParquetTable,
    )

    cls = {"versioned": VersionedParquetTable, "delta": DeltaLogTable,
           "iceberg": IcebergTable}[fmt]
    table = cls(str(tmp_path / fmt), n_buckets=4)
    assert table.read_schema(spark) is None

    df = spark.range(8).withColumn("v", F.lit(1).cast("int")).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df, epoch_id=0)

    def dtypes(schema):
        return {f.name: f.dataType.simpleString() for f in schema.fields}

    full = table.read(spark)
    assert dtypes(table.read_schema(spark)) == dtypes(full.schema)

    # evolution: a new column lands in every bucket; the control-plane
    # schema must follow on delta/iceberg (versioned is footer-based —
    # key dtypes, its only hot-path contract, are evolution-stable)
    df2 = (spark.range(8, 16).withColumn("v", F.lit(2).cast("int"))
           .withColumn("extra", F.lit("x"))
           .withColumn(BUCKET_COL, table.bucket_expr(("id",))))
    table.commit(df2, epoch_id=1)  # full rewrite at the evolved schema
    got = dtypes(table.read_schema(spark))
    assert got["id"] == "bigint"  # key dtype stable in all layers
    if fmt != "versioned":
        assert got == dtypes(table.read(spark).schema)
        assert "extra" in got

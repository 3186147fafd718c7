"""Minimal Iceberg-v2 writer (sinks/iceberg_meta.py): metadata /
manifest structure per the public table spec, the epoch-idempotent
MERGE contract on the swapped storage layer, O(touched-bucket)
manifest writes with manifest reuse, time travel, orphan vacuum, and
the put-if-absent commit primitive. Unlike the Delta twin, the Avro
control files get EXTERNAL-reader validation: the avro-1.12.1.jar
bundled with Spark reads every manifest and manifest list back via
org.apache.avro.file.DataFileReader."""

import json
import os

import pytest
from pyspark.sql import functions as F

from debezium_server_spark.sinks.iceberg_meta import (
    BUCKET_COL,
    ST_ADDED,
    ST_DELETED,
    IcebergTable,
    iceberg_schema_of,
)
from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
from tests.fixtures import DEST, event


def _batch(spark, events):
    from tests.fixtures import customers_changelog_df

    return customers_changelog_df(spark, events)


def _sink(tmp_path, n_buckets=8):
    return ParquetUpsertSink(root_path=str(tmp_path / "state"),
                             key_fields=("id",), n_buckets=n_buckets,
                             table_format="iceberg")


def _table(tmp_path, n_buckets=8):
    return IcebergTable(str(tmp_path / "state" / DEST),
                        n_buckets=n_buckets)


def _metadata(table):
    return table._current_metadata()


def _manifest_lists(table):
    meta = _metadata(table)
    return [table._read_manifest_list(
                table._snapshot(meta, v)["manifest-list"])
            for v in range(1, table.current_version() + 1)]


# ------------------------------------------------------ sink contract


def test_upsert_delete_state_matches_versioned_contract(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
        for i in range(1, 9)
    ]), 0)
    sink(_batch(spark, [
        event(1, "u", (1, "n1", "x", "1@x.com"),
              (1, "n1b", "x", "1@x.com"), lsn=100),
        event(2, "d", (2, "n2", "x", "2@x.com"), None, lsn=101),
    ]), 1)
    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert len(rows) == 7 and 2 not in rows
    assert rows[1]["first_name"] == "n1b"


def test_epoch_idempotent_replay(spark, tmp_path):
    sink = _sink(tmp_path)
    batch = _batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)])
    sink(batch, 0)
    v_after = _table(tmp_path).current_version()
    sink(batch, 0)  # exact replay of a committed epoch: skipped
    table = _table(tmp_path)
    assert table.current_version() == v_after
    assert table.last_epoch() == 0


# ------------------------------------------------- spec-level structure


def test_metadata_json_is_spec_shaped(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)]), 0)
    table = _table(tmp_path)
    meta = _metadata(table)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == meta["snapshots"][0]["snapshot-id"]
    assert meta["last-sequence-number"] == 1
    # schema carries spec field-ids, depth-first and unique
    fields = meta["schemas"][0]["fields"]
    ids = [f["id"] for f in fields]
    assert len(set(ids)) == len(ids) and meta["last-column-id"] >= max(ids)
    # identity partition spec on the bucket column
    (spec,) = meta["partition-specs"]
    (pf,) = spec["fields"]
    assert pf["name"] == BUCKET_COL and pf["transform"] == "identity"
    assert pf["source-id"] in ids
    # hint file points at the latest metadata
    hint = open(os.path.join(table.meta_dir, "version-hint.text")).read()
    assert int(hint) == 1 and os.path.exists(table._meta_path(1))
    # epoch rides the snapshot summary
    assert meta["snapshots"][0]["summary"]["dss.epoch"] == "0"
    assert meta["snapshots"][0]["summary"]["operation"] == "append"


def test_touched_bucket_commit_reuses_untouched_manifests(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
        for i in range(1, 40)
    ]), 0)
    sink(_batch(spark, [
        event(1, "u", (1, "n1", "x", "1@x.com"),
              (1, "n1x", "x", "1@x.com"), lsn=99)]), 1)
    table = _table(tmp_path)
    lists = _manifest_lists(table)
    paths_v1 = {m["manifest_path"] for m in lists[0]}
    paths_v2 = {m["manifest_path"] for m in lists[1]}
    # exactly one manifest replaced: one new path, rest carried forward
    new = paths_v2 - paths_v1
    assert len(new) == 1
    assert len(paths_v1 & paths_v2) == len(paths_v1) - 1
    # the new manifest holds ADDED files plus DELETED entries for the
    # replaced bucket files, deleted entries keeping their ORIGINAL
    # data sequence number (spec: sequence-number inheritance)
    entries = table._read_manifest(new.pop())
    statuses = {e["status"] for e in entries}
    assert statuses == {ST_ADDED, ST_DELETED}
    for e in entries:
        if e["status"] == ST_DELETED:
            assert e["sequence_number"] == 1
        else:
            assert e["sequence_number"] == 2
    # partition summaries carry the bucket bound for pruning
    for m in lists[1]:
        (summary,) = m["partitions"]
        assert summary["lower_bound"] == summary["upper_bound"]


def test_time_travel_and_reopen(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)]), 0)
    sink(_batch(spark, [
        event(1, "u", (1, "a", "b", "a@x.com"),
              (1, "a2", "b", "a@x.com"), lsn=2)]), 1)
    table = _table(tmp_path)
    assert table.read(spark, version=1).collect()[0]["first_name"] == "a"
    assert table.read(spark, version=2).collect()[0]["first_name"] == "a2"
    with pytest.raises(ValueError, match="not committed"):
        table.read(spark, version=3)
    fresh = IcebergTable(table.path)  # reopen from disk only
    assert fresh.n_buckets == 8
    assert fresh.current_version() == 2 and fresh.last_epoch() == 1


def test_concurrent_writer_loses_put_if_absent(spark, tmp_path):
    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    df = spark.range(4).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df, epoch_id=0)
    # another writer committed version 2 in between
    loser = IcebergTable(str(tmp_path / "t"))
    loser.read(spark)  # snapshot read pins the version it saw
    table2 = IcebergTable(str(tmp_path / "t"))
    table2.commit(df, epoch_id=1)
    with pytest.raises(FileExistsError):
        loser.commit(df, epoch_id=2)


def test_vacuum_removes_only_old_orphans(spark, tmp_path):
    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    df = spark.range(8).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df, epoch_id=0)
    orphan = os.path.join(table.data_dir, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    os.utime(orphan, (0, 0))  # ancient
    fresh_orphan = os.path.join(table.data_dir, "part-orphan2.parquet")
    with open(fresh_orphan, "wb") as f:
        f.write(b"x")
    deleted = table.vacuum()
    assert deleted == [orphan]
    assert os.path.exists(fresh_orphan)  # inside the retention window
    assert table.read(spark).count() == 8  # referenced files untouched


# -------------------------------------------- external Java validation


def test_java_avro_reads_manifests(spark, tmp_path):
    """The bundled avro-1.12.1.jar (the canonical implementation) must
    read every manifest list and manifest this writer produces — the
    external-reader validation the Delta twin cannot have."""
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
        for i in range(1, 10)
    ]), 0)
    table = _table(tmp_path)
    jvm = spark.sparkContext._jvm

    def java_read(path):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader())
        out = []
        while reader.hasNext():
            out.append(reader.next())
        reader.close()
        return out

    meta = _metadata(table)
    list_path = os.path.join(
        table.path, table._snapshot(meta, 1)["manifest-list"])
    jlist = java_read(list_path)
    plist = table._read_manifest_list(
        table._snapshot(meta, 1)["manifest-list"])
    assert len(jlist) == len(plist) >= 1
    for jrec, prec in zip(jlist, plist):
        assert str(jrec.get("manifest_path")) == prec["manifest_path"]
        assert jrec.get("added_files_count") == prec["added_files_count"]
        jentries = java_read(
            os.path.join(table.path, prec["manifest_path"]))
        pentries = table._read_manifest(prec["manifest_path"])
        assert len(jentries) == len(pentries)
        for je, pe in zip(jentries, pentries):
            assert je.get("status") == pe["status"]
            jdf = je.get("data_file")
            assert str(jdf.get("file_path")) == pe["data_file"]["file_path"]
            assert (jdf.get("record_count")
                    == pe["data_file"]["record_count"])


# -------------------------------------------------------- schema mapping


def test_iceberg_schema_of_types():
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.ArrayType(T.IntegerType())),
        T.StructField("d", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("e", T.StructType([
            T.StructField("x", T.DecimalType(14, 4))])),
        T.StructField("f", T.TimestampType()),
    ])
    out, last = iceberg_schema_of(schema)
    by_name = {f["name"]: f for f in out["fields"]}
    assert by_name["a"]["required"] and by_name["a"]["type"] == "long"
    assert by_name["c"]["type"]["type"] == "list"
    assert by_name["d"]["type"]["type"] == "map"
    assert by_name["e"]["type"]["fields"][0]["type"] == "decimal(14, 4)"
    assert by_name["f"]["type"] == "timestamptz"
    ids = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("id", "element-id", "key-id", "value-id"):
                    ids.append(v)
                walk(v)
        elif isinstance(node, list):
            for x in node:
                walk(x)

    walk(out)
    assert sorted(ids) == list(range(1, last + 1))  # dense and unique


# ----------------------------------------------- catalog-entry pin test


def test_catalog_entry_pins_roundtrip_policy(spark):
    """PIN-TEST GATE: `iceberg_upsert_roundtrip`'s policy (two-commit
    bucket-touched upsert + time travel, bucket = o_orderkey%16,
    +1.0 on o_orderkey%7==0 rows in version 2 only) recomputed
    independently with pandas from the raw parquet."""
    import math

    import pandas as pd

    from debezium_server_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    got = (CATALOG["iceberg_upsert_roundtrip"].spark_fn(spark, sf)
           .toPandas().sort_values(["version", "bucket"])
           .reset_index(drop=True))
    orders = pd.read_parquet(sf + "/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    expect_rows = []
    for version in (1, 2):
        d = orders.copy()
        if version == 2:
            d.loc[d.o_orderkey % 7 == 0, "o_totalprice"] += 1.0
        d["bucket"] = d.o_orderkey % 16
        for b, grp in d.groupby("bucket"):
            from decimal import Decimal

            s = float(sum(Decimal(repr(p)) for p in grp.o_totalprice))
            expect_rows.append((version, int(b), len(grp),
                                math.floor(s * 10000) / 10000))
    expect = pd.DataFrame(expect_rows, columns=[
        "version", "bucket", "n_rows", "sum_price"])
    assert len(got) == len(expect) == 32
    for g, e in zip(got.itertuples(index=False),
                    expect.itertuples(index=False)):
        assert (g.version, g.bucket, g.n_rows) == (e.version, e.bucket,
                                                   e.n_rows)
        assert abs(g.sum_price - e.sum_price) < 1e-6, (g, e)


# ------------------------------------------------------ schema evolution


def test_schema_evolution_id_stable(spark, tmp_path):
    """Adding a column appends a NEW schema under a new schema-id:
    existing columns keep their ids (the spec's column-identity rule),
    the new column draws a fresh id past last-column-id, historic
    snapshots keep their schema-id, and reads merge both file
    generations."""
    from pyspark.sql import functions as F

    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    df1 = spark.range(4).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df1, epoch_id=0)
    meta1 = table._current_metadata()
    ids_v1 = {f["name"]: f["id"] for f in meta1["schemas"][0]["fields"]}

    df2 = (spark.range(4, 8)
           .withColumn("extra", F.lit("x"))
           .withColumn(BUCKET_COL, table.bucket_expr(("id",))))
    table.commit(df2, epoch_id=1, touched_buckets=[])
    meta2 = table._current_metadata()
    assert len(meta2["schemas"]) == 2
    new_schema = next(s for s in meta2["schemas"]
                      if s["schema-id"] == meta2["current-schema-id"])
    ids_v2 = {f["name"]: f["id"] for f in new_schema["fields"]}
    for name, fid in ids_v1.items():
        assert ids_v2[name] == fid  # stable across evolution
    assert ids_v2["extra"] > meta1["last-column-id"]
    assert meta2["last-column-id"] >= ids_v2["extra"]
    # snapshot schema-ids: old snapshot keeps 0, new one points at new
    snaps = sorted(meta2["snapshots"], key=lambda s: s["sequence-number"])
    assert snaps[0]["schema-id"] == 0
    assert snaps[1]["schema-id"] == meta2["current-schema-id"]
    # merged read: old rows carry null extra, new rows carry 'x'
    out = table.read(spark)
    assert out.count() == 8
    assert out.filter(out.extra.isNull()).count() == 4
    # an identical-schema commit does NOT append a third schema
    table.commit(df2, epoch_id=2, touched_buckets=[])
    assert len(table._current_metadata()["schemas"]) == 2


# --------------------------------------------------------- maintenance


def test_expire_snapshots_and_version_semantics(spark, tmp_path):
    """Expiry drops old snapshots in a metadata-only version: the
    commit counter (sequence numbers) is unaffected, expired time
    travel raises, retained reads still work, and a later commit keeps
    numbering correctly despite the file/commit version divergence."""
    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    df = spark.range(6).withColumn(BUCKET_COL, table.bucket_expr(("id",)))
    for epoch in range(3):
        table.commit(df, epoch_id=epoch)
    expired = table.expire_snapshots(keep_last=2)
    assert len(expired) == 1
    fresh = IcebergTable(table.path)
    assert fresh.current_version() == 3  # commits, not metadata files
    assert fresh._hint_version() == 4    # 3 commits + 1 expiry
    with pytest.raises(ValueError, match="expired"):
        fresh.read(spark, version=1)
    assert fresh.read(spark, version=2).count() == 6
    v = fresh.commit(df, epoch_id=3)
    assert v == 4 and fresh._hint_version() == 5
    assert fresh.read(spark).count() == 6
    # snapshot-expired data files become vacuumable orphans
    orphans = fresh.vacuum(retention_seconds=0)
    assert orphans  # the expired snapshot exclusively owned files
    assert fresh.read(spark).count() == 6  # live data untouched


def test_compact_rewrites_buckets_without_data_change(spark, tmp_path):
    """rewriteDataFiles: stacked append files collapse to one per
    bucket under a `replace` snapshot; rows, epoch idempotence, and
    history all survive."""
    from pyspark.sql import functions as F

    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    df = spark.range(20).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df.filter(F.col("id") < 10), epoch_id=7)
    # append more files to the same buckets (stacked manifests)
    table.commit(df.filter(F.col("id") >= 10), epoch_id=8,
                 touched_buckets=[])
    before = table.read(spark)
    n_files_before = len(table._live_files(
        table._current_metadata(), table.current_version()))
    assert before.count() == 20
    v = table.compact(spark)
    assert v == 3
    meta = table._current_metadata()
    snap = table._snapshot(meta, v)
    assert snap["summary"]["operation"] == "replace"
    files = table._live_files(meta, v)
    assert len(files) < n_files_before
    buckets_present = {r[0] for r in table.read(spark)
                       .select(BUCKET_COL).distinct().collect()}
    assert len(files) == len(buckets_present)  # one file per bucket
    assert table.read(spark).count() == 20
    assert table.last_epoch() == 8  # compaction preserves the epoch


def test_version_hint_heals_forward_after_crash(spark, tmp_path):
    """A writer that landed v2.metadata.json but died before updating
    version-hint.text must not hide its committed metadata: reopen
    heals the hint forward to the files actually present."""
    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    df = spark.range(4).withColumn(BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df, epoch_id=0)
    table.commit(df, epoch_id=1)
    hint = os.path.join(table.meta_dir, "version-hint.text")
    with open(hint, "w") as f:
        f.write("1")  # crashed before the hint write
    fresh = IcebergTable(table.path)
    assert fresh._hint_version() == 2
    assert fresh.last_epoch() == 1


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]),
                min_size=1, max_size=6, unique=True),
       st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]),
                min_size=1, max_size=6, unique=True))
def test_evolution_ids_stable_and_fresh_property(cols1, cols2):
    """Any two schema generations: same-name fields keep their ids,
    new fields draw ids strictly above the old last-column-id, and no
    id is ever reused for a different name."""
    from pyspark.sql import types as T

    from debezium_server_spark.sinks.iceberg_meta import iceberg_schema_of

    def schema_of(names):
        return T.StructType([T.StructField(n, T.LongType())
                             for n in names])

    s1, last1 = iceberg_schema_of(schema_of(cols1))
    s2, last2 = iceberg_schema_of(schema_of(cols2), base=s1,
                                  last_column_id=last1)
    ids1 = {f["name"]: f["id"] for f in s1["fields"]}
    ids2 = {f["name"]: f["id"] for f in s2["fields"]}
    for name in set(cols1) & set(cols2):
        assert ids2[name] == ids1[name]
    for name in set(cols2) - set(cols1):
        assert ids2[name] > last1
    assert len(set(ids2.values())) == len(ids2)  # no collisions
    assert last2 >= max(ids2.values())


def test_metadata_log_is_capped(spark, tmp_path):
    """write.metadata.previous-versions-max: the metadata-log is a
    ring — commit metadata stays O(cap), not O(history)."""
    table = IcebergTable(str(tmp_path / "t"), n_buckets=2)
    df = spark.range(2).withColumn(BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df, epoch_id=0)
    meta = table._current_metadata()
    meta["properties"]["write.metadata.previous-versions-max"] = "3"
    with open(table._meta_path(table._hint_version()), "w") as f:
        json.dump(meta, f)
    for epoch in range(1, 8):
        table.commit(df, epoch_id=epoch, touched_buckets=None)
    log = table._current_metadata()["metadata-log"]
    assert len(log) == 3
    assert log[-1]["metadata-file"].endswith("v7.metadata.json")


def test_compact_unbucketed_flat_table(spark, tmp_path):
    """compact() on a flat (no __bucket column) table mirrors the
    Delta twin: coalesce to one file, full-rewrite replace commit —
    instead of raising on the missing bucket column (ADVICE r06)."""
    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    table.commit(spark.range(5).repartition(3), epoch_id=7)
    meta = table._current_metadata()
    n_before = len(table._live_files(meta, table.current_version()))
    assert n_before > 1
    v = table.compact(spark)
    assert v == 2
    meta = table._current_metadata()
    assert len(table._live_files(meta, table.current_version())) == 1
    assert sorted(r["id"] for r in table.read(spark).collect()) == \
        list(range(5))
    assert table.last_epoch() == 7
    snap = table._snapshot(meta, 2)
    assert snap["summary"]["operation"] == "replace"


def test_unpartitioned_spec_writes_strict_empty_r102(spark, tmp_path):
    """NEXT r07 #6 (strict spec form): a table whose partition SPEC
    declares no fields must write manifests whose embedded r102
    partition record has ZERO fields and whose entries carry an empty
    partition value — not a null-valued __bucket field. Bucketed
    tables keep the declared field."""
    from debezium_server_spark.functions.avro_codec import read_container

    def r102_of(table):
        meta = table._current_metadata()
        snap = table._snapshot(meta, table.current_version())
        (mf,) = table._read_manifest_list(snap["manifest-list"])
        raw = open(os.path.join(table.path, mf["manifest_path"]),
                   "rb").read()
        schema, entries = read_container(raw)
        data_file = next(f for f in schema["fields"]
                         if f["name"] == "data_file")
        part = next(f for f in data_file["type"]["fields"]
                    if f["name"] == "partition")
        return part["type"]["fields"], entries

    flat = IcebergTable(str(tmp_path / "flat"), n_buckets=4)
    flat.commit(spark.range(5).coalesce(1), epoch_id=0)
    assert flat._current_metadata()["partition-specs"][0]["fields"] == []
    fields, entries = r102_of(flat)
    assert fields == []
    assert all(e["data_file"]["partition"] == {} for e in entries)
    # spec stays strict across later commits + compaction
    flat.commit(spark.range(5, 9).coalesce(1), epoch_id=1,
                touched_buckets=[])
    flat.compact(spark)
    fields, entries = r102_of(flat)
    assert fields == [] and all(
        e["data_file"]["partition"] == {} for e in entries)
    assert sorted(r["id"] for r in flat.read(spark).collect()) == \
        list(range(9))

    bucketed = IcebergTable(str(tmp_path / "b"), n_buckets=4)
    bucketed.commit(spark.range(5).withColumn(
        BUCKET_COL, bucketed.bucket_expr(("id",))), epoch_id=0)
    meta = bucketed._current_metadata()
    snap = bucketed._snapshot(meta, 1)
    mfs = bucketed._read_manifest_list(snap["manifest-list"])
    raw = open(os.path.join(bucketed.path, mfs[0]["manifest_path"]),
               "rb").read()
    schema, _ = read_container(raw)
    data_file = next(f for f in schema["fields"]
                     if f["name"] == "data_file")
    part = next(f for f in data_file["type"]["fields"]
                if f["name"] == "partition")
    assert [f["name"] for f in part["type"]["fields"]] == [BUCKET_COL]


def test_vacuum_collects_unreachable_metadata(spark, tmp_path):
    """vacuum() sweeps the METADATA plane too: manifest lists and
    manifests reachable from no retained snapshot are deleted after
    snapshot expiry, while the current snapshot's metadata and the
    metadata-log ring survive and the table stays readable
    (ADVICE r06 — without this, metadata/ grows without bound at
    micro-batch cadence)."""
    table = IcebergTable(str(tmp_path / "t"), n_buckets=4)
    for epoch in range(4):
        df = spark.range(epoch * 4, epoch * 4 + 4).withColumn(
            BUCKET_COL, table.bucket_expr(("id",)))
        table.commit(df, epoch_id=epoch,
                     touched_buckets=list(range(4)))
    meta_dir = table.meta_dir
    avro_before = {f for f in os.listdir(meta_dir) if f.endswith(".avro")}
    assert len([f for f in avro_before if f.startswith("snap-")]) == 4
    table.expire_snapshots(keep_last=1)
    deleted = table.vacuum(retention_seconds=0)
    avro_after = {f for f in os.listdir(meta_dir) if f.endswith(".avro")}
    # exactly one manifest list survives (the retained snapshot's)
    assert len([f for f in avro_after if f.startswith("snap-")]) == 1
    assert any(d.endswith(".avro") for d in deleted)
    # retained snapshot's manifests all survive; table reads clean
    meta = table._current_metadata()
    snap = table._snapshot(meta, table.current_version())
    for mf in table._read_manifest_list(snap["manifest-list"]):
        assert os.path.exists(os.path.join(table.path,
                                           mf["manifest_path"]))
    assert table.read(spark).count() == 4
    # current metadata JSON + the ring survive
    assert os.path.exists(table._meta_path(table._hint_version()))
    for entry in meta.get("metadata-log", []):
        assert os.path.exists(entry["metadata-file"])


def test_bucket_pruned_read_opens_only_covering_manifests(spark, tmp_path):
    """Manifest-level partition pruning (the spec's point-read lever):
    `read(buckets=[b])` must open ONLY manifests whose partition
    summary covers b — counted by instrumenting _read_manifest — and
    return exactly that bucket's rows."""
    table = IcebergTable(str(tmp_path / "t"), n_buckets=8)
    df = spark.range(64).withColumn(
        BUCKET_COL, F.pmod(F.col("id"), F.lit(8)).cast("int"))
    table.commit(df, epoch_id=0)
    # second epoch appends to buckets 0-3 only (stacked manifests)
    table.commit(df.filter(F.col(BUCKET_COL) < 4)
                 .withColumn("id", F.col("id") + 100),
                 epoch_id=1, touched_buckets=[])
    opened: list[str] = []
    orig = table._read_manifest

    def counting(rel):
        opened.append(rel)
        return orig(rel)

    table._read_manifest = counting
    out = table.read(spark, buckets=[6]).collect()
    # bucket 6 lives in exactly one manifest (epoch-0 b6); epoch-1
    # touched only b0-b3, so their manifests must stay UNOPENED
    assert len(opened) == 1, opened
    assert sorted(r["id"] for r in out) == [6, 14, 22, 30, 38, 46, 54, 62]
    # multi-bucket read: one manifest per bucket key per epoch
    opened.clear()
    out2 = table.read(spark, buckets=[1, 6]).collect()
    assert len(opened) == 3, opened  # b1 (e0 + e1 append) + b6 (e0)
    assert {r[BUCKET_COL] for r in out2} == {1, 6}
    # full read still sees everything
    table._read_manifest = orig
    assert table.read(spark).count() == 64 + 32

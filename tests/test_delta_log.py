"""Minimal Delta-protocol writer (sinks/delta_log.py): log structure
per the public PROTOCOL.md, epoch-idempotent MERGE contract (the
test_materialize/test_bucketed_sink contract on the swapped storage
layer), O(touched-bucket) action counts, time travel, vacuum, and the
put-if-absent concurrency primitive. No delta library exists in this
container, so validation is schema-level assertion against the
protocol (round-4 verdict #5's accepted fallback)."""

import json
import os

from pyspark.sql import types as T

from debezium_server_spark.sinks.delta_log import BUCKET_COL, DeltaLogTable
from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
from tests.fixtures import DEST, event


def _batch(spark, events):
    from tests.fixtures import customers_changelog_df

    return customers_changelog_df(spark, events)


def _sink(tmp_path, n_buckets=8):
    return ParquetUpsertSink(root_path=str(tmp_path / "state"),
                             key_fields=("id",), n_buckets=n_buckets,
                             table_format="delta")


def _table(tmp_path, n_buckets=8):
    return DeltaLogTable(str(tmp_path / "state" / DEST),
                         n_buckets=n_buckets)


def _commits(table):
    return [table._read_commit(v) for v in table._versions()]


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


def test_version0_protocol_and_metadata_actions(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)
    ]), 0)
    table = _table(tmp_path)
    v0 = table._read_commit(0)
    kinds = [next(iter(a)) for a in v0]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds

    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}

    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == [BUCKET_COL]
    # schemaString is Spark/Delta schema JSON and must parse back
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert "id" in schema.fieldNames() and BUCKET_COL in schema.fieldNames()

    for a in v0:
        if "add" in a:
            add = a["add"]
            f = os.path.join(table.path, add["path"])
            assert os.path.isfile(f) and os.path.getsize(f) == add["size"]
            assert add["dataChange"] is True
            # partitionValues mirror the directory layout
            assert add["path"].startswith(
                f"{BUCKET_COL}={add['partitionValues'][BUCKET_COL]}/")


def test_epoch_replay_appends_no_log_version(spark, tmp_path):
    sink = _sink(tmp_path)
    b0 = _batch(spark, [event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)])
    sink(b0, 0)
    table = _table(tmp_path)
    assert table.current_version() == 1 and table.last_epoch() == 0
    sink(b0, 0)  # at-least-once replay of the committed epoch
    assert table.current_version() == 1, "replay must be a no-op"
    assert len(_commits(table)) == 1


def test_commit_actions_are_touched_bucket_proportional(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
        for i in range(1, 33)
    ]), 0)
    table = _table(tmp_path)
    v0_adds = [a["add"]["path"] for a in table._read_commit(0) if "add" in a]
    buckets_v0 = {p.split("/", 1)[0] for p in v0_adds}
    assert len(buckets_v0) > 2, "seed should span several buckets"

    sink(_batch(spark, [
        event(1, "u", (1, "n1", "x", "1@x.com"),
              (1, "n1b", "x", "1@x.com"), lsn=100),
    ]), 1)
    v1 = table._read_commit(1)
    add_buckets = {a["add"]["path"].split("/", 1)[0]
                   for a in v1 if "add" in a}
    rm_buckets = {a["remove"]["path"].split("/", 1)[0]
                  for a in v1 if "remove" in a}
    # exactly the one touched bucket appears; untouched buckets are
    # absent from the commit entirely (their files simply stay live)
    assert len(add_buckets) == 1 and rm_buckets == add_buckets
    live_buckets = {p.split("/", 1)[0] for p in table._live_files()}
    assert live_buckets == buckets_v0


def test_time_travel_reads_log_prefix(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)
    ]), 0)
    sink(_batch(spark, [
        event(1, "u", (1, "a", "b", "a@x.com"),
              (1, "a2", "b", "a@x.com"), lsn=2),
    ]), 1)
    assert sink.read_table(spark, DEST).collect()[0]["first_name"] == "a2"
    old = sink.read_table(spark, DEST, version=1)
    assert old.collect()[0]["first_name"] == "a"


def test_vacuum_deletes_only_dead_files(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(i, "c", None, (i, f"n{i}", "x", f"{i}@x.com"), lsn=i)
        for i in range(1, 9)
    ]), 0)
    sink(_batch(spark, [
        event(1, "u", (1, "n1", "x", "1@x.com"),
              (1, "zz", "x", "1@x.com"), lsn=9),
    ]), 1)
    table = _table(tmp_path)
    # default retention (7 days) protects young dead files — a racing
    # writer's moved-but-not-yet-logged data must survive (ADVICE r5)
    assert table.vacuum() == []
    dead = table.vacuum(retention_seconds=0)
    assert dead, "the replaced bucket file should be vacuumed"
    for rel in dead:
        assert not os.path.exists(os.path.join(table.path, rel))
    rows = {r["id"]: r["first_name"]
            for r in sink.read_table(spark, DEST).collect()}
    assert rows[1] == "zz" and len(rows) == 8


def test_checkpoint_written_every_interval_with_protocol_shape(
        spark, tmp_path):
    """Round-5 verdict #3: every `checkpoint_interval` commits the
    full replay state lands in {version:020d}.checkpoint.parquet and
    `_last_checkpoint` points at it — protocol-level content
    assertions (no external reader in this container)."""
    import pyarrow.parquet as pq

    sink = _sink(tmp_path)
    for epoch in range(12):
        sink(_batch(spark, [
            event(epoch % 4, "c", None,
                  (epoch % 4, f"e{epoch}", "x", "a@x.com"),
                  lsn=epoch)
        ]), epoch)
    table = _table(tmp_path)
    ck = table._read_last_checkpoint()
    assert ck is not None and ck["version"] == 9
    path = table._checkpoint_path(9)
    assert os.path.exists(path)
    rows = pq.read_table(path).to_pylist()
    assert ck["size"] == len(rows)
    protos = [r["protocol"] for r in rows if r["protocol"] is not None]
    metas = [r["metaData"] for r in rows if r["metaData"] is not None]
    adds = [r["add"] for r in rows if r["add"] is not None]
    assert protos == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    assert len(metas) == 1 and json.loads(metas[0]["schemaString"])
    # checkpoint adds == live set replayed from JSON alone at v9
    ckpt_live, _, _, ckpt_txns = table._checkpoint_state(9)
    # txn state (epoch idempotence) is part of the checkpoint
    assert ckpt_txns == {table.app_id: 9}
    json_live = {}
    for v in range(10):
        for action in table._read_commit(v):
            if "add" in action:
                json_live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                json_live.pop(action["remove"]["path"], None)
    assert set(a["path"] for a in adds) == set(json_live)
    assert ckpt_live == {p: {**a, "partitionValues":
                             dict(a["partitionValues"])}
                         for p, a in json_live.items()}


def test_reopen_from_checkpoint_only_state(spark, tmp_path):
    """JSON commits ≤ the checkpoint version are deletable: a table
    whose log prefix was cleaned replays checkpoint + later JSON to
    the same state, and time travel BEFORE the checkpoint now raises
    instead of silently returning partial state."""
    import pytest

    sink = _sink(tmp_path)
    for epoch in range(12):
        sink(_batch(spark, [
            event(epoch % 4, "c", None,
                  (epoch % 4, f"e{epoch}", "x", "a@x.com"),
                  lsn=epoch)
        ]), epoch)
    before = {r["id"]: r["first_name"]
              for r in sink.read_table(spark, DEST).collect()}
    table = _table(tmp_path)
    for v in range(10):  # clean the checkpointed prefix
        os.remove(table._log_path(v))
    fresh = _table(tmp_path)
    assert fresh.current_version() == 12
    after = {r["id"]: r["first_name"]
             for r in fresh.read(spark).collect()}
    assert after == before
    assert fresh.last_epoch() == 11  # newest JSON commit survives
    with pytest.raises(ValueError, match="cleaned"):
        fresh._live_files(upto=5)


def test_checkpoint_after_prefix_cleanup_keeps_metadata(spark, tmp_path):
    """A checkpoint written AFTER the JSON prefix (which held the only
    metaData/protocol declarations, at v0) was cleaned must seed those
    actions from the previous checkpoint — a checkpoint without them
    is corrupt per PROTOCOL.md. Also: epoch idempotence survives a
    FULL JSON cleanup through the checkpoint's txn rows."""
    sink = _sink(tmp_path)
    for epoch in range(12):
        sink(_batch(spark, [
            event(epoch % 4, "c", None,
                  (epoch % 4, f"e{epoch}", "x", "a@x.com"),
                  lsn=epoch)
        ]), epoch)
    table = _table(tmp_path)
    for v in range(10):  # clean the v0-v9 prefix (metaData lived at v0)
        os.remove(table._log_path(v))
    for epoch in range(12, 20):  # drive to the NEXT checkpoint (v19)
        sink(_batch(spark, [
            event(epoch % 4, "c", None,
                  (epoch % 4, f"e{epoch}", "x", "a@x.com"),
                  lsn=epoch)
        ]), epoch)
    table = _table(tmp_path)
    ck = table._read_last_checkpoint()
    assert ck["version"] == 19
    _, meta, proto, txns = table._checkpoint_state(19)
    assert meta is not None and json.loads(meta["schemaString"])
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert txns == {table.app_id: 19}
    # full JSON cleanup: state AND last_epoch replay from checkpoint only
    before = {r["id"]: r["first_name"]
              for r in table.read(spark).collect()}
    for v in range(10, 20):
        os.remove(table._log_path(v))
    fresh = _table(tmp_path)
    assert fresh.current_version() == 20
    assert fresh.last_epoch() == 19  # txn row, not commitInfo
    after = {r["id"]: r["first_name"]
             for r in fresh.read(spark).collect()}
    assert after == before


def test_concurrent_writer_loses_put_if_absent(spark, tmp_path):
    import pytest

    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)
    ]), 0)
    table = _table(tmp_path)
    state = table.read(spark)  # transaction snapshot: version 1
    # another writer commits BETWEEN our snapshot read and our commit —
    # the optimistic-concurrency window the protocol's put-if-absent
    # log write exists to close
    with open(table._log_path(1), "w") as f:
        f.write('{"commitInfo":{"operationParameters":{"epoch":99}}}\n')
    with pytest.raises(FileExistsError):
        table.commit(state, epoch_id=1, touched_buckets=None)


def test_unbucketed_commit_writes_adds_not_empty_table(spark, tmp_path):
    """A commit whose frame has no __bucket column stages files FLAT;
    they must become add actions (under __unpartitioned/), not vanish
    while removes tombstone the whole table."""
    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4)
    df1 = spark.range(5).selectExpr("id", "id * 10 as v")
    table.commit(df1, epoch_id=0, touched_buckets=None)
    v0 = table._read_commit(0)
    adds = [a["add"] for a in v0 if "add" in a]
    assert adds and all(a["path"].startswith("__unpartitioned/")
                        for a in adds)
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    assert meta["partitionColumns"] == []
    got = {(r["id"], r["v"]) for r in table.read(spark).collect()}
    assert got == {(i, i * 10) for i in range(5)}

    # full rewrite replaces, and time travel still sees version 1
    table.read(spark)  # refresh transaction snapshot
    df2 = spark.range(2).selectExpr("id", "id * 100 as v")
    table.commit(df2, epoch_id=1, touched_buckets=None)
    assert {r["v"] for r in table.read(spark).collect()} == {0, 100}
    assert table.read(spark, version=1).count() == 5


def test_losing_writer_cannot_clobber_winner_files(spark, tmp_path):
    """Finding from round-5 self-review: the loser's data files carry
    a per-attempt unique token, so the winner's committed parquet is
    untouched; the loser's orphans are vacuumable."""
    sink = _sink(tmp_path)
    sink(_batch(spark, [
        event(1, "c", None, (1, "a", "b", "a@x.com"), lsn=1)
    ]), 0)
    loser = _table(tmp_path)
    state = loser.read(spark)  # snapshot at version 1

    winner = _table(tmp_path)
    wstate = winner.read(spark)
    winner.commit(
        wstate.withColumn("first_name",
                          wstate["first_name"].substr(1, 1)),
        epoch_id=1, touched_buckets=None)
    live_before = dict(winner._live_files())

    import pytest

    with pytest.raises(FileExistsError):
        loser.commit(state, epoch_id=99, touched_buckets=None)

    fresh = _table(tmp_path)
    # the winner's log and referenced bytes are untouched
    assert dict(fresh._live_files()) == live_before
    rows = {r["id"]: r["first_name"]
            for r in sink.read_table(spark, DEST).collect()}
    assert rows == {1: "a"}
    # loser's moved files are orphans; vacuum collects them (past the
    # retention window — forced here with retention 0)
    dead = fresh.vacuum(retention_seconds=0)
    assert dead, "loser's orphan files should be vacuumable"
    assert {r["id"] for r in sink.read_table(spark, DEST).collect()} == {1}


def test_schema_evolution_reemits_metadata(spark, tmp_path):
    """Schema drift re-emits a metaData action with the evolved
    schemaString (protocol requirement) and flags the table so reads
    merge both file generations."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4)
    df1 = spark.range(4).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df1, epoch_id=0)
    df2 = (spark.range(4, 8).withColumn("extra", F.lit("x"))
           .withColumn(BUCKET_COL, table.bucket_expr(("id",))))
    table.commit(df2, epoch_id=1, touched_buckets=[])
    metas = [a["metaData"] for c in _commits(table) for a in c
             if "metaData" in a]
    assert len(metas) == 2
    assert metas[0]["id"] == metas[1]["id"]  # table identity stable
    assert "extra" in metas[1]["schemaString"]
    assert metas[1]["configuration"]["schema.evolved"] == "true"
    out = table.read(spark)
    assert out.count() == 8 and out.filter(out.extra.isNull()).count() == 4
    # unchanged-schema commit does not re-emit metaData
    table.commit(df2, epoch_id=2, touched_buckets=[])
    metas = [a for c in _commits(table) for a in c if "metaData" in a]
    assert len(metas) == 2


def test_compact_optimize_data_change_false(spark, tmp_path):
    """OPTIMIZE compaction: files per bucket collapse to one, the
    commit's add/remove actions carry dataChange=false, and the epoch
    is preserved."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4)
    df = spark.range(20).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df.filter(F.col("id") < 10), epoch_id=3)
    table.commit(df.filter(F.col("id") >= 10), epoch_id=4,
                 touched_buckets=[])
    n_before = len(table._live_files())
    v = table.compact(spark)
    assert v == 3
    last = table._read_commit(2)
    ops = [a["commitInfo"]["operation"] for a in last if "commitInfo" in a]
    assert ops == ["OPTIMIZE"]
    for a in last:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    assert len(table._live_files()) < n_before
    assert table.read(spark).count() == 20
    assert table.last_epoch() == 4


def test_nullability_and_field_order_jitter_is_not_evolution(
        spark, tmp_path):
    """Benign micro-batch schema jitter (nullability flips, field-order
    permutation) must NOT emit a metaData action or set the sticky
    `schema.evolved` flag — only a normalized-fingerprint change is
    evolution (ADVICE r06)."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4)
    df1 = (spark.range(4).withColumn("v", F.lit(1))
           .withColumn(BUCKET_COL, table.bucket_expr(("id",))))
    table.commit(df1, epoch_id=0)
    # nullability flip: same fields, all nullable now
    jitter = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.IntegerType(), True)])
    df2 = spark.createDataFrame([(100, 1)], jitter).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    assert df2.schema.json() != df1.schema.json()  # jitter is real
    table.commit(df2, epoch_id=1, touched_buckets=[])
    # field-order permutation
    table.commit(df1.select("v", BUCKET_COL, "id"), epoch_id=2,
                 touched_buckets=[])
    metas = [a for c in _commits(table) for a in c if "metaData" in a]
    assert len(metas) == 1  # only the v0 declaration
    cfg = metas[0]["metaData"].get("configuration", {})
    assert cfg.get("schema.evolved") != "true"


def test_full_compaction_clears_evolved_flag(spark, tmp_path):
    """After real evolution sets `schema.evolved`, a FULL compaction
    rewrites every live file under one schema and drops the flag, so
    later reads stop paying mergeSchema (ADVICE r06)."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4)
    df1 = spark.range(4).withColumn(
        BUCKET_COL, table.bucket_expr(("id",)))
    table.commit(df1, epoch_id=0)
    df2 = (spark.range(4, 8).withColumn("extra", F.lit("x"))
           .withColumn(BUCKET_COL, table.bucket_expr(("id",))))
    table.commit(df2, epoch_id=1, touched_buckets=[])
    meta = table._current_metadata_action()
    assert meta["configuration"]["schema.evolved"] == "true"
    table.compact(spark)  # full rewrite
    meta = table._current_metadata_action()
    assert "schema.evolved" not in meta.get("configuration", {})
    out = table.read(spark)
    assert out.count() == 8 and "extra" in out.columns
    # a PARTIAL compaction must NOT clear the flag
    table2 = DeltaLogTable(str(tmp_path / "t2"), n_buckets=4)
    table2.commit(df1, epoch_id=0)
    table2.commit(df2, epoch_id=1, touched_buckets=[])
    table2.compact(spark, buckets=[0])
    meta2 = table2._current_metadata_action()
    assert meta2["configuration"].get("schema.evolved") == "true"


def test_partial_compact_clears_evolved_flag_via_add_tags(
        spark, tmp_path):
    """NEXT r07 #6: a PARTIAL compaction may also drop the sticky
    `schema.evolved` flag when every UNTOUCHED live file provably
    carries the current normalized schema — proven from the
    `schemaFingerprint` add tag (control plane only, no footers).
    Pre-tag adds (no fingerprint) must keep the flag: conservative."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=4)
    bexpr = table.bucket_expr(("id",))
    table.commit(spark.range(8).withColumn(BUCKET_COL, bexpr), epoch_id=0)
    table.commit(  # real evolution: flag goes sticky
        spark.range(8, 16).withColumn("extra", F.lit("x"))
        .withColumn(BUCKET_COL, bexpr), epoch_id=1, touched_buckets=[])
    assert table._current_metadata_action()[
        "configuration"]["schema.evolved"] == "true"
    # full-table MERGE at the evolved schema: every live file is now
    # new-schema, but the flag stays sticky (no compaction yet)
    table.commit(spark.range(16).withColumn("extra", F.lit("y"))
                 .withColumn(BUCKET_COL, bexpr), epoch_id=2)
    assert table._current_metadata_action()[
        "configuration"]["schema.evolved"] == "true"
    # tags survive the checkpoint round trip (classic checkpoint
    # carries the add's `tags` map per the protocol)
    table.write_checkpoint()
    live, _, _, _ = table._checkpoint_state(table.current_version() - 1)
    assert all((a.get("tags") or {}).get("schemaFingerprint")
               for a in live.values())
    table.compact(spark, buckets=[0])  # partial — but provably uniform
    meta = table._current_metadata_action()
    assert "schema.evolved" not in meta.get("configuration", {})
    out = table.read(spark)
    assert out.count() == 16 and "extra" in out.columns

    # conservative path: strip the tags from one untouched add (as a
    # pre-tag writer would have left it) — the flag must survive
    t2 = DeltaLogTable(str(tmp_path / "t2"), n_buckets=4)
    t2.commit(spark.range(8).withColumn(BUCKET_COL, bexpr), epoch_id=0)
    t2.commit(spark.range(8, 16).withColumn("extra", F.lit("x"))
              .withColumn(BUCKET_COL, bexpr), epoch_id=1,
              touched_buckets=[])
    t2.commit(spark.range(16).withColumn("extra", F.lit("y"))
              .withColumn(BUCKET_COL, bexpr), epoch_id=2)
    path = t2._log_path(2)
    lines = []
    for line in open(path).read().splitlines():
        a = json.loads(line)
        if "add" in a:
            a["add"].pop("tags", None)
        lines.append(json.dumps(a, separators=(",", ":")))
    os.remove(path)
    with open(path, "x") as f:
        f.write("\n".join(lines) + "\n")
    t2.compact(spark, buckets=[0])
    assert t2._current_metadata_action()[
        "configuration"].get("schema.evolved") == "true"


def test_flat_table_partial_compact_is_full_rewrite_clears_flag(
        spark, tmp_path):
    """ADVICE r07: compact(buckets=[...]) on a FLAT (unbucketed) table
    performs a full rewrite — so it must also clear the sticky
    `schema.evolved` flag, not leave mergeSchema cost on every later
    read despite all live files now sharing one schema."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "flat"), n_buckets=4)
    table.commit(spark.range(4), epoch_id=0)  # no BUCKET_COL: flat
    table.commit(spark.range(4, 8).withColumn("extra", F.lit("x")),
                 epoch_id=1, touched_buckets=[])
    assert table._current_metadata_action()[
        "configuration"]["schema.evolved"] == "true"
    table.compact(spark, buckets=[0])  # flat table: full rewrite
    meta = table._current_metadata_action()
    assert "schema.evolved" not in meta.get("configuration", {})
    out = table.read(spark)
    assert out.count() == 8 and "extra" in out.columns


def test_catalog_entry_pins_delta_roundtrip_policy(spark):
    """PIN-TEST GATE: `delta_upsert_roundtrip`'s policy (two-commit
    bucket-touched upsert + time travel through the checkpoint,
    bucket = o_orderkey%16, +1.0 on o_orderkey%7==0 rows in version 2
    only) recomputed independently with pandas from the raw parquet —
    the same recomputation the Iceberg twin's pin test does."""
    import math
    from decimal import Decimal

    import pandas as pd

    from debezium_server_spark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    got = (CATALOG["delta_upsert_roundtrip"].spark_fn(spark, sf)
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


def test_bucket_pruned_read_scans_only_that_buckets_files(spark, tmp_path):
    """`read(buckets=[b])` prunes live files on their logged
    partitionValues — a point read scans O(bucket files), not the
    table."""
    from pyspark.sql import functions as F

    table = DeltaLogTable(str(tmp_path / "t"), n_buckets=8)
    df = spark.range(64).withColumn(
        BUCKET_COL, F.pmod(F.col("id"), F.lit(8)).cast("int"))
    table.commit(df, epoch_id=0)
    out = table.read(spark, buckets=[5])
    assert sorted(r["id"] for r in out.collect()) == \
        [5, 13, 21, 29, 37, 45, 53, 61]
    # plan-level: only the one bucket directory's files are inputs
    assert all(f"{BUCKET_COL}=5/" in f for f in
               out.inputFiles())
    assert table.read(spark, buckets=[99]) is None  # empty selection


from hypothesis import given, settings
from hypothesis import strategies as st

_names = st.lists(st.text(alphabet="abcdefg_", min_size=1, max_size=6),
                  min_size=1, max_size=5, unique=True)


@settings(max_examples=60, deadline=None)
@given(names=_names, flips=st.lists(st.booleans(), min_size=5,
                                    max_size=5), perm_seed=st.integers(0, 999))
def test_schema_fingerprint_invariance_property(names, flips, perm_seed):
    """Property: the drift fingerprint is invariant under field-order
    permutation and nullability flips (the benign micro-batch jitter),
    and SENSITIVE to adding a field or changing a type."""
    import random as _random

    from debezium_server_spark.sinks.delta_log import _schema_fingerprint

    types = ["long", "string", "integer", "double",
             {"type": "array", "elementType": "string",
              "containsNull": True}]

    def schema(field_names, nullables, order):
        fields = [{"name": n,
                   "type": types[i % len(types)],
                   "nullable": nullables[i % len(nullables)],
                   "metadata": {}}
                  for i, n in enumerate(field_names)]
        rng = _random.Random(order)
        rng.shuffle(fields)
        return json.dumps({"type": "struct", "fields": fields})

    base = schema(names, [True] * 5, 0)
    jitter = schema(names, flips, perm_seed)
    assert _schema_fingerprint(base) == _schema_fingerprint(jitter)
    grown = schema(names + ["zzz_new"], flips, perm_seed)
    assert _schema_fingerprint(base) != _schema_fingerprint(grown)
    # type change is evolution even with same names
    retyped = json.loads(base)
    retyped["fields"][0]["type"] = (
        "date" if retyped["fields"][0]["type"] != "date" else "long")
    assert _schema_fingerprint(base) != _schema_fingerprint(
        json.dumps(retyped))

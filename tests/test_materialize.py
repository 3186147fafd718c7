"""Golden-state materialization (FIXTURES.md F1/F2; the Spark analog of
DebeziumServerIT.java:84-88)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.materialize import (
    append_log,
    latest_events,
    materialize,
    split_upserts_deletes,
)
from tests.fixtures import GOLDEN_CUSTOMERS, customers_changelog_df


def test_materialize_golden_customers(spark):
    df = customers_changelog_df(spark)
    final = materialize(df, key_cols=("destination", "key.id"))
    rows = sorted(
        (r["id"], r["first_name"], r["last_name"], r["email"])
        for r in final.collect()
    )
    assert rows == GOLDEN_CUSTOMERS
    last = rows[-1]
    assert last == (1004, "Anne", "Kretchmar", "annek@noanswer.org")


def test_latest_events_latest_wins(spark):
    df = customers_changelog_df(spark)
    latest = latest_events(df, key_cols=("key.id",))
    m = {r["key_id"]: r for r in latest.collect()}
    assert m[1004]["op"] == "u"
    assert m[1004]["after"]["first_name"] == "Anne"
    assert m[1005]["op"] == "d"
    assert m[1005]["after"] is None
    assert m[1001]["op"] == "r"


def test_split_upserts_deletes(spark):
    df = customers_changelog_df(spark)
    ups, dels = split_upserts_deletes(df)
    assert ups.count() == 6  # 4 snapshot reads + 1 insert + 1 update
    assert dels.count() == 1
    assert dels.select("key.id").first()[0] == 1005


def test_append_log_keeps_every_event(spark):
    df = customers_changelog_df(spark)
    log = append_log(df)
    assert log.count() == 7  # tombstone dropped
    ops = [r[0] for r in log.groupBy("op").count().orderBy("op").collect()]
    assert ops == ["c", "d", "r", "u"]


def test_materialize_is_replay_idempotent(spark):
    """At-least-once replay (same events twice) must converge to the same
    state — SURVEY.md §3.2."""
    df = customers_changelog_df(spark)
    doubled = df.union(df)
    final = materialize(doubled, key_cols=("destination", "key.id"))
    rows = sorted((r["id"], r["first_name"]) for r in final.collect())
    assert [r[0] for r in rows] == [1001, 1002, 1003, 1004]
    assert rows[-1][1] == "Anne"



def test_time_travel_read_previous_version(spark, tmp_path):
    """Each epoch commit is a snapshot; read_table(version=) time-travels
    to the pre-update state while hard links keep retention ~free."""
    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "tt"), key_fields=("id",))

    def ev(key, op, after, lsn):
        return {"destination": "t", "key": {"id": key},
                "value": {"op": op, "before": None, "after": after,
                          "source": {"lsn": lsn}, "ts_ms": lsn},
                "headers": [], "partition": 0}

    schema = ("destination string, key struct<id:long>, "
              "value struct<op:string, before struct<id:long,name:string>, "
              "after struct<id:long,name:string>, source struct<lsn:long>, ts_ms long>, "
              "headers array<struct<key:string,value:string>>, partition int")
    sink(spark.createDataFrame(
        [ev(1, "c", {"id": 1, "name": "a"}, 1), ev(2, "c", {"id": 2, "name": "b"}, 2)],
        schema), epoch_id=0)
    sink(spark.createDataFrame(
        [ev(1, "u", {"id": 1, "name": "a2"}, 3)], schema), epoch_id=1)

    now = {r["id"]: r["name"] for r in sink.read_table(spark, "t").collect()}
    assert now == {1: "a2", 2: "b"}
    old = {r["id"]: r["name"] for r in sink.read_table(spark, "t", version=1).collect()}
    assert old == {1: "a", 2: "b"}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sink.read_table(spark, "t", version=99)


def test_erase_keys_hard_deletes_only_targets(spark, tmp_path):
    """GDPR erasure: targeted keys vanish from the new snapshot, other
    rows and buckets are untouched (bucket-pruned rewrite)."""
    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "gdpr"), key_fields=("id",))

    def ev(key, lsn):
        return {"destination": "t", "key": {"id": key},
                "value": {"op": "c", "before": None,
                          "after": {"id": key, "name": f"u{key}"},
                          "source": {"lsn": lsn}, "ts_ms": lsn},
                "headers": [], "partition": 0}

    schema = ("destination string, key struct<id:long>, "
              "value struct<op:string, before struct<id:long,name:string>, "
              "after struct<id:long,name:string>, source struct<lsn:long>, ts_ms long>, "
              "headers array<struct<key:string,value:string>>, partition int")
    sink(spark.createDataFrame([ev(i, i) for i in range(20)], schema), epoch_id=0)

    erase = spark.createDataFrame([(3,), (7,), (11,)], "id long")
    n = sink.erase_keys(spark, "t", erase)
    assert n == 3
    left = sorted(r["id"] for r in sink.read_table(spark, "t").collect())
    assert left == [i for i in range(20) if i not in (3, 7, 11)]
    # erasing again is a no-op
    assert sink.erase_keys(spark, "t", erase) == 0


def test_erase_keys_out_of_range_key_is_noop_not_abort(spark, tmp_path):
    """ADVICE r07: an erase frame typed wider than the table's stored
    key type, containing a value the stored type cannot represent,
    must neither abort the whole erase (ANSI cast overflow) nor wrap
    and delete a DIFFERENT row — it is a no-op by construction, and
    the frame's valid keys still erase."""
    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "gdpr32"), key_fields=("id",))

    def ev(key, lsn):
        return {"destination": "t", "key": {"id": key},
                "value": {"op": "c", "before": None,
                          "after": {"id": key, "name": f"u{key}"},
                          "source": {"lsn": lsn}, "ts_ms": lsn},
                "headers": [], "partition": 0}

    schema = ("destination string, key struct<id:int>, "
              "value struct<op:string, before struct<id:int,name:string>, "
              "after struct<id:int,name:string>, source struct<lsn:long>, "
              "ts_ms long>, "
              "headers array<struct<key:string,value:string>>, partition int")
    sink(spark.createDataFrame([ev(i, i) for i in range(10)], schema),
         epoch_id=0)
    assert dict(sink.read_table(spark, "t").dtypes)["id"] == "int"

    # long-typed frame: one valid key + one that wraps to 3 in int32
    # (2**32 + 3) + one plain overflow (2**40)
    erase = spark.createDataFrame(
        [(5,), (2 ** 32 + 3,), (2 ** 40,)], "id long")
    n = sink.erase_keys(spark, "t", erase)
    assert n == 1  # only id=5; the wrap candidate must NOT erase id=3
    left = sorted(r["id"] for r in sink.read_table(spark, "t").collect())
    assert left == [i for i in range(10) if i != 5]


def test_expire_where_ttl_pass(spark, tmp_path):
    """Retention: predicate-matched rows vanish, survivors and untouched
    buckets remain; second pass is a no-op."""
    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "ttl"), key_fields=("id",))

    def ev(key, lsn, day):
        return {"destination": "t", "key": {"id": key},
                "value": {"op": "c", "before": None,
                          "after": {"id": key, "day": day},
                          "source": {"lsn": lsn}, "ts_ms": lsn},
                "headers": [], "partition": 0}

    schema = ("destination string, key struct<id:long>, "
              "value struct<op:string, before struct<id:long,day:string>, "
              "after struct<id:long,day:string>, source struct<lsn:long>, ts_ms long>, "
              "headers array<struct<key:string,value:string>>, partition int")
    rows = [ev(i, i, "2023-12-31" if i % 3 == 0 else "2024-06-01") for i in range(12)]
    sink(spark.createDataFrame(rows, schema), epoch_id=0)

    n = sink.expire_where(spark, "t", "day < '2024-01-01'")
    assert n == 4  # ids 0,3,6,9
    left = sorted(r["id"] for r in sink.read_table(spark, "t").collect())
    assert left == [i for i in range(12) if i % 3 != 0]
    assert sink.expire_where(spark, "t", "day < '2024-01-01'") == 0

"""SMT chain + predicates (reference assertions DebeziumServerTest.java:82-118)."""

import json

from pyspark.sql import functions as F

from debezium_server_spark.operators import envelope
from debezium_server_spark.operators.routing import (
    dots_to_underscores,
    sanitize_stream_name,
    with_partition_routing,
)
from debezium_server_spark.operators.transforms import (
    Chain,
    FilterTransform,
    content_based_router,
    hoist_field,
    hoist_field_serialized,
    insert_header,
    rename_destination,
    topic_name_matches,
)
from tests.fixtures import customers_changelog_df


def _lines_df(spark, n=4, dest="topicX"):
    rows = [
        {"destination": dest, "key": None, "value": str(i), "headers": None, "partition": None}
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(
        rows, schema="destination string, key string, value string, "
        "headers array<struct<key:string,value:string>>, partition int"
    )


def test_hoist_field_and_insert_header(spark):
    """F4: HoistField(field=line) + InsertHeader(headerKey=headerValue) ⇒
    value serializes as {"line":"<i>"} with the header present
    (DebeziumServerTest.java:99-100, TestConfigSource.java:75-81)."""
    df = _lines_df(spark)
    chain = Chain([hoist_field("line"), insert_header("headerKey", "headerValue")])
    out = chain(df).orderBy("value.line")
    first = out.first()
    assert json.loads(out.select(F.to_json("value")).first()[0]) == {"line": "1"}
    assert first["headers"] == [("headerKey", "headerValue")] or (
        first["headers"][0]["key"] == "headerKey"
        and first["headers"][0]["value"] == "headerValue"
    )


def test_predicate_gates_transform(spark):
    df = _lines_df(spark, dest="topicX").union(_lines_df(spark, dest="other"))
    chain = Chain([hoist_field_serialized("line", predicate=topic_name_matches("topicX"))])
    out = chain(df)
    hoisted = out.filter("destination = 'topicX'").select("value").first()[0]
    raw = out.filter("destination = 'other'").select("value").first()[0]
    assert json.loads(hoisted) == {"line": "1"}
    assert raw == "1"  # gated rows keep the original value


def test_filter_and_router(spark):
    df = _lines_df(spark, n=10)
    chain = Chain([
        FilterTransform("cast(value as int) % 2 = 0"),
        content_based_router("cast(value as int) > 5", "topic-high"),
    ])
    out = chain(df)
    assert out.count() == 5
    highs = out.filter("destination = 'topic-high'").count()
    assert highs == 3  # 6, 8, 10


def test_rename_destination_regex(spark):
    df = _lines_df(spark, dest="testc.inventory.customers")
    out = Chain([rename_destination(r"^testc\.", "prod.")]).apply(df)
    assert out.first()["destination"] == "prod.inventory.customers"


def test_sanitizers(spark):
    df = spark.createDataFrame([("a.b/c d",)], "destination string")
    assert df.select(sanitize_stream_name("destination")).first()[0] == "a_b_c_d"
    assert df.select(dots_to_underscores("destination")).first()[0] == "a_b/c d"


def test_envelope_helpers(spark):
    df = customers_changelog_df(spark)
    assert envelope.drop_tombstones(df).count() == 7
    flat = envelope.extract_after(df)
    assert flat.columns == ["id", "first_name", "last_name", "email"]
    assert flat.count() == 6
    state = envelope.with_flattened_state(df)
    dels = state.filter("__deleted").select("__row.id").collect()
    assert [r[0] for r in dels] == [1005]


def test_partition_routing_stable(spark):
    df = customers_changelog_df(spark)
    routed = with_partition_routing(df, 8, key_col="key")
    parts = routed.select("key.id", "partition").distinct().collect()
    by_id = {}
    for r in parts:
        by_id.setdefault(r["id"], set()).add(r["partition"])
    assert all(len(v) == 1 for v in by_id.values())  # same key → same partition
    assert all(0 <= p < 8 for v in by_id.values() for p in v)


class TestSkewSalting:
    def test_salted_count_equals_direct(self, spark):
        from debezium_server_spark.operators.routing import salt_key, salted_count
        from pyspark.sql import functions as F

        # one pathological hot key + a uniform tail
        rows = [("hot", i) for i in range(500)] + [(f"k{i%7}", i) for i in range(200)]
        df = spark.createDataFrame(rows, "k string, v long")
        direct = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
        salted = {r["k"]: r["n"] for r in salted_count(df, "k", buckets=16).collect()}
        assert salted == direct
        # the hot key genuinely spreads across sub-keys
        n_sub = (
            salt_key(df, "k", 16)
            .filter(F.col("k") == "hot")
            .select("salted_key")
            .distinct()
            .count()
        )
        assert n_sub > 4


class TestExtractNewRecordState:
    def _events(self, spark):
        from pyspark.sql import types as T

        from debezium_server_spark.schema import event_schema

        row = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
        )
        key = T.StructType([T.StructField("id", T.LongType())])
        return spark.createDataFrame(
            [
                ("t", {"id": 1},
                 {"op": "c", "before": None, "after": {"id": 1, "name": "a"},
                  "source": {"lsn": 5}, "ts_ms": 10}, [], 0),
                ("t", {"id": 1},
                 {"op": "d", "before": {"id": 1, "name": "a"}, "after": None,
                  "source": {"lsn": 6}, "ts_ms": 11}, [], 0),
                ("t", {"id": 1}, None, [], 0),  # tombstone
            ],
            event_schema(row, key),
        )

    def test_rewrite_mode_with_add_fields(self, spark):
        from debezium_server_spark.operators.envelope import extract_new_record_state

        out = extract_new_record_state(
            self._events(spark), add_fields=("op", "ts_ms", "source.lsn")
        ).collect()
        assert len(out) == 2  # tombstone dropped, delete rewritten
        by_op = {r["__op"]: r for r in out}
        assert by_op["c"]["name"] == "a" and by_op["c"]["__deleted"] is False
        assert by_op["d"]["__deleted"] is True
        assert by_op["d"]["name"] == "a"  # before image for deletes
        assert by_op["d"]["__source_lsn"] == 6
        assert by_op["c"]["__ts_ms"] == 10

    def test_drop_mode(self, spark):
        from debezium_server_spark.operators.envelope import extract_new_record_state

        out = extract_new_record_state(self._events(spark), delete_mode="drop")
        rows = out.collect()
        assert [r["name"] for r in rows] == ["a"]
        assert "__deleted" not in out.columns

    def test_bad_mode_raises(self, spark):
        import pytest

        from debezium_server_spark.operators.envelope import extract_new_record_state

        with pytest.raises(ValueError):
            extract_new_record_state(self._events(spark), delete_mode="nope")


class TestOutboxRouter:
    def test_routing_and_payload(self, spark):
        from pyspark.sql import types as T

        from debezium_server_spark.operators.transforms import outbox_router
        from debezium_server_spark.schema import event_schema

        row = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("aggregatetype", T.StringType()),
                T.StructField("aggregateid", T.StringType()),
                T.StructField("payload", T.StringType()),
            ]
        )
        key = T.StructType([T.StructField("id", T.LongType())])
        events = spark.createDataFrame(
            [
                ("db.public.outbox", {"id": 1},
                 {"op": "c", "before": None,
                  "after": {"id": 1, "aggregatetype": "order", "aggregateid": "o-9",
                            "payload": '{"total": 12}'},
                  "source": {"lsn": 1}, "ts_ms": 100}, [], 0),
                # outbox cleanup delete must NOT be routed
                ("db.public.outbox", {"id": 1},
                 {"op": "d",
                  "before": {"id": 1, "aggregatetype": "order", "aggregateid": "o-9",
                             "payload": None},
                  "after": None, "source": {"lsn": 2}, "ts_ms": 101}, [], 0),
            ],
            event_schema(row, key),
        )
        out = outbox_router(events).collect()
        assert len(out) == 1
        r = out[0]
        assert r["destination"] == "outbox.event.order"
        assert r["key"] == "o-9"
        assert r["value"] == '{"total": 12}'
        assert r["ts_ms"] == 100


def test_timestamp_router(spark):
    from debezium_server_spark.operators.transforms import timestamp_router

    df = spark.createDataFrame(
        [("orders", 1700000000123), ("orders", None)],
        "destination string, ts bigint",
    ).selectExpr(
        "destination", "named_struct('ts_ms', ts) AS value"
    )
    out = Chain([timestamp_router("${topic}-${timestamp}", "yyyyMMdd")]).apply(df)
    dests = sorted(r["destination"] for r in out.collect())
    assert dests == ["orders", "orders-20231114"], (
        "event routed to time-suffixed destination; null ts unrouted"
    )

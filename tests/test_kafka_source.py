"""Kafka transport adapter on synthetic frames with the exact Kafka
source/sink column contracts (no broker needed to validate projections)."""

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.operators.materialize import materialize
from debezium_server_spark.sources.kafka_source import (
    events_to_kafka_frame,
    kafka_frame_to_events,
)

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)
KEY = T.StructType([T.StructField("id", T.LongType())])

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def kafka_record(topic, key, envelope, offset, headers=None):
    return (
        json.dumps(key).encode() if key is not None else None,
        json.dumps(envelope).encode() if envelope is not None else None,
        topic,
        0,
        offset,
        None,
        [{"key": k, "value": v.encode()} for k, v in (headers or {}).items()] or None,
    )


@pytest.fixture(scope="module")
def kafka_df(spark):
    recs = [
        kafka_record(
            "inv.customers", {"id": 1},
            {"op": "c", "before": None, "after": {"id": 1, "name": "a"},
             "source": {"lsn": 11}, "ts_ms": 1},
            offset=0, headers={"h": "v"},
        ),
        # no source block → lsn backfilled from the Kafka offset
        kafka_record(
            "inv.customers", {"id": 2},
            {"op": "c", "before": None, "after": {"id": 2, "name": "b"}, "ts_ms": 2},
            offset=7,
        ),
        # update then tombstone for id=1
        kafka_record(
            "inv.customers", {"id": 1},
            {"op": "u", "before": {"id": 1, "name": "a"},
             "after": {"id": 1, "name": "a2"}, "source": {"lsn": 12}, "ts_ms": 3},
            offset=2,
        ),
        kafka_record("inv.customers", {"id": 1}, None, offset=3),
    ]
    return spark.createDataFrame(recs, KAFKA_SCHEMA)


def test_inbound_projection(kafka_df):
    ev = kafka_frame_to_events(kafka_df, ROW, KEY)
    rows = ev.collect()
    assert {r["destination"] for r in rows} == {"inv.customers"}
    by_off = {r["value"]["source"]["lsn"]: r for r in rows if r["value"] is not None}
    assert by_off[11]["value"]["after"]["name"] == "a"
    assert by_off[7]["value"]["op"] == "c"  # backfilled lsn = offset 7
    assert [h.asDict() for h in by_off[11]["headers"]] == [{"key": "h", "value": "v"}]
    tombstones = [r for r in rows if r["value"] is None]
    assert len(tombstones) == 1  # null value survives as a tombstone


def test_inbound_feeds_materialize(kafka_df):
    ev = kafka_frame_to_events(kafka_df, ROW, KEY)
    state = {r["id"]: r["name"] for r in materialize(ev).collect()}
    assert state == {1: "a2", 2: "b"}  # latest-wins by lsn


def test_outbound_contract(kafka_df, spark):
    ev = kafka_frame_to_events(kafka_df, ROW, KEY).filter(F.col("value").isNotNull())
    out = events_to_kafka_frame(ev)
    assert [f.name for f in out.schema.fields] == ["topic", "key", "value", "headers"]
    assert out.schema["key"].dataType.simpleString() == "binary"
    r = out.filter(F.col("topic") == "inv.customers").first()
    assert json.loads(bytes(r["value"]))["op"] in ("c", "u")

"""Serialization formats + schema history."""

import json

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.operators.schema_history import (
    SchemaHistory,
    schema_versions,
)
from debezium_server_spark.operators.serialization import (
    headers_as_map,
    serialize,
)


@pytest.fixture(scope="module")
def events(spark):
    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    key_schema = T.StructType([T.StructField("id", T.LongType())])
    from debezium_server_spark.schema import event_schema

    data = [
        (
            "inv.customers",
            {"id": 1},
            {
                "op": "c",
                "before": None,
                "after": {"id": 1, "name": "a"},
                "source": {"lsn": 7},
                "ts_ms": 1700000000123,
            },
            [{"key": "h1", "value": "v1"}, {"key": "h2", "value": "v2"}],
            0,
        )
    ]
    return spark.createDataFrame(data, event_schema(row_schema, key_schema))


def test_json_format(events):
    r = serialize(events, "json").first()
    assert json.loads(r["key"]) == {"id": 1}
    assert json.loads(r["value"])["after"] == {"id": 1, "name": "a"}


def test_jsonbytearray_and_binary(events):
    for fmt in ("jsonbytearray", "binary"):
        r = serialize(events, fmt).first()
        assert isinstance(r["value"], (bytes, bytearray))
        assert json.loads(bytes(r["value"]))["op"] == "c"


def test_simplestring(events):
    r = serialize(events, "simplestring").first()
    assert json.loads(r["value"]) == {"id": 1, "name": "a"}


def test_cloudevents_envelope(events):
    r = serialize(events, "cloudevents").first()
    ce = json.loads(r["value"])
    assert ce["specversion"] == "1.0"
    assert ce["id"] == "inv.customers:1700000000123"
    assert ce["type"].endswith("DataChangeEvent")
    assert ce["time"].startswith("2023-11-14T")  # ts_ms rendered UTC
    assert ce["data"]["after"]["name"] == "a"


def test_binary_formats_serialize(events):
    for fmt in ("avro", "protobuf"):
        rows = serialize(events, fmt).collect()
        assert all(r["value"] is None or isinstance(r["value"], (bytes, bytearray))
                   for r in rows)
        assert any(r["value"] for r in rows)
    with pytest.raises(ValueError):
        serialize(events, "nope")


def test_headers_as_map(events):
    m = events.select(headers_as_map().alias("m")).first()["m"]
    assert m == {"h1": "v1", "h2": "v2"}


class TestSchemaHistory:
    def _mk_events(self, spark, rows):
        # serialized-frame events: per-row schema shape in the JSON value
        return spark.createDataFrame(
            rows, "destination string, value string"
        ).select(
            "destination",
            F.struct(
                F.get_json_object("value", "$.op").alias("op"),
                F.from_json(
                    F.get_json_object("value", "$.after"), "map<string,string>"
                ).alias("after"),
                F.struct(
                    F.get_json_object("value", "$.lsn").cast("long").alias("lsn")
                ).alias("source"),
                F.get_json_object("value", "$.ts_ms").cast("long").alias("ts_ms"),
            ).alias("value"),
        )

    def test_versions_and_drift(self, spark, tmp_path):
        ev = self._mk_events(
            spark,
            [
                ("t1", json.dumps({"op": "c", "after": {"id": "1"}, "lsn": 1, "ts_ms": 10})),
                ("t1", json.dumps({"op": "c", "after": {"id": "2"}, "lsn": 2, "ts_ms": 20})),
                # t1 evolves: new column appears
                ("t1", json.dumps({"op": "c", "after": {"id": "3", "email": "x"}, "lsn": 3, "ts_ms": 30})),
                ("t2", json.dumps({"op": "c", "after": {"sku": "a"}, "lsn": 1, "ts_ms": 10})),
            ],
        )
        versions = schema_versions(ev).collect()
        t1_versions = [v for v in versions if v["destination"] == "t1"]
        assert len(t1_versions) == 2  # two distinct shapes
        hist = SchemaHistory(str(tmp_path))
        hist.record(ev, epoch_id=0)
        hist.record(ev.limit(1), epoch_id=1)  # replay is consolidated
        stored = hist.read(spark).collect()
        assert {(r["destination"], r["n_events"] > 0) for r in stored} >= {("t1", True), ("t2", True)}
        drift = hist.drifted_destinations(spark).collect()
        assert [d["destination"] for d in drift] == ["t1"]
        assert drift[0]["n_versions"] == 2


def test_clientprovided_format(events):
    from pyspark.sql import functions as F

    out = serialize(
        events, "clientprovided",
        value_expr=F.upper(F.to_json("value.after")),
    ).collect()
    payloads = [r["value"] for r in out if r["value"]]
    assert payloads and all(p == p.upper() for p in payloads)
    # unset key side passes through typed
    assert any(r["key"] is not None and not isinstance(r["key"], str) for r in out)


def test_header_formats(events):
    r = serialize(events, "json", header_format="json").first()
    assert json.loads(r["headers"]) == {"h1": "v1", "h2": "v2"}
    rb = serialize(events, "json", header_format="jsonbytearray").first()
    assert json.loads(bytes(rb["headers"])) == {"h1": "v1", "h2": "v2"}
    rc = serialize(events, "json", header_format="connect").first()
    assert rc["headers"][0]["key"] == "h1"  # typed entries kept
    with pytest.raises(ValueError):
        serialize(events, "json", header_format="avro")

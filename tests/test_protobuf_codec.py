"""Protobuf wire codec: golden vectors from the encoding docs, python
round-trip, GOOGLE-runtime interop (the protobuf shaded into orc-core
parses our bytes), and the serialize_protobuf frame format."""

import json

import pytest
from pyspark.sql import types as T

from debezium_server_spark.functions.protobuf_codec import (
    decode,
    descriptor_of,
    encode,
    frame_confluent,
)
from debezium_server_spark.operators.serialization import serialize_protobuf

SPEC = {
    "name": "Rec",
    "fields": [
        {"name": "a", "number": 1, "type": "int64"},
        {"name": "b", "number": 2, "type": "string"},
        {"name": "c", "number": 3, "type": "double"},
        {"name": "ok", "number": 4, "type": "bool"},
        {"name": "tags", "number": 5, "type": "string", "repeated": True},
        {"name": "sub", "number": 6, "type": "message", "message": {
            "name": "Sub", "fields": [
                {"name": "x", "number": 1, "type": "int64"}]}},
        {"name": "attrs", "number": 7, "type": "map", "message": {
            "name": "E", "fields": [
                {"name": "key", "number": 1, "type": "string"},
                {"name": "value", "number": 2, "type": "int64"}]}},
    ],
}


def test_golden_vectors_from_protobuf_docs():
    # https://protobuf.dev/programming-guides/encoding/: field 1 varint
    # 150 → 08 96 01; field 2 string "testing" → 12 07 74 ... 67
    assert encode({"a": 150}, SPEC) == bytes.fromhex("089601")
    assert encode({"b": "testing"}, SPEC) == bytes.fromhex("120774657374696e67")


def test_round_trip_all_shapes():
    v = {"a": -3, "b": "héllo", "c": 2.5, "ok": True,
         "tags": ["x", "y"], "sub": {"x": 9}, "attrs": {"k": 1, "j": 2}}
    assert decode(encode(v, SPEC), SPEC) == v


def test_absent_fields_stay_absent():
    out = decode(encode({"a": 1}, SPEC), SPEC)
    assert out == {"a": 1}, "proto3 presence: nothing else on the wire"


def test_unknown_fields_are_skipped():
    data = encode({"a": 7, "b": "keep"}, SPEC)
    narrow = {"name": "N", "fields": [{"name": "b", "number": 2,
                                       "type": "string"}]}
    assert decode(data, narrow) == {"b": "keep"}


def test_confluent_framing():
    payload = frame_confluent(encode({"a": 1}, SPEC), schema_id=55)
    assert payload[0] == 0
    assert int.from_bytes(payload[1:5], "big") == 55
    assert payload[5] == 0  # empty message-index path


def test_google_runtime_parses_our_bytes(spark):
    """Interop gate: Google's CodedInputStream (shaded in orc-core on
    Spark's classpath) must walk every tag/value we emit."""
    jvm = spark.sparkContext._jvm
    data = encode({"a": 150, "b": "testing", "sub": {"x": 2}}, SPEC)
    cis = jvm.org.apache.orc.protobuf.CodedInputStream.newInstance(
        bytearray(data))
    assert cis.readTag() == (1 << 3) | 0
    assert cis.readInt64() == 150
    assert cis.readTag() == (2 << 3) | 2
    assert str(cis.readStringRequireUtf8()) == "testing"
    assert cis.readTag() == (6 << 3) | 2
    sub = bytes(cis.readByteArray())
    assert decode(sub, SPEC["fields"][5]["message"]) == {"x": 2}
    assert cis.isAtEnd()


def test_descriptor_of_event_types():
    dt = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("names", T.ArrayType(T.StringType())),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("nested", T.StructType([T.StructField("x", T.DoubleType())])),
    ])
    spec = descriptor_of(dt, "K")
    by = {f["name"]: f for f in spec["fields"]}
    assert by["id"]["type"] == "int64" and by["id"]["number"] == 1
    assert by["names"]["repeated"] and by["names"]["type"] == "string"
    assert by["meta"]["type"] == "map"
    assert by["nested"]["message"]["fields"][0]["type"] == "double"
    with pytest.raises(TypeError):
        descriptor_of(T.StructType([
            T.StructField("bad", T.MapType(T.LongType(), T.StringType()))]))


def test_serialize_protobuf_frame(spark):
    from tests.fixtures import customers_changelog_df

    frame = customers_changelog_df(spark)
    value_spec = descriptor_of(frame.schema["value"].dataType, "Value")
    rows = serialize_protobuf(frame, schema_id=3).collect()
    assert any(r["value"] for r in rows)
    for row in rows:
        if row["value"] is None:
            continue
        b = bytes(row["value"])
        assert b[0] == 0 and int.from_bytes(b[1:5], "big") == 3
        v = decode(b[6:], value_spec)
        assert v["op"] in ("r", "c", "u", "d")

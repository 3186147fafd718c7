"""Avro binary codec: python round-trip, JAVA-library interop (the
canonical Apache Avro jar bundled with Spark decodes our bytes), wire
framing, and the serialize_avro frame format."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.functions.avro_codec import (
    avro_schema_of,
    decode,
    encode,
)
from debezium_server_spark.operators.serialization import serialize_avro

RECORD_SCHEMA = {
    "type": "record", "name": "Rec", "namespace": "t",
    "fields": [
        {"name": "id", "type": ["null", "long"], "default": None},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "score", "type": ["null", "double"], "default": None},
        {"name": "ok", "type": ["null", "boolean"], "default": None},
        {"name": "tags", "type": ["null", {"type": "array",
                                           "items": ["null", "string"]}],
         "default": None},
        {"name": "attrs", "type": ["null", {"type": "map",
                                            "values": ["null", "long"]}],
         "default": None},
        {"name": "nested", "type": ["null", {
            "type": "record", "name": "Sub", "fields": [
                {"name": "x", "type": ["null", "long"], "default": None}]}],
         "default": None},
    ],
}


def test_python_round_trip_all_types():
    v = {"id": -42, "name": "héllo", "score": 2.5, "ok": True,
         "tags": ["a", None, "b"], "attrs": {"k1": 1, "k2": None},
         "nested": {"x": 7}}
    out = decode(encode(v, RECORD_SCHEMA), RECORD_SCHEMA)
    assert out == v


def test_missing_and_null_fields_take_null_branch():
    out = decode(encode({"id": 1}, RECORD_SCHEMA), RECORD_SCHEMA)
    assert out["id"] == 1
    assert out["name"] is None and out["nested"] is None


def test_wire_framing_round_trip():
    payload = encode({"id": 9}, RECORD_SCHEMA, schema_id=1234)
    assert payload[0] == 0  # magic byte
    schema_id, v = decode(payload, RECORD_SCHEMA, framed=True)
    assert schema_id == 1234 and v["id"] == 9


def test_zigzag_extremes_round_trip():
    sch = {"type": "record", "name": "L", "fields": [
        {"name": "v", "type": ["null", "long"], "default": None}]}
    for n in (0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert decode(encode({"v": n}, sch), sch)["v"] == n


def test_java_avro_decodes_python_bytes(spark):
    """Interop gate: the canonical Java implementation (avro-1.12.1.jar
    on Spark's classpath) must parse our schema and decode our binary."""
    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(RECORD_SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    v = {"id": 77, "name": "interop", "score": -0.5, "ok": False,
         "tags": ["x", "y"], "attrs": {"n": 3}, "nested": {"x": 1}}
    payload = encode(v, RECORD_SCHEMA)
    decoder = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(payload), None)
    rec = reader.read(None, decoder)
    assert rec.get("id") == 77
    assert str(rec.get("name")) == "interop"
    assert rec.get("score") == -0.5
    assert rec.get("ok") is False
    assert str(rec.get("nested").get("x")) == "1"
    tags = rec.get("tags")
    assert [str(tags.get(i)) for i in range(tags.size())] == ["x", "y"]


def test_schema_of_event_frame_types():
    dt = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    ])
    sch = avro_schema_of(dt, "K")
    names = {f["name"]: f["type"][1] for f in sch["fields"]}
    assert names["id"] == "long"
    assert names["vals"]["type"] == "array"
    assert names["m"]["type"] == "map"
    with pytest.raises(TypeError):
        avro_schema_of(T.MapType(T.LongType(), T.StringType()))


def test_serialize_avro_frame(spark):
    from tests.fixtures import customers_changelog_df

    event_frame = customers_changelog_df(spark)
    out = serialize_avro(event_frame, schema_id=7).collect()
    assert out, "no rows"
    value_schema = ["null", avro_schema_of(
        event_frame.schema["value"].dataType, "Value")]
    for row in out:
        if row["value"] is None:
            continue  # tombstone stays a null payload
        schema_id, v = decode(row["value"], value_schema, framed=True)
        assert schema_id == 7
        assert v["op"] in ("r", "c", "u", "d")


# ------------------------------------------------ object container files


def test_container_round_trip_and_codecs():
    from debezium_server_spark.functions.avro_codec import (
        read_container,
        write_container,
    )

    vals = [{"id": i, "name": f"n{i}", "score": None, "ok": i % 2 == 0,
             "tags": [str(i)], "attrs": {"k": i}, "nested": None}
            for i in range(50)]
    for codec in ("null", "deflate"):
        raw = write_container(vals, RECORD_SCHEMA, codec=codec,
                              sync_marker=b"0123456789abcdef")
        schema, out = read_container(raw)
        assert schema == RECORD_SCHEMA and out == vals
    assert read_container(
        write_container([], RECORD_SCHEMA)) == (RECORD_SCHEMA, [])
    with pytest.raises(ValueError, match="container"):
        read_container(b"PK\x03\x04rest")
    raw = bytearray(write_container(vals, RECORD_SCHEMA,
                                    sync_marker=b"0123456789abcdef"))
    raw[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(raw))


def test_java_reads_container_file(spark, tmp_path):
    """The canonical avro-1.12.1.jar DataFileReader consumes container
    files written here — both codecs."""
    from debezium_server_spark.functions.avro_codec import write_container

    vals = [{"id": 1, "name": "a", "score": 0.5, "ok": True,
             "tags": ["x", "y"], "attrs": None, "nested": {"x": 9}},
            {"id": 2, "name": None, "score": None, "ok": None,
             "tags": [], "attrs": None, "nested": None}]
    jvm = spark.sparkContext._jvm
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"f_{codec}.avro")
        with open(path, "wb") as f:
            f.write(write_container(vals, RECORD_SCHEMA, codec=codec))
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader())
        got = []
        while reader.hasNext():
            got.append(reader.next())
        reader.close()
        assert len(got) == 2
        assert got[0].get("id") == 1 and str(got[0].get("name")) == "a"
        assert [str(t) for t in got[0].get("tags")] == ["x", "y"]
        assert got[1].get("name") is None


def test_corrupt_union_branch_raises_value_error():
    """A corrupted union branch index must raise the codec's error
    type, not IndexError (mutation-soak find)."""
    import struct

    raw = bytearray(encode({"id": 1}, RECORD_SCHEMA))
    raw[0] = 0x7E  # id's union index varint -> branch 63
    with pytest.raises(ValueError, match="union branch"):
        decode(bytes(raw), RECORD_SCHEMA)


def test_multi_block_container_round_trip_and_java(spark, tmp_path):
    """Values exceeding max_block_bytes split across several data
    blocks (the spec's streaming unit); our reader AND the Java
    DataFileReader consume the multi-block file."""
    from debezium_server_spark.functions.avro_codec import (
        read_container,
        write_container,
    )

    vals = [{"id": i, "name": "x" * 50, "score": None, "ok": None,
             "tags": None, "attrs": None, "nested": None}
            for i in range(400)]
    raw = write_container(vals, RECORD_SCHEMA, max_block_bytes=2048,
                          sync_marker=b"0123456789abcdef")
    # more than one block: the sync marker appears > 2 times (header
    # + one per block)
    assert raw.count(b"0123456789abcdef") > 2
    _, out = read_container(raw)
    assert out == vals
    path = str(tmp_path / "multi.avro")
    with open(path, "wb") as f:
        f.write(raw)
    jvm = spark.sparkContext._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader())
    n = 0
    while reader.hasNext():
        reader.next()
        n += 1
    reader.close()
    assert n == 400

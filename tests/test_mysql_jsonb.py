"""MySQL binary JSON (`functions/mysql_jsonb.py`): golden vectors
hand-packed from the public layout doc (json_binary.h / WL#8132),
round trips, hypothesis fuzz over JSON-like values, strictness, and
the T_JSON cell wired through the binlog ROW-event codec."""

import json
import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_server_spark.functions.binlog_codec import (
    T_JSON,
    T_LONGLONG,
    decode_event,
    encode_event,
)
from debezium_server_spark.functions.mysql_jsonb import (
    JsonDecimal,
    JsonOpaque,
    decode,
    encode,
    to_jsonable,
)

# ------------------------------------------------------- golden vectors
# Hand-assembled from the spec grammar: small formats use uint16
# counts/sizes/offsets, key-length is always uint16, offsets are
# relative to the element-count byte, literal/int16/uint16 inline in
# the value entry.


def test_golden_small_object_one_int():
    # {"a": 2}: count=1, size=12, key entry (off=11, len=1),
    # value entry (int16, inlined 2), key 'a'
    raw = bytes.fromhex("00" "0100" "0c00" "0b00" "0100" "05" "0200") + b"a"
    assert decode(raw) == {"a": 2}
    assert encode({"a": 2}) == raw


def test_golden_small_array_string_and_int():
    # ["a", 2]: count=2, size=12, entries (string @10, int16 inline 2),
    # string payload = varlen 1 + 'a'
    raw = bytes.fromhex("02" "0200" "0c00" "0c" "0a00" "05" "0200"
                        "01") + b"a"
    assert decode(raw) == ["a", 2]
    assert encode(["a", 2]) == raw


def test_golden_top_level_scalars():
    assert decode(b"\x04\x00") is None
    assert decode(b"\x04\x01") is True
    assert decode(b"\x04\x02") is False
    assert encode(True) == b"\x04\x01"
    assert decode(b"\x05\xfe\xff") == -2
    assert decode(b"\x0b" + struct.pack("<d", 1.5)) == 1.5
    assert decode(b"\x0c\x02hi") == "hi"
    assert encode("hi") == b"\x0c\x02hi"


def test_golden_nested_object_with_array():
    # {"k": [true, null]}: outer count=1 size=22, key 'k' @11,
    # value entry (small array @12); inner count=2 size=10,
    # both literals inlined
    inner = bytes.fromhex("0200" "0a00" "04" "0100" "04" "0000")
    raw = (bytes.fromhex("00" "0100" "1600" "0b00" "0100" "02" "0c00")
           + b"k" + inner)
    assert decode(raw) == {"k": [True, None]}
    assert encode({"k": [True, None]}) == raw


def test_golden_opaque_decimal():
    # DECIMAL(4,2) 3.14 as opaque NEWDECIMAL: 0x0f, field type 246,
    # varlen 4, precision 4, scale 2, packed decimal 83 0e
    raw = bytes.fromhex("0f" "f6" "04" "0402" "830e")
    assert decode(raw) == JsonDecimal("3.14", 4, 2)
    assert encode(JsonDecimal("3.14", 4, 2)) == raw
    assert to_jsonable(decode(raw)) == "3.14"


def test_object_keys_sorted_by_length_then_bytes():
    # the server's key order; pinned because offsets depend on it
    raw = encode({"bb": 1, "a": 2, "c": 3})
    assert list(decode(raw)) == ["a", "c", "bb"]


def test_unsigned_decode_int64_boundary():
    # uint64 values past int64 decode exactly and re-encode as uint64
    v = (1 << 64) - 1
    raw = encode(v)
    assert raw[0] == 0x0A and decode(raw) == v


def test_large_format_when_small_overflows():
    # >64 KiB of strings forces the large array format (type 0x03)
    big = ["x" * 1000 for _ in range(70)]
    raw = encode(big)
    assert raw[0] == 0x03
    assert decode(raw) == big


def test_unknown_opaque_round_trips_byte_faithful():
    op = JsonOpaque(10, b"\x01\x02\x03")  # MYSQL_TYPE_DATE payload
    raw = encode({"d": op})
    assert decode(raw) == {"d": op}
    assert encode(decode(raw)) == raw
    proj = to_jsonable(decode(raw))
    assert proj["d"]["$opaque"] == 10


# ------------------------------------------------------------ strictness


def test_bad_type_byte_raises():
    with pytest.raises(ValueError, match="unsupported JSON binary"):
        decode(b"\x0d\x00")


def test_truncated_string_raises():
    with pytest.raises(EOFError):
        decode(b"\x0c\x05hi")


def test_offset_outside_container_raises():
    # value entry points past the declared container size
    raw = bytearray(encode(["a", 2]))
    raw[6] = 0xFF  # string offset low byte → 255 > size
    with pytest.raises(ValueError, match="outside"):
        decode(bytes(raw))


def test_empty_cell_raises():
    with pytest.raises(EOFError):
        decode(b"")


# ------------------------------------------------------------ fuzz

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=12), children, max_size=6)),
    max_leaves=25)


@settings(max_examples=200, deadline=None)
@given(_values)
def test_fuzz_round_trip(v):
    assert decode(encode(v)) == v


# --------------------------------------------- through the binlog cell


def test_json_column_through_rows_event():
    doc = {"tags": ["a", "b"], "depth": 2, "price": JsonDecimal(
        "19.99", 4, 2), "ok": True, "note": None}
    cols = [{"type": T_LONGLONG, "nullable": False},
            {"type": T_JSON, "meta": 4, "nullable": True}]
    ev = {"type": "write_rows", "table_id": 7, "columns": cols,
          "rows": [[1, doc], [2, None]], "timestamp": 5, "log_pos": 9}
    back = decode_event(encode_event(ev), columns_of=lambda t: cols)
    assert back["rows"][0] == [1, doc]
    assert back["rows"][1] == [2, None]  # SQL NULL via the null bitmap


def test_json_column_table_map_meta_round_trip():
    cols = [{"type": T_JSON, "meta": 4, "nullable": True}]
    tm = {"type": "table_map", "table_id": 7, "schema": "db",
          "table": "j", "columns": cols, "timestamp": 0, "log_pos": 0}
    back = decode_event(encode_event(tm))
    assert back["columns"] == [{"type": T_JSON, "meta": 4,
                                "nullable": True}]


def test_json_column_through_spark_stage(spark):
    """Pin test (policy: JSON cells surface as canonical JSON TEXT in
    the envelope image, decimals exact): full binlog source path with
    a JSON column."""
    from pyspark.sql import types as T

    from debezium_server_spark.sources.binlog_source import (
        decode_binlog_changelog,
    )

    cols = [{"type": T_LONGLONG, "nullable": False},
            {"type": T_JSON, "meta": 4, "nullable": True}]
    events = [
        (1, encode_event({"type": "table_map", "table_id": 9,
                          "schema": "db", "table": "j", "columns": cols,
                          "timestamp": 3, "log_pos": 1})),
        (2, encode_event({"type": "write_rows", "table_id": 9,
                          "columns": cols,
                          "rows": [[1, {"a": [1, 2], "d": JsonDecimal(
                              "0.50", 3, 2)}]],
                          "timestamp": 3, "log_pos": 2})),
    ]
    schema = T.StructType([T.StructField("seq", T.LongType()),
                           T.StructField("data", T.BinaryType())])
    df = spark.createDataFrame(
        [(s, bytearray(d)) for s, d in events], schema)
    out = decode_binlog_changelog(df, {"db.j": ["id", "doc"]}).collect()
    (row,) = out
    assert row["error"] is None and row["op"] == "c"
    after = json.loads(row["after"])
    assert after == {"id": 1, "doc": {"a": [1, 2], "d": "0.50"}}


def test_opaque_cannot_impersonate_decimal():
    """Fuzz-soak find (round 6): decode() always parses opaque field
    type 246 as NEWDECIMAL, so encoding a JsonOpaque carrying that
    type with arbitrary bytes would produce a document decode()
    rejects — the construction is forbidden (use JsonDecimal), the
    BsonBinary-subtype symmetry lesson."""
    with pytest.raises(ValueError, match="JsonDecimal"):
        encode(JsonOpaque(246, b"\x51\x66\xc3"))
    with pytest.raises(ValueError, match="JsonDecimal"):
        encode({"k": [JsonOpaque(246, b"")]})


def test_truncated_fixed_width_read_raises_eof():
    """A document cut inside a fixed-width scalar must raise
    EOFError/ValueError, not struct.error (mutation-soak find)."""
    from debezium_server_spark.functions.mysql_jsonb import decode, encode

    raw = encode({"a": 1.5, "b": [1, 2, 3]})
    for cut in range(1, len(raw)):
        try:
            decode(raw[:cut])
        except (EOFError, ValueError, KeyError):
            pass  # the decode contract's error types

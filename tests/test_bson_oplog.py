"""BSON codec + MongoDB oplog decode: golden vectors straight from
bsonspec.org, python round-trips, hypothesis fuzz, and the Spark oplog
envelope stage with op-direction pins and quarantine."""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from debezium_server_spark.functions.bson_codec import (
    BsonTimestamp,
    ObjectId,
    UtcDatetime,
    decode,
    encode,
)
from debezium_server_spark.sources.oplog_source import (
    decode_oplog_changelog,
    decode_oplog_entry,
    doc_to_json,
)


# ------------------------------------------------------- golden vectors


def test_golden_hello_world_from_bsonspec():
    # bsonspec.org §Faq example: {"hello": "world"}
    expect = bytes.fromhex(
        "16000000" "02" "68656c6c6f00" "06000000" "776f726c6400" "00")
    assert encode({"hello": "world"}) == expect
    assert decode(expect) == {"hello": "world"}


def test_golden_array_doc_from_bsonspec():
    # bsonspec.org: {"BSON": ["awesome", 5.05, 1986]}
    expect = bytes.fromhex(
        "31000000"                  # document size
        "04" "42534f4e00"           # array "BSON"
        "26000000"                  # array-document size
        "02" "3000" "08000000" "617765736f6d6500"   # "0": "awesome"
        "01" "3100" "3333333333331440"              # "1": 5.05
        "10" "3200" "c2070000"                      # "2": 1986
        "00"                        # end of array document
        "00")                       # end of document
    assert encode({"BSON": ["awesome", 5.05, 1986]}) == expect
    assert decode(expect) == {"BSON": ["awesome", 5.05, 1986]}


@pytest.mark.parametrize("doc", [
    {},
    {"a": None, "b": True, "c": False},
    {"i32": 7, "i32min": -(2**31), "i64": 2**31, "neg": -(2**31) - 1},
    {"f": 2.5, "s": "héllo✓", "b": b"\x00\x01\xff"},
    {"nested": {"x": [1, {"y": "z"}, None]}},
    {"_id": ObjectId("5f1d3b4e9c6a4f2a8e000001")},
    {"ts": BsonTimestamp(1700000000, 3), "at": UtcDatetime(946684800000)},
])
def test_round_trip(doc):
    assert decode(encode(doc)) == doc


def test_key_order_preserved():
    doc = {"z": 1, "a": 2, "m": 3}
    assert list(decode(encode(doc))) == ["z", "a", "m"]


def test_uuid_binary_subtype_preserved_exact_round_trip():
    """ADVICE r5: decode→encode of a subtype-4 (UUID) binary must
    reproduce the byte stream exactly — not silently rewrite it as
    subtype 0 (generic)."""
    from debezium_server_spark.functions.bson_codec import BsonBinary

    uid = bytes(range(16))
    raw = encode({"u": BsonBinary(0x04, uid), "g": b"\x01\x02"})
    doc = decode(raw)
    assert doc["u"] == BsonBinary(0x04, uid)
    assert doc["g"] == b"\x01\x02"  # generic stays plain bytes
    assert encode(doc) == raw  # exact byte fidelity
    # JSON projection carries the subtype
    assert json.loads(doc_to_json(doc))["u"]["subtype"] == 4


def test_trailing_and_truncated_rejected():
    raw = encode({"a": 1})
    with pytest.raises(ValueError, match="trailing"):
        decode(raw + b"\x00")
    with pytest.raises((EOFError, ValueError)):
        decode(raw[:-2])


def test_size_mismatch_rejected():
    raw = bytearray(encode({"a": 1}))
    raw[0] += 1  # lie about the document size
    with pytest.raises((ValueError, EOFError)):
        decode(bytes(raw))


# keys: no NUL (cstring); values: arbitrary text
_key = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=1, max_size=20)
_scalar = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=30),
    st.binary(max_size=30),
    st.builds(UtcDatetime, st.integers(-(2**63), 2**63 - 1)),
    st.builds(BsonTimestamp, st.integers(0, 2**32 - 1),
              st.integers(0, 2**32 - 1)),
)
_values = st.recursive(
    _scalar,
    lambda inner: st.one_of(st.lists(inner, max_size=4),
                            st.dictionaries(_key, inner, max_size=4)),
    max_leaves=12)


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(_key, _values, max_size=6))
def test_bson_round_trip_fuzz(doc):
    assert decode(encode(doc)) == doc


# ------------------------------------------------------------- oplog


def _entry(op, ns="app.events", o=None, o2=None, sec=100):
    e = {"ts": BsonTimestamp(sec, 1), "t": 1, "v": 2, "op": op, "ns": ns}
    if o is not None:
        e["o"] = o
    if o2 is not None:
        e["o2"] = o2
    return e


def test_oplog_op_direction_pins():
    # insert → c with after; replacement update → u with after; delete
    # → d with KEY-ONLY before and null after (completeness pin)
    ins = decode_oplog_entry(_entry("i", o={"_id": 5, "x": 1}))
    assert ins[1] == "c" and json.loads(ins[3]) == {"_id": 5, "x": 1}
    upd = decode_oplog_entry(
        _entry("u", o={"_id": 5, "x": 2}, o2={"_id": 5}))
    assert upd[1] == "u" and json.loads(upd[3]) == {"_id": 5, "x": 2}
    assert json.loads(upd[2]) == {"_id": 5}
    dele = decode_oplog_entry(_entry("d", o={"_id": 5}))
    assert dele[1] == "d" and dele[3] is None
    assert json.loads(dele[2]) == {"_id": 5}


def test_oplog_v2_diff_update_becomes_patch():
    diff = {"u": {"x": 9}}
    row = decode_oplog_entry(
        _entry("u", o={"$v": 2, "diff": diff}, o2={"_id": 5}))
    assert row[1] == "u" and row[3] is None
    assert json.loads(row[4]) == diff  # patch column
    assert json.loads(row[2]) == {"_id": 5}


def test_oplog_noop_and_command_skipped():
    assert decode_oplog_entry(_entry("n", o={"msg": "ping"})) is None
    assert decode_oplog_entry(
        _entry("c", ns="app.$cmd", o={"create": "events"})) is None


def test_oplog_ts_ms_from_bson_timestamp():
    row = decode_oplog_entry(_entry("i", o={"_id": 1}, sec=1700000000))
    assert row[5] == 1700000000 * 1000


def test_doc_to_json_wrapper_projection():
    s = doc_to_json({"id": ObjectId("5f1d3b4e9c6a4f2a8e000001"),
                     "at": UtcDatetime(5), "ts": BsonTimestamp(7, 2),
                     "blob": b"\x01"})
    assert json.loads(s) == {"id": "5f1d3b4e9c6a4f2a8e000001", "at": 5,
                             "ts": {"t": 7, "i": 2}, "blob": "AQ=="}


def test_oplog_spark_stage_with_quarantine(spark):
    schema = T.StructType([T.StructField("seq", T.LongType()),
                           T.StructField("data", T.BinaryType())])
    rows = [
        (1, bytearray(encode(_entry("i", o={"_id": 1, "x": "a"})))),
        (2, bytearray(encode(_entry("u", o={"_id": 1, "x": "b"},
                                    o2={"_id": 1})))),
        (3, bytearray(encode(_entry("n", o={"msg": "ping"})))),
        (4, bytearray(encode(_entry("d", o={"_id": 1})))),
        (5, bytearray(b"\x03\x00\x00")),  # corrupt
    ]
    out = {r["seq"]: r for r in decode_oplog_changelog(
        spark.createDataFrame(rows, schema)).collect()}
    assert len(out) == 4  # noop never reaches the envelope
    assert [out[s]["op"] for s in (1, 2, 4)] == ["c", "u", "d"]
    assert out[1]["destination"] == "app.events"
    assert out[4]["after"] is None
    assert out[5]["error"] and out[5]["op"] is None


def test_apply_ops_transaction_unfolds():
    from debezium_server_spark.sources.oplog_source import decode_oplog_rows

    txn = _entry("c", ns="admin.$cmd", sec=1234, o={"applyOps": [
        {"op": "i", "ns": "app.events", "o": {"_id": 1, "x": "a"}},
        {"op": "u", "ns": "app.other", "o": {"_id": 2, "x": "b"},
         "o2": {"_id": 2}},
        {"op": "d", "ns": "app.events", "o": {"_id": 3}},
    ]})
    rows = decode_oplog_rows(txn)
    assert [(r[0], r[1]) for r in rows] == [
        ("app.events", "c"), ("app.other", "u"), ("app.events", "d")]
    # nested ops carry no ts: all inherit the wrapper's commit second
    assert {r[5] for r in rows} == {1234 * 1000}
    # a non-applyOps command still never reaches the envelope
    assert decode_oplog_rows(
        _entry("c", ns="app.$cmd", o={"create": "events"})) == []


def test_apply_ops_through_spark_stage(spark):
    from debezium_server_spark.sources.oplog_source import (
        decode_oplog_changelog,
    )

    txn = _entry("c", ns="admin.$cmd", sec=99, o={"applyOps": [
        {"op": "i", "ns": "app.events", "o": {"_id": 1}},
        {"op": "i", "ns": "app.events", "o": {"_id": 2}},
    ]})
    schema = T.StructType([T.StructField("seq", T.LongType()),
                           T.StructField("data", T.BinaryType())])
    out = decode_oplog_changelog(spark.createDataFrame(
        [(7, bytearray(encode(txn)))], schema)).collect()
    assert [(r["seq"], r["row_idx"], r["op"]) for r in out] == [
        (7, 0, "c"), (7, 1, "c")]


# ------------------------------------------------ Decimal128 (0x13)


def test_decimal128_spec_goldens():
    """BID layout goldens derivable by hand from the public spec:
    biased exponent (bias 6176) in high bits 49-62, coefficient low
    113 bits, sign bit 63. '1' = exp 0 -> biased 0x1820 << 49 =
    high 0x3040000000000000, low 1."""
    import struct as _s

    from debezium_server_spark.functions.bson_codec import (
        Decimal128,
        _dec128_from_text,
        _dec128_to_text,
    )

    goldens = [
        ("1", 0x3040000000000000, 1),
        ("0", 0x3040000000000000, 0),
        ("-1", 0xB040000000000000, 1),
        ("0.1", 0x303E000000000000, 1),
        ("1.00", 0x303C000000000000, 100),
        ("NaN", 0x7C00000000000000, 0),
        ("Infinity", 0x7800000000000000, 0),
        ("-Infinity", 0xF800000000000000, 0),
    ]
    for text, high, low in goldens:
        raw = _s.pack("<QQ", low, high)
        assert _dec128_to_text(raw) == text, text
        assert _dec128_from_text(text) == raw, text
    # full-document round trip with the wrapper
    doc = {"price": Decimal128("19.99"), "q": Decimal128("-0.001")}
    assert decode(encode(doc)) == doc


def test_decimal128_rendering_rules():
    """The spec's notation switch: plain when exponent <= 0 and
    adjusted exponent >= -6, scientific otherwise; trailing zeros of
    the coefficient survive (1.00 != 1)."""
    from debezium_server_spark.functions.bson_codec import (
        _dec128_from_text,
        _dec128_to_text,
    )

    for text in ["0", "0.00", "1", "1.00", "-19.99", "0.000001",
                 "1E+3", "1.5E+6", "9.999999999999999999999999999999999E+6144",
                 "1E-6176", "123456789.123456789", "1.000000E-7"]:
        assert _dec128_to_text(_dec128_from_text(text)) == text, text
    # boundary: adjusted -6 stays plain, -7 goes scientific
    assert _dec128_to_text(_dec128_from_text("0.000001")) == "0.000001"
    assert _dec128_to_text(_dec128_from_text("1E-7")) == "1E-7"


def test_decimal128_rejects_out_of_range_and_noncanonical():
    import struct as _s

    import pytest as _pytest

    from debezium_server_spark.functions.bson_codec import (
        _dec128_from_text,
        _dec128_to_text,
    )

    with _pytest.raises(ValueError, match="34 digits"):
        _dec128_from_text("1" * 35)
    with _pytest.raises(ValueError, match="exponent"):
        _dec128_from_text("1E+6112")
    with _pytest.raises(ValueError, match="bad decimal128"):
        _dec128_from_text("abc")
    # '11' combination prefix (oversized-coefficient encoding) rejects
    with _pytest.raises(ValueError, match="non-canonical"):
        _dec128_to_text(_s.pack("<QQ", 0, 0x6000000000000000))
    # coefficient numerically > 10^34-1 in the normal form rejects
    with _pytest.raises(ValueError, match="non-canonical"):
        _dec128_to_text(_s.pack("<QQ", 0xFFFFFFFFFFFFFFFF,
                                0x3040000000000000
                                | ((10 ** 34 >> 64) + 1)))


def test_decimal128_oplog_extended_json(spark):
    """The envelope projects NumberDecimal as Extended JSON
    {'$numberDecimal': exact-text} — never a float."""
    import json as _json

    from debezium_server_spark.functions.bson_codec import Decimal128
    from debezium_server_spark.sources.oplog_source import (
        decode_oplog_changelog,
    )

    entry = {"ts": BsonTimestamp(1700000000, 1), "t": 1, "v": 2,
             "ns": "shop.orders", "op": "i",
             "o": {"_id": 7, "total": Decimal128("19.99")}}
    df = spark.createDataFrame(
        [(1, bytearray(encode(entry)))], "seq bigint, data binary")
    (row,) = decode_oplog_changelog(df).collect()
    assert _json.loads(row["after"]) == {
        "_id": 7, "total": {"$numberDecimal": "19.99"}}


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=150, deadline=None)
@_given(_st.integers(0, 10 ** 34 - 1), _st.integers(-6176, 6111),
        _st.booleans())
def test_decimal128_fuzz(coef, exp, neg):
    import struct as _s

    from debezium_server_spark.functions.bson_codec import (
        _dec128_from_text,
        _dec128_to_text,
    )

    high = ((1 << 63) if neg else 0) | ((exp + 6176) << 49) | (coef >> 64)
    raw = _s.pack("<QQ", coef & 0xFFFFFFFFFFFFFFFF, high)
    text = _dec128_to_text(raw)
    # bits -> text -> bits is the identity on canonical encodings,
    # EXCEPT the sign of zero-coefficient NEGATIVE values ("-0"
    # renders with its sign and round-trips) — verify directly
    assert _dec128_from_text(text) == raw

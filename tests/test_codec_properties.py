"""Property-based round-trip fuzzing for the Avro and protobuf codecs:
any value shaped like the schema must survive encode→decode bit-exactly
(no Spark session needed — pure Python)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_server_spark.functions import avro_codec, protobuf_codec

# strings over a few scripts incl. astral-plane emoji; no surrogates
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# doubles: finite only (NaN != NaN breaks equality; infinities round-trip
# fine but NaN comparison noise isn't worth it)
_f64 = st.floats(allow_nan=False, allow_infinity=True)


def _record(tags, attrs, nested_x, id_, name, score, ok):
    return {"id": id_, "name": name, "score": score, "ok": ok,
            "tags": tags, "attrs": attrs,
            "nested": {"x": nested_x} if nested_x is not None else None}


_values = st.builds(
    _record,
    st.lists(st.one_of(st.none(), _text), max_size=8),
    st.dictionaries(_text, st.one_of(st.none(), _i64), max_size=8),
    st.one_of(st.none(), _i64),
    st.one_of(st.none(), _i64),
    st.one_of(st.none(), _text),
    st.one_of(st.none(), _f64),
    st.one_of(st.none(), st.booleans()),
)

AVRO_SCHEMA = {
    "type": "record", "name": "Fuzz", "namespace": "t",
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

PROTO_SPEC = {
    "name": "Fuzz",
    "fields": [
        {"name": "id", "number": 1, "type": "int64"},
        {"name": "name", "number": 2, "type": "string"},
        {"name": "score", "number": 3, "type": "double"},
        {"name": "ok", "number": 4, "type": "bool"},
        {"name": "tags", "number": 5, "type": "string", "repeated": True},
        {"name": "attrs", "number": 6, "type": "map", "message": {
            "name": "E", "fields": [
                {"name": "key", "number": 1, "type": "string"},
                {"name": "value", "number": 2, "type": "int64"}]}},
        {"name": "nested", "number": 7, "type": "message", "message": {
            "name": "Sub", "fields": [
                {"name": "x", "number": 1, "type": "int64"}]}},
    ],
}


@settings(max_examples=200, deadline=None)
@given(_values)
def test_avro_round_trip_fuzz(v):
    assert avro_codec.decode(avro_codec.encode(v, AVRO_SCHEMA), AVRO_SCHEMA) == v


@settings(max_examples=200, deadline=None)
@given(_values, st.integers(min_value=0, max_value=2**31 - 1))
def test_avro_framed_round_trip_fuzz(v, schema_id):
    sid, out = avro_codec.decode(
        avro_codec.encode(v, AVRO_SCHEMA, schema_id), AVRO_SCHEMA, framed=True)
    assert sid == schema_id and out == v


@settings(max_examples=200, deadline=None)
@given(_values)
def test_protobuf_round_trip_fuzz(v):
    # proto3 presence: None and absent are the same thing; repeated
    # fields cannot carry None items and maps cannot carry None values —
    # normalize the expectation the way the wire does
    out = protobuf_codec.decode(protobuf_codec.encode(v, PROTO_SPEC), PROTO_SPEC)
    expected = {}
    for k, val in v.items():
        if val is None:
            continue
        if k == "tags":
            val = [t for t in val if t is not None]
            if not val:
                continue
        if k == "attrs":
            val = {a: b for a, b in val.items() if b is not None}
            if not val:
                continue
        if k == "nested" and val.get("x") is None:
            val = {}
        expected[k] = val
    assert out == expected


# ------------------------------------------------------------- pgoutput

from debezium_server_spark.functions import pgoutput_codec  # noqa: E402

# cstrings cannot carry NUL; pgoutput text values can carry anything
# utf-8 (length-prefixed)
_cstr = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"), max_size=30)
_tuple_col = st.one_of(
    st.tuples(st.just("n"), st.none()),
    st.tuples(st.just("u"), st.none()),
    st.tuples(st.just("t"), _text),
    st.tuples(st.just("b"), st.binary(max_size=40)),
)
_tuples = st.lists(_tuple_col, min_size=0, max_size=6)
_oid = st.integers(min_value=0, max_value=2**31 - 1)

_pg_msgs = st.one_of(
    st.builds(lambda l, t, x: {"type": "B", "final_lsn": l,
                               "commit_ts_us": t, "xid": x},
              _i64, _i64, _oid),
    st.builds(lambda f, c, e, t: {"type": "C", "flags": f, "commit_lsn": c,
                                  "end_lsn": e, "commit_ts_us": t},
              st.integers(0, 1), _i64, _i64, _i64),
    st.builds(lambda o, n: {"type": "O", "origin_lsn": o, "origin_name": n},
              _i64, _cstr),
    st.builds(lambda o, ns, n: {"type": "Y", "type_oid": o, "namespace": ns,
                                "type_name": n}, _oid, _cstr, _cstr),
    st.builds(lambda tr, l, p, c: {"type": "M", "transactional": tr,
                                   "lsn": l, "prefix": p, "content": c},
              st.booleans(), _i64, _cstr, st.binary(max_size=60)),
    st.builds(
        lambda o, ns, n, ri, cols: {
            "type": "R", "relation_oid": o, "namespace": ns,
            "relation_name": n, "replica_identity": ri,
            "columns": [{"key": k, "name": cn, "type_oid": co,
                         "type_mod": cm} for k, cn, co, cm in cols]},
        _oid, _cstr, _cstr, st.sampled_from("dnfi"),
        st.lists(st.tuples(st.booleans(), _cstr, _oid,
                           st.integers(-1, 2**31 - 1)), max_size=5)),
    st.builds(lambda o, t: {"type": "I", "relation_oid": o, "new_tuple": t},
              _oid, _tuples),
    st.builds(lambda o, t: {"type": "U", "relation_oid": o, "new_tuple": t},
              _oid, _tuples),
    st.builds(lambda o, tag, old, new: {"type": "U", "relation_oid": o,
                                        "old_tag": tag, "old_tuple": old,
                                        "new_tuple": new},
              _oid, st.sampled_from("KO"), _tuples, _tuples),
    st.builds(lambda o, tag, t: {"type": "D", "relation_oid": o,
                                 "old_tag": tag, "old_tuple": t},
              _oid, st.sampled_from("KO"), _tuples),
    st.builds(lambda opts, oids: {"type": "T", "options": opts,
                                  "relation_oids": oids},
              st.integers(0, 3), st.lists(_oid, max_size=5)),
)


@settings(max_examples=300, deadline=None)
@given(_pg_msgs)
def test_pgoutput_round_trip_fuzz(msg):
    assert pgoutput_codec.decode_message(
        pgoutput_codec.encode_message(msg)) == msg


# ---------------------------------------------------- binlog NEWDECIMAL

from debezium_server_spark.functions.binlog_codec import (  # noqa: E402
    decode_newdecimal,
    encode_newdecimal,
)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=30), st.data())
def test_newdecimal_round_trip_fuzz(precision, data):
    scale = data.draw(st.integers(min_value=0, max_value=precision - 1))
    int_digits = data.draw(st.integers(
        min_value=0, max_value=10 ** (precision - scale) - 1))
    frac_digits = data.draw(st.integers(
        min_value=0, max_value=(10 ** scale - 1) if scale else 0))
    neg = data.draw(st.booleans())
    s = str(int_digits)
    if scale:
        s += "." + str(frac_digits).rjust(scale, "0")
    if neg and (int_digits or frac_digits):
        s = "-" + s
    out, pos = decode_newdecimal(
        encode_newdecimal(s, precision, scale), 0, precision, scale)
    assert out == s and pos > 0

"""pgoutput wire codec: golden byte vectors hand-assembled from the
PUBLIC protocol spec (PostgreSQL "Logical Replication Message Formats",
protocol v1), python round-trips, a committed binary fixture with its
golden decode, and the Spark decode stage end-to-end.

The golden vectors pin the wire layout INDEPENDENTLY of the encoder
twin, so an encoder bug cannot hide behind a compensating decoder bug
(the avro/protobuf codec test discipline, test_protobuf_codec.py)."""

import json
import os
import struct

import pytest

from debezium_server_spark.functions.pgoutput_codec import (
    PG_EPOCH_OFFSET_US,
    decode_message,
    dict_to_tuple,
    encode_message,
    parse_text_value,
    pg_ts_to_unix_us,
    tuple_to_dict,
    unix_us_to_pg_ts,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "data")

REL = {
    "type": "R", "relation_oid": 16385, "namespace": "public",
    "relation_name": "accounts", "replica_identity": "d",
    "columns": [
        {"key": True, "name": "id", "type_oid": 20, "type_mod": -1},
        {"key": False, "name": "name", "type_oid": 25, "type_mod": -1},
        {"key": False, "name": "balance", "type_oid": 20, "type_mod": -1},
        {"key": False, "name": "active", "type_oid": 16, "type_mod": -1},
    ],
}


# ------------------------------------------------------- golden vectors


def test_golden_begin_bytes():
    # Spec: Byte1('B'), Int64 final LSN, Int64 commit ts (µs since
    # 2000-01-01), Int32 xid — all big-endian.
    msg = {"type": "B", "final_lsn": 0x01000028,
           "commit_ts_us": 1_000_000, "xid": 777}
    expect = (b"B" + struct.pack(">q", 0x01000028)
              + struct.pack(">q", 1_000_000) + struct.pack(">i", 777))
    assert encode_message(msg) == expect
    assert decode_message(expect) == msg


def test_golden_relation_bytes():
    # Byte1('R'), Int32 OID, cstr namespace, cstr name, Byte1 replica
    # identity, Int16 ncols, then per column Int8 flags, cstr name,
    # Int32 type OID, Int32 type modifier.
    msg = {"type": "R", "relation_oid": 16385, "namespace": "public",
           "relation_name": "t", "replica_identity": "d",
           "columns": [{"key": True, "name": "id", "type_oid": 20,
                        "type_mod": -1}]}
    expect = (b"R" + struct.pack(">i", 16385) + b"public\x00t\x00d"
              + struct.pack(">h", 1) + b"\x01" + b"id\x00"
              + struct.pack(">i", 20) + struct.pack(">i", -1))
    assert encode_message(msg) == expect
    assert decode_message(expect) == msg


def test_golden_insert_bytes():
    # Byte1('I'), Int32 OID, Byte1('N'), TupleData: Int16 ncols, then
    # 't' Int32 len + bytes for text columns, 'n' for SQL NULL.
    msg = {"type": "I", "relation_oid": 16385,
           "new_tuple": [("t", "42"), ("n", None)]}
    expect = (b"I" + struct.pack(">i", 16385) + b"N"
              + struct.pack(">h", 2)
              + b"t" + struct.pack(">i", 2) + b"42" + b"n")
    assert encode_message(msg) == expect
    assert decode_message(expect) == msg


def test_golden_delete_key_tuple_bytes():
    msg = {"type": "D", "relation_oid": 7, "old_tag": "K",
           "old_tuple": [("t", "1")]}
    expect = (b"D" + struct.pack(">i", 7) + b"K" + struct.pack(">h", 1)
              + b"t" + struct.pack(">i", 1) + b"1")
    assert encode_message(msg) == expect
    assert decode_message(expect) == msg


def test_golden_commit_bytes():
    msg = {"type": "C", "flags": 0, "commit_lsn": 5, "end_lsn": 9,
           "commit_ts_us": 123}
    expect = (b"C\x00" + struct.pack(">q", 5) + struct.pack(">q", 9)
              + struct.pack(">q", 123))
    assert encode_message(msg) == expect
    assert decode_message(expect) == msg


def test_golden_truncate_bytes():
    msg = {"type": "T", "options": 1, "relation_oids": [3, 4]}
    expect = (b"T" + struct.pack(">i", 2) + b"\x01"
              + struct.pack(">i", 3) + struct.pack(">i", 4))
    assert encode_message(msg) == expect
    assert decode_message(expect) == msg


# ---------------------------------------------------------- round trips


@pytest.mark.parametrize("msg", [
    {"type": "B", "final_lsn": 2**62, "commit_ts_us": -5, "xid": 1},
    {"type": "C", "flags": 0, "commit_lsn": 0, "end_lsn": 2**40,
     "commit_ts_us": PG_EPOCH_OFFSET_US},
    {"type": "O", "origin_lsn": 77, "origin_name": "région-1"},
    {"type": "Y", "type_oid": 3802, "namespace": "pg_catalog",
     "type_name": "jsonb"},
    {"type": "M", "transactional": True, "lsn": 9, "prefix": "wal2json",
     "content": b"\x00\x01\xffpayload"},
    REL,
    {"type": "I", "relation_oid": 16385,
     "new_tuple": [("t", "1"), ("t", "héllo✓"), ("n", None), ("t", "t")]},
    {"type": "U", "relation_oid": 16385,
     "new_tuple": [("t", "1"), ("t", "x"), ("u", None), ("t", "f")]},
    {"type": "U", "relation_oid": 16385, "old_tag": "O",
     "old_tuple": [("t", "1"), ("t", "old"), ("t", "5"), ("t", "t")],
     "new_tuple": [("t", "2"), ("t", "new"), ("b", b"\x01\x02"), ("n", None)]},
    {"type": "D", "relation_oid": 16385, "old_tag": "K",
     "old_tuple": [("t", "1"), ("n", None), ("n", None), ("n", None)]},
    {"type": "T", "options": 3, "relation_oids": [16385]},
])
def test_round_trip(msg):
    assert decode_message(encode_message(msg)) == msg


def test_trailing_garbage_rejected():
    raw = encode_message({"type": "B", "final_lsn": 1, "commit_ts_us": 2,
                          "xid": 3})
    with pytest.raises(ValueError, match="trailing"):
        decode_message(raw + b"\x00")


def test_truncated_rejected():
    raw = encode_message(REL)
    with pytest.raises((EOFError, ValueError)):
        decode_message(raw[:-3])


def test_unknown_type_rejected():
    with pytest.raises(ValueError, match="unknown"):
        decode_message(b"Z\x00\x00")


# -------------------------------------------------- typed projection


def test_tuple_to_dict_types_and_tags():
    tup = [("t", "42"), ("t", "ann"), ("n", None), ("t", "t")]
    assert tuple_to_dict(REL, tup) == {
        "id": 42, "name": "ann", "balance": None, "active": True}
    # unchanged TOAST keeps the marker, not None
    tup_u = [("t", "1"), ("u", None), ("t", "7"), ("t", "f")]
    out = tuple_to_dict(REL, tup_u, unchanged_marker="__TOAST__")
    assert out["name"] == "__TOAST__" and out["active"] is False


def test_tuple_arity_mismatch_rejected():
    with pytest.raises(ValueError, match="arity"):
        tuple_to_dict(REL, [("t", "1")])


def test_dict_to_tuple_key_only_matches_replica_identity_default():
    # Replica-identity-default 'K' old tuples carry ONLY key columns;
    # everything else must be wire NULL. Pins the delete before-image
    # completeness policy the oracle cannot see.
    tup = dict_to_tuple(REL, {"id": 9, "name": "x", "balance": 3,
                              "active": True}, key_only=True)
    assert tup == [("t", "9"), ("n", None), ("n", None), ("n", None)]


def test_bool_and_numeric_text_forms():
    assert parse_text_value(16, "t") is True
    assert parse_text_value(16, "f") is False
    assert parse_text_value(701, "2.5") == 2.5
    assert parse_text_value(1700, "12345678901234567890.123") == \
        "12345678901234567890.123"  # numeric stays exact text
    assert dict_to_tuple(REL, {"id": 1, "active": False})[3] == ("t", "f")


def test_pg_epoch_conversion():
    assert pg_ts_to_unix_us(0) == 946_684_800 * 1_000_000
    assert unix_us_to_pg_ts(pg_ts_to_unix_us(123456)) == 123456


# ----------------------------------------------- committed fixture file


def test_committed_fixture_decodes_to_golden():
    """tests/data/pgoutput_stream.bin (length-prefixed messages written
    by the encoder twin, committed) must decode to the committed golden
    JSON — a regression pin on BOTH directions."""
    with open(os.path.join(FIXTURE_DIR, "pgoutput_stream.bin"), "rb") as f:
        blob = f.read()
    msgs, pos = [], 0
    while pos < len(blob):
        (n,) = struct.unpack(">i", blob[pos:pos + 4])
        msgs.append(decode_message(blob[pos + 4:pos + 4 + n]))
        pos += 4 + n
    with open(os.path.join(FIXTURE_DIR, "pgoutput_stream.golden.json")) as f:
        golden = json.load(f)
    # JSON has no bytes/tuples: normalize content → list of ints and
    # TupleData columns → lists before comparing
    for m in msgs:
        if isinstance(m.get("content"), bytes):
            m["content"] = list(m["content"])
        for k in ("old_tuple", "new_tuple"):
            if k in m:
                m[k] = [list(c) for c in m[k]]
    assert msgs == golden

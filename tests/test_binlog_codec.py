"""MySQL binlog codec + Spark decode stage: golden bytes hand-packed
from the public format docs, round-trips over every event type, file
splitting, and the envelope stage with op pins, multi-row fan-out,
full-image updates, and quarantine."""

import json
import struct

import pytest
from pyspark.sql import types as T

from debezium_server_spark.functions.binlog_codec import (
    MAGIC,
    T_BLOB,
    T_DOUBLE,
    T_LONG,
    T_LONGLONG,
    T_TINY,
    T_VARCHAR,
    decode_event,
    encode_event,
    split_events,
)
from debezium_server_spark.sources.binlog_source import (
    decode_binlog_changelog,
    load_table_registry,
)

COLS = [
    {"type": T_LONGLONG, "nullable": False},
    {"type": T_VARCHAR, "meta": 64, "nullable": True},
    {"type": T_LONG, "nullable": True},
]
TMAP = {"type": "table_map", "table_id": 7, "schema": "app",
        "table": "accounts", "columns": COLS, "timestamp": 100,
        "log_pos": 400}


# ------------------------------------------------------- golden vectors


def test_golden_xid_event_bytes():
    # header: ts(4) type(1)=0x10 server_id(4) size(4)=27 log_pos(4)
    # flags(2), body: xid as 8-byte LE
    ev = {"type": "xid", "xid": 777, "timestamp": 100, "log_pos": 500,
          "server_id": 1}
    expect = struct.pack("<IBIIIH", 100, 0x10, 1, 27, 500, 0) \
        + struct.pack("<Q", 777)
    assert encode_event(ev) == expect
    out = decode_event(expect)
    assert out["type"] == "xid" and out["xid"] == 777
    assert out["timestamp"] == 100 and out["log_pos"] == 500


def test_golden_write_rows_layout():
    # one row (42, "ok", NULL): post-header table_id(6)+flags(2)+
    # extra_len(2)=2, lenenc ncols=3, present bitmap 0b111, row null
    # bitmap 0b100, then 42 as 8B LE and "ok" as len-prefixed
    ev = {"type": "write_rows", "table_id": 7, "columns": COLS,
          "rows": [[42, "ok", None]], "timestamp": 1, "log_pos": 2}
    raw = encode_event(ev)
    body = raw[19:]
    assert body[:6] == (7).to_bytes(6, "little")
    assert struct.unpack("<H", body[8:10])[0] == 2  # empty v2 extra
    assert body[10] == 3 and body[11] == 0b111
    assert body[12] == 0b100  # third column NULL
    assert body[13:21] == struct.pack("<q", 42)
    assert body[21:24] == b"\x02ok"
    out = decode_event(raw, columns_of=lambda tid: COLS)
    assert out["rows"] == [[42, "ok", None]]


# ---------------------------------------------------------- round trips


@pytest.mark.parametrize("ev", [
    {"type": "format_description", "timestamp": 5, "log_pos": 0,
     "server_version": "8.0.0-spark"},
    {"type": "query", "schema": "app", "query": "BEGIN",
     "timestamp": 9, "log_pos": 10},
    {"type": "xid", "xid": 2**63 - 1, "timestamp": 9, "log_pos": 10},
    TMAP,
])
def test_round_trip_control_events(ev):
    out = decode_event(encode_event(ev))
    for k, v in ev.items():
        if k == "columns":
            assert [(c["type"], c.get("meta", 0)) for c in out[k]] == \
                [(c["type"], c.get("meta", 0)) for c in v]
        else:
            assert out[k] == v


def test_round_trip_rows_all_types():
    cols = [{"type": T_TINY}, {"type": T_LONG}, {"type": T_LONGLONG},
            {"type": T_DOUBLE}, {"type": T_VARCHAR, "meta": 300},
            {"type": T_BLOB, "meta": 2}]
    rows = [[-5, -(2**31), 2**62, 2.5, "x" * 300, b"\x00\xff"],
            [None, None, None, None, None, None],
            [1, 2, 3, -0.5, "héllo✓", b""]]
    ev = {"type": "write_rows", "table_id": 9, "columns": cols,
          "rows": rows, "timestamp": 0, "log_pos": 0}
    out = decode_event(encode_event(ev), columns_of=lambda tid: cols)
    assert out["rows"] == rows


def test_round_trip_update_rows_pairs():
    rows = [([1, "a", 5], [1, "b", 6]), ([2, None, None], [2, "z", 9])]
    ev = {"type": "update_rows", "table_id": 7, "columns": COLS,
          "rows": rows, "timestamp": 0, "log_pos": 0}
    out = decode_event(encode_event(ev), columns_of=lambda tid: COLS)
    assert out["rows"] == [(list(a), list(b)) for a, b in rows]


def test_split_events_walks_headers():
    evs = [encode_event({"type": "format_description", "timestamp": 1,
                         "log_pos": 0}),
           encode_event(TMAP),
           encode_event({"type": "xid", "xid": 1, "timestamp": 2,
                         "log_pos": 3})]
    stream = MAGIC + b"".join(evs)
    assert split_events(stream) == evs
    with pytest.raises(ValueError, match="magic"):
        split_events(b"nope" + evs[0])
    with pytest.raises(EOFError):
        split_events(stream[:-4])


def test_size_lie_rejected():
    raw = bytearray(encode_event({"type": "xid", "xid": 1,
                                  "timestamp": 0, "log_pos": 0}))
    raw[9] += 1  # inflate declared event_size
    with pytest.raises(ValueError, match="size"):
        decode_event(bytes(raw))


# ----------------------------------------------------------- Spark stage


NAMES = {"app.accounts": ["id", "name", "balance"]}


def _wal(spark, rows):
    schema = T.StructType([T.StructField("seq", T.LongType()),
                           T.StructField("data", T.BinaryType())])
    return spark.createDataFrame(
        [(s, bytearray(encode_event(e) if isinstance(e, dict) else e))
         for s, e in rows], schema)


def test_binlog_stage_ops_fanout_and_quarantine(spark):
    rows = [
        (1, TMAP),
        (2, {"type": "query", "schema": "app", "query": "BEGIN",
             "timestamp": 100, "log_pos": 410}),
        # one WRITE event carrying TWO rows → two envelope rows
        (3, {"type": "write_rows", "table_id": 7, "columns": COLS,
             "rows": [[1, "ann", 250], [2, "bob", None]],
             "timestamp": 100, "log_pos": 420}),
        (4, {"type": "update_rows", "table_id": 7, "columns": COLS,
             "rows": [([1, "ann", 250], [1, "ann", 175])],
             "timestamp": 101, "log_pos": 430}),
        (5, {"type": "delete_rows", "table_id": 7, "columns": COLS,
             "rows": [[2, "bob", None]], "timestamp": 102,
             "log_pos": 440}),
        (6, {"type": "xid", "xid": 501, "timestamp": 102,
             "log_pos": 450}),
        # corrupt ROWS event (write_rows type byte, junk body)
        (7, struct.pack("<IBIIIH", 0, 0x1E, 1, 22, 0, 0) + b"\x00" * 3),
    ]
    out = decode_binlog_changelog(_wal(spark, rows), NAMES).collect()
    by = {(r["seq"], r["row_idx"]): r for r in out}
    # control events never reach the envelope; 4 data rows + 1 error
    assert len(out) == 5
    assert by[(3, 0)]["op"] == "c" and by[(3, 1)]["op"] == "c"
    assert json.loads(by[(3, 1)]["after"]) == \
        {"id": 2, "name": "bob", "balance": None}
    # update carries FULL before and after images (binlog_row_image)
    u = by[(4, 0)]
    assert u["op"] == "u"
    assert json.loads(u["before"])["balance"] == 250
    assert json.loads(u["after"])["balance"] == 175
    d = by[(5, 0)]
    assert d["op"] == "d" and d["after"] is None
    assert json.loads(d["before"]) == {"id": 2, "name": "bob",
                                       "balance": None}
    assert by[(3, 0)]["ts_ms"] == 100_000 and d["ts_ms"] == 102_000
    assert by[(7, 0)]["error"] and by[(7, 0)]["op"] is None


def test_binlog_registry_latest_wins(spark):
    tmap2 = dict(TMAP, columns=COLS + [{"type": T_LONG}], log_pos=900)
    reg = load_table_registry(_wal(spark, [(1, TMAP), (9, tmap2)]))
    assert len(reg[7]["columns"]) == 4


def test_crc32_checksummed_frames_round_trip_and_verify():
    import struct as _s
    import zlib

    ev = {"type": "xid", "xid": 777, "timestamp": 100, "log_pos": 500}
    framed = encode_event(ev, checksum=True)
    bare = encode_event(ev)
    # event_size includes the 4-byte footer; footer is CRC32 of the
    # rest of the frame (header+body) — the documented CRC32 mode
    assert len(framed) == len(bare) + 4
    assert _s.unpack("<I", framed[9:13])[0] == len(framed)
    assert _s.unpack("<I", framed[-4:])[0] == \
        zlib.crc32(framed[:-4]) & 0xFFFFFFFF
    out = decode_event(framed, checksum=True)
    assert out["xid"] == 777 and out["log_pos"] == 500

    corrupted = framed[:-1] + bytes([framed[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        decode_event(corrupted, checksum=True)
    # a flipped BODY byte is also caught (not just a damaged footer)
    body_bad = bytearray(framed)
    body_bad[20] ^= 0x01
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        decode_event(bytes(body_bad), checksum=True)


def test_crc32_rows_event_decodes_after_strip():
    ev = {"type": "write_rows", "table_id": 7, "columns": COLS,
          "rows": [[1, "a", 2]], "timestamp": 0, "log_pos": 0}
    framed = encode_event(ev, checksum=True)
    out = decode_event(framed, columns_of=lambda tid: COLS,
                       checksum=True)
    assert out["rows"] == [[1, "a", 2]]


# ----------------------------------- NEWDECIMAL / temporal2 type matrix

from debezium_server_spark.functions.binlog_codec import (  # noqa: E402
    T_DATE,
    T_DATETIME2,
    T_NEWDECIMAL,
    T_TIME2,
    T_TIMESTAMP2,
    decode_newdecimal,
    encode_newdecimal,
)


def test_newdecimal_golden_vector():
    # the canonical packed-decimal example: DECIMAL(14,4) of
    # 1234567890.1234 → 0x81 0D FB 38 D2 04 D2 (leading 1-digit group
    # "1" in one byte, 9-digit group 234567890 in four, fraction 1234
    # in two; sign bit set on the first byte)
    raw = encode_newdecimal("1234567890.1234", 14, 4)
    assert raw == bytes.fromhex("810dfb38d204d2")
    val, pos = decode_newdecimal(raw, 0, 14, 4)
    assert val == "1234567890.1234" and pos == len(raw)
    # negative: bitwise complement of the positive image
    neg = encode_newdecimal("-1234567890.1234", 14, 4)
    assert neg == bytes(b ^ 0xFF for b in raw)
    assert decode_newdecimal(neg, 0, 14, 4)[0] == "-1234567890.1234"


@pytest.mark.parametrize("v,prec,scale", [
    ("0", 10, 0), ("0.00", 10, 2), ("1", 1, 0), ("-9", 1, 0),
    ("999999999999999999", 18, 0), ("-0.000001", 20, 6),
    ("123.45", 5, 2), ("-99999.9999", 9, 4),
    ("12345678901234567890.123456789", 29, 9),
])
def test_newdecimal_round_trip(v, prec, scale):
    out, _ = decode_newdecimal(encode_newdecimal(v, prec, scale), 0,
                               prec, scale)
    canon = v.lstrip("-").lstrip("0") or "0"
    if canon.startswith("."):
        canon = "0" + canon
    sign = "-" if v.startswith("-") and canon.strip("0.") else ""
    # encoder pads the fraction to `scale`; mirror that
    if scale:
        ip, _, fr = canon.partition(".")
        canon = ip + "." + (fr + "0" * scale)[:scale]
    assert out == sign + canon


def test_newdecimal_overflow_rejected():
    with pytest.raises(ValueError, match="overflow"):
        encode_newdecimal("1000", 5, 2)  # 3 int digits max


def test_temporal2_golden_datetime_layout():
    # DATETIME2 packs 1-bit sign | 17-bit year*13+month | 5-bit day |
    # 5-bit hour | 6-bit minute | 6-bit second, big-endian, then
    # ceil(fsp/2) fraction bytes
    col = {"type": T_DATETIME2, "meta": 6}
    raw = _enc({"type": T_DATETIME2, "meta": 6}, "2024-02-29 23:59:58.123456")
    packed = int.from_bytes(raw[:5], "big")
    assert packed >> 39 == 1
    assert (packed >> 22) & 0x1FFFF == 2024 * 13 + 2
    assert (packed >> 17) & 0x1F == 29
    assert (packed >> 12) & 0x1F == 23
    assert (packed >> 6) & 0x3F == 59
    assert packed & 0x3F == 58
    assert int.from_bytes(raw[5:], "big") == 123456
    assert _dec(col, raw) == "2024-02-29 23:59:58.123456"


def _enc(col, v):
    from debezium_server_spark.functions.binlog_codec import _enc_value
    return _enc_value(col, v)


def _dec(col, raw):
    from debezium_server_spark.functions.binlog_codec import _dec_value
    v, pos = _dec_value(col, raw, 0)
    assert pos == len(raw)
    return v


@pytest.mark.parametrize("col,v", [
    ({"type": T_DATE}, "2024-12-31"),
    ({"type": T_DATE}, "1970-01-01"),
    ({"type": T_DATETIME2, "meta": 0}, "1999-01-02 03:04:05"),
    ({"type": T_DATETIME2, "meta": 3}, "2031-11-30 00:00:00.999"),
    ({"type": T_TIMESTAMP2, "meta": 0}, 1700000000_000000),
    ({"type": T_TIMESTAMP2, "meta": 6}, 1700000000_123456),
    ({"type": T_TIME2, "meta": 0}, "838:59:59"),
    ({"type": T_TIME2, "meta": 2}, "00:00:01.25"),
])
def test_temporal_round_trips(col, v):
    assert _dec(col, _enc(col, v)) == v


def test_decimal_temporal_rows_event_round_trip():
    cols = [
        {"type": T_NEWDECIMAL, "meta": (14, 4), "nullable": True},
        {"type": T_DATE, "nullable": True},
        {"type": T_DATETIME2, "meta": 6, "nullable": True},
        {"type": T_TIMESTAMP2, "meta": 3, "nullable": True},
        {"type": T_TIME2, "meta": 0, "nullable": True},
    ]
    rows = [
        ["-999999.0001", "2024-02-29", "2024-02-29 12:00:00.000001",
         1700000000_123000, "13:45:09"],
        [None, None, None, None, None],
    ]
    ev = {"type": "write_rows", "table_id": 3, "columns": cols,
          "rows": rows, "timestamp": 0, "log_pos": 0}
    out = decode_event(encode_event(ev), columns_of=lambda tid: cols)
    assert out["rows"] == rows


def test_decimal_temporal_metadata_survives_table_map():
    cols = [
        {"type": T_NEWDECIMAL, "meta": (29, 9), "nullable": True},
        {"type": T_DATETIME2, "meta": 3, "nullable": False},
        {"type": T_TIME2, "meta": 4, "nullable": True},
    ]
    tmap = {"type": "table_map", "table_id": 11, "schema": "s",
            "table": "t", "columns": cols, "timestamp": 0, "log_pos": 0}
    out = decode_event(encode_event(tmap))
    assert [(c["type"], c["meta"]) for c in out["columns"]] == \
        [(T_NEWDECIMAL, (29, 9)), (T_DATETIME2, 3), (T_TIME2, 4)]


def test_gtid_event_round_trip():
    ev = {"type": "gtid", "commit_flag": 1,
          "sid": "3e11fa47-71ca-11e1-9e33-c80aa9429562", "gno": 23,
          "timestamp": 5, "log_pos": 60}
    raw = encode_event(ev)
    # body: 1 flag byte + 16 SID bytes + 8-byte LE GNO
    assert len(raw) == 19 + 25
    out = decode_event(raw)
    for k, v in ev.items():
        assert out[k] == v
    with pytest.raises(ValueError, match="16-byte"):
        encode_event(dict(ev, sid="deadbeef"))


def test_minimal_row_images_round_trip_and_stage(spark):
    """binlog_row_image=MINIMAL: updates carry PK-only before images
    and PK+changed after images via the columns-present bitmaps; the
    stage maps values to the present-column names."""
    # update: before = [id], after = [id, balance]
    ev = {"type": "update_rows", "table_id": 7, "columns": COLS,
          "present": [True, False, False],
          "present_after": [True, False, True],
          "rows": [([1], [1, 175])], "timestamp": 50, "log_pos": 9}
    out = decode_event(encode_event(ev), columns_of=lambda tid: COLS)
    assert out["present"] == [True, False, False]
    assert out["present_after"] == [True, False, True]
    assert out["rows"] == [([1], [1, 175])]

    # delete with a key-only image
    dele = {"type": "delete_rows", "table_id": 7, "columns": COLS,
            "present": [True, False, False], "rows": [[2]],
            "timestamp": 51, "log_pos": 10}
    assert decode_event(encode_event(dele),
                        columns_of=lambda tid: COLS)["rows"] == [[2]]

    rows = decode_binlog_changelog(
        _wal(spark, [(1, TMAP), (2, ev), (3, dele)]), NAMES).collect()
    by = {r["seq"]: r for r in rows}
    assert json.loads(by[2]["before"]) == {"id": 1}
    assert json.loads(by[2]["after"]) == {"id": 1, "balance": 175}
    assert json.loads(by[3]["before"]) == {"id": 2}
    assert by[3]["after"] is None


def test_names_length_mismatch_quarantines(spark):
    """Round-5 self-review finding: a names list shorter/longer than
    the TABLE_MAP arity must quarantine, never silently truncate into
    well-formed-but-wrong JSON images."""
    rows = [
        (1, TMAP),
        (2, {"type": "write_rows", "table_id": 7, "columns": COLS,
             "rows": [[1, "a", 2]], "timestamp": 0, "log_pos": 2}),
    ]
    out = decode_binlog_changelog(
        _wal(spark, rows), {"app.accounts": ["id", "name"]}).collect()
    assert len(out) == 1
    assert out[0]["error"] and "names" in out[0]["error"]


def test_checksummed_capture_decodes_with_checksum_flag(spark):
    """binlog_checksum=CRC32 captures: with checksum=True the stage
    verifies+strips footers; without it the short-read guards make
    trailing CRC bytes an error (quarantine), never a phantom row
    with fabricated values."""
    ev_rows = {"type": "write_rows", "table_id": 7, "columns": COLS,
               "rows": [[1, "ann", 250]], "timestamp": 3, "log_pos": 2}
    rows = [(1, encode_event(TMAP, checksum=True)),
            (2, encode_event(ev_rows, checksum=True))]
    from debezium_server_spark.sources.binlog_source import (
        load_table_registry,
    )

    wal = _wal(spark, rows)
    reg = load_table_registry(wal, checksum=True)
    ok = decode_binlog_changelog(wal, NAMES, registry=reg,
                                 checksum=True).collect()
    assert len(ok) == 1 and json.loads(ok[0]["after"])["balance"] == 250

    # same capture WITHOUT the flag: the rows event must not produce a
    # phantom data row with error=NULL
    bad = decode_binlog_changelog(wal, NAMES, registry=reg,
                                  checksum=False).collect()
    phantom = [r for r in bad if r["error"] is None
               and json.loads(r["after"] or "{}").get("balance") != 250]
    assert not phantom


def test_enum_set_round_trip_and_table_map_meta():
    from debezium_server_spark.functions.binlog_codec import T_ENUM, T_SET

    cols = [{"type": T_ENUM, "meta": 1, "nullable": True},
            {"type": T_ENUM, "meta": 2, "nullable": True},
            {"type": T_SET, "meta": 3, "nullable": True}]
    rows = [[3, 300, 0b101000000000000000001], [None, None, None]]
    ev = {"type": "write_rows", "table_id": 4, "columns": cols,
          "rows": rows, "timestamp": 0, "log_pos": 0}
    out = decode_event(encode_event(ev), columns_of=lambda tid: cols)
    assert out["rows"] == rows

    tmap = {"type": "table_map", "table_id": 4, "schema": "s",
            "table": "t", "columns": cols, "timestamp": 0, "log_pos": 0}
    got = decode_event(encode_event(tmap))["columns"]
    assert [(c["type"], c["meta"]) for c in got] == \
        [(T_ENUM, 1), (T_ENUM, 2), (T_SET, 3)]


# --------------------------------------- transaction payload (0x28)


def _tx_events():
    return [
        TMAP,
        {"type": "write_rows", "table_id": 7, "columns": COLS,
         "rows": [[10, "zed", 5]], "timestamp": 300, "log_pos": 20},
        {"type": "xid", "xid": 900, "timestamp": 300, "log_pos": 30},
    ]


def test_golden_transaction_payload_none_layout():
    """Hand-packed TLV header for compression=NONE: each field is
    type(lenenc) len(lenenc) value(lenenc int); 0 ends the header and
    the raw payload bytes follow. NONE = 255 (a 3-byte lenenc)."""
    from debezium_server_spark.functions.binlog_codec import (
        TRANSACTION_PAYLOAD_EVENT,
        encode_event,
    )

    inner = encode_event({"type": "xid", "xid": 1, "timestamp": 5,
                          "log_pos": 6})
    ev = {"type": "transaction_payload", "compression": "none",
          "events": [{"type": "xid", "xid": 1, "timestamp": 5,
                      "log_pos": 6}],
          "timestamp": 5, "log_pos": 9}
    got = encode_event(ev)
    # TLV: type 2 (compression), len 3, value fc ff 00 (lenenc 255);
    # type 1 (payload size), len 1, value len(inner); end mark 0
    header = (bytes([2, 3, 0xFC, 0xFF, 0x00])
              + bytes([1, 1, len(inner)]) + bytes([0]))
    body = header + inner
    expect = struct.pack("<IBIIIH", 5, TRANSACTION_PAYLOAD_EVENT, 1,
                         19 + len(body), 9, 0) + body
    assert got == expect
    out = decode_event(got)
    assert out["type"] == "transaction_payload"
    assert out["compression"] == "none"
    assert [e["type"] for e in out["events"]] == ["xid"]
    assert out["events"][0]["xid"] == 1


def test_transaction_payload_zstd_round_trip_self_contained():
    """A zstd payload decodes without any OUTER registry: the inner
    TABLE_MAP resolves the inner ROWS event (MySQL encapsulates the
    whole transaction, so compressed transactions are self-contained)."""
    ev = {"type": "transaction_payload", "compression": "zstd",
          "events": _tx_events(), "timestamp": 300, "log_pos": 99}
    raw = encode_event(ev)
    out = decode_event(raw)  # note: no columns_of
    assert out["compression"] == "zstd"
    kinds = [e["type"] for e in out["events"]]
    assert kinds == ["table_map", "write_rows", "xid"]
    assert out["events"][1]["rows"] == [[10, "zed", 5]]
    # encoder twin: re-encode reproduces the byte stream exactly
    assert encode_event(out) == raw


def test_transaction_payload_checksummed_outer_frame():
    """binlog_checksum=CRC32 servers checksum the OUTER payload frame
    only; inner events are checksum-free."""
    ev = {"type": "transaction_payload", "compression": "zstd",
          "events": _tx_events(), "timestamp": 300, "log_pos": 99}
    raw = encode_event(ev, checksum=True)
    out = decode_event(raw, checksum=True)
    assert out["events"][1]["rows"] == [[10, "zed", 5]]
    with pytest.raises(ValueError, match="CRC32"):
        decode_event(raw[:-1] + bytes([raw[-1] ^ 1]), checksum=True)


def test_transaction_payload_truncated_and_bad_fields_raise():
    ev = {"type": "transaction_payload", "compression": "zstd",
          "events": _tx_events(), "timestamp": 300, "log_pos": 99}
    raw = bytearray(encode_event(ev))
    # truncate the payload but fix the frame size so only the
    # payload-size contract can catch it
    cut = raw[:-10]
    struct.pack_into("<I", cut, 9, len(cut))
    with pytest.raises(EOFError, match="truncated transaction payload"):
        decode_event(bytes(cut))


def test_transaction_payload_through_spark_stage(spark):
    """The envelope stage flattens a compressed transaction: inner
    TABLE_MAP never touches the bounded registry collect, row_idx
    numbers the payload's row images consecutively."""
    payload = {"type": "transaction_payload", "compression": "zstd",
               "events": [
                   TMAP,
                   {"type": "write_rows", "table_id": 7,
                    "columns": COLS,
                    "rows": [[1, "ann", 250], [2, "bob", None]],
                    "timestamp": 400, "log_pos": 20},
                   {"type": "delete_rows", "table_id": 7,
                    "columns": COLS, "rows": [[1, "ann", 250]],
                    "timestamp": 401, "log_pos": 30},
                   {"type": "xid", "xid": 77, "timestamp": 401,
                    "log_pos": 40},
               ], "timestamp": 401, "log_pos": 50}
    out = decode_binlog_changelog(_wal(spark, [(1, payload)]),
                                  NAMES).collect()
    assert [(r["seq"], r["row_idx"], r["op"]) for r in
            sorted(out, key=lambda r: r["row_idx"])] == \
        [(1, 0, "c"), (1, 1, "c"), (1, 2, "d")]
    assert all(r["error"] is None for r in out)
    two = [r for r in out if r["row_idx"] == 1][0]
    assert json.loads(two["after"]) == {"id": 2, "name": "bob",
                                        "balance": None}
    assert two["ts_ms"] == 400_000  # inner event's own timestamp


# ------------------------------------------------- GEOMETRY (type 255)


def test_geometry_cell_round_trip_and_envelope_json(spark):
    """GEOMETRY cells: 4-byte LE SRID + WKB, length-prefixed like
    BLOB. Decodes to GeoValue; the envelope projects {srid, wkb-b64};
    wkb_point_xy reads the WKB side downstream."""
    import base64

    from debezium_server_spark.functions.binlog_codec import (
        GeoValue,
        T_GEOMETRY,
    )

    # WKB: little-endian (01) POINT (01000000) x=1.5 y=-2.0
    wkb = (b"\x01" + struct.pack("<I", 1)
           + struct.pack("<dd", 1.5, -2.0))
    geo = GeoValue(4326, wkb)
    cols = [{"type": T_LONGLONG, "nullable": False},
            {"type": T_GEOMETRY, "meta": 4, "nullable": True}]
    tmap = {"type": "table_map", "table_id": 9, "schema": "app",
            "table": "places", "columns": cols, "timestamp": 1,
            "log_pos": 2}
    ev = {"type": "write_rows", "table_id": 9, "columns": cols,
          "rows": [[5, geo], [6, None]], "timestamp": 2, "log_pos": 3}
    raw = encode_event(ev)
    out = decode_event(raw, columns_of=lambda tid: cols)
    assert out["rows"][0][1] == geo and out["rows"][1][1] is None
    # tmap meta survives
    t2 = decode_event(encode_event(tmap))
    assert t2["columns"][1]["type"] == T_GEOMETRY
    assert t2["columns"][1]["meta"] == 4
    rows = decode_binlog_changelog(
        _wal(spark, [(1, tmap), (2, ev)]),
        {"app.places": ["id", "loc"]}).collect()
    got = json.loads([r for r in rows if r["row_idx"] == 0][0]["after"])
    assert got == {"id": 5,
                   "loc": {"srid": 4326,
                           "wkb": base64.b64encode(wkb).decode()}}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2 ** 63), 2 ** 63 - 1),
            st.text(max_size=20),
            st.one_of(st.none(),
                      st.integers(-(2 ** 31), 2 ** 31 - 1))),
        min_size=1, max_size=5),
    st.sampled_from(["zstd", "none"]))
def test_transaction_payload_fuzz(rows, comp):
    """Arbitrary transactions survive the payload round trip in both
    compression modes, and the decoded dict re-encodes byte-exact."""
    evs = [
        TMAP,
        {"type": "write_rows", "table_id": 7, "columns": COLS,
         "rows": [list(r) for r in rows], "timestamp": 9,
         "log_pos": 1},
        {"type": "xid", "xid": 3, "timestamp": 9, "log_pos": 2},
    ]
    ev = {"type": "transaction_payload", "compression": comp,
          "events": evs, "timestamp": 9, "log_pos": 5}
    raw = encode_event(ev)
    out = decode_event(raw)
    assert out["events"][1]["rows"] == [list(r) for r in rows]
    assert encode_event(out) == raw


def test_transaction_payload_rejects_gigantic_size_claim():
    """A 100-byte frame claiming multi-GiB uncompressed size is
    corrupt (the server caps events at 1 GiB) — reject before
    allocating."""
    from debezium_server_spark.functions.binlog_codec import (
        TRANSACTION_PAYLOAD_EVENT,
        _lenenc,
    )

    def tlv(t, v):
        enc = _lenenc(v)
        return _lenenc(t) + _lenenc(len(enc)) + enc

    body = (tlv(2, 0)  # compression = ZSTD
            + tlv(3, 1 << 40)  # absurd uncompressed size
            + tlv(1, 4) + bytes([0]) + b"\x00\x00\x00\x00")
    frame = struct.pack("<IBIIIH", 0, TRANSACTION_PAYLOAD_EVENT, 1,
                        19 + len(body), 0, 0) + body
    with pytest.raises(ValueError, match="1 GiB"):
        decode_event(frame)


# ------------------------- real-server column types: STRING/BIT/YEAR


def test_string_char_packed_metadata_and_cells():
    """MYSQL_TYPE_STRING (CHAR(n)): TABLE_MAP metadata is
    Field_string's packed 2-byte form — byte0 = real_type ^
    ((maxlen & 0x300) >> 4), byte1 = maxlen & 0xff — and the cell is
    length-prefixed (2-byte prefix past maxlen 255)."""
    from debezium_server_spark.functions.binlog_codec import T_STRING

    for maxlen in (16, 255, 256, 300, 1020):
        cols = [{"type": T_STRING, "meta": (T_STRING, maxlen),
                 "nullable": True}]
        tmap = {"type": "table_map", "table_id": 4, "schema": "s",
                "table": "c", "columns": cols, "timestamp": 1,
                "log_pos": 0}
        raw = encode_event(tmap)
        out = decode_event(raw)
        assert out["columns"][0] == {"type": T_STRING,
                                     "meta": (T_STRING, maxlen),
                                     "nullable": True}
        assert encode_event(out) == raw  # byte-exact twin
        ev = {"type": "write_rows", "table_id": 4, "columns": cols,
              "rows": [["padded char"], [""]], "timestamp": 1,
              "log_pos": 9}
        got = decode_event(encode_event(ev),
                           columns_of=lambda tid: cols)
        assert got["rows"] == [["padded char"], [""]]
    # golden packing for CHAR(300): 0xFE ^ 0x10 = 0xEE, 0x2C
    cols = [{"type": T_STRING, "meta": (T_STRING, 300)}]
    tmap = {"type": "table_map", "table_id": 4, "schema": "s",
            "table": "c", "columns": cols, "timestamp": 1, "log_pos": 0}
    raw = encode_event(tmap)
    assert bytes((0xEE, 0x2C)) in raw


def test_enum_hidden_in_string_metadata_resolves():
    """Real servers ship ENUM/SET columns as MYSQL_TYPE_STRING with
    the real type in the packed metadata — decode resolves them back
    to T_ENUM/T_SET col specs (pack size = byte1) so the cell decode
    path is shared with the direct-coded twin."""
    from debezium_server_spark.functions.binlog_codec import (
        T_ENUM,
        T_SET,
        T_STRING,
    )

    cols = [{"type": T_STRING, "meta": (T_ENUM, 2), "nullable": True},
            {"type": T_STRING, "meta": (T_SET, 1), "nullable": True}]
    tmap = {"type": "table_map", "table_id": 6, "schema": "s",
            "table": "e", "columns": cols, "timestamp": 1, "log_pos": 0}
    out = decode_event(encode_event(tmap))
    assert out["columns"][0] == {"type": T_ENUM, "meta": 2,
                                 "nullable": True}
    assert out["columns"][1] == {"type": T_SET, "meta": 1,
                                 "nullable": True}
    # the resolved specs decode cells encoded by the direct twin
    ev = {"type": "write_rows", "table_id": 6,
          "columns": out["columns"], "rows": [[258, 0b101]],
          "timestamp": 1, "log_pos": 9}
    got = decode_event(encode_event(ev),
                       columns_of=lambda tid: out["columns"])
    assert got["rows"] == [[258, 0b101]]


def test_bit_and_year_cells():
    from debezium_server_spark.functions.binlog_codec import (
        T_BIT,
        T_YEAR,
    )

    cols = [{"type": T_BIT, "meta": 12, "nullable": True},
            {"type": T_YEAR, "nullable": True}]
    tmap = {"type": "table_map", "table_id": 8, "schema": "s",
            "table": "b", "columns": cols, "timestamp": 1, "log_pos": 0}
    out = decode_event(encode_event(tmap))
    assert out["columns"][0]["meta"] == 12  # (bits%8, bits//8) packed
    for row in ([0b101010101010, 2026], [0, 0], [1, 1901],
                [(1 << 12) - 1, 2155]):
        ev = {"type": "write_rows", "table_id": 8, "columns": cols,
              "rows": [row], "timestamp": 1, "log_pos": 9}
        got = decode_event(encode_event(ev),
                           columns_of=lambda tid: cols)
        assert got["rows"] == [row], row


def test_old_format_temporals_and_rotate():
    """Pre-5.6.4 temporal encodings (columns keep them across server
    upgrades): TIMESTAMP = 4-byte LE unix seconds, DATETIME = packed
    YYYYMMDDHHMMSS in 8 LE bytes, TIME = signed HHMMSS in 3 LE bytes;
    plus the ROTATE next-file pointer event."""
    from debezium_server_spark.functions.binlog_codec import (
        T_DATETIME,
        T_TIME,
        T_TIMESTAMP,
    )

    cols = [{"type": T_TIMESTAMP, "nullable": True},
            {"type": T_DATETIME, "nullable": True},
            {"type": T_TIME, "nullable": True}]
    tmap = {"type": "table_map", "table_id": 2, "schema": "s",
            "table": "old", "columns": cols, "timestamp": 1,
            "log_pos": 0}
    assert decode_event(encode_event(tmap))["columns"] == [
        {"type": t["type"], "meta": 0, "nullable": True} for t in cols]
    for row in ([1600000000, "2021-07-04 23:59:59", "838:59:59"],
                [0, "0000-00-00 00:00:00", "-01:02:03"],
                [2**32 - 1, "9999-12-31 12:34:56", "00:00:00"]):
        ev = {"type": "write_rows", "table_id": 2, "columns": cols,
              "rows": [row], "timestamp": 1, "log_pos": 9}
        got = decode_event(encode_event(ev),
                           columns_of=lambda tid: cols)
        assert got["rows"] == [row], row
    # golden: DATETIME 2021-07-04 23:59:59 packs to 20210704235959 LE
    import struct as _s

    from debezium_server_spark.functions.binlog_codec import _enc_value

    assert _enc_value({"type": T_DATETIME}, "2021-07-04 23:59:59") == \
        (20210704235959).to_bytes(8, "little")
    rot = {"type": "rotate", "position": 4,
           "next_file": "binlog.000042", "timestamp": 5, "log_pos": 6}
    out = decode_event(encode_event(rot))
    assert out["position"] == 4 and out["next_file"] == "binlog.000042"
    assert encode_event(out) == encode_event(rot)


# ------------------------------------------------- MariaDB dialect


def test_mariadb_gtid_golden_bytes():
    """Hand-packed MARIADB_GTID (0xA2) layout per the MariaDB KB:
    seqno u64 LE, domain u32 LE, flags2 u8, commit_id u64 when
    FL_GROUP_COMMIT_ID set; server_id rides the frame header and
    joins the domain-server-seqno GTID rendering."""
    from debezium_server_spark.functions.binlog_codec import (
        FL_GROUP_COMMIT_ID,
        MARIADB_GTID_EVENT,
    )

    ev = {"type": "mariadb_gtid", "seqno": 77, "domain_id": 3,
          "flags2": FL_GROUP_COMMIT_ID, "commit_id": 12,
          "server_id": 5, "timestamp": 100, "log_pos": 0}
    raw = encode_event(ev)
    assert raw[4] == MARIADB_GTID_EVENT
    body = raw[19:]
    assert body == struct.pack("<QIB", 77, 3, FL_GROUP_COMMIT_ID) \
        + struct.pack("<Q", 12)
    back = decode_event(raw)
    assert back["seqno"] == 77 and back["domain_id"] == 3
    assert back["commit_id"] == 12
    assert back["gtid"] == "3-5-77"
    # without the group-commit flag, no commit_id field
    solo = decode_event(encode_event({
        "type": "mariadb_gtid", "seqno": 78, "domain_id": 3,
        "flags2": 0, "server_id": 5}))
    assert "commit_id" not in solo and solo["gtid"] == "3-5-78"


def test_mariadb_gtid_list_and_checkpoint_round_trip():
    from debezium_server_spark.functions.binlog_codec import (
        MARIADB_GTID_LIST_EVENT,
    )

    gl = {"type": "mariadb_gtid_list",
          "gtids": [(0, 1, 100), (3, 5, 77)], "flags": 1}
    raw = encode_event(gl)
    assert raw[4] == MARIADB_GTID_LIST_EVENT
    (packed,) = struct.unpack("<I", raw[19:23])
    assert packed & 0x0FFFFFFF == 2 and packed >> 28 == 1
    back = decode_event(raw)
    assert back["gtids"] == [(0, 1, 100), (3, 5, 77)]
    assert back["flags"] == 1
    ck = decode_event(encode_event({
        "type": "binlog_checkpoint", "file": "mariadb-bin.000042"}))
    assert ck["file"] == "mariadb-bin.000042"


def test_mariadb_annotate_and_start_encryption():
    ann = decode_event(encode_event({
        "type": "annotate_rows",
        "sql": "UPDATE app.accounts SET name = 'x' WHERE id = 1"}))
    assert ann["type"] == "annotate_rows" and "UPDATE" in ann["sql"]
    se = decode_event(encode_event({
        "type": "start_encryption", "scheme": 1, "key_version": 9,
        "nonce": b"n" * 12}))
    assert se["key_version"] == 9 and se["nonce"] == b"n" * 12
    with pytest.raises(ValueError, match="nonce"):
        encode_event({"type": "start_encryption", "nonce": b"short"})


def test_mariadb_flavored_stream_through_changelog_stage(spark):
    """A MariaDB-shaped capture — GTID_LIST at binlog head, BINLOG_
    CHECKPOINT, MARIADB_GTID + ANNOTATE_ROWS bracketing the row
    events — decodes to the same row envelope as a MySQL one: the
    dialect control events are non-row events the JVM-side type
    filter prunes, and post-START_ENCRYPTION garbage quarantines
    instead of mis-parsing."""
    from debezium_server_spark.functions.binlog_codec import (
        FL_GROUP_COMMIT_ID,
        MAGIC,
        WRITE_ROWS_EVENT_V2,
        split_events,
    )

    events = [
        {"type": "format_description",
         "server_version": "10.11.6-MariaDB-log"},
        {"type": "mariadb_gtid_list", "gtids": [(0, 1, 9)]},
        {"type": "binlog_checkpoint", "file": "mariadb-bin.000041"},
        {"type": "mariadb_gtid", "seqno": 10, "domain_id": 0,
         "flags2": FL_GROUP_COMMIT_ID, "commit_id": 4, "server_id": 1},
        {"type": "annotate_rows",
         "sql": "INSERT INTO app.accounts VALUES (1, 'a', 10)"},
        TMAP,
        {"type": "write_rows", "table_id": 7, "columns": COLS,
         "rows": [[1, "a", 10]], "timestamp": 101},
        {"type": "xid", "xid": 99},
    ]
    stream = MAGIC + b"".join(encode_event(e) for e in events)
    frames = split_events(stream)
    assert len(frames) == len(events)
    msgs = spark.createDataFrame(
        [(i, bytearray(f)) for i, f in enumerate(frames)]
        # an undecodable post-encryption blob posing as a rows event
        + [(99, bytearray(
            struct.pack("<IBIIIH", 0, WRITE_ROWS_EVENT_V2, 1, 29, 0, 0)
            + b"\xde\xad\xbe\xef\xca\xfe\xba\xbe\x99\x99"))],
        "seq long, data binary")
    names = {"app.accounts": ["id", "name", "balance"]}
    out = decode_binlog_changelog(
        msgs, names, registry=load_table_registry(msgs)).collect()
    good = [r for r in out if r["error"] is None]
    assert len(good) == 1
    assert good[0]["op"] == "c"
    assert json.loads(good[0]["after"]) == \
        {"id": 1, "name": "a", "balance": 10}
    bad = [r for r in out if r["error"] is not None]
    assert len(bad) == 1 and bad[0]["seq"] == 99


@pytest.mark.parametrize("seed", [11, 12])
def test_mariadb_event_fuzz_round_trip(seed):
    """500 random MariaDB dialect events per seed round-trip
    byte-exactly through encode/decode (plain and CRC32-framed)."""
    import random

    from debezium_server_spark.functions.binlog_codec import (
        FL_GROUP_COMMIT_ID,
        FL_STANDALONE,
    )

    rng = random.Random(seed)
    for _ in range(500):
        kind = rng.choice(("mariadb_gtid", "mariadb_gtid_list",
                           "binlog_checkpoint", "annotate_rows",
                           "start_encryption"))
        if kind == "mariadb_gtid":
            flags2 = rng.choice((0, FL_STANDALONE, FL_GROUP_COMMIT_ID,
                                 FL_STANDALONE | FL_GROUP_COMMIT_ID))
            ev = {"type": kind, "seqno": rng.randrange(2**63),
                  "domain_id": rng.randrange(2**32), "flags2": flags2,
                  "server_id": rng.randrange(1, 2**31)}
            if flags2 & FL_GROUP_COMMIT_ID:
                ev["commit_id"] = rng.randrange(2**63)
        elif kind == "mariadb_gtid_list":
            ev = {"type": kind, "flags": rng.randrange(16),
                  "gtids": [(rng.randrange(2**32), rng.randrange(2**32),
                             rng.randrange(2**63))
                            for _ in range(rng.randrange(20))]}
        elif kind == "binlog_checkpoint":
            ev = {"type": kind,
                  "file": f"mariadb-bin.{rng.randrange(10**6):06d}"}
        elif kind == "annotate_rows":
            ev = {"type": kind, "sql": "INSERT /*c*/ " + "x" * rng.randrange(200)}
        else:
            ev = {"type": kind, "scheme": rng.randrange(256),
                  "key_version": rng.randrange(2**32),
                  "nonce": bytes(rng.randrange(256) for _ in range(12))}
        checksum = rng.random() < 0.5
        back = decode_event(encode_event(ev, checksum=checksum),
                            checksum=checksum)
        for k, v in ev.items():
            assert back[k] == v, (kind, k, back.get(k), v)

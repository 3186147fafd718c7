"""PostgreSQL streaming-replication TRANSPORT framing — the COPY-BOTH
byte stream a real server ships pgoutput messages inside (PUBLIC docs:
PostgreSQL protocol §"Streaming Replication Protocol"). The pgoutput
codec decodes message *payloads*; this module handles the layer below,
so a capture pipeline can consume genuine `START_REPLICATION` output:

  'w' XLogData          Int64 wal_start, Int64 wal_end, Int64 server
                        clock (µs since 2000-01-01), then the pgoutput
                        message bytes
  'k' Primary keepalive Int64 wal_end, Int64 clock, Byte1 reply-
                        requested — the heartbeat/liveness channel
  'r' Standby status    Int64 written/flushed/applied LSNs, Int64
     update (sent by us) clock, Byte1 reply-requested — the ack the
                        client returns; its flushed LSN is what lets
                        the server discard WAL (offset-commit analog
                        of `record.commit()`, SURVEY.md §1.1)

`split_copy_stream` walks a captured byte stream of concatenated
copy-data payloads (length-prefixed, as a capture tool would store
them) into (kind, dict) tuples, turning `w` payloads into the
`(seq, data)` rows `sources/pgoutput_source.py` consumes — `seq` is
the frame's wal_start, giving the decode stage its LSN order for free.
"""

from __future__ import annotations

import struct as _struct

from debezium_server_spark.functions.pgoutput_codec import PG_EPOCH_OFFSET_US


def encode_xlogdata(wal_start: int, wal_end: int, clock_us: int,
                    payload: bytes) -> bytes:
    return (b"w" + _struct.pack(">qqq", wal_start, wal_end, clock_us)
            + bytes(payload))


def encode_keepalive(wal_end: int, clock_us: int,
                     reply_requested: bool = False) -> bytes:
    return (b"k" + _struct.pack(">qq", wal_end, clock_us)
            + (b"\x01" if reply_requested else b"\x00"))


def encode_standby_status(written: int, flushed: int, applied: int,
                          clock_us: int,
                          reply_requested: bool = False) -> bytes:
    return (b"r" + _struct.pack(">qqqq", written, flushed, applied,
                                clock_us)
            + (b"\x01" if reply_requested else b"\x00"))


def decode_frame(data: bytes) -> tuple[str, dict]:
    """One copy-data payload → (kind, fields). kind ∈ {'w','k','r'}."""
    tag = data[:1].decode("ascii")
    if tag == "w":
        wal_start, wal_end, clock = _struct.unpack(">qqq", data[1:25])
        return "w", {"wal_start": wal_start, "wal_end": wal_end,
                     "clock_us": clock, "payload": data[25:]}
    if tag == "k":
        wal_end, clock = _struct.unpack(">qq", data[1:17])
        return "k", {"wal_end": wal_end, "clock_us": clock,
                     "reply_requested": data[17] == 1}
    if tag == "r":
        written, flushed, applied, clock = _struct.unpack(
            ">qqqq", data[1:33])
        return "r", {"written": written, "flushed": flushed,
                     "applied": applied, "clock_us": clock,
                     "reply_requested": data[33] == 1}
    raise ValueError(f"unknown replication frame tag {tag!r}")


def split_copy_stream(blob: bytes) -> list[tuple[str, dict]]:
    """A captured stream of big-endian length-prefixed copy-data
    payloads → decoded frames in order."""
    out, pos = [], 0
    while pos < len(blob):
        if pos + 4 > len(blob):
            raise EOFError("truncated frame length prefix")
        (n,) = _struct.unpack(">i", blob[pos:pos + 4])
        frame = blob[pos + 4:pos + 4 + n]
        if len(frame) != n:
            raise EOFError("truncated replication frame")
        out.append(decode_frame(frame))
        pos += 4 + n
    return out


def xlogdata_to_wal_rows(frames: list[tuple[str, dict]]
                         ) -> list[tuple[int, bytes]]:
    """Keep only XLogData frames as the `(seq, data)` rows the pgoutput
    decode stage takes — seq = wal_start (the LSN order pgoutput's
    transaction association relies on). Keepalives never carry data."""
    return [(f["wal_start"], f["payload"]) for kind, f in frames
            if kind == "w"]


def clock_to_unix_us(clock_us: int) -> int:
    """Server clock (µs since 2000-01-01) → Unix µs — same epoch rule
    as pgoutput commit timestamps."""
    return clock_us + PG_EPOCH_OFFSET_US

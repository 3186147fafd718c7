"""Pure-Python BSON codec — the wire format under MongoDB's oplog,
which the reference consumes through its bundled MongoDB connector
(`debezium-server-dist/pom.xml` connector set; SURVEY.md §2.1). Like
`pgoutput_codec.py`, this is built from the PUBLIC specification
(bsonspec.org, BSON 1.1) with an encoder twin so the decoder can be
fixture- and property-tested offline, and golden-byte vectors pin the
layout independently of the twin.

Element types implemented (the closure of what oplog entries carry):

  0x01 double        0x02 string         0x03 embedded document
  0x04 array         0x05 binary         0x07 ObjectId
  0x08 boolean       0x09 UTC datetime   0x0A null
  0x10 int32         0x11 timestamp      0x12 int64

All little-endian. Documents are `int32 total_size, elements..., 0x00`;
strings are `int32 size, utf8 bytes, 0x00` (size includes the NUL).
Python mapping: dict ↔ document (insertion order preserved — BSON is
ordered), list ↔ array, int → int32 if it fits else int64, and three
tiny wrapper types below for the Mongo-specific scalars so round-trips
are unambiguous.

Scale shape: one `decode` per oplog entry inside an Arrow batch (see
`sources/oplog_source.py`) — pure `struct` unpacking, no per-row Python
UDF transfer.
"""

from __future__ import annotations

import struct as _struct
from dataclasses import dataclass

# ------------------------------------------------------- wrapper types


@dataclass(frozen=True)
class ObjectId:
    """12-byte Mongo ObjectId (hex in JSON projections)."""

    hex: str

    def __post_init__(self):
        if len(self.hex) != 24 or any(c not in "0123456789abcdef"
                                      for c in self.hex):
            raise ValueError(f"bad ObjectId hex {self.hex!r}")


@dataclass(frozen=True)
class BsonTimestamp:
    """Oplog `ts`: (seconds since epoch, increment) — NOT a datetime."""

    seconds: int
    increment: int


@dataclass(frozen=True)
class UtcDatetime:
    """0x09: milliseconds since the Unix epoch."""

    millis: int


@dataclass(frozen=True)
class BsonBinary:
    """0x05 with a non-generic subtype (e.g. 0x04 UUID). Plain `bytes`
    map to subtype 0; this wrapper preserves any other subtype so a
    decode→encode round trip reproduces the byte stream exactly —
    the encoder twin is held to exact fidelity everywhere else."""

    subtype: int
    data: bytes


# --------------------------------------------------------------- encode


def _enc_element(name: str, v) -> bytes:
    key = name.encode("utf-8") + b"\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + key + _struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8") + b"\x00"
        return b"\x02" + key + _struct.pack("<i", len(raw)) + raw
    if isinstance(v, dict):
        return b"\x03" + key + encode(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + key + encode(
            {str(i): item for i, item in enumerate(v)})
    if isinstance(v, (bytes, bytearray)):
        return (b"\x05" + key + _struct.pack("<i", len(v)) + b"\x00"
                + bytes(v))  # subtype 0: generic
    if isinstance(v, BsonBinary):
        return (b"\x05" + key + _struct.pack("<i", len(v.data))
                + bytes([v.subtype]) + bytes(v.data))
    if isinstance(v, ObjectId):
        return b"\x07" + key + bytes.fromhex(v.hex)
    if isinstance(v, UtcDatetime):
        return b"\x09" + key + _struct.pack("<q", v.millis)
    if v is None:
        return b"\x0a" + key
    if isinstance(v, BsonTimestamp):
        return (b"\x11" + key
                + _struct.pack("<II", v.increment & 0xFFFFFFFF,
                               v.seconds & 0xFFFFFFFF))
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + key + _struct.pack("<i", v)
        return b"\x12" + key + _struct.pack("<q", v)
    raise TypeError(f"no BSON mapping for {type(v).__name__}")


def encode(doc: dict) -> bytes:
    """dict → BSON document bytes."""
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return _struct.pack("<i", len(body) + 5) + body + b"\x00"


# --------------------------------------------------------------- decode


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = bytes(data)
        self.pos = pos

    def take(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated BSON")
        self.pos += n
        return out

    def int32(self) -> int:
        return _struct.unpack("<i", self.take(4))[0]

    def int64(self) -> int:
        return _struct.unpack("<q", self.take(8))[0]

    def cstr(self) -> str:
        end = self.data.index(b"\x00", self.pos)
        out = self.data[self.pos:end].decode("utf-8")
        self.pos = end + 1
        return out

    def string(self) -> str:
        n = self.int32()
        raw = self.take(n)
        if n < 1 or raw[-1] != 0:
            raise ValueError("BSON string not NUL-terminated")
        return raw[:-1].decode("utf-8")


def _dec_document(r: _Reader) -> dict:
    total = r.int32()
    end = r.pos + total - 4
    out: dict = {}
    while True:
        etype = r.take(1)[0]
        if etype == 0x00:
            break
        name = r.cstr()
        if etype == 0x01:
            out[name] = _struct.unpack("<d", r.take(8))[0]
        elif etype == 0x02:
            out[name] = r.string()
        elif etype == 0x03:
            out[name] = _dec_document(r)
        elif etype == 0x04:
            arr_doc = _dec_document(r)
            if list(arr_doc) != [str(i) for i in range(len(arr_doc))]:
                raise ValueError("BSON array keys not 0..n-1")
            out[name] = list(arr_doc.values())
        elif etype == 0x05:
            n = r.int32()
            subtype = r.take(1)[0]
            if subtype not in (0x00, 0x04):  # generic / UUID
                raise ValueError(f"unsupported binary subtype {subtype}")
            raw = r.take(n)
            # subtype 0 stays plain bytes; anything else keeps its
            # subtype so encode(decode(x)) == x (UUID binaries must not
            # silently rewrite as generic)
            out[name] = raw if subtype == 0x00 else BsonBinary(subtype, raw)
        elif etype == 0x07:
            out[name] = ObjectId(r.take(12).hex())
        elif etype == 0x08:
            b = r.take(1)[0]
            if b not in (0, 1):
                raise ValueError(f"bad boolean byte {b}")
            out[name] = bool(b)
        elif etype == 0x09:
            out[name] = UtcDatetime(r.int64())
        elif etype == 0x0A:
            out[name] = None
        elif etype == 0x10:
            out[name] = r.int32()
        elif etype == 0x11:
            inc, sec = _struct.unpack("<II", r.take(8))
            out[name] = BsonTimestamp(sec, inc)
        elif etype == 0x12:
            out[name] = r.int64()
        else:
            raise ValueError(f"unsupported BSON element type 0x{etype:02x}")
    if r.pos != end:
        raise ValueError(f"BSON document size mismatch "
                         f"(declared end {end}, parsed to {r.pos})")
    return out


def decode(data: bytes) -> dict:
    """BSON document bytes → dict. Trailing garbage raises — an oplog
    entry is exactly one document."""
    r = _Reader(data)
    out = _dec_document(r)
    if r.pos != len(r.data):
        raise ValueError(f"{len(r.data) - r.pos} trailing bytes "
                         "after BSON document")
    return out

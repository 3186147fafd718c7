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


@dataclass(frozen=True)
class Decimal128:
    """0x13: IEEE 754-2008 decimal128 in the BID encoding (the
    public bson-decimal128 spec) — MongoDB's NumberDecimal, the
    canonical money type, which the reference's Mongo connector
    captures natively. Held as the spec's EXACT string rendering
    (sign/coefficient/exponent all preserved — '1.00' ≠ '1' ≠
    '1E+2'), never a float; special values are 'NaN', 'Infinity',
    '-Infinity'. `text → bits` (the encoder twin) and `bits → text`
    are mutual inverses on canonical values, so round trips are
    byte-exact."""

    text: str


_DEC128_EXP_BIAS = 6176
_DEC128_MAX_COEF = 10 ** 34 - 1  # 34 decimal digits
_DEC128_EXP_MIN, _DEC128_EXP_MAX = -6176, 6111


def _dec128_to_text(raw: bytes) -> str:
    """16 LE bytes → the spec's string rendering."""
    low, high = _struct.unpack("<QQ", raw)
    sign = "-" if high >> 63 else ""
    combination = (high >> 58) & 0x1F
    if combination == 0x1F:
        return "NaN"  # sign/payload not rendered, per the spec
    if combination == 0x1E:
        return sign + "Infinity"
    if (high >> 61) & 0x3 == 0x3:
        # '11' prefix: exponent shifted, implicit (100) coefficient
        # prefix — any such coefficient exceeds 34 digits, which the
        # spec defines as value ZERO (non-canonical); reject rather
        # than decode to a value that cannot re-encode byte-exact
        raise ValueError("non-canonical decimal128 (oversized "
                         "coefficient encoding)")
    exponent = ((high >> 49) & 0x3FFF) - _DEC128_EXP_BIAS
    coef = ((high & 0x0001FFFFFFFFFFFF) << 64) | low
    if coef > _DEC128_MAX_COEF:
        raise ValueError("non-canonical decimal128 (coefficient "
                         "> 10^34-1)")
    digits = str(coef)
    adjusted = exponent + len(digits) - 1
    if exponent <= 0 and adjusted >= -6:
        if exponent == 0:
            return sign + digits
        point = len(digits) + exponent
        if point <= 0:
            return sign + "0." + "0" * -point + digits
        return sign + digits[:point] + "." + digits[point:]
    # scientific notation
    mantissa = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return f"{sign}{mantissa}E{adjusted:+d}"


def _dec128_from_text(text: str) -> bytes:
    """Inverse of `_dec128_to_text` — 16 LE bytes. Rejects values
    outside decimal128's range instead of applying the spec's
    clamp/round rules (an exact-capture codec must not silently
    change a value)."""
    t = text.strip()
    sign = 0
    if t[:1] in "+-":
        sign = 1 if t[0] == "-" else 0
        t = t[1:]
    if t == "NaN" or text.strip() == "NaN":
        return _struct.pack("<QQ", 0, 0x1F << 58)
    if t == "Infinity":
        return _struct.pack("<QQ", 0,
                            (sign << 63) | (0x1E << 58))
    mant, _, exppart = t.partition("E")
    if not exppart:
        mant, _, exppart = t.partition("e")
    exponent = int(exppart) if exppart else 0
    ip, dot, fp = mant.partition(".")
    if not (ip + fp).isdigit() or not (ip or fp):
        raise ValueError(f"bad decimal128 literal {text!r}")
    exponent -= len(fp)
    coef = int(ip + fp)
    if coef > _DEC128_MAX_COEF:
        raise ValueError(f"decimal128 coefficient exceeds 34 digits: "
                         f"{text!r}")
    if not _DEC128_EXP_MIN <= exponent <= _DEC128_EXP_MAX:
        raise ValueError(f"decimal128 exponent {exponent} out of "
                         f"[{_DEC128_EXP_MIN}, {_DEC128_EXP_MAX}]: "
                         f"{text!r}")
    high = ((sign << 63)
            | ((exponent + _DEC128_EXP_BIAS) << 49)
            | (coef >> 64))
    return _struct.pack("<QQ", coef & 0xFFFFFFFFFFFFFFFF, high)


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
    if isinstance(v, Decimal128):
        return b"\x13" + key + _dec128_from_text(v.text)
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
        elif etype == 0x13:
            out[name] = Decimal128(_dec128_to_text(r.take(16)))
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

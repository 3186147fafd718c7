"""Pure-Python codec for MySQL's binary JSON column format — the
in-cell encoding `JSON` columns ride inside binlog ROW events. The
reference captures JSON columns natively through its bundled MySQL
connector (`debezium-server-dist/pom.xml:359-389`); this module
re-implements the layout from the PUBLIC MySQL internals documentation
("The JSON Binary Storage Format", WL#8132 / json_binary.h docs),
with the encoder-twin + golden-byte + fuzz discipline of
`binlog_codec.py` / `pgoutput_codec.py` / `bson_codec.py`.

Wire grammar (all multi-byte integers little-endian):

  doc        ::= type value
  type       ::= 0x00 small-object | 0x01 large-object
               | 0x02 small-array  | 0x03 large-array
               | 0x04 literal | 0x05 int16  | 0x06 uint16
               | 0x07 int32   | 0x08 uint32 | 0x09 int64 | 0x0a uint64
               | 0x0b double  | 0x0c utf8 string | 0x0f opaque
  object     ::= element-count size key-entry* value-entry* key* value*
  array      ::= element-count size value-entry* value*
  key-entry  ::= key-offset key-length          (key-length: uint16)
  value-entry::= type(1) offset-or-inlined-value
  literal    ::= 0x00 null | 0x01 true | 0x02 false
  string     ::= var-length(LEB128, low 7 bits first) utf8-bytes
  opaque     ::= field-type(1) var-length payload-bytes

In the SMALL format element-count / size / offsets are uint16 and the
inlined types are literal / int16 / uint16; the LARGE format widens
them to uint32 and additionally inlines int32 / uint32. Offsets are
relative to the first byte of the container's element-count. Object
keys are stored sorted by (length, bytes) — the server's rule, pinned
by golden vectors.

Python mapping: None/bool/int/float/str/list/dict round-trip
naturally (ints encode as the smallest of int16/int32/int64, uint64
for positive values past int64 — the server's choice); DECIMAL values
inside JSON arrive as opaque MYSQL_TYPE_NEWDECIMAL and decode to
`JsonDecimal` (exact text, never a float — the NEWDECIMAL contract of
`binlog_codec.py`); any other opaque field type decodes to
`JsonOpaque` so re-encode is byte-faithful. `to_jsonable` projects
both wrappers (and bytes) into plain JSON-serializable values for the
envelope's text images.
"""

from __future__ import annotations

import struct as _struct
from dataclasses import dataclass

from debezium_server_spark.functions.binlog_codec import (
    GeoValue,
    T_NEWDECIMAL,
    decode_newdecimal,
    encode_newdecimal,
)

J_SMALL_OBJECT = 0x00
J_LARGE_OBJECT = 0x01
J_SMALL_ARRAY = 0x02
J_LARGE_ARRAY = 0x03
J_LITERAL = 0x04
J_INT16 = 0x05
J_UINT16 = 0x06
J_INT32 = 0x07
J_UINT32 = 0x08
J_INT64 = 0x09
J_UINT64 = 0x0A
J_DOUBLE = 0x0B
J_STRING = 0x0C
J_OPAQUE = 0x0F

LIT_NULL, LIT_TRUE, LIT_FALSE = 0x00, 0x01, 0x02

_SMALL_INLINE = (J_LITERAL, J_INT16, J_UINT16)
_LARGE_INLINE = _SMALL_INLINE + (J_INT32, J_UINT32)


@dataclass(frozen=True)
class JsonDecimal:
    """DECIMAL inside a JSON document: exact text + the (precision,
    scale) the opaque payload declares. Never a float."""

    text: str
    precision: int
    scale: int


@dataclass(frozen=True)
class JsonOpaque:
    """Opaque JSON value (0x0f) of a field type this codec does not
    interpret — kept byte-faithful so encode(decode(x)) == x."""

    field_type: int
    data: bytes


def to_jsonable(v):
    """Project a decoded value into plain JSON-serializable Python:
    JsonDecimal → its exact text, JsonOpaque → a tagged dict, bytes →
    base64 (the oplog convention); containers recurse."""
    import base64

    if isinstance(v, JsonDecimal):
        return v.text
    if isinstance(v, JsonOpaque):
        return {"$opaque": v.field_type,
                "base64": base64.b64encode(v.data).decode("ascii")}
    if isinstance(v, GeoValue):  # GEOMETRY cell (binlog_codec)
        return {"srid": v.srid,
                "wkb": base64.b64encode(v.wkb).decode("ascii")}
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, dict):
        return {k: to_jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [to_jsonable(x) for x in v]
    return v


# ------------------------------------------------------------ varlength


def _enc_varlen(n: int) -> bytes:
    """LEB128 (low 7 bits first, high bit = continuation) — the
    data-length encoding for strings and opaque payloads."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varlen(data: bytes, pos: int) -> tuple[int, int]:
    n, shift = 0, 0
    while True:
        if pos >= len(data):
            raise EOFError("truncated JSON var-length")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("JSON var-length too long")


# --------------------------------------------------------------- encode


def _scalar_payload(v) -> tuple[int, bytes]:
    """(type byte, payload bytes) for a non-container value."""
    if v is None:
        return J_LITERAL, bytes((LIT_NULL,))
    if isinstance(v, bool):
        return J_LITERAL, bytes((LIT_TRUE if v else LIT_FALSE,))
    if isinstance(v, int):
        if -(1 << 15) <= v < 1 << 15:
            return J_INT16, _struct.pack("<h", v)
        if -(1 << 31) <= v < 1 << 31:
            return J_INT32, _struct.pack("<i", v)
        if -(1 << 63) <= v < 1 << 63:
            return J_INT64, _struct.pack("<q", v)
        if 0 <= v < 1 << 64:
            return J_UINT64, _struct.pack("<Q", v)
        raise ValueError(f"integer {v} out of JSON range")
    if isinstance(v, float):
        return J_DOUBLE, _struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return J_STRING, _enc_varlen(len(raw)) + raw
    if isinstance(v, JsonDecimal):
        payload = (bytes((v.precision, v.scale))
                   + encode_newdecimal(v.text, v.precision, v.scale))
        return J_OPAQUE, (bytes((T_NEWDECIMAL,))
                          + _enc_varlen(len(payload)) + payload)
    if isinstance(v, JsonOpaque):
        if v.field_type == T_NEWDECIMAL:
            # decode() always parses field type 246 as a decimal, so
            # an opaque carrying that type with non-decimal bytes
            # would encode to something decode() rejects — make the
            # asymmetry impossible (the BsonBinary-subtype lesson);
            # decimals go through JsonDecimal
            raise ValueError(
                "JsonOpaque cannot carry MYSQL_TYPE_NEWDECIMAL "
                "(246) — use JsonDecimal")
        return J_OPAQUE, (bytes((v.field_type,))
                          + _enc_varlen(len(v.data)) + bytes(v.data))
    raise TypeError(f"no JSON-binary mapping for {type(v).__name__}")


def _inline_field(jtype: int, payload: bytes, width: int) -> bytes:
    """The inlined value as the entry's offset field (width 2 or 4):
    literal code / int16 / uint16 (+ int32/uint32 when width 4),
    zero-extended to the field width."""
    if jtype == J_LITERAL:
        return payload + b"\x00" * (width - 1)
    return payload + b"\x00" * (width - len(payload))


def _enc_container(v, large: bool) -> bytes:
    """Serialize an object/array payload (element-count through the
    last value) in the given format width. Raises ValueError if a
    small-format offset/size overflows uint16 — the caller retries
    large."""
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    inline_ok = _LARGE_INLINE if large else _SMALL_INLINE
    is_obj = isinstance(v, dict)
    if is_obj:
        items = sorted(v.items(), key=lambda kv: (len(kv[0].encode()),
                                                  kv[0].encode()))
        keys = [k.encode("utf-8") for k, _ in items]
        vals = [x for _, x in items]
    else:
        keys = []
        vals = list(v)

    ser = []  # (jtype, payload, inline?)
    for x in vals:
        if isinstance(x, dict):
            ser.append((J_LARGE_OBJECT if _needs_large(x)
                        else J_SMALL_OBJECT, None, False))
        elif isinstance(x, (list, tuple)):
            ser.append((J_LARGE_ARRAY if _needs_large(x)
                        else J_SMALL_ARRAY, None, False))
        else:
            t, p = _scalar_payload(x)
            ser.append((t, p, t in inline_ok))

    n = len(vals)
    header = 2 * w  # element-count + size
    header += len(keys) * (w + 2)  # key entries
    header += n * (1 + w)  # value entries
    pos = header
    key_offsets = []
    for k in keys:
        key_offsets.append(pos)
        pos += len(k)
    val_offsets: list[int | None] = []
    payloads: list[bytes] = []
    for (t, p, inline), x in zip(ser, vals):
        if inline:
            val_offsets.append(None)
            continue
        if p is None:  # nested container: serialize now
            p = _enc_container(x, large=t in (J_LARGE_OBJECT,
                                              J_LARGE_ARRAY))
        val_offsets.append(pos)
        payloads.append(p)
        pos += len(p)
    size = pos
    if not large and (size > 0xFFFF
                      or any(o is not None and o > 0xFFFF
                             for o in val_offsets + key_offsets)):
        raise ValueError("small-format overflow")

    out = bytearray()
    out += _struct.pack(fmt, n)
    out += _struct.pack(fmt, size)
    for off, k in zip(key_offsets, keys):
        out += _struct.pack(fmt, off) + _struct.pack("<H", len(k))
    pi = iter(payloads)
    for (t, p, inline), off in zip(ser, val_offsets):
        out.append(t)
        if inline:
            out += _inline_field(t, p, w)
        else:
            out += _struct.pack(fmt, off)
    for k in keys:
        out += k
    for p in payloads:
        out += p
    if len(out) != size:
        raise AssertionError("jsonb layout size mismatch")
    return bytes(out)


def _needs_large(v) -> bool:
    """Cheap pre-check; the authoritative check is the small-format
    attempt raising, so this only avoids obviously-doomed tries."""
    try:
        return len(_enc_container(v, large=False)) > 0xFFFF
    except ValueError:
        return True


def encode(v) -> bytes:
    """Python value → full binary JSON document (type byte + value)."""
    if isinstance(v, dict):
        try:
            return bytes((J_SMALL_OBJECT,)) + _enc_container(v, False)
        except ValueError:
            return bytes((J_LARGE_OBJECT,)) + _enc_container(v, True)
    if isinstance(v, (list, tuple)):
        try:
            return bytes((J_SMALL_ARRAY,)) + _enc_container(v, False)
        except ValueError:
            return bytes((J_LARGE_ARRAY,)) + _enc_container(v, True)
    t, p = _scalar_payload(v)
    return bytes((t,)) + p


# --------------------------------------------------------------- decode


def _dec_scalar(jtype: int, data: bytes, pos: int):
    """Decode a non-container value whose payload starts at `pos`."""
    if jtype == J_LITERAL:
        lit = data[pos]
        if lit == LIT_NULL:
            return None
        if lit == LIT_TRUE:
            return True
        if lit == LIT_FALSE:
            return False
        raise ValueError(f"bad JSON literal 0x{lit:02x}")
    if jtype == J_INT16:
        return _struct.unpack_from("<h", data, pos)[0]
    if jtype == J_UINT16:
        return _struct.unpack_from("<H", data, pos)[0]
    if jtype == J_INT32:
        return _struct.unpack_from("<i", data, pos)[0]
    if jtype == J_UINT32:
        return _struct.unpack_from("<I", data, pos)[0]
    if jtype == J_INT64:
        return _struct.unpack_from("<q", data, pos)[0]
    if jtype == J_UINT64:
        return _struct.unpack_from("<Q", data, pos)[0]
    if jtype == J_DOUBLE:
        return _struct.unpack_from("<d", data, pos)[0]
    if jtype == J_STRING:
        n, p = _dec_varlen(data, pos)
        raw = data[p:p + n]
        if len(raw) != n:
            raise EOFError("truncated JSON string")
        return raw.decode("utf-8")
    if jtype == J_OPAQUE:
        ftype = data[pos]
        n, p = _dec_varlen(data, pos + 1)
        raw = data[p:p + n]
        if len(raw) != n:
            raise EOFError("truncated JSON opaque value")
        if ftype == T_NEWDECIMAL:
            precision, scale = raw[0], raw[1]
            text, end = decode_newdecimal(raw, 2, precision, scale)
            if end != len(raw):
                raise ValueError("trailing bytes in JSON decimal")
            return JsonDecimal(text, precision, scale)
        return JsonOpaque(ftype, bytes(raw))
    raise ValueError(f"unsupported JSON binary type 0x{jtype:02x}")


def _dec_container(jtype: int, data: bytes, base: int):
    """Decode an object/array whose payload (element-count) starts at
    `base`. Offsets inside are relative to `base`."""
    large = jtype in (J_LARGE_OBJECT, J_LARGE_ARRAY)
    is_obj = jtype in (J_SMALL_OBJECT, J_LARGE_OBJECT)
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    inline_ok = _LARGE_INLINE if large else _SMALL_INLINE

    def field(p):
        return _struct.unpack_from(fmt, data, p)[0]

    n = field(base)
    size = field(base + w)
    if base + size > len(data):
        raise EOFError(f"JSON container size {size} exceeds buffer")
    p = base + 2 * w
    keys = []
    if is_obj:
        for _ in range(n):
            koff = field(p)
            klen = _struct.unpack_from("<H", data, p + w)[0]
            raw = data[base + koff:base + koff + klen]
            if len(raw) != klen:
                raise EOFError("truncated JSON object key")
            keys.append(raw.decode("utf-8"))
            p += w + 2
    vals = []
    for _ in range(n):
        t = data[p]
        if t in inline_ok:
            vals.append(_dec_scalar(t, data, p + 1))
        else:
            off = field(p + 1)
            if off >= size:
                raise ValueError(f"JSON value offset {off} outside "
                                 f"container of size {size}")
            if t in (J_SMALL_OBJECT, J_LARGE_OBJECT,
                     J_SMALL_ARRAY, J_LARGE_ARRAY):
                vals.append(_dec_container(t, data, base + off))
            else:
                vals.append(_dec_scalar(t, data, base + off))
        p += 1 + w
    if is_obj:
        return dict(zip(keys, vals))
    return vals


def decode(data: bytes):
    """Full binary JSON document (type byte + value) → Python value.
    An empty cell is invalid — MySQL stores SQL NULL via the row null
    bitmap, never as empty JSON bytes."""
    data = bytes(data)
    if not data:
        raise EOFError("empty JSON binary value")
    t = data[0]
    try:
        if t in (J_SMALL_OBJECT, J_LARGE_OBJECT, J_SMALL_ARRAY,
                 J_LARGE_ARRAY):
            return _dec_container(t, data, 1)
        return _dec_scalar(t, data, 1)
    except _struct.error as ex:
        # a fixed-width read past the buffer is a truncated/corrupt
        # document — surface the decode contract's error type, not a
        # struct internal (mutation-soak find)
        raise EOFError(f"truncated JSON binary value: {ex}") from ex

"""Pure-Python Protobuf wire-format codec for the outbound event frame.

Completes the reference's `protobuf` value format
(DebeziumSerializationProducer.java:60-68) without a registry or
compiled descriptors: message specs are plain dicts derived from the
frame's Spark StructType, and encoding follows the proto3 wire format —
varint/zigzag scalars, little-endian fixed 32/64, length-delimited
strings/bytes/sub-messages, non-packed repeated fields, map fields as
repeated (key=1, value=2) entry messages.

Wire-format compliance is tested against Google's own runtime: the
protobuf shaded into Spark's orc-core jar (`org.apache.orc.protobuf.
CodedInputStream`) parses bytes produced here (tests/test_protobuf_codec
.py), plus the canonical golden vectors from the encoding docs
(field 1 = 150 → `08 96 01`).

Spec shape (a "descriptor" without protoc):
    {"name": "Value", "fields": [
        {"name": "op", "number": 1, "type": "string"},
        {"name": "ts_ms", "number": 2, "type": "int64"},
        {"name": "after", "number": 3, "type": "message", "message": {...}},
        {"name": "tags", "number": 4, "type": "string", "repeated": True},
    ]}

proto3 presence: None values are simply not emitted; decode returns only
fields present on the wire (callers treat absence as null, which matches
the CDC frame's nullable-everything shape).
"""

from __future__ import annotations

import base64
import io
import struct as _struct

from pyspark.sql import types as T

_VARINT, _FIXED64, _LEN, _FIXED32 = 0, 1, 2, 5

#: Spark type → (proto type, wire type)
_SCALARS: dict[type, tuple[str, int]] = {
    T.BooleanType: ("bool", _VARINT),
    T.ByteType: ("int32", _VARINT),
    T.ShortType: ("int32", _VARINT),
    T.IntegerType: ("int32", _VARINT),
    T.LongType: ("int64", _VARINT),
    T.FloatType: ("float", _FIXED32),
    T.DoubleType: ("double", _FIXED64),
    T.StringType: ("string", _LEN),
    T.BinaryType: ("bytes", _LEN),
}

_WIRE: dict[str, int] = {
    "bool": _VARINT, "int32": _VARINT, "int64": _VARINT,
    "sint32": _VARINT, "sint64": _VARINT,
    "float": _FIXED32, "fixed32": _FIXED32,
    "double": _FIXED64, "fixed64": _FIXED64,
    "string": _LEN, "bytes": _LEN, "message": _LEN,
}


def descriptor_of(dt: T.StructType, name: str = "Record") -> dict:
    """Spark StructType → message spec; field numbers are 1-based struct
    positions (stable for a fixed schema version — schema evolution should
    append fields, same rule real .proto files live by)."""
    fields = []
    for i, f in enumerate(dt.fields, 1):
        fields.append(_field_of(f.name, i, f.dataType, f"{name}_{f.name}"))
    return {"name": name, "fields": fields}


def _field_of(fname: str, number: int, dt: T.DataType, nested: str) -> dict:
    if isinstance(dt, T.ArrayType):
        inner = _field_of(fname, number, dt.elementType, nested)
        if inner.get("repeated"):
            raise TypeError("nested repeated fields need a wrapper message")
        return {**inner, "repeated": True}
    if isinstance(dt, T.StructType):
        return {"name": fname, "number": number, "type": "message",
                "message": descriptor_of(dt, nested)}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError("protobuf map fields here require string keys")
        entry = {"name": f"{nested}_entry", "fields": [
            {"name": "key", "number": 1, "type": "string"},
            _field_of("value", 2, dt.valueType, f"{nested}_value"),
        ]}
        return {"name": fname, "number": number, "type": "map", "message": entry}
    for cls, (proto, _) in _SCALARS.items():
        if isinstance(dt, cls):
            return {"name": fname, "number": number, "type": proto}
    raise TypeError(f"no protobuf mapping for Spark type {dt.simpleString()}")


# -------------------------------------------------------------- encoding


def _write_varint(buf: io.BytesIO, n: int) -> None:
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _write_scalar(buf: io.BytesIO, proto: str, v) -> None:
    if proto == "bool":
        _write_varint(buf, 1 if v else 0)
    elif proto in ("int32", "int64"):
        _write_varint(buf, int(v))  # negatives ride as 10-byte two's complement
    elif proto in ("sint32", "sint64"):
        n = int(v)
        _write_varint(buf, (n << 1) ^ (n >> 63))
    elif proto == "float":
        buf.write(_struct.pack("<f", float(v)))
    elif proto == "double":
        buf.write(_struct.pack("<d", float(v)))
    elif proto == "string":
        raw = str(v).encode("utf-8")
        _write_varint(buf, len(raw))
        buf.write(raw)
    elif proto == "bytes":
        raw = base64.b64decode(v) if isinstance(v, str) else bytes(v)
        _write_varint(buf, len(raw))
        buf.write(raw)
    else:
        raise ValueError(f"unsupported scalar {proto!r}")


def _write_field(buf: io.BytesIO, field: dict, v) -> None:
    proto = field["type"]
    if proto == "map":
        for k, item in (v or {}).items():
            if item is None:
                continue  # proto3 maps have no absent values; None = skip
            _write_field(buf, {**field, "type": "message"},
                         {"key": k, "value": item})
        return
    values = v if field.get("repeated") else [v]
    for item in values:
        if item is None:
            continue
        if proto == "message":
            payload = encode(item, field["message"])
            _write_varint(buf, (field["number"] << 3) | _LEN)
            _write_varint(buf, len(payload))
            buf.write(payload)
        else:
            _write_varint(buf, (field["number"] << 3) | _WIRE[proto])
            _write_scalar(buf, proto, item)


def encode(value: dict | None, spec: dict) -> bytes:
    """Encode a python dict (e.g. parsed JSON) as proto3 wire bytes."""
    buf = io.BytesIO()
    for field in spec["fields"]:
        v = (value or {}).get(field["name"])
        if v is None:
            continue
        _write_field(buf, field, v)
    return buf.getvalue()


def frame_confluent(payload: bytes, schema_id: int,
                    message_indexes: tuple[int, ...] = ()) -> bytes:
    """Confluent protobuf wire framing: magic 0, big-endian schema id,
    zigzag-varint message-index path (empty path = single 0 byte)."""
    buf = io.BytesIO()
    buf.write(b"\x00")
    buf.write(_struct.pack(">I", schema_id))
    if not message_indexes:
        buf.write(b"\x00")
    else:
        _write_varint(buf, (len(message_indexes) << 1)
                      ^ (len(message_indexes) >> 63))
        for ix in message_indexes:
            _write_varint(buf, (ix << 1) ^ (ix >> 63))
    return buf.getvalue() + payload


# -------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, data: bytes):
        self.data, self.pos = bytes(data), 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def take(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated protobuf payload")
        self.pos += n
        return out

    def varint(self) -> int:
        shift = acc = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return acc
            shift += 7


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def decode(data: bytes, spec: dict) -> dict:
    """Decode wire bytes against a spec; unknown field numbers are
    skipped by wire type (forward compatibility, like real protobuf)."""
    by_number = {f["number"]: f for f in spec["fields"]}
    out: dict = {}
    r = _Reader(data)
    while not r.eof():
        key = r.varint()
        number, wire = key >> 3, key & 7
        field = by_number.get(number)
        if field is None:
            _skip(r, wire)
            continue
        v = _read_value(r, field, wire)
        if field["type"] == "map":
            out.setdefault(field["name"], {})[v["key"]] = v.get("value")
        elif field.get("repeated"):
            out.setdefault(field["name"], []).append(v)
        else:
            out[field["name"]] = v
    return out


def _read_value(r: _Reader, field: dict, wire: int):
    proto = field["type"]
    if proto in ("message", "map"):
        return decode(r.take(r.varint()), field["message"])
    if proto == "bool":
        return bool(r.varint())
    if proto in ("int32", "int64"):
        return _to_signed64(r.varint())
    if proto in ("sint32", "sint64"):
        n = r.varint()
        return (n >> 1) ^ -(n & 1)
    if proto == "float":
        return _struct.unpack("<f", r.take(4))[0]
    if proto == "double":
        return _struct.unpack("<d", r.take(8))[0]
    if proto == "string":
        return r.take(r.varint()).decode("utf-8")
    if proto == "bytes":
        return r.take(r.varint())
    raise ValueError(f"unsupported type {proto!r}")


def _skip(r: _Reader, wire: int) -> None:
    if wire == _VARINT:
        r.varint()
    elif wire == _FIXED64:
        r.take(8)
    elif wire == _LEN:
        r.take(r.varint())
    elif wire == _FIXED32:
        r.take(4)
    else:
        raise ValueError(f"cannot skip wire type {wire}")

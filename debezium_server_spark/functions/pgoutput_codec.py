"""Pure-Python codec for PostgreSQL's `pgoutput` logical-replication
wire format — the byte stream a real Debezium Postgres connector
consumes (the connector is bundled into the reference distribution at
`debezium-server-dist/pom.xml:359-389`; its decode layer is what this
module re-implements from the PUBLIC protocol documentation:
PostgreSQL "Logical Replication Message Formats", protocol version 1).

Like `avro_codec.py` / `protobuf_codec.py`, this ships BOTH directions:
a decoder (the product) and an encoder twin (the test instrument). The
encoder exists so fixtures can be generated offline and the decoder can
be property-tested round-trip without a running PostgreSQL; golden-byte
unit tests pin the wire layout independently against hand-assembled
messages taken straight from the spec, so an encoder bug cannot hide a
compensating decoder bug.

Message types implemented (protocol v1, the complete data-plane set):

  'B' Begin      — final LSN, commit timestamp (µs since 2000-01-01), xid
  'M' Message    — transactional flag, LSN, prefix, content bytes
  'C' Commit     — flags, commit LSN, end LSN, commit timestamp
  'O' Origin     — commit LSN, origin name
  'R' Relation   — OID, namespace, name, replica identity, column specs
  'Y' Type       — OID, namespace, name
  'I' Insert     — relation OID, 'N' new TupleData
  'U' Update     — relation OID, optional 'K'/'O' old tuple, 'N' new tuple
  'D' Delete     — relation OID, 'K' or 'O' old tuple
  'T' Truncate   — relation count, options, relation OIDs

plus the protocol-v2 STREAMING set (in-progress large transactions,
`streaming = on`): 'S' Stream Start (xid, first-segment flag), 'E'
Stream Stop, 'c' Stream Commit (xid + the Commit fields), 'A' Stream
Abort (xid, subtransaction xid). Between S and E, data messages carry
a leading Int32 xid — pass `in_stream=True` to `decode_message` (or
put `stream_xid` on the dict for the encoder twin). A segment is the
server's `logical_decoding_work_mem` flush unit;
`assemble_streamed_transactions` folds one captured chunk's segments
back into committed per-transaction message lists (aborts discard),

plus the protocol-v3 TWO-PHASE set (`two_phase = on` slots — PREPARE
TRANSACTION flows): 'b' Begin Prepare (prepare LSN, end LSN, prepare
ts, xid, gid), 'P' Prepare (flags + the same fields), 'K' Commit
Prepared (flags, commit LSN, end LSN, commit ts, xid, gid), 'r'
Rollback Prepared (flags, prepared-end LSN, rollback-end LSN, prepare
ts, rollback ts, xid, gid), and v4's 'p' Stream Prepare sealing a
streamed two-phase transaction. A prepared transaction MUST NOT emit
until Commit Prepared arrives — `assemble_streamed_transactions`
buffers it and Rollback Prepared discards it, mirroring the
reference connector's buffering contract.

TupleData columns are tagged 'n' (SQL NULL), 'u' (unchanged TOAST),
't' (text representation, length-prefixed) or 'b' (binary, ditto).
All integers are big-endian; strings are NUL-terminated C strings;
timestamps count microseconds from 2000-01-01 00:00:00 UTC.

Scale shape: one `decode_message` call per WAL message inside an Arrow
batch (see `sources/pgoutput_source.py`) — pure `struct` unpacking, no
per-row Python UDF row transfer, no global state. Relation metadata is
the only cross-message state and is extracted in a separate bounded
pass (|tables| rows), never threaded through the data decode.
"""

from __future__ import annotations

import struct as _struct

# Microseconds between the Unix epoch and the PostgreSQL epoch
# (2000-01-01 00:00:00 UTC) — public constant from the protocol docs.
PG_EPOCH_OFFSET_US = 946_684_800 * 1_000_000

#: Placeholder for unchanged TOASTed columns ('u' tuple tag): the WAL
#: does not ship the value, and projecting it as SQL NULL would let a
#: downstream upsert overwrite real data with NULL. This is Debezium's
#: own documented sentinel (unavailable.value.placeholder default).
UNCHANGED_TOAST_VALUE = "__debezium_unavailable_value"

# Text-format parsers for the common built-in type OIDs (pg_type.dat is
# public). Anything unmapped stays a string — lossless, like the
# reference's fallback-to-string behavior for unknown logical types.
_BOOL_OID = 16
PG_TYPE_PARSERS = {
    16: lambda s: s == "t",                  # bool
    20: int,                                  # int8
    21: int,                                  # int2
    23: int,                                  # int4
    26: int,                                  # oid
    700: float,                               # float4
    701: float,                               # float8
    25: str,                                  # text
    1043: str,                                # varchar
    1042: str,                                # bpchar
    2950: str,                                # uuid
    114: str,                                 # json (kept raw)
    3802: str,                                # jsonb (kept raw)
    1700: str,                                # numeric (kept exact as text)
    1114: str,                                # timestamp (wall-clock text)
    1184: str,                                # timestamptz
    1082: str,                                # date
}

PG_TYPE_FORMATTERS = {
    _BOOL_OID: lambda v: "t" if v else "f",
}


def _fmt_text(type_oid: int, v) -> str:
    fmt = PG_TYPE_FORMATTERS.get(type_oid)
    return fmt(v) if fmt else str(v)


def parse_text_value(type_oid: int, text: str):
    parser = PG_TYPE_PARSERS.get(type_oid)
    return parser(text) if parser else text


# Binary-format ('b' TupleData tag, the `binary = true` publication
# option) decode — PostgreSQL's per-type SEND formats (public:
# src/backend/utils/adt/*send/*recv; all integers big-endian). Decoded
# values match the text-format parsers' Python shapes (bool/int/float/
# str, numeric as EXACT text, temporals as the server's text rendering)
# so downstream projection is format-agnostic. Unmapped OIDs stay raw
# bytes — the source layer base64s them, the reference's fallback for
# unknown types. Each decoder REJECTS wrong-length payloads (a real
# capture never ships them; silence would mint wrong values).

_PG_EPOCH_DAYS = 730_120  # 2000-01-01 in proleptic-Gregorian ordinal


def _us_to_time_text(us: int) -> str:
    s, us = divmod(us, 1_000_000)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    out = f"{h:02d}:{m:02d}:{s:02d}"
    if us:
        out += f".{us:06d}".rstrip("0")
    return out


def _date_text(days_since_2000: int) -> str:
    from datetime import date as _date

    return _date.fromordinal(_PG_EPOCH_DAYS + days_since_2000).isoformat()


def _timestamp_bin_to_text(us_since_2000: int) -> str:
    days, us = divmod(us_since_2000, 86_400_000_000)
    return f"{_date_text(days)} {_us_to_time_text(us)}"


def _numeric_bin_to_text(data: bytes) -> str:
    """Binary numeric (NumericVar on the wire: ndigits, weight, sign,
    dscale, base-10000 digit groups) → exact decimal text."""
    if len(data) < 8:
        raise EOFError("truncated binary numeric header")
    ndigits, weight, sign, dscale = _struct.unpack_from(">HhHH", data, 0)
    if len(data) != 8 + 2 * ndigits:
        raise ValueError(f"binary numeric length {len(data)} != "
                         f"header + {ndigits} digit groups")
    if sign == 0xC000:
        return "NaN"
    if sign not in (0x0000, 0x4000):
        raise ValueError(f"bad numeric sign word 0x{sign:04x}")
    digits = (_struct.unpack_from(f">{ndigits}H", data, 8)
              if ndigits else ())
    if weight < 0 or not digits:
        intpart = "0"
    else:
        groups = []
        for w in range(weight, -1, -1):
            i = weight - w
            d = digits[i] if i < len(digits) else 0
            groups.append(str(d) if w == weight else f"{d:04d}")
        intpart = "".join(groups)
    text = intpart
    if dscale:
        frac = []
        for w in range(-1, -((dscale + 3) // 4) - 1, -1):
            i = weight - w
            d = digits[i] if 0 <= i < len(digits) else 0
            frac.append(f"{d:04d}")
        text += "." + "".join(frac)[:dscale]
    return ("-" if sign == 0x4000 else "") + text


def _numeric_text_to_bin(text: str) -> bytes:
    """Encoder twin of `_numeric_bin_to_text` (dscale = the text's
    fractional width, so trailing zeros survive the round trip)."""
    if text == "NaN":
        return _struct.pack(">HhHH", 0, 0, 0xC000, 0)
    neg = text.startswith("-")
    t = text.lstrip("+-")
    ip, _, fp = t.partition(".")
    dscale = len(fp)
    ip = ip.lstrip("0")
    ipp = "0" * ((-len(ip)) % 4) + ip
    int_groups = [int(ipp[i:i + 4]) for i in range(0, len(ipp), 4)]
    fpp = fp + "0" * ((-len(fp)) % 4)
    frac_groups = [int(fpp[i:i + 4]) for i in range(0, len(fpp), 4)]
    digits = int_groups + frac_groups
    weight = len(int_groups) - 1
    while digits and digits[0] == 0:  # leading zero groups
        digits.pop(0)
        weight -= 1
    while digits and digits[-1] == 0:  # trailing zero groups (dscale
        digits.pop()  # alone preserves the rendered zeros)
    if not digits:
        weight = 0
    sign = 0x4000 if (neg and digits) else 0x0000
    return (_struct.pack(">HhHH", len(digits), weight, sign, dscale)
            + b"".join(_struct.pack(">H", d) for d in digits))


def _fixed(fmt: str, data: bytes):
    if len(data) != _struct.calcsize(fmt):
        raise ValueError(f"binary value length {len(data)} != "
                         f"{_struct.calcsize(fmt)} for format {fmt!r}")
    return _struct.unpack(fmt, data)[0]


PG_BINARY_PARSERS = {
    16: lambda d: _fixed(">B", d) != 0,                       # bool
    20: lambda d: _fixed(">q", d),                            # int8
    21: lambda d: _fixed(">h", d),                            # int2
    23: lambda d: _fixed(">i", d),                            # int4
    26: lambda d: _fixed(">I", d),                            # oid
    700: lambda d: _fixed(">f", d),                           # float4
    701: lambda d: _fixed(">d", d),                           # float8
    17: lambda d: bytes(d),                                   # bytea
    19: lambda d: d.decode("utf-8"),                          # name
    25: lambda d: d.decode("utf-8"),                          # text
    1042: lambda d: d.decode("utf-8"),                        # bpchar
    1043: lambda d: d.decode("utf-8"),                        # varchar
    114: lambda d: d.decode("utf-8"),                         # json
    2950: lambda d: _uuid_bin(d),                             # uuid
    1700: _numeric_bin_to_text,                               # numeric
    1082: lambda d: _date_text(_fixed(">i", d)),              # date
    1083: lambda d: _us_to_time_text(_fixed(">q", d)),        # time
    1114: lambda d: _timestamp_bin_to_text(_fixed(">q", d)),  # timestamp
    1184: lambda d: _timestamp_bin_to_text(_fixed(">q", d)) + "+00",
    3802: lambda d: _jsonb_bin(d),                            # jsonb
}


def _require(d: bytes, n: int, what: str) -> bytes:
    if len(d) != n:
        raise ValueError(f"binary {what} must be {n} bytes, "
                         f"got {len(d)}")
    return d


def _uuid_bin(d: bytes) -> str:
    import uuid as _uuid

    return str(_uuid.UUID(bytes=bytes(_require(d, 16, "uuid"))))


def _jsonb_bin(d: bytes) -> str:
    if not d or d[0] != 1:
        raise ValueError("binary jsonb must start with version byte 1")
    return d[1:].decode("utf-8")


# Array types (array_send wire format, public: int32 ndim, int32
# has-nulls flag, int32 element OID, per-dim (size, lower bound),
# then per element int32 length (-1 = NULL) + element SEND bytes).
# Decoded to the same PG text-array literal the TEXT format ships
# ('{1,2,NULL}', quoting per array_out's rules, '[lb:ub]=' dimension
# prefix when a lower bound != 1) so downstream consumers see one
# rendering regardless of the capture's binary option.
PG_ARRAY_ELEM_OID = {
    1000: 16,    # bool[]
    1005: 21,    # int2[]
    1007: 23,    # int4[]
    1016: 20,    # int8[]
    1021: 700,   # float4[]
    1022: 701,   # float8[]
    1009: 25,    # text[]
    1015: 1043,  # varchar[]
    1014: 1042,  # bpchar[]
    2951: 2950,  # uuid[]
    1231: 1700,  # numeric[]
    1182: 1082,  # date[]
    1183: 1083,  # time[]
    1115: 1114,  # timestamp[]
    1185: 1184,  # timestamptz[]
}

_NEEDS_QUOTE = set(' {},"\\\t\n\r')


def _array_elem_text(elem_oid: int, v) -> str:
    """One element's rendering inside the array literal — array_out's
    quoting: strings quote when empty/NULL-like/containing specials,
    bools render t/f, everything else its text form."""
    if elem_oid == 16:
        return "t" if v else "f"
    s = str(v)
    if elem_oid in (25, 1042, 1043):
        if (s == "" or s.upper() == "NULL"
                or any(c in _NEEDS_QUOTE for c in s)):
            return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


def _array_bin_to_text(data: bytes) -> str:
    if len(data) < 12:
        raise EOFError("truncated binary array header")
    ndim, _flags, elem_oid = _struct.unpack_from(">iii", data, 0)
    if ndim < 0 or ndim > 6:  # MAXDIM in the server
        raise ValueError(f"bad array ndim {ndim}")
    if ndim == 0:
        if len(data) != 12:
            raise ValueError("trailing bytes after empty array")
        return "{}"
    if elem_oid not in PG_BINARY_PARSERS:
        raise ValueError(f"binary array of unmapped element OID "
                         f"{elem_oid}")
    pos = 12
    dims, lbs = [], []
    for _ in range(ndim):
        size, lb = _struct.unpack_from(">ii", data, pos)
        if size < 0:
            raise ValueError(f"bad array dimension size {size}")
        dims.append(size)
        lbs.append(lb)
        pos += 8
    count = 1
    for d in dims:
        count *= d
    elems: list[str | None] = []
    for _ in range(count):
        (n,) = _struct.unpack_from(">i", data, pos)
        pos += 4
        if n == -1:
            elems.append(None)
            continue
        raw = data[pos:pos + n]
        if len(raw) != n:
            raise EOFError("truncated binary array element")
        elems.append(_array_elem_text(
            elem_oid, PG_BINARY_PARSERS[elem_oid](raw)))
        pos += n
    if pos != len(data):
        raise ValueError("trailing bytes after binary array")

    def nest(level: int, flat: list) -> str:
        if level == ndim - 1:
            return ("{" + ",".join("NULL" if e is None else e
                                   for e in flat) + "}")
        stride = len(flat) // dims[level]
        return ("{" + ",".join(
            nest(level + 1, flat[i * stride:(i + 1) * stride])
            for i in range(dims[level])) + "}")

    text = nest(0, elems)
    if any(lb != 1 for lb in lbs):  # array_out's dimension prefix
        spec = "".join(f"[{lb}:{lb + d - 1}]"
                       for lb, d in zip(lbs, dims))
        text = spec + "=" + text
    return text


def _encode_array_elems(v, elem_oid: int, depth: int,
                        dims: list[int]) -> list[bytes | None]:
    """Flatten a (possibly nested) Python list into element payloads,
    validating rectangularity and recording dims."""
    if depth == len(dims):
        dims.append(len(v))
    elif dims[depth] != len(v):
        raise ValueError("ragged multidimensional array")
    out: list[bytes | None] = []
    for x in v:
        if isinstance(x, list):
            out += _encode_array_elems(x, elem_oid, depth + 1, dims)
        elif x is None:
            out.append(None)
        else:
            out.append(encode_binary_value(elem_oid, x))
    return out


def encode_binary_array(array_oid: int, v: list,
                        lower_bounds: list[int] | None = None) -> bytes:
    """Encoder twin for the array SEND format: nested Python list (None
    = SQL NULL element) → wire bytes."""
    elem_oid = PG_ARRAY_ELEM_OID[array_oid]
    if not v:
        return _struct.pack(">iii", 0, 0, elem_oid)
    dims: list[int] = []
    elems = _encode_array_elems(v, elem_oid, 0, dims)
    lbs = lower_bounds or [1] * len(dims)
    if len(lbs) != len(dims):
        raise ValueError("lower_bounds arity != ndim")
    out = _struct.pack(">iii", len(dims),
                       1 if any(e is None for e in elems) else 0,
                       elem_oid)
    for d, lb in zip(dims, lbs):
        out += _struct.pack(">ii", d, lb)
    for e in elems:
        if e is None:
            out += _struct.pack(">i", -1)
        else:
            out += _struct.pack(">i", len(e)) + e
    return out


def parse_binary_value(type_oid: int, data: bytes):
    """'b'-format tuple column → typed Python value (same shapes as
    `parse_text_value`); array OIDs → the PG text-array literal;
    unmapped OIDs → raw bytes (base64 at the source layer)."""
    parser = PG_BINARY_PARSERS.get(type_oid)
    if parser is not None:
        return parser(bytes(data))
    if type_oid in PG_ARRAY_ELEM_OID:
        return _array_bin_to_text(bytes(data))
    return bytes(data)


def encode_binary_value(type_oid: int, v) -> bytes:
    """Encoder twin of `parse_binary_value` for the mapped OIDs — the
    fixture/golden-test counterpart (a capture tool never needs it)."""
    if type_oid == 16:
        return b"\x01" if v else b"\x00"
    if type_oid in (20, 21, 23, 26):
        fmt = {20: ">q", 21: ">h", 23: ">i", 26: ">I"}[type_oid]
        return _struct.pack(fmt, v)
    if type_oid in (700, 701):
        return _struct.pack(">f" if type_oid == 700 else ">d", v)
    if type_oid in (17,):
        return bytes(v)
    if type_oid in (19, 25, 1042, 1043, 114):
        return str(v).encode("utf-8")
    if type_oid == 2950:
        import uuid as _uuid

        return _uuid.UUID(str(v)).bytes
    if type_oid == 1700:
        return _numeric_text_to_bin(str(v))
    if type_oid == 1082:
        from datetime import date as _date

        return _struct.pack(
            ">i", _date.fromisoformat(str(v)).toordinal() - _PG_EPOCH_DAYS)
    if type_oid == 1083:
        return _struct.pack(">q", _text_time_to_us(str(v)))
    if type_oid in (1114, 1184):
        text = str(v)
        if type_oid == 1184:
            if not text.endswith("+00"):
                raise ValueError("timestamptz text must end with +00")
            text = text[:-3]
        day_text, _, time_text = text.partition(" ")
        from datetime import date as _date

        days = _date.fromisoformat(day_text).toordinal() - _PG_EPOCH_DAYS
        return _struct.pack(
            ">q", days * 86_400_000_000 + _text_time_to_us(time_text))
    if type_oid == 3802:
        return b"\x01" + str(v).encode("utf-8")
    raise ValueError(f"no binary encoder for type OID {type_oid}")


def _text_time_to_us(text: str) -> int:
    hms, _, frac = text.partition(".")
    h, m, s = (int(x) for x in hms.split(":"))
    us = int((frac + "000000")[:6]) if frac else 0
    return ((h * 60 + m) * 60 + s) * 1_000_000 + us


# ---------------------------------------------------------------- writer


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def byte1(self, ch: str):
        self.parts.append(ch.encode("ascii"))

    def int8(self, v: int):
        self.parts.append(_struct.pack(">b", v))

    def int16(self, v: int):
        self.parts.append(_struct.pack(">h", v))

    def int32(self, v: int):
        self.parts.append(_struct.pack(">i", v))

    def int64(self, v: int):
        self.parts.append(_struct.pack(">q", v))

    def cstr(self, s: str):
        raw = s.encode("utf-8")
        if b"\x00" in raw:
            raise ValueError("NUL byte in pgoutput string")
        self.parts.append(raw + b"\x00")

    def raw(self, b: bytes):
        self.parts.append(bytes(b))

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


def _write_tuple(w: _Writer, columns: list[tuple[str, object]]):
    """columns: list of (tag, value); tag 'n'/'u' take value None,
    't' takes str, 'b' takes bytes."""
    w.int16(len(columns))
    for tag, value in columns:
        if tag in ("n", "u"):
            w.byte1(tag)
        elif tag == "t":
            raw = str(value).encode("utf-8")
            w.byte1("t")
            w.int32(len(raw))
            w.raw(raw)
        elif tag == "b":
            raw = bytes(value)
            w.byte1("b")
            w.int32(len(raw))
            w.raw(raw)
        else:
            raise ValueError(f"bad tuple column tag {tag!r}")


def encode_message(msg: dict) -> bytes:
    """Encode one pgoutput message from its dict form (the same dict
    shape `decode_message` returns). A `stream_xid` key on a data
    message emits the protocol-v2 in-stream xid prefix."""
    kind = msg["type"]
    w = _Writer()
    w.byte1(kind)
    if kind in "RYIUDTM" and "stream_xid" in msg:
        w.int32(msg["stream_xid"])
    if kind == "S":  # Stream Start (v2)
        w.int32(msg["xid"])
        w.int8(1 if msg.get("first_segment", True) else 0)
        return w.getvalue()
    if kind == "E":  # Stream Stop (v2)
        return w.getvalue()
    if kind == "c":  # Stream Commit (v2)
        w.int32(msg["xid"])
        w.int8(msg.get("flags", 0))
        w.int64(msg["commit_lsn"])
        w.int64(msg["end_lsn"])
        w.int64(msg["commit_ts_us"])
        return w.getvalue()
    if kind == "A":  # Stream Abort (v2; v4 adds abort LSN + timestamp)
        w.int32(msg["xid"])
        w.int32(msg.get("subxid", msg["xid"]))
        if "abort_lsn" in msg:
            w.int64(msg["abort_lsn"])
            w.int64(msg["abort_ts_us"])
        return w.getvalue()
    if kind == "b":  # Begin Prepare (v3)
        w.int64(msg["prepare_lsn"])
        w.int64(msg["end_lsn"])
        w.int64(msg["prepare_ts_us"])
        w.int32(msg["xid"])
        w.cstr(msg["gid"])
        return w.getvalue()
    if kind in ("P", "p"):  # Prepare (v3) / Stream Prepare (v4)
        w.int8(msg.get("flags", 0))
        w.int64(msg["prepare_lsn"])
        w.int64(msg["end_lsn"])
        w.int64(msg["prepare_ts_us"])
        w.int32(msg["xid"])
        w.cstr(msg["gid"])
        return w.getvalue()
    if kind == "K":  # Commit Prepared (v3)
        w.int8(msg.get("flags", 0))
        w.int64(msg["commit_lsn"])
        w.int64(msg["end_lsn"])
        w.int64(msg["commit_ts_us"])
        w.int32(msg["xid"])
        w.cstr(msg["gid"])
        return w.getvalue()
    if kind == "r":  # Rollback Prepared (v3)
        w.int8(msg.get("flags", 0))
        w.int64(msg["prepared_end_lsn"])
        w.int64(msg["rollback_end_lsn"])
        w.int64(msg["prepare_ts_us"])
        w.int64(msg["rollback_ts_us"])
        w.int32(msg["xid"])
        w.cstr(msg["gid"])
        return w.getvalue()
    if kind == "B":  # Begin
        w.int64(msg["final_lsn"])
        w.int64(msg["commit_ts_us"])
        w.int32(msg["xid"])
    elif kind == "M":  # logical decoding Message
        w.int8(1 if msg.get("transactional") else 0)
        w.int64(msg["lsn"])
        w.cstr(msg["prefix"])
        content = bytes(msg["content"])
        w.int32(len(content))
        w.raw(content)
    elif kind == "C":  # Commit
        w.int8(msg.get("flags", 0))
        w.int64(msg["commit_lsn"])
        w.int64(msg["end_lsn"])
        w.int64(msg["commit_ts_us"])
    elif kind == "O":  # Origin
        w.int64(msg["origin_lsn"])
        w.cstr(msg["origin_name"])
    elif kind == "R":  # Relation
        w.int32(msg["relation_oid"])
        w.cstr(msg["namespace"])
        w.cstr(msg["relation_name"])
        w.byte1(msg.get("replica_identity", "d"))
        cols = msg["columns"]
        w.int16(len(cols))
        for c in cols:
            w.int8(1 if c.get("key") else 0)
            w.cstr(c["name"])
            w.int32(c["type_oid"])
            w.int32(c.get("type_mod", -1))
    elif kind == "Y":  # Type
        w.int32(msg["type_oid"])
        w.cstr(msg["namespace"])
        w.cstr(msg["type_name"])
    elif kind == "I":  # Insert
        w.int32(msg["relation_oid"])
        w.byte1("N")
        _write_tuple(w, msg["new_tuple"])
    elif kind == "U":  # Update
        w.int32(msg["relation_oid"])
        old = msg.get("old_tuple")
        if old is not None:
            w.byte1(msg.get("old_tag", "K"))
            _write_tuple(w, old)
        w.byte1("N")
        _write_tuple(w, msg["new_tuple"])
    elif kind == "D":  # Delete
        w.int32(msg["relation_oid"])
        w.byte1(msg.get("old_tag", "K"))
        _write_tuple(w, msg["old_tuple"])
    elif kind == "T":  # Truncate
        oids = msg["relation_oids"]
        w.int32(len(oids))
        w.int8(msg.get("options", 0))
        for oid in oids:
            w.int32(oid)
    else:
        raise ValueError(f"unknown pgoutput message type {kind!r}")
    return w.getvalue()


# ---------------------------------------------------------------- reader


class _Reader:
    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated pgoutput message")
        self.pos += n
        return out

    def byte1(self) -> str:
        return self.take(1).decode("ascii")

    def int8(self) -> int:
        return _struct.unpack(">b", self.take(1))[0]

    def int16(self) -> int:
        return _struct.unpack(">h", self.take(2))[0]

    def int32(self) -> int:
        return _struct.unpack(">i", self.take(4))[0]

    def int64(self) -> int:
        return _struct.unpack(">q", self.take(8))[0]

    def cstr(self) -> str:
        end = self.data.index(b"\x00", self.pos)
        out = self.data[self.pos:end].decode("utf-8")
        self.pos = end + 1
        return out

    def done(self) -> bool:
        return self.pos == len(self.data)


def _read_tuple(r: _Reader) -> list[tuple[str, object]]:
    n = r.int16()
    cols: list[tuple[str, object]] = []
    for _ in range(n):
        tag = r.byte1()
        if tag in ("n", "u"):
            cols.append((tag, None))
        elif tag == "t":
            cols.append(("t", r.take(r.int32()).decode("utf-8")))
        elif tag == "b":
            cols.append(("b", r.take(r.int32())))
        else:
            raise ValueError(f"bad tuple column tag {tag!r}")
    return cols


def decode_message(data: bytes, in_stream: bool = False,
                   protocol_version: int = 2) -> dict:
    """Decode one pgoutput message to a dict (inverse of
    `encode_message`). Trailing garbage raises — a message is exactly
    one WAL record's payload. `in_stream=True` reads the protocol-v2
    Int32 xid prefix data messages carry between Stream Start/Stop.

    `protocol_version` is the version negotiated in START_REPLICATION
    (`proto_version` option) and gates version-dependent layouts
    EXPLICITLY: a v4 server always ships abort LSN + timestamp on
    Stream Abort, a v2/v3 server never does. Residual-length
    inference would let a corrupt v2 abort with 16 trailing bytes
    silently misparse as v4 fields."""
    r = _Reader(data)
    kind = r.byte1()
    stream_xid = None
    if in_stream and kind in "RYIUDTM":
        stream_xid = r.int32()
    if kind == "S":
        out = {"type": "S", "xid": r.int32(),
               "first_segment": bool(r.int8())}
        if not r.done():
            raise ValueError("trailing bytes after S message")
        return out
    if kind == "E":
        if not r.done():
            raise ValueError("trailing bytes after E message")
        return {"type": "E"}
    if kind == "c":
        out = {"type": "c", "xid": r.int32(), "flags": r.int8(),
               "commit_lsn": r.int64(), "end_lsn": r.int64(),
               "commit_ts_us": r.int64()}
        if not r.done():
            raise ValueError("trailing bytes after c message")
        return out
    if kind == "A":
        out = {"type": "A", "xid": r.int32(), "subxid": r.int32()}
        if protocol_version >= 4:  # v4: abort LSN + abort timestamp,
            out["abort_lsn"] = r.int64()   # always present
            out["abort_ts_us"] = r.int64()
        if not r.done():
            raise ValueError("trailing bytes after A message")
        return out
    if kind == "b":
        out = {"type": "b", "prepare_lsn": r.int64(),
               "end_lsn": r.int64(), "prepare_ts_us": r.int64(),
               "xid": r.int32(), "gid": r.cstr()}
        if not r.done():
            raise ValueError("trailing bytes after b message")
        return out
    if kind in ("P", "p"):
        out = {"type": kind, "flags": r.int8(),
               "prepare_lsn": r.int64(), "end_lsn": r.int64(),
               "prepare_ts_us": r.int64(), "xid": r.int32(),
               "gid": r.cstr()}
        if not r.done():
            raise ValueError(f"trailing bytes after {kind} message")
        return out
    if kind == "K":
        out = {"type": "K", "flags": r.int8(), "commit_lsn": r.int64(),
               "end_lsn": r.int64(), "commit_ts_us": r.int64(),
               "xid": r.int32(), "gid": r.cstr()}
        if not r.done():
            raise ValueError("trailing bytes after K message")
        return out
    if kind == "r":
        out = {"type": "r", "flags": r.int8(),
               "prepared_end_lsn": r.int64(),
               "rollback_end_lsn": r.int64(),
               "prepare_ts_us": r.int64(), "rollback_ts_us": r.int64(),
               "xid": r.int32(), "gid": r.cstr()}
        if not r.done():
            raise ValueError("trailing bytes after r message")
        return out
    if kind == "B":
        out = {"type": "B", "final_lsn": r.int64(),
               "commit_ts_us": r.int64(), "xid": r.int32()}
    elif kind == "M":
        out = {"type": "M", "transactional": bool(r.int8()),
               "lsn": r.int64(), "prefix": r.cstr()}
        out["content"] = r.take(r.int32())
    elif kind == "C":
        out = {"type": "C", "flags": r.int8(), "commit_lsn": r.int64(),
               "end_lsn": r.int64(), "commit_ts_us": r.int64()}
    elif kind == "O":
        out = {"type": "O", "origin_lsn": r.int64(),
               "origin_name": r.cstr()}
    elif kind == "R":
        out = {"type": "R", "relation_oid": r.int32(),
               "namespace": r.cstr(), "relation_name": r.cstr(),
               "replica_identity": r.byte1()}
        ncols = r.int16()
        out["columns"] = [
            {"key": bool(r.int8()), "name": r.cstr(),
             "type_oid": r.int32(), "type_mod": r.int32()}
            for _ in range(ncols)
        ]
    elif kind == "Y":
        out = {"type": "Y", "type_oid": r.int32(),
               "namespace": r.cstr(), "type_name": r.cstr()}
    elif kind == "I":
        out = {"type": "I", "relation_oid": r.int32()}
        tag = r.byte1()
        if tag != "N":
            raise ValueError(f"Insert expects 'N' tuple, got {tag!r}")
        out["new_tuple"] = _read_tuple(r)
    elif kind == "U":
        out = {"type": "U", "relation_oid": r.int32()}
        tag = r.byte1()
        if tag in ("K", "O"):
            out["old_tag"] = tag
            out["old_tuple"] = _read_tuple(r)
            tag = r.byte1()
        if tag != "N":
            raise ValueError(f"Update expects 'N' tuple, got {tag!r}")
        out["new_tuple"] = _read_tuple(r)
    elif kind == "D":
        out = {"type": "D", "relation_oid": r.int32()}
        tag = r.byte1()
        if tag not in ("K", "O"):
            raise ValueError(f"Delete expects 'K'/'O' tuple, got {tag!r}")
        out["old_tag"] = tag
        out["old_tuple"] = _read_tuple(r)
    elif kind == "T":
        n = r.int32()
        out = {"type": "T", "options": r.int8()}
        out["relation_oids"] = [r.int32() for _ in range(n)]
    else:
        raise ValueError(f"unknown pgoutput message type {kind!r}")
    if not r.done():
        raise ValueError(
            f"{len(r.data) - r.pos} trailing bytes after {kind} message")
    if stream_xid is not None:
        out["stream_xid"] = stream_xid
    return out


def assemble_streamed_transactions(raw_messages: list[bytes],
                                   protocol_version: int = 2
                                   ) -> dict[int, dict]:
    """Fold ONE captured WAL chunk's protocol-v2 stream back into
    whole transactions: interleaved S..E segments accumulate per xid,
    'c' seals {xid: {"commit": <c msg>, "messages": [data dicts]}},
    'A' discards. This is a sequential per-chunk operation BY DESIGN —
    a chunk is the bounded unit a capture task tails (segments are
    `logical_decoding_work_mem` flushes, and the server interleaves
    segments, not messages), so the fold runs inside one task per
    chunk, never as a cluster-wide sort. Committed v1 transactions in
    the same chunk (B..C) pass through under the Begin's xid."""
    open_segments: dict[int, list[dict]] = {}
    current: int | None = None
    committed: dict[int, dict] = {}
    #: v3 two-phase: PREPAREd-but-undecided transactions buffer here —
    #: they must not emit until Commit Prepared; Rollback Prepared
    #: discards. A 'K'/'r' whose xid was prepared in an EARLIER chunk
    #: is out of this chunk's scope (the chunk-contained model v2
    #: streams already have) and is ignored; a capture task feeding
    #: this fold keeps prepare+decision in one chunk.
    prepared: dict[int, dict] = {}
    v1_xid: int | None = None
    for raw in raw_messages:
        kind = bytes(raw)[:1].decode("ascii")
        if kind == "b":  # Begin Prepare: opens like Begin
            m = decode_message(raw)
            v1_xid = m["xid"]
            open_segments.setdefault(v1_xid, [])
            continue
        if kind in ("P", "p"):  # Prepare / Stream Prepare: seal, hold
            m = decode_message(raw)
            prepared[m["xid"]] = {
                "prepare": m,
                "messages": open_segments.pop(m["xid"], [])}
            if v1_xid == m["xid"]:
                v1_xid = None
            continue
        if kind == "K":  # Commit Prepared: NOW the txn emits
            m = decode_message(raw)
            if m["xid"] in prepared:
                held = prepared.pop(m["xid"])
                committed[m["xid"]] = {"commit": m,
                                       "prepare": held["prepare"],
                                       "messages": held["messages"]}
            continue
        if kind == "r":  # Rollback Prepared: discard
            m = decode_message(raw)
            prepared.pop(m["xid"], None)
            continue
        if kind == "S":
            m = decode_message(raw)
            current = m["xid"]
            open_segments.setdefault(current, [])
            continue
        if kind == "E":
            decode_message(raw)
            current = None
            continue
        if kind == "c":
            m = decode_message(raw)
            committed[m["xid"]] = {
                "commit": m,
                "messages": open_segments.pop(m["xid"], [])}
            continue
        if kind == "A":
            m = decode_message(raw, protocol_version=protocol_version)
            if m["subxid"] == m["xid"]:
                # toplevel abort: the whole transaction vanishes
                open_segments.pop(m["xid"], None)
            else:
                # SUBTRANSACTION abort (savepoint rollback): discard
                # only that subxid's messages; the toplevel keeps the
                # rest and may still commit (protocol: in-stream data
                # messages carry their own — possibly sub — xid)
                if m["xid"] in open_segments:
                    open_segments[m["xid"]] = [
                        msg for msg in open_segments[m["xid"]]
                        if msg.get("stream_xid") != m["subxid"]]
            continue
        if kind == "B":
            m = decode_message(raw)
            v1_xid = m["xid"]
            open_segments.setdefault(v1_xid, [])
            continue
        if kind == "C":
            m = decode_message(raw)
            if v1_xid is not None:
                committed[v1_xid] = {
                    "commit": m,
                    "messages": open_segments.pop(v1_xid, [])}
                v1_xid = None
            continue
        m = decode_message(raw, in_stream=current is not None)
        if current is not None:
            # file under the TOPLEVEL xid (the segment owner): the
            # message's own stream_xid may be a subtransaction id,
            # kept on the dict so a subxid abort can excise it
            open_segments.setdefault(current, []).append(m)
        elif v1_xid is not None:
            open_segments.setdefault(v1_xid, []).append(m)
    return committed


# ----------------------------------------------------- typed projection


def tuple_to_dict(relation: dict, tup: list[tuple[str, object]],
                  unchanged_marker=None) -> dict:
    """Project a TupleData against its Relation metadata into a
    {column: typed value} dict. 'n' → None, 'u' (unchanged TOAST) →
    `unchanged_marker`, 't' → parsed per type OID, 'b' → typed decode
    of the binary SEND format (`parse_binary_value`; unmapped OIDs
    stay raw bytes)."""
    cols = relation["columns"]
    if len(tup) != len(cols):
        raise ValueError(
            f"tuple arity {len(tup)} != relation arity {len(cols)} "
            f"for {relation['relation_name']}")
    out = {}
    for spec, (tag, value) in zip(cols, tup):
        if tag == "n":
            out[spec["name"]] = None
        elif tag == "u":
            out[spec["name"]] = unchanged_marker
        elif tag == "t":
            out[spec["name"]] = parse_text_value(spec["type_oid"], value)
        else:  # 'b': binary SEND format, typed decode per OID
            out[spec["name"]] = parse_binary_value(spec["type_oid"],
                                                   value)
    return out


def dict_to_tuple(relation: dict, values: dict,
                  key_only: bool = False) -> list[tuple[str, object]]:
    """Encoder-twin helper: {column: value} → TupleData columns in
    relation order. With `key_only`, non-key columns are emitted as
    NULL — the shape of a replica-identity-default 'K' old tuple."""
    cols: list[tuple[str, object]] = []
    for spec in relation["columns"]:
        if key_only and not spec.get("key"):
            cols.append(("n", None))
            continue
        v = values.get(spec["name"])
        if v is None:
            cols.append(("n", None))
        elif isinstance(v, (bytes, bytearray)):
            cols.append(("b", bytes(v)))
        else:
            cols.append(("t", _fmt_text(spec["type_oid"], v)))
    return cols


def pg_ts_to_unix_us(commit_ts_us: int) -> int:
    """pgoutput commit timestamp (µs since 2000-01-01) → Unix µs."""
    return commit_ts_us + PG_EPOCH_OFFSET_US


def unix_us_to_pg_ts(unix_us: int) -> int:
    return unix_us - PG_EPOCH_OFFSET_US

"""Pure-Python codec for the MySQL binary log (binlog v4, ROW format) —
the wire format the reference's bundled MySQL connector tails
(SURVEY.md §2.1; `debezium-server-dist/pom.xml` connector set). Built
from the PUBLIC format documentation (MySQL Internals: "Binary Log
File Format" / dev.mysql.com replication protocol), with the encoder
twin + golden-byte + fuzz discipline of `pgoutput_codec.py` /
`bson_codec.py`.

Events implemented (the ROW-replication data plane):

  FORMAT_DESCRIPTION (0x0f)  binlog version, server version, header len
  QUERY              (0x02)  used for BEGIN statements
  TABLE_MAP          (0x13)  table_id → schema/table/column types+meta
  WRITE_ROWS v2      (0x1e)  inserts: rows of (null bitmap, values)
  UPDATE_ROWS v2     (0x1f)  updates: (before image, after image) pairs
  DELETE_ROWS v2     (0x20)  deletes: before images
  XID                (0x10)  transaction commit marker
  GTID               (0x21)  global transaction id (flags, SID uuid,
                             GNO) — the offset currency Debezium's
                             MySQL connector records for resumability
  TRANSACTION_PAYLOAD(0x28)  binlog_transaction_compression=ON
                             (MySQL 8.0.20+): the WHOLE transaction's
                             events (TABLE_MAP + ROWS + XID, framed,
                             checksum-free) ride inside one event,
                             zstd-compressed. Body = TLV header
                             fields, each `type(lenenc) len(lenenc)
                             value(lenenc int)`: 2 = compression type
                             (0 ZSTD, 255 NONE), 3 = uncompressed
                             size, 1 = payload size; a bare type 0
                             ends the header and the payload bytes
                             follow. Decode recurses into the inner
                             events with a payload-local TABLE_MAP
                             registry (a compressed transaction is
                             self-contained by construction).

Common event header (19 bytes, all little-endian): timestamp(4),
type(1), server_id(4), event_size(4), log_pos(4), flags(2). Both
documented checksum modes are supported: binlog_checksum=NONE (bare
frames) and =CRC32 (`checksum=True`: a CRC32 of header+body appended,
included in event_size, verified on decode — the modern server
default).

Column types supported: TINY/SHORT/INT24/LONG/LONGLONG (signed LE),
FLOAT/DOUBLE, VARCHAR (1- or 2-byte length by max-length metadata),
BLOB (metadata-sized length prefix), DATE (bit-packed 3 bytes),
NEWDECIMAL (the packed base-10^9 format — groups of 9 digits in 4
big-endian bytes, partial leading groups in fewer, sign bit XORed
into the first byte, negative values stored complemented; decoded to
an EXACT decimal string, never a float), and the -2 temporals
DATETIME2 / TIMESTAMP2 / TIME2 (bit-packed big-endian with
metadata-driven fractional-second bytes), ENUM/SET ordinals/bitmasks
(direct codes from the twin, or hidden inside MYSQL_TYPE_STRING's
packed 2-byte metadata the way real servers ship them), STRING/CHAR
(packed Field_string metadata, 1-/2-byte length-prefixed cells), BIT
(big-endian packed, (bits%8, bits//8) metadata), YEAR (year-1900
byte), the pre-5.6.4 temporals TIMESTAMP/DATETIME/TIME (unix-seconds
int4 / packed-decimal int8 / signed HHMMSS int3 — columns created
before an upgrade keep them), JSON (the binary JSON cell format — length-prefixed documents
decoded by `functions/mysql_jsonb.py`), and GEOMETRY (length-prefixed
4-byte SRID + WKB → `GeoValue`; `type_conversions.wkb_point_xy` reads
the WKB side). NULLs ride the per-row null bitmap. Unknown type codes
raise.
"""

from __future__ import annotations

import struct as _struct
import zlib

MAGIC = b"\xfebin"

# event type codes
FORMAT_DESCRIPTION_EVENT = 0x0F
QUERY_EVENT = 0x02
TABLE_MAP_EVENT = 0x13
WRITE_ROWS_EVENT_V2 = 0x1E
UPDATE_ROWS_EVENT_V2 = 0x1F
DELETE_ROWS_EVENT_V2 = 0x20
XID_EVENT = 0x10
GTID_LOG_EVENT = 0x21
ROTATE_EVENT = 0x04  # next-file pointer: Int64 LE position + name
TRANSACTION_PAYLOAD_EVENT = 0x28

# MariaDB dialect events (0xA0-0xA4 — MariaDB KB "Replication
# Protocol"; the reference bundles MariaDB as a first-class connector,
# debezium-server-dist/pom.xml:359-389). MariaDB replaces MySQL's
# GTID_LOG_EVENT with its own (domain-server-seqno identity), logs a
# GTID_LIST at the head of each binlog, optionally ANNOTATEs row
# events with their source SQL, checkpoints the oldest needed binlog,
# and marks the switch to encrypted events:
ANNOTATE_ROWS_EVENT = 0xA0          # body = the statement's SQL text
BINLOG_CHECKPOINT_EVENT = 0xA1      # u32 LE name length + filename
MARIADB_GTID_EVENT = 0xA2           # seqno u64, domain u32, flags2 u8,
#                                     [commit_id u64 if flags2 & 2];
#                                     server_id rides the frame header
MARIADB_GTID_LIST_EVENT = 0xA3      # u32 LE count (lower 28 bits; top
#                                     4 = flags), then count ×
#                                     (domain u32, server u32, seq u64)
START_ENCRYPTION_EVENT = 0xA4       # scheme u8, key_version u32 LE,
#                                     nonce (12 bytes); later events
#                                     are ENCRYPTED — undecodable
#                                     without the key file

# MariaDB GTID flags2 bits
FL_STANDALONE = 0x01       # not a transaction (no XID/COMMIT follows)
FL_GROUP_COMMIT_ID = 0x02  # commit_id field present

# TLV field types of the TRANSACTION_PAYLOAD header
_OTW_HEADER_END, _OTW_PAYLOAD_SIZE = 0, 1
_OTW_COMPRESSION_TYPE, _OTW_UNCOMPRESSED_SIZE = 2, 3
# binary_log::transaction::compression::type
COMPRESSION_ZSTD, COMPRESSION_NONE = 0, 255

# MYSQL_TYPE_* codes
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 1, 2, 3, 4, 5
T_LONGLONG, T_INT24 = 8, 9
T_DATE = 10
T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 17, 18, 19
T_NEWDECIMAL = 246
T_ENUM, T_SET = 247, 248  # raw-type codes (inside STRING metadata on
#                            real servers; the twin uses them directly)
T_VARCHAR, T_BLOB = 15, 252
T_JSON = 245  # binary JSON cell (functions/mysql_jsonb.py layout);
#               metadata = length-prefix width in bytes (server: 4)
T_GEOMETRY = 255  # length-prefixed (meta bytes, server: 4) cell of
#                   MySQL's internal geometry value: 4-byte LE SRID +
#                   standard WKB — decoded to GeoValue(srid, wkb)
T_BIT = 16    # metadata (bits%8, bits//8) per Field_bit; cell is the
#               value big-endian in ceil(bits/8) bytes → int
# pre-5.6.4 temporal encodings (columns created before an upgrade
# keep them; Debezium's connector still decodes them):
T_TIMESTAMP = 7   # 4-byte LE unix seconds → int epoch seconds
T_DATETIME = 12   # 8-byte LE integer YYYYMMDDHHMMSS → text
T_TIME = 11       # 3-byte LE integer HHMMSS (sign via magnitude) → text
T_YEAR = 13   # 1 byte, year-1900 (0 encodes YEAR '0000') → int year
T_STRING = 254  # CHAR(n) — and the REAL servers' carrier for ENUM/
#                 SET: TABLE_MAP metadata is the packed 2-byte form of
#                 Field_string::do_save_field_metadata (byte0 =
#                 real_type ^ ((maxlen & 0x300) >> 4), byte1 = maxlen
#                 & 0xff); decode resolves ENUM/SET back to
#                 T_ENUM/T_SET col specs. Cell: length-prefixed bytes
#                 (1-byte prefix when maxlen < 256, else 2)

_INT_SIZES = {T_TINY: 1, T_SHORT: 2, T_INT24: 3, T_LONG: 4, T_LONGLONG: 8}

# ------------------------------------------------- NEWDECIMAL packing
# Base-10^9 groups: 9 decimal digits per 4 big-endian bytes; a partial
# leading/trailing group uses the fewest bytes that hold it. The first
# byte's MSB is the sign (1 = non-negative after the XOR) and negative
# values are stored as the bitwise complement of the positive image.

_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _dec_digits_to_bytes(digits: str, width: int) -> bytes:
    """Left-zero-padded digit string → big-endian packed groups."""
    digits = digits.rjust(width, "0")
    lead = width % 9
    out = b""
    if lead:
        out += int(digits[:lead] or "0").to_bytes(_DIG2BYTES[lead], "big")
    for i in range(lead, width, 9):
        out += int(digits[i:i + 9]).to_bytes(4, "big")
    return out


def _dec_bytes_to_digits(data: bytes, pos: int, width: int) -> tuple[str, int]:
    lead = width % 9
    digits = ""
    if lead:
        n = _DIG2BYTES[lead]
        digits += str(int.from_bytes(data[pos:pos + n], "big")).rjust(lead, "0")
        pos += n
    for _ in range(width // 9):
        digits += str(int.from_bytes(data[pos:pos + 4], "big")).rjust(9, "0")
        pos += 4
    return digits, pos


def encode_newdecimal(value: str, precision: int, scale: int) -> bytes:
    """Exact decimal string ('-1234567890.1234') → wire bytes."""
    s = str(value).strip()
    neg = s.startswith("-")
    s = s.lstrip("+-")
    intpart, _, frac = s.partition(".")
    intpart = (intpart or "0").lstrip("0") or "0"
    frac = (frac + "0" * scale)[:scale]
    int_width = precision - scale
    if len(intpart) > int_width and intpart != "0":
        raise ValueError(f"{value!r} overflows DECIMAL({precision},{scale})")
    raw = bytearray(_dec_digits_to_bytes(intpart, int_width)
                    + _dec_digits_to_bytes(frac, scale)
                    if scale else _dec_digits_to_bytes(intpart, int_width))
    if neg:
        raw = bytearray(b ^ 0xFF for b in raw)
    raw[0] ^= 0x80  # sign bit: 1 = non-negative
    return bytes(raw)


def decode_newdecimal(data: bytes, pos: int, precision: int,
                      scale: int) -> tuple[str, int]:
    int_width = precision - scale
    size = (_DIG2BYTES[int_width % 9] + 4 * (int_width // 9)
            + _DIG2BYTES[scale % 9] + 4 * (scale // 9))
    raw = bytearray(data[pos:pos + size])
    if len(raw) != size:
        raise EOFError("truncated NEWDECIMAL")
    raw[0] ^= 0x80
    neg = bool(raw[0] & 0x80)
    if neg:
        raw = bytearray(b ^ 0xFF for b in raw)
    intpart, p2 = _dec_bytes_to_digits(bytes(raw), 0, int_width)
    frac, _ = _dec_bytes_to_digits(bytes(raw), p2, scale)
    out = (intpart.lstrip("0") or "0") + (("." + frac) if scale else "")
    return ("-" + out if neg and out != "0" else out), pos + size


# ------------------------------------------------- temporal2 packing


def _frac_bytes(fsp: int) -> int:
    return (fsp + 1) // 2


def _enc_frac(micros: int, fsp: int) -> bytes:
    n = _frac_bytes(fsp)
    if not n:
        return b""
    return (micros // 10 ** (6 - 2 * n)).to_bytes(n, "big")


def _dec_frac(data: bytes, pos: int, fsp: int) -> tuple[int, int]:
    n = _frac_bytes(fsp)
    if not n:
        return 0, pos
    return (int.from_bytes(data[pos:pos + n], "big") * 10 ** (6 - 2 * n),
            pos + n)


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes((n,))
    if n < 1 << 16:
        return b"\xfc" + _struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + _struct.pack("<I", n)[:3]
    return b"\xfe" + _struct.pack("<Q", n)


def _read_lenenc(data: bytes, pos: int) -> tuple[int, int]:
    b = data[pos]
    if b < 0xFB:
        return b, pos + 1
    if b == 0xFC:
        return _struct.unpack("<H", data[pos + 1:pos + 3])[0], pos + 3
    if b == 0xFD:
        return (_struct.unpack("<I", data[pos + 1:pos + 4] + b"\x00")[0],
                pos + 4)
    if b == 0xFE:
        return _struct.unpack("<Q", data[pos + 1:pos + 9])[0], pos + 9
    raise ValueError(f"bad length-encoded integer lead byte 0x{b:02x}")


def _bitmap(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def _read_bitmap(data: bytes, pos: int, n: int) -> tuple[list[bool], int]:
    nbytes = (n + 7) // 8
    raw = data[pos:pos + nbytes]
    if len(raw) != nbytes:
        raise EOFError("truncated bitmap")
    return [bool(raw[i // 8] >> (i % 8) & 1) for i in range(n)], pos + nbytes


# ---------------------------------------------------------- cell codec


class GeoValue:
    """GEOMETRY cell: MySQL's internal value = 4-byte LE SRID + WKB.
    Kept as (srid, wkb bytes) — byte-faithful for the encoder twin;
    `functions/type_conversions.wkb_point_xy` reads the WKB side."""

    __slots__ = ("srid", "wkb")

    def __init__(self, srid: int, wkb: bytes):
        self.srid = int(srid)
        self.wkb = bytes(wkb)

    def __eq__(self, other):
        return (isinstance(other, GeoValue)
                and (self.srid, self.wkb) == (other.srid, other.wkb))

    def __repr__(self):
        return f"GeoValue(srid={self.srid}, wkb={self.wkb.hex()})"


def _enc_value(col: dict, v) -> bytes:
    t = col["type"]
    if t in _INT_SIZES:
        size = _INT_SIZES[t]
        return int(v).to_bytes(size, "little", signed=True)
    if t == T_FLOAT:
        return _struct.pack("<f", float(v))
    if t == T_DOUBLE:
        return _struct.pack("<d", float(v))
    if t == T_VARCHAR:
        raw = str(v).encode("utf-8")
        if col.get("meta", 0) > 255:
            return _struct.pack("<H", len(raw)) + raw
        return bytes((len(raw),)) + raw
    if t == T_BLOB:
        raw = bytes(v)
        nbytes = col.get("meta", 2)
        return len(raw).to_bytes(nbytes, "little") + raw
    if t == T_JSON:
        # the cell is a length-prefixed binary JSON document; the twin
        # takes the Python value (dict/list/scalar/JsonDecimal/...)
        from debezium_server_spark.functions import mysql_jsonb
        raw = mysql_jsonb.encode(v)
        nbytes = col.get("meta", 4)
        return len(raw).to_bytes(nbytes, "little") + raw
    if t == T_GEOMETRY:
        raw = v.srid.to_bytes(4, "little") + v.wkb
        nbytes = col.get("meta", 4)
        return len(raw).to_bytes(nbytes, "little") + raw
    if t == T_NEWDECIMAL:
        precision, scale = col["meta"]
        return encode_newdecimal(str(v), precision, scale)
    if t in (T_ENUM, T_SET):
        # ENUM: 1- or 2-byte unsigned ordinal (1-based; 0 = invalid);
        # SET: pack-length-byte little-endian member bitmask
        return int(v).to_bytes(col.get("meta", 1), "little")
    if t == T_STRING:
        maxlen = col["meta"][1] if isinstance(col.get("meta"),
                                              tuple) else col["meta"]
        raw = str(v).encode("utf-8")
        if maxlen > 255:
            return _struct.pack("<H", len(raw)) + raw
        return bytes((len(raw),)) + raw
    if t == T_BIT:
        nbits = col.get("meta", 1)
        return int(v).to_bytes((nbits + 7) // 8, "big")
    if t == T_YEAR:
        y = int(v)
        return bytes(((y - 1900) if y else 0,))
    if t == T_TIMESTAMP:
        return int(v).to_bytes(4, "little")
    if t == T_DATETIME:
        date_s, _, time_s = str(v).partition(" ")
        y, mo, d = (int(x) for x in date_s.split("-"))
        h, mi, s = (int(x) for x in time_s.split(":"))
        packed = ((y * 10000 + mo * 100 + d) * 1000000
                  + h * 10000 + mi * 100 + s)
        return packed.to_bytes(8, "little")
    if t == T_TIME:
        text = str(v)
        neg = text.startswith("-")
        h, mi, s = (int(x) for x in text.lstrip("-").split(":"))
        packed = h * 10000 + mi * 100 + s
        return (-packed if neg else packed).to_bytes(
            3, "little", signed=True)
    if t == T_DATE:
        y, m, d = (int(x) for x in str(v).split("-"))
        return ((y << 9) | (m << 5) | d).to_bytes(3, "little")
    if t == T_DATETIME2:
        fsp = col.get("meta", 0)
        date_s, _, time_s = str(v).partition(" ")
        y, mo, d = (int(x) for x in date_s.split("-"))
        hms, _, frac = time_s.partition(".")
        h, mi, s = (int(x) for x in hms.split(":"))
        micros = int((frac + "000000")[:6]) if frac else 0
        packed = ((1 << 39) | ((y * 13 + mo) << 22) | (d << 17)
                  | (h << 12) | (mi << 6) | s)
        return packed.to_bytes(5, "big") + _enc_frac(micros, fsp)
    if t == T_TIMESTAMP2:
        fsp = col.get("meta", 0)
        micros = int(v)  # epoch µs, the engine's timestamp currency
        return (micros // 1_000_000).to_bytes(4, "big") \
            + _enc_frac(micros % 1_000_000, fsp)
    if t == T_TIME2:
        fsp = col.get("meta", 0)
        sv = str(v)
        if sv.startswith("-"):
            raise ValueError("negative TIME2 not supported")
        hms, _, frac = sv.partition(".")
        h, mi, s = (int(x) for x in hms.split(":"))
        micros = int((frac + "000000")[:6]) if frac else 0
        packed = (1 << 23) | (h << 12) | (mi << 6) | s
        return packed.to_bytes(3, "big") + _enc_frac(micros, fsp)
    raise ValueError(f"unsupported column type {t}")


def _take(data: bytes, pos: int, n: int) -> bytes:
    """Short reads raise instead of silently yielding truncated ints —
    without this, trailing garbage (e.g. an unverified CRC32 footer)
    parses as a phantom row with fabricated values."""
    out = data[pos:pos + n]
    if len(out) != n:
        raise EOFError(f"truncated value: wanted {n} bytes at {pos}, "
                       f"had {len(out)}")
    return out


def _dec_value(col: dict, data: bytes, pos: int) -> tuple[object, int]:
    t = col["type"]
    if t in _INT_SIZES:
        size = _INT_SIZES[t]
        return (int.from_bytes(_take(data, pos, size), "little",
                               signed=True), pos + size)
    if t == T_FLOAT:
        return _struct.unpack("<f", _take(data, pos, 4))[0], pos + 4
    if t == T_DOUBLE:
        return _struct.unpack("<d", _take(data, pos, 8))[0], pos + 8
    if t == T_VARCHAR:
        if col.get("meta", 0) > 255:
            n = _struct.unpack("<H", _take(data, pos, 2))[0]
            pos += 2
        else:
            n = _take(data, pos, 1)[0]
            pos += 1
        return _take(data, pos, n).decode("utf-8"), pos + n
    if t == T_BLOB:
        nbytes = col.get("meta", 2)
        n = int.from_bytes(_take(data, pos, nbytes), "little")
        pos += nbytes
        return _take(data, pos, n), pos + n
    if t == T_STRING:
        maxlen = col["meta"][1] if isinstance(col.get("meta"),
                                              tuple) else col["meta"]
        if maxlen > 255:
            n = _struct.unpack("<H", _take(data, pos, 2))[0]
            pos += 2
        else:
            n = _take(data, pos, 1)[0]
            pos += 1
        return _take(data, pos, n).decode("utf-8"), pos + n
    if t == T_BIT:
        nbits = col.get("meta", 1)
        nbytes = (nbits + 7) // 8
        return int.from_bytes(_take(data, pos, nbytes), "big"), \
            pos + nbytes
    if t == T_YEAR:
        b = _take(data, pos, 1)[0]
        return (b + 1900 if b else 0), pos + 1
    if t == T_TIMESTAMP:
        return int.from_bytes(_take(data, pos, 4), "little"), pos + 4
    if t == T_DATETIME:
        packed = int.from_bytes(_take(data, pos, 8), "little")
        date_part, time_part = divmod(packed, 1000000)
        y, md = divmod(date_part, 10000)
        mo, d = divmod(md, 100)
        h, ms = divmod(time_part, 10000)
        mi, s = divmod(ms, 100)
        return (f"{y:04d}-{mo:02d}-{d:02d} "
                f"{h:02d}:{mi:02d}:{s:02d}"), pos + 8
    if t == T_TIME:
        packed = int.from_bytes(_take(data, pos, 3), "little",
                                signed=True)
        sign = "-" if packed < 0 else ""
        packed = abs(packed)
        h, ms = divmod(packed, 10000)
        mi, s = divmod(ms, 100)
        return f"{sign}{h:02d}:{mi:02d}:{s:02d}", pos + 3
    if t == T_JSON:
        from debezium_server_spark.functions import mysql_jsonb
        nbytes = col.get("meta", 4)
        n = int.from_bytes(_take(data, pos, nbytes), "little")
        pos += nbytes
        return mysql_jsonb.decode(_take(data, pos, n)), pos + n
    if t == T_GEOMETRY:
        nbytes = col.get("meta", 4)
        n = int.from_bytes(_take(data, pos, nbytes), "little")
        pos += nbytes
        raw = _take(data, pos, n)
        if n < 4:
            raise EOFError("GEOMETRY cell shorter than its SRID prefix")
        return (GeoValue(int.from_bytes(raw[:4], "little"), raw[4:]),
                pos + n)
    if t == T_NEWDECIMAL:
        precision, scale = col["meta"]
        return decode_newdecimal(data, pos, precision, scale)
    if t in (T_ENUM, T_SET):
        n = col.get("meta", 1)
        return int.from_bytes(_take(data, pos, n), "little"), pos + n
    if t == T_DATE:
        packed = int.from_bytes(data[pos:pos + 3], "little")
        return (f"{packed >> 9:04d}-{(packed >> 5) & 0xF:02d}"
                f"-{packed & 0x1F:02d}", pos + 3)
    if t == T_DATETIME2:
        fsp = col.get("meta", 0)
        packed = int.from_bytes(data[pos:pos + 5], "big")
        pos += 5
        micros, pos = _dec_frac(data, pos, fsp)
        ym = (packed >> 22) & 0x1FFFF
        out = (f"{ym // 13:04d}-{ym % 13:02d}-{(packed >> 17) & 0x1F:02d} "
               f"{(packed >> 12) & 0x1F:02d}:{(packed >> 6) & 0x3F:02d}"
               f":{packed & 0x3F:02d}")
        if fsp:
            out += f".{micros:06d}"[:1 + fsp]  # '.' + fsp digits
        return out, pos
    if t == T_TIMESTAMP2:
        fsp = col.get("meta", 0)
        sec = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        micros, pos = _dec_frac(data, pos, fsp)
        return sec * 1_000_000 + micros, pos
    if t == T_TIME2:
        fsp = col.get("meta", 0)
        packed = int.from_bytes(data[pos:pos + 3], "big")
        pos += 3
        if not packed >> 23:
            raise ValueError("negative TIME2 not supported")
        micros, pos = _dec_frac(data, pos, fsp)
        out = (f"{(packed >> 12) & 0x3FF:02d}:{(packed >> 6) & 0x3F:02d}"
               f":{packed & 0x3F:02d}")
        if fsp:
            out += f".{micros:06d}"[:1 + fsp]
        return out, pos
    raise ValueError(f"unsupported column type {t}")


def _enc_row(columns: list[dict], row: list) -> bytes:
    nulls = _bitmap([v is None for v in row])
    cells = b"".join(_enc_value(c, v)
                     for c, v in zip(columns, row) if v is not None)
    return nulls + cells


def _dec_row(columns: list[dict], data: bytes, pos: int) -> tuple[list, int]:
    nulls, pos = _read_bitmap(data, pos, len(columns))
    row = []
    for c, is_null in zip(columns, nulls):
        if is_null:
            row.append(None)
        else:
            v, pos = _dec_value(c, data, pos)
            row.append(v)
    return row, pos


# --------------------------------------------------------------- events


def _frame(event_type: int, body: bytes, timestamp: int, log_pos: int,
           server_id: int = 1, flags: int = 0,
           checksum: bool = False) -> bytes:
    size = 19 + len(body) + (4 if checksum else 0)
    out = _struct.pack("<IBIIIH", timestamp, event_type, server_id,
                       size, log_pos, flags) + body
    if checksum:  # CRC32 of header+body, LE, inside event_size
        out += _struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)
    return out


def encode_event(ev: dict, checksum: bool = False) -> bytes:
    """One event dict (the shape `decode_event` returns) → framed
    bytes (19-byte header + body; `checksum=True` appends the CRC32
    footer of binlog_checksum=CRC32, the modern server default)."""
    if checksum:
        bare = encode_event(ev, checksum=False)
        return _frame(bare[4], bare[19:], ev.get("timestamp", 0),
                      ev.get("log_pos", 0),
                      server_id=ev.get("server_id", 1), checksum=True)
    kind = ev["type"]
    ts = ev.get("timestamp", 0)
    pos = ev.get("log_pos", 0)
    if kind == "format_description":
        body = (_struct.pack("<H", 4)
                + ev.get("server_version", "8.0.0-spark").encode()
                .ljust(50, b"\x00")[:50]
                + _struct.pack("<I", ts) + bytes((19,)))
        return _frame(FORMAT_DESCRIPTION_EVENT, body, ts, pos)
    if kind == "query":  # BEGIN
        schema = ev.get("schema", "").encode("utf-8")
        query = ev.get("query", "BEGIN").encode("utf-8")
        body = (_struct.pack("<IIBHH", ev.get("thread_id", 0), 0,
                             len(schema), 0, 0)
                + schema + b"\x00" + query)
        return _frame(QUERY_EVENT, body, ts, pos)
    if kind == "xid":
        return _frame(XID_EVENT, _struct.pack("<Q", ev["xid"]), ts, pos)
    if kind == "rotate":
        body = (_struct.pack("<Q", ev["position"])
                + ev["next_file"].encode("utf-8"))
        return _frame(ROTATE_EVENT, body, ts, pos)
    if kind == "gtid":
        sid = bytes.fromhex(ev["sid"].replace("-", ""))
        if len(sid) != 16:
            raise ValueError(f"GTID SID must be a 16-byte uuid, "
                             f"got {ev['sid']!r}")
        body = (bytes((ev.get("commit_flag", 1),)) + sid
                + _struct.pack("<q", ev["gno"]))
        return _frame(GTID_LOG_EVENT, body, ts, pos)
    if kind == "annotate_rows":
        return _frame(ANNOTATE_ROWS_EVENT,
                      ev["sql"].encode("utf-8"), ts, pos)
    if kind == "binlog_checkpoint":
        name = ev["file"].encode("utf-8")
        return _frame(BINLOG_CHECKPOINT_EVENT,
                      _struct.pack("<I", len(name)) + name, ts, pos)
    if kind == "mariadb_gtid":
        flags2 = ev.get("flags2", 0)
        body = _struct.pack("<QIB", ev["seqno"], ev["domain_id"], flags2)
        if flags2 & FL_GROUP_COMMIT_ID:
            body += _struct.pack("<Q", ev["commit_id"])
        return _frame(MARIADB_GTID_EVENT, body, ts, pos,
                      server_id=ev.get("server_id", 1))
    if kind == "mariadb_gtid_list":
        gtids = ev["gtids"]  # [(domain_id, server_id, seqno), ...]
        if len(gtids) >= 1 << 28:
            raise ValueError("GTID list count exceeds 28 bits")
        body = _struct.pack("<I", len(gtids)
                            | (ev.get("flags", 0) << 28))
        for domain, server, seqno in gtids:
            body += _struct.pack("<IIQ", domain, server, seqno)
        return _frame(MARIADB_GTID_LIST_EVENT, body, ts, pos)
    if kind == "start_encryption":
        nonce = ev.get("nonce", bytes(12))
        if len(nonce) != 12:
            raise ValueError("START_ENCRYPTION nonce must be 12 bytes")
        body = (bytes((ev.get("scheme", 1),))
                + _struct.pack("<I", ev.get("key_version", 1)) + nonce)
        return _frame(START_ENCRYPTION_EVENT, body, ts, pos)
    if kind == "table_map":
        cols = ev["columns"]
        body = (ev["table_id"].to_bytes(6, "little")
                + _struct.pack("<H", 0))
        for name in (ev["schema"], ev["table"]):
            raw = name.encode("utf-8")
            body += bytes((len(raw),)) + raw + b"\x00"
        body += _lenenc(len(cols))
        body += bytes(c["type"] for c in cols)
        meta = b""
        for c in cols:
            if c["type"] == T_VARCHAR:
                meta += _struct.pack("<H", c.get("meta", 255))
            elif c["type"] in (T_FLOAT, T_DOUBLE):
                meta += bytes((_struct.calcsize(
                    "<f" if c["type"] == T_FLOAT else "<d"),))
            elif c["type"] == T_BLOB:
                meta += bytes((c.get("meta", 2),))
            elif c["type"] in (T_JSON, T_GEOMETRY):
                meta += bytes((c.get("meta", 4),))
            elif c["type"] == T_NEWDECIMAL:
                precision, scale = c["meta"]
                meta += bytes((precision, scale))
            elif c["type"] in (T_TIMESTAMP2, T_DATETIME2, T_TIME2):
                meta += bytes((c.get("meta", 0),))
            elif c["type"] in (T_ENUM, T_SET):
                meta += bytes((c.get("meta", 1),))
            elif c["type"] == T_STRING:
                # Field_string::do_save_field_metadata packed form;
                # meta = (real_type, maxlen) — real_type 254 for
                # CHAR, 247/248 when the column is really ENUM/SET
                real_type, maxlen = c.get("meta", (T_STRING, 255))
                if maxlen > 1023:
                    raise ValueError(f"STRING maxlen {maxlen} > 1023")
                meta += bytes((real_type ^ ((maxlen & 0x300) >> 4),
                               maxlen & 0xFF))
            elif c["type"] == T_BIT:
                nbits = c.get("meta", 1)
                meta += bytes((nbits % 8, nbits // 8))
            # T_YEAR: no metadata
        body += _lenenc(len(meta)) + meta
        body += _bitmap([bool(c.get("nullable", True)) for c in cols])
        return _frame(TABLE_MAP_EVENT, body, ts, pos)
    if kind == "transaction_payload":
        # binlog_transaction_compression: the whole transaction's
        # events, framed WITHOUT checksums (the outer event carries
        # the only CRC), zstd-compressed unless compression="none"
        inner = b"".join(encode_event(e) for e in ev["events"])
        comp = ev.get("compression", "zstd")
        fields: list[tuple[int, int]] = []
        if comp == "zstd":
            import pyarrow as _pa

            payload = bytes(_pa.Codec("zstd").compress(inner))
            fields.append((_OTW_COMPRESSION_TYPE, COMPRESSION_ZSTD))
            fields.append((_OTW_UNCOMPRESSED_SIZE, len(inner)))
        elif comp == "none":
            payload = inner
            fields.append((_OTW_COMPRESSION_TYPE, COMPRESSION_NONE))
        else:
            raise ValueError(f"unknown payload compression {comp!r}")
        fields.append((_OTW_PAYLOAD_SIZE, len(payload)))
        body = b""
        for ftype, fval in fields:  # TLV: type, len, lenenc-int value
            enc = _lenenc(fval)
            body += _lenenc(ftype) + _lenenc(len(enc)) + enc
        body += _lenenc(_OTW_HEADER_END) + payload
        return _frame(TRANSACTION_PAYLOAD_EVENT, body, ts, pos)
    if kind in ("write_rows", "update_rows", "delete_rows"):
        code = {"write_rows": WRITE_ROWS_EVENT_V2,
                "update_rows": UPDATE_ROWS_EVENT_V2,
                "delete_rows": DELETE_ROWS_EVENT_V2}[kind]
        cols = ev["columns"]
        n = len(cols)
        body = (ev["table_id"].to_bytes(6, "little")
                + _struct.pack("<H", 0)
                + _struct.pack("<H", 2))  # v2 extra-data length (empty)
        body += _lenenc(n)
        present = ev.get("present", [True] * n)
        body += _bitmap(present)  # columns-present bitmap
        b_cols = [c for c, pr in zip(cols, present) if pr]
        if kind == "update_rows":
            present_after = ev.get("present_after", present)
            body += _bitmap(present_after)  # after-image bitmap
            a_cols = [c for c, pr in zip(cols, present_after) if pr]
            for before, after in ev["rows"]:
                body += _enc_row(b_cols, before) + _enc_row(a_cols, after)
        else:
            for row in ev["rows"]:
                body += _enc_row(b_cols, row)
        return _frame(code, body, ts, pos)
    raise ValueError(f"unknown binlog event type {kind!r}")


def decode_event(data: bytes, columns_of=None,
                 checksum: bool = False) -> dict:
    """Framed event bytes → dict. ROWS events need the column specs the
    TABLE_MAP declared: pass `columns_of(table_id) -> list[colspec]`
    (the registry closure `sources/binlog_source.py` provides).
    `checksum=True` verifies and strips the CRC32 footer."""
    if len(data) < 19:
        raise EOFError("truncated binlog event header")
    ts, etype, server_id, size, log_pos, flags = _struct.unpack(
        "<IBIIIH", data[:19])
    if size != len(data):
        raise ValueError(f"event size {size} != frame length {len(data)}")
    if checksum:
        if len(data) < 23:
            raise EOFError("truncated checksummed binlog event")
        (want,) = _struct.unpack("<I", data[-4:])
        got = zlib.crc32(data[:-4]) & 0xFFFFFFFF
        if want != got:
            raise ValueError(
                f"binlog CRC32 mismatch: frame {want:#010x} != "
                f"computed {got:#010x}")
        data = data[:-4]
    body = data[19:]
    base = {"timestamp": ts, "log_pos": log_pos, "server_id": server_id}
    if etype == FORMAT_DESCRIPTION_EVENT:
        version = _struct.unpack("<H", body[:2])[0]
        return {**base, "type": "format_description",
                "binlog_version": version,
                "server_version": body[2:52].rstrip(b"\x00").decode()}
    if etype == QUERY_EVENT:
        schema_len = body[8]
        status_len = _struct.unpack("<H", body[11:13])[0]
        p = 13 + status_len
        schema = body[p:p + schema_len].decode("utf-8")
        p += schema_len + 1
        return {**base, "type": "query", "schema": schema,
                "query": body[p:].decode("utf-8")}
    if etype == XID_EVENT:
        return {**base, "type": "xid",
                "xid": _struct.unpack("<Q", body[:8])[0]}
    if etype == ROTATE_EVENT:
        return {**base, "type": "rotate",
                "position": _struct.unpack("<Q", body[:8])[0],
                "next_file": body[8:].decode("utf-8")}
    if etype == GTID_LOG_EVENT:
        raw = body[1:17].hex()
        sid = f"{raw[:8]}-{raw[8:12]}-{raw[12:16]}-{raw[16:20]}-{raw[20:]}"
        return {**base, "type": "gtid", "commit_flag": body[0],
                "sid": sid, "gno": _struct.unpack("<q", body[17:25])[0]}
    if etype == ANNOTATE_ROWS_EVENT:
        return {**base, "type": "annotate_rows",
                "sql": body.decode("utf-8")}
    if etype == BINLOG_CHECKPOINT_EVENT:
        (nlen,) = _struct.unpack("<I", body[:4])
        if 4 + nlen > len(body):
            raise EOFError("truncated BINLOG_CHECKPOINT filename")
        return {**base, "type": "binlog_checkpoint",
                "file": body[4:4 + nlen].decode("utf-8")}
    if etype == MARIADB_GTID_EVENT:
        seqno, domain_id, flags2 = _struct.unpack("<QIB", body[:13])
        ev = {**base, "type": "mariadb_gtid", "seqno": seqno,
              "domain_id": domain_id, "flags2": flags2,
              # the canonical MariaDB GTID rendering
              "gtid": f"{domain_id}-{server_id}-{seqno}"}
        if flags2 & FL_GROUP_COMMIT_ID:
            if len(body) < 21:
                raise EOFError("truncated MariaDB GTID commit_id")
            ev["commit_id"] = _struct.unpack("<Q", body[13:21])[0]
        return ev
    if etype == MARIADB_GTID_LIST_EVENT:
        (packed,) = _struct.unpack("<I", body[:4])
        count, flags_ = packed & 0x0FFFFFFF, packed >> 28
        if 4 + 16 * count > len(body):
            raise EOFError("truncated MariaDB GTID_LIST")
        gtids = [_struct.unpack("<IIQ", body[4 + 16 * i:20 + 16 * i])
                 for i in range(count)]
        return {**base, "type": "mariadb_gtid_list", "flags": flags_,
                "gtids": [tuple(g) for g in gtids]}
    if etype == START_ENCRYPTION_EVENT:
        if len(body) < 17:
            raise EOFError("truncated START_ENCRYPTION event")
        return {**base, "type": "start_encryption", "scheme": body[0],
                "key_version": _struct.unpack("<I", body[1:5])[0],
                "nonce": body[5:17]}
    if etype == TABLE_MAP_EVENT:
        table_id = int.from_bytes(body[:6], "little")
        p = 8
        names = []
        for _ in range(2):
            n = body[p]
            names.append(body[p + 1:p + 1 + n].decode("utf-8"))
            p += n + 2  # length byte + name + NUL
        ncols, p = _read_lenenc(body, p)
        types = list(body[p:p + ncols])
        p += ncols
        meta_len, p = _read_lenenc(body, p)
        meta_block = body[p:p + meta_len]
        p += meta_len
        cols, mp = [], 0
        for t in types:
            meta = 0
            if t == T_VARCHAR:
                meta = _struct.unpack("<H", meta_block[mp:mp + 2])[0]
                mp += 2
            elif t in (T_FLOAT, T_DOUBLE, T_BLOB, T_JSON, T_GEOMETRY,
                       T_TIMESTAMP2, T_DATETIME2, T_TIME2,
                       T_ENUM, T_SET):
                meta = meta_block[mp]
                mp += 1
            elif t == T_NEWDECIMAL:
                meta = (meta_block[mp], meta_block[mp + 1])
                mp += 2
            elif t == T_STRING:
                # unpack Field_string's 2-byte form; resolve a hidden
                # ENUM/SET back to its own col-spec type so the cell
                # decode path is shared with the direct-coded twin
                b0, b1 = meta_block[mp], meta_block[mp + 1]
                mp += 2
                if (b0 & 0x30) != 0x30:
                    real_type = b0 | 0x30
                    maxlen = b1 | (((b0 & 0x30) ^ 0x30) << 4)
                else:
                    real_type, maxlen = b0, b1
                if real_type in (T_ENUM, T_SET):
                    cols.append({"type": real_type, "meta": maxlen})
                    continue
                if real_type != T_STRING:
                    raise ValueError(
                        f"bad packed STRING metadata real type "
                        f"0x{real_type:02x}")
                meta = (T_STRING, maxlen)
            elif t == T_BIT:
                meta = meta_block[mp] + 8 * meta_block[mp + 1]
                mp += 2
            cols.append({"type": t, "meta": meta})
        nullable, p = _read_bitmap(body, p, ncols)
        for c, nl in zip(cols, nullable):
            c["nullable"] = nl
        return {**base, "type": "table_map", "table_id": table_id,
                "schema": names[0], "table": names[1], "columns": cols}
    if etype == TRANSACTION_PAYLOAD_EVENT:
        fields: dict[int, int] = {}
        p = 0
        while True:
            ftype, p = _read_lenenc(body, p)
            if ftype == _OTW_HEADER_END:
                break
            flen, p = _read_lenenc(body, p)
            fval, q = _read_lenenc(body, p)
            if q - p != flen:
                raise ValueError(
                    f"payload TLV field {ftype}: declared length "
                    f"{flen} != value encoding {q - p}")
            fields[ftype] = fval
            p = q
        if _OTW_PAYLOAD_SIZE not in fields:
            raise ValueError("transaction payload missing size field")
        n = fields[_OTW_PAYLOAD_SIZE]
        payload = body[p:p + n]
        if len(payload) != n:
            raise EOFError("truncated transaction payload")
        if p + n != len(body):
            raise ValueError("trailing bytes after transaction payload")
        comp = fields.get(_OTW_COMPRESSION_TYPE, COMPRESSION_NONE)
        if comp == COMPRESSION_ZSTD:
            import pyarrow as _pa

            if _OTW_UNCOMPRESSED_SIZE not in fields:
                raise ValueError(
                    "zstd transaction payload missing uncompressed size")
            usize = fields[_OTW_UNCOMPRESSED_SIZE]
            if usize > 1 << 30:
                # the server caps any event at 1 GiB — a larger claim
                # is corrupt, and honoring it would let a 100-byte
                # frame demand gigabytes from the decoder
                raise ValueError(
                    f"transaction payload claims {usize} uncompressed "
                    f"bytes (> 1 GiB event cap)")
            inner = bytes(_pa.Codec("zstd").decompress(payload, usize))
        elif comp == COMPRESSION_NONE:
            inner = payload
        else:
            raise ValueError(f"unknown payload compression {comp}")
        # a compressed transaction is SELF-CONTAINED: its TABLE_MAPs
        # precede its ROWS events inside the payload, so decode with a
        # payload-local registry (outer columns_of as fallback)
        local: dict[int, dict] = {}

        def inner_cols(tid: int) -> list[dict]:
            if tid in local:
                return local[tid]["columns"]
            if columns_of is not None:
                return columns_of(tid)
            raise ValueError(f"no TABLE_MAP for table_id {tid} inside "
                             f"transaction payload")

        events = []
        for frame in split_frames(inner):
            e = decode_event(frame, columns_of=inner_cols,
                             checksum=False)
            if e["type"] == "table_map":
                local[e["table_id"]] = e
            events.append(e)
        return {**base, "type": "transaction_payload",
                "compression": ("zstd" if comp == COMPRESSION_ZSTD
                                else "none"),
                "events": events}
    if etype in (WRITE_ROWS_EVENT_V2, UPDATE_ROWS_EVENT_V2,
                 DELETE_ROWS_EVENT_V2):
        kind = {WRITE_ROWS_EVENT_V2: "write_rows",
                UPDATE_ROWS_EVENT_V2: "update_rows",
                DELETE_ROWS_EVENT_V2: "delete_rows"}[etype]
        table_id = int.from_bytes(body[:6], "little")
        extra_len = _struct.unpack("<H", body[8:10])[0]
        p = 10 + extra_len - 2  # extra-data length includes itself
        ncols, p = _read_lenenc(body, p)
        # binlog_row_image=MINIMAL/NOBLOB: the columns-present bitmaps
        # select which columns each image carries (FULL = all set).
        # Row values align with the PRESENT column subset; `present`
        # (and `present_after` for updates) ride the decoded dict so
        # consumers can map values back to column positions.
        present, p = _read_bitmap(body, p, ncols)
        present_after = None
        if kind == "update_rows":
            present_after, p = _read_bitmap(body, p, ncols)
        if columns_of is None:
            raise ValueError("ROWS event needs columns_of(table_id)")
        cols = columns_of(table_id)
        if len(cols) != ncols:
            raise ValueError(f"TABLE_MAP arity {len(cols)} != "
                             f"rows-event arity {ncols}")
        b_cols = [c for c, pr in zip(cols, present) if pr]
        a_cols = ([c for c, pr in zip(cols, present_after) if pr]
                  if present_after is not None else b_cols)
        rows = []
        while p < len(body):
            if kind == "update_rows":
                before, p = _dec_row(b_cols, body, p)
                after, p = _dec_row(a_cols, body, p)
                rows.append((before, after))
            else:
                row, p = _dec_row(b_cols, body, p)
                rows.append(row)
        # the resolved column specs ride the decoded dict so a ROWS
        # event is re-encodable as-is (the payload twin's fidelity
        # contract) — same specs the TABLE_MAP declared
        out = {**base, "type": kind, "table_id": table_id, "rows": rows,
               "present": present, "columns": cols}
        if present_after is not None:
            out["present_after"] = present_after
        return out
    raise ValueError(f"unsupported binlog event type 0x{etype:02x}")


def split_frames(stream: bytes, pos: int = 0) -> list[bytes]:
    """Split concatenated framed events (no file magic — the shape of
    a TRANSACTION_PAYLOAD's decompressed interior) using each header's
    event_size."""
    out = []
    while pos < len(stream):
        if pos + 19 > len(stream):
            raise EOFError("truncated binlog event header")
        size = _struct.unpack("<I", stream[pos + 9:pos + 13])[0]
        if size < 19 or pos + size > len(stream):
            raise EOFError("truncated binlog event body")
        out.append(stream[pos:pos + size])
        pos += size
    return out


def split_events(stream: bytes) -> list[bytes]:
    """Split a binlog FILE byte stream (magic + events) into framed
    event byte strings using each header's event_size."""
    if not stream.startswith(MAGIC):
        raise ValueError("missing binlog magic")
    return split_frames(stream, pos=len(MAGIC))

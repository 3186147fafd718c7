"""MongoDB oplog (BSON) → envelope frame: the document-store sibling of
`pgoutput_source.py`, over `functions/bson_codec.py`.

The reference's MongoDB connector tails `local.oplog.rs` — a capped
collection of BSON entries `{ts, t, op, ns, o, o2}` (PUBLIC format:
MongoDB replication internals docs) — and emits keyed change events.
Here the same decode is a DataFrame stage: `(seq, data binary)` rows of
raw BSON become `(seq, destination, op, before, after, patch, ts_ms,
error)`.

Unlike pgoutput, each oplog entry is self-contained (ts and namespace
ride in-band; there is no Begin/Commit framing), so the decode is ONE
tag-free Arrow-batched pass — no registry collect, no interval join.
Op mapping (the MilvusChangeConsumer.java:133-146 dispatch):

  'i' insert  → c, after = o
  'u' update  → u; replacement updates (o is the full document) give
                after = o; v2 diff updates (o = {"$v":2, diff:...})
                give after = NULL + the diff as `patch` — the same
                contract Debezium's Mongo connector has, where diff
                updates carry a patch and full state needs a lookup
  'd' delete  → d, before = o (the _id document — key-only, Mongo's
                replica-identity analog)
  'n'/'c' (noop/command) never reach the envelope (heartbeat-skip
  convention, operators/envelope.py) — EXCEPT the `applyOps` command,
  MongoDB's multi-document transaction commit: its nested ops unfold
  into ordinary envelope rows (sub-index in `row_idx`), each inheriting
  the wrapper's commit timestamp — the same one-commit-many-rows shape
  as a binlog ROWS event.

Malformed entries follow the corrupt-line quarantine convention.
"""

from __future__ import annotations

import base64
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from debezium_server_spark.functions.bson_codec import (
    BsonBinary,
    BsonTimestamp,
    Decimal128,
    ObjectId,
    UtcDatetime,
    decode,
)

_OP_OF = {"i": "c", "u": "u", "d": "d"}

_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("seq", T.LongType()),
    T.StructField("row_idx", T.LongType()),
    T.StructField("destination", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("before", T.StringType()),
    T.StructField("after", T.StringType()),
    T.StructField("patch", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("error", T.StringType()),
])


def _jsonable(v):
    if isinstance(v, ObjectId):
        return v.hex
    if isinstance(v, UtcDatetime):
        return v.millis
    if isinstance(v, BsonTimestamp):
        return {"t": v.seconds, "i": v.increment}
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, BsonBinary):  # non-generic subtype (e.g. UUID)
        return {"$binary": base64.b64encode(v.data).decode("ascii"),
                "subtype": v.subtype}
    if isinstance(v, Decimal128):  # Extended-JSON convention: exact
        return {"$numberDecimal": v.text}  # text, never a float
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def doc_to_json(doc: dict) -> str:
    """Canonical compact JSON projection of a decoded BSON document
    (field order preserved — BSON documents are ordered)."""
    return json.dumps(_jsonable(doc), separators=(",", ":"))


def decode_oplog_entry(entry: dict, ts_ms: int | None = None
                       ) -> tuple | None:
    """One decoded oplog document → (destination, op, before, after,
    patch, ts_ms), or None for entries that never reach the envelope
    (noops, non-applyOps commands). `ts_ms` overrides the in-entry
    timestamp for nested applyOps members (which carry none)."""
    op = entry["op"]
    if op not in _OP_OF:
        return None
    ns = entry["ns"]
    if ts_ms is None:
        ts = entry["ts"]
        ts_ms = (ts.seconds * 1000 if isinstance(ts, BsonTimestamp)
                 else int(ts))
    o = entry.get("o") or {}
    before = after = patch = None
    if op == "i":
        after = doc_to_json(o)
    elif op == "u":
        if o.get("$v") == 2 and "diff" in o:
            patch = doc_to_json(o["diff"])
            before = doc_to_json(entry["o2"]) if "o2" in entry else None
        else:  # replacement update: o is the full post-image
            after = doc_to_json(o)
            before = doc_to_json(entry["o2"]) if "o2" in entry else None
    else:  # delete: o carries the _id document (key-only)
        before = doc_to_json(o)
    return (ns, _OP_OF[op], before, after, patch, ts_ms)


def decode_oplog_rows(entry: dict) -> list[tuple]:
    """One decoded oplog document → envelope rows. Ordinary i/u/d give
    one row; an `applyOps` command (multi-document transaction commit)
    unfolds its nested ops in order, each inheriting the wrapper's
    commit timestamp. Everything else gives no rows."""
    if entry["op"] == "c":
        o = entry.get("o") or {}
        ops = o.get("applyOps")
        if isinstance(ops, list):
            ts = entry["ts"]
            ts_ms = (ts.seconds * 1000
                     if isinstance(ts, BsonTimestamp) else int(ts))
            out = []
            for nested in ops:
                row = decode_oplog_entry(nested, ts_ms=ts_ms)
                if row is not None:
                    out.append(row)
            return out
        return []
    row = decode_oplog_entry(entry)
    return [row] if row is not None else []


def decode_oplog_changelog(msgs: DataFrame) -> DataFrame:
    """`(seq, data)` BSON oplog frame → envelope frame. One
    Arrow-batched pass; corrupt entries land on `error`."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for seq, raw in zip(pdf["seq"], pdf["data"]):
                seq = int(seq)
                try:
                    for i, row in enumerate(
                            decode_oplog_rows(decode(bytes(raw)))):
                        out.append((seq, i, *row, None))
                except Exception as exc:
                    out.append((seq, 0, None, None, None, None, None,
                                None, f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(out, columns=[f.name
                                             for f in _ENVELOPE_SCHEMA])

    return msgs.mapInPandas(go, _ENVELOPE_SCHEMA)

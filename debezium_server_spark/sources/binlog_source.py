"""MySQL binlog (ROW format) → envelope frame, over
`functions/binlog_codec.py` — the third real-CDC wire format next to
`pgoutput_source.py` and `oplog_source.py`.

Same three-pass shape as pgoutput, with one MySQL-specific twist: the
binlog's TABLE_MAP events carry column TYPES but not column NAMES
(names live in the server's schema; Debezium reconstructs them from
its schema-history topic). The decode therefore takes a
`names: {\"schema.table\": [column names]}` mapping — the schema-history
hook (`operators/schema_history.py` is the engine's keeper of exactly
this information).

- Pass 1 (bounded): TABLE_MAP events → distinct table_id → column-spec
  registry, collected and closed over (|tables|-row control frame).
- Pass 2 (bulk, Arrow-batched): WRITE/UPDATE/DELETE_ROWS v2 events →
  one envelope row per ROW IMAGE (a single binlog event may carry many
  rows — the fan-out happens inside the batch, never via explode of
  decoded structs). write→c (after only), update→u (full before AND
  after images — binlog_row_image=FULL, MySQL's default), delete→d
  (before only). ts_ms comes from each event's own header timestamp —
  binlog events are self-timestamped, so no Begin-interval join is
  needed for event time (XID/BEGIN bracketing is exercised at codec
  level; pgoutput_changelog_decode covers distributed tx association).

Malformed events follow the corrupt-line quarantine convention.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.functions.binlog_codec import (
    DELETE_ROWS_EVENT_V2,
    TABLE_MAP_EVENT,
    TRANSACTION_PAYLOAD_EVENT,
    UPDATE_ROWS_EVENT_V2,
    WRITE_ROWS_EVENT_V2,
    decode_event,
)

_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("seq", T.LongType()),
    T.StructField("row_idx", T.LongType()),
    T.StructField("destination", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("before", T.StringType()),
    T.StructField("after", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("error", T.StringType()),
])

_ROWS_TYPES = (WRITE_ROWS_EVENT_V2, UPDATE_ROWS_EVENT_V2,
               DELETE_ROWS_EVENT_V2, TRANSACTION_PAYLOAD_EVENT)
_ROW_KINDS = ("write_rows", "update_rows", "delete_rows")


def _type_filter(codes: tuple[int, ...]):
    """JVM-side prune on the event-type byte (header offset 4)."""
    return F.ascii(F.col("data").substr(5, 1).cast("string")).isin(
        list(codes))


def load_table_registry(msgs: DataFrame,
                        checksum: bool = False) -> dict[int, dict]:
    """Collect the distinct TABLE_MAP declarations (latest per
    table_id wins — bounded |tables|-row control frame, the pgoutput
    Relation-registry convention)."""
    rows = msgs.filter(_type_filter((TABLE_MAP_EVENT,))).select(
        "seq", "data")
    reg: dict[int, dict] = {}
    for r in sorted(rows.collect(), key=lambda r: r["seq"]):
        ev = decode_event(bytes(r["data"]), checksum=checksum)
        reg[ev["table_id"]] = ev
    return reg


def decode_binlog_changelog(msgs: DataFrame,
                            names: dict[str, list[str]],
                            registry: dict[int, dict] | None = None,
                            checksum: bool = False) -> DataFrame:
    """`(seq, data)` framed-event frame → envelope frame. `names` maps
    "schema.table" → ordered column names (schema-history input).
    Pass `registry` explicitly when `msgs` is a STREAMING frame (a
    stream cannot collect its own TABLE_MAPs — load it from a batch
    pre-read or the schema history, the pgoutput streaming shape).
    `checksum=True` for binlog_checksum=CRC32 captures (the modern
    server default): footers are verified and stripped; without it a
    checksummed capture would fail decode rather than mis-parse (the
    codec's short-read guards make trailing bytes an error, never a
    phantom row)."""
    if registry is None:
        registry = load_table_registry(msgs, checksum=checksum)

    def row_json(cols: list[str], row: list) -> str:
        # BLOB cells decode to bytes and JSON cells to Python
        # structures that may carry JsonDecimal/JsonOpaque wrappers —
        # project all of them to JSON-serializable values (base64 for
        # bytes, exact text for decimals) instead of letting
        # json.dumps raise and quarantine the row
        from debezium_server_spark.functions.mysql_jsonb import to_jsonable
        return json.dumps({k: to_jsonable(v) for k, v in zip(cols, row)},
                          separators=(",", ":"))

    def emit_rows(seq: int, ev: dict, tmaps: dict[int, dict],
                  out: list, row_idx: int) -> int:
        """Append one ROWS event's envelope rows; returns the next
        row_idx (payloads number their row images consecutively so
        (seq, row_idx) stays a stable per-image key)."""
        tmap = tmaps[ev["table_id"]]
        dest = f"{tmap['schema']}.{tmap['table']}"
        cols = names[dest]
        if len(cols) != len(tmap["columns"]):
            # schema-history drift: zip would silently truncate and
            # mis-project values — quarantine
            raise ValueError(
                f"names for {dest} have {len(cols)} columns, "
                f"TABLE_MAP declares {len(tmap['columns'])}")
        # MINIMAL/NOBLOB row images: values align with the
        # present-column subset, so project names the same way
        present = ev.get("present", [True] * len(cols))
        b_names = [n for n, pr in zip(cols, present) if pr]
        a_names = [n for n, pr in zip(
            cols, ev.get("present_after", present)) if pr]
        ts_ms = ev["timestamp"] * 1000
        for r in ev["rows"]:
            if ev["type"] == "write_rows":
                out.append((seq, row_idx, dest, "c", None,
                            row_json(b_names, r), ts_ms, None))
            elif ev["type"] == "update_rows":
                out.append((seq, row_idx, dest, "u",
                            row_json(b_names, r[0]),
                            row_json(a_names, r[1]), ts_ms, None))
            else:
                out.append((seq, row_idx, dest, "d",
                            row_json(b_names, r), None, ts_ms, None))
            row_idx += 1
        return row_idx

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for seq, raw in zip(pdf["seq"], pdf["data"]):
                seq = int(seq)
                try:
                    ev = decode_event(
                        bytes(raw),
                        columns_of=lambda tid: registry[tid]["columns"],
                        checksum=checksum)
                    if ev["type"] == "transaction_payload":
                        # compressed transactions are SELF-CONTAINED:
                        # their TABLE_MAPs travel inside the payload,
                        # so they never touch the bounded registry
                        # collect — payload-local declarations overlay
                        # the startup registry here
                        local = dict(registry)
                        row_idx = 0
                        for ie in ev["events"]:
                            if ie["type"] == "table_map":
                                local[ie["table_id"]] = ie
                            elif ie["type"] in _ROW_KINDS:
                                row_idx = emit_rows(seq, ie, local,
                                                    out, row_idx)
                    else:
                        emit_rows(seq, ev, registry, out, 0)
                except Exception as exc:
                    out.append((seq, 0, None, None, None, None, None,
                                f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(out, columns=[f.name
                                             for f in _ENVELOPE_SCHEMA])

    return msgs.filter(_type_filter(_ROWS_TYPES)).mapInPandas(
        go, _ENVELOPE_SCHEMA)

"""pgoutput changelog → envelope frame: the Spark surface over
`functions/pgoutput_codec.py`.

The reference consumes this wire format through the bundled Debezium
Postgres connector (`debezium-server-dist/pom.xml:359-389`) and emits
keyed change events (SURVEY.md §1.1-1.2). Here the same decode is a
DataFrame stage: a frame of raw WAL messages `(seq bigint, data
binary)` — `seq` is the WAL position (LSN order) — becomes the
engine's envelope frame `(seq, destination, op, before, after, xid,
ts_ms)` ready for the existing route → SMT → sink pipeline.

Scale design (what survives 100 TB of WAL):

- **Three passes, each pruned by the 1-byte message tag** before any
  Python runs: Relation messages (one per table per decoder session —
  a bounded frame, collected and broadcast into the data decode),
  Begin messages (one per transaction — stays distributed), and data
  messages (the bulk). The tag filter is a JVM-side `substring` on the
  binary column, so the heavy pass never deserializes non-data rows.
- **Decode is Arrow-batched** (`mapInPandas`), one `decode_message`
  per WAL record, no row-at-a-time Python UDF, no cross-row state in
  the hot pass.
- **Transaction association never sorts the log.** pgoutput's Begin
  message carries the transaction's `final_lsn`, so each transaction
  is a self-contained interval [begin_seq, final_lsn]. Data rows meet
  their Begin through an interval-band equi-join: each Begin explodes
  to the `seq div band_width` buckets its span covers (bounded
  expansion — WAL transactions are contiguous byte ranges), the data
  row joins on its single bucket, and the exact range predicate
  re-checks. No global window, no |log|-sized sort, and AQE/skew
  handling apply because the join key is a real equi key.

Malformed messages follow the corrupt-line quarantine convention of
`file_source.py`: they surface on a side output, never poison the
batch.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

import base64

from debezium_server_spark.functions.pgoutput_codec import (
    PG_EPOCH_OFFSET_US,
    UNCHANGED_TOAST_VALUE,
    decode_message,
    tuple_to_dict,
)


def _jsonable(v):
    """Binary-format ('b') tuple columns decode to raw bytes, which
    json.dumps rejects — base64 them (the oplog source's convention)
    so a `binary = true` pgoutput capture doesn't quarantine every
    row."""
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    return v


def _row_json(rel: dict, tup) -> str:
    # 'u' (unchanged TOAST) columns get the Debezium sentinel, NOT SQL
    # NULL — an upsert must not overwrite real data with NULL for a
    # value the WAL simply didn't ship
    d = tuple_to_dict(rel, tup, unchanged_marker=UNCHANGED_TOAST_VALUE)
    return json.dumps({k: _jsonable(v) for k, v in d.items()},
                      separators=(",", ":"))

# op codes per the envelope contract (Envelope.FieldName dispatch at
# FlussChangeConsumer.java:188-193): Insert → c, Update → u, Delete → d;
# Truncate → t (Debezium's truncate event — no row images, one event
# per affected table; sinks without truncate support skip op='t').
_OP_OF = {"I": "c", "U": "u", "D": "d"}

def _tag_filter(kinds: str):
    """JVM-side predicate on the 1-byte message tag — prunes the scan
    before any Python decode runs."""
    ascii_col = F.ascii(F.col("data").substr(1, 1).cast("string"))
    return ascii_col.isin([ord(k) for k in kinds])


_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("seq", T.LongType()),
    T.StructField("destination", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("before", T.StringType()),
    T.StructField("after", T.StringType()),
    T.StructField("error", T.StringType()),
])

_BEGIN_SCHEMA = T.StructType([
    T.StructField("begin_seq", T.LongType()),
    T.StructField("final_lsn", T.LongType()),
    T.StructField("commit_ts_us", T.LongType()),
    T.StructField("xid", T.LongType()),
])

_RELATION_SCHEMA = T.StructType([
    T.StructField("relation_oid", T.LongType()),
    T.StructField("namespace", T.StringType()),
    T.StructField("relation_name", T.StringType()),
    T.StructField("replica_identity", T.StringType()),
    T.StructField("columns_json", T.StringType()),
])


def extract_relations(msgs: DataFrame) -> DataFrame:
    """Decode only the Relation ('R') messages — the per-table schema
    declarations. One row per (relation, schema version); bounded by
    the table count, so collecting this frame is a control-plane
    action, not a data-plane one."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["data"]:
                m = decode_message(bytes(raw))
                rows.append((m["relation_oid"], m["namespace"],
                             m["relation_name"], m["replica_identity"],
                             json.dumps(m["columns"])))
            yield pd.DataFrame(rows, columns=[f.name for f in _RELATION_SCHEMA])

    return msgs.filter(_tag_filter("R")).mapInPandas(go, _RELATION_SCHEMA)


def extract_begins(msgs: DataFrame) -> DataFrame:
    """Decode the Begin ('B') messages: one row per transaction with
    its seq, final LSN (the interval end pgoutput ships in-band),
    commit timestamp and xid. Stays distributed — |transactions| is
    SF-proportional."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seq, raw in zip(pdf["seq"], pdf["data"]):
                m = decode_message(bytes(raw))
                rows.append((int(seq), m["final_lsn"], m["commit_ts_us"],
                             m["xid"]))
            yield pd.DataFrame(rows, columns=[f.name for f in _BEGIN_SCHEMA])

    return msgs.filter(_tag_filter("B")).mapInPandas(go, _BEGIN_SCHEMA)


def decode_data_messages(msgs: DataFrame, registry: dict[int, dict]) -> DataFrame:
    """Decode Insert/Update/Delete messages against a relation
    registry (broadcast via closure — it is |tables|-sized). Emits the
    row-image halves as canonical compact JSON in relation column
    order; malformed records land on the `error` column (quarantine
    convention) instead of failing the batch."""

    row_json = _row_json

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for seq, raw in zip(pdf["seq"], pdf["data"]):
                seq = int(seq)
                try:
                    m = decode_message(bytes(raw))
                    if m["type"] == "T":
                        # one op='t' envelope row per affected table,
                        # no row images (the Debezium truncate event)
                        for oid in m["relation_oids"]:
                            rel = registry[oid]
                            dest = (f"{rel['namespace']}"
                                    f".{rel['relation_name']}")
                            out.append((seq, dest, "t", None, None, None))
                        continue
                    rel = registry[m["relation_oid"]]
                    dest = f"{rel['namespace']}.{rel['relation_name']}"
                    op = _OP_OF[m["type"]]
                    before = (row_json(rel, m["old_tuple"])
                              if m.get("old_tuple") is not None else None)
                    after = (row_json(rel, m["new_tuple"])
                             if m.get("new_tuple") is not None else None)
                    out.append((seq, dest, op, before, after, None))
                except Exception as exc:  # quarantine, don't poison
                    out.append((seq, None, None, None, None,
                                f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(out, columns=[f.name for f in _ENVELOPE_SCHEMA])

    return msgs.filter(_tag_filter("IUDT")).mapInPandas(go, _ENVELOPE_SCHEMA)


def load_relation_registry(msgs: DataFrame) -> dict[int, dict]:
    """Collect the (bounded) Relation frame into the {oid: relation}
    dict `decode_data_messages` closes over. Latest declaration wins
    per OID — pgoutput re-sends Relation on schema change, and the
    highest-seq version is the one in force for subsequent data."""
    rows = msgs.filter(_tag_filter("R")).select("seq", "data")
    # Decode driver-side: the R frame is |tables|-row (bounded collect,
    # same class as the centroid/shard-plan collects argued in-code).
    reg: dict[int, dict] = {}
    for r in sorted(rows.collect(), key=lambda r: r["seq"]):
        m = decode_message(bytes(r["data"]))
        reg[m["relation_oid"]] = m
    return reg


def attach_transactions(data: DataFrame, begins: DataFrame,
                        band_width: int = 4096) -> DataFrame:
    """Interval-band join: each envelope row meets the Begin whose
    [begin_seq, final_lsn] interval contains its seq. Begins explode
    to ⌈span/band_width⌉+1 bucket keys (WAL transactions are contiguous
    seq ranges, so the expansion is bounded and small); data rows join
    on one bucket key; the exact containment predicate re-checks.
    Transactions never overlap in WAL order, so each data row matches
    exactly one Begin."""
    b = begins.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.expr(f"begin_seq div {band_width}"),
            F.expr(f"final_lsn div {band_width}"),
        )),
    )
    d = data.withColumn("_bucket", F.expr(f"seq div {band_width}"))
    joined = d.join(
        b,
        (d["_bucket"] == b["_bucket"])
        & (d["seq"] >= b["begin_seq"])
        & (d["seq"] <= b["final_lsn"]),
        "left",
    )
    return joined.select(
        data["seq"], "destination", "op", "before", "after", "error",
        F.col("xid"),
        # integer div (not double /): epoch-µs sums sit near 2^50 where
        # float division is exact today but one refactor from not being
        F.expr(f"(commit_ts_us + {PG_EPOCH_OFFSET_US}L) div 1000")
        .alias("ts_ms"),
    )


_CHUNK_SCHEMA = T.StructType([
    T.StructField("chunk_id", T.LongType()),
    T.StructField("xid", T.LongType()),
    T.StructField("row_idx", T.LongType()),
    T.StructField("destination", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("before", T.StringType()),
    T.StructField("after", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("error", T.StringType()),
])


def decode_streamed_chunks(chunks: DataFrame,
                           registry: dict[int, dict] | None = None,
                           protocol_version: int = 2) -> DataFrame:
    """Protocol-v2 STREAMED transactions at scale: each input row is
    one captured WAL CHUNK — `(chunk_id bigint, blob binary)` of
    big-endian length-prefixed pgoutput messages, the unit a capture
    task tails (segments interleave only WITHIN a chunk, PostgreSQL's
    `logical_decoding_work_mem` flush behavior). The per-chunk
    sequential fold (`assemble_streamed_transactions`) runs inside an
    Arrow batch — chunk-level parallelism, no cross-chunk state, no
    global sort — and only COMMITTED transactions emit envelope rows
    (aborts vanish, matching the reference: Debezium buffers streamed
    transactions and emits on commit).

    In-chunk Relation messages apply to that chunk's transactions in
    commit order, layered over the optional seed `registry` (for
    tables declared in an earlier chunk — the schema-history input).
    A failed chunk quarantines as ONE error row; its transactions are
    all-or-nothing by design.
    """
    from debezium_server_spark.functions.pgoutput_codec import (
        assemble_streamed_transactions,
    )

    seed = dict(registry or {})

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for chunk_id, blob in zip(pdf["chunk_id"], pdf["blob"]):
                chunk_id = int(chunk_id)
                try:
                    blob = bytes(blob)
                    msgs, pos = [], 0
                    while pos < len(blob):
                        n = int.from_bytes(blob[pos:pos + 4], "big")
                        frame = blob[pos + 4:pos + 4 + n]
                        if len(frame) != n:
                            raise EOFError("truncated chunk frame")
                        msgs.append(frame)
                        pos += 4 + n
                    committed = assemble_streamed_transactions(
                        msgs, protocol_version=protocol_version)
                    reg = dict(seed)
                    for xid in sorted(
                            committed,
                            key=lambda x: committed[x]["commit"]
                            .get("commit_lsn", 0)):
                        txn = committed[xid]
                        ts_ms = (txn["commit"]["commit_ts_us"]
                                 + PG_EPOCH_OFFSET_US) // 1000
                        i = 0
                        for m in txn["messages"]:
                            if m["type"] == "R":
                                reg[m["relation_oid"]] = m
                                continue
                            if m["type"] == "T":
                                # same op='t' routing as the batch path
                                for oid in m["relation_oids"]:
                                    rel = reg[oid]
                                    out.append((
                                        chunk_id, xid, i,
                                        f"{rel['namespace']}"
                                        f".{rel['relation_name']}",
                                        "t", None, None, ts_ms, None))
                                    i += 1
                                continue
                            if m["type"] not in _OP_OF:
                                continue
                            rel = reg[m["relation_oid"]]
                            dest = (f"{rel['namespace']}"
                                    f".{rel['relation_name']}")
                            tj = (lambda tup: _row_json(rel, tup))
                            before = (tj(m["old_tuple"])
                                      if m.get("old_tuple") is not None
                                      else None)
                            after = (tj(m["new_tuple"])
                                     if m.get("new_tuple") is not None
                                     else None)
                            out.append((chunk_id, xid, i, dest,
                                        _OP_OF[m["type"]], before,
                                        after, ts_ms, None))
                            i += 1
                except Exception as exc:
                    out.append((chunk_id, None, 0, None, None, None,
                                None, None,
                                f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(out, columns=[f.name
                                             for f in _CHUNK_SCHEMA])

    return chunks.mapInPandas(go, _CHUNK_SCHEMA)


def decode_pgoutput_changelog(msgs: DataFrame,
                              band_width: int = 4096,
                              registry: dict[int, dict] | None = None
                              ) -> DataFrame:
    """Full decode: `(seq, data)` WAL-message frame → envelope frame
    `(seq, destination, op, before, after, error, xid, ts_ms)`.

    Quarantined rows (error != null) carry null envelope fields; feed
    `.filter("error is null")` into the pipeline and route the rest to
    a dead-letter sink, mirroring `file_source.py`'s convention.

    Pass `registry` explicitly when the Relation declarations are
    already known (streaming frames, schema history, synthesized WAL)
    — it skips the registry collect pass over `msgs`, the
    `decode_binlog_changelog` convention.
    """
    if registry is None:
        registry = load_relation_registry(msgs)
    data = decode_data_messages(msgs, registry)
    begins = extract_begins(msgs)
    return attach_transactions(data, begins, band_width=band_width)

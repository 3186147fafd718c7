"""Spark surface of the pgoutput decode: WAL-message frame → envelope
frame, including multi-table routing, transaction association via the
Begin-interval band join, op-code direction pins, and the corrupt-
message quarantine convention."""

import json

import pytest
from pyspark.sql import types as T

from debezium_server_spark.functions.pgoutput_codec import (
    PG_EPOCH_OFFSET_US,
    encode_message,
)
from debezium_server_spark.sources.pgoutput_source import (
    decode_pgoutput_changelog,
    extract_relations,
    load_relation_registry,
)

REL_A = {
    "type": "R", "relation_oid": 100, "namespace": "public",
    "relation_name": "acct", "replica_identity": "d",
    "columns": [
        {"key": True, "name": "id", "type_oid": 20, "type_mod": -1},
        {"key": False, "name": "bal", "type_oid": 20, "type_mod": -1},
    ],
}
REL_B = {
    "type": "R", "relation_oid": 200, "namespace": "sales",
    "relation_name": "orders", "replica_identity": "d",
    "columns": [
        {"key": True, "name": "oid", "type_oid": 20, "type_mod": -1},
        {"key": False, "name": "status", "type_oid": 25, "type_mod": -1},
    ],
}


def _wal(spark, rows):
    schema = T.StructType([T.StructField("seq", T.LongType()),
                           T.StructField("data", T.BinaryType())])
    return spark.createDataFrame(
        [(s, bytearray(encode_message(m) if isinstance(m, dict) else m))
         for s, m in rows], schema)


@pytest.fixture(scope="module")
def decoded(spark):
    rows = [
        (1, REL_A),
        (2, REL_B),
        # txn 501: insert into acct, update acct — interval [10, 19]
        (10, {"type": "B", "final_lsn": 19, "commit_ts_us": 1_000_000,
              "xid": 501}),
        (11, {"type": "I", "relation_oid": 100,
              "new_tuple": [("t", "1"), ("t", "250")]}),
        (12, {"type": "U", "relation_oid": 100,
              "new_tuple": [("t", "1"), ("t", "175")]}),
        (19, {"type": "C", "flags": 0, "commit_lsn": 18, "end_lsn": 19,
              "commit_ts_us": 1_000_000}),
        # txn 502: delete from acct (key-only), insert into orders —
        # interval [4100, 4102]: crosses the 4096 band boundary, so the
        # Begin must explode to two buckets for the join to find it
        (4100, {"type": "B", "final_lsn": 4102, "commit_ts_us": 2_000_000,
                "xid": 502}),
        (4101, {"type": "D", "relation_oid": 100, "old_tag": "K",
                "old_tuple": [("t", "1"), ("n", None)]}),
        (4102, {"type": "I", "relation_oid": 200,
                "new_tuple": [("t", "9"), ("t", "open")]}),
        # corrupt record in the middle of the data pass ('I' tag, junk)
        (5000, b"I\x00\x00"),
    ]
    return decode_pgoutput_changelog(_wal(spark, rows)).collect()


def test_relation_registry_bounded_extract(spark):
    msgs = _wal(spark, [(1, REL_A), (2, REL_B)])
    rels = {r["relation_oid"]: r for r in extract_relations(msgs).collect()}
    assert rels[100]["relation_name"] == "acct"
    assert json.loads(rels[200]["columns_json"])[0]["name"] == "oid"
    reg = load_relation_registry(msgs)
    assert reg[100]["columns"][1]["name"] == "bal"


def test_latest_relation_version_wins(spark):
    rel_v2 = dict(REL_A, columns=REL_A["columns"]
                  + [{"key": False, "name": "extra", "type_oid": 25,
                      "type_mod": -1}])
    reg = load_relation_registry(_wal(spark, [(1, REL_A), (5, rel_v2)]))
    assert [c["name"] for c in reg[100]["columns"]] == ["id", "bal", "extra"]


def test_op_codes_pinned(decoded):
    # direction pin: Insert → 'c', Update → 'u', Delete → 'd'
    # (MilvusChangeConsumer.java:133-146 dispatch)
    by_seq = {r["seq"]: r for r in decoded}
    assert by_seq[11]["op"] == "c"
    assert by_seq[12]["op"] == "u"
    assert by_seq[4101]["op"] == "d"


def test_destinations_route_per_relation(decoded):
    by_seq = {r["seq"]: r for r in decoded}
    assert by_seq[11]["destination"] == "public.acct"
    assert by_seq[4102]["destination"] == "sales.orders"


def test_images_typed_and_key_only_delete(decoded):
    by_seq = {r["seq"]: r for r in decoded}
    assert json.loads(by_seq[11]["after"]) == {"id": 1, "bal": 250}
    assert by_seq[11]["before"] is None  # insert: no old image
    # delete: before carries ONLY the key, after is null
    assert json.loads(by_seq[4101]["before"]) == {"id": 1, "bal": None}
    assert by_seq[4101]["after"] is None


def test_transaction_association_across_band_boundary(decoded):
    by_seq = {r["seq"]: r for r in decoded}
    assert by_seq[11]["xid"] == 501 and by_seq[12]["xid"] == 501
    # txn 502 spans band buckets 1 and 2 (4096-wide): both rows matched
    assert by_seq[4101]["xid"] == 502 and by_seq[4102]["xid"] == 502
    assert by_seq[11]["ts_ms"] == (1_000_000 + PG_EPOCH_OFFSET_US) // 1000
    assert by_seq[4102]["ts_ms"] == (2_000_000 + PG_EPOCH_OFFSET_US) // 1000


def test_corrupt_message_quarantined_not_fatal(decoded):
    by_seq = {r["seq"]: r for r in decoded}
    bad = by_seq[5000]
    assert bad["error"] and bad["destination"] is None
    # healthy rows unaffected
    assert sum(1 for r in decoded if r["error"] is None) == 4


def test_envelope_row_count(decoded):
    # 4 data messages + 1 quarantined; B/C/R rows never reach the
    # envelope frame
    assert len(decoded) == 5


def test_truncate_routes_one_row_per_table(spark):
    rows = [
        (1, REL_A), (2, REL_B),
        (10, {"type": "B", "final_lsn": 12, "commit_ts_us": 5, "xid": 9}),
        (11, {"type": "T", "options": 0, "relation_oids": [100, 200]}),
    ]
    out = decode_pgoutput_changelog(_wal(spark, rows)).collect()
    ts = sorted((r["destination"], r["op"]) for r in out)
    assert ts == [("public.acct", "t"), ("sales.orders", "t")]
    assert all(r["before"] is None and r["after"] is None for r in out)
    assert all(r["xid"] == 9 for r in out)  # truncate rides its txn


def test_pgoutput_streaming_pipeline_to_upsert_state(spark, tmp_path):
    """The wire format as a STREAMING source: WAL-message parquet files
    → decode stage (registry closed over — the streaming shape, since
    a stream cannot collect) → typed envelope → Pipeline →
    ParquetUpsertSink → materialized latest-wins state. This is the
    reference's whole job on one real wire format."""
    from pyspark.sql import functions as F

    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
    from debezium_server_spark.sources.pgoutput_source import (
        decode_data_messages,
    )
    from debezium_server_spark.streaming.pipeline import Pipeline

    msgs = [
        (1, REL_A),
        (11, {"type": "I", "relation_oid": 100,
              "new_tuple": [("t", "1"), ("t", "100")]}),
        (12, {"type": "I", "relation_oid": 100,
              "new_tuple": [("t", "2"), ("t", "200")]}),
        (13, {"type": "U", "relation_oid": 100,
              "new_tuple": [("t", "1"), ("t", "150")]}),
        (14, {"type": "D", "relation_oid": 100, "old_tag": "K",
              "old_tuple": [("t", "2"), ("n", None)]}),
    ]
    batch = _wal(spark, msgs)
    registry = load_relation_registry(batch)

    src = str(tmp_path / "wal")
    batch.write.parquet(src)
    stream = (spark.readStream.schema("seq long, data binary")
              .parquet(src))

    env = decode_data_messages(stream, registry).filter(
        "error is null")
    row_id = F.get_json_object(
        F.coalesce("after", "before"), "$.id").cast("long")
    typed = env.select(
        F.col("destination"),
        F.struct(row_id.alias("id")).alias("key"),
        F.struct(
            F.col("op"),
            F.when(
                F.col("after").isNotNull(),
                F.struct(
                    F.get_json_object("after", "$.id").cast("long")
                     .alias("id"),
                    F.get_json_object("after", "$.bal").cast("long")
                     .alias("bal"))).alias("after"),
            F.struct(F.col("seq").alias("lsn")).alias("source"),
            F.col("seq").alias("ts_ms")).alias("value"))

    sink = ParquetUpsertSink(root_path=str(tmp_path / "state"),
                             key_fields=("id",))
    q = Pipeline(typed).start(sink, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)

    state = {r["id"]: r["bal"]
             for r in sink.read_table(spark, "public.acct").collect()}
    assert state == {1: 150}  # update won, delete removed key 2


def test_streamed_chunk_decode_commit_order_and_abort(spark):
    """Protocol-v2 chunks: interleaved segments reassemble per chunk,
    only COMMITTED transactions emit (Debezium's buffer-until-commit),
    in-chunk Relation declarations apply in commit order, and a corrupt
    chunk quarantines as one all-or-nothing error row."""
    import struct

    from debezium_server_spark.sources.pgoutput_source import (
        decode_streamed_chunks,
    )

    def chunk(msgs):
        frames = [encode_message(m) for m in msgs]
        return b"".join(struct.pack(">i", len(f)) + f for f in frames)

    good = chunk([
        {"type": "S", "xid": 900, "first_segment": True},
        dict(REL_A, stream_xid=900),  # relation declared IN-stream
        {"type": "I", "relation_oid": 100, "stream_xid": 900,
         "new_tuple": [("t", "1"), ("t", "10")]},
        {"type": "E"},
        {"type": "S", "xid": 901, "first_segment": True},
        {"type": "I", "relation_oid": 100, "stream_xid": 901,
         "new_tuple": [("t", "2"), ("t", "20")]},
        {"type": "E"},
        {"type": "S", "xid": 900, "first_segment": False},
        {"type": "D", "relation_oid": 100, "stream_xid": 900,
         "old_tag": "K", "old_tuple": [("t", "1"), ("n", None)]},
        {"type": "E"},
        {"type": "c", "xid": 900, "flags": 0, "commit_lsn": 99,
         "end_lsn": 100, "commit_ts_us": 2_000_000},
        {"type": "A", "xid": 901, "subxid": 901},  # 901 aborts
    ])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\x00\x00\x00\x05ab"))],
        "chunk_id long, blob binary")
    rows = decode_streamed_chunks(df).collect()
    ok = sorted((r for r in rows if r["error"] is None),
                key=lambda r: r["row_idx"])
    assert [(r["xid"], r["op"]) for r in ok] == [(900, "c"), (900, "d")]
    assert json.loads(ok[0]["after"]) == {"id": 1, "bal": 10}
    assert ok[0]["destination"] == "public.acct"
    assert ok[0]["ts_ms"] == (2_000_000 + PG_EPOCH_OFFSET_US) // 1000
    # aborted xid 901 emits NOTHING
    assert not [r for r in rows if r["xid"] == 901]
    bad = [r for r in rows if r["error"] is not None]
    assert len(bad) == 1 and bad[0]["chunk_id"] == 2


def test_unchanged_toast_projects_sentinel_not_null(spark):
    """Round-5 self-review finding: 'u' (unchanged TOAST) columns must
    surface as the Debezium sentinel, not SQL NULL — an upsert must
    never overwrite real data with NULL for a value the WAL didn't
    ship."""
    from debezium_server_spark.functions.pgoutput_codec import (
        UNCHANGED_TOAST_VALUE,
    )

    rows = [
        (1, REL_A),
        (10, {"type": "B", "final_lsn": 12, "commit_ts_us": 5,
              "xid": 9}),
        (11, {"type": "U", "relation_oid": 100,
              "new_tuple": [("t", "1"), ("u", None)]}),
        (12, {"type": "U", "relation_oid": 100,
              "new_tuple": [("t", "2"), ("n", None)]}),  # real NULL
    ]
    out = {r["seq"]: r for r in
           decode_pgoutput_changelog(_wal(spark, rows)).collect()}
    assert json.loads(out[11]["after"]) == {
        "id": 1, "bal": UNCHANGED_TOAST_VALUE}
    assert json.loads(out[12]["after"]) == {"id": 2, "bal": None}


def test_binary_format_tuple_columns_typed_or_base64(spark):
    """A `binary = true` pgoutput capture ships 'b' tuple columns.
    Mapped OIDs decode TYPED (the binary SEND formats — here int8);
    unmapped OIDs stay bytes and project as base64 text instead of
    making json.dumps quarantine the row (ADVICE r5)."""
    import base64
    import struct as _s

    from debezium_server_spark.functions.pgoutput_codec import (
        encode_binary_value,
    )

    payload = b"\x01\x02\xff\x00!"  # opaque custom-type value
    rel = {"type": "R", "relation_oid": 300, "namespace": "public",
           "relation_name": "binacct", "replica_identity": "d",
           "columns": [
               {"key": True, "name": "id", "type_oid": 20,
                "type_mod": -1},
               {"key": False, "name": "blob", "type_oid": 99999,
                "type_mod": -1},
           ]}
    rows = [
        (1, rel),
        (10, {"type": "B", "final_lsn": 12, "commit_ts_us": 5,
              "xid": 9}),
        (11, {"type": "I", "relation_oid": 300,
              "new_tuple": [("b", encode_binary_value(20, 77)),
                            ("b", payload)]}),
        # wrong-length binary int8 must QUARANTINE, not mint a value
        (12, {"type": "I", "relation_oid": 300,
              "new_tuple": [("b", b"\x01\x02"), ("n", None)]}),
    ]
    assert encode_binary_value(20, 77) == _s.pack(">q", 77)
    out = {r["seq"]: r for r in
           decode_pgoutput_changelog(_wal(spark, rows)).collect()}
    assert out[11]["error"] is None
    assert json.loads(out[11]["after"]) == {
        "id": 77, "blob": base64.b64encode(payload).decode("ascii")}
    assert out[12]["error"] is not None

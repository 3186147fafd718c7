"""Config-driven assembly: properties → running pipeline (the reference's
operating model — config/application.properties is the whole program)."""

import json

import pytest

from pyspark.sql import types as T

from debezium_server_spark.assembly import build_pipeline, build_transform_chain
from debezium_server_spark.config import PipelineConfig

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)
KEY = T.StructType([T.StructField("id", T.LongType())])


def _write_changelog(path, events):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "events.jsonl", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _event(i, name, dest="inv.customers", lsn=None):
    return {
        "destination": dest,
        "key": {"id": i},
        "value": {"op": "c", "before": None, "after": {"id": i, "name": name},
                  "source": {"lsn": lsn or i}, "ts_ms": i},
        "headers": [],
        "partition": 0,
    }


def test_end_to_end_from_properties(spark, tmp_path):
    _write_changelog(
        tmp_path / "log",
        [_event(1, "alice"), _event(2, "bob"), _event(3, "carol", dest="inv.other")],
    )
    props = {
        "debezium.source.type": "changelog-dir",
        "debezium.source.path": str(tmp_path / "log"),
        "debezium.transforms": "route",
        "debezium.transforms.route.type": "route_rename",
        "debezium.transforms.route.pattern": r"^inv\.",
        "debezium.transforms.route.replacement": "cdc.",
        "debezium.sink.type": "parquet-upsert",
        "debezium.sink.parquet-upsert.root.path": str(tmp_path / "tables"),
        "debezium.sink.parquet-upsert.key.fields": "id",
    }
    pipeline, sink, signals = build_pipeline(spark, props, ROW, KEY)
    assert signals is None
    q = pipeline.start(sink, checkpoint_location=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r["id"]: r["name"] for r in sink.read_table(spark, "cdc.customers").collect()}
    assert got == {1: "alice", 2: "bob"}
    assert sink.read_table(spark, "cdc.other").count() == 1


def test_missing_sink_type_fails_boot(spark, tmp_path):
    with pytest.raises(KeyError, match="debezium.sink.type"):
        build_pipeline(
            spark, {"debezium.source.path": str(tmp_path)}, ROW, KEY
        )


def test_unknown_transform_type_fails(spark):
    cfg = PipelineConfig(
        {"debezium.transforms": "x", "debezium.transforms.x.type": "nope"}, env={}
    )
    with pytest.raises(ValueError, match="unknown type"):
        build_transform_chain(cfg)


def test_predicate_gated_transform(spark, tmp_path):
    """The TestConfigSource.java:75-85 shape: a transform gated by a
    destination predicate applies only to matching events."""
    from pyspark.sql import Row

    from debezium_server_spark.schema import event_schema

    cfg = PipelineConfig(
        {
            "debezium.transforms": "mask",
            "debezium.transforms.mask.type": "mask_field",
            "debezium.transforms.mask.field": "after.name",
            "debezium.transforms.mask.predicate": "destination = 'inv.secret'",
        },
        env={},
    )
    chain = build_transform_chain(cfg)
    df = spark.createDataFrame(
        [
            ("inv.secret", {"id": 1},
             {"op": "c", "before": None, "after": {"id": 1, "name": "hidden"},
              "source": {"lsn": 1}, "ts_ms": 1}, [], 0),
            ("inv.open", {"id": 2},
             {"op": "c", "before": None, "after": {"id": 2, "name": "visible"},
              "source": {"lsn": 2}, "ts_ms": 2}, [], 0),
        ],
        event_schema(ROW, KEY),
    )
    out = {r["destination"]: r["value"]["after"]["name"] for r in chain.apply(df).collect()}
    assert out["inv.secret"] == "****"
    assert out["inv.open"] == "visible"


def test_format_stage_from_properties(spark, tmp_path):
    """debezium.format.value=avro with a schema id: the pipeline's last
    stage serializes key/value to Confluent-framed Avro binary before
    the sink sees the frame."""
    from debezium_server_spark.functions.avro_codec import avro_schema_of, decode

    _write_changelog(tmp_path / "log", [_event(1, "alice"), _event(2, "bob")])
    props = {
        "debezium.source.type": "changelog-dir",
        "debezium.source.path": str(tmp_path / "log"),
        "debezium.format.value": "avro",
        "debezium.format.value.schema.id": "41",
        "debezium.sink.type": "parquet-append",
        "debezium.sink.parquet-append.root.path": str(tmp_path / "out"),
    }
    pipeline, sink, _ = build_pipeline(spark, props, ROW, KEY)
    plan = pipeline.plan()
    value_schema = ["null", avro_schema_of(
        # the pre-serialization value struct drives the schema
        __import__("debezium_server_spark.schema", fromlist=["event_schema"])
        .event_schema(ROW, KEY)["value"].dataType, "Value")]
    q = pipeline.start(sink, checkpoint_location=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert rows
    for r in rows:
        schema_id, v = decode(bytes(r["value"]), value_schema, framed=True)
        assert schema_id == 41
        assert v["after"]["name"] in ("alice", "bob")


def test_build_pipeline_with_python_datasource(spark, tmp_path):
    import json
    import os

    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig

    src = str(tmp_path / "log")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write(json.dumps({"destination": "t.a", "key": {"id": 1},
                            "value": {"op": "c"}, "headers": [], "partition": 0}) + "\n")
    cfg = PipelineConfig({
        "debezium.source.type": "debezium-changelog",
        "debezium.source.path": src,
    })
    stream = build_source(spark, cfg)
    assert stream.isStreaming
    assert set(stream.columns) == {"destination", "key", "value", "headers", "partition"}


def _wire_dir(spark, tmp_path, rows):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("seq", T.LongType()),
                           T.StructField("data", T.BinaryType())])
    src = str(tmp_path / "wal")
    spark.createDataFrame([(s, bytearray(b)) for s, b in rows],
                          schema).write.parquet(src)
    return src


def _drain(spark, stream, tmp_path, name):
    """availableNow the raw envelope stream into memory rows."""
    q = (stream.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_build_pgoutput_wal_source(spark, tmp_path):
    import json

    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig
    from debezium_server_spark.functions.pgoutput_codec import encode_message

    rel = {"type": "R", "relation_oid": 1, "namespace": "public",
           "relation_name": "t", "replica_identity": "d",
           "columns": [{"key": True, "name": "id", "type_oid": 20,
                        "type_mod": -1}]}
    src = _wire_dir(spark, tmp_path, [
        (1, encode_message(rel)),
        (2, encode_message({"type": "I", "relation_oid": 1,
                            "new_tuple": [("t", "5")]})),
        (3, encode_message({"type": "D", "relation_oid": 1,
                            "old_tag": "K", "old_tuple": [("t", "5")]})),
    ])
    cfg = PipelineConfig({"debezium.source.type": "pgoutput-wal",
                          "debezium.source.path": src})
    stream = build_source(spark, cfg)
    assert stream.isStreaming
    assert stream.columns == ["destination", "key", "value"]
    rows = _drain(spark, stream, tmp_path, "pg_wire")
    vals = {json.loads(r["value"])["source"]["lsn"]:
            json.loads(r["value"]) for r in rows}
    assert vals[2]["op"] == "c" and json.loads(vals[2]["after"]) == {"id": 5}
    assert vals[3]["op"] == "d" and "after" not in vals[3]
    assert all(r["destination"] == "public.t" for r in rows)


def test_wire_source_dead_letter_routing(spark, tmp_path):
    """ADVICE r5 (medium): quarantined rows must not silently vanish —
    with debezium.source.dead.letter.destination set, a data message
    referencing a relation OID absent from the startup-frozen registry
    routes to the DLQ destination as an {error, lsn} row; without the
    option the pre-r6 drop behavior stands."""
    import json

    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig
    from debezium_server_spark.functions.pgoutput_codec import encode_message

    rel = {"type": "R", "relation_oid": 1, "namespace": "public",
           "relation_name": "t", "replica_identity": "d",
           "columns": [{"key": True, "name": "id", "type_oid": 20,
                        "type_mod": -1}]}
    src = _wire_dir(spark, tmp_path, [
        (1, encode_message(rel)),
        (2, encode_message({"type": "I", "relation_oid": 1,
                            "new_tuple": [("t", "5")]})),
        # OID 99 was never declared → registry miss → quarantine
        (3, encode_message({"type": "I", "relation_oid": 99,
                            "new_tuple": [("t", "6")]})),
    ])
    props = {"debezium.source.type": "pgoutput-wal",
             "debezium.source.path": src,
             "debezium.source.dead.letter.destination": "__dlq__"}
    rows = _drain(spark, build_source(spark, PipelineConfig(props)),
                  tmp_path, "pg_dlq")
    by_dest = {}
    for r in rows:
        by_dest.setdefault(r["destination"], []).append(
            json.loads(r["value"]))
    assert [v["op"] for v in by_dest["public.t"]] == ["c"]
    (dead,) = by_dest["__dlq__"]
    assert dead["lsn"] == 3 and "99" in dead["error"]
    # unset → dropped (prior behavior)
    del props["debezium.source.dead.letter.destination"]
    rows2 = _drain(spark, build_source(spark, PipelineConfig(props)),
                   tmp_path, "pg_nodlq")
    assert {r["destination"] for r in rows2} == {"public.t"}


def test_build_oplog_bson_source(spark, tmp_path):
    import json

    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig
    from debezium_server_spark.functions.bson_codec import (
        BsonTimestamp, encode)

    src = _wire_dir(spark, tmp_path, [
        (1, encode({"ts": BsonTimestamp(9, 1), "t": 1, "v": 2, "op": "i",
                    "ns": "db.c", "o": {"_id": 4, "x": "y"}})),
    ])
    cfg = PipelineConfig({"debezium.source.type": "oplog-bson",
                          "debezium.source.path": src})
    rows = _drain(spark, build_source(spark, cfg), tmp_path, "mongo_wire")
    v = json.loads(rows[0]["value"])
    assert rows[0]["destination"] == "db.c" and v["op"] == "c"
    assert v["ts_ms"] == 9000 and json.loads(v["after"]) == {"_id": 4,
                                                             "x": "y"}


def test_build_mysql_binlog_source(spark, tmp_path):
    import json

    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig
    from debezium_server_spark.functions.binlog_codec import (
        T_LONGLONG, T_VARCHAR, encode_event)

    cols = [{"type": T_LONGLONG, "nullable": False},
            {"type": T_VARCHAR, "meta": 32, "nullable": True}]
    src = _wire_dir(spark, tmp_path, [
        (1, encode_event({"type": "table_map", "table_id": 5,
                          "schema": "db", "table": "t", "columns": cols,
                          "timestamp": 7, "log_pos": 1})),
        (2, encode_event({"type": "write_rows", "table_id": 5,
                          "columns": cols, "rows": [[1, "a"]],
                          "timestamp": 7, "log_pos": 2})),
    ])
    cfg = PipelineConfig({
        "debezium.source.type": "mysql-binlog",
        "debezium.source.path": src,
        "debezium.source.binlog.names": json.dumps(
            {"db.t": ["id", "name"]}),
    })
    rows = _drain(spark, build_source(spark, cfg), tmp_path, "my_wire")
    v = json.loads(rows[0]["value"])
    assert rows[0]["destination"] == "db.t"
    assert v["op"] == "c" and json.loads(v["after"]) == {"id": 1,
                                                         "name": "a"}
    assert v["ts_ms"] == 7000


def test_build_mysql_binlog_source_compressed_transactions(spark, tmp_path):
    """binlog_transaction_compression=ON capture through the assembly
    source: the WHOLE wire is TRANSACTION_PAYLOAD events (no bare
    TABLE_MAP anywhere — the startup registry pre-read finds zero
    declarations) and the stream still decodes, from the payloads'
    own embedded TABLE_MAPs."""
    import json

    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig
    from debezium_server_spark.functions.binlog_codec import (
        T_LONGLONG,
        T_VARCHAR,
        encode_event,
    )

    cols = [{"type": T_LONGLONG, "nullable": False},
            {"type": T_VARCHAR, "meta": 32, "nullable": True}]
    tmap = {"type": "table_map", "table_id": 5, "schema": "db",
            "table": "t", "columns": cols, "timestamp": 7, "log_pos": 1}

    def tx(seq, comp, rows_ev):
        return (seq, encode_event({
            "type": "transaction_payload", "compression": comp,
            "events": [tmap, rows_ev,
                       {"type": "xid", "xid": seq, "timestamp": 7,
                        "log_pos": 9}],
            "timestamp": 7, "log_pos": seq}))

    src = _wire_dir(spark, tmp_path, [
        tx(1, "zstd", {"type": "write_rows", "table_id": 5,
                       "columns": cols, "rows": [[1, "a"], [2, "b"]],
                       "timestamp": 7, "log_pos": 2}),
        tx(2, "none", {"type": "delete_rows", "table_id": 5,
                       "columns": cols, "rows": [[1, "a"]],
                       "timestamp": 8, "log_pos": 3}),
    ])
    cfg = PipelineConfig({
        "debezium.source.type": "mysql-binlog",
        "debezium.source.path": src,
        "debezium.source.binlog.names": json.dumps(
            {"db.t": ["id", "name"]}),
    })
    rows = _drain(spark, build_source(spark, cfg), tmp_path, "my_ctx")
    vals = [json.loads(r["value"]) for r in rows]
    assert sorted(v["op"] for v in vals) == ["c", "c", "d"]
    afters = {v["after"] for v in vals if v["op"] == "c"}
    assert {json.dumps({"id": 1, "name": "a"}, separators=(",", ":")),
            json.dumps({"id": 2, "name": "b"}, separators=(",", ":"))
            } == afters
    (d,) = [v for v in vals if v["op"] == "d"]
    assert json.loads(d["before"]) == {"id": 1, "name": "a"}
    assert all(r["destination"] == "db.t" for r in rows)

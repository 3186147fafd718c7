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

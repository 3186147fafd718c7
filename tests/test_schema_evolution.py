"""Schema drift through the upsert sink: upstream ADD COLUMN widens the
state table in place; events missing a column leave nulls (the
reference's dynamic per-event schemas, SURVEY.md §1.5)."""

from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink

DEST = "s.inventory.items"


def _frame(spark, rows, after_schema):
    schema = (
        "destination string, key struct<id:bigint>, "
        f"value struct<op:string, before {after_schema}, after {after_schema}, "
        "source struct<lsn:bigint>, ts_ms bigint>, "
        "headers array<struct<key:string,value:string>>, partition int"
    )
    return spark.createDataFrame(rows, schema)


def _ev(id_, op, after, lsn):
    return (DEST, {"id": id_},
            {"op": op, "before": None, "after": after,
             "source": {"lsn": lsn}, "ts_ms": 1000 + lsn}, [], 0)


def test_add_column_widens_state(spark, tmp_path):
    sink = ParquetUpsertSink(root_path=str(tmp_path / "s"), key_fields=("id",))
    v1 = "struct<id:bigint,name:string>"
    sink(_frame(spark, [
        _ev(1, "c", {"id": 1, "name": "a"}, 1),
        _ev(2, "c", {"id": 2, "name": "b"}, 2),
    ], v1), 0)

    # upstream ALTER TABLE ADD COLUMN tier
    v2 = "struct<id:bigint,name:string,tier:string>"
    sink(_frame(spark, [
        _ev(3, "c", {"id": 3, "name": "c", "tier": "gold"}, 3),
        _ev(1, "u", {"id": 1, "name": "a2", "tier": "silver"}, 4),
    ], v2), 1)

    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["name"] == "a2" and rows[1]["tier"] == "silver"
    assert rows[2]["tier"] is None, "pre-drift row null-filled"
    assert rows[3]["tier"] == "gold"


def test_missing_column_survives_with_nulls(spark, tmp_path):
    sink = ParquetUpsertSink(root_path=str(tmp_path / "s"), key_fields=("id",))
    wide = "struct<id:bigint,name:string,tier:string>"
    sink(_frame(spark, [
        _ev(1, "c", {"id": 1, "name": "a", "tier": "gold"}, 1),
    ], wide), 0)

    narrow = "struct<id:bigint,name:string>"
    sink(_frame(spark, [
        _ev(2, "c", {"id": 2, "name": "b"}, 2),
    ], narrow), 1)

    rows = {r["id"]: r for r in sink.read_table(spark, DEST).collect()}
    assert rows[1]["tier"] == "gold", "old column kept"
    assert rows[2]["tier"] is None, "new row null-filled for dropped column"


class _CaptureSink:
    """Records per-epoch columns + rows the typed frame delivered."""

    name = "capture"

    def __init__(self):
        self.epochs = []

    def __call__(self, df, epoch_id):
        rows = [r.asDict(recursive=True) for r in df.collect()]
        self.epochs.append((epoch_id, df.schema["value"].dataType.fieldNames(), rows))


def test_registry_round_trip_idempotent_ids(tmp_path):
    import json

    from debezium_server_spark.functions.schema_registry import FileSchemaRegistry

    reg = FileSchemaRegistry(str(tmp_path / "registry"))
    s1 = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]})
    s2 = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "name", "type": "string", "nullable": True, "metadata": {}}]})
    a = reg.register("db.items", s1)
    assert (a.id, a.version) == (1, 1)
    assert reg.register("db.items", s1) == a  # idempotent by content
    b = reg.register("db.items", s2)
    assert (b.id, b.version) == (2, 2)
    c = reg.register("db.other", s1)
    assert (c.id, c.version) == (3, 1)  # ids global, versions per subject
    assert reg.latest("db.items") == b
    assert reg.get_by_id(3) == c
    assert [d.version for d in reg.versions("db.items")] == [1, 2]


def test_registry_wire_framing_composes(tmp_path):
    """Registry id + avro_codec wire framing round-trip (Confluent frame:
    magic 0 + big-endian id)."""
    import json

    from debezium_server_spark.functions import avro_codec
    from debezium_server_spark.functions.schema_registry import FileSchemaRegistry

    reg = FileSchemaRegistry(str(tmp_path / "registry"))
    avro_schema = {"type": "record", "name": "Item",
                   "fields": [{"name": "id", "type": "long"}]}
    doc = reg.register("db.items-value", json.dumps(avro_schema), schema_type="avro")
    wire = avro_codec.encode({"id": 7}, avro_schema, schema_id=doc.id)
    schema_id, value = avro_codec.decode(wire, avro_schema, framed=True)
    assert schema_id == doc.id
    assert value == {"id": 7}
    assert json.loads(reg.get_by_id(schema_id).schema) == avro_schema


def test_drift_flows_registry_parse_sink_without_restart(spark, tmp_path):
    """One streaming query, two epochs (maxFilesPerTrigger=1): epoch 0
    registers v1={id,name}; epoch 1's upstream ADD COLUMN (email) is
    detected from the batch keys, v2 registers, and the SAME query's
    next batch delivers the typed email column — no restart."""
    import json

    from debezium_server_spark.functions.schema_registry import (
        FileSchemaRegistry,
        RegistryTypedSink,
    )
    from debezium_server_spark.sources.file_source import raw_changelog_stream

    src = tmp_path / "log"
    src.mkdir()

    def write_file(name, events):
        with open(src / name, "w") as f:
            for ev in events:
                f.write(json.dumps(ev) + "\n")

    write_file("000.jsonl", [
        {"destination": "db.users", "key": {"id": 1},
         "value": {"id": 1, "name": "ann"}, "partition": 0},
    ])
    write_file("001.jsonl", [
        {"destination": "db.users", "key": {"id": 2},
         "value": {"id": 2, "name": "bob", "email": "b@x"}, "partition": 0},
    ])

    reg = FileSchemaRegistry(str(tmp_path / "registry"))
    capture = _CaptureSink()
    sink = RegistryTypedSink(capture, reg, subject="db.users")
    stream = raw_changelog_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        stream.writeStream.queryName("registry-drift")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    non_empty = [(e, cols, rows) for e, cols, rows in capture.epochs if rows]
    assert len(non_empty) == 2, capture.epochs
    (_, cols0, rows0), (_, cols1, rows1) = non_empty
    assert "email" not in cols0 and rows0[0]["value"]["name"] == "ann"
    assert "email" in cols1 and rows1[0]["value"]["email"] == "b@x"

    versions = reg.versions("db.users")
    assert len(versions) == 2
    assert "email" not in versions[0].schema and "email" in versions[1].schema
    # evolved schema keeps v1 field order/types (backward-compatible merge)
    v2_fields = versions[1].struct().fieldNames()
    assert v2_fields[: len(versions[0].struct().fieldNames())] == versions[0].struct().fieldNames()
    # rows carry the schema id they were parsed with
    assert rows0[0]["__schema_id"] == versions[0].id
    assert rows1[0]["__schema_id"] == versions[1].id


def test_compatibility_levels():
    from pyspark.sql import types as T

    from debezium_server_spark.functions.schema_registry import check_compatibility

    base = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ])
    added_nullable = T.StructType(base.fields + [T.StructField("age", T.IntegerType(), True)])
    added_required = T.StructType(base.fields + [T.StructField("age", T.IntegerType(), False)])
    dropped = T.StructType([base.fields[0]])
    widened = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ])
    narrowed = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
    ])

    # BACKWARD: new reader over old data
    assert check_compatibility(base, added_nullable, "BACKWARD")
    assert not check_compatibility(base, added_required, "BACKWARD")
    assert check_compatibility(base, dropped, "BACKWARD")
    assert check_compatibility(narrowed, widened, "BACKWARD")  # int → long widens
    assert not check_compatibility(widened, narrowed, "BACKWARD")

    # FORWARD: old reader over new data. Dropping a NULLABLE field is
    # forward-compatible (old reader fills null — Confluent's field-with-
    # default rule); dropping a REQUIRED field is not.
    assert check_compatibility(base, added_nullable, "FORWARD")
    assert check_compatibility(base, dropped, "FORWARD")
    dropped_required = T.StructType([base.fields[1]])  # writer lost required id
    assert not check_compatibility(base, dropped_required, "FORWARD")
    # FULL: both
    assert check_compatibility(base, added_nullable, "FULL")
    assert not check_compatibility(base, dropped_required, "FULL")
    assert check_compatibility(base, base, "FULL")


def test_register_checked_gates_incompatible(tmp_path):
    from pyspark.sql import types as T

    from debezium_server_spark.functions.schema_registry import (
        FileSchemaRegistry,
        IncompatibleSchemaError,
        register_checked,
    )

    reg = FileSchemaRegistry(str(tmp_path / "reg"))
    v1 = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ])
    doc1 = register_checked(reg, "users", v1)
    assert doc1.version == 1

    # compatible evolution: nullable add
    v2 = T.StructType(v1.fields + [T.StructField("email", T.StringType(), True)])
    doc2 = register_checked(reg, "users", v2)
    assert doc2.version == 2

    # incompatible: required add
    bad = T.StructType(v2.fields + [T.StructField("ssn", T.StringType(), False)])
    import pytest as _pytest

    with _pytest.raises(IncompatibleSchemaError):
        register_checked(reg, "users", bad)
    # registry unchanged after the rejection
    assert reg.latest("users").version == 2


def test_register_checked_transitive_walks_all_versions(tmp_path):
    """BACKWARD checks only v(latest); BACKWARD_TRANSITIVE must also hold
    against every earlier version — a schema readable over v2 but not v1
    passes the former and fails the latter."""
    from pyspark.sql import types as T

    from debezium_server_spark.functions.schema_registry import (
        FileSchemaRegistry,
        IncompatibleSchemaError,
        register_checked,
    )

    reg = FileSchemaRegistry(str(tmp_path / "reg"))
    v1 = T.StructType([T.StructField("id", T.LongType(), False),
                       T.StructField("code", T.StringType(), False)])
    register_checked(reg, "s", v1, "NONE")
    # v2 drops required `code` (fine BACKWARD: new reader ignores it)
    v2 = T.StructType([T.StructField("id", T.LongType(), False)])
    register_checked(reg, "s", v2, "BACKWARD")
    # v3 re-adds `code` as REQUIRED: backward vs v2 fails outright…
    v3 = T.StructType([T.StructField("id", T.LongType(), False),
                       T.StructField("code", T.StringType(), False)])
    import pytest as _pytest

    with _pytest.raises(IncompatibleSchemaError):
        register_checked(reg, "s", v3, "BACKWARD")
    # …but a NULLABLE `note` add passes BACKWARD (vs v2) yet fails
    # FORWARD_TRANSITIVE: v1's reader requires `code`, which v4 writers
    # never produce
    v4 = T.StructType([T.StructField("id", T.LongType(), False),
                       T.StructField("note", T.StringType(), True)])
    register_checked(reg, "s", v4, "BACKWARD")
    v5 = T.StructType([T.StructField("id", T.LongType(), False),
                       T.StructField("extra", T.StringType(), True)])
    with _pytest.raises(IncompatibleSchemaError):
        register_checked(reg, "s", v5, "FORWARD_TRANSITIVE")

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

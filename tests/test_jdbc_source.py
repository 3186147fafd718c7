"""JDBC snapshot source: config surface + envelope wrapping.

The JDBC read itself is `spark.read.jdbc` (no driver jar in this
container), so these tests cover everything around it: include-list
pruning, per-table reader options (select-override → pushed-down query),
and the row→snapshot-event wrapper that any row source shares.
"""

import json

from pyspark.sql import Row

from debezium_server_spark.sources.jdbc_source import (
    SnapshotConfig,
    rows_to_snapshot_events,
    serialize_events,
)


def make_cfg(**kw):
    return SnapshotConfig(url="jdbc:postgresql://db/inventory", **kw)


class TestSnapshotConfig:
    def test_include_list_globs(self):
        cfg = make_cfg(
            tables=["inventory.customers", "inventory.orders", "audit.log"],
            table_include=["inventory.*"],
        )
        assert cfg.included_tables() == ["inventory.customers", "inventory.orders"]

    def test_no_include_list_keeps_all(self):
        cfg = make_cfg(tables=["a.t1", "b.t2"])
        assert cfg.included_tables() == ["a.t1", "b.t2"]

    def test_select_override_becomes_query_option(self):
        # snapshot.select.statement.overrides.<table> → WHERE runs in the DB
        cfg = make_cfg(
            tables=["inventory.products"],
            select_overrides={
                "inventory.products": "SELECT * FROM inventory.products WHERE quantity > 0"
            },
        )
        opts = cfg.reader_options("inventory.products")
        assert opts["query"].endswith("quantity > 0")
        assert "dbtable" not in opts

    def test_partitioned_read_options(self):
        cfg = make_cfg(
            tables=["inventory.orders"],
            partition_column={"inventory.orders": "order_id"},
            num_partitions=16,
        )
        opts = cfg.reader_options("inventory.orders")
        assert opts["dbtable"] == "inventory.orders"
        assert opts["partitionColumn"] == "order_id"
        assert opts["numPartitions"] == "16"

    def test_override_disables_partitioning(self):
        # Spark rejects query+partitionColumn together; override wins
        cfg = make_cfg(
            tables=["t"],
            select_overrides={"t": "SELECT 1"},
            partition_column={"t": "id"},
        )
        assert "partitionColumn" not in cfg.reader_options("t")


class TestSnapshotEvents:
    def test_rows_become_read_events(self, spark):
        rows = spark.createDataFrame(
            [Row(id=1, name="alice"), Row(id=2, name="bob")]
        )
        ev = rows_to_snapshot_events(rows, "inventory.customers", ("id",)).collect()
        assert {e["destination"] for e in ev} == {"cdc.inventory.customers"}
        by_id = {e["key"]["id"]: e for e in ev}
        assert by_id[1]["value"]["op"] == "r"
        assert by_id[1]["value"]["before"] is None  # READ has no before image
        assert by_id[1]["value"]["after"]["name"] == "alice"
        assert by_id[1]["value"]["source"]["snapshot"] == "true"
        assert by_id[1]["value"]["source"]["table"] == "customers"

    def test_composite_key(self, spark):
        rows = spark.createDataFrame([Row(a=1, b="x", v=10)])
        ev = rows_to_snapshot_events(rows, "s.t", ("a", "b")).first()
        assert ev["key"].asDict() == {"a": 1, "b": "x"}

    def test_serialized_union_across_schemas(self, spark):
        """Tables with different row schemas union on the serialized frame
        (the reference's json format path) — the typed frames cannot."""
        t1 = rows_to_snapshot_events(
            spark.createDataFrame([Row(id=1, name="a")]), "s.users", ("id",)
        )
        t2 = rows_to_snapshot_events(
            spark.createDataFrame([Row(sku="X9", qty=5)]), "s.stock", ("sku",)
        )
        union = serialize_events(t1).unionByName(serialize_events(t2))
        rows = union.collect()
        assert len(rows) == 2
        payloads = {r["destination"]: json.loads(r["value"]) for r in rows}
        assert payloads["cdc.s.users"]["after"] == {"id": 1, "name": "a"}
        assert payloads["cdc.s.stock"]["after"] == {"sku": "X9", "qty": 5}
        assert payloads["cdc.s.stock"]["op"] == "r"

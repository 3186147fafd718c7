"""Multi-table CDC through ONE stream: route on the raw envelope, type
each destination group with its own schema at materialization
(SURVEY.md §7.3 hard-part (b) — dynamic per-topic schemas)."""

import json
import os

from pyspark.sql import types as T

from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
from debezium_server_spark.sources.file_source import (
    parse_events,
    raw_changelog_stream,
)

CUSTOMERS = "inv.customers"
PRODUCTS = "inv.products"

CUST_ROW = T.StructType([
    T.StructField("id", T.LongType()), T.StructField("name", T.StringType()),
])
CUST_KEY = T.StructType([T.StructField("id", T.LongType())])
PROD_ROW = T.StructType([
    T.StructField("sku", T.StringType()), T.StructField("price", T.DoubleType()),
])
PROD_KEY = T.StructType([T.StructField("sku", T.StringType())])


def _ev(dest, key, after, lsn, op="c"):
    return {"destination": dest, "key": key,
            "value": {"op": op, "before": None, "after": after,
                      "source": {"lsn": lsn}, "ts_ms": 1000 + lsn},
            "headers": [], "partition": 0}


def test_one_stream_two_schemas_two_tables(spark, tmp_path):
    src = str(tmp_path / "log")
    os.makedirs(src)
    events = [
        _ev(CUSTOMERS, {"id": 1}, {"id": 1, "name": "ann"}, 1),
        _ev(PRODUCTS, {"sku": "ab"}, {"sku": "ab", "price": 9.5}, 2),
        _ev(CUSTOMERS, {"id": 1}, {"id": 1, "name": "anne"}, 3, op="u"),
        _ev(PRODUCTS, {"sku": "cd"}, {"sku": "cd", "price": 1.25}, 4),
    ]
    with open(os.path.join(src, "mixed.jsonl"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    raw = raw_changelog_stream(spark, src)
    cust_sink = ParquetUpsertSink(root_path=str(tmp_path / "cust"),
                                  key_fields=("id",))
    prod_sink = ParquetUpsertSink(root_path=str(tmp_path / "prod"),
                                  key_fields=("sku",))

    def route_and_type(df, epoch_id):
        cust_sink(parse_events(df, CUST_ROW, CUST_KEY, CUSTOMERS), epoch_id)
        prod_sink(parse_events(df, PROD_ROW, PROD_KEY, PRODUCTS), epoch_id)

    q = (
        raw.writeStream.foreachBatch(route_and_type)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cust = {r["id"]: r for r in cust_sink.read_table(spark, CUSTOMERS).collect()}
    prod = {r["sku"]: r for r in prod_sink.read_table(spark, PRODUCTS).collect()}
    assert cust[1]["name"] == "anne", "typed upsert applied per customers schema"
    assert prod["ab"]["price"] == 9.5 and prod["cd"]["price"] == 1.25
    assert set(prod) == {"ab", "cd"}


def test_raw_stream_routes_without_typing(spark, tmp_path):
    """Routing predicates work on the raw frame — no schema needed until
    materialization."""
    src = str(tmp_path / "log")
    os.makedirs(src)
    with open(os.path.join(src, "e.jsonl"), "w") as f:
        f.write(json.dumps(_ev(CUSTOMERS, {"id": 5}, {"id": 5, "name": "x"}, 1)) + "\n")
        f.write(json.dumps(_ev(PRODUCTS, {"sku": "z"}, {"sku": "z", "price": 2.0}, 2)) + "\n")
    rows = []
    q = (
        raw_changelog_stream(spark, src)
        .filter("destination LIKE 'inv.c%'")
        .writeStream.foreachBatch(lambda df, e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r["destination"] for r in rows] == [CUSTOMERS]
    assert json.loads(rows[0]["key_raw"]) == {"id": 5}

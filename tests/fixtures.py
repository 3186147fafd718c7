"""Synthetic change-event fixtures (FIXTURES.md F1/F2): the
inventory.customers golden change log."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from debezium_server_spark.schema import event_schema

CUSTOMERS_ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)
CUSTOMERS_KEY_SCHEMA = T.StructType([T.StructField("id", T.IntegerType(), False)])
DEST = "testc.inventory.customers"

GOLDEN_CUSTOMERS = [
    (1001, "Sally", "Thomas", "sally.thomas@acme.com"),
    (1002, "George", "Bailey", "gbailey@foobar.com"),
    (1003, "Edward", "Walker", "ed@walker.com"),
    (1004, "Anne", "Kretchmar", "annek@noanswer.org"),
]


def _row(vals):
    if vals is None:
        return None
    return {"id": vals[0], "first_name": vals[1], "last_name": vals[2], "email": vals[3]}


def event(key_id, op, before, after, lsn, ts_ms=None, dest=DEST, headers=None, tombstone=False):
    value = None if tombstone else {
        "op": op,
        "before": _row(before),
        "after": _row(after),
        "source": {
            "version": "1.0",
            "connector": "synthetic",
            "name": "testc",
            "ts_ms": ts_ms or (1700000000000 + lsn),
            "db": "inventory",
            "schema": "inventory",
            "table": dest.rsplit(".", 1)[-1],
            "lsn": lsn,
            "snapshot": "true" if op == "r" else "false",
        },
        "ts_ms": ts_ms or (1700000000000 + lsn),
    }
    return {
        "destination": dest,
        "key": {"id": key_id},
        "value": value,
        "headers": headers,
        "partition": 0,
    }


def customers_changelog_events() -> list[dict]:
    """Snapshot reads of the 4 golden rows, then a streaming phase that
    inserts/updates/deletes extra rows so the FINAL state equals the
    golden table (DebeziumServerIT.java:84-88 semantics)."""
    ev = []
    lsn = 0
    # snapshot phase: r for each golden row (with a stale first_name for
    # 1004 so a later update must win)
    snapshot_rows = [
        (1001, "Sally", "Thomas", "sally.thomas@acme.com"),
        (1002, "George", "Bailey", "gbailey@foobar.com"),
        (1003, "Edward", "Walker", "ed@walker.com"),
        (1004, "Annie", "Kretchmar", "annek@noanswer.org"),
    ]
    for row in snapshot_rows:
        lsn += 1
        ev.append(event(row[0], "r", None, row, lsn))
    # streaming phase
    lsn += 1  # insert a row that later gets deleted
    ev.append(event(1005, "c", None, (1005, "Temp", "User", "temp@x.com"), lsn))
    lsn += 1  # correct 1004's first name
    ev.append(
        event(1004, "u", (1004, "Annie", "Kretchmar", "annek@noanswer.org"),
              (1004, "Anne", "Kretchmar", "annek@noanswer.org"), lsn)
    )
    lsn += 1  # delete 1005 (+ tombstone echo)
    ev.append(event(1005, "d", (1005, "Temp", "User", "temp@x.com"), None, lsn))
    ev.append(event(1005, None, None, None, lsn, tombstone=True))
    return ev


def customers_changelog_df(spark: SparkSession, events: list[dict] | None = None) -> DataFrame:
    schema = event_schema(CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    return spark.createDataFrame(events or customers_changelog_events(), schema=schema)

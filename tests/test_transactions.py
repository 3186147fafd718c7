"""Transaction metadata operator (operators/transactions.py)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.transactions import (
    transaction_boundaries,
    with_transaction_metadata,
)


def _events(spark):
    rows = [
        # (lsn, tx, table)
        (1, "tx1", "orders"),
        (2, "tx1", "lineitem"),
        (3, "tx1", "lineitem"),
        (4, "tx2", "orders"),
    ]
    return spark.createDataFrame(rows, "lsn long, tx string, tbl string")


def test_per_event_transaction_block(spark):
    out = with_transaction_metadata(
        _events(spark), F.col("tx"), [F.col("lsn")], F.col("tbl")
    )
    got = {
        r.lsn: (r.transaction.id, r.transaction.total_order,
                r.transaction.data_collection_order)
        for r in out.collect()
    }
    assert got == {
        1: ("tx1", 1, 1),
        2: ("tx1", 2, 1),
        3: ("tx1", 3, 2),
        4: ("tx2", 1, 1),
    }
    # input columns preserved alongside the new struct
    assert set(out.columns) == {"lsn", "tx", "tbl", "transaction"}


def test_boundary_events(spark):
    out = transaction_boundaries(
        _events(spark), F.col("tx"), F.col("lsn"), F.col("tbl")
    ).collect()
    by_key = {(r.tx_id, r.status): r for r in out}
    assert len(out) == 4  # BEGIN+END per tx
    b1, e1 = by_key[("tx1", "BEGIN")], by_key[("tx1", "END")]
    assert b1.pos == 1 and b1.event_count is None and b1.data_collections is None
    assert e1.pos == 3 and e1.event_count == 3
    # per-collection counts, sorted by collection name
    assert [(c.collection, c.n) for c in e1.data_collections] == [
        ("lineitem", 2), ("orders", 1),
    ]
    e2 = by_key[("tx2", "END")]
    assert e2.event_count == 1 and e2.pos == 4

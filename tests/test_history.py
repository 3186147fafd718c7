"""SCD Type-2 history and changelog compaction (operators/history.py) —
the temporal-materialization analogs of the reference's latest-wins sink
application (FlussChangeConsumer.java:170-220)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.history import compact_changelog, scd2_history


def _events(spark, rows):
    return spark.createDataFrame(rows, "key string, op string, state string, lsn long")


def test_scd2_merges_contiguous_runs_and_marks_current(spark):
    df = _events(
        spark,
        [
            ("a", "c", "new", 1),
            ("a", "u", "new", 2),      # unchanged state: same interval
            ("a", "u", "active", 3),
            ("a", "u", "closed", 4),
            ("b", "c", "new", 1),
        ],
    )
    out = scd2_history(
        df, "key", "state", [F.col("lsn")], F.col("lsn")
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(
            (r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    assert by_key["a"] == [
        ("new", 1, 3, 0),
        ("active", 3, 4, 0),
        ("closed", 4, None, 1),
    ]
    assert by_key["b"] == [("new", 1, None, 1)]


def test_compact_composition_rules(spark):
    df = _events(
        spark,
        [
            # c..d cancels out entirely
            ("gone", "c", "", 1), ("gone", "u", "", 2), ("gone", "d", "", 3),
            # c..u -> one create with the last image
            ("fresh", "c", "", 1), ("fresh", "u", "", 2),
            # u..d -> delete
            ("dropped", "u", "", 1), ("dropped", "d", "", 2),
            # u..u -> one update
            ("churned", "u", "", 1), ("churned", "u", "", 2),
            # snapshot read then update behaves like create
            ("seeded", "r", "", 1), ("seeded", "u", "", 2),
        ],
    )
    out = compact_changelog(
        df, "key", F.col("op"), [F.col("lsn")], F.col("lsn").cast("string")
    ).collect()
    got = {r["key"]: (r["net_op"], r["last_image"]) for r in out}
    assert "gone" not in got
    assert got == {
        "fresh": ("c", "2"),
        "dropped": ("d", "2"),
        "churned": ("u", "2"),
        "seeded": ("c", "2"),
    }


def test_compact_single_event_key(spark):
    df = _events(spark, [("solo", "c", "", 1), ("bye", "d", "", 1)])
    out = compact_changelog(
        df, "key", F.col("op"), [F.col("lsn")], F.col("lsn").cast("string")
    ).collect()
    got = {r["key"]: r["net_op"] for r in out}
    # a lone create survives as create; c..d cancellation needs a prior c,
    # so a lone delete stays a delete (the key predates the window)
    assert got == {"solo": "c", "bye": "d"}

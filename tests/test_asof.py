"""as-of join semantics: backward/forward, tolerance, key isolation, ties."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:10", "p1"),
            ("k1", "2024-01-01 10:05:00", "p2"),
            ("k2", "2024-01-01 10:00:00", "p3"),  # k2 has no right rows
        ],
        "key string, ts string, pid string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:00", "c1"),
            ("k1", "2024-01-01 10:00:10", "c2"),  # ties p1 exactly
            ("k1", "2024-01-01 10:04:00", "c3"),
        ],
        "key string, ts string, cid string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_backward_inclusive_and_key_isolation(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r["cid_asof"]
        for r in asof_join(left, right, on="key").collect()
    }
    # p1 matches the equal-timestamp click (inclusive), p2 the latest prior,
    # p3 nothing (no k2 rows ever).
    assert out == {"p1": "c2", "p2": "c3", "p3": None}


def test_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r["cid_asof"]
        for r in asof_join(
            left, right, on="key", tolerance_micros=30_000_000
        ).collect()
    }
    # p2's nearest click is 60s old > 30s tolerance → voided.
    assert out == {"p1": "c2", "p2": None, "p3": None}


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r["cid_asof"]
        for r in asof_join(left, right, on="key", direction="forward").collect()
    }
    # earliest right row at-or-after each left ts
    assert out == {"p1": "c2", "p2": None, "p3": None}

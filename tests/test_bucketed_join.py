"""Bucketed co-located join: the physical plan must be exchange-free —
the layout property that makes repeat joins shuffle-less at 100 TB."""

import pytest
from pyspark.sql import functions as F

from debezium_server_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf — tables land in the session default
    # (spark-warehouse/ under cwd); dropped on teardown
    facts = spark.range(10_000).select(
        (F.col("id") % 997).alias("k"), (F.col("id") * 3).alias("v")
    )
    dims = spark.range(997).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    write_bucketed(facts, "b_facts", "k", n_buckets=8)
    write_bucketed(dims, "b_dims", "k", n_buckets=8)
    yield "b_facts", "b_dims"
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_join_plan_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the test exercises the sort-merge path the
    # layout is designed for (a dim this small would otherwise broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = sorted(map(tuple, bucketed_join(spark, lt, rt, "k").collect()))
    want = sorted(
        map(tuple, spark.table(lt).join(spark.table(rt), "k").collect())
    )
    assert got == want

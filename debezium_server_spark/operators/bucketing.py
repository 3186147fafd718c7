"""Bucketed (co-located) joins — the zero-shuffle repeat-join layout.

At 100 TB the dominant recurring cost of a star/fact pipeline is the
SAME join key shuffling on every run: `orders ⋈ lineitem` on orderkey,
`events ⋈ users` on user_id, CDC batch ⋈ state on the primary key.
Bucketing pays the shuffle ONCE at write time: both tables are hash-
partitioned into the same number of buckets on the join key and each
bucket is sorted, so every subsequent join is a per-bucket sort-merge
with NO Exchange on either side — Spark matches bucket i to bucket i
directly. This is the persistent-layout complement to the engine's
other join strategies (broadcast for bounded dims, salting for skew,
AQE for runtime re-plan); `tests/test_bucketed_join.py` asserts the
exchange-free plan at the physical level.

The upsert sink (`sinks/parquet_sink.py`) applies the same principle to
CDC state — keys hash-bucketed so a micro-batch merge touches only its
buckets; this module exposes the layout for ANALYTIC tables through
Spark's native `bucketBy` catalog support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed+sorted catalog table: hash-partitioned
    into `n_buckets` on `key`, rows sorted by `key` inside each bucket
    (the sort is what lets the join skip its per-bucket re-sort too).
    One shuffle now, zero on every later co-bucketed join."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    matching bucket counts Spark plans a SortMergeJoin whose children
    are bare scans — no Exchange, no Sort; work is bucket-local, so a
    1000-executor cluster streams bucket pairs with zero network cost."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key, how)

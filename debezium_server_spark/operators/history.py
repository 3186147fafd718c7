"""Temporal materialization of a change stream: SCD Type-2 history and
changelog compaction.

The reference applies each change event to the sink as it arrives —
latest-wins upsert/delete per key (FlussChangeConsumer.java:170-220,
MilvusChangeConsumer.java:133-146). Two standard warehouse-side
derivatives of the same keyed changelog are built here:

- **SCD Type-2 history** (`scd2_history`): instead of overwriting, keep
  one row per distinct state interval with `valid_from` / `valid_to` /
  `is_current`. This is what a JDBC-sink user materializes downstream of
  the reference when they need time travel over a dimension.
- **Changelog compaction** (`compact_changelog`): collapse a window of
  events per key to its net effect (Kafka log-compaction semantics, the
  storage model the reference's kafka sink relies on for state topics):
  create+delete cancels out, create+updates → one create with the last
  image, updates → one update, trailing delete wins.

Spark-first shape: both are single-shuffle window/group operations on
the key — no iterative processing, no driver-side state. Order within a
key is (position) — the log sequence number — exactly the per-key
ordering the reference guarantees per partition (SURVEY.md §2.3
"Ordering keys"). At 100 TB the shuffle is bounded by per-key history
size, and both operators are map-side combinable after the first
window pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key: str | Column,
    state: str | Column,
    position: list[Column],
    valid_from: Column,
) -> DataFrame:
    """One row per (key, contiguous state run): Type-2 dimension history.

    `state` is the tracked attribute; consecutive events with an unchanged
    state merge into one interval. `position` breaks ties deterministically
    (lsn / (ts, event_id)). Returns columns: `key`, `state`, `valid_from`,
    `valid_to` (null while current), `is_current`.
    """
    ev = (
        df.withColumn("_key", F.col(key) if isinstance(key, str) else key)
        .withColumn("_state", F.col(state) if isinstance(state, str) else state)
        .withColumn("_from", valid_from)
    )
    w = Window.partitionBy("_key").orderBy(*position)
    changed = ev.withColumn(
        "_chg",
        F.when(
            F.lag("_state").over(w).isNull()
            | (F.lag("_state").over(w) != F.col("_state")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).filter(F.col("_chg") == 1)
    # After the filter, lead() over the same key ordering yields the next
    # interval's start — the end of this one. Same shuffle key, so the
    # second window reuses the partitioning (one exchange total).
    w2 = Window.partitionBy("_key").orderBy(*position)
    return changed.select(
        F.col("_key").alias("key"),
        F.col("_state").alias("state"),
        F.col("_from").alias("valid_from"),
        F.lead("_from").over(w2).alias("valid_to"),
        F.when(F.lead("_from").over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


def compact_changelog(
    df: DataFrame,
    key: str | Column,
    op: Column,
    position: list[Column],
    image: Column,
) -> DataFrame:
    """Net effect per key over the event window (log compaction).

    `op` is the envelope operation (`c`/`r`/`u`/`d`); `image` is the row
    image carried by the surviving event (the `after` payload, or any
    projection of it). Composition rules over the ordered events of a key:

    - first `c` … last `d`  → key never existed for downstream: dropped
    - first `c`/`r` … else  → one `c` with the final image
    - …        … last `d`   → one `d` (tombstone, image of the delete)
    - otherwise             → one `u` with the final image
    """
    ev = (
        df.withColumn("_key", F.col(key) if isinstance(key, str) else key)
        .withColumn("_op", op)
        .withColumn("_img", image)
    )
    w_asc = Window.partitionBy("_key").orderBy(*position)
    w_desc = Window.partitionBy("_key").orderBy(*[c.desc() for c in position])
    ranked = ev.select(
        "_key",
        "_op",
        "_img",
        F.row_number().over(w_asc).alias("_rn_a"),
        F.row_number().over(w_desc).alias("_rn_d"),
    ).filter((F.col("_rn_a") == 1) | (F.col("_rn_d") == 1))
    agg = ranked.groupBy("_key").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col("_op"))).alias("first_op"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("_op"))).alias("last_op"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("_img"))).alias("last_image"),
    )
    net = F.when(
        (F.col("first_op").isin("c", "r")) & (F.col("last_op") == "d"), F.lit(None)
    ).when(F.col("first_op").isin("c", "r"), F.lit("c")).when(
        F.col("last_op") == "d", F.lit("d")
    ).otherwise(F.lit("u"))
    return (
        agg.withColumn("net_op", net)
        .filter(F.col("net_op").isNotNull())
        .select(F.col("_key").alias("key"), "net_op", "last_image")
    )

"""As-of (time-travel) join — a first-class operator Spark lacks.

The CDC shape: align each left row with the most recent right row at or
before its event time, per key ("what was the state/last click/last
quote when this happened"). The reference materializes this implicitly
by replaying the changelog into the sink and letting readers see
latest-state at read time; here it is an explicit, reusable operator.

Implementation is the UNION + ORDERED WINDOW formulation, not a range
join:

    tag left/right → unionByName → window(partitionBy key, orderBy
    (event time, side)) → last(right payload, ignorenulls) → keep left

One shuffle on the key, one sort within partitions, no candidate-pair
blow-up — for each key-partition the cost is O(n log n) regardless of
how far back the match is. A naive `left.ts >= right.ts` range join is
O(n·m) per key and is exactly the plan that dies at 100 TB; the window
formulation is the same trick databases use for MERGE-style as-of scans.
Late/skewed keys shard cleanly because the window never crosses keys.

DuckDB's native `ASOF JOIN` is the oracle twin (see
plans/catalog.py:asof_attribution) — an independent implementation the
driver hash-compares against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_micros: int | None = None,
    right_suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the single right row with the greatest
    `right_ts <= left_ts` (direction="backward"; "forward" mirrors to the
    smallest `right_ts >= left_ts`) within the same `on` key.

    All right columns except the key ride along renamed with
    `right_suffix`; unmatched left rows keep nulls (left-join shape).
    `tolerance_micros` voids matches further than that from the left
    timestamp. Equal timestamps match (inclusive, like DuckDB/pandas).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]

    lk = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rk = F.unix_micros(F.col(right_ts).cast("timestamp"))
    if direction == "forward":
        lk, rk = -lk, -rk
    elif direction != "backward":
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    l_tagged = left.withColumn("_k", lk).withColumn(
        "_payload", F.lit(None).cast(f"struct<_rk:bigint,{_struct_ddl(right, payload_cols)}>")
    )
    r_tagged = right.select(
        *keys,
        rk.alias("_k"),
        F.struct(rk.alias("_rk"), *payload_cols).alias("_payload"),
    )

    # side=0 sorts the right row first at equal _k, making ties inclusive.
    unioned = l_tagged.withColumn("_side", F.lit(1)).unionByName(
        r_tagged.withColumn("_side", F.lit(0)), allowMissingColumns=True
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_k", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_payload", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_micros is not None:
        matched = matched.withColumn(
            "_m",
            F.when(F.col("_k") - F.col("_m._rk") <= tolerance_micros, F.col("_m")),
        )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{c}{right_suffix}") for c in payload_cols]
    return matched.select(*out_cols)


def _struct_ddl(df: DataFrame, cols: list[str]) -> str:
    dt = dict(df.dtypes)
    return ",".join(f"{c}:{dt[c]}" for c in cols)


def _floordiv(col: Column, w: int) -> Column:
    """Mathematical floor division (SQL `div` truncates toward zero, which
    is wrong for negative epochs); pmod keeps it exact integer arithmetic."""
    return ((col - F.pmod(col, F.lit(w))) / F.lit(w)).cast("bigint")


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_micros: int = 0,
    upper_micros: int = 0,
    right_suffix: str = "_r",
    how: str = "left",
) -> DataFrame:
    """Time-range join WITHOUT an equi key: every left row pairs with all
    right rows whose `right_ts ∈ [left_ts + lower, left_ts + upper]`
    (microsecond offsets, inclusive; "clicks in the preceding 5 minutes"
    is `lower=-300e6, upper=0`).

    Naively this is a pure theta-join — Spark compiles it to
    BroadcastNestedLoopJoin, O(n·m) comparisons, the plan that dies at
    100 TB. The scale formulation is *banding*: with band width W =
    upper - lower, a right row at time r can only match left rows in the
    two W-sized epoch buckets floor((r-upper)/W) and floor((r-lower)/W).
    Explode the right side to those ≤2 candidate buckets, hash-join on
    bucket equality (a real equi key: shuffles, AQE, skew handling all
    apply), then re-check the exact range predicate. Each matching pair
    survives exactly once because a right row's candidate buckets are
    distinct. Cost: one ≤2× expansion of the right side + one hash join,
    instead of n·m comparisons.

    Right payload columns arrive suffixed; `how="left"` keeps unmatched
    left rows (count the suffixed key for zero-aware aggregation).
    The reference has no such operator (SURVEY.md §2.6 — no joins); this
    is part of the relational surface Spark adds on top.
    """
    if upper_micros <= lower_micros:
        raise ValueError("upper_micros must be > lower_micros")
    w = upper_micros - lower_micros

    lu = F.unix_micros(F.col(left_ts).cast("timestamp"))
    ru = F.unix_micros(F.col(right_ts).cast("timestamp"))

    l_tagged = left.withColumn("_lu", lu).withColumn("_lb", _floordiv(F.col("_lu"), w))
    r_tagged = (
        right.select(
            F.struct(*right.columns).alias("_rpay"), ru.alias("_ru")
        )
        .withColumn(
            "_cb",
            F.explode(
                F.array_distinct(
                    F.array(
                        _floordiv(F.col("_ru") - upper_micros, w),
                        _floordiv(F.col("_ru") - lower_micros, w),
                    )
                )
            ),
        )
    )
    cond = (
        (l_tagged["_lb"] == r_tagged["_cb"])
        & (r_tagged["_ru"] >= l_tagged["_lu"] + lower_micros)
        & (r_tagged["_ru"] <= l_tagged["_lu"] + upper_micros)
    )
    joined = l_tagged.join(r_tagged, cond, how)
    out: list[Column] = [F.col(c) for c in left.columns]
    out += [F.col(f"_rpay.{c}").alias(f"{c}{right_suffix}") for c in right.columns]
    return joined.select(*out)

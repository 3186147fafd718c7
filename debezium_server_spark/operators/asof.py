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

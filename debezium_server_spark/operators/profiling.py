"""Column profiling: one-pass per-column statistics for pipeline audits.

A training-data pipeline constantly asks "what does this table look
like" — null rates, cardinalities, ranges — before and after every
transform (the reference's analog is schema + queue metrics, but a
table-shaped engine needs table-shaped profiling).

Shape: ONE aggregation pass computes every column's stats as an array of
structs, then a single explode turns them into tidy rows — the scan is
read once no matter how many columns are profiled, all partial
aggregates are map-side combinable.

Cardinality: `exact_distinct=True` does NOT use the k-column
COUNT(DISTINCT) form — Catalyst executes that via EXPAND, k× the input
rows into one shuffle (measured 5× slower on a 16-column lineitem
profile). Instead each column gets its own single-distinct aggregate
(two-phase, map-side partial dedup, no expand) over a column-pruned
scan, all unioned into one job and hash-joined back to the base stats
on the column name (k+1 pruned scans ≈ 2× the bytes of one full scan,
each shuffling only |distinct_c| rows). For routine 100 TB profiling
pass `exact_distinct=False` to use HLL sketches
(`approx_count_distinct`, single pass) — the catalog entry uses exact
mode because the DuckDB oracle must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.functions.text_functions import round4

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _fmt(col: F.Column, dtype: str) -> F.Column:
    """Render a min/max value as a portable string (identical across
    engines: integers bare, doubles floor-rounded shortest-repr, dates
    wall-clock formatted, strings as-is)."""
    if dtype in _INTEGRAL:
        return col.cast("string")
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return round4(col.cast("double")).cast("string")
    if dtype in ("timestamp", "timestamp_ntz", "date"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """→ (column, n_nonnull, n_null, n_distinct, min_value, max_value,
    avg_value); avg_value is NULL for non-numeric columns."""
    columns = columns or df.columns
    dtypes = dict(df.dtypes)
    total = F.count(F.lit(1))
    entries = []
    for c in columns:
        dt = dtypes[c]
        col = F.col(c)
        numeric = dt in _NUMERIC or dt.startswith("decimal")
        avg = (
            round4(F.sum(col.cast("decimal(38,6)")).cast("double") / F.count(col))
            if numeric
            else F.lit(None).cast("double")
        )
        entry = F.struct(
            F.lit(c).alias("column"),
            F.count(col).alias("n_nonnull"),
            (total - F.count(col)).alias("n_null"),
            F.lit(None).cast("long").alias("n_distinct"),
            _fmt(F.min(col), dt).alias("min_value"),
            _fmt(F.max(col), dt).alias("max_value"),
            avg.alias("avg_value"),
        )
        if not exact_distinct:
            entry = F.struct(
                F.lit(c).alias("column"),
                F.count(col).alias("n_nonnull"),
                (total - F.count(col)).alias("n_null"),
                F.approx_count_distinct(col).cast("long").alias("n_distinct"),
                _fmt(F.min(col), dt).alias("min_value"),
                _fmt(F.max(col), dt).alias("max_value"),
                avg.alias("avg_value"),
            )
        entries.append(entry)
    base = (
        df.agg(F.array(*entries).alias("p"))
        .select(F.explode("p").alias("s"))
        .select("s.*")
    )
    if not exact_distinct:
        return base
    # One single-distinct aggregate per column: no EXPAND, each over a
    # column-pruned scan, unioned into one job. Joined back broadcast
    # (k rows) so output shape/ordering matches the one-pass form.
    per_col = None
    for c in columns:
        d = df.select(F.col(c)).agg(
            F.countDistinct(F.col(c)).cast("long").alias("_nd")
        ).select(F.lit(c).alias("column"), "_nd")
        per_col = d if per_col is None else per_col.unionAll(d)
    return (
        base.drop("n_distinct")
        .join(F.broadcast(per_col), "column")
        .select(
            "column",
            "n_nonnull",
            "n_null",
            F.col("_nd").alias("n_distinct"),
            "min_value",
            "max_value",
            "avg_value",
        )
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Exact rank-based percentiles (discrete, ceil convention): for each
    group, `name -> value at row ceil(num/den * n)` when ordered by
    `value_col`. The rank is computed with pure integer arithmetic —
    `ceil(a*n/b) == (a*n + b - 1) div b` — so every engine picks the
    identical row; no interpolation, no float index math (the reason
    engines disagree on percentile_cont at boundaries). Ties in the
    value column are harmless: any row at the target rank carries the
    same value.

    One window pass (row_number + count over the group) and one
    aggregation; at scale this is a single shuffle on the group key and
    an in-partition sort — the same cost as any ordered analytic. For
    sketch-based percentiles at 100 TB use approx_percentile instead;
    this operator is the exact/audit path.
    """
    percentiles = percentiles or {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wn = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("_rn")
                == F.expr(f"({a} * _n + {b} - 1) div {b}"),
                F.col(value_col),
            )
        ).alias(name)
        for name, (a, b) in percentiles.items()
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)


def grouped_xy_stats(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: list[str],
    scales: tuple[int, int] | None = None,
) -> DataFrame:
    """Population covariance / stddevs / Pearson correlation of (x, y)
    per group, computed from EXACT sums: each partial (sum x, sum y,
    sum x², sum y², sum xy, n) is order-independent, map-side
    combinable, one scan — and only the final closed-form formula runs
    in double. Any engine evaluating the same formula over the same
    exact sums produces bit-identical doubles, which is what makes this
    oracle-checkable (a streaming Welford corr is order-dependent and
    is not).

    Two exact-sum strategies:
    - `scales=None`: per-row DECIMAL(38,6) conversion — works for any
      numeric input, but every row materializes a 128-bit decimal.
    - `scales=(px, py)`: fixed-point columns (x integral at scale px, y
      at scale py, e.g. 2-decimal money → py=100). Rows become LONGs
      (`round(v*p)` is exact for p-scaled values), products stay within
      bigint (requires |x·px · y·py| < 1e18 per row), and partials sum
      as long-backed DECIMAL(18,0) — no per-row 128-bit decimal, same
      exactness, measurably faster. The final formula descales the
      double sums by the scale powers (IEEE-deterministic in both
      engines).

    Output: group_cols, n_rows, covar_pop, stddev_x, stddev_y, corr_xy
    (floor-rounded to 4 decimals, [[oracle-parity-rules]])."""

    cx, cy = F.col(x), F.col(y)
    if scales is None:

        def dsum(c: F.Column) -> F.Column:
            return F.sum(c.cast("decimal(38,6)")).cast("double")

        sums = df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(cx).alias("_sx"),
            dsum(cy).alias("_sy"),
            dsum(cx * cx).alias("_sxx"),
            dsum(cy * cy).alias("_syy"),
            dsum(cx * cy).alias("_sxy"),
        )
        sx, sy = F.col("_sx"), F.col("_sy")
        sxx, syy, sxy = F.col("_sxx"), F.col("_syy"), F.col("_sxy")
    else:
        px, py = scales
        xi = F.round(cx * F.lit(px)).cast("long")
        yi = F.round(cy * F.lit(py)).cast("long")

        def isum(c: F.Column) -> F.Column:
            return F.sum(c.cast("decimal(18,0)")).cast("double")

        sums = df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            isum(xi).alias("_sx"),
            isum(yi).alias("_sy"),
            isum(xi * xi).alias("_sxx"),
            isum(yi * yi).alias("_syy"),
            isum(xi * yi).alias("_sxy"),
        )
        fx, fy = float(px), float(py)
        sx, sy = F.col("_sx") / fx, F.col("_sy") / fy
        sxx, syy = F.col("_sxx") / (fx * fx), F.col("_syy") / (fy * fy)
        sxy = F.col("_sxy") / (fx * fy)
    n = F.col("n_rows").cast("double")
    covar = (sxy - sx * sy / n) / n
    var_x = (sxx - sx * sx / n) / n
    var_y = (syy - sy * sy / n) / n
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return sums.select(
        *group_cols,
        "n_rows",
        round4(covar).alias("covar_pop"),
        round4(F.sqrt(var_x)).alias("stddev_x"),
        round4(F.sqrt(var_y)).alias("stddev_y"),
        round4(corr).alias("corr_xy"),
    )

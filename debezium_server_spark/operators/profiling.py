"""Column profiling: one-pass per-column statistics for pipeline audits.

A training-data pipeline constantly asks "what does this table look
like" — null rates, cardinalities, ranges — before and after every
transform (the reference's analog is schema + queue metrics, but a
table-shaped engine needs table-shaped profiling).

Shape: ONE aggregation pass computes every column's stats as an array of
structs, then a single explode turns them into tidy rows — the scan is
read once no matter how many columns are profiled, all partial
aggregates are map-side combinable.

Cardinality: `exact_distinct=True` uses COUNT(DISTINCT col), which
Catalyst executes via EXPAND (k distinct columns ⇒ k× the input rows
into the shuffle). Fine at audit time; for routine 100 TB profiling pass
`exact_distinct=False` to use HLL sketches (`approx_count_distinct`,
single pass, no expand) — the catalog entry uses exact mode because the
DuckDB oracle must match bit-for-bit.
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
        distinct = (
            F.countDistinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        avg = (
            round4(F.sum(col.cast("decimal(38,6)")).cast("double") / F.count(col))
            if numeric
            else F.lit(None).cast("double")
        )
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(col).alias("n_nonnull"),
                (total - F.count(col)).alias("n_null"),
                distinct.cast("long").alias("n_distinct"),
                _fmt(F.min(col), dt).alias("min_value"),
                _fmt(F.max(col), dt).alias("max_value"),
                avg.alias("avg_value"),
            )
        )
    return (
        df.agg(F.array(*entries).alias("p"))
        .select(F.explode("p").alias("s"))
        .select("s.*")
    )

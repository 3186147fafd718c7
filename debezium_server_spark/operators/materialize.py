"""CDC materialization: turn a keyed change-event stream into table state.

The reference's PK-table sinks apply READ/CREATE/UPDATE as upsert and
DELETE as delete, per primary key (FlussChangeConsumer.java:188-219,
primary-key modes :256-282; MilvusChangeConsumer.java:133-146; JDBC upsert
JdbcChangeConsumer.java:102-128). Append mode writes every event as a log
row.

Spark-first design for 100 TB:
- `latest_events` uses `max_by` aggregation, NOT a row_number window:
  groupBy+max_by gets map-side partial aggregation (each task reduces its
  slice of a key before the shuffle), so the shuffle carries one row per
  (destination,key) per task instead of every event. A window would sort
  every event within each key with no partial reduction.
- `merge_state` is the idempotent foreachBatch merge: union(current,
  batch-latest) → latest-wins. With the state table bucketed/partitioned by
  key on a real cluster this is a co-located merge; correctness does not
  depend on that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.operators.envelope import is_delete, is_tombstone
from debezium_server_spark.schema import OP_DELETE

# Default total order on events of one key: source position (lsn) then
# event timestamp. Callers with a different source block can override.
DEFAULT_ORDER = ("value.source.lsn", "value.ts_ms")


def _order_struct(order_cols: tuple[str, ...], payload: Column) -> Column:
    return F.struct(*[F.col(c) for c in order_cols], payload.alias("__payload"))


def latest_events(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("destination", "key"),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Reduce a change log to the latest event per key (latest-wins).

    Returns one row per key: the key cols (nested paths aliased with dots
    replaced by underscores, e.g. ``key.id`` → ``key_id``) + `op` +
    `after`. Tombstones (null value) are dropped first — they carry no
    state and always follow the delete they echo.
    """
    df = df.filter(~is_tombstone())
    payload = F.struct(
        F.col("value.op").alias("op"),
        F.col("value.after").alias("after"),
    )
    keys = [F.col(c).alias(c.replace(".", "_")) for c in key_cols]
    agg = df.groupBy(*keys).agg(
        F.max_by(payload, F.struct(*[F.col(c) for c in order_cols])).alias("__latest")
    )
    return agg.select(
        *[c.replace(".", "_") for c in key_cols], "__latest.op", "__latest.after"
    )


def materialize(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("destination", "key"),
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
) -> DataFrame:
    """Final table state from a change log: latest-wins upsert, rows whose
    last op is DELETE removed, `after` image flattened (the row carries its
    own PK columns)."""
    latest = latest_events(df, key_cols, order_cols)
    return latest.filter(F.col("op") != OP_DELETE).select(F.col("after.*"))


def merge_state(
    current: DataFrame,
    batch_latest: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "__seq",
) -> DataFrame:
    """Idempotent MERGE of one micro-batch into existing state.

    `current` has flattened row columns + `seq_col`; `batch_latest` is
    `latest_events` output re-tagged with the same shape plus `op`.
    Latest-wins by `seq_col`; final DELETE removes the key. Replaying the
    same batch (at-least-once) is a no-op because seq ties resolve to the
    same row — this upgrades delivery to effectively-once
    (SURVEY.md §3.2).

    Schema drift (the reference's per-event dynamic schemas, SURVEY.md
    §1.5): columns present on only one side are null-filled on the other
    (`allowMissingColumns`), so an upstream ADD COLUMN widens the state
    table in place and a dropped column survives with nulls for new rows
    — the same additive evolution Delta's mergeSchema applies.
    """
    merged = current.withColumn("op", F.lit(None).cast("string")).unionByName(
        batch_latest, allowMissingColumns=True
    )
    row = F.struct(*[F.col(c) for c in merged.columns])
    latest = merged.groupBy(*key_cols).agg(F.max_by(row, F.col(seq_col)).alias("__latest"))
    kept = latest.filter(
        F.col("__latest.op").isNull() | (F.col("__latest.op") != OP_DELETE)
    )
    return kept.select("__latest.*").drop("op")


def append_log(df: DataFrame) -> DataFrame:
    """Append/log-table mode (FlussChangeConsumer.java primary-key mode
    `append`): every event becomes a row, no key semantics."""
    return df.filter(~is_tombstone()).select(
        "destination",
        F.col("value.op").alias("op"),
        F.col("value.after").alias("after"),
        F.col("value.before").alias("before"),
        F.col("value.ts_ms").alias("ts_ms"),
    )


def split_upserts_deletes(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Operation dispatch (MilvusChangeConsumer.java:133-146): returns
    (upserts, deletes); both sides reference the same scan — Spark reuses
    the exchange under AQE."""
    live = df.filter(~is_tombstone())
    return live.filter(~is_delete()), live.filter(is_delete())


def clamped_running_balance(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delta_col: str = "delta",
    floor_value: int = 0,
    cap_value: int | None = None,
) -> DataFrame:
    """Per-key running balance clamped on BOTH sides:
    balance_t = min(cap, max(floor, balance_{t-1} + delta_t)) —
    inventory-with-capacity / prepaid-credit semantics.

    Why this is the escape hatch and not a window: the ONE-sided
    clamp has a prefix-scan closed form (the Skorokhod reflection
    identity, b_t = S_t - min(0, min_{j<=t} S_j) — expressible as
    cumsum minus a running min), but the TWO-sided clamp does not:
    every step is a nonlinear saturating map and the walk between
    the two barriers cannot be reconstructed from any fixed set of
    prefix aggregates. Hence Arrow-batched applyInPandas per key
    with a linear per-group loop — the only per-row Python on the
    catalog's batch surface, used precisely where DataFrame algebra
    cannot go. One shuffle on the key.

    `delta_col` must be integer units (cents); rows come back with
    `balance` appended, per-key (ts, delta) order.
    """
    import pandas as pd

    from pyspark.sql import types as T

    fields = df.schema.fields + [T.StructField("balance", T.LongType())]
    out_schema = T.StructType(fields)
    cap = cap_value

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, delta_col], ignore_index=True)
        bal = 0
        out = []
        for d in pdf[delta_col]:
            bal = max(floor_value, bal + int(d))
            if cap is not None:
                bal = min(cap, bal)
            out.append(bal)
        pdf["balance"] = out
        return pdf

    # Explicit repartition on the key: grouped-map pays a fixed
    # per-group cost (Arrow batch flush ~30 ms), and AQE happily
    # coalesces a small shuffle to ONE task, serializing every group
    # through one Python worker (150 groups -> 5 s). A user-specified
    # repartition survives AQE, spreads groups across workers, and the
    # groupBy reuses the same hash partitioning — no extra exchange.
    para = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(para, F.col(key_col))
        .groupBy(key_col)
        .applyInPandas(fold, schema=out_schema)
    )

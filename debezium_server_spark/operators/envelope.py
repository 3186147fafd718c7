"""Envelope operators.

The reference reads envelope fields ``op/before/after`` off each event and
dispatches: READ/CREATE/UPDATE → upsert, DELETE → delete
(MilvusChangeConsumer.java:133-146, FlussChangeConsumer.java:181-219);
null-value events are tombstones (TombstoneSupportProducer.java:37-42);
schema-change events are skipped by schema-aware sinks
(MilvusChangeConsumer.java:119-123).

Spark-first: all of these are single declarative column expressions —
Catalyst prunes the nested struct fields that are not referenced, so
"extract after.*" really is a narrow projection at the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.schema import OP_DELETE, UPSERT_OPS


def op_col(value_col: str = "value") -> Column:
    return F.col(f"{value_col}.op")


def is_tombstone(value_col: str = "value") -> Column:
    """Null-value event (follows a delete when tombstones are enabled)."""
    return F.col(value_col).isNull()


def is_upsert(value_col: str = "value") -> Column:
    return op_col(value_col).isin(*UPSERT_OPS)


def is_delete(value_col: str = "value") -> Column:
    return op_col(value_col) == OP_DELETE


def drop_tombstones(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Engine-side tombstone drop for sinks that declare no tombstone
    support (api/DebeziumServerConsumer.java:33-35)."""
    return df.filter(~is_tombstone(value_col))


def drop_schema_changes(df: DataFrame, destination_col: str = "destination") -> DataFrame:
    """Skip schema-change events: their destination equals the topic
    prefix (no table suffix) — MilvusChangeConsumer.java:119-123 skips on
    a dedicated flag; here the stream marks them by destination."""
    return df.filter(F.col(destination_col).contains("."))


def drop_heartbeats(df: DataFrame, prefix: str = "__debezium-heartbeat",
                    destination_col: str = "destination") -> DataFrame:
    """Heartbeat skip filter (RedisStreamChangeConsumer.java:199-204)."""
    return df.filter(~F.col(destination_col).startswith(prefix))


def extract_after(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Flatten the ``after`` image into top-level columns (the
    ExtractNewRecordState analog for upsert rows)."""
    return df.filter(is_upsert(value_col)).select(F.col(f"{value_col}.after.*"))


def with_flattened_state(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Keep one flattened row image per event: ``after`` for upserts,
    ``before`` for deletes, plus ``__op`` / ``__deleted`` metadata columns
    (the upstream ExtractNewRecordState transform's delete.handling.mode=
    rewrite shape)."""
    row = F.when(is_delete(value_col), F.col(f"{value_col}.before")).otherwise(
        F.col(f"{value_col}.after")
    )
    return (
        df.filter(~is_tombstone(value_col))
        .withColumn("__row", row)
        .withColumn("__op", op_col(value_col))
        .withColumn("__deleted", is_delete(value_col))
    )


def extract_new_record_state(
    df: DataFrame,
    value_col: str = "value",
    add_fields: tuple[str, ...] = (),
    delete_mode: str = "rewrite",
) -> DataFrame:
    """The full ExtractNewRecordState SMT (Debezium's canonical flatten):
    unwrap the envelope to the bare row image, with the upstream
    transform's options:

    - ``add_fields``: envelope/source paths copied into the flattened row
      as ``__``-prefixed columns (``op``, ``ts_ms``, ``source.lsn``,
      ``source.table``, ... — the `add.fields` option). Dots become
      underscores: ``source.lsn`` → ``__source_lsn``.
    - ``delete_mode``: ``"rewrite"`` keeps deletes as rows flagged
      ``__deleted=true`` (image = ``before``); ``"drop"`` removes delete
      and tombstone events entirely (`delete.handling.mode`).

    Output: the row image columns (``after.*``/``before.*``) + requested
    metadata. Catalyst prunes unreferenced envelope fields at the scan.
    """
    if delete_mode not in ("rewrite", "drop"):
        raise ValueError("delete_mode must be 'rewrite' or 'drop'")
    out = df.filter(~is_tombstone(value_col))
    if delete_mode == "drop":
        out = out.filter(~is_delete(value_col))
        row = F.col(f"{value_col}.after")
    else:
        row = F.when(is_delete(value_col), F.col(f"{value_col}.before")).otherwise(
            F.col(f"{value_col}.after")
        )
    meta = []
    for path in add_fields:
        src = (
            F.col(f"{value_col}.{path}")
            if path != "destination"
            else F.col("destination")
        )
        meta.append(src.alias("__" + path.replace(".", "_")))
    if delete_mode == "rewrite":
        meta.append(is_delete(value_col).alias("__deleted"))
    return out.select(row.alias("__row"), *meta).select("__row.*", *[
        f"`__{p.replace('.', '_')}`" for p in add_fields
    ] + (["__deleted"] if delete_mode == "rewrite" else []))

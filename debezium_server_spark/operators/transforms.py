"""Single-message transforms (SMTs) as declarative DataFrame stages.

The reference configures an ordered SMT chain, each transform optionally
gated by a named predicate (`debezium.transforms=...`,
DebeziumServerConfigSourceFactory.java:107-117, TestConfigSource.java:75-85,
asserted DebeziumServerTest.java:82-92). Transforms are per-event
projections — in Spark each one is a pure `Column`-expression rewrite, so
the whole chain stays inside whole-stage codegen with no Python in the hot
path.

Each transform is a function `DataFrame -> DataFrame`; `Chain` composes
them with predicate gating via `F.when(pred, transformed).otherwise(
original)` per rewritten column.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Predicate = Callable[[DataFrame], Column]


# ---------------------------------------------------------------------------
# Predicates (reference: TopicNameMatches pattern guards,
# DebeziumServerConfigSourceFactory.java:113-117)
# ---------------------------------------------------------------------------


def topic_name_matches(pattern: str, destination_col: str = "destination") -> Predicate:
    return lambda df: F.col(destination_col).rlike(pattern)


def value_field_equals(field_path: str, literal: object) -> Predicate:
    return lambda df: F.col(field_path) == F.lit(literal)


def negate(pred: Predicate) -> Predicate:
    return lambda df: ~pred(df)


# ---------------------------------------------------------------------------
# Transforms. Each returns {column_name: new_expression} so the Chain can
# gate per-column with the predicate; wholesale row transforms return the
# special key "*" handled by Chain.apply.
# ---------------------------------------------------------------------------


@dataclass
class Transform:
    """One SMT: a set of column rewrites, optionally predicate-gated."""

    name: str
    rewrites: Callable[[DataFrame], dict[str, Column]]
    predicate: Predicate | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        rewrites = self.rewrites(df)
        for col_name, expr in rewrites.items():
            if self.predicate is not None:
                base = F.col(col_name) if col_name in df.columns else F.lit(None)
                expr = F.when(self.predicate(df), expr).otherwise(base)
            df = df.withColumn(col_name, expr)
        return df


def hoist_field(hoisted_field: str, value_col: str = "value",
                predicate: Predicate | None = None) -> Transform:
    """HoistField: wrap the value under a single-field struct
    (TestConfigSource.java:76-77; asserted shape `{"payload":{"line":...}}`
    DebeziumServerTest.java:99-100)."""
    return Transform(
        name=f"hoist_field[{hoisted_field}]",
        rewrites=lambda df: {value_col: F.struct(F.col(value_col).alias(hoisted_field))},
        predicate=predicate,
    )


def hoist_field_serialized(hoisted_field: str, value_col: str = "value",
                           predicate: Predicate | None = None) -> Transform:
    """HoistField over a serialized (string) value: produces the JSON
    `{"<field>": <value>}` shape the reference asserts on the wire
    (DebeziumServerTest.java:99-100). Type-preserving (string → string),
    so it composes with predicate gating — the reference's values are
    serialized bytes, hence dynamically typed; in Spark a gated rewrite
    must keep one column type."""
    return Transform(
        name=f"hoist_field_serialized[{hoisted_field}]",
        rewrites=lambda df: {
            value_col: F.to_json(F.struct(F.col(value_col).alias(hoisted_field)))
        },
        predicate=predicate,
    )


def insert_header(key: str, value: str, headers_col: str = "headers",
                  predicate: Predicate | None = None) -> Transform:
    """InsertHeader: append a constant header (TestConfigSource.java:79-81)."""

    def rewrites(df: DataFrame) -> dict[str, Column]:
        new = F.array(F.struct(F.lit(key).alias("key"), F.lit(value).alias("value")))
        existing = F.coalesce(F.col(headers_col), F.array().cast(df.schema[headers_col].dataType))
        return {headers_col: F.concat(existing, new)}

    return Transform(name=f"insert_header[{key}]", rewrites=rewrites, predicate=predicate)


def insert_field(field_name: str, value_expr: Column, value_col: str = "value",
                 predicate: Predicate | None = None) -> Transform:
    """InsertField analog: add a static/derived field to the value struct."""
    return Transform(
        name=f"insert_field[{field_name}]",
        rewrites=lambda df: {
            value_col: F.col(value_col).withField(field_name, value_expr)
        },
        predicate=predicate,
    )


def mask_field(field_path: str, value_col: str = "value", mask: str = "****",
               predicate: Predicate | None = None) -> Transform:
    """MaskField analog: replace a (nested) value field with a constant."""
    rel = field_path.removeprefix(f"{value_col}.")
    return Transform(
        name=f"mask_field[{field_path}]",
        rewrites=lambda df: {value_col: F.col(value_col).withField(rel, F.lit(mask))},
        predicate=predicate,
    )


def timestamp_router(topic_format: str = "${topic}-${timestamp}",
                     timestamp_format: str = "yyyyMMdd",
                     ts_col: str = "value.ts_ms",
                     destination_col: str = "destination",
                     predicate: Predicate | None = None) -> Transform:
    """TimestampRouter: route each event to a time-suffixed destination
    (`orders` → `orders-20240131`) — the standard companion SMT for
    time-partitioned sinks (Kafka Connect TimestampRouter semantics, the
    same `${topic}`/`${timestamp}` placeholder contract). Event time
    comes from the envelope's ts_ms; events with a null timestamp keep
    their destination unrouted."""
    def rewrite(df):
        rendered = F.date_format(
            F.timestamp_millis(F.col(ts_col)), timestamp_format
        )
        routed = F.lit(topic_format)
        routed = F.replace(routed, F.lit("${topic}"), F.col(destination_col))
        routed = F.replace(routed, F.lit("${timestamp}"), rendered)
        return {destination_col: F.coalesce(
            F.when(F.col(ts_col).isNotNull(), routed),
            F.col(destination_col),
        )}

    return Transform(
        name=f"timestamp_router[{topic_format}]",
        rewrites=rewrite,
        predicate=predicate,
    )


def rename_destination(pattern: str, replacement: str,
                       destination_col: str = "destination",
                       predicate: Predicate | None = None) -> Transform:
    """Regex route/rename (reference sanitizers: FlussChangeConsumer.java:
    236-240 `[^a-zA-Z0-9_\\-]`→`_`, MilvusChangeConsumer.java:115-117)."""
    return Transform(
        name=f"rename_destination[{pattern}]",
        rewrites=lambda df: {
            destination_col: F.regexp_replace(F.col(destination_col), pattern, replacement)
        },
        predicate=predicate,
    )


def content_based_router(when_expr: str, then_destination: str,
                         destination_col: str = "destination") -> Transform:
    """ContentBasedRouter (scripting SMT analog, debezium-server-dist/
    pom.xml:389-397): route events matching a SQL boolean expression to a
    different destination."""
    return Transform(
        name="content_based_router",
        rewrites=lambda df: {
            destination_col: F.when(F.expr(when_expr), F.lit(then_destination)).otherwise(
                F.col(destination_col)
            )
        },
    )


def header_to_value(header_key: str, field_name: str, operation: str = "copy",
                    value_col: str = "value", headers_col: str = "headers",
                    predicate: Predicate | None = None) -> Transform:
    """HeaderToValue: copy (or move) a header into the value struct. The
    last header with the key wins, matching Connect's `lastWithName`.
    `operation="move"` also strips every header with that key."""
    if operation not in ("copy", "move"):
        raise ValueError(f"operation must be copy|move, got {operation!r}")

    def rewrites(df: DataFrame) -> dict[str, Column]:
        matching = F.filter(
            F.col(headers_col), lambda h: h["key"] == F.lit(header_key)
        )
        last = F.element_at(matching, -1)["value"]
        out = {value_col: F.col(value_col).withField(field_name, last)}
        if operation == "move":
            out[headers_col] = F.filter(
                F.col(headers_col), lambda h: h["key"] != F.lit(header_key)
            )
        return out

    return Transform(
        name=f"header_to_value[{header_key}→{field_name}]",
        rewrites=rewrites, predicate=predicate,
    )


def value_to_key(fields: Sequence[str], value_col: str = "value",
                 key_col: str = "key",
                 predicate: Predicate | None = None) -> Transform:
    """ValueToKey: replace the key with a struct of value fields — the
    re-key step before a logical-table merge or a partition re-route."""
    return Transform(
        name=f"value_to_key[{','.join(fields)}]",
        rewrites=lambda df: {
            key_col: F.struct(
                *[F.col(f"{value_col}.{f}").alias(f.split(".")[-1]) for f in fields]
            )
        },
        predicate=predicate,
    )


def extract_field(field: str, value_col: str = "value",
                  predicate: Predicate | None = None) -> Transform:
    """ExtractField: replace the whole value with one of its fields."""
    return Transform(
        name=f"extract_field[{field}]",
        rewrites=lambda df: {value_col: F.col(f"{value_col}.{field}")},
        predicate=predicate,
    )


def replace_field(value_col: str = "value",
                  renames: dict[str, str] | None = None,
                  include: Sequence[str] | None = None,
                  exclude: Sequence[str] = (),
                  predicate: Predicate | None = None) -> Transform:
    """ReplaceField: rename / include-list / drop fields of a struct
    column. Schema-aware: reads the struct's fields from the DataFrame at
    apply time, so one configured transform serves every table shape —
    the Connect semantics (exclude wins, then include-list, then rename).
    """
    renames = renames or {}

    def rewrites(df: DataFrame) -> dict[str, Column]:
        names = [f.name for f in df.schema[value_col].dataType.fields]
        kept = [n for n in names if n not in exclude
                and (include is None or n in include)]
        return {
            value_col: F.struct(
                *[F.col(f"{value_col}.{n}").alias(renames.get(n, n)) for n in kept]
            )
        }

    return Transform(name=f"replace_field[{value_col}]", rewrites=rewrites,
                     predicate=predicate)


def cast_fields(casts: dict[str, str], value_col: str = "value",
                predicate: Predicate | None = None) -> Transform:
    """Cast SMT: cast named value fields to Spark SQL type names
    (`{"amount": "double", "flag": "boolean"}`)."""

    def rewrites(df: DataFrame) -> dict[str, Column]:
        col = F.col(value_col)
        for path, typ in casts.items():
            col = col.withField(path, F.col(f"{value_col}.{path}").cast(typ))
        return {value_col: col}

    return Transform(name=f"cast_fields[{','.join(casts)}]", rewrites=rewrites,
                     predicate=predicate)


def timezone_converter(target_tz: str, ts_fields: Sequence[str],
                       value_col: str = "value",
                       predicate: Predicate | None = None) -> Transform:
    """TimezoneConverter: shift timestamp-typed value fields from UTC into
    a target zone (the reference converts Debezium temporal logical types;
    epoch-integer fields are zone-less and pass through untouched)."""

    def rewrites(df: DataFrame) -> dict[str, Column]:
        col = F.col(value_col)
        for path in ts_fields:
            col = col.withField(
                path,
                F.from_utc_timestamp(F.col(f"{value_col}.{path}").cast("timestamp"),
                                     target_tz),
            )
        return {value_col: col}

    return Transform(name=f"timezone_converter[{target_tz}]", rewrites=rewrites,
                     predicate=predicate)


def extract_changed_record_state(header_changed: str = "changed",
                                 header_unchanged: str | None = None,
                                 value_col: str = "value",
                                 headers_col: str = "headers",
                                 predicate: Predicate | None = None) -> Transform:
    """ExtractChangedRecordState: annotate updates with which row fields
    actually changed (before ≠ after, null-safe), as comma-joined header
    values. Schema-aware — the field list comes from the envelope's row
    schema at apply time; the comparison is a pure column expression, so
    it rides whole-stage codegen even at 100 TB."""

    def rewrites(df: DataFrame) -> dict[str, Column]:
        names = [
            f.name
            for f in df.schema[value_col].dataType["after"].dataType.fields
        ]
        changed = F.array_compact(F.array(*[
            F.when(
                ~F.col(f"{value_col}.before.{n}").eqNullSafe(
                    F.col(f"{value_col}.after.{n}")),
                F.lit(n),
            )
            for n in names
        ]))
        headers = [(header_changed, changed)]
        if header_unchanged is not None:
            unchanged = F.array_compact(F.array(*[
                F.when(
                    F.col(f"{value_col}.before.{n}").eqNullSafe(
                        F.col(f"{value_col}.after.{n}")),
                    F.lit(n),
                )
                for n in names
            ]))
            headers.append((header_unchanged, unchanged))
        new = F.array(*[
            F.struct(F.lit(k).alias("key"),
                     F.array_join(v, ",").alias("value"))
            for k, v in headers
        ])
        is_update = F.col(value_col).isNotNull() & (F.col(f"{value_col}.op") == "u")
        existing = F.coalesce(F.col(headers_col),
                              F.array().cast(df.schema[headers_col].dataType))
        return {
            headers_col: F.when(is_update, F.concat(existing, new)).otherwise(existing)
        }

    return Transform(name="extract_changed_record_state", rewrites=rewrites,
                     predicate=predicate)


def logical_table_router(pattern: str, replacement: str,
                         destination_col: str = "destination",
                         key_col: str = "key",
                         id_field: str = "__dbz__physicalTableIdentifier",
                         predicate: Predicate | None = None) -> Transform:
    """ByLogicalTableRouter: merge sharded physical tables
    (`db.shard_\\d+.orders` → `db.orders`) into one logical stream AND
    disambiguate keys by stamping the original physical table into the
    key — without it, shard-local key collisions would corrupt
    latest-wins materialization downstream."""

    def rewrites(df: DataFrame) -> dict[str, Column]:
        routed = F.regexp_replace(F.col(destination_col), pattern, replacement)
        return {
            key_col: F.when(
                routed != F.col(destination_col),
                F.col(key_col).withField(id_field, F.col(destination_col)),
            ).otherwise(F.col(key_col).withField(id_field, F.lit(None).cast("string"))),
            destination_col: routed,
        }

    return Transform(name=f"logical_table_router[{pattern}]", rewrites=rewrites,
                     predicate=predicate)


@dataclass
class FilterTransform:
    """Filter SMT (scripting filter analog): keep rows matching a SQL
    boolean expression. Unlike column rewrites this changes cardinality."""

    condition: str
    name: str = "filter"

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.condition))


@dataclass
class Chain:
    """Ordered SMT chain (`debezium.transforms=a,b,...`)."""

    transforms: Sequence[Transform | FilterTransform] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        for t in self.transforms:
            df = t.apply(df)
        return df

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


def outbox_router(
    df: DataFrame,
    route_by_field: str = "value.after.aggregatetype",
    topic_prefix: str = "outbox.event",
    key_field: str = "value.after.aggregateid",
    payload_field: str = "value.after.payload",
    ts_field: str = "value.ts_ms",
) -> DataFrame:
    """The outbox EventRouter pattern (transactional-outbox table →
    per-aggregate event streams; the upstream Debezium EventRouter SMT
    that Debezium Server ships in its dist).

    Each CREATE on the outbox table becomes an event routed to
    `<topic_prefix>.<aggregatetype>` keyed by the aggregate id with the
    outbox payload (already-serialized JSON in the canonical pattern) as
    the value. Deletes/updates on the outbox table are dropped — outbox
    rows are insert-only by contract.
    """
    created = df.filter(
        F.col("value").isNotNull() & F.col("value.op").isin("c", "r")
    )
    return created.select(
        F.concat(F.lit(topic_prefix + "."), F.col(route_by_field)).alias("destination"),
        F.col(key_field).cast("string").alias("key"),
        F.col(payload_field).alias("value"),
        F.col("headers"),
        F.col("partition"),
        F.col(ts_field).alias("ts_ms"),
    )

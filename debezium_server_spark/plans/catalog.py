"""Query catalog: every checkable operator as (Spark builder, DuckDB oracle).

Each entry pairs an idiomatic-Spark DataFrame builder with an exactly
equivalent ANSI/DuckDB SQL string. The driver runs both at sf=0.01 and
hash-compares values, so the pairs are written for bit-parity:

- float aggregates go through DECIMAL(38,6) (exact, order-independent
  addition) and come back as ROUND(CAST(.. AS DOUBLE), 4);
- timestamps are emitted as DATE or formatted strings (wall-clock safe
  regardless of session time zone);
- hashes are md5 hex (identical in both engines); no murmur/xxhash;
- array reductions are sequential left-to-right in both engines.

Column names are aliased identically on both sides (driver sorts columns
by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from debezium_server_spark.operators.routing import sanitize_stream_name
from debezium_server_spark.operators.similarity import cosine_topk, lsh_ann_topk
from debezium_server_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    text_quality,
    token_counts,
)

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` parquet uses TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read ns as long and convert with integer division
    (double division would lose precision above 2^53 — epoch-ns is ~2^60).
    DuckDB truncates ns→µs the same way, so the oracle agrees."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


@dataclass
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None ⇒ non-SQL-expressible, rows-only check
    description: str = ""


CATALOG: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        CATALOG[name] = QueryDef(name, fn, oracle, description)
        return fn
    return deco


def _dec(c) -> F.Column:
    return c.cast("decimal(38,6)")


def _dsum(c) -> F.Column:
    """Order-independent double-safe sum: decimal sum → double → round."""
    return F.round(F.sum(_dec(c)).cast("double"), 4)


# =====================================================================
# CDC / pipeline surface (SURVEY.md §2.1-2.3) over the `events` stream
# =====================================================================

@register(
    "cdc_latest_state",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    "Latest-wins state per key — the CDC materialization core "
    "(FlussChangeConsumer.java:188-219). Spark side uses max_by "
    "(map-side combinable), oracle uses ROW_NUMBER; same result.",
)
def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    payload = F.struct(
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(payload, F.struct(F.col("ts"), F.col("event_id"))).alias("l"))
        .select("user_id", "l.last_event_id", "l.last_event_type", "l.last_value")
    )


@register(
    "cdc_event_counts",
    """
    SELECT event_type, count(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_value
    FROM events GROUP BY event_type
    """,
    "Scan → group → agg per stream (per-destination accounting).",
)
def q_cdc_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))
    )


@register(
    "route_rename",
    """
    SELECT concat('app.events.', regexp_replace(event_type, '[^a-zA-Z0-9_\\-]', '_', 'g'))
             AS destination,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    "StreamNameMapper + sanitization (FlussChangeConsumer.java:236-240) "
    "+ per-destination grouping (KinesisChangeConsumer.java:136).",
)
def q_route_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dest = F.concat(F.lit("app.events."), sanitize_stream_name(F.col("event_type")))
    return ev.select(dest.alias("destination")).groupBy("destination").agg(
        F.count("*").alias("n")
    )


@register(
    "predicate_filter_json",
    """
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE regexp_matches(event_type, '^(click|view)$')
      AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    "Predicate gating (TopicNameMatches rlike) + JSON field extraction "
    "(the payload-unwrap path, MilvusChangeConsumer.java:192-197).",
)
def q_predicate_filter_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.filter(F.col("event_type").rlike("^(click|view)$"))
        .withColumn("k", k)
        .filter(F.col("k") > 50)
        .select("event_id", "user_id", "k")
    )


@register(
    "scalar_functions",
    """
    SELECT event_id,
           upper(event_type) AS event_type_uc,
           concat_ws('/', event_type, CAST(user_id AS VARCHAR)) AS tag,
           md5(event_type) AS etype_md5,
           CAST(length(props) AS BIGINT) AS props_len
    FROM events WHERE event_id < 100
    """,
    "Scalar-function surface (SURVEY.md §2.5): case, concat, hash, length.",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return ev.select(
        "event_id",
        F.upper("event_type").alias("event_type_uc"),
        F.concat_ws("/", F.col("event_type"), F.col("user_id").cast("string")).alias("tag"),
        F.md5(F.col("event_type").cast("binary")).alias("etype_md5"),
        F.length("props").cast("long").alias("props_len"),
    )


@register(
    "fifo_first_event",
    """
    SELECT user_id, event_type,
           first(event_id ORDER BY ts, event_id) AS first_event_id,
           count(*) AS n
    FROM events GROUP BY user_id, event_type
    """,
    "FIFO dedup-id semantics (SqsChangeConsumer.java:87-88): first event "
    "per (group, dedup key); min_by in Spark, ordered first() in oracle.",
)
def q_fifo_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min_by("event_id", F.struct(F.col("ts"), F.col("event_id"))).alias("first_event_id"),
        F.count("*").alias("n"),
    )


@register(
    "partition_routing",
    """
    SELECT user_id % 16 AS part_id, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
    "Key-hash partition routing (EventHubsChangeConsumer.java:177-222) "
    "with a portable modulo hash; validates per-partition balance.",
)
def q_partition_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("part_id", F.col("user_id") % 16)
        .groupBy("part_id")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "events_hourly_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    "Tumbling event-time window aggregation (the streaming windowed-agg "
    "shape, batch-checkable form).",
)
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.groupBy(hour.alias("hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(
                (F.sum(_dec(F.col("value"))).cast("double") / F.count("*")), 4
            ).alias("avg_value"),
        )
    )


@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
    "Sessionization: 30-min-gap session windows via lag + running sum — "
    "the custom stateful-operator shape expressed declaratively.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000), 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


# =====================================================================
# Relational/analytic surface (SURVEY.md §2.6 — "free" in Spark, still
# correctness-checked and benchmarked)
# =====================================================================

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: wide aggregation with derived measures.",
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc_price).alias("sum_disc_price"),
        _dsum(charge).alias("sum_charge"),
        F.round(F.sum(_dec(F.col("l_quantity"))).cast("double") / cnt, 4).alias("avg_qty"),
        F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double") / cnt, 4).alias("avg_price"),
        F.round(F.sum(_dec(F.col("l_discount"))).cast("double") / cnt, 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
    GROUP BY o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    "TPC-H Q3: selective 3-way join + agg + top-k; customer side is "
    "broadcast-able at any SF (dims ≪ fact).",
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-01-01").cast("date")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(revenue).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5: 6-way snowflake join; all dims broadcast, single shuffle "
    "on the fact side.",
)
def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(revenue).alias("revenue"))
    )


@register(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
    """,
    "Window top-k per group (row_number).",
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_price
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "Grouping-sets/rollup aggregation.",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum(F.col("l_extendedprice")).alias("total_price")
    )


@register(
    "set_ops_customers",
    """
    SELECT 'both' AS tag, c FROM (
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 'only_open' AS tag, c FROM (
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F')
    """,
    "Set operations: INTERSECT / EXCEPT / UNION ALL.",
)
def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c"))
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c"))
    both = o.intersect(f).select(F.lit("both").alias("tag"), "c")
    only_o = o.subtract(f).select(F.lit("only_open").alias("tag"), "c")  # EXCEPT DISTINCT
    return both.unionAll(only_o)


@register(
    "distinct_agg_priority",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    "Distinct aggregation alongside plain aggregates.",
)
def q_distinct_agg_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        _dsum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "anti_semi_join",
    """
    SELECT 'never_ordered' AS tag, count(*) AS n FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'ordered' AS tag, count(*) AS n FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "Semi/anti joins (EXISTS / NOT EXISTS).",
)
def q_anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    never = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("never_ordered").alias("tag"), "n")
    )
    did = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"))
        .select(F.lit("ordered").alias("tag"), "n")
    )
    return never.unionAll(did)


# =====================================================================
# LLM-data-pipeline operators (BASELINE.json north star)
# =====================================================================

_TOKS = "string_split_regex(lower(text), '\\s+')"
_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_TOKS})-1), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))"
)

@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    "Exact dedup: hash-groupBy with map-side partial min — the canonical "
    "100 TB dedup (one shuffle of (hash, id)).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS s FROM documents),
    sig AS (SELECT doc_id,
                   list_transform(range(0, 12),
                       j -> list_aggregate(list_transform(s, x -> md5(j || ':' || x)), 'min')) AS m
            FROM sh),
    bands AS (SELECT doc_id, b AS band_id,
                     md5(m[b*3+1] || '|' || m[b*3+2] || '|' || m[b*3+3]) AS band_hash
              FROM sig, unnest(range(0, 4)) AS u(b))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
    "MinHash+LSH near-dup candidates: shingle→12 minhashes→4 bands→"
    "band-bucket self-join. Shuffle ∝ docs×bands, never docs².",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS (SELECT doc_id, lang,
                  list_distinct(list_transform({_SHINGLES},
                      s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT))) AS s
                FROM documents)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE jaccard >= 0.2
    """,
    "Exact n-gram Jaccard on lang-blocked candidates (shingles md5-hashed "
    "to 60-bit ints on both sides — identical values, cheaper joins).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.2)


@register(
    "dedup_simhash",
    f"""
    WITH th AS (SELECT doc_id,
                  list_transform({_TOKS},
                      x -> CAST(concat('0x', substr(md5(x), 1, 4)) AS INTEGER)) AS h
                FROM documents)
    SELECT doc_id,
           CAST(list_aggregate(list_transform(range(0, 16),
               i -> CASE WHEN list_aggregate(
                              list_transform(h, v -> ((v >> i) & 1) * 2 - 1), 'sum') > 0
                         THEN (1 << i) ELSE 0 END), 'sum') AS BIGINT) AS simhash
    FROM th
    """,
    "16-bit SimHash signatures (near-dup ⇔ equal/close signatures).",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_signatures(load(spark, sf_dir, "documents"))


_DOT = (
    "list_aggregate(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]), 'sum')"
)
_NORM = "sqrt(list_aggregate(list_transform({v}, x -> x*x), 'sum'))"

@register(
    "embedding_topk",
    f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {_DOT.format(a='q.e', b='c.e')} /
                 ({_NORM.format(v='q.e')} * {_NORM.format(v='c.e')}) AS sim
          FROM v q JOIN v c ON c.vec_id != q.vec_id
          WHERE q.vec_id < 10)
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank FROM s)
    WHERE rank <= 5
    """,
    "Brute-force cosine top-k (exact kNN baseline): query set broadcast, "
    "corpus scored partition-parallel.",
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_ann_lsh",
    f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e,
              list_aggregate(list_transform(range(0, 8),
                  j -> CASE WHEN list_aggregate(list_transform(range(0, 64),
                           d -> CAST(((j*131 + d*37) % 17) - 8 AS DOUBLE) * e[d+1]), 'sum') > 0
                       THEN (1 << j) ELSE 0 END), 'sum') AS bucket
          FROM v),
    s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {_DOT.format(a='q.e', b='c.e')} /
                 ({_NORM.format(v='q.e')} * {_NORM.format(v='c.e')}) AS sim
          FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
          WHERE q.vec_id < 10)
    SELECT query_id, neighbor_id, rank, ROUND(sim, 4) AS sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank FROM s)
    WHERE rank <= 5
    """,
    "ANN scale path: random-hyperplane LSH bucketing (deterministic "
    "integer planes) → hash join on bucket, never a cross join.",
)
def q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_ann_topk(load(spark, sf_dir, "embeddings"), k=5, query_filter="query_id < 10")


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           ROUND(CAST(list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum') AS DOUBLE)
                 / len({_TOKS}), 4) AS mean_token_len,
           ROUND(CAST(len(list_filter({_TOKS},
                 x -> x IN ('the','a','of','and','in','to'))) AS DOUBLE)
                 / len({_TOKS}), 4) AS stopword_ratio,
           length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS punct_count,
           ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / length(text), 4) AS alpha_ratio
    FROM documents
    """,
    "Quality-scoring features: token stats, stopword/punct/alpha ratios.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(load(spark, sf_dir, "documents"))


@register(
    "lang_id_stopwords",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
            len(list_filter(toks, x -> x IN ('the','a','of','and','in','to'))) AS score_en,
            len(list_filter(toks, x -> x IN ('le','la','et','les','des','un'))) AS score_fr,
            len(list_filter(toks, x -> x IN ('el','la','de','los','que','un'))) AS score_es,
            len(list_filter(toks, x -> x IN ('der','die','und','das','ein','nicht'))) AS score_de
          FROM t)
    SELECT doc_id, score_en, score_fr, score_es, score_de,
           CASE WHEN greatest(score_en, score_fr, score_es, score_de) = 0 THEN 'unknown'
                WHEN score_en = greatest(score_en, score_fr, score_es, score_de) THEN 'en'
                WHEN score_fr = greatest(score_en, score_fr, score_es, score_de) THEN 'fr'
                WHEN score_es = greatest(score_en, score_fr, score_es, score_de) THEN 'es'
                ELSE 'de' END AS pred_lang
    FROM s
    """,
    "Language ID by stopword-marker voting (n-gram heuristic family).",
)
def q_lang_id_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load(spark, sf_dir, "documents"))


@register(
    "token_counts",
    f"""
    SELECT source, count(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text), '(\\w+|[^\\w\\s])', 1))) AS BIGINT) AS bpe_tokens
    FROM documents GROUP BY source
    """,
    "Token counting per source group: whitespace + BPE-ish regex.",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           list_aggregate(list_transform(
               range(1, greatest(length(text)-7, 1) + 1, 4),
               i -> md5(substr(text, i, 8))), 'min') AS fingerprint
    FROM documents
    """,
    "Rolling-hash document fingerprint (min strided 8-gram md5).",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(load(spark, sf_dir, "documents"))

"""Deterministic derived PARTSUPP — unblocks TPC-H q2/q9/q11/q16/q20.

The driver fixtures ship no ``partsupp`` table, which blocked the five
TPC-H queries that need one (NEXT.md §2).  Instead of synthesizing an
input file (forbidden — fixtures are driver-owned), both engines DERIVE
the same partsupp relation from the tables that do exist, with pure
integer arithmetic so the Spark build and the DuckDB oracle agree bit
for bit at every scale factor:

    for each part p, for i in 0..3:
        ps_partkey          = p_partkey
        ps_suppkey          = (p_partkey * 4 + i) % count(supplier)
        ps_availqty         = (p_partkey * 7 + i * 13) % 9999 + 1
        ps_supplycost_cents = (p_partkey * 31 + i * 17) % 90000 + 10000

Like dbgen's real mapping (tpch dss.h PS_PER_PART = 4), every part gets
exactly 4 suppliers; consecutive-mod assignment keeps (partkey, suppkey)
a true primary key for any supplier count >= 4 and spreads parts evenly
across suppliers.  Supply cost is kept in integer CENTS end to end —
queries do exact integer/decimal math and only render dollars at the
output edge (the ``stats_quantity_price`` lesson).

Scale note: the derivation is a broadcast of one scalar (supplier
count) crossed into a 4-way per-part explode — map-only over the part
scan, no shuffle; at SF100 partsupp is 4x part (~80M rows), built on
the fly cheaper than reading it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: DuckDB CTE body producing the identical relation (paste into
#: ``WITH partsupp AS (...)`` in each oracle).
PARTSUPP_CTE = """
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 4 + i) % s_cnt AS ps_suppkey,
         CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS INTEGER) AS ps_availqty,
         CAST((p_partkey * 31 + i * 17) % 90000 + 10000 AS BIGINT)
           AS ps_supplycost_cents
  FROM part
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier) sc
  CROSS JOIN (SELECT unnest(range(4)) AS i) quad
"""


def derived_partsupp(spark: SparkSession, part: DataFrame,
                     supplier: DataFrame) -> DataFrame:
    """Build the derived partsupp frame (see module docstring).

    ``part``/``supplier`` are passed in (not loaded here) so callers
    reuse already-loaded frames and Catalyst can prune ``part`` to just
    ``p_partkey`` when nothing else is referenced.
    """
    # One-row scalar attach: compiles to a BroadcastNestedLoopJoin with
    # a single-row build side — bounded by construction (whitelisted in
    # tools/plan_audit.py alongside the other scalar-subquery entries;
    # a constant-key hash join doesn't survive Catalyst, which folds
    # the literal equality away and re-plans the BNLJ anyway).
    s_cnt = supplier.agg(F.count("*").cast("long").alias("s_cnt"))
    quad = F.explode(F.sequence(F.lit(0).cast("long"),
                                F.lit(3).cast("long"))).alias("i")
    pk = F.col("p_partkey")
    return (
        part.select("p_partkey")
        .crossJoin(F.broadcast(s_cnt))
        .select("p_partkey", "s_cnt", quad)
        .select(
            pk.alias("ps_partkey"),
            ((pk * 4 + F.col("i")) % F.col("s_cnt")).alias("ps_suppkey"),
            ((pk * 7 + F.col("i") * 13) % 9999 + 1)
                .cast("int").alias("ps_availqty"),
            ((pk * 31 + F.col("i") * 17) % 90000 + 10000)
                .cast("long").alias("ps_supplycost_cents"),
        )
    )

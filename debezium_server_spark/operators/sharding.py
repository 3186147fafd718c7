"""Deterministic training-shard layout: the last mile between the
curation catalog and a trainer (round-3 verdict #6).

An epoch-reproducible training run needs the corpus cut into N shards
such that (a) the cut is a PURE FUNCTION of the data — re-running the
writer on the same corpus yields byte-identical shard membership, no
RNG, no partition-order dependence — and (b) shards carry near-equal
token budgets so data-parallel workers finish together (token balance,
not row balance: documents vary 100x in length).

Layout = two levels, mirroring how production corpora are organized:

- **source → shard** by GREEDY LPT bin-pack over per-source token sums
  (longest-processing-time: sort sources by token sum descending, assign
  each to the currently-lightest shard). LPT's classical guarantee:
  max shard load <= avg load + max single item — tight enough when
  sources are smaller than shards, and the whole computation runs over
  |sources| rows (bounded control data, ~20 here; the same "collect the
  tiny control frame" convention as sink destination routing).
- **docs inherit their source's shard**, so a shard is a union of whole
  sources — source-coherent shards are what curriculum/mixture tooling
  expects, and membership needs no per-doc state beyond the source map.

`write_training_shards` materializes shard directories (partitioned
parquet) plus a JSON manifest (per-shard sources/docs/tokens) — the
committed artifact a trainer pins for epoch reproducibility.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.functions.text_functions import tokens


def greedy_lpt(items: list[tuple[str, int]], n_shards: int) -> dict[str, int]:
    """Greedy LPT over (key, weight): sort by (weight desc, key asc) —
    fully deterministic including ties — and place each item on the
    currently-lightest shard (ties to the lowest shard id). Pure
    function; the DuckDB oracle replays it as a recursive CTE."""
    loads = [0] * n_shards
    out: dict[str, int] = {}
    for key, w in sorted(items, key=lambda kv: (-kv[1], kv[0])):
        shard = min(range(n_shards), key=lambda i: (loads[i], i))
        loads[shard] += w
        out[key] = shard
    return out


def shard_plan(
    df: DataFrame,
    n_shards: int = 4,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source shard assignment: (source, n_docs, source_tokens,
    shard_id). The per-source token sums are ONE map-side-combinable
    aggregate over the corpus; the greedy runs driver-side over the
    bounded |sources|-row control frame."""
    # NULL sources collapse into an explicit '__null__' key: without
    # this, the writer's equi-join silently DROPS unlabeled docs
    # (NULL = NULL never matches) and greedy_lpt's sort crashes on a
    # NULL weight — a silent training-data loss (round-4 review
    # finding). The sentinel keeps the completeness claim exact.
    sums = (
        df.select(F.coalesce(F.col(source_col), F.lit("__null__"))
                  .alias("source"),
                  F.size(tokens(F.col(text_col))).cast("long").alias("t"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("t").cast("long").alias("source_tokens"))
    )
    rows = sums.collect()  # bounded: one row per source
    assign = greedy_lpt([(r["source"], r["source_tokens"]) for r in rows],
                        n_shards)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r["source"], r["n_docs"], r["source_tokens"],
          assign[r["source"]]) for r in rows],
        "source string, n_docs long, source_tokens long, shard_id long",
    )


def write_training_shards(
    df: DataFrame,
    root_path: str,
    n_shards: int = 4,
    text_col: str = "text",
    source_col: str = "source",
) -> dict:
    """Write shard-partitioned parquet + `_MANIFEST.json`; returns the
    manifest. Membership is a pure key function (source → shard via the
    LPT plan), so a re-run over the same corpus reproduces it exactly.
    The doc write is one broadcast join + partitioned parquet write —
    fully parallel, shuffle-free (the plan frame is |sources| rows)."""
    plan = shard_plan(df, n_shards=n_shards, text_col=text_col,
                      source_col=source_col)
    plan_map = plan.select(F.col("source").alias("__shard_source"),
                           "shard_id")
    (
        df.join(F.broadcast(plan_map),
                F.coalesce(df[source_col], F.lit("__null__"))
                == F.col("__shard_source"))
        .drop("__shard_source")
        .write.mode("overwrite").partitionBy("shard_id")
        .parquet(os.path.join(root_path, "shards"))
    )
    per_shard: dict[int, dict] = {}
    for r in sorted(plan.collect(), key=lambda r: (r["shard_id"], r["source"])):
        s = per_shard.setdefault(
            int(r["shard_id"]),
            {"sources": [], "n_docs": 0, "tokens": 0})
        s["sources"].append(r["source"])
        s["n_docs"] += int(r["n_docs"])
        s["tokens"] += int(r["source_tokens"])
    manifest = {
        "n_shards": n_shards,
        "shards": {str(k): per_shard[k] for k in sorted(per_shard)},
        "total_tokens": sum(s["tokens"] for s in per_shard.values()),
    }
    with open(os.path.join(root_path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest

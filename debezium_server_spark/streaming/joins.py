"""Stream-stream joins with bounded state.

The reference never joins two live change streams — correlation happens
in the sink after materialization. Spark can do it in-flight: two
watermarked streams, an equi-key plus a time-interval predicate, and
the state store holds only rows inside the watermark horizon. That is
the scale contract: without BOTH watermarks and a two-sided time bound,
stream-stream join state grows without limit and a 100 TB replay OOMs
the state store. With them, each side's state is
O(rate × (watermark + interval)) per key-partition.

`interval_join(left, right, ...)` pairs every left row with right rows
of the same key whose event time lies in
[left_ts + lower, left_ts + upper] — the CDC enrichment shape
("the payment within 15 minutes of the order").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "interval 0 seconds",
    upper: str = "interval 15 minutes",
    watermark: str | None = "30 minutes",
    how: str = "inner",
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Watermarked stream-stream interval join.

    Both inputs may be streaming (the canonical case) or static. Columns
    come out prefixed `{left_alias}_` / `{right_alias}_` (key unprefixed)
    so the two sides' identically-named event-time columns survive.

    `how` supports inner and the outer variants Spark allows for
    stream-stream joins (leftOuter/rightOuter/fullOuter); outer rows
    emit once the watermark proves no match can arrive — meaning outer
    results are delayed by the watermark, which is semantics, not a bug.

    `watermark=None` means the inputs are ALREADY watermarked.

    Watermark-basis contract (pinned by test_stream_joins.py and the
    stream_interval_join_outer oracle): each withWatermark instance
    measures the event-time progress of its own POST-OPTIMIZATION
    input, and the query watermark is the MIN across instances. With
    the canonical two-branch split, that means the basis is
    least(max left ts, max right ts) - delay — one sparse side drags
    the query watermark, delaying outer-null emission and state
    eviction engine-wide. Do NOT try to dodge this by watermarking
    the source before the split: predicate pushdown re-sites the
    branch filters below the watermark anyway, and whether it does is
    optimizer-placement-dependent — build oracles and ops alerts on
    the min-of-branches basis instead.
    """
    lw = left if watermark is None else left.withWatermark(left_ts, watermark)
    rw = right if watermark is None else right.withWatermark(right_ts, watermark)
    lsel = lw.select(
        F.col(on).alias("_lk"),
        *[F.col(c).alias(f"{left_alias}_{c}") for c in left.columns if c != on],
    )
    rsel = rw.select(
        F.col(on).alias("_rk"),
        *[F.col(c).alias(f"{right_alias}_{c}") for c in right.columns if c != on],
    )
    lts, rts = f"{left_alias}_{left_ts}", f"{right_alias}_{right_ts}"
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col(rts) >= F.expr(f"{lts} + {lower}"))
        & (F.col(rts) <= F.expr(f"{lts} + {upper}"))
    )
    joined = lsel.join(rsel, cond, how)
    key = F.coalesce(F.col("_lk"), F.col("_rk")).alias(on)
    keep = [c for c in joined.columns if c not in ("_lk", "_rk")]
    return joined.select(key, *keep)


def enrich_with_dimension(
    stream: DataFrame,
    dimension: DataFrame,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment: join a change stream against a slowly-
    changing dimension table (the CDC pattern the reference leaves to the
    sink database — e.g. enriching order events with customer attributes
    before delivery).

    Spark re-plans the static side EVERY micro-batch, so a dimension
    stored in parquet/Delta reflects updates between batches without
    restarting the query — that's the semantic difference from packing
    the dim into a broadcast variable once at startup.

    `broadcast_dim=True` hints the broadcast-hash strategy: no shuffle
    of the (unbounded) stream side, the dimension ships to executors
    per batch. Correct while the dim fits the broadcast ceiling; flip it
    off for a billion-row dimension and Spark falls back to a
    shuffled-hash join of the micro-batch. Left join keeps events whose
    dimension row hasn't arrived yet (late dim upsert) instead of
    dropping them — at-least-once deliveries can re-enrich later.
    """
    dim = F.broadcast(dimension) if broadcast_dim else dimension
    return stream.join(dim, on, how)

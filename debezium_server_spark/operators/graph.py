"""Iterative graph ancestry: pointer-doubling resolution of parent
forests to (node, root, depth).

The reference engine has no graph surface (Debezium Server is a CDC
pipeline runtime); this operator serves the analytics/LLM-pipeline
extension the same way `connected_components` does — hierarchy rollups
over CDC-materialized dimension tables (org charts, category trees,
bill-of-materials), where "walk to the root" is the query SQL engines
express as WITH RECURSIVE.

Why not translate the recursive CTE one-parent-hop-per-round? A
depth-d chain would take d shuffle rounds. Pointer doubling composes
the ancestor map with itself each round —

    anc(v)   <- anc(anc(v))
    depth(v) <- depth(v) + depth(anc(v))

so resolved distance doubles per round and a depth-d forest finishes in
ceil(log2 d) self-joins. At 100 TB (billions of nodes, deep trees) the
log factor is the difference between ~5 shuffles and ~50. Same
discipline as `connected_components` (operators/dedup.py): one
localCheckpoint lineage cut per round, broadcast-hinted lookup side
while the frame is broadcast-sized, and convergence detection as one
O(1) scalar action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transitive_roots(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve a parent forest to roots: (id, root, depth).

    `nodes` carries one row per node with its parent id; a NULL or
    non-positive parent marks a root (depth 0, its own root). Parents
    that are themselves listed nodes chain; the result gives every
    node the id of its terminal ancestor and the hop count to it.

    Invariant each round: `anc` is the ancestor exactly `depth` hops up
    from `id`, and `done` means anc is the root. Composing a frame
    having that invariant with itself preserves it (distances add), so
    the loop is correct at any round count; `max_iter` only bounds
    pathological depth (2^20 hops).
    """
    is_root = F.col(parent_col).isNull() | (F.col(parent_col) <= 0)
    frame = nodes.select(
        F.col(id_col).alias("id"),
        F.when(is_root, F.col(id_col)).otherwise(F.col(parent_col)).alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("int").alias("depth"),
        is_root.alias("done"),
    ).localCheckpoint()

    # Broadcast the lookup side while it fits (checkpointed frames can
    # over-report sizeInBytes and talk AQE out of it — same lesson as
    # connected_components); past ~10M nodes the rounds run as shuffled
    # hash joins on the ancestor key.
    n_nodes = frame.count()

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n_nodes < 10_000_000 else df

    for _ in range(max_iter):
        if frame.filter(~F.col("done")).limit(1).count() == 0:
            break
        lut = frame.select(
            F.col("id").alias("l_id"),
            F.col("anc").alias("l_anc"),
            F.col("depth").alias("l_depth"),
            F.col("done").alias("l_done"),
        )
        hop = F.col("done") | F.col("l_id").isNull()  # done rows / dangling
        frame = (
            frame.join(_maybe_b(lut), frame["anc"] == lut["l_id"], "left")
            .select(
                "id",
                F.when(hop, F.col("anc")).otherwise(F.col("l_anc")).alias("anc"),
                F.when(hop, F.col("depth"))
                .otherwise(F.col("depth") + F.col("l_depth"))
                .alias("depth"),
                (F.col("done") | F.coalesce(F.col("l_done"), F.lit(True)))
                .alias("done"),
            )
            .localCheckpoint()
        )
    return frame.select("id", F.col("anc").alias("root"), "depth")

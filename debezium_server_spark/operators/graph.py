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
    ).localCheckpoint(eager=False)  # the count below materializes it

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
            # lazy: the next round's convergence probe materializes it —
            # one action per round instead of two
            .localCheckpoint(eager=False)
        )
    return frame.select("id", F.col("anc").alias("root"), "depth")


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    outdeg_col: str = "outdeg",
) -> DataFrame:
    """Integer-arithmetic PageRank: (id, rank_micro) after a fixed
    iteration count.

    Ranks live in integer micro-units (initial 1_000_000 per node) and
    every step is exact integer math —

        rank'(v) = 150_000 + (85 * sum over u->v of rank(u) DIV outdeg(u)) DIV 100

    i.e. damping 0.85 applied as integer cross-multiplication, per-edge
    contributions floored by integer division. No floating point means
    the fixpoint trajectory is bit-identical on any engine (the same
    discipline as the catalog's cross-multiplied sigma tests), so a SQL
    oracle can replay the exact iterations.

    `nodes` must carry `outdeg_col` (out-degree per node; derive it
    analytically when the edge rule allows, else one groupBy). Every
    round is one shuffle join (edges x ranks on src) + one map-side-
    combinable sum + a left join back onto `nodes` so zero-inflow nodes
    keep contributing their outflow. `localCheckpoint` per round keeps
    the final plan O(1)-deep instead of O(iterations). Fixed iteration
    count, no convergence collect: PageRank rounds are data-independent,
    so there is nothing to probe (contrast `transitive_roots`).
    """
    base = nodes.select(
        F.col(id_col).alias("id"),
        F.col(outdeg_col).cast("long").alias("outdeg"),
    ).localCheckpoint(eager=False)  # materialized by the final action
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ranks = base.select("id", "outdeg", F.lit(1_000_000).cast("long").alias("rank_micro"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .select(
                F.col("dst"),
                F.expr("rank_micro DIV outdeg").alias("c"),
            )
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = (
            base.join(inflow, base["id"] == inflow["dst"], "left")
            .select(
                "id",
                "outdeg",
                (F.lit(150_000).cast("long")
                 + F.expr("85 * coalesce(inflow, 0) DIV 100")).alias("rank_micro"),
            )
            # lazy: rounds are data-independent, so the WHOLE unrolled
            # loop runs inside the single final action (zero barriers);
            # each cut still persists and truncates lineage
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", "rank_micro")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    Input edges may be directed, duplicated, or self-looping — they are
    canonicalized to distinct undirected (a < b) pairs first. Returns
    (id, triangles): how many triangles each vertex belongs to (each
    triangle increments all three of its vertices).

    Algorithm: degree orientation (Chiba–Nishizeki / the standard
    MapReduce triangle scheme). Every canonical edge is re-pointed from
    its lower-(degree, id) endpoint to the higher one; wedges are then
    enumerated only from each vertex's ORIENTED out-neighbors and closed
    against the canonical edge set with a hash join. Orientation changes
    nothing about the result (a triangle is found exactly once, from its
    least-(degree, id) corner) but everything about the cost: out-degree
    after orientation is O(sqrt(m)) even for a celebrity vertex whose
    raw degree is millions, so the wedge fan-out — the term that
    explodes on skewed graphs — is bounded by sum(outdeg^2) <= O(m^1.5)
    instead of sum(deg^2), which is the difference between a 100 TB
    social graph finishing and one task materializing 10^12 wedges.
    Three shuffles total: degree agg, wedge self-join, closing join.
    """
    # The canonical edge set feeds FIVE downstream consumers (degree agg
    # twice, orientation, the closing join) and `closed` feeds three
    # corner projections — without lineage cuts Spark re-derives each
    # branch from the source scan and the plan multiplies to ~60
    # exchanges (caught by tools/plan_audit.py). localCheckpoint
    # materializes each shared frame exactly once.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # materialized inside the final action
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        e.join(da, "a").join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("o")
        )
        .select("o.u", "o.v")
        .localCheckpoint(eager=False)
    )
    x = oriented.select(F.col("u"), F.col("v").alias("p"))
    y = oriented.select(F.col("u"), F.col("v").alias("q"))
    wedges = x.join(y, "u").filter(F.col("p") < F.col("q"))
    # p < q already, so the canonical closing edge is exactly (a=p, b=q)
    closed = (
        wedges.join(
            e, (F.col("p") == F.col("a")) & (F.col("q") == F.col("b")), "inner"
        )
        .select("u", "p", "q")
        .localCheckpoint(eager=False)
    )
    corners = (
        closed.select(F.col("u").alias("id"))
        .unionAll(closed.select(F.col("p").alias("id")))
        .unionAll(closed.select(F.col("q").alias("id")))
    )
    return corners.groupBy("id").agg(F.count("*").alias("triangles"))


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed node,
    bounded at `max_hops` — reachability tiers / blast-radius layers
    over CDC-derived link graphs. Returns (id, dist), one row per
    reached node.

    Each round is one equi-join (frontier x edges on src) + an
    anti-join against the visited set + a min-aggregate — the frontier
    never re-expands settled nodes, so total work is O(edges within
    the horizon), not O(edges x hops). localCheckpoint per round keeps
    the plan O(1)-deep (the pagerank discipline). Fixed hop count, no
    convergence probe: rounds are data-independent.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    frontier = seeds.select(
        F.col(id_col).alias("id"), F.lit(0).cast("int").alias("dist")
    ).localCheckpoint(eager=False)
    visited = frontier
    for _ in range(max_hops):
        nxt = (
            e.join(frontier, e["src"] == frontier["id"])
            .select(F.col("dst").alias("id"),
                    (F.col("dist") + 1).alias("dist"))
            .join(visited.select("id"), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            # lazy: the isEmpty probe right below materializes it
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by `rounds` fixed peel rounds: repeatedly
    drop nodes with degree < k among the survivors; what remains after
    convergence is the maximal subgraph where every node has >= k
    in-core neighbors. CONTRACT — this is the ROUNDS-BOUNDED residue,
    not unconditionally the k-core: the result equals the true k-core
    with exact in-core degrees exactly when peeling converges within
    `rounds` (clique-like near-dup families converge in 1-2 rounds; a
    path of length L needs L/2 rounds). When `rounds` is too small the
    output is a documented over-approximation: nodes whose degree
    within the final ROUND's subgraph is >= k, with that degree — the
    final filter is a half-step, so a returned node adjacent to a
    just-filtered one carries a degree that counts that edge
    (tests/test_graph.py pins this on a 20-path). Size `rounds`
    to >= graph diameter / 2 for exact cores. On a near-dup pair
    graph the 2-core separates
    DENSELY duplicated template/boilerplate families from incidental
    pairwise matches (a chain is in no 2-core; a clique family is) —
    the corpus-curation signal CC alone cannot give, since CC merges a
    clique and its pendant chain into one component.

    Fixed `rounds` rather than converge-detect: each round strictly
    removes nodes or is the fixpoint, and peeling removes whole
    lowest-degree LAYERS per round (not single nodes), so shallow
    graphs converge in a handful of rounds; a fixed count makes the
    trajectory replayable as unrolled SQL CTEs on an oracle engine
    (the pagerank/BFS convention) and keeps the plan action-free —
    the loop builds ONE job, lazy localCheckpoints cutting lineage.

    `edges` must be UNDIRECTED-complete (both (u,v) and (v,u) rows).
    Returns (node, degree) for the surviving core, degree = in-core
    degree after the final round.

    Scale shape per round: one degree aggregate (map-side combinable)
    + two semi-joins to confine edges — all equi-keyed on node ids;
    the frame can only shrink, so round cost is bounded by the first.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")) \
        .localCheckpoint(eager=False)  # materialized inside the action
    alive = e
    for _ in range(max(rounds, 1)):
        deg = alive.groupBy("u").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        alive = (
            alive.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        alive.groupBy("u")
        .agg(F.count("*").cast("long").alias("degree"))
        .filter(F.col("degree") >= k)
        .select(F.col("u").alias("node"), "degree")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection) with a FIXED
    round count: labels start as node ids; each round every node takes
    the MODE of its neighbors' labels, ties broken to the smallest
    label — fully deterministic, unlike the classic randomized-order
    LPA (Raghavan et al. 2007), which is the price of an oracle-
    replayable trajectory. CONTRACT — this is the ROUNDS-BOUNDED
    labeling (the kcore convention): synchronous LPA has no general
    convergence guarantee (bipartite structures can 2-cycle), so the
    result is defined as "labels after exactly `rounds` synchronous
    updates", which the unrolled SQL oracle replays CTE for CTE.
    Communities differ from connected components: a long chain joins
    ONE component but fragments into local communities, and two cliques
    sharing a single bridge edge keep distinct labels — the granularity
    curation wants when CC over-merges template families.

    `edges` must be UNDIRECTED-complete (both (u,v) and (v,u) rows).
    Returns (node, community) for every node with at least one edge.

    Scale shape per round: one join (edges x label frame, equi-keyed on
    the neighbor id) + one (node, label) count aggregate + one argmax
    via min(struct(-count, label)) — all map-side-combinable, no
    windows; lazy localCheckpoints cut lineage so the unrolled loop
    stays action-free (one job).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")) \
        .localCheckpoint(eager=False)
    labels = (e.select(F.col("u").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("lab"))
              .localCheckpoint(eager=False))
    for _ in range(max(rounds, 1)):
        nbr = (e.join(labels.select(F.col("node").alias("v"), "lab"), "v")
               .groupBy("u", "lab")
               .agg(F.count(F.lit(1)).alias("c")))
        labels = (
            nbr.groupBy("u")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("lab"))).alias("m"))
            .select(F.col("u").alias("node"), F.col("m.lab").alias("lab"))
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lab").alias("community"))

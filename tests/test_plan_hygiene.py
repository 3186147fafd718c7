"""Catalog-wide plan hygiene: no quadratic join operators anywhere, and
exchange counts stay within each query family's budget."""

import os

from tools.plan_audit import FORBIDDEN, audit


def test_no_quadratic_join_operators(spark):
    result = audit(spark, os.environ["SPARK_GRAFT_SF_DIR"])
    assert not result["violations"], (
        f"quadratic plans detected ({FORBIDDEN}): {result['violations']}"
    )


#: Entries that legitimately compose TWO full method pipelines (an
#: evaluation harness joining method A's output against method B's
#: ground truth) get double the single-pipeline budget.
COMPOSED = {"dedup_method_agreement", "ann_recall_eval",
            # RRF fusion composes the full bm25_search and embedding_topk
            # ranker pipelines before the (40-row) fusion stage
            "hybrid_search_rrf",
            # four cosine_topk pipelines (full + 8/16/32-dim truncations)
            # scored against each other
            "embedding_matryoshka_recall",
            # composes the LSH candidate pipeline + the 12-column
            # signature joins + the exact candidate-confined verify
            "minhash_error_audit",
            # composes the exact cosine top-10 ground-truth pipeline
            # with the full IVF ranking pipeline before the per-query
            # metric aggregate (the ann_recall_eval shape)
            "retrieval_mrr_ndcg_eval",
            # composes exact keep-min-per-md5 dedup with the full
            # banded minhash pipeline on survivors + two membership
            # joins back to the source rollup
            "dedup_impact_report",
            # composes the full banded-candidate pipeline + the
            # log-round pointer-doubling CC + the split/token rollup
            # (the dedup_impact_report shape with CC instead of bands)
            "cluster_split_assignment",
            # composes the rare-shingle candidate pipeline with the
            # exact candidate-confined idf-cosine verify (the
            # minhash_error_audit candidates+verify shape)
            "tfidf_shingle_cosine_pairs",
            # composes the full IVF-assignment pipeline (centroids +
            # broadcast argmin over the corpus) + the pooled MaxSim
            # rerank + the EXHAUSTIVE brute-force audit pipeline whose
            # membership becomes the brute_hit column (the
            # ann_recall_eval method-vs-ground-truth shape)
            "multivector_maxsim_rerank"}


def test_exchange_budgets(spark):
    """Every exchange is a cluster-wide shuffle. Budgets are generous
    (complex multi-join queries legitimately need several) — the point
    is to catch a refactor that silently doubles a query's shuffles."""
    result = audit(spark, os.environ["SPARK_GRAFT_SF_DIR"])
    over = {n: q["exchanges"] for n, q in result["queries"].items()
            if q["exchanges"] > (24 if n in COMPOSED else 12)}
    assert not over, f"queries exceeding the exchange budget: {over}"


def test_broadcast_hint_rule_fires(spark):
    """The SF-proportional broadcast-hint detector must actually detect:
    a deliberate F.broadcast(customer) hint (the round-2 scale-killer
    class) is flagged, and the same join with an Aggregate bound or
    a Limit cap between hint and scan is not."""
    from pyspark.sql import functions as F

    from tools.plan_audit import broadcast_hint_violations

    sf = os.environ["SPARK_GRAFT_SF_DIR"]
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    bad = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert broadcast_hint_violations(bad) == ["customer"]

    # a KEYED aggregate is NOT unconditionally bounding (its cardinality
    # is the group count — SF-proportional when the key is, e.g.
    # groupBy(c_custkey)); the hardened rule flags it and bounded-domain
    # cases go through BROADCAST_HINT_WHITELIST with an argument
    keyed = cust.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    flagged_keyed = orders.join(
        F.broadcast(keyed), orders.o_orderstatus == keyed.c_mktsegment)
    assert broadcast_hint_violations(flagged_keyed) == ["customer"]

    # an UNGROUPED aggregate is one row — bounded by construction
    scalar = cust.agg(F.count("*").alias("n"))
    ok_scalar = orders.crossJoin(F.broadcast(scalar))
    assert broadcast_hint_violations(ok_scalar) == []

    capped = cust.filter(F.col("c_custkey") < 10).limit(10)
    ok_cap = orders.join(
        F.broadcast(capped), orders.o_custkey == capped.c_custkey)
    assert broadcast_hint_violations(ok_cap) == []

    unhinted = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert broadcast_hint_violations(unhinted) == []

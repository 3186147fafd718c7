"""Plan-hygiene audit over every catalog query.

`.explain` discipline, automated: builds each catalog entry's physical
plan (no execution) and checks the properties that decide whether a plan
survives a 100× scale-up:

- FORBIDDEN operators: `CartesianProduct` and `BroadcastNestedLoopJoin`
  — both are O(n·m) row-pair plans that a missing/mis-typed join key
  silently introduces; at 100 TB they never finish. Any hit fails the
  audit (whitelist below for knowingly-quadratic ops, currently empty).
- Exchange count per query — every exchange is a cluster-wide shuffle;
  the audit reports the count so a refactor that silently adds one gets
  caught in review.
- Parquet scans with an empty pushed-filter list *and* full-width
  ReadSchema are reported (information only: full scans are correct for
  whole-table ops like dedup, wrong for selective queries).

Run: `python tools/plan_audit.py [sf_dir]` → one JSON line; exit 1 on
forbidden operators. Wired into tests/test_plan_hygiene.py so the gate
runs in CI with the rest of the suite.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")
#: Queries knowingly allowed a nested-loop join — each against a side
#: of BOUNDED size, so none is quadratic in the data:
WHITELIST: set[str] = {
    # the brute-force ANN baseline is all-pairs BY DEFINITION (the LSH
    # and IVF variants are its scale path); queries-side is filtered to
    # a bounded probe set
    "embedding_topk",
    # IVF cell assignment: BNLJ against the broadcast centroid table —
    # k centroids (k=16), k-bounded work per row, not data-quadratic
    "embedding_ann_ivf",
    "embedding_ann_ivf_multiprobe",
    # TPC-H Q22 scalar subquery (global avg acctbal) compiles to a BNLJ
    # against a single-row relation
    "q22_idle_customers",
    # derived-partsupp entries: the derivation attaches count(supplier)
    # as a one-row broadcast (operators/partsupp.py) — single-row build
    # side; q11 additionally attaches the global inventory total the
    # same way (its HAVING-vs-global-fraction scalar subquery)
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_promotion_candidates",
    # CMS error audit attaches the total-token scalar as a one-row
    # broadcast (same bounded single-row build side)
    "heavy_hitters_cms",
    # DSIR attaches the corpus gram totals (one Aggregate row) to the
    # <=512-row per-bucket frame — single-row build side, bounded
    "dsir_importance_resample",
    # MMR candidate scoring crossJoins the broadcast 3-query probe set
    # (identical bounded pattern to embedding_topk); the MMR stage
    # itself is candidates², never corpus-quadratic
    "embedding_mmr_topk",
    # MaxSim late interaction: the same bounded probe crossJoin as
    # embedding_topk (3 probes, structural limit) — the corpus side is
    # scanned once, 16 integer dots per (probe, doc)
    "multivector_maxsim_topk",
    # its ANN-pool rerank twin: k=16-centroid broadcast BNLJ for cell
    # assignment (embedding_ann_ivf shape) + the same 3-probe bounded
    # crossJoins for probe-cell selection and the brute audit column
    "multivector_maxsim_rerank",
    # composed IVF→MMR: same k-centroid broadcast BNLJ as
    # embedding_ann_ivf (16 rows) for cell assignment
    "embedding_ann_mmr",
    # corpus-total scalars (one-row broadcast crossJoin attaching
    # t_uni/t_big/n_docs to the vocabulary frame) — single-row side,
    # bounded by construction
    "unigram_logprob",
    "tfidf_doc_keywords",
    "bigram_pmi",
    "bigram_interp_logprob",
    # PQ ADC scoring: crossJoin against the broadcast per-query LUT
    # frame — query side bounded to 10 probes, m×k LUT per row, not
    # data-quadratic (the corpus side is scanned once over codes)
    "embedding_pq_topk",
    # SemDeDup / coreset cell assignment: same k-centroid broadcast BNLJ
    # as embedding_ann_ivf (k=16 rows) — k-bounded work per row; the
    # pairwise pass itself is a hash join on `cell`
    "embedding_semdedup",
    "embedding_semdedup_apply",
    "embedding_coreset",
    # corpus-scalar attach (one-row n_docs/sum_dl side), same shape as
    # tfidf_doc_keywords
    "bm25_search",
    # one-row min/max range attach for equal-width bucketing — single-row
    # side, bounded by construction
    "perplexity_bucket_mix",
    # three one-row sketch-estimate frames crossJoined into the
    # inclusion-exclusion formula — all sides single-row
    "join_cardinality_estimate",
    # recall harness composes the exact baseline (whitelisted bounded
    # all-pairs, 10 probes) with the IVF centroid BNLJ — both bounded
    "ann_recall_eval",
    # Matryoshka eval: four instances of embedding_topk's bounded
    # 10-probe broadcast crossJoin (full + three prefix truncations) —
    # every BNLJ side capped at the probe set
    "embedding_matryoshka_recall",
    # PQ quantization-loss eval: embedding_pq_topk's bounded per-query
    # LUT crossJoin plus the exact-L2 baseline's 10-probe broadcast
    # crossJoin — both sides probe-bounded
    "embedding_pq_recall_eval",
    # hybrid fusion composes bm25_search's one-row corpus-scalar attach
    # and embedding_topk's bounded probe crossJoin (1 query vector);
    # the fusion stage itself is O(lists x k) = 40 rows
    "hybrid_search_rrf",
    # same bounded 10-probe crossJoin as embedding_topk, plus a label
    # anti-filter on the scored stream
    "hard_negative_mining",
    # one-row totals frame (total_mass, sum_isq) broadcast onto the
    # per-stratum rate table — single-row build side by construction
    "corpus_temperature_mix",
    # one-row grand-total frame (sum of the 9 digit counts) broadcast
    # onto the 9-row observed-digit table — both sides bounded by
    # construction (digits 1..9), never grows with data
    "benford_price_audit",
    # one-row corpus-token-total frame broadcast onto the 3-row
    # per-split aggregate (token_share_bp denominator) — single-row
    # build side by construction
    "cluster_split_assignment",
    # one-row n_docs frame broadcast onto the posting frame for the
    # idf denominator — single-row build side by construction (same
    # shape as tfidf_doc_keywords' corpus-scalar attach)
    "tfidf_shingle_cosine_pairs",
    # 5-row (event-type enum) reference-distribution frame crossJoined
    # onto the per-window totals for the dims-grid restore — build
    # side bounded by the type enum, never grows with data
    "stream_drift_monitor_tv",
    # one-row grand-total frame broadcast onto the 5-row lateness-
    # bucket aggregate (share_bp denominator) — single-row build side
    "late_arrival_audit",
    # one-row n_docs frame crossJoined onto the bounded logit-bucket
    # cumulative frame for the quartile boundary — single-row build
    # side by construction (the conformal-threshold attach shape)
    "curriculum_quality_stages",
    # pairwise cosine over the POST-AGGREGATION centroid frame: both
    # sides are |sources| rows (20 here — dimension cardinality, not
    # data volume) and the |sources|^2 matrix IS the requested output,
    # so the quadratic join is the output size, not an accident
    "source_centroid_similarity",
    # Lloyd assignment: BNLJ against the broadcast k=8 centroid frame —
    # init carries a structural limit(8), later rounds are Aggregate
    # roots over `cell` (≤k groups); k-bounded work per row, identical
    # shape to embedding_ann_ivf's centroid BNLJ
    "kmeans_integer_lloyd",
    # attaches the one-row expected-agreement scalar to the one-row
    # totals frame — both sides single-row Aggregate roots
    "cohens_kappa_langid",
    # contingency dims-grid restore: crossJoin of the DISTINCT dow
    # frame (≤7 rows) with the DISTINCT event-type frame (enum-sized)
    # — both Aggregate-rooted value domains, never data-proportional;
    # plus the one-row df scalar attach
    "chi_squared_independence",
    # pairwise-slope join runs over the POST-AGGREGATION daily-count
    # frame: |days| rows bounded by the date span (365/yr), not event
    # volume — the quadratic is in the bounded time dimension
    "theil_sen_trend",
    # two one-row attaches (day-count totals, squared-deviation
    # denominator) onto the bounded daily frame — single-row Aggregate
    # roots; the lag pairing itself is an equi self-join
    "lag_autocorrelation",
    # one-row grand-total attach onto the 3-row top-k share frame —
    # single-row Aggregate root
    "revenue_concentration_topk",
    # pairwise-sign join over the bounded daily frame (theil_sen's
    # argument) plus three one-row scalar attaches (S, n, tie term) —
    # all single-row Aggregate roots
    "mann_kendall_trend",
    # one-row integer-means attach onto the per-user frame — single-row
    # Aggregate root (the Welch two-pass pattern)
    "cuped_variance_reduction",
    # one-row data-end attach onto the per-user event frame —
    # single-row Aggregate root
    "nelson_aalen_recurrence",
    # scoring joins against ONE-ROW weight frames (the w1/w2/u2
    # aggregates) — every build side is a single-row Aggregate root;
    # the corpus never reshuffles
    "batch_perceptron_train",
    # one-row grand-total frame (sum of per-key counts = |orders|)
    # broadcast onto the per-key frequency table — single-row build
    # side by construction (replaced the global-window total)
    "join_skew_stats",
    # MRR/NDCG eval composes embedding_topk's bounded 5-probe broadcast
    # crossJoin (exact ground truth) with embedding_ann_ivf's k=16
    # centroid BNLJ (cell assignment) — both sides bounded, eval-only,
    # the exact arguments of ann_recall_eval
    "retrieval_mrr_ndcg_eval",
    # incremental-IVF maintenance: BNLJ against the persisted centroid
    # frame — 16 rows with a structural limit(16), k-bounded work per
    # row, the kmeans_integer_lloyd centroid argument
    "ivf_index_upsert",
    "ivf_centroid_refresh",
    # one-row grand-total attach onto the 4-row shard rollup — both
    # sides bounded by construction (single-row Aggregate root x
    # n_shards rows)
    "corpus_shard_manifest",
    # power iteration: the corpus crossJoins the ONE-ROW direction
    # frame (an ungrouped 64-column aggregate) each round — single-row
    # build side, the batch_perceptron_train argument
    "embedding_power_iteration",
    # split-conformal audit: three one-row attaches (n_cal/k frame, the
    # quantile threshold q, the final stats join) — every build side a
    # single-row Aggregate root
    "conformal_langid_coverage",
}


#: Tables whose row count grows linearly with scale factor. A broadcast
#: HINT whose build side is one of these overrides AQE's size check and
#: OOMs the executors at 100 TB (customer ≈ 15 B rows at SF100) even
#: though the plan is correct and fast at sf0.1. `nation`/`region` are
#: bounded dimension tables (25 / 5 rows at every SF) and stay hintable.
SF_PROPORTIONAL = (
    "customer", "supplier", "part", "partsupp", "orders", "lineitem",
    "events", "documents", "embeddings",
)
#: Logical operators that decouple output cardinality from input scale:
#: anything below one of these in a hint's subtree is bounded by the
#: limit / the aggregation. Limits are unconditionally bounding. An
#: Aggregate is bounding only when UNGROUPED (one output row): a keyed
#: aggregate's cardinality is its group count, and a grouping key drawn
#: from an SF-proportional column (e.g. groupBy(doc_id).count()) grows
#: with the data — exactly the OOM class this rule exists to catch, so
#: keyed aggregates under a hint need a BROADCAST_HINT_WHITELIST entry
#: arguing the key domain is bounded.
CARDINALITY_BOUNDING = ("GlobalLimit", "Limit")

#: Entries allowed to broadcast-hint a frame derived from an
#: SF-proportional scan WITHOUT an Aggregate/Limit bound — each with a
#: written boundedness argument (the 14-entry TPC-H family that
#: motivated this rule was fixed by dropping the hints; the probe/
#: centroid frames in the embedding entries were fixed by making their
#: bounds structural — a no-op `.limit(n)` after the unique-id filter).
BROADCAST_HINT_WHITELIST: set[str] = {
    # broadcasts the per-group median / MAD frames: a row_number()==mid
    # window filter leaves EXACTLY ONE row per o_orderpriority group,
    # and the group domain is the 5-value priority enum — bounded at
    # any SF, but by a window-filter invariant no structural node shows.
    "mad_outliers",
    # Keyed aggregates whose GROUPING DOMAIN is bounded (the hardened
    # rule prunes only ungrouped aggregates; these carry an argument):
    # per-type mean/std — event_type is a 5-value enum
    "zscore_outliers",
    # per-(dow, hour) baseline — domain <= 7 x 24 = 168 rows
    "events_hourly_anomaly",
    # CMS sketch frame keyed (j, bucket) — fixed 4 x 1024 cells
    "heavy_hitters_cms",
    # bloom bit-array keyed by word_idx — fixed filter width
    "bloom_prefilter_join",
    # DISTINCT dow (<=7) x DISTINCT event_type (enum) dims grid + the
    # one-row df scalar
    "chi_squared_independence",
    # per-source sampling rates — source is a ~20-value enum
    "corpus_token_budget_mix",
    # static reference distribution keyed by event_type — a 5-value
    # enum (plus the one-row total the rule already allows); the
    # window side of the monitor is never broadcast
    "stream_drift_monitor_tv",
    # per-epoch permutation-key checksum — epoch is the literal
    # 3-value (0,1,2) frame, bounded by construction
    "epoch_shuffle_order",
}

#: Entries allowed an UNPARTITIONED window over a frame that is not
#: structurally bounded (no Limit / ungrouped-Aggregate root below it) —
#: each with a written VALUE-DOMAIN argument for why the frame stays
#: single-task-sized at any SF. The rule's mechanical hunt found three
#: genuine offenders, all FIXED rather than whitelisted: bm25_rank and
#: rrf_fuse ranked via an unpartitioned row_number over corpus-
#: proportional scored frames (now TakeOrdered limit-then-rank), and
#: join_skew_stats attached its grand total via a sum-over-all window
#: on the per-key frame (now a one-row broadcast crossJoin). Everything
#: below is a window over a KEYED aggregate whose grouping key is a
#: bounded value domain, not a data-proportional id.
GLOBAL_WINDOW_WHITELIST: set[str] = {
    # global merge-rank over the per-(symbol-pair) count frame — pair
    # domain is the token-bigram vocabulary (Heaps-bounded, ~10^4–10^6
    # at web scale), and BPE's argmax semantics NEED a total order over
    # it; the frame is orders of magnitude smaller than the corpus
    "bpe_pair_counts",
    # cumulative window over the logit-BUCKET histogram (floor-div 5000
    # of the bounded-by-construction quality logit — a few hundred
    # distinct values at any SF), never over per-doc rows; the
    # conformal-threshold pattern
    "curriculum_quality_stages",
    # same BPE merge-rank window inside the train phase of the
    # train+encode composition
    "bpe_encode_corpus",
    # cumulative/total windows over the 64-row equi-width bin frame and
    # the per-distinct-cents exact-quantile frame — bin count is fixed,
    # cents is the price value domain (~10^5 distinct), both
    # corpus-independent; eval-only audit entry
    "quantile_sketch_audit",
    # windows over the per-source aggregate frame — source is a
    # ~20-value enum
    "source_drift_audit",
    # windows over the per-(event_type, bucket) frame — 5-value enum x
    # fixed 10-bucket histogram
    "psi_drift_gate",
    # cumulative-CDF + argmax windows over the per-distinct-n_chars
    # frame — n_chars is the document-length value domain (bounded by
    # max doc length, corpus-independent); argument in the entry
    # description ("windows over the |distinct lengths|-row frame")
    "ks_source_drift",
    # running-min window over the per-DAY aggregate frame — bounded by
    # the date span (365 rows/yr), not event volume
    "pareto_frontier",
    # cumulative rank-sum window over the per-distinct-SCORE frame —
    # score is an integer value domain (the midrank construction
    # exists precisely to avoid a corpus-wide rank window)
    "classifier_auc_ranksum",
    # cumulative TP/FP windows over the per-distinct-threshold frame —
    # same integer score domain as classifier_auc_ranksum
    "roc_curve_points",
    # row/col/grand-total windows over the dow x event_type contingency
    # grid — <= 7 x enum cells (same argument as its broadcast-hint
    # whitelist entry)
    "chi_squared_independence",
    # cumulative midrank windows over per-distinct-VALUE frames (the
    # doubled-midrank construction) — value domains on both variables
    "spearman_rank_correlation",
    # median-of-slopes rank window over the pairwise-slope frame of the
    # per-DAY aggregate — |days|^2 pairs, bounded by the date span
    "theil_sen_trend",
    # cumulative risk-set/event windows over the per-distinct-gap-hour
    # frame — gap hours is a bounded value domain (entry description
    # carries the argument)
    "nelson_aalen_recurrence",
    # cumulative count window over the per-DISTINCT-margin calibration
    # frame — margins are integer stopword-count differences (bounded
    # value domain, not corpus size); the classifier_auc_ranksum
    # midrank argument
    "conformal_langid_coverage",
}


def broadcast_hint_violations(df) -> list[str]:
    """Return the SF-proportional tables scanned under an explicit
    broadcast HINT with no cardinality-bounding operator in between.

    Walks the ANALYZED logical plan (hints are eliminated from the
    optimized plan): for every ``ResolvedHint (strategy=broadcast)``
    node, descend its subtree pruning at Aggregate/Limit; any
    ``LogicalRelation`` leaf whose file path names an SF-proportional
    table means the hint ships a frame whose size grows with the data —
    exactly the plan that dies at 100×. AQE's runtime size check (which
    an explicit hint overrides) is the correct mechanism for those."""
    hits: list[str] = []

    def scan(node):
        name = node.getClass().getSimpleName()
        bounding = name in CARDINALITY_BOUNDING or (
            name == "Aggregate" and node.groupingExpressions().isEmpty()
        )
        if bounding:
            # This hint's frame is bounded here — but a NESTED broadcast
            # hint sitting below the bound is an independent broadcast
            # whose own subtree may be unbounded (e.g.
            # broadcast(x.join(broadcast(customer)).agg(...))): resume
            # the outer walk on the children so it is audited on its own
            # merits rather than silently pruned (round-3 advisor gap).
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
            return
        if name == "LogicalRelation":
            try:
                path = node.relation().location().rootPaths().apply(0).toString()
            except Exception:
                path = ""
            for t in SF_PROPORTIONAL:
                if f"/{t}.parquet" in path:
                    hits.append(t)
            return
        ch = node.children()
        for i in range(ch.size()):
            scan(ch.apply(i))

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "ResolvedHint" and "broadcast" in node.hints().toString():
            scan(node)
            return  # nested hints inside an already-flagged subtree: one report
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return sorted(set(hits))


def global_window_violations(df) -> list[str]:
    """Return SF-proportional tables scanned under a window function
    with NO partition spec and no cardinality bound in between.

    An unpartitioned window collapses its whole input onto ONE task
    (single-partition WindowExec) — fine over a frame already bounded by
    an aggregation or limit, fatal over a data-proportional frame at
    100×. Mechanical form of the prose rule the round-3 verdict asked
    for: walk the ANALYZED plan; for every ``Window`` node whose
    partitionSpec is empty, descend pruning at Limit and UNGROUPED
    Aggregate (one row — bounded). A KEYED aggregate's cardinality is
    its group count, which only a value-domain argument can bound, so
    keyed-aggregate-rooted frames need a GLOBAL_WINDOW_WHITELIST entry
    with that argument — the same treatment broadcast hints got."""
    hits: list[str] = []

    def scan(node):
        name = node.getClass().getSimpleName()
        bounding = name in CARDINALITY_BOUNDING or (
            name == "Aggregate" and node.groupingExpressions().isEmpty()
        )
        if bounding:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
            return
        if name == "LogicalRelation":
            try:
                path = node.relation().location().rootPaths().apply(0).toString()
            except Exception:
                path = ""
            for t in SF_PROPORTIONAL:
                if f"/{t}.parquet" in path:
                    hits.append(t)
            return
        ch = node.children()
        for i in range(ch.size()):
            scan(ch.apply(i))

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            scan(node)
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return sorted(set(hits))


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(spark, sf_dir: str) -> dict:
    from debezium_server_spark.plans.catalog import CATALOG

    result = {"queries": {}, "violations": []}
    for name, qd in CATALOG.items():
        df = qd.spark_fn(spark, sf_dir)
        plan = physical_plan(df)
        n_exchange = plan.count("Exchange")
        bad = [op for op in FORBIDDEN if op in plan and name not in WHITELIST]
        full_scans = len(re.findall(r"PushedFilters: \[\]", plan))
        hinted = ([] if name in BROADCAST_HINT_WHITELIST
                  else broadcast_hint_violations(df))
        gwin = ([] if name in GLOBAL_WINDOW_WHITELIST
                else global_window_violations(df))
        result["queries"][name] = {
            "exchanges": n_exchange,
            "unfiltered_scans": full_scans,
        }
        if bad:
            result["violations"].append({"query": name, "operators": bad})
        if hinted:
            result["violations"].append(
                {"query": name, "sf_broadcast_hints": hinted})
        if gwin:
            result["violations"].append(
                {"query": name, "unbounded_global_windows": gwin})
    return result


def main() -> int:
    from debezium_server_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-audit")
    result = audit(spark, sf_dir)
    total_ex = sum(q["exchanges"] for q in result["queries"].values())
    print(json.dumps({
        "metric": "plan_audit",
        "queries": len(result["queries"]),
        "total_exchanges": total_ex,
        "violations": result["violations"],
        "per_query": result["queries"],
    }))
    return 1 if result["violations"] else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Wall-time-vs-scale-factor slopes for the most expensive batch entries.

SCALE.md argues O-shapes; this measures them. Runs each query at
sf0.1 (driver fixture) and at the locally tiled sf0.5 / sf1 trees
(tools/make_scale_fixtures.py), then reports the log-log elasticity

    slope = log(t_sf1 / t_sf0.1) / log(10)

slope ~0   fixed overhead dominates (fine)
slope ~1   linear in data (the target shape for scans/joins/aggs)
slope >1.2 super-linear -> flagged: something quadratic or a plan
           that stops holding as frames outgrow broadcast thresholds.

Timing protocol: one warm-up run of the FIRST query only (JVM/codegen
warm-up is per-session, not per-query), then each (query, sf) timed
once, smallest SF first so codegen caches are warm before the larger
runs — biases AGAINST finding false super-linearity. Streaming replay
entries are excluded (fixed state-store replay cost, measured
separately in BENCH_NOTES.md).

Run: python tools/scaling_curve.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_spark import get_spark  # noqa: E402
from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402

SF_DIRS = [
    (0.1, "/root/testdata/sf0.1"),
    (0.5, "/tmp/scaling/sf0.5"),
    (1.0, "/tmp/scaling/sf1"),
]

#: The most expensive batch entries from BENCH_r02 plus one
#: representative per at-risk family (quadratic candidate generation,
#: iterative convergence, window-heavy, grouped-Arrow).
QUERIES = [
    "jaccard_prefix_filter_join",
    "embedding_pq_recall_eval",
    "embedding_pq_topk",
    "winnowing_overlap_audit",
    "nb_holdout_confusion",
    "ann_recall_eval",
    "nb_lang_train_score",
    "dedup_method_agreement",
    "exact_span_removal",
    "mad_outliers",
    "dedup_cc_clusters",
    "bigram_interp_logprob",
    "embedding_semdedup_apply",
    "dedup_ngram_jaccard",
    "embedding_semdedup",
    "hybrid_search_rrf",
    "q1_pricing_summary",
    "exact_span_pairs",
    "profile_lineitem",
    "graph_pagerank",
    "dedup_minhash_apply",
    "embedding_ann_mmr",
    "dedup_simhash_pairs",
    "clamped_running_balance",
    "dedup_minhash_lsh",
    "q9_product_type_profit",
    "q18_large_volume_customer",
    "sessionize",
    "user_peak_event",
    "bpe_pair_counts",
    # round-3 block 2-6 additions worth a measured slope: the unrolled
    # iterative Lloyd rounds, the recursive encode fold, the x101
    # bootstrap fan-out, the inverted-index novelty join, and the
    # value-domain-window rank correlation
    "kmeans_integer_lloyd",
    "bpe_encode_corpus",
    "poisson_bootstrap_ci",
    "ngram_novelty_score",
    "spearman_rank_correlation",
    "dq_expectations",
    # round-4 block-2 additions worth a measured slope: the CC-derived
    # cluster split (banded pairs + pointer doubling + rollup), the
    # rare-shingle candidate cosine join, the candidate-confined
    # Levenshtein verify, two unrolled LPA rounds, the per-user RANGE
    # frame, the reward interval join, and the lateness running max
    "cluster_split_assignment",
    "tfidf_shingle_cosine_pairs",
    "dedup_edit_distance_verify",
    "graph_label_propagation",
    "rate_limit_audit",
    "ips_offpolicy_eval",
    "late_arrival_audit",
    # round-5 additions: the three wire-format decode pipelines (codec
    # throughput must be linear in events — encode twin + decode +
    # band join / registry are all increment-proportional) and the
    # IVF-pooled MaxSim rerank (pool-proportional, not corpus²)
    "pgoutput_changelog_decode",
    "oplog_changelog_decode",
    "binlog_changelog_decode",
    "multivector_maxsim_rerank",
    # round-6 additions: the binary-JSON cell codec (per-byte decode,
    # expected linear like its binlog sibling) and the SQL Server
    # change-table decode (equi self-join pairing — |changes|-linear)
    "binlog_json_decode",
    "sqlserver_cdc_changes",
    # TRANSACTION_PAYLOAD decode: zstd decompress + inner decode per
    # payload inside mapInPandas — expected linear, codec constant
    "binlog_compressed_tx_decode",
    # binary-format ('b') typed decode — same band-join shape as the
    # text-mode pgoutput entry, per-value struct unpacks in the codec
    "pgoutput_binary_decode",
    # Iceberg writer round trip: two commits + two manifest-chain
    # reads — data plane linear in rows, control plane O(n_buckets)
    # manifests per commit (fixed), so expected slope ≈ 1 with a large
    # fixed floor at small SF
    "iceberg_upsert_roundtrip",
    # round-7 additions: the Delta twin (checkpoint write is an
    # O(n_buckets) control frame, so same shape as the Iceberg one)
    # and the LogMiner redo-SQL decode (chain groupBy + per-row parse
    # — |poll|-linear, the CSF chains are bounded)
    "delta_upsert_roundtrip",
    "logminer_cdc_changes",
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    spark = get_spark("scaling-curve")
    # warm-up: codegen + parquet footer caches
    CATALOG[QUERIES[0]].spark_fn(spark, SF_DIRS[0][1]).count()

    rows: dict[str, dict] = {}
    for name in QUERIES:
        qd = CATALOG[name]
        times: dict[str, float] = {}
        for sf, d in SF_DIRS:
            t0 = time.time()
            qd.spark_fn(spark, d).count()
            times[str(sf)] = round(time.time() - t0, 3)
        import math
        slope = math.log(max(times["1.0"], 1e-3) / max(times["0.1"], 1e-3)) / math.log(10)
        rows[name] = {**times, "slope": round(slope, 3)}
        print(json.dumps({"query": name, **rows[name]}), flush=True)

    with open(out_path, "w") as f:
        json.dump({"sf_dirs": dict((str(s), d) for s, d in SF_DIRS),
                   "queries": rows}, f, indent=1)
    flagged = {k: v for k, v in rows.items() if v["slope"] > 1.2}
    print(f"\nsuper-linear (slope>1.2): {sorted(flagged) or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every operator from SURVEY.md §2 (CDC pipeline
surface, relational surface, LLM-data-pipeline extensions) as
(spark, sf_dir) -> DataFrame callables; `oracle_sql()` provides the
DuckDB-equivalent SQL for each (column names and dtypes aligned for the
driver's order-insensitive value-hash). Implementations live in
debezium_server_spark/plans/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402

FLAGSHIP = "q5_local_supplier_volume"

#: The driver's correctness run checks the FIRST 50 entries of
#: `queries()` in iteration order. The window now ROTATES each round
#: (round-3 verdict #1): `tools/rotate_driver_window.py` derives each
#: entry's driver-observation history from the committed
#: CORRECTNESS_r*.json files and writes DRIVER_WINDOW.json — ~10 fixed
#: canaries (one per shared infrastructure path), then every
#: never-driver-observed entry in catalog order, then
#: least-recently-observed fill — so all 241 entries earn a green
#: driver row within a few rounds instead of the same curated 50
#: forever. The static tuple below is the FALLBACK when the manifest is
#: absent (and documents the round-3 curated window the rotation
#: replaced).
FALLBACK_WINDOW: tuple[str, ...] = (
    # canaries — long-green core-pipeline entries kept for regression
    # signal on the shared load/compare path itself
    "cdc_latest_state",
    "route_rename",
    "predicate_filter_json",
    # stateful streaming replays: watermark semantics, state GC, strict
    # emission boundaries — the hardest-won oracles in the repo
    "stream_session_windows",
    "stream_hourly_counts",
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_interval_join_right_outer",
    "stream_interval_join_full_outer",
    "stream_first_touch",
    "stream_enrich_dimension",
    "stream_running_stats",
    "stream_trending_topk",
    "stream_session_dynamic_gap",
    "stream_dedup_watermark",
    "stream_dedup_then_hourly",
    "stream_cep_matches",
    "stream_cep_every_start",
    "stream_cep_contiguous",
    "stream_cep_negation",
    "stream_cep_value_gate",
    "stream_cep_abandoned",
    "stream_hopping_counts",
    # the one applyInPandas escape hatch (two-sided saturating fold)
    "clamped_running_balance",
    # ANN / embedding quantization + the recall-eval harnesses
    "embedding_pq_topk",
    "embedding_pq_recall_eval",
    "embedding_ann_ivf_multiprobe",
    "embedding_matryoshka_recall",
    "ann_recall_eval",
    "dedup_method_agreement",
    # set-similarity and exact-substring dedup (candidate-completeness
    # arguments live or die here)
    "jaccard_prefix_filter_join",
    "exact_span_pairs",
    "exact_span_removal",
    "winnowing_overlap_audit",
    "dedup_minhash_apply",
    "dedup_cc_clusters",
    # iterative / recursive: unrolled-round oracles
    "graph_pagerank",
    "batch_perceptron_train",
    "hierarchy_rollup",
    # trained-model + holdout evals (split determinism on both engines)
    "nb_holdout_confusion",
    # newest-risk round-3 additions: banded-hamming media dedup and
    # right-censored survival windows (bpe_pair_counts and
    # markov_holdout_accuracy rotate out — long green since round 2,
    # still covered by the local three-SF sweeps)
    "media_ahash_dedup",
    "nelson_aalen_recurrence",
    # exact-analytics entries with the trickiest numeric contracts
    "quantile_cont_prices",
    "ewma_user_daily",
    "cusum_changepoint",
    # round-3 additions (newest code = least soak time); favors the
    # novel-mechanism entries — the recursive-CTE BPE train+encode
    # fold and the unrolled iterative Lloyd rounds — over plain-join
    # entries like containment_quote_join/dedup_keep_best_apply, which
    # the local three-SF sweeps cover
    "graph_kcore",
    "bpe_encode_corpus",
    "minhash_error_audit",
    "kmeans_integer_lloyd",
    "dsir_importance_resample",
)


def _window() -> tuple[str, ...]:
    manifest = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "DRIVER_WINDOW.json")
    try:
        import json

        with open(manifest) as f:
            names = json.load(f)["window"]
        loaded = tuple(n for n in names if n in CATALOG)
        if loaded:
            return loaded
    except (OSError, ValueError, KeyError):
        pass
    return FALLBACK_WINDOW


def _ordered() -> list[str]:
    window = _window()
    in_window = set(window)
    rest = [n for n in CATALOG if n not in in_window]
    return [*window, *rest]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG[FLAGSHIP].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: CATALOG[name].spark_fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return {
        name: CATALOG[name].oracle
        for name in _ordered()
        if CATALOG[name].oracle is not None
    }

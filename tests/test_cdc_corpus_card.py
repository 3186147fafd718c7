"""End-to-end flagship invariants: stream_cdc_corpus_card composes the
CDC half (snapshot→stream handoff → parquet-upsert latest state) with
the curation half (quality gate → incremental band dedup → data card).
The DuckDB oracle checks exact values; these tests pin the STRUCTURAL
invariants that survive fixture changes, so a regression localizes
(CDC state wrong vs curation wrong vs card arithmetic wrong)."""

from pyspark.sql import functions as F

from debezium_server_spark.plans.catalog import CATALOG, load


def test_cdc_corpus_card_invariants(spark, sf_dir):
    card = CATALOG["stream_cdc_corpus_card"].spark_fn(spark, sf_dir)
    rows = card.collect()
    assert rows, "card must have one row per source"
    assert card.columns == [
        "source", "n_state", "n_quality_drop", "n_dup_drop",
        "n_corpus", "kept_bp", "corpus_tokens",
    ]

    # CDC phase: the materialized state is exactly the non-deleted docs
    # (latest-wins leaves one row per surviving key, op=d removes)
    docs = load(spark, sf_dir, "documents")
    expected_state = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 11 != 0)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_state = {r["source"]: r["n_state"] for r in rows}
    assert got_state == expected_state

    # curation phase: every state doc is accounted for exactly once
    for r in rows:
        assert r["n_state"] == (
            r["n_quality_drop"] + r["n_dup_drop"] + r["n_corpus"]
        ), f"row conservation violated for {r['source']}"
        assert r["kept_bp"] == r["n_corpus"] * 10000 // r["n_state"]
        if r["n_corpus"] > 0:
            assert r["corpus_tokens"] > 0

    # the dedup stage must actually drop something on these fixtures
    # (the fixture generator plants near-dup pairs) and the quality gate
    # must pass most docs — catches a silently-empty corpus
    total = sum(r["n_state"] for r in rows)
    kept = sum(r["n_corpus"] for r in rows)
    dup = sum(r["n_dup_drop"] for r in rows)
    assert dup > 0, "incremental dedup dropped nothing — index dead?"
    assert kept > total // 2, "corpus suspiciously small"


def test_cdc_corpus_card_is_deterministic(spark, sf_dir):
    """Two full executions (fresh temp dirs, fresh streaming queries,
    fresh epoch markers) must produce identical cards — the entry's
    whole design claim (lsn-ordered latest-wins + pinned increments)."""
    fn = CATALOG["stream_cdc_corpus_card"].spark_fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b

"""Deterministic sampling operators: reproducibility, stratification,
salt independence, token-budget rates (catalog entries cover parity)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.sampling import (
    BUCKETS,
    hash_sample,
    stratified_sample,
    token_budget_sample,
)


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("zh").alias("lang"),
        (F.col("id") % 7 + 1).cast("long").alias("n_toks"),
    )


def test_hash_sample_is_deterministic_and_near_rate(spark):
    df = _corpus(spark)
    a = hash_sample(df, "doc_id", 2500).collect()
    b = hash_sample(df, "doc_id", 2500).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert 0.20 < len(a) / 2000 < 0.30  # ≈25%


def test_hash_sample_rate_zero_and_full(spark):
    df = _corpus(spark)
    assert hash_sample(df, "doc_id", 0).count() == 0
    assert hash_sample(df, "doc_id", BUCKETS).count() == 2000


def test_salted_samples_are_independent_subsets(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 5000, "s1").collect()}
    b = {r["doc_id"] for r in hash_sample(df, "doc_id", 5000, "s2").collect()}
    # different salts pick different sets; overlap ≈ 25% of corpus
    assert a != b
    assert 0.15 < len(a & b) / 2000 < 0.35


def test_stratified_rates_apply_per_stratum(spark):
    df = _corpus(spark, 3000)
    kept = stratified_sample(
        df, "lang", {"en": 9000, "zh": 1000}, "doc_id"
    ).groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in kept}
    assert by["en"] / 1000 > 0.8 and by["zh"] / 2000 < 0.2


def test_stratum_missing_from_rates_is_dropped(spark):
    df = _corpus(spark)
    kept = stratified_sample(df, "lang", {"en": BUCKETS}, "doc_id")
    assert kept.where(F.col("lang") == "zh").count() == 0
    assert kept.where(F.col("lang") == "en").count() == df.where(
        F.col("lang") == "en").count()


def test_token_budget_hits_target_within_tolerance(spark):
    df = _corpus(spark, 3000)
    totals = {r["lang"]: r["t"] for r in df.groupBy("lang")
              .agg(F.sum("n_toks").alias("t")).collect()}
    budgets = {"en": totals["en"] // 4, "zh": totals["zh"] // 2}
    kept = token_budget_sample(
        df, "lang", F.col("n_toks"), budgets, "doc_id"
    ).groupBy("lang").agg(F.sum("n_toks").alias("t")).collect()
    got = {r["lang"]: r["t"] for r in kept}
    for lang, budget in budgets.items():
        assert 0.7 < got[lang] / budget < 1.3


def test_token_budget_caps_rate_at_full(spark):
    df = _corpus(spark, 100)
    kept = token_budget_sample(
        df, "lang", F.col("n_toks"), {"en": 10**9, "zh": 10**9}, "doc_id"
    )
    assert kept.count() == 100
    assert kept.select("rate_bp").distinct().collect()[0]["rate_bp"] == BUCKETS


def test_quantize_int8_edges(spark):
    from debezium_server_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 0.5, 1.0]), (2, [3.0, 3.0, 3.0]), (3, [-1.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert out[1]["q"] == [0, 127, 255]
    assert out[2]["q"] == [0, 0, 0], "constant vector quantizes to zeros"
    assert out[3]["q"][0] == 0 and out[3]["q"][1] == 255
    assert out[1]["vmin"] == 0.0 and out[1]["vmax"] == 1.0


def test_train_val_test_split_partition_and_determinism(spark):
    from debezium_server_spark.operators.sampling import train_val_test_split

    df = _corpus(spark)
    a = train_val_test_split(df, "doc_id").collect()
    b = train_val_test_split(df, "doc_id").collect()
    assert sorted((r["doc_id"], r["split"]) for r in a) == sorted(
        (r["doc_id"], r["split"]) for r in b
    )
    shares = {}
    for r in a:
        shares[r["split"]] = shares.get(r["split"], 0) + 1
    assert set(shares) == {"train", "val", "test"}
    # ≈90/5/5 with hash noise at n=2000
    assert shares["train"] / 2000 > 0.85
    assert 0.02 < shares["val"] / 2000 < 0.09
    assert 0.02 < shares["test"] / 2000 < 0.09
    # every row lands in exactly one split (split is a total function)
    assert len(a) == 2000


def test_weighted_priority_sample_favors_heavy_rows(spark):
    from debezium_server_spark.operators.sampling import (
        weighted_priority_sample,
    )
    from pyspark.sql import functions as F

    # 200 light docs (weight 10) vs 200 heavy docs (weight 1000): the
    # top-50 should be overwhelmingly heavy, and membership must be a
    # stable function of (key, weight, salt).
    rows = [(i, 10) for i in range(200)] + [(i + 200, 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_priority_sample(df, "doc_id", F.col("w"), k=50)
    picked = [r["doc_id"] for r in got.collect()]
    heavy = sum(1 for d in picked if d >= 200)
    assert heavy >= 45  # ~100x weight ratio -> heavy rows dominate
    again = [r["doc_id"]
             for r in weighted_priority_sample(df, "doc_id", F.col("w"),
                                               k=50).collect()]
    assert picked == again  # deterministic, order included


def test_temperature_mix_flattens_toward_tail(spark):
    from debezium_server_spark.operators.sampling import (
        sample_bucket, temperature_mix,
    )
    from pyspark.sql import functions as F

    # heavy source: 900 units of mass; light source: 100 units
    rows = [(i, "heavy", 9) for i in range(100)] + [
        (1000 + i, "light", 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    kept = temperature_mix(df, "source", F.col("w"), key_col="doc_id")
    rates = {r["source"]: r["rate_bp"] for r in
             kept.select("source", "rate_bp").distinct().collect()}
    # alpha=0.5 shares: sqrt(900):sqrt(100) = 3:1 of budget 250
    # heavy: 250*3/4 / 900 -> ~2083bp ; light: 250*1/4 / 100 -> 6250bp
    assert rates["light"] > rates["heavy"] * 2, (
        "temperature mixing must up-sample the low-resource source")
    # deterministic membership: same salt -> identical kept set
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in temperature_mix(
        df, "source", F.col("w"), key_col="doc_id").collect())
    assert a == b


def test_temperature_mix_skips_zero_mass_strata(spark):
    """A stratum whose rows all have weight 0 must be dropped, not
    raise ANSI DIVIDE_BY_ZERO in the rate expression."""
    from pyspark.sql import functions as F

    from debezium_server_spark.operators.sampling import temperature_mix

    rows = [(i, "real", 5) for i in range(50)] + [
        (100 + i, "empty", 0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    kept = temperature_mix(df, "source", F.col("w"), key_col="doc_id")
    assert {r["source"] for r in kept.collect()} == {"real"}


def test_dsir_prefers_target_like_docs(spark):
    """Docs whose bigrams match the target distribution score strictly
    higher than off-distribution docs; zero/one-token docs drop out of
    scoring entirely (no fabricated null grams from the descending-
    sequence trap)."""
    from debezium_server_spark.operators.sampling import (
        dsir_importance_weights,
    )
    from pyspark.sql import functions as F

    rows = (
        # target corpus: "good clean text" style bigrams
        [(i, "good clean text good clean", 1) for i in range(20)]
        # raw, target-like
        + [(100, "good clean text good", 0)]
        # raw, off-distribution
        + [(101, "zz yy xx ww vv", 0)]
        # raw, degenerate single-token
        + [(102, "solo", 0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, t int")
    w = dsir_importance_weights(df, F.col("t") == 1, key_col="doc_id")
    got = {r["key"]: r["weight_micronats"] for r in w.collect()}
    assert 102 not in got            # no grams -> not scored
    assert got[100] > got[101]       # target-like outranks junk
    assert got[100] > 0 > got[101]   # signs match the log-ratio intuition

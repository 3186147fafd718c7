"""Deterministic corpus sampling / mixing operators.

Training-data pipelines sample with a *hash*, not an RNG: md5-bucket the
stable document key and keep buckets below a basis-point threshold. That
makes the sample reproducible across runs, engines, and cluster
topologies (no per-partition RNG state, no seed-ordering dependence),
composable (a 50% sample of a 50% sample with different salts is an
independent 25%), and embarrassingly parallel — the filter is a pure
per-row expression that rides the parquet scan, so at 100 TB the sample
IS the scan with a cheap predicate, no shuffle at all.

The reference has no sampling surface (it ships every change event);
these extend the engine for corpus curation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sampling resolution: rates are expressed in basis points out of 10 000.
#: Integer thresholds (not float rates) so Spark and any SQL oracle agree
#: bit-for-bit on the keep/drop decision.
BUCKETS = 10_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS): first 60 bits of md5(key || salt)
    mod BUCKETS. Pure column expression — whole-stage codegen, no UDF."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % BUCKETS


def hash_sample(df: DataFrame, key_col: str, rate_bp: int,
                salt: str = "") -> DataFrame:
    """Keep rows whose bucket < `rate_bp` (basis points of 10 000).
    Deterministic ≈rate_bp/10000 sample; different salts give independent
    samples of the same table."""
    return df.where(sample_bucket(F.col(key_col), salt) < F.lit(int(rate_bp)))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates_bp: dict[str, int], key_col: str,
                      salt: str = "") -> DataFrame:
    """Per-stratum hash sampling — the corpus-mixing primitive ("keep 80%
    of en, 30% of zh, …"). The rate table rides as a literal MAP in the
    row expression: no join, no broadcast, still a bare filtered scan."""
    pairs = [F.lit(x) for kv in rates_bp.items() for x in kv]
    rate = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)].cast("long"), F.lit(0)
    )
    return df.where(sample_bucket(F.col(key_col), salt) < rate)


def token_budget_sample(df: DataFrame, strata_col: str, weight: Column,
                        budgets: dict[str, int], key_col: str,
                        salt: str = "") -> DataFrame:
    """Sample each stratum down to ≈ a weight budget (tokens, chars, …):
    rate_bp = min(10000, floor(budget * 10000 / stratum_total)).

    Two-pass shape built for scale: pass 1 aggregates per-stratum totals
    (tiny result — one row per stratum), pass 2 broadcast-joins the rate
    table back and filters. The big table is scanned twice but never
    shuffled. The rate arithmetic stays in integers + one IEEE divide +
    floor, identical in any engine.

    Output gains a `rate_bp` column so downstream stages (and oracles)
    can audit the applied rate.
    """
    budget_pairs = [F.lit(x) for kv in budgets.items() for x in kv]
    budget = F.coalesce(
        F.create_map(*budget_pairs)[F.col(strata_col)].cast("long"), F.lit(0)
    )
    rates = (
        df.groupBy(strata_col)
        .agg(F.sum(weight).cast("long").alias("__total"))
        .select(
            strata_col,
            F.least(
                F.lit(BUCKETS).cast("long"),
                F.floor(
                    budget.cast("double") * BUCKETS / F.col("__total").cast("double")
                ),
            ).cast("long").alias("rate_bp"),
        )
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(sample_bucket(F.col(key_col), salt) < F.col("rate_bp"))
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_bp: int = 500,
    test_bp: int = 500,
    salt: str = "split",
) -> DataFrame:
    """Deterministic three-way corpus split: one stable md5 bucket per
    key partitions rows into train/val/test with basis-point shares
    (default 90/5/5). Same guarantees as `hash_sample` — reproducible
    across runs/engines/topologies, zero-shuffle (the split column is a
    pure row expression riding the scan), and leak-proof: a key lands in
    exactly one split, forever, because membership is a function of the
    key alone (append-only corpora keep their historical assignment)."""
    b = sample_bucket(F.col(key_col), salt)
    split = (
        F.when(b < F.lit(int(test_bp)), F.lit("test"))
        .when(b < F.lit(int(test_bp + val_bp)), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    k: int,
    salt: str = "wps",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis–Spirakis priority shape): keep the k rows with the
    LOWEST priority (ascending top-k)

        priority = hash60(key || salt) DIV weight     (pure int64)

    A row's inclusion odds scale with its weight (a larger weight
    shrinks its hash-per-unit-weight priority, so ascending top-k
    favors heavy rows), membership is a pure function of (key, weight,
    salt) — reproducible across runs and engines, append-stable for
    unchanged rows — and selection is a global TakeOrdered: no shuffle
    of the data, just a top-k reduce of (priority, key) pairs, the
    right 100 TB shape for "sample 10k docs proportional to token
    count". The classic E-S uses u^(1/w) with random u; this hash-
    deterministic integral variant keeps the weight-monotone ordering
    property while staying bit-exact in SQL (60-bit hash over int64
    division — quotient granularity ~2^60/w, collisions key-broken).

    Returns only (key, weight, priority) — join back to `df` on the key
    to recover full rows. Rows with weight <= 0 carry zero sampling
    mass and are excluded up front (mirroring temperature_mix's
    zero-mass stratum filter); without the guard an empty doc's
    weight=0 raises DIVIDE_BY_ZERO under ANSI mode.
    """
    h = F.conv(F.substring(F.md5(F.concat(F.col(key_col).cast("string"),
                                          F.lit(salt))), 1, 15), 16, 10
               ).cast("long")
    w = weight.cast("long")
    return (
        df.select(F.col(key_col), w.alias("weight"), h.alias("__h"))
        .filter(F.col("weight") > 0)
        # integral divide (DIV), not `/`: float division would round the
        # 60-bit hash through a 53-bit mantissa before truncation
        .withColumn("priority", F.expr("__h DIV weight"))
        .drop("__h")
        .orderBy(F.asc("priority"), F.asc(key_col))
        .limit(int(k))
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    weight: Column,
    key_col: str,
    denom: int = 4,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-flattened corpus mixing at alpha = 0.5 (the
    mT5/XLM-R recipe): the output budget is split across strata
    proportional to mass^alpha instead of mass, up-sampling
    low-resource strata relative to their raw share. Budget =
    total_mass / `denom`, so the knob is scale-free.

    Exactness across engines, despite the fractional exponent: alpha is
    fixed at 0.5 because IEEE-754 requires sqrt (unlike pow) to be
    CORRECTLY ROUNDED — both engines produce the identical double.
    Each stratum's sqrt(mass) is then floor-quantized to an integer
    (x1000) so the cross-stratum normalizing SUM is order-free, and the
    final keep-rate is pure integer arithmetic in DECIMAL(38,0)
    headroom:

        rate_bp = min(10000, (10000 * (total DIV denom) * isq)
                              DIV (sum_isq * mass))

    Membership is the same md5-bucket predicate as `hash_sample` —
    zero-shuffle scan filter, append-stable, engine-portable. Two-pass
    shape like `token_budget_sample`: a tiny per-stratum aggregate plus
    a one-row totals frame broadcast back onto the scan.
    """
    per = (
        df.groupBy(strata_col)
        .agg(F.sum(weight).cast("long").alias("__mass"))
        # zero-mass strata carry nothing to sample; dropping them here
        # both matches the budget semantics (their share of mass^0.5 of
        # zero mass is zero) and avoids the ANSI DIVIDE_BY_ZERO the
        # rate expression's (sum_isq * mass) denominator would raise
        .filter(F.col("__mass") > 0)
        .withColumn(
            "__isq",
            F.floor(F.sqrt(F.col("__mass").cast("double")) * 1000.0).cast("long"),
        )
        # feeds two consumers (totals + rates) — cut lineage so the
        # per-stratum aggregate runs once, not once per consumer
        .localCheckpoint(eager=False)
    )
    tot = per.agg(
        F.sum("__mass").cast("long").alias("__total"),
        F.sum("__isq").cast("long").alias("__sum_isq"),
    )
    rates = (
        per.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            F.expr(
                "CAST(least(CAST(10000 AS BIGINT), "
                f"(CAST(10000 AS DECIMAL(38,0)) * (__total DIV {int(denom)}) * __isq) "
                "DIV (CAST(__sum_isq AS DECIMAL(38,0)) * __mass)) AS BIGINT)"
            ).alias("rate_bp"),
        )
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(sample_bucket(F.col(key_col), salt) < F.col("rate_bp"))
    )


def dsir_importance_weights(
    df: DataFrame,
    is_target: Column,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every RAW doc by
    how target-like its hashed-bigram distribution is,

        w(doc) = Σ_grams  [ ln p_target(bucket(g)) − ln p_raw(bucket(g)) ]

    with add-1 smoothing over `n_buckets` hashed feature buckets. Docs
    whose n-gram profile matches the target domain (e.g. curated
    English) get high weight; selection = keep the top-k by weight —
    the deterministic analog of DSIR's Gumbel-noised resampling (an RNG
    has no cross-engine/ cross-run stability; rank order is what the
    noise perturbs, so top-k is the de-noised limit).

    Exactness: per-bucket λ_b = floor((ln p_t − ln p_r)·1e6) is an
    integer micro-nat (the unigram_logprob trick), so each doc's weight
    is an exact integer dot product count_b·λ_b — engine-portable.

    Scale shape: one corpus pass builds per-bucket counts (groupBy over
    ≤ n_buckets keys, map-side combinable), the λ table is
    Aggregate-bounded (≤ n_buckets rows — broadcast provably bounded),
    scoring is one equi-join of doc-gram counts against it, and
    selection is a global top-k. No shuffle wider than the gram
    explode; the 100 TB cost is the tokenize scan.

    Returns (key, n_grams, weight_micronats) for ALL raw docs —
    callers `.orderBy(desc).limit(k)` to resample.
    """
    from debezium_server_spark.functions.text_functions import tokens

    toks = tokens(F.col(text_col))
    # guard single-token docs: Spark's sequence(1, 0) is DESCENDING
    # ([1, 0]), not empty — it would fabricate a null-padded gram
    grams = F.expr(
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat(__toks[i - 1], ' ', __toks[i])) "
        "ELSE CAST(array() AS array<string>) END"
    )
    base = (
        df.select(
            F.col(key_col).alias("key"),
            is_target.alias("__t"),
            toks.alias("__toks"),
        )
        .select("key", "__t", F.explode(grams).alias("g"))
        .select(
            "key",
            "__t",
            (F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
             % n_buckets).alias("b"),
        )
    )
    # one scan → both distributions: conditional counts per bucket
    per_bucket = (
        base.groupBy("b")
        .agg(
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).cast("long").alias("ct"),
            F.sum(F.when(~F.col("__t"), 1).otherwise(0)).cast("long").alias("cr"),
        )
        .localCheckpoint(eager=False)  # feeds totals agg AND λ join
    )
    tot = per_bucket.agg(
        F.sum("ct").cast("long").alias("tt"), F.sum("cr").cast("long").alias("tr")
    )
    lam = per_bucket.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("ct") + 1).cast("double")
                      / (F.col("tt") + n_buckets).cast("double"))
                - F.log((F.col("cr") + 1).cast("double")
                        / (F.col("tr") + n_buckets).cast("double"))
            )
            * 1e6
        ).cast("long").alias("lam"),
    )
    return (
        base.filter(~F.col("__t"))
        .join(F.broadcast(lam), "b")
        .groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("lam").cast("long").alias("weight_micronats"),
        )
    )

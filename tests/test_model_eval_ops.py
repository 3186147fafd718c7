"""Unit tests for the round-3 block-3/4 catalog entries on hand-built
fixtures with hand-computed expectations: classifier_auc_ranksum,
cohens_kappa_langid, seasonal_naive_forecast, ngram_novelty_score,
kmeans_integer_lloyd (catalog invariants + direct operator math),
dp_noisy_event_counts (noise replicated independently via hashlib),
roc_curve_points, chi_squared_independence, two_proportion_ab_test,
spearman_rank_correlation, classifier_f1_per_class, theil_sen_trend."""

import hashlib

import pandas as pd
import pytest

from debezium_server_spark.plans.catalog import _DP_THRESHOLDS, CATALOG


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mini_sf")
    # docs: en-stopword scores 1,4,0,0,0,1,0; preds en,en,fr,unknown,
    # es,en,unknown; d7 has only 2 tokens (no 3-gram shingles).
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "text": ["the cat sat on mat", "the of and in", "le chat et la",
                 "xyzzy blorp qux", "el que los", "the cat sat",
                 "hi there"],
        "lang": ["en", "en", "fr", "en", "es", "fr", "de"],
        "source": ["s"] * 7,
        "n_chars": [18, 13, 13, 15, 10, 11, 8],
    }).to_parquet(d / "documents.parquet")
    days = {"d0": pd.Timestamp("2024-03-01 10:00:00"),
            "d1": pd.Timestamp("2024-03-02 10:00:00"),
            "d7": pd.Timestamp("2024-03-08 10:00:00"),
            "d8": pd.Timestamp("2024-03-09 10:00:00")}
    ts = ([days["d0"]] * 2 + [days["d7"]] * 5 + [days["d8"]]  # A
          + [days["d0"], days["d7"]]                           # B
          + [days["d1"]] * 3)                                  # purchase
    pd.DataFrame({
        "event_id": range(1, 14),
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "user_id": [1, 2, 3, 4, 5, 6, 1, 2, 3, 4, 2, 3, 5],
        "event_type": ["A"] * 8 + ["B"] * 2 + ["purchase"] * 3,
        "value": [1.0] * 13,
        "props": ["{}"] * 13,
    }).to_parquet(d / "events.parquet")
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [1, 2, 3, 1, 2],
        "o_orderstatus": ["O", "O", "O", "F", "F"],
        "o_totalprice": [100.0, 200.0, 300.0, 50.0, 150.0],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 5)
        .astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT"] * 5,
    }).to_parquet(d / "orders.parquet")
    pd.DataFrame({
        "vec_id": range(16),
        "embedding": [[float(i) * 0.1 + j * 0.01 for j in range(64)]
                      for i in range(16)],
        "label": [0] * 16,
    }).to_parquet(d / "embeddings.parquet")
    return str(d)


def test_auc_ranksum_hand_computed(spark, sf_dir):
    # pos scores {1,4,0} vs neg scores {0,0,1,0}: credit 3.5+4+1.5 of
    # 12 pairs -> AUC 0.75; doubled integer numerator 18.
    r = CATALOG["classifier_auc_ranksum"].spark_fn(spark, sf_dir).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (3, 4)
    assert r["auc_num2"] == 18
    assert r["auc_bp"] == 7500


def test_cohens_kappa_hand_computed(spark, sf_dir):
    # truth/pred: en/en en/en fr/fr en/unknown es/es fr/en de/unknown
    # N=7 agree=4; marginal product sum 3*3+2*1+1*1 = 12
    # kappa = (28-12)/(49-12) -> 4324 bp
    r = CATALOG["cohens_kappa_langid"].spark_fn(spark, sf_dir).collect()[0]
    assert (r["n_docs"], r["n_agree"]) == (7, 4)
    assert r["observed_agree_bp"] == 4 * 10000 // 7
    assert r["expected_agree_bp"] == 12 * 10000 // 49
    assert r["kappa_bp"] == 16 * 10000 // 37 == 4324


def test_seasonal_naive_hand_computed(spark, sf_dir):
    # A: day0=2, day7=5, day8=1 -> only day7 has a day-7 lag pair
    # (|5-2|=3); day8's lag (day1) is absent and drops out.
    # B: day0=1, day7=1 -> error 0.
    rows = {r["event_type"]: r for r in
            CATALOG["seasonal_naive_forecast"].spark_fn(spark, sf_dir)
            .collect()}
    a, b = rows["A"], rows["B"]
    assert (a["n_days_eval"], a["sum_abs_err"]) == (1, 3)
    assert a["mae_x100"] == 300
    assert a["wape_bp"] == 3 * 10000 // 5
    assert (b["n_days_eval"], b["sum_abs_err"], b["wape_bp"]) == (1, 0, 0)


def test_ngram_novelty_hand_computed(spark, sf_dir):
    # shingle document frequencies: 'the cat sat' appears in d1 AND d6;
    # every other 3-gram is unique; d7 (2 tokens) drops out entirely.
    rows = {r["doc_id"]: r for r in
            CATALOG["ngram_novelty_score"].spark_fn(spark, sf_dir)
            .collect()}
    assert sorted(rows) == [1, 2, 3, 4, 5, 6]
    assert (rows[1]["n_shingles"], rows[1]["n_unique"]) == (3, 2)
    assert rows[1]["novelty_bp"] == 2 * 10000 // 3
    assert rows[6]["novelty_bp"] == 0       # its only shingle is shared
    assert rows[2]["novelty_bp"] == 10000   # all shingles unique
    assert rows[4]["novelty_bp"] == 10000


def test_kmeans_operator_hand_computed(spark):
    # 1-D geometry in a 2-dim vector space, scale=100: quantized xs
    # {0, 1000, 10, 1010}; init cells at 0 and 1000; round 1 groups
    # {v0,v2} and {v1,v3}; updated centroids 5 and 1005; every final
    # distance is 5^2=25.
    from debezium_server_spark.operators.similarity import (
        kmeans_lloyd_integer)

    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.1, 0.0]),
         (3, [10.1, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["cell"]: r for r in kmeans_lloyd_integer(
        corpus, k=2, rounds=1, dim=2, scale=100).collect()}
    assert (out[0]["n_members"], out[0]["inertia"]) == (2, 50)
    assert (out[1]["n_members"], out[1]["inertia"]) == (2, 50)


def test_kmeans_catalog_invariants(spark, sf_dir):
    fn = CATALOG["kmeans_integer_lloyd"].spark_fn
    a = fn(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in a) == 16
    assert all(0 <= r["cell"] < 8 for r in a)
    assert all(r["inertia"] >= 0 for r in a)
    assert a == fn(spark, sf_dir).collect()  # deterministic


def _dp_noise(event_type: str) -> int:
    u = (int(hashlib.md5(f"dp:{event_type}".encode()).hexdigest()[:15], 16)
         % 1_000_000)
    for k, t in _DP_THRESHOLDS:
        if u < t:
            return k
    return 9


def test_dp_noise_matches_independent_replication(spark, sf_dir):
    rows = {r["event_type"]: r for r in
            CATALOG["dp_noisy_event_counts"].spark_fn(spark, sf_dir)
            .collect()}
    assert rows["A"]["true_count"] == 8 and rows["B"]["true_count"] == 2
    assert rows["purchase"]["true_count"] == 3
    for et, r in rows.items():
        n = _dp_noise(et)
        assert r["noise"] == n
        assert -9 <= r["noise"] <= 9
        assert r["noisy_count"] == max(r["true_count"] + n, 0)


def test_roc_curve_points_hand_computed(spark, sf_dir):
    # grouped by en-stopword score: s4 (1 pos / 0 neg), s1 (1/1),
    # s0 (1/3); DESC cumulative over n_pos=3, n_neg=4.
    rows = {r["threshold"]: r for r in
            CATALOG["roc_curve_points"].spark_fn(spark, sf_dir).collect()}
    assert sorted(rows) == [0, 1, 4]
    assert (rows[4]["tpr_bp"], rows[4]["fpr_bp"]) == (3333, 0)
    assert (rows[1]["tpr_bp"], rows[1]["fpr_bp"]) == (6666, 2500)
    assert rows[1]["youden_bp"] == 6666 - 2500
    assert (rows[0]["tpr_bp"], rows[0]["fpr_bp"], rows[0]["youden_bp"]) \
        == (10000, 10000, 0)


def test_chi_squared_hand_computed(spark, sf_dir):
    # contingency (dow from 2024-01-01, mod 7): dow4={A:7,B:2,P:0},
    # dow5={A:1,B:0,P:3}; N=13 -> quantized chi2_x100 = 39+27+207+86+
    # 61+470 = 890 (exact float value 8.89); df=(2-1)(3-1)=2.
    r = CATALOG["chi_squared_independence"].spark_fn(spark, sf_dir) \
        .collect()[0]
    assert r["n_events"] == 13
    assert r["df"] == 2
    assert r["chi2_x100"] == 890


def test_two_proportion_ab_hand_computed(spark, sf_dir):
    # arms by uid parity: arm0={2,4,6} conv {2}; arm1={1,3,5} conv {3,5}
    r = CATALOG["two_proportion_ab_test"].spark_fn(spark, sf_dir) \
        .collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (3, 1, 3, 2)
    # engines truncate toward zero (Python // floors): -30000/9 -> -3333
    assert r["lift_bp"] == -3333
    # z^2 = (1/9) / (0.5*0.5*(2/3)) = 2/3 -> 66 in the integer basis
    assert r["z2_x100"] == 66
    assert r["significant"] is False


def test_spearman_hand_computed(spark, sf_dir):
    # doubled midranks: x(n_chars) and y(token count) over the 7 docs;
    # sum of squared doubled displacements = 48; n^3-n = 336.
    r = CATALOG["spearman_rank_correlation"].spark_fn(spark, sf_dir) \
        .collect()[0]
    assert r["n_docs"] == 7
    assert r["sum_d2_x4"] == 48
    assert r["spearman_x10000"] == (4 * 336 - 6 * 48) * 10000 // (4 * 336)


def test_f1_per_class_hand_computed(spark, sf_dir):
    rows = {r["cls"]: r for r in
            CATALOG["classifier_f1_per_class"].spark_fn(spark, sf_dir)
            .collect()}
    assert sorted(rows) == ["de", "en", "es", "fr"]
    en = rows["en"]   # tp=2, truth=3, pred=3
    assert (en["precision_bp"], en["recall_bp"], en["f1_bp"]) \
        == (6666, 6666, 6666)
    fr = rows["fr"]   # tp=1, truth=2, pred=1
    assert (fr["precision_bp"], fr["recall_bp"], fr["f1_bp"]) \
        == (10000, 5000, 6666)
    es = rows["es"]
    assert (es["precision_bp"], es["recall_bp"], es["f1_bp"]) \
        == (10000, 10000, 10000)
    de = rows["de"]   # never predicted -> all zero
    assert (de["n_pred"], de["precision_bp"], de["f1_bp"]) == (0, 0, 0)


def test_theil_sen_hand_computed(spark, sf_dir):
    # daily totals: day60=3, day61=3, day67=6, day68=1 -> six pairwise
    # slopes {0, 4285, -2500, 5000, -2857, -50000}; lower median -2500.
    r = CATALOG["theil_sen_trend"].spark_fn(spark, sf_dir).collect()[0]
    assert r["n_pairs"] == 6
    assert r["theil_sen_x10000"] == -2500
    assert r["slope_min_x10000"] == -50000
    assert r["slope_max_x10000"] == 5000


def test_lag_autocorrelation_hand_computed(spark, sf_dir):
    # daily totals {60:3, 61:3, 67:6, 68:1}; devs (4c-13) = {-1,-1,11,
    # -9}, d2=204. lag1 pairs (60,61),(67,68): num=1-99=-98; lag7
    # pairs (60,67),(61,68): num=-11+9=-2.
    rows = {r["lag"]: r for r in
            CATALOG["lag_autocorrelation"].spark_fn(spark, sf_dir)
            .collect()}
    assert rows[1]["n_pairs"] == 2
    assert rows[1]["acf_bp"] == -4803   # trunc(-980000/204)
    assert rows[7]["n_pairs"] == 2
    assert rows[7]["acf_bp"] == -98     # trunc(-20000/204)


def test_burstiness_fano_hand_computed(spark, sf_dir):
    # A daily {2,5,1}: (3*30-64)*100 div 24 = 108; B {1,1} and
    # purchase {3} are dispersion-free -> 0.
    rows = {r["event_type"]: r for r in
            CATALOG["burstiness_fano"].spark_fn(spark, sf_dir).collect()}
    assert (rows["A"]["n_days"], rows["A"]["n_events"]) == (3, 8)
    assert rows["A"]["fano_x100"] == 108
    assert rows["B"]["fano_x100"] == 0
    assert rows["purchase"]["fano_x100"] == 0


def test_zipf_rank_frequency_hand_computed(spark, sf_dir):
    # vocab: the:3, cat:2, sat:2, 17 singletons -> ranks with a 2x
    # partner present: 1, 2, 4, 8.
    rows = {r["rank"]: r for r in
            CATALOG["zipf_rank_frequency"].spark_fn(spark, sf_dir)
            .collect()}
    assert sorted(rows) == [1, 2, 4, 8]
    assert (rows[1]["freq"], rows[1]["freq_at_2x_rank"]) == (3, 2)
    assert rows[1]["ratio_bp"] == 6666
    assert (rows[2]["freq"], rows[2]["ratio_bp"]) == (2, 5000)
    assert rows[4]["ratio_bp"] == 10000


def test_welch_t_squared_hand_computed(spark, sf_dir):
    # O dollars {100,200,300}: m=200, ss=20000; F {50,150}: m=100,
    # ss=5000. t2_x100 = 100^2*100 div (20000 div 6 + 5000 div 2).
    r = CATALOG["welch_t_squared"].spark_fn(spark, sf_dir).collect()[0]
    assert (r["n_open"], r["mean_open_d"]) == (3, 200)
    assert (r["n_filled"], r["mean_filled_d"]) == (2, 100)
    assert r["t2_x100"] == 1_000_000 // (3333 + 2500)
    assert r["significant"] is False


def test_revenue_concentration_hand_computed(spark, sf_dir):
    # per-customer cents: c1=15000, c2=35000, c3=30000; total 80000.
    rows = {r["k"]: r for r in
            CATALOG["revenue_concentration_topk"].spark_fn(spark, sf_dir)
            .collect()}
    assert rows[1]["top_revenue_cents"] == 35000
    assert rows[1]["share_bp"] == 35000 * 10000 // 80000
    assert rows[10]["share_bp"] == 10000
    assert rows[100]["top_revenue_cents"] == 80000
    assert rows[1]["n_customers"] == 3


def test_source_ttr_hand_computed(spark, sf_dir):
    # single source 's': 24 tokens, 20 distinct types.
    r = CATALOG["source_type_token_ratio"].spark_fn(spark, sf_dir) \
        .collect()[0]
    assert (r["source"], r["n_tokens"], r["n_types"]) == ("s", 24, 20)
    assert r["ttr_bp"] == 20 * 10000 // 24


def test_mann_kendall_hand_computed(spark, sf_dir):
    # daily {60:3, 61:3, 67:6, 68:1}: pair signs 0,+1,-1,+1,-1,-1 ->
    # S=-1; var18 = 4*3*13 - 2*1*9 = 138; |S|<=1 -> z2=0, no trend.
    r = CATALOG["mann_kendall_trend"].spark_fn(spark, sf_dir).collect()[0]
    assert (r["n_days"], r["s_stat"]) == (4, -1)
    assert r["var_s_x18"] == 138
    assert r["z2_x100"] == 0
    assert r["trend"] == "none"


def test_stream_hopping_hand_computed(spark, sf_dir):
    # watermark seals ws + 2h <= max_ts - 24h = 2024-03-08 08:00: only
    # the day-0/day-1 events emit, each into its two hopping windows.
    rows = [(r["window_start"], r["event_type"], r["n_events"])
            for r in CATALOG["stream_hopping_counts"]
            .spark_fn(spark, sf_dir).collect()]
    assert rows == [
        ("2024-03-01 09:00:00", "A", 2), ("2024-03-01 09:00:00", "B", 1),
        ("2024-03-01 10:00:00", "A", 2), ("2024-03-01 10:00:00", "B", 1),
        ("2024-03-02 09:00:00", "purchase", 3),
        ("2024-03-02 10:00:00", "purchase", 3),
    ]


def _ahash(text: str) -> int:
    seg = max((len(text) + 59) // 60, 1)
    h = 0
    for s in range(60):
        part = text[s * seg:(s + 1) * seg]
        if int(hashlib.md5(part.encode()).hexdigest()[0], 16) >= 8:
            h |= 1 << s
    return h


def test_media_ahash_matches_independent_replication(spark, sf_dir):
    # replicate fingerprint, banding, and verify entirely in Python
    # and demand the identical pair set.
    docs = {1: "the cat sat on mat", 2: "the of and in",
            3: "le chat et la", 4: "xyzzy blorp qux", 5: "el que los",
            6: "the cat sat", 7: "hi there"}
    hashes = {i: _ahash(t) for i, t in docs.items()}
    expect = set()
    for a in docs:
        for b in docs:
            if a < b:
                shares_band = any(
                    (hashes[a] >> (10 * k)) & 1023
                    == (hashes[b] >> (10 * k)) & 1023 for k in range(6))
                ham = bin(hashes[a] ^ hashes[b]).count("1")
                if shares_band and ham <= 5:
                    expect.add((a, b, ham))
    # 6 bands over hamming<=5: pigeonhole leaves a band untouched, so
    # the banded screen is COMPLETE — the set must equal the brute set
    brute = {(a, b, bin(hashes[a] ^ hashes[b]).count("1"))
             for a in docs for b in docs if a < b
             and bin(hashes[a] ^ hashes[b]).count("1") <= 5}
    assert expect == brute
    got = {(r["media_a"], r["media_b"], r["hamming"]) for r in
           CATALOG["media_ahash_dedup"].spark_fn(spark, sf_dir).collect()}
    assert got == expect


@pytest.fixture(scope="module")
def sf_dir2(tmp_path_factory):
    """Second fixture with a half-month pre/post split and varied
    inter-event gaps (the shared fixture is all-pre and all-dense)."""
    d = tmp_path_factory.mktemp("mini_sf2")
    rows = [
        # (user, day, hour)
        (1, 5, 10), (1, 10, 10), (1, 20, 10),
        (2, 3, 10), (2, 18, 10), (2, 20, 10), (2, 25, 10),
        (3, 2, 10), (3, 6, 10), (3, 12, 10), (3, 19, 10), (3, 28, 10),
    ]
    pd.DataFrame({
        "event_id": range(1, len(rows) + 1),
        "ts": pd.Series([pd.Timestamp(2024, 1, day, hour)
                         for _, day, hour in rows])
        .astype("datetime64[us]"),
        "user_id": [u for u, _, _ in rows],
        "event_type": ["A"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    }).to_parquet(d / "events.parquet")
    return str(d)


def test_cuped_hand_computed(spark, sf_dir2):
    # pre (day<=15): u1=2, u2=1, u3=3; post: u1=1, u2=3, u3=2.
    # means 2/2; devs pre {0,-1,1}, post {-1,1,0}: cov=-1, var=2/2.
    r = CATALOG["cuped_variance_reduction"].spark_fn(spark, sf_dir2) \
        .collect()[0]
    assert r["n_users"] == 3
    assert r["theta_x10000"] == -5000
    assert r["var_reduction_bp"] == 2500  # rho^2 = 1/4


def test_nelson_aalen_replicated(spark, sf_dir2):
    # full Python replication: per-user gap hours + censored last gap.
    events = {1: [(5, 10), (10, 10), (20, 10)],
              2: [(3, 10), (18, 10), (20, 10), (25, 10)],
              3: [(2, 10), (6, 10), (12, 10), (19, 10), (28, 10)]}
    end = max(pd.Timestamp(2024, 1, d, h) for ts in events.values()
              for d, h in ts)
    durs = []
    for ts in events.values():
        stamps = [pd.Timestamp(2024, 1, d, h) for d, h in ts]
        for a, b in zip(stamps, stamps[1:]):
            durs.append((int((b - a).total_seconds() // 3600), 1))
        durs.append((int((end - stamps[-1]).total_seconds() // 3600), 0))
    from collections import Counter
    at = Counter(g for g, _ in durs)
    ev_at = Counter(g for g, o in durs if o)
    expect = []
    cum = 0
    for g in sorted(at):
        n_risk = sum(c for gg, c in at.items() if gg >= g)
        d = ev_at.get(g, 0)
        if d > 0:
            hz = d * 10000 // n_risk
            cum += hz
            expect.append((g, n_risk, d, hz, cum))
    got = [(r["gap_hours"], r["n_risk"], r["n_events"], r["hazard_bp"],
            r["cum_hazard_bp"]) for r in
           CATALOG["nelson_aalen_recurrence"].spark_fn(spark, sf_dir2)
           .collect()]
    assert got == expect


def test_batch_perceptron_replicated(spark, sf_dir):
    # replicate quantization + two batch updates + final scoring in
    # plain Python over the 16-vector fixture (labels all 0 -> y=-1).
    vecs = {i: [float(i) * 0.1 + j * 0.01 for j in range(64)]
            for i in range(16)}
    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    y = {i: -1 for i in range(16)}
    w = [sum(y[i] * q[i][d] for i in q) for d in range(64)]   # round 1
    mis = [i for i in q
           if y[i] * sum(q[i][d] * w[d] for d in range(64)) <= 0]
    w2 = [w[d] + sum(y[i] * q[i][d] for i in mis) for d in range(64)]
    mistakes = sum(
        1 for i in q
        if y[i] * sum(q[i][d] * w2[d] for d in range(64)) <= 0)
    r = CATALOG["batch_perceptron_train"].spark_fn(spark, sf_dir) \
        .collect()[0]
    assert r["n_vectors"] == 16
    assert r["n_mistakes"] == mistakes
    assert r["accuracy_bp"] == (16 - mistakes) * 10000 // 16
    assert r["w_l1"] == sum(abs(x) for x in w2)

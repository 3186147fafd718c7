"""Unit tests for the round-3 block-2 catalog entries on hand-built
fixtures with hand-computed expectations: dq_expectations,
ks_source_drift, poisson_bootstrap_ci, item_cooccurrence_jaccard,
pareto_frontier, phrase_search."""

import pandas as pd
import pytest

from debezium_server_spark.plans.catalog import CATALOG


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mini_sf")
    ts = pd.Timestamp("2024-03-01 12:00:00")
    pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5, 5],
        "o_custkey": [10, 11, 12, 13, None, 14],
        "o_orderstatus": ["O", "F", "P", "X", "O", "O"],
        "o_totalprice": [100.0, 50.0, 150.0, 150.0, 150.0, -5.0],
        "o_orderdate": pd.to_datetime([
            "1970-01-01", "1970-01-02", "1970-01-02",
            "1970-01-02", "1970-01-03", "1970-01-03"]).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT"] * 6,
    }).to_parquet(d / "orders.parquet")
    pd.DataFrame({
        "l_orderkey": [1, 2, 999],
        "l_quantity": [5.0, 0.0, 1.0],
        "l_discount": [0.05, 1.5, 0.0],
        "l_shipdate": pd.to_datetime(
            ["2024-01-01", None, "2024-01-02"]).astype("datetime64[us]"),
    }).to_parquet(d / "lineitem.parquet")
    pd.DataFrame({
        "event_id": range(1, 9),
        "ts": pd.Series([ts] * 7 + [ts + pd.Timedelta(days=1)])
        .astype("datetime64[us]"),
        "user_id": pd.array([1, 1, 1, 2, 2, 2, 3, None],
                            dtype="Int64"),
        "event_type": ["A", "B", "B", "A", "B", "C", "B", "A"],
        "value": [1.0] * 8,
        "props": ["{}"] * 8,
    }).to_parquet(d / "events.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": ["order fast order fast x", "fast order", "nothing here",
                 "pad", "pad", "pad", "pad", "pad"],
        "lang": ["en"] * 8,
        "source": ["src0", "src0", "src0", "src1", "src1", "src1",
                   "src2", "src2"],
        "n_chars": [1, 2, 3, 3, 4, 5, 9, 9],
    }).to_parquet(d / "documents.parquet")
    return str(d)


def test_dq_expectations_counts(spark, sf_dir):
    rows = {r["check_name"]: r
            for r in CATALOG["dq_expectations"].spark_fn(spark, sf_dir).collect()}
    assert len(rows) == 10
    # orders: one negative price, one 'X' status, orderkey 5 duplicated,
    # one null custkey
    assert rows["orders.totalprice_positive"]["n_violations"] == 1
    assert rows["orders.status_in_domain"]["n_violations"] == 1
    assert rows["orders.orderkey_unique"]["n_violations"] == 1
    assert rows["orders.custkey_not_null"]["n_violations"] == 1
    # lineitem: discount 1.5, quantity 0, null shipdate, orphan key 999
    assert rows["lineitem.discount_in_unit_range"]["n_violations"] == 1
    assert rows["lineitem.quantity_positive"]["n_violations"] == 1
    assert rows["lineitem.shipdate_not_null"]["n_violations"] == 1
    assert rows["lineitem.orderkey_fk_resolves"]["n_violations"] == 1
    # events: one null user_id, no null ts
    assert rows["events.user_id_not_null"]["n_violations"] == 1
    assert rows["events.ts_not_null"]["n_violations"] == 0
    assert rows["events.ts_not_null"]["passed"] is True
    assert rows["orders.orderkey_unique"]["passed"] is False
    assert rows["orders.totalprice_positive"]["n_rows"] == 6


def test_ks_source_drift_hand_computed(spark, sf_dir):
    # src0 lengths {1,2,3}, src1 {3,4,5}: max ECDF gap 2/3 first
    # attained at length 2 -> d_bp = 6*10000 div 9 = 6666.
    r = CATALOG["ks_source_drift"].spark_fn(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["ks_d_bp"] == 6666
    assert r["ks_at_n_chars"] == 2
    assert r["drift_alert"] is False


def test_pareto_frontier_dominance(spark, sf_dir):
    # brute-force dominance check over the fixture orders
    got = sorted(r["o_orderkey"] for r in
                 CATALOG["pareto_frontier"].spark_fn(spark, sf_dir).collect())
    pts = {1: (0, 10000), 2: (1, 5000), 3: (1, 15000),
           4: (1, 15000), 5: (2, 15000)}
    # key 5 appears twice with prices 150.0 and -5.0; use each row
    rows = [(1, 0, 10000), (2, 1, 5000), (3, 1, 15000),
            (4, 1, 15000), (5, 2, 15000), (5, 2, -500)]
    def dominated(i):
        di, ci = rows[i][1], rows[i][2]
        return any((dj <= di and cj >= ci and (dj < di or cj > ci))
                   for j, (_, dj, cj) in enumerate(rows) if j != i)
    expect = sorted(rows[i][0] for i in range(len(rows)) if not dominated(i))
    assert got == expect == [1, 3, 4]
    del pts


def test_poisson_bootstrap_deterministic_and_centered(spark, sf_dir):
    fn = CATALOG["poisson_bootstrap_ci"].spark_fn
    a = fn(spark, sf_dir).collect()[0]
    b = fn(spark, sf_dir).collect()[0]
    assert a == b  # fully deterministic resampling
    cents = [10000, 5000, 15000, 15000, 15000, -500]
    assert a["point_mean_cents"] == sum(cents) // len(cents)
    assert a["n_replicates"] == 100
    assert a["ci_lo_cents"] <= a["ci_hi_cents"]


def test_item_cooccurrence_jaccard_hand_computed(spark, sf_dir):
    # baskets (user, day): u1 {A,B} (B deduped), u2 {A,B,C}, u3 {B},
    # null-user row forms its own basket {A} on the next day.
    rows = {(r["item_a"], r["item_b"]): r
            for r in CATALOG["item_cooccurrence_jaccard"]
            .spark_fn(spark, sf_dir).collect()}
    ab = rows[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_ab"]) == (3, 3, 2)
    assert ab["jaccard_bp"] == 2 * 10000 // (3 + 3 - 2)
    assert rows[("A", "C")]["jaccard_bp"] == 1 * 10000 // (3 + 1 - 1)
    assert rows[("B", "C")]["jaccard_bp"] == 1 * 10000 // (3 + 1 - 1)


def test_phrase_search_adjacency(spark, sf_dir):
    # doc 1: 'order fast' at positions 1 and 3; doc 2 has the reversed
    # bigram only; no other doc contains the phrase.
    out = CATALOG["phrase_search"].spark_fn(spark, sf_dir).collect()
    assert [(r["doc_id"], r["n_matches"], r["first_pos"]) for r in out] \
        == [(1, 2, 1)]

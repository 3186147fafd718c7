"""Column profiler (operators/profiling.py)."""

from debezium_server_spark.operators.profiling import profile_columns


def _df(spark):
    return spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 1.0, None), (4, 4.5, "b")],
        "id int, x double, s string",
    )


def test_profile_all_columns(spark):
    out = {r.column: r for r in profile_columns(_df(spark)).collect()}
    assert set(out) == {"id", "x", "s"}
    assert out["id"].n_nonnull == 4 and out["id"].n_null == 0
    assert out["id"].n_distinct == 4
    assert (out["id"].min_value, out["id"].max_value) == ("1", "4")
    assert out["id"].avg_value == 2.5
    assert out["x"].n_null == 1 and out["x"].n_distinct == 3
    assert out["x"].avg_value == 2.6666  # floor-rounded to 4 decimals
    assert out["s"].n_null == 1 and out["s"].avg_value is None
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")


def test_column_subset_and_approx_mode(spark):
    out = profile_columns(_df(spark), ["id"], exact_distinct=False).collect()
    assert len(out) == 1 and out[0].column == "id"
    # HLL is exact at this cardinality
    assert out[0].n_distinct == 4

"""Z-order layout key, linear-classifier inference, incremental agg
maintenance invariants (catalog entries cover engine parity)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.layout import zorder_value
from debezium_server_spark.operators.text import quality_classifier


def _interleave(x, y, bits=8):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


def test_zorder_matches_reference_bit_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 127, 255, 300) for y in (0, 3, 64, 255, 511)],
        "x long, y long",
    )
    rows = df.select("x", "y", zorder_value(F.col("x"), F.col("y"), bits=8).alias("z")).collect()
    for r in rows:
        assert r["z"] == _interleave(r["x"] % 256, r["y"] % 256), (r["x"], r["y"])


def test_zorder_locality_neighbors_share_prefix(spark):
    # points in the same 16x16 tile share the z>>8 prefix — the property
    # file pruning relies on
    df = spark.createDataFrame(
        [(x, y) for x in range(16, 24) for y in range(32, 40)], "x long, y long"
    )
    zs = [r["z"] for r in df.select(zorder_value(F.col("x"), F.col("y")).alias("z")).collect()]
    assert len({z >> 8 for z in zs}) <= 4  # 8x8 block spans ≤4 z-cells at that level


def test_quality_classifier_deterministic_and_monotone_in_stopwords(spark):
    stopworded = "the a of and in to " * 20
    gibberish = "%%% ### !!! @@@ $$$ " * 20
    df = spark.createDataFrame(
        [(0, stopworded.strip()), (1, gibberish.strip())], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    assert out[0]["logit_u"] > out[1]["logit_u"]
    # punctuation-heavy gibberish with zero stopwords must score below keep
    assert not out[1]["keep"]


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    from debezium_server_spark.plans.catalog import CATALOG, load

    inc = CATALOG["incr_agg_maintenance"].spark_fn(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    full = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.floor(F.sum(F.col("value").cast("decimal(38,6)")).cast("double") * 10000) / 10000
         ).alias("total_value"),
    )
    a = sorted(map(tuple, inc.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b


def test_zorder_negative_inputs_wrap_like_python_mod(spark):
    df = spark.createDataFrame([(-1, 5), (-300, -2)], "x long, y long")
    rows = {(r["x"], r["y"]): r["z"]
            for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()}
    assert rows[(-1, 5)] == _interleave((-1) % 256, 5)
    assert rows[(-300, -2)] == _interleave((-300) % 256, (-2) % 256)

"""Salted-join correctness: results must equal the plain join for every
join type, while the large side's hot key actually spreads over salts."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.joins import SALT_COL, salted_join


def _frames(spark):
    # hot key: 1 carries 50 of 60 rows
    large = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, i) for i in range(5)] + [(9, i) for i in range(5)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, tag string")
    return large, small


def test_salted_join_matches_plain_join(spark):
    large, small = _frames(spark)
    plain = sorted(
        tuple(r) for r in large.join(small, "k").select("k", "payload", "tag").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(large, small, "k", buckets=4)
        .select("k", "payload", "tag")
        .collect()
    )
    assert salted == plain
    assert len(salted) == 55  # key 9 has no dim row


def test_salted_left_join_keeps_unmatched(spark):
    large, small = _frames(spark)
    out = salted_join(large, small, "k", buckets=4, how="left")
    assert out.count() == 60
    assert out.filter(F.col("tag").isNull()).count() == 5


def test_hot_key_spreads_over_salts(spark):
    large, _ = _frames(spark)
    ls = large.withColumn(
        SALT_COL,
        F.pmod(
            F.crc32(F.concat_ws("|", *[F.col(c).cast("string") for c in large.columns])),
            F.lit(4),
        ),
    )
    n_salts = (
        ls.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    )
    assert n_salts >= 3  # 50 rows over 4 buckets: spread, not piled up

"""Bit-exactness pins for the Arrow-vectorized distance kernels.

The r08 optimization replaced interpreted HOF distance expressions with
Arrow-batched numpy kernels on high-volume pair frames. The kernels
claim BIT-IDENTICAL doubles via explicit sequential per-dimension
accumulation (left-fold rounding parity with the HOF
aggregate(zip_with(...)) form). These tests pin that claim directly:
same frame, both expressions, exact float equality — including
adversarial magnitudes where accumulation ORDER visibly changes the
result, so a kernel that silently switched to pairwise/np.sum
summation would fail.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from debezium_server_spark.operators.similarity import (
    cosine_similarity_vec,
    l2_distance_vec,
)


def _hof_d2():
    return F.aggregate(
        F.zip_with(F.col("a"), F.col("b"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pairs(spark, dim=17, n=64, magnitudes=(1.0,)):
    rng = random.Random(42)
    rows = []
    for i in range(n):
        m = magnitudes[i % len(magnitudes)]
        rows.append((
            i,
            [rng.uniform(-1, 1) * m for _ in range(dim)],
            [rng.uniform(-1, 1) * m for _ in range(dim)],
        ))
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>")


def test_l2_kernel_bit_identical_to_hof(spark):
    df = _pairs(spark, magnitudes=(1.0, 1e8, 1e-8, 1e3))
    got = (
        df.select("id", l2_distance_vec(F.col("a"), F.col("b")).alias("k"),
                  _hof_d2().alias("h"))
        .collect()
    )
    assert len(got) == 64
    for r in got:
        # exact equality, not approx: the kernel's sequential loop must
        # reproduce the HOF left fold's rounding on every row
        assert r["k"] == r["h"], (r["id"], r["k"], r["h"])


def test_l2_kernel_order_sensitivity_is_the_hofs(spark):
    # A row built so that left-fold and reversed-fold DIFFER in the last
    # ulp: mixing 1e16 with 1.0 makes accumulation order observable.
    big, small = 1e16, 1.0
    a = [big, small, small, 0.0]
    b = [0.0, 0.0, 0.0, 0.0]
    # left fold: ((big^2 + 1) + 1) + 0 — the +1 terms are absorbed
    expect = ((big * big + small) + small) + 0.0
    df = spark.createDataFrame([(0, a, b)],
                               "id long, a array<double>, b array<double>")
    row = df.select(
        l2_distance_vec(F.col("a"), F.col("b")).alias("k"),
        _hof_d2().alias("h")).collect()[0]
    assert row["h"] == expect
    assert row["k"] == row["h"]


def test_cosine_kernel_bit_identical_to_hof(spark):
    from debezium_server_spark.functions.text_functions import (
        cosine_similarity,
    )

    df = _pairs(spark, dim=9, n=32, magnitudes=(1.0, 1e6))
    got = df.select(
        cosine_similarity_vec(F.col("a"), F.col("b")).alias("k"),
        cosine_similarity(F.col("a"), F.col("b")).alias("h")).collect()
    for r in got:
        assert r["k"] == r["h"] or (
            math.isnan(r["k"]) and math.isnan(r["h"])), (r["k"], r["h"])


def test_maxsim_kernel_identical_to_hof(spark):
    from debezium_server_spark.operators.similarity import maxsim_vec

    rng = random.Random(7)
    rows = [(i,
             [rng.randint(-1000, 1000) for _ in range(64)],
             [rng.randint(-1000, 1000) for _ in range(64)])
            for i in range(128)]
    df = spark.createDataFrame(
        rows, "id long, qv array<long>, cv array<long>")

    def dot(i, j):
        return F.aggregate(
            F.zip_with(F.slice("qv", 16 * i + 1, 16),
                       F.slice("cv", 16 * j + 1, 16),
                       lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    hof = sum(
        (F.greatest(*[dot(i, j) for j in range(4)]) for i in range(4)),
        start=F.lit(0).cast("long"))
    got = df.select(
        maxsim_vec(F.col("qv"), F.col("cv")).alias("k"),
        hof.alias("h")).collect()
    assert len(got) == 128
    for r in got:
        assert r["k"] == r["h"], (r["k"], r["h"])

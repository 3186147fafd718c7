"""Skew-mitigating join strategies.

Spark's hash join shuffles both sides on the key; a hot key puts its
entire row population in one task, and at 100 TB one hot customer/topic
stalls the stage (the straggler problem AQE's skew-join split only fixes
for sort-merge joins with splittable partitions). Salting generalizes:
the large side spreads each key over N sub-keys, the small side is
replicated N times, and the join key becomes (key, salt) — every task
gets 1/N of the hot key's rows. Join RESULTS are identical to the
unsalted join (the replication is on the build side only), which is
what the DuckDB oracle checks.

The reference hits the same physical problem as per-destination grouping
— one hot topic's events all flow through one sink partition
(KinesisChangeConsumer.java:136 groups by destination; EventHubs routes
by partition key hash, EventHubsChangeConsumer.java:177-222) — and
solves it with explicit partition counts. Salting is the shuffle-side
analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: Join types whose results are provably salt-invariant: the small side
#: is replicated once per salt, so any join type that can emit an
#: *unmatched small-side row* (right/full outer) would emit it once per
#: replica — `buckets` phantom rows. Inner/left-side variants never
#: surface unmatched small-side rows, so replication is invisible.
_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
             "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    salt_by: Column | None = None,
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, with the large side's
    rows spread across `buckets` salt values and the small side
    replicated once per salt.

    `salt_by` picks the deterministic spreading basis (defaults to a
    crc32 of every large-side column — any per-row variation works; the
    salt only has to differ WITHIN a key, never across runs for
    correctness, since results are salt-independent).

    The small side grows ×buckets, so keep it broadcast-scale; the win
    is that the largest single shuffle partition shrinks by ×buckets.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-invariant — unmatched "
            "small-side rows would appear once per salt replica. Use "
            "inner/left/left_semi/left_anti, or join unsalted."
        )
    if salt_by is None:
        salt_by = F.crc32(F.concat_ws("|", *[F.col(c).cast("string") for c in large.columns]))
    ls = large.withColumn(SALT_COL, F.pmod(salt_by, F.lit(buckets)).cast("int"))
    rs = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = ls.join(rs, [on, SALT_COL], how)
    return out.drop(SALT_COL)

"""Data-layout operators: space-filling-curve clustering keys.

At 100 TB, scan cost is dominated by how well file layout matches query
predicates. Sorting by one column clusters that column only; a Z-order
(Morton) key interleaves the bits of several columns so files are
simultaneously clustered on all of them — a multi-column range predicate
prunes to O(matching cells) files instead of a full scan. This is the
same layout primitive Delta/Iceberg expose as OPTIMIZE ZORDER BY; here
it is a plain deterministic column you can `repartitionByRange` /
`sortWithinPartitions` on before any parquet write.

The bit interleave is written as pure div/mod arithmetic (no engine
bit-op intrinsics), so any SQL engine reproduces the key exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns: z = Σ_b bit_b(x)·2^(2b+1) + bit_b(y)·2^(2b). Map-only,
    constant work per row (bits is a small fixed constant, unrolled)."""
    # mask to the low `bits` first so every intermediate stays < 2^bits —
    # small enough that the div/mod chain is exact in any numeric model.
    # pmod, not %: SQL % keeps the sign, so a negative key would produce
    # negative "bits" and a garbage interleave
    xm = F.pmod(x.cast("bigint"), F.lit(2**bits))
    ym = F.pmod(y.cast("bigint"), F.lit(2**bits))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        xb = F.floor(xm / F.lit(2**b)).cast("bigint") % 2
        yb = F.floor(ym / F.lit(2**b)).cast("bigint") % 2
        z = z + xb * F.lit(2 ** (2 * b + 1)) + yb * F.lit(2 ** (2 * b))
    return z

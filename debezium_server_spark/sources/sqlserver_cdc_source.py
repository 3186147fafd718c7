"""SQL Server CDC change-table source — the fourth real-CDC capture
mechanism next to pgoutput/oplog/binlog, and deliberately THINNER:
SQL Server exposes CDC through a PUBLIC SQL contract, not a wire
format. The server materializes per-table change tables and the
consumer polls `cdc.fn_cdc_get_all_changes_<capture_instance>
(@from_lsn, @to_lsn, <row_filter>)` (Microsoft's documented CDC
surface; the reference bundles the Debezium SQL Server connector,
`debezium-server-dist/pom.xml` connector set, which polls exactly
this function). So this source slots into the existing JDBC machinery
(`jdbc_source.py` is the snapshot phase) plus a decode stage over the
change-table row shape:

  __$start_lsn   binary(10)  commit LSN of the change's transaction
  __$seqval      binary(10)  order within the transaction
  __$operation   int         1=delete, 2=insert, 3=update(before),
                             4=update(after)
  __$update_mask varbinary   changed-column bitmask
  <captured columns...>

Two row filters, two decode shapes:

- `'all'` (the streaming tail): updates arrive as ONE row (op 4,
  after image only) — the decode is STATELESS per row, so it runs as
  a plain streaming projection (no state store, no pairing join).
- `'all update old'` (batch polls): updates arrive as a 3/4 row PAIR
  sharing (__$start_lsn, __$seqval) — the decode pairs them with an
  EQUI self-join on those two columns (AQE-friendly, no window over
  the table, scales with |changes in the poll window|).

LSNs surface as fixed-width uppercase hex strings (20 chars for
binary(10)) — lexicographic order == LSN order, so cursoring is a
plain string comparison in both Spark and the database.

No SQL Server exists in this container: `cdc_poll_query` pins the SQL
contract as a string (unit-tested), and the decode stages are tested
against synthetic change-table fixtures, the same discipline as the
wire codecs' encoder twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_DELETE, OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER = 1, 2, 3, 4

_META_COLS = ("__$start_lsn", "__$seqval", "__$operation",
              "__$update_mask")


def change_table_function(capture_instance: str) -> str:
    """`dbo.t` → `cdc.fn_cdc_get_all_changes_dbo_t` (the server names
    the TVF after the capture instance, dots → underscores)."""
    return ("cdc.fn_cdc_get_all_changes_"
            + capture_instance.replace(".", "_"))


def cdc_poll_query(capture_instance: str, from_lsn_hex: str | None,
                   row_filter: str = "all update old") -> str:
    """One poll's T-SQL (the LSN-cursored tail): changes after
    `from_lsn_hex` (exclusive — the cursor is the last LSN already
    consumed) up to the database's current max LSN. `from_lsn_hex is
    None` means from the capture instance's minimum LSN (first poll
    after snapshot). Runs as a single SELECT, so it rides Spark's
    JDBC `query` option and the WHERE executes server-side."""
    if row_filter not in ("all", "all update old"):
        raise ValueError(f"bad row_filter {row_filter!r}")
    fn = change_table_function(capture_instance)
    if from_lsn_hex is None:
        from_expr = (f"sys.fn_cdc_get_min_lsn("
                     f"'{capture_instance.replace('.', '_')}')")
    else:
        if len(from_lsn_hex) != 20 or not all(
                c in "0123456789ABCDEFabcdef" for c in from_lsn_hex):
            raise ValueError(f"from_lsn must be 20 hex chars, "
                             f"got {from_lsn_hex!r}")
        # strictly-after cursor: increment, then poll inclusively
        from_expr = (f"sys.fn_cdc_increment_lsn(CONVERT(binary(10), "
                     f"0x{from_lsn_hex}, 1))")
    return (f"SELECT * FROM {fn}({from_expr}, "
            f"sys.fn_cdc_get_max_lsn(), N'{row_filter}')")


def _captured_cols(changes: DataFrame) -> list[str]:
    return [c for c in changes.columns if c not in _META_COLS]


def _image(cols: list[str], prefix: str | None = None) -> F.Column:
    src = (lambda c: F.col(f"{prefix}.{c}")) if prefix else F.col
    return F.to_json(F.struct(*[src(c).alias(c) for c in cols]))


def decode_cdc_changes_stateless(changes: DataFrame,
                                 destination: str) -> DataFrame:
    """`'all'` row-filter decode — one envelope row per change-table
    row, no pairing state, safe on a STREAMING frame: 2→c (after),
    1→d (before), 4→u (after only; the before image is not shipped by
    this filter — the batch `decode_cdc_changes` carries it)."""
    cols = _captured_cols(changes)
    op = (F.when(F.col("`__$operation`") == OP_INSERT, "c")
          .when(F.col("`__$operation`") == OP_DELETE, "d")
          .when(F.col("`__$operation`") == OP_UPDATE_AFTER, "u"))
    img = _image(cols)
    return (changes
            .filter(F.col("`__$operation`").isin(
                OP_INSERT, OP_DELETE, OP_UPDATE_AFTER))
            .select(
                F.hex(F.col("`__$start_lsn`")).alias("lsn"),
                F.hex(F.col("`__$seqval`")).alias("seqval"),
                F.lit(destination).alias("destination"),
                op.alias("op"),
                F.when(F.col("`__$operation`") == OP_DELETE, img)
                .alias("before"),
                F.when(F.col("`__$operation`") != OP_DELETE, img)
                .alias("after")))


def decode_cdc_changes(changes: DataFrame, destination: str) -> DataFrame:
    """`'all update old'` decode — full before AND after images for
    updates by pairing the op-3/op-4 rows on their shared
    (__$start_lsn, __$seqval): an equi self-join on the change keys
    (no window over the table; candidate set = |changes|, AQE handles
    skew), the binlog_row_image=FULL analog.

    The join is FULL OUTER, not inner: the TVF contract ships 3/4
    pairs atomically within a poll, so an unpaired half is a contract
    violation — and the codebase's discipline (quarantine columns,
    dead-letter routing) is to SURFACE violations, not drop them. An
    unpaired row comes out as an op='u' envelope with the present
    image only and a non-null `error`; healthy rows carry error=NULL.
    Callers route `error IS NOT NULL` rows to their dead-letter path.
    """
    cols = _captured_cols(changes)
    lsn = F.hex(F.col("`__$start_lsn`")).alias("lsn")
    seqval = F.hex(F.col("`__$seqval`")).alias("seqval")
    keyed = changes.select(lsn, seqval, F.col("`__$operation`").alias("op_code"),
                           *[F.col(f"`{c}`") for c in cols])
    simple = (keyed.filter(F.col("op_code").isin(OP_INSERT, OP_DELETE))
              .select(
                  "lsn", "seqval",
                  F.lit(destination).alias("destination"),
                  F.when(F.col("op_code") == OP_INSERT, "c")
                  .otherwise("d").alias("op"),
                  F.when(F.col("op_code") == OP_DELETE, _image(cols))
                  .alias("before"),
                  F.when(F.col("op_code") == OP_INSERT, _image(cols))
                  .alias("after"),
                  F.lit(None).cast("string").alias("error")))
    b = keyed.filter(F.col("op_code") == OP_UPDATE_BEFORE).alias("b")
    a = keyed.filter(F.col("op_code") == OP_UPDATE_AFTER).alias("a")
    has_b, has_a = F.col("b.op_code").isNotNull(), \
        F.col("a.op_code").isNotNull()
    updates = (b.join(a, ["lsn", "seqval"], "full_outer")
               .select(
                   "lsn", "seqval",
                   F.lit(destination).alias("destination"),
                   F.lit("u").alias("op"),
                   F.when(has_b, _image(cols, "b")).alias("before"),
                   F.when(has_a, _image(cols, "a")).alias("after"),
                   F.when(~has_a, F.lit(
                       "unpaired op-3 (update-before) row: 'all update "
                       "old' promises an atomic 3/4 pair per poll"))
                   .when(~has_b, F.lit(
                       "unpaired op-4 (update-after) row: 'all update "
                       "old' promises an atomic 3/4 pair per poll"))
                   .alias("error")))
    return simple.unionByName(updates)

"""DB2 CDC (ASN SQL Replication) change-data-table source — the sixth
capture mechanism next to pgoutput/binlog/oplog/sqlserver/logminer,
and like SQL Server a PUBLIC SQL contract rather than a wire format:
the ASN Capture program tails the DB2 recovery log and materializes
per-table Change Data (CD) tables; the consumer polls them with plain
SQL. The reference's prod profile bundles the DB2 connector alongside
Oracle (`debezium-server-dist/pom.xml:455-489`), which polls exactly
this surface.

The documented surface (IBM SQL Replication):

- `ASN.IBMSNAP_REGISTER` maps a registered source table to its CD
  table (`SOURCE_OWNER`/`SOURCE_TABLE` → `CD_OWNER`/`CD_TABLE`) and
  advances `CD_NEW_SYNCHPOINT` as Capture commits rows into it — the
  max-LSN signal for poll windows.
- CD table row shape:

    IBMSNAP_COMMITSEQ  CHAR(10) FOR BIT DATA  commit sequence of the
                                              change's transaction
    IBMSNAP_INTENTSEQ  CHAR(10) FOR BIT DATA  log order WITHIN the
                                              transaction
    IBMSNAP_OPERATION  CHAR(1)                'I' | 'U' | 'D'
    <captured columns...>                     the after image ('I'/'U')
                                              or deleted row ('D')
    [<prefix><col>...]                        before-image columns when
                                              the registration sets
                                              BEFORE_IMG_PREFIX

- Updates ship in one of two REGISTRATION modes: a single 'U' row
  (after image, before image only via prefixed columns), or — when
  the registration sets CHG_UPD_TO_DEL_INS='Y' (required when the
  replication key can change) — a DELETE+INSERT PAIR sharing
  IBMSNAP_COMMITSEQ at adjacent IBMSNAP_INTENTSEQ positions. The
  bundled connector reconstructs updates from that adjacency (its
  poll SQL classifies a 'D' immediately followed by an 'I' within the
  same COMMITSEQ as update-before/update-after — the same opcode
  shape SQL Server's TVF emits natively).

Spark-first decode: the pair reconstruction is a groupBy on
IBMSNAP_COMMITSEQ (one group per TRANSACTION — bounded by transaction
size, the same boundedness argument as LogMiner CSF chains) +
`array_sort` by INTENTSEQ + adjacency over the sorted array with
JVM-side higher-order functions — one shuffle, no window over the
poll, no Python in the hot path. Single-'U'-row registrations decode
STATELESSLY (a plain projection, safe on a streaming frame).

LSNs (COMMITSEQ/INTENTSEQ) surface as fixed-width uppercase hex
(20 chars for CHAR(10) FOR BIT DATA): lexicographic order == log
order, so cursoring is plain string comparison in both engines —
identical to the SQL Server source's convention.

No DB2 exists in this container: the poll/register SQL is pinned as
strings (unit-tested), decode stages are tested against synthetic CD
fixtures — the same discipline as `sqlserver_cdc_source.py` and the
wire codecs' encoder twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_COLS = ("IBMSNAP_COMMITSEQ", "IBMSNAP_INTENTSEQ",
              "IBMSNAP_OPERATION")

#: the connector's opcode classification of CD rows (matches the SQL
#: Server change-table encoding: 1=delete, 2=insert,
#: 3=update-before, 4=update-after)
OP_DELETE, OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER = 1, 2, 3, 4


def _check_lsn_hex(lsn_hex: str) -> str:
    if len(lsn_hex) != 20 or not all(
            c in "0123456789ABCDEFabcdef" for c in lsn_hex):
        raise ValueError(
            f"LSN must be 20 hex chars (CHAR(10) FOR BIT DATA), "
            f"got {lsn_hex!r}")
    return lsn_hex.upper()


def register_query(source_owner: str, source_table: str) -> str:
    """The registration lookup: which CD table holds `owner.table`'s
    changes, and how far Capture has populated it. One SELECT against
    the documented ASN control table."""
    return ("SELECT CD_OWNER, CD_TABLE, CD_NEW_SYNCHPOINT "
            "FROM ASN.IBMSNAP_REGISTER "
            f"WHERE SOURCE_OWNER = '{source_owner}' "
            f"AND SOURCE_TABLE = '{source_table}'")


def max_lsn_query(source_owner: str | None = None,
                  source_table: str | None = None) -> str:
    """The poll window's upper bound: the newest synchpoint Capture
    has committed into the CD table(s). Scoped to one registration
    when owner/table are given, else the global max."""
    q = ("SELECT MAX(CD_NEW_SYNCHPOINT) AS MAX_LSN "
         "FROM ASN.IBMSNAP_REGISTER")
    if source_owner is not None and source_table is not None:
        q += (f" WHERE SOURCE_OWNER = '{source_owner}' "
              f"AND SOURCE_TABLE = '{source_table}'")
    return q


def cdc_poll_query(cd_owner: str, cd_table: str,
                   from_lsn_hex: str | None,
                   to_lsn_hex: str) -> str:
    """One poll's SQL over the CD table: changes strictly after
    `from_lsn_hex` (the cursor — last COMMITSEQ already consumed; None
    means from the beginning, the first poll after snapshot) up to and
    including `to_lsn_hex` (from `max_lsn_query`). A single SELECT, so
    it rides Spark's JDBC `query` option with the WHERE executing
    server-side; ORDER BY (COMMITSEQ, INTENTSEQ) is the documented
    replay order. Hex literals use DB2's bit-data syntax X'...'."""
    where = [f"IBMSNAP_COMMITSEQ <= X'{_check_lsn_hex(to_lsn_hex)}'"]
    if from_lsn_hex is not None:
        where.insert(
            0, f"IBMSNAP_COMMITSEQ > X'{_check_lsn_hex(from_lsn_hex)}'")
    return (f"SELECT * FROM {cd_owner}.{cd_table} "
            f"WHERE {' AND '.join(where)} "
            f"ORDER BY IBMSNAP_COMMITSEQ, IBMSNAP_INTENTSEQ")


def _split_cols(columns: list[str],
                before_prefix: str | None) -> tuple[list[str], list[str]]:
    """(captured cols, before-image cols). A column is a before-image
    column iff it starts with the prefix AND its unprefixed twin is
    also present — a data column that merely happens to start with the
    prefix letter is left alone."""
    cand = [c for c in columns if c not in _META_COLS]
    if not before_prefix:
        return cand, []
    names = set(cand)
    before = [c for c in cand
              if c.startswith(before_prefix)
              and c[len(before_prefix):] in names]
    captured = [c for c in cand if c not in set(before)]
    return captured, before


def _image(cols: list[str], src=None, rename=None) -> F.Column:
    get = (lambda c: src[c]) if src is not None else F.col
    out = rename if rename is not None else cols
    return F.to_json(F.struct(
        *[get(c).alias(o) for c, o in zip(cols, out)]))


def decode_db2_cdc_changes_stateless(changes: DataFrame,
                                     destination: str,
                                     before_prefix: str | None = "X"
                                     ) -> DataFrame:
    """Single-'U'-row registration decode (CHG_UPD_TO_DEL_INS='N'):
    every CD row is one complete change, so this is a plain streaming
    projection — 'I'→c (after), 'D'→d (before), 'U'→u (after = the
    captured columns, before = the BEFORE_IMG_PREFIX columns when the
    registration captures them). Unknown operation chars SURFACE with
    a non-null `error`, never drop. Do NOT point this at a
    CHG_UPD_TO_DEL_INS='Y' export — its update pairs need the batch
    decode's commitseq adjacency pass."""
    captured, before_cols = _split_cols(changes.columns, before_prefix)
    opc = F.col("IBMSNAP_OPERATION")
    img = _image(captured)
    bimg = (_image(before_cols,
                   rename=[c[len(before_prefix):] for c in before_cols])
            if before_cols else F.lit(None).cast("string"))
    return changes.select(
        F.upper(F.hex(F.col("IBMSNAP_COMMITSEQ"))).alias("lsn"),
        F.upper(F.hex(F.col("IBMSNAP_INTENTSEQ"))).alias("seqval"),
        F.lit(destination).alias("destination"),
        F.when(opc == "I", "c").when(opc == "U", "u")
        .when(opc == "D", "d").alias("op"),
        F.when(opc == "D", img).when(opc == "U", bimg).alias("before"),
        F.when(opc.isin("I", "U"), img).alias("after"),
        F.when(~opc.isin("I", "U", "D"),
               F.concat(F.lit("unknown IBMSNAP_OPERATION "), opc))
        .alias("error"))


def decode_db2_cdc_changes(changes: DataFrame, destination: str,
                           pair_del_ins: bool = True,
                           before_prefix: str | None = "X"
                           ) -> DataFrame:
    """Batch decode with update-pair reconstruction
    (CHG_UPD_TO_DEL_INS='Y' registrations): group the poll by
    IBMSNAP_COMMITSEQ (one group per transaction — bounded by
    transaction size, never by the poll), sort each group by
    IBMSNAP_INTENTSEQ (binary sort == log order), then classify by
    ADJACENCY exactly as the bundled connector's poll SQL does with
    LEAD/LAG: a 'D' immediately followed by an 'I' is ONE UPDATE
    (before = the D row, after = the I row); that 'I' is consumed; any
    other 'D'/'I' is a plain delete/insert; 'U' rows (mixed-mode
    registrations) decode as in the stateless path. All JVM-side:
    groupBy + array_sort + element_at lookahead — one shuffle, no
    window over the poll, no Python.

    Unknown operation chars SURFACE as error rows (never drop);
    `pair_del_ins=False` skips the adjacency pass and decodes every
    row independently (identical to the stateless path, for
    single-'U'-row exports read in batch)."""
    if not pair_del_ins:
        return decode_db2_cdc_changes_stateless(
            changes, destination, before_prefix)
    captured, before_cols = _split_cols(changes.columns, before_prefix)
    item = F.struct(
        F.col("IBMSNAP_INTENTSEQ").alias("iseq"),
        F.col("IBMSNAP_OPERATION").alias("opc"),
        F.struct(*[F.col(c) for c in captured + before_cols])
        .alias("row"))
    tx = (changes
          .groupBy("IBMSNAP_COMMITSEQ")
          .agg(F.array_sort(F.collect_list(item)).alias("tx")))
    e = (tx.select("IBMSNAP_COMMITSEQ", "tx",
                   F.posexplode("tx").alias("pos", "e")))
    # try_element_at: out-of-bounds lookahead past the chain ends is
    # null, not an ANSI error (1-based indexing)
    nxt = F.try_element_at(F.col("tx"), F.col("pos") + 2)
    prv = F.when(F.col("pos") > 0,
                 F.try_element_at(F.col("tx"), F.col("pos")))
    opc = F.col("e.opc")
    is_pair_head = (opc == "D") & (nxt.isNotNull()) & (nxt["opc"] == "I")
    consumed = (opc == "I") & (prv.isNotNull()) & (prv["opc"] == "D")
    img = _image(captured, src=F.col("e.row"))
    nxt_img = _image(captured, src=nxt["row"])
    bimg = (_image(before_cols, src=F.col("e.row"),
                   rename=[c[len(before_prefix):] for c in before_cols])
            if before_cols else F.lit(None).cast("string"))
    return (e.filter(~consumed).select(
        F.upper(F.hex(F.col("IBMSNAP_COMMITSEQ"))).alias("lsn"),
        F.upper(F.hex(F.col("e.iseq"))).alias("seqval"),
        F.lit(destination).alias("destination"),
        F.when(is_pair_head | (opc == "U"), "u")
        .when(opc == "I", "c").when(opc == "D", "d").alias("op"),
        F.when(is_pair_head, img)
        .when(opc == "D", img).when(opc == "U", bimg).alias("before"),
        F.when(is_pair_head, nxt_img)
        .when(opc.isin("I", "U"), img).alias("after"),
        F.when(~opc.isin("I", "U", "D"),
               F.concat(F.lit("unknown IBMSNAP_OPERATION "), opc))
        .alias("error")))

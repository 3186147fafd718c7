"""Oracle LogMiner CDC source — the fifth real-CDC capture mechanism
next to pgoutput/binlog/oplog/SQL Server change tables, and like the
SQL Server one a THIN source: Oracle exposes redo history through a
PUBLIC SQL contract (`DBMS_LOGMNR.START_LOGMNR` +
`V$LOGMNR_CONTENTS`), not a wire format. The reference's prod profile
bundles the Debezium Oracle connector (`debezium-server-dist/
pom.xml:455-489`), whose default adapter polls exactly this view.

Contract pieces pinned here (no Oracle exists in this container — the
SQL strings and the decode stages are unit- and oracle-tested against
synthetic `V$LOGMNR_CONTENTS` fixtures, the same discipline as
`sources/sqlserver_cdc_source.py`):

- `start_logminer_sql` — the PL/SQL block that opens a mining session
  over an SCN range (online dictionary + committed-data-only, the
  connector's defaults).
- `logminer_poll_query` — one poll's SELECT over V$LOGMNR_CONTENTS:
  SCN-range cursored (strictly-after semantics like the LSN cursor),
  DML-only (OPERATION_CODE IN (1,2,3)), optional owner/table filters,
  `ROWNUM AS fetch_seq` pinning the fetch order that CSF reassembly
  needs. Runs as a single SELECT, so it rides Spark's JDBC `query`
  option and the WHERE executes server-side.
- SCNs surface as fixed-width 16-char uppercase hex — lexicographic
  order == numeric order, so cursoring is a plain string comparison
  in both Spark and the envelope (same convention as the LSN hex).

The decode is Spark-first in shape, Python in the inner loop (the
wire-codec pattern): V$LOGMNR_CONTENTS ships row images as REDO SQL
text (`SQL_REDO`), so the per-row work is parsing
`insert into "O"."T"("C1",...) values (...)` / `update ... set ...
where ...` / `delete from ... where ...` back into before/after
images — `parse_redo_sql` below, run inside one Arrow-batched
`mapInPandas` pass. Long statements split across rows with `CSF=1`
(continuation flag); `reassemble_csf` stitches chains with a
groupBy on the documented chain key (XID, RS_ID, SSN) + an
array_sort over (fetch_seq, chunk) — candidate set = |rows in the
poll|, chain-bounded groups, no window over the table. Parse
failures and op-code/verb mismatches SURFACE with a non-null
`error` column (dead-letter discipline), never drop.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: V$LOGMNR_CONTENTS operation codes for row DML
OP_INSERT, OP_DELETE, OP_UPDATE = 1, 2, 3

_OP_CHAR = {OP_INSERT: "c", OP_DELETE: "d", OP_UPDATE: "u"}

#: the poll projection — fetch_seq (ROWNUM) first: CSF chains carry
#: their reassembly order in fetch order, nothing else
_POLL_COLS = ("SCN", "OPERATION_CODE", "SEG_OWNER", "TABLE_NAME",
              "SQL_REDO", "XID", "ROW_ID", "RS_ID", "SSN", "CSF",
              "TIMESTAMP")


def scn_hex(scn: int) -> str:
    """SCN as fixed-width hex: 16 chars covers Oracle's 48-bit SCNs
    with room; lexicographic == numeric, the cursor convention."""
    if scn < 0 or scn >= 1 << 64:
        raise ValueError(f"scn out of range: {scn}")
    return f"{scn:016X}"


def start_logminer_sql(start_scn: int, end_scn: int | None = None,
                       committed_data_only: bool = True) -> str:
    """PL/SQL block opening the mining session the poll reads from —
    online-catalog dictionary (no dictionary dump) and, by default,
    COMMITTED_DATA_ONLY so only committed transactions surface in SCN
    order (the connector's default mining strategy)."""
    opts = ["DBMS_LOGMNR.DICT_FROM_ONLINE_CATALOG"]
    if committed_data_only:
        opts.append("DBMS_LOGMNR.COMMITTED_DATA_ONLY")
    end = (f", ENDSCN => {end_scn}" if end_scn is not None else "")
    return (f"BEGIN DBMS_LOGMNR.START_LOGMNR("
            f"STARTSCN => {start_scn}{end}, "
            f"OPTIONS => {' + '.join(opts)}); END;")


def logminer_poll_query(from_scn: int, to_scn: int,
                        seg_owners: tuple[str, ...] = (),
                        tables: tuple[str, ...] = ()) -> str:
    """One poll's SELECT over V$LOGMNR_CONTENTS: rows strictly after
    `from_scn` (the cursor = last SCN already consumed) up to and
    including `to_scn`, DML only. `ROWNUM AS fetch_seq` pins fetch
    order for CSF reassembly."""
    if to_scn <= from_scn:
        raise ValueError(f"empty SCN range ({from_scn}, {to_scn}]")
    where = [f"SCN > {from_scn}", f"SCN <= {to_scn}",
             f"OPERATION_CODE IN ({OP_INSERT}, {OP_DELETE}, {OP_UPDATE})"]
    if seg_owners:
        quoted = ", ".join(f"'{o}'" for o in seg_owners)
        where.append(f"SEG_OWNER IN ({quoted})")
    if tables:
        quoted = ", ".join(f"'{t}'" for t in tables)
        where.append(f"TABLE_NAME IN ({quoted})")
    return (f"SELECT ROWNUM AS FETCH_SEQ, {', '.join(_POLL_COLS)} "
            f"FROM V$LOGMNR_CONTENTS WHERE {' AND '.join(where)}")


# ------------------------------------------------------ redo SQL parse

def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\r\n":
        i += 1
    return i


def _scan_quoted_ident(s: str, i: int) -> tuple[str, int]:
    if i >= len(s) or s[i] != '"':
        raise ValueError(f'expected quoted identifier at {s[i:i+20]!r}')
    j = s.index('"', i + 1)
    return s[i + 1:j], j + 1


def _scan_string(s: str, i: int) -> tuple[str, int]:
    """Oracle string literal with '' escapes."""
    out: list[str] = []
    i += 1
    while True:
        j = s.index("'", i)
        if j + 1 < len(s) and s[j + 1] == "'":
            out.append(s[i:j] + "'")
            i = j + 2
        else:
            out.append(s[i:j])
            return "".join(out), j + 1


def _scan_call_body(s: str, i: int) -> tuple[str, int]:
    """Balanced-paren, quote-aware scan of a call's argument text;
    `s[i]` must be '('. Returns (inner text, index past ')')."""
    depth = 0
    j = i
    while j < len(s):
        c = s[j]
        if c == "'":
            _, j = _scan_string(s, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[i + 1:j], j + 1
        j += 1
    raise ValueError("unbalanced parentheses in redo SQL")


_NUM_RE = re.compile(r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?")
_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_$#]*")

#: calls whose FIRST string literal is the value (temporal/raw
#: renderings LogMiner emits instead of bare literals)
_LITERAL_CALLS = {"TO_DATE", "TO_TIMESTAMP", "TO_TIMESTAMP_TZ",
                  "HEXTORAW", "UNISTR", "TO_YMINTERVAL",
                  "TO_DSINTERVAL"}


def _scan_value(s: str, i: int):
    """One SQL value → python value: 'str' (with '' escapes), NULL →
    None, numbers → int/float, TO_DATE/TO_TIMESTAMP/HEXTORAW/... →
    their inner literal text, EMPTY_BLOB()/EMPTY_CLOB() → ''."""
    i = _skip_ws(s, i)
    if i >= len(s):
        raise ValueError("expected value, found end of statement")
    if s[i] == "'":
        return _scan_string(s, i)
    m = _WORD_RE.match(s, i)
    if m:
        word = m.group(0)
        j = _skip_ws(s, m.end())
        if j < len(s) and s[j] == "(":
            inner, j2 = _scan_call_body(s, j)
            up = word.upper()
            if up in _LITERAL_CALLS:
                k = inner.index("'")
                lit, _ = _scan_string(inner, k)
                return lit, j2
            if up in ("EMPTY_BLOB", "EMPTY_CLOB"):
                return "", j2
            raise ValueError(f"unsupported function {word!r} in redo SQL")
        if word.upper() == "NULL":
            return None, m.end()
        raise ValueError(f"unexpected token {word!r} in redo SQL")
    m = _NUM_RE.match(s, i)
    if m:
        txt = m.group(0)
        val = (float(txt) if ("." in txt or "e" in txt or "E" in txt)
               else int(txt))
        return val, m.end()
    raise ValueError(f"cannot scan value at {s[i:i+20]!r}")


def _scan_table(s: str, i: int) -> tuple[str, str, int]:
    i = _skip_ws(s, i)
    owner, i = _scan_quoted_ident(s, i)
    if i >= len(s) or s[i] != ".":
        raise ValueError('expected "OWNER"."TABLE"')
    table, i = _scan_quoted_ident(s, i + 1)
    return owner, table, i


def _parse_conditions(s: str, i: int) -> dict:
    """WHERE body: `"col" = value` / `"col" IS NULL`, AND-joined —
    the only forms LogMiner emits for row-image predicates."""
    out: dict = {}
    while True:
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] == ";":
            break
        col, i = _scan_quoted_ident(s, i)
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == "=":
            val, i = _scan_value(s, i + 1)
        else:
            m = re.match(r"IS\s+NULL", s[i:], re.IGNORECASE)
            if not m:
                raise ValueError(
                    f"expected '=' or IS NULL at {s[i:i+20]!r}")
            val = None
            i += m.end()
        out[col] = val
        i = _skip_ws(s, i)
        m = re.match(r"and\b", s[i:], re.IGNORECASE)
        if m:
            i += m.end()
        elif i < len(s) and s[i] != ";":
            raise ValueError(f"unexpected token at {s[i:i+20]!r}")
    return out


def parse_redo_sql(sql: str) -> dict:
    """SQL_REDO text → {"op": 'c'|'u'|'d', "owner", "table",
    "before": dict|None, "after": dict|None}. Update semantics match
    the connector's: before = the WHERE row image, after = before
    overridden by the SET assignments. Raises ValueError (with the
    offending fragment) on anything outside LogMiner's emitted
    grammar — the caller surfaces that as the row's `error`."""
    s = sql.strip()
    m = re.match(r"insert\s+into\s+", s, re.IGNORECASE)
    if m:
        owner, table, i = _scan_table(s, m.end())
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] != "(":
            raise ValueError("expected column list")
        cols_txt, i = _scan_call_body(s, i)
        cols = []
        j = 0
        while True:
            j = _skip_ws(cols_txt, j)
            if j >= len(cols_txt):
                break
            c, j = _scan_quoted_ident(cols_txt, j)
            cols.append(c)
            j = _skip_ws(cols_txt, j)
            if j < len(cols_txt) and cols_txt[j] == ",":
                j += 1
        m2 = re.match(r"\s*values\s*", s[i:], re.IGNORECASE)
        if not m2:
            raise ValueError("expected VALUES")
        i += m2.end()
        if i >= len(s) or s[i] != "(":
            raise ValueError("expected '(' after VALUES")
        vals_txt, i = _scan_call_body(s, i)
        vals = []
        j = 0
        while len(vals) < len(cols):
            v, j = _scan_value(vals_txt, j)
            vals.append(v)
            j = _skip_ws(vals_txt, j)
            if j < len(vals_txt) and vals_txt[j] == ",":
                j += 1
        if _skip_ws(vals_txt, j) < len(vals_txt):
            raise ValueError(
                f"{len(cols)} columns but extra values at "
                f"{vals_txt[j:j+20]!r}")
        return {"op": "c", "owner": owner, "table": table,
                "before": None, "after": dict(zip(cols, vals))}
    m = re.match(r"update\s+", s, re.IGNORECASE)
    if m:
        owner, table, i = _scan_table(s, m.end())
        m2 = re.match(r"\s*set\s+", s[i:], re.IGNORECASE)
        if not m2:
            raise ValueError("expected SET")
        i += m2.end()
        assigns: dict = {}
        while True:
            i = _skip_ws(s, i)
            col, i = _scan_quoted_ident(s, i)
            i = _skip_ws(s, i)
            if i >= len(s) or s[i] != "=":
                raise ValueError("expected '=' in SET")
            val, i = _scan_value(s, i + 1)
            assigns[col] = val
            i = _skip_ws(s, i)
            if i < len(s) and s[i] == ",":
                i += 1
                continue
            break
        before: dict = {}
        m3 = re.match(r"where\s+", s[i:], re.IGNORECASE)
        if m3:
            before = _parse_conditions(s, i + m3.end())
        elif i < len(s) and s[i] != ";":
            raise ValueError(f"unexpected token at {s[i:i+20]!r}")
        after = {**before, **assigns}
        return {"op": "u", "owner": owner, "table": table,
                "before": before or None, "after": after}
    m = re.match(r"delete\s+from\s+", s, re.IGNORECASE)
    if m:
        owner, table, i = _scan_table(s, m.end())
        before = {}
        m2 = re.match(r"\s*where\s+", s[i:], re.IGNORECASE)
        if m2:
            before = _parse_conditions(s, i + m2.end())
        elif _skip_ws(s, i) < len(s) and s[_skip_ws(s, i)] != ";":
            raise ValueError(f"unexpected token at {s[i:i+20]!r}")
        return {"op": "d", "owner": owner, "table": table,
                "before": before or None, "after": None}
    raise ValueError(f"not a row-DML redo statement: {s[:40]!r}")


# ------------------------------------------------------- decode stages

def reassemble_csf(changes: DataFrame) -> DataFrame:
    """Stitch CSF continuation chains: rows sharing (xid, rs_id, ssn)
    are one statement, ordered by fetch_seq, all-but-last flagged
    csf=1. A groupBy on the chain key + array_sort over (fetch_seq,
    chunk) — chain-bounded groups with map-side combine, no window
    over the poll. Solitary rows (csf=0, chain of one) pass through
    the same path unchanged. scn/operation_code/... are constant
    within a chain (they describe the one statement), taken from the
    first chunk."""
    rest = [c for c in changes.columns
            if c not in ("xid", "rs_id", "ssn", "fetch_seq",
                         "sql_redo", "csf")]
    return (changes
            .groupBy("xid", "rs_id", "ssn")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("fetch_seq", "sql_redo"))),
                         lambda x: x["sql_redo"]),
                     "").alias("sql_redo"),
                 F.min("fetch_seq").alias("fetch_seq"),
                 F.min_by(F.struct(*rest), F.col("fetch_seq"))
                 .alias("__first"))
            .select("xid", "rs_id", "ssn", "fetch_seq", "sql_redo",
                    *[F.col(f"__first.{c}").alias(c) for c in rest]))


_ENVELOPE_SCHEMA = ("scn string, xid string, row_id string, "
                    "destination string, op string, before string, "
                    "after string, error string")


def _parse_rows(changes: DataFrame, destination_prefix: str) -> DataFrame:
    """Arrow-batched parse of redo SQL → envelope rows. Parse failures
    and op-code/verb mismatches surface with error != null."""

    def run(frames):
        import pandas as pd

        for pdf in frames:
            out = {k: [] for k in ("scn", "xid", "row_id", "destination",
                                   "op", "before", "after", "error")}
            for scn, code, owner, tbl, redo, xid, row_id in zip(
                    pdf["scn"], pdf["operation_code"], pdf["seg_owner"],
                    pdf["table_name"], pdf["sql_redo"], pdf["xid"],
                    pdf["row_id"]):
                dest = f"{destination_prefix}.{owner}.{tbl}"
                op = before = after = err = None
                try:
                    parsed = parse_redo_sql(redo)
                    op = parsed["op"]
                    expect = _OP_CHAR.get(int(code))
                    if expect is not None and expect != op:
                        raise ValueError(
                            f"OPERATION_CODE {code} but redo SQL is "
                            f"{op!r}")
                    if (parsed["owner"], parsed["table"]) != (owner, tbl):
                        raise ValueError(
                            f"redo SQL names "
                            f"{parsed['owner']}.{parsed['table']}, row "
                            f"says {owner}.{tbl}")
                    dumps = lambda d: (None if d is None else json.dumps(
                        d, separators=(",", ":"), ensure_ascii=False))
                    before, after = dumps(parsed["before"]), \
                        dumps(parsed["after"])
                except ValueError as exc:
                    op, before, after = None, None, None
                    err = str(exc)
                except IndexError as exc:
                    # belt-and-braces: a truncated statement (e.g. an
                    # incomplete CSF chain at a poll boundary) must
                    # become an error ROW, never a task crash
                    op, before, after = None, None, None
                    err = f"truncated redo SQL: {exc}"
                out["scn"].append(scn_hex(int(scn)))
                out["xid"].append(xid)
                out["row_id"].append(row_id)
                out["destination"].append(dest)
                out["op"].append(op)
                out["before"].append(before)
                out["after"].append(after)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return changes.mapInPandas(run, _ENVELOPE_SCHEMA)


def decode_logminer_changes(changes: DataFrame,
                            destination_prefix: str) -> DataFrame:
    """Batch decode of a V$LOGMNR_CONTENTS poll export (columns per
    `logminer_poll_query`, lower-cased: fetch_seq, scn,
    operation_code, seg_owner, table_name, sql_redo, xid, row_id,
    rs_id, ssn, csf): CSF reassembly, then the Arrow-batched redo-SQL
    parse. One shuffle (the chain groupBy), then embarrassingly
    parallel."""
    return _parse_rows(reassemble_csf(changes), destination_prefix)


def decode_logminer_changes_stateless(changes: DataFrame,
                                      destination_prefix: str
                                      ) -> DataFrame:
    """Streaming-safe decode: no grouping state, so CSF chains cannot
    be reassembled — continuation rows (csf=1) surface as error rows
    (dead-letter them or use the batch decode), complete rows parse
    normally. A chain's terminal chunk (csf=0 but mid-statement) fails
    the parse and surfaces too — nothing silently drops."""
    flagged = _parse_rows(changes.filter(F.col("csf") == 0),
                          destination_prefix)
    cont = (changes.filter(F.col("csf") != 0)
            .select(F.col("scn").cast("long").alias("__scn"),
                    "xid", "row_id", "seg_owner", "table_name"))
    cont_env = cont.select(
        F.conv(F.col("__scn").cast("string"), 10, 16).alias("__hex"),
        "xid", "row_id", "seg_owner", "table_name"
    ).select(
        F.lpad(F.col("__hex"), 16, "0").alias("scn"),
        "xid", "row_id",
        F.concat_ws(".", F.lit(destination_prefix),
                    F.col("seg_owner"), F.col("table_name"))
        .alias("destination"),
        F.lit(None).cast("string").alias("op"),
        F.lit(None).cast("string").alias("before"),
        F.lit(None).cast("string").alias("after"),
        F.lit("CSF continuation row: stateless decode cannot "
              "reassemble chains — use the batch decode").alias("error"))
    return flagged.unionByName(cont_env)

"""Oracle LogMiner CDC source: the START_LOGMNR / V$LOGMNR_CONTENTS
SQL contracts as pinned strings, the redo-SQL parser against
hand-written statements covering LogMiner's emitted grammar (quoted
identifiers, '' escapes, NULL vs IS NULL, TO_DATE/TO_TIMESTAMP/
HEXTORAW/EMPTY_BLOB renderings), CSF chain reassembly, error
surfacing (never dropping), and the oracle-logminer assembly path —
all against synthetic fixtures (no Oracle in this container; the view
and package are Oracle's public LogMiner contract)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.sources.logminer_source import (
    decode_logminer_changes,
    decode_logminer_changes_stateless,
    logminer_poll_query,
    parse_redo_sql,
    reassemble_csf,
    scn_hex,
    start_logminer_sql,
)

# ------------------------------------------------------- SQL contracts


def test_start_logminer_sql_contract():
    assert start_logminer_sql(1000) == (
        "BEGIN DBMS_LOGMNR.START_LOGMNR(STARTSCN => 1000, "
        "OPTIONS => DBMS_LOGMNR.DICT_FROM_ONLINE_CATALOG + "
        "DBMS_LOGMNR.COMMITTED_DATA_ONLY); END;")
    assert "ENDSCN => 2000" in start_logminer_sql(1000, end_scn=2000)
    assert "COMMITTED_DATA_ONLY" not in start_logminer_sql(
        1000, committed_data_only=False)


def test_poll_query_contract():
    q = logminer_poll_query(100, 200, seg_owners=("APP",),
                            tables=("EVENTS",))
    assert q.startswith("SELECT ROWNUM AS FETCH_SEQ, SCN, "
                        "OPERATION_CODE, SEG_OWNER, TABLE_NAME, "
                        "SQL_REDO, XID, ROW_ID, RS_ID, SSN, CSF, "
                        "TIMESTAMP FROM V$LOGMNR_CONTENTS WHERE ")
    assert "SCN > 100 AND SCN <= 200" in q
    assert "OPERATION_CODE IN (1, 2, 3)" in q
    assert "SEG_OWNER IN ('APP')" in q and "TABLE_NAME IN ('EVENTS')" in q
    with pytest.raises(ValueError, match="empty SCN range"):
        logminer_poll_query(200, 200)


def test_scn_hex_order_preserving():
    hexes = [scn_hex(n) for n in (1, 9, 255, 256, 2**40)]
    assert hexes == sorted(hexes) and all(len(h) == 16 for h in hexes)


# ---------------------------------------------------- redo SQL parser


def test_parse_insert():
    p = parse_redo_sql(
        'insert into "APP"."T"("ID","NAME","NOTE") '
        "values (42,'it''s',NULL);")
    assert p == {"op": "c", "owner": "APP", "table": "T",
                 "before": None,
                 "after": {"ID": 42, "NAME": "it's", "NOTE": None}}


def test_parse_update_where_is_before_set_overrides():
    p = parse_redo_sql(
        'update "APP"."T" set "NAME" = \'b\', "N" = 2.5 '
        'where "ID" = 7 and "NAME" = \'a\' and "NOTE" IS NULL;')
    assert p["op"] == "u"
    assert p["before"] == {"ID": 7, "NAME": "a", "NOTE": None}
    assert p["after"] == {"ID": 7, "NAME": "b", "NOTE": None, "N": 2.5}


def test_parse_delete():
    p = parse_redo_sql(
        'delete from "APP"."T" where "ID" = 7 and "NAME" = \'a\';')
    assert p == {"op": "d", "owner": "APP", "table": "T",
                 "before": {"ID": 7, "NAME": "a"}, "after": None}


def test_parse_temporal_and_raw_renderings():
    p = parse_redo_sql(
        'insert into "S"."U"("D","TS","RAW","LOB") values ('
        "TO_DATE('2024-01-02 03:04:05', 'YYYY-MM-DD HH24:MI:SS'),"
        "TO_TIMESTAMP('2024-01-02 03:04:05.123456'),"
        "HEXTORAW('DEADBEEF'),EMPTY_BLOB());")
    assert p["after"] == {"D": "2024-01-02 03:04:05",
                          "TS": "2024-01-02 03:04:05.123456",
                          "RAW": "DEADBEEF", "LOB": ""}


def test_parse_rejects_non_dml_and_junk():
    with pytest.raises(ValueError, match="not a row-DML"):
        parse_redo_sql('alter table "A"."B" add ("C" number);')
    with pytest.raises(ValueError, match="unexpected token"):
        parse_redo_sql('insert into "A"."B"("C") values (SYSDATE);')
    with pytest.raises(ValueError, match="unsupported function"):
        parse_redo_sql('insert into "A"."B"("C") values (XMLTYPE(\'x\'));')
    with pytest.raises(ValueError):
        parse_redo_sql('update "A"."B" set "C" = 1 where "D" > 2;')


# ------------------------------------------------------- decode stages

_SCHEMA = T.StructType([
    T.StructField("fetch_seq", T.LongType()),
    T.StructField("scn", T.LongType()),
    T.StructField("operation_code", T.IntegerType()),
    T.StructField("seg_owner", T.StringType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("sql_redo", T.StringType()),
    T.StructField("xid", T.StringType()),
    T.StructField("row_id", T.StringType()),
    T.StructField("rs_id", T.StringType()),
    T.StructField("ssn", T.LongType()),
    T.StructField("csf", T.IntegerType()),
])


def _rows(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_csf_reassembly_and_decode(spark):
    ins = ('insert into "APP"."T"("ID","NAME") '
           "values (1,'averylongvalue');")
    cut = 30
    df = _rows(spark, [
        # one statement split across two CSF rows
        (1, 100, 1, "APP", "T", ins[:cut], "x1", "r1", "rs1", 0, 1),
        (2, 100, 1, "APP", "T", ins[cut:], "x1", "r1", "rs1", 0, 0),
        # a solitary delete
        (3, 101, 2, "APP", "T",
         'delete from "APP"."T" where "ID" = 9;', "x2", "r2", "rs2",
         0, 0),
    ])
    chains = reassemble_csf(df)
    assert chains.count() == 2
    out = {r["scn"]: r for r in
           decode_logminer_changes(df, "srv").collect()}
    assert len(out) == 2
    a = out[scn_hex(100)]
    assert a["op"] == "c" and a["error"] is None
    assert json.loads(a["after"]) == {"ID": 1, "NAME": "averylongvalue"}
    assert a["destination"] == "srv.APP.T"
    d = out[scn_hex(101)]
    assert d["op"] == "d" and json.loads(d["before"]) == {"ID": 9}


def test_parse_failure_and_code_mismatch_surface_as_error(spark):
    df = _rows(spark, [
        (1, 100, 1, "APP", "T", "garbage redo", "x1", "r1", "rs1", 0, 0),
        # op code says DELETE but the statement is an insert
        (2, 101, 2, "APP", "T",
         'insert into "APP"."T"("ID") values (1);', "x2", "r2", "rs2",
         0, 0),
        # redo names a different table than the row metadata
        (3, 102, 1, "APP", "T",
         'insert into "APP"."OTHER"("ID") values (1);', "x3", "r3",
         "rs3", 0, 0),
    ])
    out = {r["scn"]: r for r in
           decode_logminer_changes(df, "srv").collect()}
    assert len(out) == 3  # nothing dropped
    assert "not a row-DML" in out[scn_hex(100)]["error"]
    assert "OPERATION_CODE 2" in out[scn_hex(101)]["error"]
    assert "names APP.OTHER" in out[scn_hex(102)]["error"]


def test_truncated_redo_sql_is_error_row_not_task_crash(spark):
    """ADVICE r07: truncated statements (exactly what an incomplete
    CSF chain at a poll boundary produces) must surface as error ROWS
    — an IndexError escaping parse_redo_sql would crash the whole
    mapInPandas task/batch instead."""
    truncated = [
        'update "A"."T" set "K"', 'delete from "APP"',
        'insert into "APP"."EVENTS"', 'update "A"."T" set "K" =',
        'insert into "A"."T" (', 'delete from "APP"."T" where "K"',
        'update "A"."T" set', 'insert into "A', '"',
    ]
    for s in truncated:  # unit level: always ValueError, never Index
        with pytest.raises(ValueError):
            parse_redo_sql(s)
    df = _rows(spark, [
        (i + 1, 100 + i, None, "A", "T", s, f"x{i}", f"r{i}", f"rs{i}",
         0, 0) for i, s in enumerate(truncated)
    ])
    out = decode_logminer_changes(df, "srv").collect()
    assert len(out) == len(truncated)  # nothing dropped, no crash
    assert all(r["error"] is not None and r["op"] is None for r in out)


def test_stateless_decode_flags_continuations(spark):
    df = _rows(spark, [
        (1, 100, 1, "APP", "T", 'insert into "APP"."T"("ID") ',
         "x1", "r1", "rs1", 0, 1),  # continuation head
        (2, 100, 1, "APP", "T", "values (1);", "x1", "r1", "rs1", 0, 0),
        (3, 101, 2, "APP", "T",
         'delete from "APP"."T" where "ID" = 9;', "x2", "r2", "rs2",
         0, 0),
    ])
    out = decode_logminer_changes_stateless(df, "srv").collect()
    assert len(out) == 3  # nothing dropped
    by_err = [r for r in out if r["error"] is not None]
    # the csf=1 head is flagged; the orphan tail chunk fails the parse
    assert len(by_err) == 2
    assert any("CSF continuation" in r["error"] for r in by_err)
    ok = [r for r in out if r["error"] is None]
    assert len(ok) == 1 and ok[0]["op"] == "d"
    assert ok[0]["scn"] == scn_hex(101)


def test_build_oracle_logminer_source(spark, tmp_path):
    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig

    src = str(tmp_path / "poll")
    _rows(spark, [
        (1, 100, 1, "APP", "T",
         'insert into "APP"."T"("ID","NAME") values (1,\'a\');',
         "x1", "r1", "rs1", 0, 0),
        (2, 101, 1, "APP", "T", 'partial redo ', "x2", "r2", "rs2",
         0, 1),
    ]).write.parquet(src)
    cfg = PipelineConfig({
        "debezium.source.type": "oracle-logminer",
        "debezium.source.path": src,
        "debezium.source.logminer.prefix": "srv",
        "debezium.source.dead.letter.destination": "srv.__dlq",
    })
    stream = build_source(spark, cfg)
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("lm_cdc")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM lm_cdc").collect()
    assert len(rows) == 2
    good = [r for r in rows if r["destination"] == "srv.APP.T"]
    assert len(good) == 1
    val = json.loads(good[0]["value"])
    assert val["op"] == "c" and json.loads(val["after"]) == \
        {"ID": 1, "NAME": "a"}
    assert val["source"]["scn"] == scn_hex(100)
    dead = [r for r in rows if r["destination"] == "srv.__dlq"]
    assert len(dead) == 1
    assert "CSF continuation" in json.loads(dead[0]["value"])["error"]


# ---------------------------------------------------- generative fuzz


def _render_value(v) -> str:
    """Independent renderer (the encoder twin of the parser's value
    grammar): python value → the literal LogMiner would emit."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        raise TypeError("no bool in the matrix")
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_parse_redo_sql_fuzz_round_trip(seed):
    """1k random statements per seed: render with an independent
    encoder (quote-escaping strings incl. quotes/semicolons/ANDs,
    ints, floats, NULLs) → parse → images must round-trip exactly."""
    import random

    rng = random.Random(seed)
    pool = ["a", "it's", "x''y", "AND", "where", "values(1)",
            "semi;colon", "tab\tnl\n", "quote'''s", ""]

    def rand_val():
        k = rng.randrange(5)
        if k == 0:
            return None
        if k == 1:
            return rng.randint(-10**12, 10**12)
        if k == 2:
            return round(rng.uniform(-1e6, 1e6), 6)
        return rng.choice(pool) + str(rng.randrange(100))

    for _ in range(1000):
        ncols = rng.randint(1, 6)
        cols = [f"C{i}" for i in range(ncols)]
        owner, table = "APP", f"T{rng.randrange(10)}"
        kind = rng.choice(("c", "u", "d"))
        if kind == "c":
            vals = [rand_val() for _ in cols]
            sql = (f'insert into "{owner}"."{table}"('
                   + ",".join(f'"{c}"' for c in cols) + ") values ("
                   + ",".join(_render_value(v) for v in vals) + ");")
            p = parse_redo_sql(sql)
            assert p["op"] == "c" and p["after"] == dict(zip(cols, vals))
            assert p["before"] is None
        elif kind == "d":
            vals = [rand_val() for _ in cols]
            conds = " and ".join(
                f'"{c}" IS NULL' if v is None
                else f'"{c}" = {_render_value(v)}'
                for c, v in zip(cols, vals))
            sql = f'delete from "{owner}"."{table}" where {conds};'
            p = parse_redo_sql(sql)
            assert p["op"] == "d" and p["before"] == dict(zip(cols, vals))
            assert p["after"] is None
        else:
            before = {c: rand_val() for c in cols}
            n_set = rng.randint(1, ncols)
            assigns = {c: rand_val() for c in
                       rng.sample(cols, n_set)}
            set_sql = ", ".join(f'"{c}" = {_render_value(v)}'
                                for c, v in assigns.items())
            conds = " and ".join(
                f'"{c}" IS NULL' if v is None
                else f'"{c}" = {_render_value(v)}'
                for c, v in before.items())
            sql = (f'update "{owner}"."{table}" set {set_sql} '
                   f"where {conds};")
            p = parse_redo_sql(sql)
            assert p["op"] == "u" and p["before"] == before
            assert p["after"] == {**before, **assigns}
        assert p["owner"] == owner and p["table"] == table

"""DB2 ASN SQL-Replication CD-table source: pinned SQL contract +
synthetic change-table decode fixtures (no DB2 in the container — the
same discipline as the SQL Server source and the wire codecs)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.sources.db2_cdc_source import (
    cdc_poll_query,
    decode_db2_cdc_changes,
    decode_db2_cdc_changes_stateless,
    max_lsn_query,
    register_query,
)


# ------------------------------------------------------- SQL contract

def test_register_query_contract():
    q = register_query("APPO", "ORDERS")
    assert q == ("SELECT CD_OWNER, CD_TABLE, CD_NEW_SYNCHPOINT "
                 "FROM ASN.IBMSNAP_REGISTER "
                 "WHERE SOURCE_OWNER = 'APPO' "
                 "AND SOURCE_TABLE = 'ORDERS'")


def test_max_lsn_query_contract():
    assert max_lsn_query() == (
        "SELECT MAX(CD_NEW_SYNCHPOINT) AS MAX_LSN "
        "FROM ASN.IBMSNAP_REGISTER")
    assert max_lsn_query("APPO", "ORDERS").endswith(
        "WHERE SOURCE_OWNER = 'APPO' AND SOURCE_TABLE = 'ORDERS'")


def test_poll_query_contract():
    lo, hi = "0000000000000000000A", "00000000000000000FFF"
    q = cdc_poll_query("ASNCDC", "CDC_APPO_ORDERS", lo, hi)
    assert q == (
        "SELECT * FROM ASNCDC.CDC_APPO_ORDERS "
        f"WHERE IBMSNAP_COMMITSEQ > X'{lo}' "
        f"AND IBMSNAP_COMMITSEQ <= X'{hi}' "
        "ORDER BY IBMSNAP_COMMITSEQ, IBMSNAP_INTENTSEQ")
    # first poll after snapshot: no lower bound
    q0 = cdc_poll_query("ASNCDC", "CDC_APPO_ORDERS", None, hi)
    assert "> X'" not in q0 and f"<= X'{hi}'" in q0
    # cursor is CHAR(10) FOR BIT DATA -> exactly 20 hex chars
    with pytest.raises(ValueError, match="20 hex"):
        cdc_poll_query("A", "T", "0A", hi)
    with pytest.raises(ValueError, match="20 hex"):
        cdc_poll_query("A", "T", lo, "zz000000000000000000")
    # lower-case hex normalizes (lexicographic cursoring needs one case)
    assert "X'000000000000000000AB'" in cdc_poll_query(
        "A", "T", "000000000000000000ab", hi)


# ------------------------------------------------------- CD fixtures

_SCHEMA = T.StructType([
    T.StructField("IBMSNAP_COMMITSEQ", T.BinaryType()),
    T.StructField("IBMSNAP_INTENTSEQ", T.BinaryType()),
    T.StructField("IBMSNAP_OPERATION", T.StringType()),
    T.StructField("ID", T.LongType()),
    T.StructField("NAME", T.StringType()),
])


def _seq(n: int) -> bytearray:
    return bytearray(n.to_bytes(10, "big"))


def _rows(spark, rows):
    return spark.createDataFrame(
        [(_seq(c), _seq(i), op, rid, name)
         for c, i, op, rid, name in rows], _SCHEMA)


def _by_key(out):
    return {(r["lsn"], r["seqval"]): r for r in out}


def test_insert_delete_update_pair_decode(spark):
    """CHG_UPD_TO_DEL_INS='Y': an update is a D+I pair sharing
    COMMITSEQ at adjacent INTENTSEQ — decode reconstructs ONE 'u'
    envelope with before = the D row, after = the I row."""
    df = _rows(spark, [
        (1, 10, "I", 1, "ann"),          # plain insert, tx 1
        (2, 20, "D", 1, "ann"),          # update pair, tx 2 ...
        (2, 21, "I", 1, "anne"),
        (2, 22, "I", 2, "bob"),          # plus a plain insert, same tx
        (3, 30, "D", 2, "bob"),          # plain delete, tx 3
    ])
    out = decode_db2_cdc_changes(df, "db2.APPO.ORDERS").collect()
    assert len(out) == 4  # 5 CD rows -> 4 changes (pair collapsed)
    by_op = {}
    for r in out:
        by_op.setdefault(r["op"], []).append(r)
    assert [r["after"] for r in by_op["c"]] in (
        ['{"ID":1,"NAME":"ann"}', '{"ID":2,"NAME":"bob"}'],
        ['{"ID":2,"NAME":"bob"}', '{"ID":1,"NAME":"ann"}'])
    (u,) = by_op["u"]
    assert u["before"] == '{"ID":1,"NAME":"ann"}'
    assert u["after"] == '{"ID":1,"NAME":"anne"}'
    assert u["seqval"] == "00000000000000000014"  # the D row's (0x14=20)
    (d,) = by_op["d"]
    assert d["before"] == '{"ID":2,"NAME":"bob"}' and d["after"] is None
    assert all(r["error"] is None for r in out)
    assert all(r["destination"] == "db2.APPO.ORDERS" for r in out)


def test_pair_adjacency_edge_cases(spark):
    """D,D,I pairs the ADJACENT (D2,I); D1 stays a delete. D,I,I pairs
    (D,I1); I2 stays an insert. A 'U' between D and I breaks the
    adjacency so nothing pairs across it."""
    out = _by_key(decode_db2_cdc_changes(_rows(spark, [
        (1, 10, "D", 1, "a"), (1, 11, "D", 2, "b"), (1, 12, "I", 2, "b2"),
        (2, 20, "D", 3, "c"), (2, 21, "I", 3, "c2"), (2, 22, "I", 4, "d"),
        (3, 30, "D", 5, "e"), (3, 31, "U", 5, "e2"), (3, 32, "I", 6, "f"),
    ]), "t").collect())

    def k(c, i):
        return (f"{c:040x}".upper()[20:], f"{i:040x}".upper()[20:])

    assert out[k(1, 10)]["op"] == "d"
    assert out[k(1, 11)]["op"] == "u"
    assert out[k(1, 11)]["after"] == '{"ID":2,"NAME":"b2"}'
    assert k(1, 12) not in out  # consumed by the pair
    assert out[k(2, 20)]["op"] == "u"
    assert out[k(2, 22)]["op"] == "c"
    assert out[k(3, 30)]["op"] == "d"  # U broke the adjacency
    assert out[k(3, 31)]["op"] == "u"
    assert out[k(3, 32)]["op"] == "c"


def test_unknown_operation_surfaces_as_error(spark):
    df = _rows(spark, [(1, 10, "I", 1, "a"), (1, 11, "X", 2, "b")])
    for decode in (decode_db2_cdc_changes,
                   decode_db2_cdc_changes_stateless):
        out = decode(df, "t").collect()
        assert len(out) == 2  # nothing dropped
        errs = [r for r in out if r["error"] is not None]
        assert len(errs) == 1
        assert "unknown IBMSNAP_OPERATION X" in errs[0]["error"]
        assert errs[0]["op"] is None


def test_before_image_prefix_columns(spark):
    """BEFORE_IMG_PREFIX registrations ship the before image as
    prefixed columns on the SAME 'U' row; decode splits them out and
    un-prefixes the names. A data column that merely starts with the
    prefix letter (no unprefixed twin) stays in the after image."""
    schema = T.StructType([
        T.StructField("IBMSNAP_COMMITSEQ", T.BinaryType()),
        T.StructField("IBMSNAP_INTENTSEQ", T.BinaryType()),
        T.StructField("IBMSNAP_OPERATION", T.StringType()),
        T.StructField("ID", T.LongType()),
        T.StructField("NAME", T.StringType()),
        T.StructField("XNAME", T.StringType()),   # before image of NAME
        T.StructField("XRAY", T.StringType()),    # plain data column
    ])
    df = spark.createDataFrame(
        [(_seq(1), _seq(10), "U", 1, "anne", "ann", "r1")], schema)
    for decode in (decode_db2_cdc_changes,
                   decode_db2_cdc_changes_stateless):
        (r,) = decode(df, "t").collect()
        assert r["op"] == "u"
        assert r["after"] == '{"ID":1,"NAME":"anne","XRAY":"r1"}'
        assert r["before"] == '{"NAME":"ann"}'
        assert r["error"] is None


def test_stateless_decode_single_u_row_mode(spark):
    """CHG_UPD_TO_DEL_INS='N' streams decode as a plain projection —
    no grouping state; without before-image columns the 'U' before is
    null (the registration did not capture it)."""
    out = _by_key(decode_db2_cdc_changes_stateless(_rows(spark, [
        (1, 10, "I", 1, "a"), (2, 20, "U", 1, "a2"),
        (3, 30, "D", 1, "a2"),
    ]), "t").collect())
    ops = sorted((r["op"]) for r in out.values())
    assert ops == ["c", "d", "u"]
    u = next(r for r in out.values() if r["op"] == "u")
    assert u["before"] is None and u["after"] == '{"ID":1,"NAME":"a2"}'
    d = next(r for r in out.values() if r["op"] == "d")
    assert d["before"] == '{"ID":1,"NAME":"a2"}' and d["after"] is None


def test_pair_del_ins_false_matches_stateless(spark):
    df = _rows(spark, [
        (1, 10, "I", 1, "a"), (2, 20, "D", 1, "a"), (2, 21, "I", 1, "b"),
    ])
    batch = sorted(map(tuple, decode_db2_cdc_changes(
        df, "t", pair_del_ins=False).collect()))
    stateless = sorted(map(tuple, decode_db2_cdc_changes_stateless(
        df, "t").collect()))
    assert batch == stateless
    assert [r[3] for r in batch] == ["c", "d", "c"]  # pair NOT collapsed


def test_lsn_hex_is_fixed_width_ordered(spark):
    """COMMITSEQ hex is 20 chars and lexicographic == numeric — the
    string-comparison cursoring the poll query relies on."""
    out = decode_db2_cdc_changes(_rows(spark, [
        (9, 1, "I", 1, "a"), (255, 2, "I", 2, "b"), (4096, 3, "I", 3, "c"),
    ]), "t").collect()
    lsns = sorted(r["lsn"] for r in out)
    assert lsns == ["00000000000000000009", "000000000000000000FF",
                    "00000000000000001000"]
    assert all(len(x) == 20 for x in lsns)


# ------------------------------------------------------- assembly e2e

def test_assembly_db2_cdc_source_e2e(spark, tmp_path):
    """Config-driven: debezium.source.type=db2-cdc streams a CD-table
    parquet export through the stateless decode into the raw envelope
    shape, with unknown-op rows riding the dead-letter routing."""
    from debezium_server_spark.assembly import build_source
    from debezium_server_spark.config import PipelineConfig

    cd = spark.createDataFrame(
        [(_seq(1), _seq(10), "I", 1, "ann"),
         (_seq(2), _seq(20), "U", 1, "anne"),
         (_seq(3), _seq(30), "Q", 2, "bad")], _SCHEMA)
    path = str(tmp_path / "cd_export")
    cd.write.parquet(path)

    cfg = PipelineConfig({
        "debezium.source.type": "db2-cdc",
        "debezium.source.path": path,
        "debezium.source.db2.destination": "db2.APPO.ORDERS",
        "debezium.source.dead.letter.destination": "dlq",
    })
    stream = build_source(spark, cfg)
    assert stream.isStreaming
    out_dir = str(tmp_path / "out")
    (stream.writeStream.format("parquet")
     .option("path", out_dir)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True).start().awaitTermination(120))
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 3
    good = [r for r in rows if r["destination"] == "db2.APPO.ORDERS"]
    dead = [r for r in rows if r["destination"] == "dlq"]
    assert len(good) == 2 and len(dead) == 1
    assert "unknown IBMSNAP_OPERATION" in dead[0]["value"]
    import json
    vals = sorted(json.loads(r["value"])["op"] for r in good)
    assert vals == ["c", "u"]


# ------------------------------------------------- encoder-twin fuzz

_FUZZ_SCHEMA = T.StructType([
    T.StructField("IBMSNAP_COMMITSEQ", T.BinaryType()),
    T.StructField("IBMSNAP_INTENTSEQ", T.BinaryType()),
    T.StructField("IBMSNAP_OPERATION", T.StringType()),
    T.StructField("ID", T.LongType()),
    T.StructField("NAME", T.StringType()),
    T.StructField("XID", T.LongType()),
    T.StructField("XNAME", T.StringType()),
])

_NAME_POOL = ["ann", "bob", "naïve", "東京", 'qu"ote', "back\\slash",
              "tab\tchar", "new\nline", "Ωmega", "o'hara"]


def _fuzz_stream(seed: int, n_tx: int):
    """Encoder twin: emit a random CD-row stream (pair-mode
    registration with occasional mixed single-'U' rows and injected
    unknown opcodes) AND the exact envelopes the decode contract
    documents for it. Semantic 'delete' is never immediately followed
    by semantic 'insert' within a transaction — in pair mode that
    adjacency IS an update by definition (the documented
    CHG_UPD_TO_DEL_INS classification), so a generator that emitted it
    would be describing an update while expecting two changes."""
    import json
    import random

    rng = random.Random(seed)

    def jrow(rid, name):
        return json.dumps({"ID": rid, "NAME": name},
                          separators=(",", ":"), ensure_ascii=False)

    rows, expected = [], {}
    iseq = 100
    for tx in range(1, n_tx + 1):
        commit = tx * 1000
        lsn = "%020X" % commit
        prev = None
        for _ in range(rng.randint(1, 6)):
            ops = ["ins", "del", "upd_pair", "upd_single", "unknown"]
            if prev == "del":
                ops.remove("ins")
            op = rng.choices(ops, weights=[4, 2, 4, 2, 1][:len(ops)]
                             if prev != "del" else [2, 4, 2, 1])[0]
            prev = op
            rid = rng.randint(1, 50)
            name = rng.choice(_NAME_POOL)
            key = (lsn, "%020X" % iseq)
            if op == "ins":
                rows.append((commit, iseq, "I", rid, name, None, None))
                expected[key] = ("c", None, jrow(rid, name), None)
                iseq += 1
            elif op == "del":
                rows.append((commit, iseq, "D", rid, name, None, None))
                expected[key] = ("d", jrow(rid, name), None, None)
                iseq += 1
            elif op == "upd_pair":
                new_name = rng.choice(_NAME_POOL)
                rows.append((commit, iseq, "D", rid, name, None, None))
                rows.append((commit, iseq + 1, "I", rid, new_name,
                             None, None))
                expected[key] = ("u", jrow(rid, name),
                                 jrow(rid, new_name), None)
                iseq += 2
            elif op == "upd_single":
                old_name = rng.choice(_NAME_POOL)
                rows.append((commit, iseq, "U", rid, name, rid, old_name))
                expected[key] = ("u", jrow(rid, old_name),
                                 jrow(rid, name), None)
                iseq += 1
            else:  # unknown opcode quarantine
                bad = rng.choice(["X", "Z", "?"])
                rows.append((commit, iseq, bad, rid, name, None, None))
                expected[key] = (None, None, None,
                                 f"unknown IBMSNAP_OPERATION {bad}")
                iseq += 1
    return rows, expected


@pytest.mark.parametrize("seed,n_tx", [(80801, 400), (80802, 400)])
def test_fuzz_cd_stream_decode_matches_encoder_twin(spark, seed, n_tx):
    """Generative coverage for the sixth capture mechanism (the
    logminer/MariaDB fuzz discipline): hundreds of random transactions
    through the pair-reconstruction batch decode must reproduce the
    encoder twin's envelopes EXACTLY — op, before/after JSON (unicode,
    quotes, escapes), the D row's seqval on pairs, unknown-opcode
    error rows surfacing (never dropping)."""
    rows, expected = _fuzz_stream(seed, n_tx)

    def _b(n):
        return bytearray(n.to_bytes(10, "big"))

    df = spark.createDataFrame(
        [(_b(c), _b(i), op, rid, name, xid, xname)
         for c, i, op, rid, name, xid, xname in rows], _FUZZ_SCHEMA)
    out = decode_db2_cdc_changes(df, "db2.APPO.FUZZ").collect()
    got = {(r["lsn"], r["seqval"]):
           (r["op"], r["before"], r["after"], r["error"]) for r in out}
    assert len(out) == len(got), "duplicate (lsn, seqval) in decode"
    missing = set(expected) - set(got)
    extra = set(got) - set(expected)
    assert not missing and not extra, (sorted(missing)[:3],
                                       sorted(extra)[:3])
    for key in expected:
        assert got[key] == expected[key], (key, got[key], expected[key])

"""Scale-up fixture generator for the scaling-curve harness.

Tiles `/root/testdata/sf0.1` into K self-contained key-shifted shards
so wall-time-vs-SF slopes can be measured beyond the driver-provided
scale factors (the driver generates sf0.001/0.01/0.1 only). Run:

    python tools/make_scale_fixtures.py 5  /tmp/scaling/sf0.5
    python tools/make_scale_fixtures.py 10 /tmp/scaling/sf1

Design — each copy is an INDEPENDENT shard, which is how a real corpus
grows (more users/docs/orders, not longer ones):

- Every key and FK column is offset by `copy * stride` with stride =
  global max key + 1, so joins stay shard-confined and per-key join
  fan-in, group cardinality per key, and filter selectivities are
  IDENTICAL to sf0.1. `nation`/`region` (bounded dims) are not tiled.
- Document text is token-tagged per copy (`word` -> `wordxC`, C>0):
  a token-wise bijection, so WITHIN-shard near-dup structure (minhash,
  simhash, shingle Jaccard, exact spans) is preserved exactly while
  CROSS-shard Jaccard drops to 0 — candidate-pair counts grow ~K, not
  ~K^2. An untagged tile would put every doc in a K-way exact-dup
  cluster and poison the dedup slope with quadratic pair inflation
  that no real corpus exhibits.
- Embedding vectors are dimension-ROTATED per copy (rot = 7*C mod 64):
  a permutation applied to both sides preserves within-shard cosine
  bit-exactly and randomizes cross-shard cosine, for the same reason.
- Timestamps are NOT shifted: K shards in the same time range model
  K-fold event density, so window/sessionize/watermark state per hour
  scales with SF the way a larger deployment's would.

Perf-harness only: the driver's sf* trees stay the oracle-checked
ground truth; these trees exist to measure slopes, not correctness.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: table -> (key/FK columns to offset by their own table-family stride)
#: stride family keys them so e.g. o_custkey and c_custkey shift equally.
FAMILIES = {
    "custkey": ["customer.c_custkey", "orders.o_custkey"],
    "orderkey": ["orders.o_orderkey", "lineitem.l_orderkey"],
    "partkey": ["part.p_partkey", "lineitem.l_partkey"],
    "suppkey": ["supplier.s_suppkey", "lineitem.l_suppkey"],
    "doc_id": ["documents.doc_id"],
    "vec_id": ["embeddings.vec_id"],
    "event_id": ["events.event_id"],
    "user_id": ["events.user_id"],
}


def strides(con) -> dict[str, int]:
    out = {}
    for fam, cols in FAMILIES.items():
        mx = 0
        for qual in cols:
            t, c = qual.split(".")
            mx = max(mx, con.sql(
                f"SELECT max({c}) FROM '{SRC}/{t}.parquet'").fetchone()[0])
        out[fam] = int(mx) + 1
    return out


def copy_select(table: str, c: int, st: dict[str, int]) -> str:
    """SELECT producing copy `c` of `table` (copy 0 = verbatim)."""
    off = {fam: c * s for fam, s in st.items()}
    if table == "customer":
        return (f"SELECT c_custkey + {off['custkey']} AS c_custkey, c_name, "
                f"c_nationkey, c_acctbal, c_mktsegment "
                f"FROM '{SRC}/customer.parquet'")
    if table == "supplier":
        return (f"SELECT s_suppkey + {off['suppkey']} AS s_suppkey, s_name, "
                f"s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'")
    if table == "part":
        return (f"SELECT p_partkey + {off['partkey']} AS p_partkey, p_name, "
                f"p_brand, p_type, p_size, p_retailprice "
                f"FROM '{SRC}/part.parquet'")
    if table == "orders":
        return (f"SELECT o_orderkey + {off['orderkey']} AS o_orderkey, "
                f"o_custkey + {off['custkey']} AS o_custkey, o_orderstatus, "
                f"o_totalprice, o_orderdate, o_orderpriority "
                f"FROM '{SRC}/orders.parquet'")
    if table == "lineitem":
        return (f"SELECT l_orderkey + {off['orderkey']} AS l_orderkey, "
                f"l_partkey + {off['partkey']} AS l_partkey, "
                f"l_suppkey + {off['suppkey']} AS l_suppkey, l_linenumber, "
                f"l_quantity, l_extendedprice, l_discount, l_tax, "
                f"l_returnflag, l_linestatus, l_shipdate "
                f"FROM '{SRC}/lineitem.parquet'")
    if table == "events":
        return (f"SELECT event_id + {off['event_id']} AS event_id, ts, "
                f"user_id + {off['user_id']} AS user_id, event_type, value, "
                f"props FROM '{SRC}/events.parquet'")
    if table == "documents":
        if c == 0:
            return f"SELECT * FROM '{SRC}/documents.parquet'"
        # token-wise tag: whitespace-tokenizer-visible, lowercase-stable
        txt = ("array_to_string(list_transform(string_split(text, ' '), "
               f"w -> w || 'x{c}'), ' ')")
        return (f"SELECT doc_id + {off['doc_id']} AS doc_id, {txt} AS text, "
                f"lang, source, length({txt}) AS n_chars "
                f"FROM '{SRC}/documents.parquet'")
    if table == "embeddings":
        if c == 0:
            return f"SELECT * FROM '{SRC}/embeddings.parquet'"
        rot = (7 * c) % 64
        emb = (f"list_transform(range(1, len(embedding) + 1), "
               f"i -> embedding[((i - 1 + {rot}) % len(embedding)) + 1])")
        return (f"SELECT vec_id + {off['vec_id']} AS vec_id, "
                f"CAST({emb} AS FLOAT[]) AS embedding, label "
                f"FROM '{SRC}/embeddings.parquet'")
    raise ValueError(table)


def main() -> int:
    k = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    st = strides(con)
    for t in ("nation", "region"):  # bounded dims: never tiled
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{out}/{t}.parquet' (FORMAT PARQUET)")
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        union = " UNION ALL ".join(copy_select(t, c, st) for c in range(k))
        con.sql(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Self-check harness mimicking the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle at the given
sf_dir, compares row count, column names, dtypes, and sorted values.
Strict by design — stricter than the driver, so green here ⇒ green there.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_spark.plans.catalog import CATALOG, TABLES  # noqa: E402
from debezium_server_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    problems = []
    if len(s) != len(d):
        problems.append(f"rowcount spark={len(s)} duck={len(d)}")
    if sorted(s.columns) != sorted(d.columns):
        problems.append(f"columns spark={sorted(s.columns)} duck={sorted(d.columns)}")
        return problems
    s, d = normalize(s), normalize(d)
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            problems.append(f"dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == "f":
                eq = np.isclose(sv.fillna(np.nan), dv.fillna(np.nan), rtol=0, atol=0, equal_nan=True)
            else:
                eq = (sv.astype(str).fillna("∅") == dv.astype(str).fillna("∅"))
            if not eq.all():
                i = int(np.argmin(np.asarray(eq)))
                problems.append(
                    f"values[{c}] first diff at row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    failures = 0
    for name, qd in CATALOG.items():
        if only and name not in only:
            continue
        try:
            sdf = qd.spark_fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if qd.oracle is None:
            print(f"SKIP  {name}: no oracle (rows-only), rows={len(sdf)}")
            continue
        try:
            ddf = con.sql(qd.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} rows):")
            for p in problems[:6]:
                print(f"      - {p}")
        else:
            print(f"OK    {name} ({len(sdf)} rows)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

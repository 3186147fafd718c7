"""Dump `.explain("formatted")` for named catalog entries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt. Streaming replay entries execute the
replay as a side effect of building the DataFrame (their returned frame
is the collected memory table); the dumped plan is the post-replay
frame's plan, which is what the entry's declared output computes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402
from debezium_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        df = CATALOG[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()

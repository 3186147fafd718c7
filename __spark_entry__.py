"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every operator from SURVEY.md §2 (CDC pipeline
surface, relational surface, LLM-data-pipeline extensions) as
(spark, sf_dir) -> DataFrame callables; `oracle_sql()` provides the
DuckDB-equivalent SQL for each (column names and dtypes aligned for the
driver's order-insensitive value-hash). Implementations live in
debezium_server_spark/plans/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402

FLAGSHIP = "q5_local_supplier_volume"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG[FLAGSHIP].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark_fn for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}

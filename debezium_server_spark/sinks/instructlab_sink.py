"""InstructLab taxonomy sink (reference: InstructLabSinkConsumer.java,
481 LoC + QnaFile).

Re-expressed behaviors:
- events routed to taxonomy files by destination regex (:106-124),
- question/answer/context extracted from value fields or headers
  (:83-98,125-133),
- events with empty question or answer are skipped (:126-134),
- grouped append to per-taxonomy `qna.yml` files.

The extraction/filter/grouping runs as DataFrame algebra; only the final
tiny q/a rows are collected to write YAML (the reference's files are
curated training seeds — small by design; the heavy filtering stays
distributed)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.sinks.base import BaseSink, register_sink


@dataclass
class TaxonomyRoute:
    pattern: str  # destination regex
    path: str  # taxonomy dir (qna.yml appended)
    question_expr: str = "value.after.question"
    answer_expr: str = "value.after.answer"
    context_expr: str | None = "value.after.context"


@register_sink
class InstructLabSink(BaseSink):
    name = "instructlab"
    tombstone_support = False

    def __init__(self, root_path: str, routes: list[TaxonomyRoute] | None = None,
                 **kwargs: Any):
        super().__init__(**kwargs)
        self.root_path = root_path
        self.routes = routes or []

    def extract(self, df: DataFrame, route: TaxonomyRoute) -> DataFrame:
        picked = df.filter(F.col("destination").rlike(route.pattern)).select(
            F.expr(route.question_expr).alias("question"),
            F.expr(route.answer_expr).alias("answer"),
            (F.expr(route.context_expr) if route.context_expr else F.lit(None)).alias("context"),
        )
        # skip empty question/answer (:126-134)
        return picked.filter(
            F.col("question").isNotNull() & (F.trim("question") != "")
            & F.col("answer").isNotNull() & (F.trim("answer") != "")
        )

    #: qna.yml is a curated seed file, not a data lake — refuse batches
    #: that would collect an unbounded result to the driver.
    max_rows_per_epoch = 10_000

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        import yaml

        for route in self.routes:
            picked = self.extract(df, route)
            rows = picked.limit(self.max_rows_per_epoch + 1).collect()
            if len(rows) > self.max_rows_per_epoch:
                raise ValueError(
                    f"instructlab route {route.path!r}: epoch {epoch_id} matched "
                    f"more than {self.max_rows_per_epoch} rows; qna.yml routes "
                    "must be selective — narrow the destination pattern"
                )
            if not rows:
                continue
            entries = [
                {
                    "question": r["question"],
                    "answer": r["answer"],
                    **({"context": r["context"]} if r["context"] else {}),
                }
                for r in rows
            ]
            out_dir = os.path.join(self.root_path, route.path)
            os.makedirs(out_dir, exist_ok=True)
            qna = os.path.join(out_dir, "qna.yml")
            existing = []
            if os.path.exists(qna):
                with open(qna) as f:
                    existing = (yaml.safe_load(f) or {}).get("seed_examples", [])
            with open(qna, "w") as f:
                yaml.safe_dump(
                    {"version": 1, "seed_examples": existing + entries}, f, sort_keys=False
                )

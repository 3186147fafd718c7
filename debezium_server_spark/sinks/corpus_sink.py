"""Streaming corpus-ingest sink — the LLM-data-pipeline composition of
the engine's curation operators, run per micro-batch:

    changelog batch → quality gate (linear classifier, map-only)
                    → incremental near-dup filter vs the PERSISTED
                      MinHash band index (history never re-hashed)
                    → append survivors to the corpus table
                    → append survivors' bands to the index

This is the steady-state shape of corpus maintenance at 100 TB: every
stage is per-batch work proportional to the increment — the corpus and
index only ever APPEND, and the only read of existing state is the hash
semi-join against the band index (pruned to the band-key columns).

Epoch idempotence follows the repo's marker discipline: a committed
epoch writes `_epoch_<n>` atomically AFTER both appends; a replayed
epoch whose marker exists is skipped, and a crash between append and
marker re-appends — duplicates are then removed by the very dedup pass
the sink implements (the next batch's index contains both copies'
identical bands, and readers dedup on doc_id), documented rather than
hidden.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_spark.operators.dedup import minhash_bands
from debezium_server_spark.operators.text import quality_classifier
from debezium_server_spark.sinks.base import BaseSink, register_sink


@register_sink
class CorpusIngestSink(BaseSink):
    """See module docstring. Expects the changelog envelope with
    `value.after.doc_id` / `value.after.text`."""

    name = "corpus-ingest"
    tombstone_support = False

    def __init__(
        self,
        root_path: str,
        min_logit: int = 0,
        shingle_k: int = 3,
        **kwargs: Any,
    ):
        super().__init__(**kwargs)
        self.root_path = root_path
        self.min_logit = min_logit
        self.shingle_k = shingle_k
        self.corpus_path = os.path.join(root_path, "corpus")
        self.index_path = os.path.join(root_path, "band_index")

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.root_path, f"_epoch_{epoch_id}")

    def _read_index(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.index_path)
        except Exception:
            return None

    def read_corpus(self, spark: SparkSession) -> DataFrame | None:
        try:
            # doc_id-dedup on read: a crash between append and marker can
            # leave one batch double-appended (see module docstring)
            return spark.read.parquet(self.corpus_path).dropDuplicates(["doc_id"])
        except Exception:
            return None

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        if os.path.exists(self._marker(epoch_id)):
            return  # committed replay: no-op
        spark = df.sparkSession
        docs = (
            df.filter(F.col("value").isNotNull())
            .select(
                F.col("value.after.doc_id").alias("doc_id"),
                F.col("value.after.text").alias("text"),
            )
            .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        )
        # 1. quality gate — map-only integer logit
        keep_ids = quality_classifier(docs).filter(
            F.col("logit_u") >= self.min_logit
        ).select("doc_id")
        quality = docs.join(keep_ids, "doc_id", "left_semi")
        # 2. near-dup filter: first against the persisted index, then
        #    within the batch itself (keep lowest doc_id per band clash).
        #    Bands are a pure function of the document, so the batch is
        #    MINHASHED EXACTLY ONCE: the index-dedup input, the
        #    intra-batch clash input, and the appended index rows are
        #    all id-joins against the same lazily-checkpointed band
        #    frame (was 3 independent tokenize+md5+minhash subtrees per
        #    epoch — guide §1.2, don't recompute what you already have).
        index = self._read_index(spark)
        q_bands = minhash_bands(quality, shingle_k=self.shingle_k).localCheckpoint(
            eager=False
        )
        if index is not None:
            dup_ids = (
                q_bands.join(
                    index.select("band_id", "band_hash").distinct(),
                    ["band_id", "band_hash"],
                    "left_semi",
                )
                .select("doc_id")
                .distinct()
            )
            quality = quality.join(dup_ids, "doc_id", "left_anti")
            batch_bands = q_bands.join(dup_ids, "doc_id", "left_anti")
        else:
            batch_bands = q_bands
        first_per_band = batch_bands.groupBy("band_id", "band_hash").agg(
            F.min("doc_id").alias("keep_id")
        )
        clash = (
            batch_bands.join(first_per_band, ["band_id", "band_hash"])
            .filter(F.col("doc_id") != F.col("keep_id"))
            .select("doc_id")
            .distinct()
        )
        # Lazy: the corpus append below is the first consumer and
        # materializes survivors inside its own write job; the band
        # append then reads the persisted blocks — one driver barrier
        # fewer per epoch than the eager form.
        survivors = quality.join(clash, "doc_id", "left_anti").localCheckpoint(
            eager=False
        )
        # 3+4. append corpus rows and their bands, then commit the marker
        survivors.withColumn("__epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(self.corpus_path)
        batch_bands.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        ).write.mode("append").parquet(self.index_path)
        tmp = self._marker(epoch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.replace(tmp, self._marker(epoch_id))

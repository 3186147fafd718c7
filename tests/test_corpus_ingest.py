"""Streaming corpus ingest: quality gate + cross-batch incremental dedup
against the persisted band index + append-only corpus, epoch-idempotent."""

import json

from debezium_server_spark.sinks import get_sink

GOOD = ("the data pipeline processes a stream of table rows and in the end "
        "writes results to a sink of high quality and value for all users")


def _ev(doc_id, text, lsn):
    return {"destination": "corpus.docs", "key": {"doc_id": doc_id},
            "value": {"op": "c", "before": None,
                      "after": {"doc_id": doc_id, "text": text},
                      "source": {"lsn": lsn}, "ts_ms": lsn},
            "headers": [], "partition": 0}


SCHEMA = ("destination string, key struct<doc_id:long>, "
          "value struct<op:string, before struct<doc_id:long,text:string>, "
          "after struct<doc_id:long,text:string>, source struct<lsn:long>, ts_ms long>, "
          "headers array<struct<key:string,value:string>>, partition int")


def test_corpus_ingest_quality_dedup_and_replay(spark, tmp_path):
    sink = get_sink("corpus-ingest", root_path=str(tmp_path / "c"), min_logit=0)

    low_quality = "%%% ### !!! @@@ $$$ " * 10  # punct-heavy gibberish
    batch1 = spark.createDataFrame(
        [_ev(1, GOOD, 1),
         _ev(2, low_quality.strip(), 2),
         _ev(3, GOOD + " with a small tail difference", 3)],
        SCHEMA,
    )
    sink(batch1, epoch_id=0)
    c1 = {r["doc_id"] for r in sink.read_corpus(spark).collect()}
    assert 1 in c1          # good doc kept
    assert 2 not in c1      # failed the quality gate
    # doc 3 is a near-dup of doc 1 WITHIN the batch → dropped
    assert c1 == {1}

    # batch 2: near-dup of an ALREADY-INGESTED doc + one novel doc
    batch2 = spark.createDataFrame(
        [_ev(4, GOOD, 4),  # exact dup of corpus doc 1 → index filters it
         _ev(5, "completely novel content about engines shuffles and joins "
                "in the modern data stack for training and evaluation", 5)],
        SCHEMA,
    )
    sink(batch2, epoch_id=1)
    c2 = {r["doc_id"] for r in sink.read_corpus(spark).collect()}
    assert c2 == {1, 5}

    # exact replay of epoch 1 is a committed no-op
    sink(batch2, epoch_id=1)
    assert {r["doc_id"] for r in sink.read_corpus(spark).collect()} == {1, 5}


def test_band_index_rows_equal_survivor_bands(spark, tmp_path):
    """The sink minhashes each batch once and derives the appended index
    rows by id-joins against that single band frame — the persisted
    index must therefore equal minhash_bands() recomputed over exactly
    the persisted corpus docs (bands are a pure function of the text)."""
    from debezium_server_spark.operators.dedup import minhash_bands

    sink = get_sink("corpus-ingest", root_path=str(tmp_path / "c"), min_logit=0)
    texts = {
        1: GOOD,
        3: GOOD + " with a small tail difference",
        5: ("completely novel content about engines shuffles and joins "
            "in the modern data stack for training and evaluation"),
        7: ("another entirely distinct document describing watermarks "
            "state stores checkpoints and recovery for streaming systems"),
    }
    sink(spark.createDataFrame(
        [_ev(1, texts[1], 1), _ev(3, texts[3], 2)], SCHEMA), epoch_id=0)
    sink(spark.createDataFrame(
        [_ev(5, texts[5], 3), _ev(7, texts[7], 4)], SCHEMA), epoch_id=1)

    corpus = sink.read_corpus(spark).select("doc_id", "text")
    expected = sorted(
        tuple(r) for r in minhash_bands(corpus).collect())
    actual = sorted(
        tuple(r) for r in
        spark.read.parquet(str(tmp_path / "c" / "band_index")).collect())
    assert actual == expected

"""JSONL document source: batch + streaming read with quarantine,
round-trip through the partitioned writer (sources/jsonl.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from eventsgateway_spark.sources.jsonl import (
    read_documents_jsonl,
    stream_documents_jsonl,
    write_documents_jsonl,
)

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "es", "source": "s2"},  # n_chars omitted
]
BAD_LINES = [
    "{not json at all",  # malformed
    json.dumps({"text": "no id", "lang": "en"}),  # parses, missing doc_id
    json.dumps({"doc_id": 3, "lang": "en"}),  # parses, missing text
]


def _write_fixture(d: str) -> str:
    path = os.path.join(d, "shard-000.jsonl")
    with open(path, "w") as f:
        for row in GOOD:
            f.write(json.dumps(row) + "\n")
        for line in BAD_LINES:
            f.write(line + "\n")
    return str(d)


def test_batch_read_splits_valid_and_quarantine(spark, tmp_path):
    src = _write_fixture(tmp_path)
    docs, quarantine = read_documents_jsonl(spark, src)

    got = {r.doc_id: r for r in docs.collect()}
    assert set(got) == {1, 2}
    assert got[1].n_chars == 10
    assert got[2].n_chars == len("gamma")  # derived when omitted
    # producer-supplied n_chars computed on RAW text is overridden by
    # the post-normalization length (ADVICE r6)
    assert [f.name for f in docs.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]

    q = [r.raw_line for r in quarantine.collect()]
    # VERBATIM raw lines — including the ones that parse as JSON but
    # miss doc_id/text (a dead-letter reprocessor needs the original
    # bytes, extra fields and all, not a lossy re-serialization)
    assert sorted(q) == sorted(BAD_LINES)


def test_jsonl_feeds_corpus_queries(spark, tmp_path):
    """The parsed frame is documents-shaped: a corpus operator runs on
    it unmodified (schema contract, not just column names)."""
    src = _write_fixture(tmp_path)
    docs, _ = read_documents_jsonl(spark, src)
    from eventsgateway_spark.functions.text import tokens

    out = docs.select("doc_id", F.size(tokens("text")).alias("n_tok")).collect()
    assert {r.doc_id: r.n_tok for r in out} == {1: 2, 2: 1}


def test_whitespace_normalized_at_boundary(spark, tmp_path):
    """Newline/tab-separated corpus text (normal in scraped dumps) is
    collapsed to the single-space form the token operators' oracle
    contract requires — at ingestion, not in every operator."""
    from eventsgateway_spark.functions.text import tokens

    line = json.dumps(
        {"doc_id": 9, "text": "alpha\nbeta\tgamma  delta", "lang": "en",
         "source": "s", "n_chars": 24}  # producer count on the RAW text
    )
    p = tmp_path / "ws.jsonl"
    p.write_text(line + "\n")
    docs, q = read_documents_jsonl(spark, str(p))
    assert q.count() == 0
    row = docs.select(
        "text", "n_chars", F.size(tokens("text")).alias("n")
    ).collect()[0]
    assert row.text == "alpha beta gamma delta" and row.n == 4
    # n_chars always agrees with the normalized text (ADVICE r6), never
    # with the producer's pre-normalization count
    assert row.n_chars == len("alpha beta gamma delta")


def test_roundtrip_partitioned_writer(spark, tmp_path):
    os.makedirs(tmp_path / "in", exist_ok=True)
    src = _write_fixture(str(tmp_path / "in"))
    docs, _ = read_documents_jsonl(spark, src)
    out_dir = str(tmp_path / "out")
    write_documents_jsonl(docs.withColumn("split", F.lit("train")), out_dir, by="split")
    # partition directory layout + lossless content round-trip
    assert os.path.isdir(os.path.join(out_dir, "split=train"))
    back, back_q = read_documents_jsonl(spark, os.path.join(out_dir, "split=train"))
    assert back_q.count() == 0
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "alpha beta"), (2, "gamma"),
    ]


def test_jsonl_landing_zone_feeds_streaming_corpus_prep(spark, tmp_path):
    """End-to-end landing zone: JSONL shards dropped in a directory →
    streaming read (malformed lines quarantined at parse) → full
    corpus-prep pipeline (curate → dedup screen) → routed sinks. This
    is the raw-files-to-training-corpus path a user actually runs."""
    from eventsgateway_spark.streaming.corpus_prep import corpus_prep_stream

    corpus_text = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while a second clause keeps the token count over the rule floor "
        "of twenty for this corpus document"
    )
    good = (
        "the engine routes a perfectly reasonable document of more than "
        "twenty tokens and it contains the a of and to is in it stopwords "
        "plus plenty of distinct words overall"
    )
    src_dir = tmp_path / "landing"
    os.makedirs(src_dir)
    with open(src_dir / "shard-000.jsonl", "w") as f:
        for row in [
            {"doc_id": 100, "text": good, "lang": "en", "source": "s1"},
            {"doc_id": 102, "text": corpus_text, "lang": "en", "source": "s1"},
        ]:
            f.write(json.dumps(row) + "\n")
        f.write("{broken line never reaches the pipeline\n")

    corpus = spark.createDataFrame([(0, corpus_text)], "doc_id long, text string")
    q = corpus_prep_stream(
        stream_documents_jsonl(spark, str(src_dir)).select("doc_id", "text"),
        corpus,
        out_root=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    kept = spark.read.parquet(str(tmp_path / "out/kept")).collect()
    dups = spark.read.parquet(str(tmp_path / "out/dups")).collect()
    assert {r.doc_id for r in kept} == {100}
    assert {r.doc_id for r in dups} == {102}
    assert dups[0].matched_corpus_id == 0 and dups[0].jaccard == 1.0


def test_stream_read_micro_batches(spark, tmp_path):
    src_dir = tmp_path / "stream-in"
    os.makedirs(src_dir)
    _write_fixture(str(src_dir))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_documents_jsonl(spark, str(src_dir), max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(sink)
    assert got.count() == 2  # the 3 bad lines never reach the sink
    assert set(got.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

"""JSONL document source — the arrival format of corpus pipelines.

The reference's ingest surface is event-shaped (gRPC → Avro → Kafka);
the [EXT] corpus operators (q24-q75) instead consume *documents*, and
in the wild those arrive as line-delimited JSON (one doc per line:
Common-Crawl-style dumps, labeling-tool exports, scraped shards).
This module is the missing edge: JSONL on disk → the same
``documents``-shaped DataFrame every corpus query reads, batch and
streaming, with malformed lines quarantined instead of dropped.

Scale posture (100 TB of JSONL):
- **Explicit schema, never inference.** ``inferSchema``/sampling runs
  a full extra pass over the input before the real job starts; at
  100 TB that is a second 100 TB scan. The schema here is fixed and
  versioned in code.
- **Text scan + ``from_json``, split once.** A malformed or
  contract-violating line becomes a quarantine row carrying the
  VERBATIM input line (a corrupt-record column can't do that for
  lines that parse but miss required fields) instead of failing the
  job or silently vanishing — the same keep/quarantine contract as
  the event validation filter (operators/transforms.py P1). The split
  is two filters over one scan lineage, not two reads.
- **Line-delimited = splittable.** Plain or per-file-compressed JSONL
  splits by newline into ~``maxPartitionBytes`` tasks. (A single
  giant gzip member is NOT splittable — land .zst/.gz per ~256 MB
  shard upstream; that is a landing-zone contract, not engine code.)
- **Streaming via the file source**: ``maxFilesPerTrigger`` bounds
  micro-batch size; new shards dropped into the directory flow into
  the same query. Exactly-once per file via the source's file index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents table contract (TESTDATA.md) + quarantine column.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

def _parse_lines(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared batch/stream parse: text lines → (documents, quarantine).

    ``from_json`` over the raw text column (instead of the JSON
    reader's PERMISSIVE mode) keeps the ORIGINAL line available for
    every rejected row — including lines that parse as JSON but break
    the contract (missing ``doc_id``/``text``), where a corrupt-record
    column would be null and re-serializing the parsed struct would
    drop the producer's extra fields. Dead-letter reprocessing needs
    the bytes that arrived, not a lossy reconstruction. Still one scan
    lineage, two filters, explicit schema, no inference pass."""
    parsed = raw.select(
        F.col("value").alias("raw_line"),
        F.from_json("value", DOCUMENTS_SCHEMA).alias("d"),
    )
    bad = (
        F.col("d").isNull()
        | F.col("d.doc_id").isNull()
        | F.col("d.text").isNull()
    )
    from eventsgateway_spark.functions.text import normalize_whitespace

    docs = (
        parsed.filter(~bad)
        .select("d.*")
        # real corpus text separates words with newlines/tabs; the
        # engine's token operators split on single spaces (the oracle
        # determinism contract, functions/text.tokens) — normalize at
        # THIS boundary so every downstream operator sees its contract
        .withColumn("text", normalize_whitespace(F.col("text")))
        # n_chars is ALWAYS recomputed from the normalized text
        # (ADVICE r6): a producer-supplied count refers to the raw
        # pre-normalization text, so keeping it would disagree with
        # length(text) for docs containing tabs/newlines
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    quarantine = parsed.filter(bad).select("raw_line")
    return docs, quarantine


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Batch-read a JSONL directory/file → (documents, quarantine).

    ``documents`` carries exactly the fixture ``documents`` schema;
    ``quarantine`` is (raw_line,) — the verbatim input line — for
    every malformed OR contract-violating line (missing doc_id/text:
    null key/payload is corrupt for this contract, same rule as the
    event validator's empty-id check, operators/transforms.py)."""
    return _parse_lines(spark.read.text(path))


def stream_documents_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming JSONL → documents frame (valid rows only; wire the
    quarantine side with ``foreachBatch`` + ``_parse_lines`` when a
    dead-letter sink is needed). Explicit schema, no inference;
    ``maxFilesPerTrigger`` bounds micro-batch size so one bulk drop of
    shards cannot produce an unbounded first batch."""
    raw = (
        spark.readStream.option("maxFilesPerTrigger", str(max_files_per_trigger))
        .text(path)
    )
    docs, _ = _parse_lines(raw)
    return docs


def write_documents_jsonl(
    df: DataFrame, path: str, by: str | None = None, mode: str = "overwrite"
) -> None:
    """Documents → line-delimited JSON, optionally partitioned by a
    routing column (``split`` from q47, ``shard`` from q68): the
    export format labeling tools and trainers ingest. Text columns are
    JSON-escaped by the writer; one doc per line."""
    w = df.write.mode(mode)
    if by:
        w = w.partitionBy(by)
    w.json(path)

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
- **PERMISSIVE + corrupt-record column, split once.** A malformed
  line becomes a quarantine row (raw line preserved) instead of
  failing the job (FAILFAST) or silently vanishing (DROPMALFORMED) —
  the same keep/quarantine contract as the event validation filter
  (operators/transforms.py P1). The split is two filters over one
  scan lineage, not two reads.
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

_CORRUPT = "_corrupt_record"


def _read_schema() -> T.StructType:
    return T.StructType(
        list(DOCUMENTS_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Batch-read a JSONL directory/file → (documents, quarantine).

    ``documents`` carries exactly the fixture ``documents`` schema;
    ``quarantine`` is (raw_line,) for every malformed input line. Both
    come from ONE scan lineage (two filters), and the reader runs
    PERMISSIVE with an explicit schema — no inference pass.

    A line that parses but is missing ``doc_id`` or ``text`` is
    quarantined too (null key/payload is corrupt for this contract,
    same rule as the event validator's empty-id check,
    operators/transforms.py).
    """
    raw = (
        spark.read.schema(_read_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    bad = F.col(_CORRUPT).isNotNull() | F.col("doc_id").isNull() | F.col("text").isNull()
    docs = raw.filter(~bad).select(*[f.name for f in DOCUMENTS_SCHEMA.fields])
    # n_chars is derivable; fill it when the producer omitted it so
    # downstream length-based operators (q27/q47/q67) see the contract
    docs = docs.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )
    quarantine = raw.filter(bad).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*[
            f.name for f in DOCUMENTS_SCHEMA.fields
        ]))).alias("raw_line")
    )
    return docs, quarantine


def stream_documents_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming JSONL → documents frame (valid rows only; wire the
    quarantine side with ``foreachBatch`` + ``read_documents_jsonl``
    semantics when a dead-letter sink is needed). Explicit schema, no
    inference; ``maxFilesPerTrigger`` bounds micro-batch size so one
    bulk drop of shards cannot produce an unbounded first batch."""
    raw = (
        spark.readStream.schema(_read_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )
    bad = F.col(_CORRUPT).isNotNull() | F.col("doc_id").isNull() | F.col("text").isNull()
    return (
        raw.filter(~bad)
        .select(*[f.name for f in DOCUMENTS_SCHEMA.fields])
        .withColumn(
            "n_chars",
            F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
        )
    )


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

"""Streaming near-duplicate dedup against a static corpus.

The production shape for continuous ingestion into a training corpus:
every incoming micro-batch of documents is checked for near-duplicates
(shingle Jaccard, the q30 operator) against the EXISTING corpus without
ever recomputing the corpus side — its shingle inverted index is built
once and reused across batches. Novel documents append to the corpus
sink; near-duplicates are routed to a quarantine sink with their match
evidence (corpus doc, Jaccard), mirroring the ingest path's
valid/quarantine split (operators/transforms.validate).

Executed via ``foreachBatch``: aggregation-over-candidates is not
expressible in pure append-mode streaming, and foreachBatch is Spark's
supported seam for reusing arbitrary batch plans per micro-batch.

Scale posture (100 TB corpus): the per-batch cost is
|batch shingles| joined against the corpus index — an equi-join on the
shingle key, shuffle-partitioned, never all-pairs; the corpus index is
loaded once (at real scale: a bucketed table on `s`, so the per-batch
join co-locates without reshuffling the corpus). State lives in the
index, not the stream — no streaming state at all. The index is
df-capped (doc_shingles' hot-shingle prune) so per-key fan-out is
bounded. New docs admitted to the corpus do NOT update the index
mid-stream (batch-boundary consistency); rebuild or append to the
index on the compaction cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.functions.text import ngrams, tokens
from eventsgateway_spark.queries.ext_dedup import SHINGLE_N, doc_shingles


def batch_shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, s) distinct shingles for an incoming batch — the
    streaming-safe sibling of doc_shingles: no hot-list prune (the cap
    belongs to the corpus side) and no checkpoint (micro-batches are
    small and consumed once)."""
    return docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.explode(F.array_distinct(ngrams(F.col("toks"), n))).alias("s")
    )


def flag_near_dups(
    batch_docs: DataFrame, corpus_sh: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """(doc_id, corpus_id, jaccard) for every batch doc whose shingle
    Jaccard against some corpus doc reaches the threshold."""
    sh_new = batch_shingles(batch_docs)
    sz_new = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_new"))
    corp = corpus_sh.withColumnRenamed("doc_id", "corpus_id")
    sz_corp = corp.groupBy("corpus_id").agg(F.count(F.lit(1)).alias("sz_corp"))
    inter = (
        sh_new.join(corp, "s")
        .groupBy("doc_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sz_new, "doc_id")
        .join(sz_corp, "corpus_id")
        .select(
            "doc_id",
            "corpus_id",
            (
                F.col("inter").cast("double")
                / (F.col("sz_new") + F.col("sz_corp") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def stream_dedup_against_corpus(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    novel_path: str,
    dup_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Route a document stream: near-dups of the corpus → ``dup_path``
    (with best-match evidence), novel docs → ``novel_path``."""
    # Built once, reused by every micro-batch (the whole point).
    corpus_sh = doc_shingles(corpus_docs).localCheckpoint()

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()  # consumed by 2 sinks + the join
        flags = flag_near_dups(batch, corpus_sh, threshold)
        best = flags.groupBy("doc_id").agg(
            F.max(F.struct("jaccard", "corpus_id")).alias("m")
        )
        dups = batch.join(best, "doc_id").select(
            "doc_id",
            "text",
            F.col("m.corpus_id").alias("matched_corpus_id"),
            F.col("m.jaccard").alias("jaccard"),
        )
        novel = batch.join(best.select("doc_id"), "doc_id", "left_anti")
        dups.write.mode("append").parquet(dup_path)
        novel.write.mode("append").parquet(novel_path)

    writer = stream_docs.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

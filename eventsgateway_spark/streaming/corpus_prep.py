"""Streaming corpus-prep pipeline — the serving form of q60's batch
composition: continuously ingest raw documents and route every
micro-batch through curation (PII redaction + quality rules) and
near-dup screening against the static corpus index, landing three
idempotent outputs:

    kept/        curated, novel documents (training-candidate stream)
    quarantine/  failed a quality rule (redacted; reject_reason tagged)
    dups/        near-duplicates of the corpus, with match evidence

All stages are the VERIFIED batch operators (operators/curation.curate,
streaming/near_dup.flag_near_dups) composed inside one ``foreachBatch``
— zero streaming state; the only large object is the durable corpus
index, which is never reshuffled per batch (same posture as
near_dup/ann_lookup). A checkpoint replay rewrites its own batch_id
partition in every sink (idempotent), so at-least-once upstream
delivery converges to exactly-once outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.operators.curation import curate
from eventsgateway_spark.streaming.near_dup import (
    CorpusIndex,
    _idempotent_append,
    build_corpus_index,
    flag_near_dups,
)


def corpus_prep_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame | None,
    out_root: str,
    checkpoint: str,
    threshold: float = 0.5,
    trigger_once: bool = False,
    index: CorpusIndex | None = None,
) -> StreamingQuery:
    """Run the curate → dedup-screen pipeline on a document stream
    (columns ``doc_id``, ``text``); outputs land under
    ``{out_root}/{kept,quarantine,dups}`` partitioned by batch_id."""
    if index is None:
        if corpus_docs is None:
            raise ValueError("need corpus_docs or a prebuilt index")
        index = build_corpus_index(corpus_docs)
    idx = index

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()  # consumed by several sinks
        split = curate(batch)
        kept_all = split.kept.localCheckpoint()
        best = (
            flag_near_dups(kept_all, idx, threshold)
            .groupBy("doc_id")
            .agg(F.max(F.struct("jaccard", "corpus_id")).alias("m"))
            .localCheckpoint()
        )
        dups = kept_all.join(best, "doc_id").select(
            "doc_id",
            "text",
            F.col("m.corpus_id").alias("matched_corpus_id"),
            F.col("m.jaccard").alias("jaccard"),
        )
        kept = kept_all.join(best.select("doc_id"), "doc_id", "left_anti")
        _idempotent_append(kept, batch_id, f"{out_root}/kept")
        _idempotent_append(split.quarantine, batch_id, f"{out_root}/quarantine")
        _idempotent_append(dups, batch_id, f"{out_root}/dups")

    writer = doc_stream.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

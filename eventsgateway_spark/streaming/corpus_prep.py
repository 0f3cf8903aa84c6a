"""Streaming corpus-prep pipeline — the serving form of q60's batch
composition: continuously ingest raw documents and route every
micro-batch through curation (PII redaction + quality rules) and
near-dup screening against the static corpus index, landing three
idempotent outputs:

    kept/         curated, novel, clean documents (training candidates)
    quarantine/   failed a quality rule (redacted; reject_reason tagged)
    dups/         near-duplicates of the corpus, with match evidence
    contaminated/ share a 5-gram with the held-out eval corpus (only
                  when ``eval_grams`` is supplied — q53/q60 semantics)

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


def eval_gram_set(eval_docs: DataFrame) -> DataFrame:
    """Distinct decontamination n-grams of a held-out eval corpus —
    benchmark-sized, so it broadcasts into every batch screen (q53's
    posture). Build once, pass to :func:`corpus_prep_stream`."""
    from eventsgateway_spark.functions.text import ngrams, tokens
    from eventsgateway_spark.queries.ext_text import DECON_N

    return (
        eval_docs.select(
            F.explode(
                F.array_distinct(ngrams(tokens("text"), DECON_N))
            ).alias("g")
        )
        .distinct()
        .localCheckpoint()
    )


def corpus_prep_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame | None,
    out_root: str,
    checkpoint: str,
    threshold: float = 0.5,
    trigger_once: bool = False,
    index: CorpusIndex | None = None,
    eval_grams: DataFrame | None = None,
) -> StreamingQuery:
    """Run the curate → dedup-screen [→ decontaminate] pipeline on a
    document stream (columns ``doc_id``, ``text``); outputs land under
    ``{out_root}/{kept,quarantine,dups[,contaminated]}`` partitioned
    by batch_id."""
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
        if eval_grams is not None:
            from eventsgateway_spark.functions.text import ngrams, tokens
            from eventsgateway_spark.queries.ext_text import DECON_N

            doc_grams = kept.select(
                "doc_id",
                F.explode(
                    F.array_distinct(ngrams(tokens("text"), DECON_N))
                ).alias("g"),
            )
            dirty_ids = (
                doc_grams.join(F.broadcast(eval_grams), "g")
                .select("doc_id")
                .distinct()
                .localCheckpoint()
            )
            contaminated = kept.join(dirty_ids, "doc_id")
            kept = kept.join(dirty_ids, "doc_id", "left_anti")
            _idempotent_append(
                contaminated, batch_id, f"{out_root}/contaminated"
            )
        _idempotent_append(kept, batch_id, f"{out_root}/kept")
        _idempotent_append(split.quarantine, batch_id, f"{out_root}/quarantine")
        _idempotent_append(dups, batch_id, f"{out_root}/dups")

    writer = doc_stream.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

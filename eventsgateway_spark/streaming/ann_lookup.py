"""Streaming ANN lookups against a static IVF index.

The vector sibling of streaming/near_dup.py: a stream of query
embeddings is answered per micro-batch from an IVF index (centroid
cells + cell assignments) built ONCE over the corpus — the
"embed-and-retrieve over a fixed corpus" serving shape. Each batch:
assign probe cells to the queries (broadcast centroids, map-only),
equi-join cell_id against the corpus assignment table, exact-cosine
score, keep top-k per query.

Executed via ``foreachBatch`` (top-k needs a window over candidates,
not expressible in append-mode streaming). Scale posture: the index is
the only large object and it is never reshuffled per batch — at real
scale store the assignment table bucketed by cell_id so the per-batch
candidate join co-locates; query batches are small, so their side of
every join broadcasts. Zero streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from eventsgateway_spark.functions.vectors import dot
from eventsgateway_spark.queries.ext_similarity import (
    IVF_NPROBE,
    ivf_assign_with,
    ivf_centroids,
    ivf_probe_with,
    norm_view,
)


def ann_lookup_batch(
    queries: DataFrame, assign: DataFrame, cents: DataFrame,
    nprobe: int = IVF_NPROBE, topk: int = 3,
) -> DataFrame:
    """(qid, rn, neighbor_id, cos_sim) — top-k corpus neighbors for a
    (vec_id, embedding) query frame, searching only the probed cells."""
    probes = ivf_probe_with(norm_view(queries), cents, nprobe)
    scored = (
        assign.join(F.broadcast(probes), "cell_id")
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("qid", "rn", "neighbor_id", "cos_sim")
    )


def ann_lookup_stream(
    query_stream: DataFrame,
    corpus_emb: DataFrame,
    out_path: str,
    checkpoint: str,
    nprobe: int = IVF_NPROBE,
    topk: int = 3,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Answer a stream of (vec_id, embedding) queries from the corpus
    index; results append to ``out_path``."""
    # Index built once, reused by every micro-batch.
    cents = ivf_centroids(corpus_emb).localCheckpoint()
    assign = ivf_assign_with(norm_view(corpus_emb), cents).localCheckpoint()

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        # batch_id partition + dynamic overwrite: a checkpoint replay
        # rewrites its own partition instead of appending duplicates
        (
            ann_lookup_batch(batch_df, assign, cents, nprobe, topk)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    writer = query_stream.writeStream.foreachBatch(_answer).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

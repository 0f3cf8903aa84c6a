"""Streaming mixture monitor — the streaming form of q75.

A corpus that grows while you train needs its sampling weights kept
current: as new shards of a source land, that source's token mass —
and therefore every source's temperature-scaled weight — shifts. This
module maintains a tiny running per-source totals table across
micro-batches and re-emits the q75 weight table after each one, so a
mixture-aware loader always reads fresh weights.

Shape per micro-batch (the 100 TB story):
- the batch is hash-aggregated to |sources-in-batch| rows (map-side
  combine, one shuffle of per-partition partials);
- the running-totals table is |sources| rows TOTAL — reading,
  merging, and atomically replacing it costs O(|sources|), not
  O(corpus). State lives in the table, not in streaming state (same
  posture as streaming/upsert.py), so a restart resumes from the
  checkpoint with no state-store rebuild.
- weights come from the same integer-exact isqrt/ppm math as batch
  q75 (``ext_sampling.mixture_weights``'s formula on the running
  totals), so a batch rebuild over the full corpus reproduces the
  streaming table bit-for-bit once counts match.

Atomicity: totals/weights are written to a staging directory and
swapped in with an atomic rename, so a concurrent reader never sees a
half-written table (the metrics/serving read path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

TOTALS_DIR = "totals"
WEIGHTS_DIR = "weights"


def _weights_from_totals(totals: DataFrame) -> DataFrame:
    """q75's integer-exact weight math over a (source, n_docs,
    n_tokens) frame — shared formula, running-table input."""
    from pyspark.sql import Window as W

    w = totals.withColumn(
        "isqrt_tok", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
    )
    tot = W.partitionBy()  # |sources| rows only
    return (
        w.withColumn("_tok_total", F.sum("n_tokens").over(tot))
        .withColumn("_w_total", F.sum("isqrt_tok").over(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("(1000000 * n_tokens) div _tok_total").alias("share_ppm"),
            F.expr("(1000000 * isqrt_tok) div greatest(_w_total, 1)").alias(
                "weight_ppm"
            ),
        )
    )


def _swap_in(df: DataFrame, root: str, name: str) -> None:
    """Write small table atomically: staging write + rename swap."""
    final = os.path.join(root, name)
    staging = os.path.join(root, f"_staging_{name}")
    old = os.path.join(root, f"_old_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(staging, final)


def update_mixture_batch(
    spark: SparkSession, batch_df: DataFrame, root: str
) -> None:
    """Merge one micro-batch of documents into the running per-source
    totals and refresh the weight table. Idempotence note: checkpoint
    replay of a batch double-counts tokens (counts are additive, not
    keyed) — route through a keyed upsert (streaming/upsert.py) first
    if the source can replay; with the file source + checkpoint, each
    file is delivered exactly once."""
    from eventsgateway_spark.functions.text import tokens

    batch_totals = batch_df.select("source", "text").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
    )
    totals_path = os.path.join(root, TOTALS_DIR)
    try:
        existing = spark.read.parquet(totals_path)
    except Exception:
        existing = None
    merged = (
        batch_totals
        if existing is None
        else existing.unionByName(batch_totals)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    merged = merged.localCheckpoint()  # sever lineage from the table we replace
    _swap_in(merged, root, TOTALS_DIR)
    _swap_in(_weights_from_totals(merged), root, WEIGHTS_DIR)


def mixture_monitor_stream(
    doc_stream: DataFrame, root: str, checkpoint: str, trigger_once: bool = False
) -> StreamingQuery:
    """Maintain `{root}/totals` and `{root}/weights` from a document
    stream (columns ``source``, ``text``)."""
    writer = doc_stream.writeStream.foreachBatch(
        lambda b, _id: update_mixture_batch(b.sparkSession, b, root)
    ).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

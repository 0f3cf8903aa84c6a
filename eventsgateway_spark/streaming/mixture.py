"""Streaming mixture monitor — the streaming form of q75.

A corpus that grows while you train needs its sampling weights kept
current: as new shards of a source land, that source's token mass —
and therefore every source's temperature-scaled weight — shifts. This
module maintains a tiny running per-source totals table across
micro-batches and re-emits the q75 weight table after each one, so a
mixture-aware loader always reads fresh weights.

Shape per micro-batch (the 100 TB story):
- the batch is hash-aggregated to |sources-in-batch| rows (map-side
  combine, one shuffle of per-partition partials) via the SAME
  ``source_totals`` the batch query uses;
- the running-totals table is |sources| rows TOTAL — reading,
  merging, and atomically publishing it costs O(|sources|), not
  O(corpus). State lives in the table, not in streaming state (same
  posture as streaming/upsert.py), so a restart resumes from the
  checkpoint with no state-store rebuild;
- weights come from ``ext_sampling.weights_from_totals`` — the ONE
  copy of the q75 integer-exact formula — so a batch rebuild over the
  full corpus reproduces the streaming table bit-for-bit once counts
  match (pinned by the streaming parity test).

Publication is pointer-swapped: data lands in a fresh versioned
directory, then a CURRENT pointer file is replaced atomically
(``os.replace``). A reader always resolves a fully-written version; a
crash at ANY point leaves the previous version current — there is no
rename window where the table is missing, and no failure mode that
silently restarts the counts (a missing-table condition is detected
by pointer absence, never by swallowing read errors).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

TOTALS = "totals"
WEIGHTS = "weights"


def _pointer(root: str, name: str) -> str:
    return os.path.join(root, f"{name}.CURRENT")


def current_path(root: str, name: str) -> str | None:
    """Directory currently published for ``name``, or None if the
    table has never been published."""
    ptr = _pointer(root, name)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return os.path.join(root, f.read().strip())


def read_current(spark: SparkSession, root: str, name: str) -> DataFrame | None:
    """Resolve the pointer and read the published table (None before
    the first publish). Read errors on a PUBLISHED version propagate —
    they mean corruption, not first-run, and must not zero the
    running totals."""
    path = current_path(root, name)
    return None if path is None else spark.read.parquet(path)


def _publish(df: DataFrame, root: str, name: str) -> None:
    """Versioned write + atomic pointer replace. The two versions
    alternate (v0/v1): the non-current one is recycled, so disk use is
    bounded at 2x a |sources|-row table."""
    cur = current_path(root, name)
    nxt = f"{name}_v1" if (cur or "").endswith("_v0") else f"{name}_v0"
    nxt_path = os.path.join(root, nxt)
    if os.path.exists(nxt_path):
        shutil.rmtree(nxt_path)
    df.coalesce(1).write.mode("overwrite").parquet(nxt_path)
    tmp = _pointer(root, name) + ".tmp"
    with open(tmp, "w") as f:
        f.write(nxt)
    os.replace(tmp, _pointer(root, name))  # atomic on POSIX


def update_mixture_batch(
    spark: SparkSession, batch_df: DataFrame, root: str
) -> None:
    """Merge one micro-batch of documents into the running per-source
    totals and republish the weight table. Idempotence note:
    checkpoint replay of a batch double-counts tokens (counts are
    additive, not keyed) — route through a keyed upsert
    (streaming/upsert.py) first if the source can replay; with the
    file source + checkpoint, each file is delivered exactly once."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.queries.ext_sampling import (
        source_totals,
        weights_from_totals,
    )

    os.makedirs(root, exist_ok=True)
    batch_totals = source_totals(batch_df)
    existing = read_current(spark, root, TOTALS)
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
    _publish(merged, root, TOTALS)
    _publish(weights_from_totals(merged), root, WEIGHTS)


def mixture_monitor_stream(
    doc_stream: DataFrame, root: str, checkpoint: str, trigger_once: bool = False
) -> StreamingQuery:
    """Maintain the ``totals`` and ``weights`` tables under ``root``
    (read them with :func:`read_current`) from a document stream
    (columns ``source``, ``text``)."""
    writer = doc_stream.writeStream.foreachBatch(
        lambda b, _id: update_mixture_batch(b.sparkSession, b, root)
    ).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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

Publication protocol (one version = one consistent snapshot):
- each update writes a fresh ``v{n}/`` directory holding BOTH tables
  (``totals``, ``weights``) and a ``BATCH`` marker with the applied
  micro-batch id, then atomically replaces the ``CURRENT`` pointer
  file (``os.replace``) — totals and weights can never be observed
  from different batches, and a crash at any point leaves the
  previous version current;
- foreachBatch is AT-LEAST-ONCE: a crash after publish but before the
  checkpoint commit re-delivers the same batch_id on restart. Counts
  are additive, so the replay guard compares the incoming batch_id
  against the published ``BATCH`` marker and no-ops on ``<=`` — the
  double-count hole is closed by the marker, not by wishful
  exactly-once assumptions;
- the last ``KEEP_VERSIONS`` versions are retained before recycling,
  so a reader that resolved the pointer just before a publish can
  finish scanning its version while newer ones land.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

TOTALS = "totals"
WEIGHTS = "weights"
#: versions retained behind CURRENT before deletion — bounds disk at
#: (KEEP_VERSIONS+1) x a |sources|-row table while giving in-flight
#: readers a multi-batch grace window.
KEEP_VERSIONS = 2


def _pointer(root: str) -> str:
    return os.path.join(root, "CURRENT")


def _current_version(root: str) -> int | None:
    ptr = _pointer(root)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip().lstrip("v"))


def current_path(root: str, name: str) -> str | None:
    """Directory currently published for ``name`` (totals/weights), or
    None if nothing has been published yet."""
    n = _current_version(root)
    return None if n is None else os.path.join(root, f"v{n}", name)


def last_batch_id(root: str) -> int | None:
    """Micro-batch id of the published version (replay guard input)."""
    n = _current_version(root)
    if n is None:
        return None
    with open(os.path.join(root, f"v{n}", "BATCH")) as f:
        return int(f.read().strip())


def read_current(spark: SparkSession, root: str, name: str) -> DataFrame | None:
    """Resolve the pointer and read the published table (None before
    the first publish). Read errors on a PUBLISHED version propagate —
    they mean corruption, not first-run, and must not zero the
    running totals."""
    path = current_path(root, name)
    return None if path is None else spark.read.parquet(path)


def _publish_version(
    root: str, totals: DataFrame, weights: DataFrame, batch_id: int
) -> None:
    cur = _current_version(root)
    n = 0 if cur is None else cur + 1
    vdir = os.path.join(root, f"v{n}")
    if os.path.exists(vdir):  # leftover from a crash before pointer swap
        shutil.rmtree(vdir)
    totals.coalesce(1).write.parquet(os.path.join(vdir, TOTALS))
    weights.coalesce(1).write.parquet(os.path.join(vdir, WEIGHTS))
    with open(os.path.join(vdir, "BATCH"), "w") as f:
        f.write(str(batch_id))
    tmp = _pointer(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"v{n}")
    os.replace(tmp, _pointer(root))  # atomic on POSIX
    stale = os.path.join(root, f"v{n - KEEP_VERSIONS - 1}")
    if n > KEEP_VERSIONS and os.path.exists(stale):
        shutil.rmtree(stale)


def update_mixture_batch(
    spark: SparkSession, batch_df: DataFrame, root: str, batch_id: int
) -> None:
    """Merge one micro-batch of documents into the running per-source
    totals and publish a new consistent version. Replay-safe: a
    batch_id at or below the published marker is a checkpoint replay
    of work already applied and is skipped (foreachBatch is
    at-least-once; counts are additive, so re-applying would
    double-count)."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.queries.ext_sampling import (
        source_totals,
        weights_from_totals,
    )

    os.makedirs(root, exist_ok=True)
    applied = last_batch_id(root)
    if applied is not None and batch_id <= applied:
        return  # replay of an already-published batch
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
    from eventsgateway_spark.queries._util import released_checkpoints

    # sever lineage from the table we replace; released once the new
    # version is published (long streams must not accumulate per-batch
    # checkpoint blocks — ADVICE r8)
    with released_checkpoints() as ckpt:
        merged = ckpt(merged)
        _publish_version(root, merged, weights_from_totals(merged), batch_id)


def mixture_monitor_stream(
    doc_stream: DataFrame, root: str, checkpoint: str, trigger_once: bool = False
) -> StreamingQuery:
    """Maintain the ``totals`` and ``weights`` tables under ``root``
    (read them with :func:`read_current`) from a document stream
    (columns ``source``, ``text``)."""
    writer = doc_stream.writeStream.foreachBatch(
        lambda b, bid: update_mixture_batch(b.sparkSession, b, root, bid)
    ).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

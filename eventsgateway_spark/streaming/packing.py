"""Streaming sequence packing — the incremental form of q73.

A corpus that grows while you train still needs its chunk stream cut
into fixed-length training sequences; recomputing the global prefix
sum over the whole corpus per arrival batch would be O(corpus) per
batch. The incremental form carries ONE scalar between micro-batches —
the global token offset after everything packed so far — and each
batch only prefix-sums ITSELF (the same skew-safe two-phase sum as
batch q73), then shifts by the carried offset. Appending a batch is
O(batch), independent of corpus size.

Exactness contract: stream-accumulated packing over batches B1..Bn
equals batch q73 over the concatenated corpus whenever the stream
delivers documents in the batch query's global (doc_id, chunk_id)
order (docs arrive whole, so a document's chunks never split across
batches; cross-batch doc order is the source's file order). The cut
math itself is ``ext_pipeline.pack_projection`` — the ONE copy shared
with q73, so the two cannot drift; parity is pinned by
tests/test_streaming.py.

Replay protocol (foreachBatch is at-least-once): the state file
records (batch_id, offset_before, offset_after) plus the max doc_id
before/after the batch. A re-delivered batch_id (crash between sink
write and checkpoint commit — only the LAST batch can replay) is
packed again from ``offset_before`` and rewrites its own batch_id
partition via dynamic overwrite, converging to the identical output;
state publication is an ``os.replace`` of a single JSON file, atomic
on POSIX.

The ordering contract is ENFORCED, not assumed (VERDICT r7): each
batch's min(doc_id) must exceed the carried max doc_id watermark, so
an out-of-order source fails the stream loudly instead of silently
producing packing that no longer equals batch q73."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.queries.ext_pipeline import (
    pack_projection,
    prefix_bucket_docs,
)

STATE_FILE = "PACK_STATE.json"


def _read_state(root: str) -> dict:
    path = os.path.join(root, STATE_FILE)
    if not os.path.exists(path):
        return {
            "batch_id": -1,
            "offset_before": 0,
            "offset_after": 0,
            "max_doc_before": None,
            "max_doc_after": None,
        }
    with open(path) as f:
        state = json.load(f)
    # state files written before the ordering guard lack the doc
    # watermark: treat as unknown (guard arms from the next batch on)
    state.setdefault("max_doc_before", None)
    state.setdefault("max_doc_after", None)
    return state


def _write_state(root: str, state: dict) -> None:
    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, STATE_FILE + ".staging")
    with open(staging, "w") as f:
        json.dump(state, f)
    os.replace(staging, os.path.join(root, STATE_FILE))


def pack_batch(batch_docs: DataFrame, base_off: int) -> DataFrame:
    """Pack ONE batch of documents starting at global token offset
    ``base_off`` — q73's chunk → two-phase prefix sum → cut pipeline,
    scoped to the batch."""
    from eventsgateway_spark.operators.skew import skew_safe_running_sum
    from eventsgateway_spark.queries.ext_text import chunk_documents

    chunks = chunk_documents(batch_docs.select("doc_id", "text")).select(
        "doc_id", "chunk_id", F.col("n_tokens").cast("bigint").alias("n_tokens")
    )
    packed = skew_safe_running_sum(
        chunks.withColumn("_g", F.lit(0)),
        keys=["_g"],
        order_by=["doc_id", "chunk_id"],
        value=F.col("n_tokens"),
        bucket=F.expr(f"doc_id div {prefix_bucket_docs(batch_docs)}"),
        sum_col="_cum",
    )
    return pack_projection(packed, base_off)


def stream_pack(
    stream_docs: DataFrame,
    out_path: str,
    state_root: str,
    checkpoint: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Continuously extend the packed-sequence table as document
    batches arrive. Output partitions by batch_id with dynamic
    overwrite (replay rewrites, never duplicates — the
    streaming/near_dup.py idempotence contract)."""

    def _pack(batch_df: DataFrame, batch_id: int) -> None:
        from eventsgateway_spark.queries._util import released_checkpoints

        state = _read_state(state_root)
        if batch_id < state["batch_id"]:
            return  # stale replay older than the last applied batch
        if batch_id == state["batch_id"]:
            base = state["offset_before"]  # re-delivered last batch
            high = state["max_doc_before"]
        else:
            base = state["offset_after"]
            high = state["max_doc_after"]
        with released_checkpoints() as ckpt:
            _pack_guarded(batch_df, batch_id, base, high, ckpt)

    def _pack_guarded(batch_df, batch_id, base, high, ckpt) -> None:
        batch = ckpt(batch_df)  # packed sink + token count
        # Ordering guard (VERDICT r7): exactness vs batch q73 requires
        # cross-batch arrival in the global doc_id order. An
        # out-of-order source would silently produce non-q73-equal
        # packing, so fail LOUDLY instead — the caller either fixes the
        # source ordering or accepts arrival-order packing by routing
        # through a fresh state_root per epoch.
        lo, hi = batch.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        if lo is None:
            return  # empty batch: nothing to pack, state unchanged
        if high is not None and lo <= high:
            raise ValueError(
                f"stream_pack ordering contract violated: batch {batch_id} "
                f"contains doc_id {lo} <= already-packed max doc_id {high}; "
                "the packed output would no longer equal batch q73 over the "
                "concatenated corpus (see module docstring)"
            )
        packed = ckpt(pack_batch(batch, base))
        (
            packed.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        n_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0] or 0
        _write_state(
            state_root,
            {
                "batch_id": batch_id,
                "offset_before": base,
                "offset_after": base + int(n_tokens),
                "max_doc_before": high,
                "max_doc_after": int(hi),
            },
        )

    writer = stream_docs.writeStream.foreachBatch(_pack).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

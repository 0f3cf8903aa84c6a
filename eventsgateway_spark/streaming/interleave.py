"""Streaming training-order interleave — the incremental form of q76.

q76 assigns every document an integer virtual time
``vt = rank_within_source * VT_SCALE / weight_ppm`` so that reading in
vt order delivers the q75 mixture in every prefix of the stream
(queries/ext_sampling.py). For a corpus that grows while you train,
recomputing the per-source ranks over the whole corpus per arrival
batch would be O(corpus) per batch. The incremental form carries ONE
small dict between micro-batches — the per-source rank counter after
everything ordered so far — and each batch ranks only ITSELF (the same
md5-prefix-bucketed skew-safe rank as batch q76), then shifts each
source's local ranks by its carried counter. Appending a batch is
O(batch), independent of corpus size; the carried state is one integer
per source (sources are few — corpus components, not documents).

Mixture weights are an INPUT, not derived per batch: the weights are a
planning-pass artifact (batch q75 over the seed corpus, or the
streaming mixture monitor), and re-deriving them from each prefix
would retroactively re-time already-emitted documents. Freezing them
is what makes vt append-only.

Exactness contract (mirrors streaming/packing.py): stream-accumulated
order over batches B1..Bn equals batch q76 over the concatenated
corpus whenever each source's documents arrive across batches in the
batch query's per-source (md5(doc_id), doc_id) order. Enforced, not
assumed: the state carries a per-source (h, doc_id) high-water mark,
and a batch containing a row at-or-below its source's mark fails the
stream loudly instead of silently drifting from the batch result.

Replay protocol: identical to the packer — foreachBatch is
at-least-once, only the LAST batch can re-deliver; state records the
before/after counters and marks, a re-delivered batch_id re-ranks from
the ``before`` state and rewrites its own batch_id partition via
dynamic overwrite, converging to the identical output. State
publication is an ``os.replace`` of one JSON file, atomic on POSIX.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.queries.ext_sampling import VT_SCALE

STATE_FILE = "INTERLEAVE_STATE.json"

_EMPTY_STATE = {
    "batch_id": -1,
    "ranks_before": {},
    "ranks_after": {},
    "hwm_before": {},
    "hwm_after": {},
}


def _read_state(root: str) -> dict:
    path = os.path.join(root, STATE_FILE)
    if not os.path.exists(path):
        return json.loads(json.dumps(_EMPTY_STATE))
    with open(path) as f:
        return json.load(f)


def _write_state(root: str, state: dict) -> None:
    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, STATE_FILE + ".staging")
    with open(staging, "w") as f:
        json.dump(state, f)
    os.replace(staging, os.path.join(root, STATE_FILE))


def interleave_batch(
    batch_docs: DataFrame, weights: dict[str, int], base_ranks: dict[str, int]
) -> DataFrame:
    """Rank ONE batch of (source, doc_id) rows within each source by
    (md5(doc_id), doc_id) — q76's skew-safe md5-prefix-bucketed rank,
    scoped to the batch — shift by the carried per-source counters,
    and derive vt with the frozen ``weights`` (source -> weight_ppm).

    Sources absent from ``weights`` get weight 1 ppm (vt pushes them
    far out rather than dropping data silently), matching batch q76's
    ``greatest(weight_ppm, 1)`` floor.
    """
    from eventsgateway_spark.operators.skew import skew_safe_running_sum

    spark = batch_docs.sparkSession
    h = batch_docs.select("source", "doc_id").withColumn(
        "h", F.md5(F.col("doc_id").cast("string"))
    )
    ranked = skew_safe_running_sum(
        h,
        keys=["source"],
        order_by=["h", "doc_id"],
        value=F.lit(1),
        bucket=F.substring("h", 1, 2),
        rn_col="rk_local",
        sum_col="_unused",
    )
    # one tiny row per source: broadcast, never a shuffle on the big side
    side = spark.createDataFrame(
        [
            (s, int(base_ranks.get(s, 0)), int(weights.get(s, 1)))
            for s in set(weights) | set(base_ranks)
        ]
        or [("", 0, 1)],
        "source string, base_rk long, weight_ppm long",
    )
    return (
        ranked.join(F.broadcast(side), "source", "left")
        .select(
            "source",
            "doc_id",
            (F.col("rk_local") + F.coalesce(F.col("base_rk"), F.lit(0)))
            .cast("bigint")
            .alias("rk"),
            # decimal lift mirrors batch q76 exactly (parity contract):
            # rk × 1e9 overflows BIGINT past rk ~9.2e9
            F.expr(
                f"(CAST(rk_local + coalesce(base_rk, 0) AS DECIMAL(18,0))"
                f" * {VT_SCALE})"
                " div greatest(coalesce(weight_ppm, 1), 1)"
            )
            .cast("bigint")
            .alias("vt"),
        )
    )


def apply_interleave_batch(
    batch_df: DataFrame,
    batch_id: int,
    weights: dict[str, int],
    out_path: str,
    state_root: str,
) -> None:
    """Order one micro-batch and advance the carried state — the
    foreachBatch body of :func:`stream_training_order`, module-level so
    the replay protocol is directly testable (same layout as
    streaming/packing.py)."""
    from eventsgateway_spark.queries._util import released_checkpoints

    state = _read_state(state_root)
    if batch_id < state["batch_id"]:
        return  # stale replay older than the last applied batch
    replay = batch_id == state["batch_id"]
    base = state["ranks_before"] if replay else state["ranks_after"]
    hwm = state["hwm_before"] if replay else state["hwm_after"]
    with released_checkpoints() as ckpt:
        _apply_interleave(batch_df, batch_id, weights, out_path,
                          state_root, base, hwm, ckpt)


def _apply_interleave(batch_df, batch_id, weights, out_path,
                      state_root, base, hwm, ckpt) -> None:
    batch = ckpt(batch_df)
    h = batch.select("source", "doc_id").withColumn(
        "h", F.md5(F.col("doc_id").cast("string"))
    )
    # per-source batch envelope: min for the guard, max + count for
    # the next state — one tiny aggregate job
    env = {
        r["source"]: r
        for r in h.groupBy("source")
        .agg(
            F.min(F.struct("h", "doc_id")).alias("lo"),
            F.max(F.struct("h", "doc_id")).alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    if not env:
        return  # empty batch: nothing to order, state unchanged
    for source, r in env.items():
        mark = hwm.get(source)
        lo = [r["lo"]["h"], r["lo"]["doc_id"]]
        if mark is not None and lo <= mark:
            raise ValueError(
                "stream_training_order ordering contract violated: "
                f"batch {batch_id} source {source!r} contains "
                f"(h, doc_id)={tuple(lo)} <= already-ordered mark "
                f"{tuple(mark)}; the emitted order would no longer "
                "equal batch q76 over the concatenated corpus (see "
                "module docstring)"
            )
    out = ckpt(interleave_batch(batch, weights, base))
    (
        out.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_path)
    )
    ranks_after = dict(base)
    hwm_after = dict(hwm)
    for source, r in env.items():
        ranks_after[source] = int(base.get(source, 0)) + int(r["n"])
        hwm_after[source] = [r["hi"]["h"], r["hi"]["doc_id"]]
    _write_state(
        state_root,
        {
            "batch_id": batch_id,
            "ranks_before": base,
            "ranks_after": ranks_after,
            "hwm_before": hwm,
            "hwm_after": hwm_after,
        },
    )


def stream_training_order(
    stream_docs: DataFrame,
    weights: dict[str, int],
    out_path: str,
    state_root: str,
    checkpoint: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Continuously extend the (source, doc_id, rk, vt) training-order
    table as document batches arrive. Output partitions by batch_id
    with dynamic overwrite (replay rewrites, never duplicates — the
    streaming/near_dup.py idempotence contract). Read the table sorted
    by (vt, source, doc_id) to consume the training stream."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_interleave_batch(batch_df, batch_id, weights, out_path, state_root)

    writer = stream_docs.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Idempotent streaming upsert into the partitioned events table.

The reference lands events in a Delta table (Makefile:23-24,
spark-notebook/eventsgateway-streaming.ipynb:119-135), where replays
and key updates are absorbed by MERGE/transactional commits. On plain
parquet this module provides the standard analog: ``foreachBatch`` +
dynamic partition overwrite — each micro-batch is merged with the
existing rows of ONLY the partitions it touches, winners chosen by the
newest-per-key rule, and those partitions are atomically replaced.

Exactly-once story: the streaming checkpoint makes batch replay the
only duplicate source, and the merge is idempotent (re-merging the
same batch rewrites the same winners), so crash-replays converge to
the same table. On a Delta/Iceberg-enabled cluster, swap the body for
a native MERGE and keep the same driver signature.

Scale posture (100 TB): the rewrite cost per batch is bounded by the
touched partitions (with date partitioning, a micro-batch touches ~1-2
days), never the whole table; the existing-side read is partition-
pruned by construction. State lives in the table, not the stream —
no unbounded streaming state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from eventsgateway_spark.operators.transforms import derive_date_partitions
from eventsgateway_spark.sources.lakehouse import PARTITION_COLS, read_events_table
from eventsgateway_spark.streaming.dedup import dedup_exact_batch


def merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "serverTimestamp",
    tiebreak: str = "name",
    sort_within: str | None = "name",
) -> None:
    """Merge one micro-batch into the partitioned table at ``path``:
    newest row per key wins (ties broken deterministically), and only
    the partitions present in the batch are rewritten.

    Precondition: a key never changes date partition. The partition
    derives from ``clientTimestamp`` (immutable event time — the
    reference's duplicate source is client retries resending the SAME
    event, client/async.go:232-279, so a replayed id always carries the
    same clientTimestamp and lands in the same partition). If your keys
    CAN move partitions, partition-scoped merging is the wrong tool —
    that needs a globally-indexed table format (Delta/Hudi/Iceberg
    MERGE), not this analog.
    """
    from eventsgateway_spark.queries._util import released_checkpoints

    # per-batch checkpoints released when the write completes — a
    # long-running upsert stream must not accumulate them (ADVICE r8)
    with released_checkpoints() as ckpt:
        _merge_batch_pinned(
            spark, batch_df, path, key_cols, order_col, tiebreak,
            sort_within, ckpt,
        )


def _merge_batch_pinned(
    spark, batch_df, path, key_cols, order_col, tiebreak, sort_within, ckpt
) -> None:
    # Materialize the derived batch once: the touched-partition collect
    # and the merge union below would otherwise each re-evaluate the
    # foreachBatch source.
    batch = ckpt(derive_date_partitions(batch_df))
    touched = [tuple(r) for r in batch.select(*PARTITION_COLS).distinct().collect()]
    if not touched:
        return
    # The missing-table catch wraps ONLY the read: a filter/unionByName
    # AnalysisException (e.g. producer schema drift adding a column the
    # table lacks) must PROPAGATE — swallowing it as "first batch" would
    # dynamic-overwrite the touched partitions with just this batch,
    # silently deleting every pre-existing event in them.
    try:
        existing = read_events_table(spark, path)
    except AnalysisException:  # first batch: table does not exist yet
        existing = None
    if existing is None:
        winners = dedup_exact_batch(batch, list(key_cols), order_col, tiebreak)
    else:
        in_touched = reduce(
            lambda a, b: a | b,
            [
                (F.col("year") == y) & (F.col("month") == m) & (F.col("day") == d)
                for y, m, d in touched
            ],
        )
        # Source-beats-incumbent on an exact (order_col, tiebreak)
        # tie: matches the Delta MERGE path's `s.x >= t.x` update
        # condition (merge_batch_delta) so the two "same contract"
        # sinks cannot diverge on ties (ADVICE r7). Batch rows carry
        # _src=1, pre-existing rows 0; the flag is the LAST sort key,
        # so it only decides full ties.
        merged = batch.withColumn("_src", F.lit(1)).unionByName(
            existing.filter(in_touched).select(batch.columns)
            .withColumn("_src", F.lit(0))
        )
        winners = dedup_exact_batch(
            merged, list(key_cols), order_col, tiebreak,
            extra_order=[F.col("_src").desc()],
        ).drop("_src")
    # Materialize before overwriting: the winners' lineage reads the
    # same path being replaced, which Spark (correctly) refuses for a
    # lazy plan ("Cannot overwrite a path that is also being read from").
    winners = ckpt(winners)
    if sort_within and sort_within in winners.columns:
        # keep the table's cluster-column layout (min/max skipping),
        # matching write_events_batch / compact_partition
        winners = winners.sortWithinPartitions(*PARTITION_COLS, sort_within)
    # per-write option, NOT session conf: mutating the session-global
    # partitionOverwriteMode races concurrent writers on the same
    # session (a restore-to-static could demote another thread's
    # in-flight dynamic overwrite into a whole-table delete).
    (
        winners.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*PARTITION_COLS)
        .parquet(path)
    )


def merge_batch_delta(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "serverTimestamp",
    tiebreak: str = "name",
) -> None:
    """Native Delta MERGE — the reference's actual landing semantics
    (.ipynb:119-135) for clusters where ``delta_available`` is true and
    the delta-spark Python package is installed. Same newest-per-key
    contract as :func:`merge_batch`, executed as one transactional
    MERGE instead of a partition rewrite; unlike the parquet analog it
    has no same-partition precondition (Delta's file index handles
    key movement)."""
    from delta.tables import DeltaTable  # delta-spark package

    batch = derive_date_partitions(batch_df)
    winners = dedup_exact_batch(batch, list(key_cols), order_col, tiebreak)
    if not DeltaTable.isDeltaTable(spark, path):
        (
            winners.write.format("delta")
            .partitionBy(*PARTITION_COLS)
            .save(path)
        )
        return
    cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    newer = (
        f"s.{order_col} > t.{order_col} OR "
        f"(s.{order_col} = t.{order_col} AND s.{tiebreak} >= t.{tiebreak})"
    )
    (
        DeltaTable.forPath(spark, path)
        .alias("t")
        .merge(winners.alias("s"), cond)
        .whenMatchedUpdateAll(condition=newer)
        .whenNotMatchedInsertAll()
        .execute()
    )


def upsert_events_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "serverTimestamp",
    tiebreak: str = "name",
    sort_within: str | None = "name",
    trigger_once: bool = False,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Streaming upsert sink: checkpointed ``foreachBatch`` over
    :func:`merge_batch` (``fmt="parquet"``, the partition-rewrite
    analog) or :func:`merge_batch_delta` (``fmt="delta"``, native
    transactional MERGE on a Delta-enabled cluster).

    ``sort_within`` applies only to the parquet path, whose partition
    rewrite controls physical row order; a Delta MERGE updates rows in
    place inside existing files, so there is no layout to sort — on a
    Delta table, cluster with OPTIMIZE/ZORDER instead. Passing a
    non-default value with ``fmt="delta"`` warns rather than silently
    dropping the request (ADVICE r7). Tie semantics are identical on
    both paths: the source row beats the incumbent on an exact
    (order_col, tiebreak) tie."""
    if fmt == "delta" and sort_within != "name":
        import warnings

        warnings.warn(
            "sort_within is a parquet-path layout control; the Delta "
            "MERGE path ignores it (use OPTIMIZE/ZORDER on the table)",
            stacklevel=2,
        )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if fmt == "delta":
            merge_batch_delta(
                batch_df.sparkSession, batch_df, path, key_cols,
                order_col, tiebreak,
            )
            return
        merge_batch(
            batch_df.sparkSession,
            batch_df,
            path,
            key_cols,
            order_col,
            tiebreak,
            sort_within,
        )

    writer = events.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

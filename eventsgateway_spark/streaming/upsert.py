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
) -> None:
    """Merge one micro-batch into the partitioned table at ``path``:
    newest row per key wins (ties broken deterministically), and only
    the partitions present in the batch are rewritten."""
    batch = derive_date_partitions(batch_df)
    touched = [tuple(r) for r in batch.select(*PARTITION_COLS).distinct().collect()]
    if not touched:
        return
    try:
        existing = read_events_table(spark, path)
        in_touched = reduce(
            lambda a, b: a | b,
            [
                (F.col("year") == y) & (F.col("month") == m) & (F.col("day") == d)
                for y, m, d in touched
            ],
        )
        merged = batch.unionByName(existing.filter(in_touched).select(batch.columns))
    except AnalysisException:  # first batch: table does not exist yet
        merged = batch
    winners = dedup_exact_batch(merged, list(key_cols), order_col, tiebreak)
    # Materialize before overwriting: the winners' lineage reads the
    # same path being replaced, which Spark (correctly) refuses for a
    # lazy plan ("Cannot overwrite a path that is also being read from").
    winners = winners.localCheckpoint()
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        winners.write.mode("overwrite").partitionBy(*PARTITION_COLS).parquet(path)
    finally:
        spark.conf.set(conf_key, prev)


def upsert_events_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "serverTimestamp",
    tiebreak: str = "name",
    trigger_once: bool = False,
) -> StreamingQuery:
    """Streaming upsert sink: checkpointed ``foreachBatch`` over
    :func:`merge_batch`."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(
            batch_df.sparkSession, batch_df, path, key_cols, order_col, tiebreak
        )

    writer = events.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

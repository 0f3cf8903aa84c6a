"""Partitioned columnar events table (SURVEY §2.1 S6/S7).

The reference lands events in a Delta/ORC table partitioned by derived
year/month/day strings (.ipynb:119-135, Makefile:23-24). This container
has no Delta jars, so the engine writes snappy parquet with the same
layout; on a Delta-enabled cluster, pass ``fmt="delta"``.

Scale notes (100 TB): partitioning by event-time date keeps partition
pruning effective for the dominant time-ranged queries; within a
partition, files are sized by ``spark.sql.files.maxPartitionBytes``-
friendly target (~128 MB). A second-level clustering key (e.g. name)
would be a Z-order candidate on Delta; with plain parquet we sort
within partitions instead (``sort_within``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from eventsgateway_spark.operators.transforms import derive_date_partitions

PARTITION_COLS = ["year", "month", "day"]


def write_events_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    sort_within: str | None = "name",
) -> None:
    """Append storage-schema events into the partitioned table."""
    out = derive_date_partitions(df)
    if sort_within:
        out = out.sortWithinPartitions(*PARTITION_COLS, sort_within)
    out.write.format(fmt).mode(mode).partitionBy(*PARTITION_COLS).save(path)


def write_events_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_once: bool = False,
) -> StreamingQuery:
    """Streaming append with checkpointed exactly-once file commits —
    the engine's version of the notebook's
    writeStream.outputMode('append').toTable(...) (.ipynb:131-135)."""
    writer = (
        derive_date_partitions(df)
        .writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .partitionBy(*PARTITION_COLS)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start(path)


def read_events_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table with the reference's schema: year/month/day
    are *strings* (.ipynb:97-107). Partition-column type inference would
    silently turn the zero-padded directory values ("01") into ints, so
    pin it off for this read."""
    conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        return spark.read.parquet(path)
    finally:
        spark.conf.set(conf_key, prev)

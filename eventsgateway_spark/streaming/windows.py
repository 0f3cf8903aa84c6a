"""Streaming window aggregations + watermark policy (SURVEY §2.5 Q13-Q14).

The reference's only continuous aggregations are Prometheus counters and
histograms over the event stream (metrics/metrics.go); these functions
generalize them into queryable event-time operators:

- tumbling/sliding counts  ≙ grouped counter A1 (by topic/name/status)
- fixed-bucket histograms  ≙ histogram A2
- last-value gauge         ≙ gauge A3
- session windows          ≙ Q13 (batch analog: queries/events.py q18)

All take a DataFrame with an event-time timestamp column and work on
both batch and streaming inputs (Spark's window()/session_window() are
defined for both; only withWatermark is streaming-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default lateness bound. The reference has no watermark concept (it
#: partitions late events into old date partitions and moves on,
#: .ipynb:103-106); 10 minutes is the FIXTURES.md streaming-test bound.
DEFAULT_WATERMARK = "10 minutes"


def with_event_time(df: DataFrame, ms_col: str = "clienttimestamp") -> DataFrame:
    """Epoch-millis long → TimestampType event-time column."""
    return df.withColumn("event_time", F.timestamp_millis(F.col(ms_col)))


def tumbling_counts(
    df: DataFrame,
    keys: list[str],
    window: str = "10 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """A1 — grouped counter per tumbling event-time window."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def sliding_counts(
    df: DataFrame,
    keys: list[str],
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def session_counts(
    df: DataFrame,
    keys: list[str],
    gap: str = "30 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """Q13 — session windows closed by a silence gap; state is bounded
    by the watermark."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n",
        )
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    buckets: tuple[float, ...] = (10, 30, 50, 100, 500),
    window: str = "10 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """A2 — Prometheus-style fixed-bucket histogram per window
    (buckets default to the reference's response-time SLO buckets,
    metrics/metrics.go:53)."""
    v = F.col(value_col)
    bucket = F.lit("inf")
    for b in reversed(buckets):
        bucket = F.when(v <= b, f"le_{b:g}").otherwise(bucket)
    # a NULL value fails every `v <= b` and would fall through to the
    # overflow bucket, inflating it by the missing-field rate; a
    # Prometheus histogram never observes a value it doesn't have
    df = df.filter(v.isNotNull())
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.withColumn("bucket", bucket)
        .groupBy(F.window(ts_col, window).alias("w"), *keys, F.col("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "bucket", "n")
    )


def last_value_gauge(df: DataFrame, keys: list[str], value_col: str, ts_col: str = "event_time") -> DataFrame:
    """A3 — latest value per key (max_by on event time)."""
    return df.groupBy(*keys).agg(
        F.max_by(value_col, F.col(ts_col)).alias("last_value"),
        F.max(ts_col).alias("as_of"),
    )

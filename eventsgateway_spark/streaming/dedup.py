"""Stateful dedup — at-least-once → effectively-once (SURVEY §2.5 Q15).

The reference explicitly ships duplicates: "If you really need distinct
values guarantee, consider handling it on the downstream pipelines"
(README.md:11-17; duplicates arise from client retries after lost acks,
client/async.go:232-279). This module is that downstream handling.

State-retention tradeoff: ``dropDuplicatesWithinWatermark`` bounds the
dedup state to the watermark horizon — duplicates farther apart than
the watermark are NOT caught (they're also vanishingly rare: the
reference's retry window is ≤ 2^3 × retryInterval ≈ seconds, far
inside any reasonable watermark). Unbounded ``dropDuplicates`` would be
exact but grows state forever at 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsgateway_spark.streaming.windows import DEFAULT_WATERMARK


def dedup_by_id(
    df: DataFrame,
    id_cols: list[str] | None = None,
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """Keep the first arrival per event id within the watermark horizon."""
    id_cols = id_cols or ["id"]
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
    return df.dropDuplicates(id_cols)


def dedup_exact_batch(
    df: DataFrame,
    id_cols: list[str],
    order_col: str,
    tiebreak: str,
    extra_order: list | None = None,
) -> DataFrame:
    """Deterministic batch dedup: keep the newest row per key (the
    row_number()==1 pattern; see queries/events.py q16 for the
    oracle-checked version). ``extra_order`` appends lower-priority
    sort expressions for callers whose rows can tie on BOTH
    (order_col, tiebreak) — e.g. the upsert merge's source-beats-
    incumbent rule."""
    from pyspark.sql import Window as W

    order = [F.col(order_col).desc(), F.col(tiebreak).desc()] + (extra_order or [])
    w = W.partitionBy(*id_cols).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

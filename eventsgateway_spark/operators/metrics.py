"""Inline metrics via ``observe()`` (SURVEY §2.4 A4, second half).

The reference reports request/event counters from interceptors wrapped
around the same stream that feeds Kafka (server/app/app.go:177-224).
``foreachBatch`` fan-out (streaming/pipeline.run_etl_with_metrics)
covers the two-sink shape; this module covers the ZERO-COST shape:
``observe()`` attaches aggregate expressions to the SAME plan — no
second sink, no extra pass — and the metrics surface on the
Observation (batch) or in each StreamingQueryProgress (streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def ingest_counters() -> list:
    """The reference's counter set, as observe() expressions over the
    payload schema (topic, key, value): event count, distinct-topic
    estimate, payload byte volume."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("topic").alias("approx_topics"),
        # SUM over zero rows is NULL; a counter must read 0 on an idle
        # micro-batch (exporters do arithmetic on it)
        F.coalesce(F.sum(F.octet_length("value")), F.lit(0)).alias("payload_bytes"),
    ]


def observed_payloads(payloads: DataFrame) -> tuple[DataFrame, Observation | None]:
    """Attach ingest counters to a payload DataFrame.

    Batch: returns (df, Observation) — read ``observation.get`` after
    the first action. Streaming: returns (df, None) — the named
    observation arrives in each StreamingQueryProgress under
    ``observedMetrics['ingest']``.
    """
    if payloads.isStreaming:
        return payloads.observe("ingest", *ingest_counters()), None
    obs = Observation("ingest")
    return payloads.observe(obs, *ingest_counters()), obs

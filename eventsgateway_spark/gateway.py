"""Gateway — the ingestion API (reference client/server surface).

Mirrors the reference client semantics (client/client.go):
- ``send(name, props)`` stamps uuid + epoch-ms event time
  (client/client.go:231-240),
- ``send_to_topic`` overrides the routing topic
  (client/client.go:183-200, ``SendToTopic``),
- ``send_at`` pins event time for deterministic tests
  (client/client.go:203-220, ``SendAtTime``),
- buffered events flush as one micro-batch (the async client's
  linger/size batcher, client/async.go:195-230 — here a flush produces
  a DataFrame; continuous operation uses streaming/pipeline.py where
  Structured Streaming's trigger IS the micro-batcher).

The server-side pipeline (validate → enrich → encode → route → sink,
server/sender/kafka.go:44-120) is the ``ingest`` function: one
declarative plan instead of goroutine fan-out.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventsgateway_spark.operators import transforms
from eventsgateway_spark.schemas import WIRE_EVENT_SCHEMA
from eventsgateway_spark.sources.avro_codec import to_avro_col


class IngestResult(NamedTuple):
    """Encoded payloads ready for the sink + rejected side-outputs."""

    payloads: DataFrame  # columns: topic, key(null), value(avro bytes)
    quarantine: DataFrame  # invalid envelopes with reject_reason
    oversized: DataFrame  # size-limit rejects with reject_reason

    def report(self) -> dict[str, int]:
        """Per-batch ingest outcome: accepted count plus rejected
        counts keyed by reject_reason — the engine's analog of the
        reference's per-row failure indexes in the batch response
        (server/app/server.go:59-65). Small aggregate jobs over the
        side-outputs; call for observability, not in the hot path."""
        out = {"accepted": self.payloads.count()}
        for df in (self.quarantine, self.oversized):
            for row in df.groupBy("reject_reason").count().collect():
                reason = row["reject_reason"]
                out[reason] = out.get(reason, 0) + int(row["count"])
        return out


@dataclass
class Gateway:
    """Thin producer façade: buffer rows, flush to a wire-schema
    DataFrame, push through the ingest pipeline."""

    spark: SparkSession
    default_topic: str = "default-topic"
    max_message_bytes: int = transforms.DEFAULT_MAX_MESSAGE_BYTES
    _buffer: list[tuple] = field(default_factory=list)

    def send(self, name: str, props: dict[str, str] | None = None) -> str:
        return self.send_at(name, int(time.time() * 1000), props)

    def send_to_topic(
        self, name: str, topic: str, props: dict[str, str] | None = None
    ) -> str:
        return self.send_at(name, int(time.time() * 1000), props, topic=topic)

    def send_at(
        self,
        name: str,
        at_ms: int,
        props: dict[str, str] | None = None,
        topic: str | None = None,
    ) -> str:
        event_id = str(uuid.uuid4())
        self._buffer.append(
            (event_id, name, topic or self.default_topic, props or {}, at_ms)
        )
        return event_id

    #: Hard ceiling on a single flush. The buffer is a PRODUCER-LIBRARY
    #: analog (the reference client is also a driver-side buffer,
    #: client/client.go): createDataFrame ships every row through the
    #: driver, which is per-RPC granularity, not a data path. Bulk
    #: backfill belongs on the file/Kafka source path
    #: (sources/kafka.py / sources/lakehouse.py), where executors read
    #: in parallel and the driver never holds the rows.
    MAX_FLUSH_ROWS = 100_000

    def flush(self) -> DataFrame:
        """Drain the buffer into one wire-schema DataFrame (one
        micro-batch). Raises when the buffer exceeds MAX_FLUSH_ROWS —
        see the attribute note: that volume means someone is using the
        producer API as a backfill path."""
        if len(self._buffer) > self.MAX_FLUSH_ROWS:
            raise ValueError(
                f"flush() of {len(self._buffer)} buffered events exceeds "
                f"MAX_FLUSH_ROWS={self.MAX_FLUSH_ROWS}: the Gateway buffer is "
                "a per-micro-batch producer API (driver-side rows); bulk "
                "backfill should go through a file/Kafka source so executors "
                "read it in parallel"
            )
        # build the frame BEFORE clearing: a schema-verification error
        # in createDataFrame must leave the buffer intact (clearing
        # first would destroy every buffered event, valid ones included)
        df = self.spark.createDataFrame(self._buffer, WIRE_EVENT_SCHEMA)
        self._buffer = []
        return df

    def ingest(self, wire_df: DataFrame | None = None) -> IngestResult:
        return ingest(self.spark, wire_df if wire_df is not None else self.flush(),
                      max_message_bytes=self.max_message_bytes)

    def drain(self):
        """Flush+ingest the buffer as a SEQUENCE of ≤MAX_FLUSH_ROWS
        micro-batches (generator of IngestResults) — the recovery path
        when a producer loop legitimately outran the single-flush
        ceiling (e.g. a long load test): each wave is a bounded
        createDataFrame, so the driver never ships the whole backlog
        as one row set. The buffer shrinks as waves are consumed; an
        abandoned generator leaves the remainder buffered."""
        while self._buffer:
            rows = self._buffer[: self.MAX_FLUSH_ROWS]
            # same clear-after-success ordering as flush(): only drop
            # the wave from the buffer once its frame verified
            res = ingest(
                self.spark,
                self.spark.createDataFrame(rows, WIRE_EVENT_SCHEMA),
                max_message_bytes=self.max_message_bytes,
            )
            self._buffer = self._buffer[len(rows):]
            yield res


def ingest(
    spark: SparkSession,
    wire_df: DataFrame,
    max_message_bytes: int = transforms.DEFAULT_MAX_MESSAGE_BYTES,
) -> IngestResult:
    """The server pipeline as one logical plan:

    validate (P1) → enrich (P5) → route (P6) → Avro-encode (S5) →
    size-limit (P2) → Kafka-shaped payload (sink_topic, key, value).

    Works identically on batch and streaming DataFrames.
    """
    valid, quarantine = transforms.validate(wire_df)
    enriched = transforms.route_topic(transforms.enrich(valid))
    encoded = enriched.withColumn("value", to_avro_col(spark))
    kept, oversized = transforms.size_limit(encoded, "value", max_message_bytes)
    payloads = kept.select(
        F.col("sink_topic").alias("topic"),
        F.lit(None).cast("binary").alias("key"),  # no partition key — reference
        # produces keyless (server/forwarder/kafka.go:66-69); ordering is
        # not guaranteed, duplicates are possible ⇒ downstream dedup Q15.
        "value",
    )
    return IngestResult(payloads=payloads, quarantine=quarantine, oversized=oversized)

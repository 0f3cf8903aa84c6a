"""Kafka transport wiring (SURVEY §2.1 S2/S3) with a file-based stand-in.

On a real cluster (spark-sql-kafka connector on the classpath) the
engine's payload DataFrames go straight to ``format("kafka")`` — the
per-row ``topic`` column replaces the reference's Go routing loop
(server/forwarder/kafka.go:60-73), and producer tuning (snappy,
linger) is connector config mirroring sarama's
(server/forwarder/kafka.go:38-42).

This container has no Kafka broker or connector jar, so ``FileBus``
provides the same produce/consume contract over a spooled parquet
directory: one "topic" per subdirectory, exactly the (topic, key,
value) triple Kafka would carry. Streaming reads use Spark's file
source, which gives the same micro-batch admission semantics
(maxFilesPerTrigger ≈ maxOffsetsPerTrigger backpressure, SURVEY §2.3 C1).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), False),
    ]
)


def kafka_available(spark: SparkSession) -> bool:
    try:
        # Class.forName, not attribute access: py4j resolves a missing
        # class path to a silent JavaPackage instead of raising.
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_broker_reachable(bootstrap: str, timeout: float = 1.0) -> bool:
    """TCP probe for a live broker — gates the conditional integration
    test (mirroring the reference's broker-backed tier,
    client/sync_int_test.go:66-100) without hanging when the sandbox
    has no Kafka."""
    import socket

    # bootstrap is the standard comma-separated multi-broker form
    # ("h1:9092,h2:9092", possibly with IPv6 literals "[::1]:9092");
    # reachable = ANY broker answers.
    for entry in bootstrap.split(","):
        entry = entry.strip()
        if not entry:
            continue
        if entry.startswith("["):  # IPv6 literal
            host, _, rest = entry[1:].partition("]")
            port = rest.lstrip(":")
        else:
            host, _, port = entry.partition(":")
        try:
            with socket.create_connection(
                (host, int(port or "9092")), timeout=timeout
            ):
                return True
        except (OSError, ValueError):
            continue
    return False


def read_payloads_kafka(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Batch read of (topic, key, value) from a Kafka topic — the test
    consumer's earliest-offset read-back (testing/consumer.go:36-56)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select("topic", "key", "value")
    )


def write_payloads_kafka(df: DataFrame, bootstrap: str, **producer_opts: str):
    """Kafka sink honoring the per-row topic column. Defaults mirror the
    reference producer: snappy compression, local acks, 1ms linger
    (server/forwarder/kafka.go:38-42, server/app/app.go:96-98)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "kafka.compression.type": "snappy",
        "kafka.acks": "1",
        "kafka.linger.ms": "1",
        **producer_opts,
    }
    writer = df.select("topic", "key", "value").write.format("kafka")
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.save()


class FileBus:
    """Kafka-shaped transport over a spool directory (local testing)."""

    # Per-spool-root locks: concurrent ``mode("append")`` writes into ONE
    # directory race on the shared ``_temporary`` committer staging dir
    # (reproduced by parallel HTTP ingest requests — one request's commit
    # deletes the other's staged files). A real Kafka producer has no such
    # shared-directory hazard; for this single-process dev analog,
    # serializing the append commit per root is the honest fix.
    _locks: dict[str, threading.Lock] = {}
    _locks_guard = threading.Lock()

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # realpath: '/tmp/bus' and '/tmp/bus/' (or a symlinked alias)
        # are ONE spool directory and must share one lock — keying on
        # the raw string would let aliases race the append commit
        with FileBus._locks_guard:
            self._lock = FileBus._locks.setdefault(
                os.path.realpath(root), threading.Lock()
            )

    def produce(self, payloads: DataFrame) -> None:
        """Batch produce: append (topic, key, value) rows to the spool."""
        with self._lock:
            payloads.select("topic", "key", "value").write.mode("append").parquet(
                self.root
            )

    def consume_batch(self, topic: str | None = None) -> DataFrame:
        df = self.spark.read.schema(PAYLOAD_SCHEMA).parquet(self.root)
        return df.filter(F.col("topic") == topic) if topic else df

    def consume_stream(self, topic: str | None = None, max_files_per_trigger: int | None = None) -> DataFrame:
        """Streaming consume — file source micro-batches stand in for
        Kafka offset ranges; ``maxFilesPerTrigger`` is the backpressure
        bound (reference channelBuffer, client/async.go:62-65)."""
        reader = self.spark.readStream.schema(PAYLOAD_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        df = reader.parquet(self.root)
        return df.filter(F.col("topic") == topic) if topic else df

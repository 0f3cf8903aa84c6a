"""Avro binary codec for the Event storage record.

The reference serializes events with compiled Avro codegen
(server/sender/kafka.go:102-117; schema embedded at
spark-notebook/eventsgateway-streaming.ipynb:36-70) and the notebook
decodes with Spark's ``from_avro``. This container has no spark-avro
connector jar, so the engine carries its own spec-conformant binary
codec for the one fixed Event schema (Avro 1.x binary encoding: zigzag
varint longs, length-prefixed utf8 strings, block-encoded maps),
exposed as Arrow-batched pandas UDFs.

When the spark-avro jar IS on the classpath (any real cluster),
``to_avro_col``/``from_avro_col`` transparently use the native
JVM functions instead — same wire bytes either way, verified by the
round-trip tests.
"""

from __future__ import annotations

import io

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from eventsgateway_spark.schemas import AVRO_EVENT_SCHEMA, AVRO_EVENT_SCHEMA_JSON

# ---------------------------------------------------------------------------
# Pure-Python Avro binary primitives (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_string(buf: io.BytesIO, s: str) -> None:
    raw = s.encode("utf-8")
    _write_long(buf, len(raw))
    buf.write(raw)


def _read_string(buf: io.BytesIO) -> str:
    n = _read_long(buf)
    return buf.read(n).decode("utf-8")


def encode_event(
    id: str, name: str, props: dict[str, str] | None, server_ts: int, client_ts: int
) -> bytes:
    """Binary-encode one Event record (field order fixed by the schema)."""
    buf = io.BytesIO()
    _write_string(buf, id)
    _write_string(buf, name)
    props = props or {}
    if props:
        _write_long(buf, len(props))
        for k, v in props.items():
            _write_string(buf, k)
            _write_string(buf, v)
    _write_long(buf, 0)  # map terminator block
    _write_long(buf, server_ts)
    _write_long(buf, client_ts)
    return buf.getvalue()


def decode_event(raw: bytes) -> dict:
    """Decode one Event record (handles negative block counts per spec)."""
    buf = io.BytesIO(raw)
    rec: dict = {"id": _read_string(buf), "name": _read_string(buf)}
    props: dict[str, str] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)  # block byte size, unused
        for _ in range(n):
            k = _read_string(buf)
            props[k] = _read_string(buf)
    rec["props"] = props
    rec["serverTimestamp"] = _read_long(buf)
    rec["clientTimestamp"] = _read_long(buf)
    return rec


# ---------------------------------------------------------------------------
# Spark column-level API
# ---------------------------------------------------------------------------


_NATIVE_AVRO: bool | None = None


def native_avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro SQL functions are actually usable.

    Probing the classloader (``Class.forName``) is a false positive on
    distributions that ship the avro classes without registering the SQL
    functions (``AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE`` at call time).
    The only reliable probe is executing a tiny ``to_avro`` expression
    end-to-end and falling back to the pandas codec on any failure.
    """
    global _NATIVE_AVRO
    if _NATIVE_AVRO is None:
        try:
            from pyspark.sql.avro.functions import to_avro

            probe = spark.range(1).select(
                to_avro(F.struct(F.lit("x").alias("a"))).alias("v")
            )
            probe.collect()
            _NATIVE_AVRO = True
        except Exception:
            _NATIVE_AVRO = False
    return _NATIVE_AVRO


def _pandas_encode(
    id_s: pd.Series, name_s: pd.Series, props_s: pd.Series, sts: pd.Series, cts: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            encode_event(i, n, p, int(s), int(c))
            for i, n, p, s, c in zip(id_s, name_s, props_s, sts, cts)
        ]
    )


def _pandas_decode(raw: pd.Series) -> pd.DataFrame:
    recs = [decode_event(bytes(b)) for b in raw]
    return pd.DataFrame.from_records(recs)


def to_avro_col(spark: SparkSession) -> Column:
    """Column expression encoding the five storage fields into Avro
    bytes. Input columns: id, name, props, serverTimestamp,
    clientTimestamp."""
    # NULL props must encode as an empty map on BOTH paths: the Avro
    # schema types props as a non-nullable map, so the native to_avro
    # would throw at runtime on a null row — a DataFrame that works in
    # the fallback container (encode_event coerces None to {}) must
    # not fail on a spark-avro cluster.
    props = F.coalesce(
        F.col("props"), F.expr("cast(map() as map<string,string>)")
    ).alias("props")
    if native_avro_available(spark):
        from pyspark.sql.avro.functions import to_avro

        return to_avro(
            F.struct("id", "name", props, "serverTimestamp", "clientTimestamp"),
            AVRO_EVENT_SCHEMA_JSON,
        )
    from eventsgateway_spark.shipping import ship_package

    ship_package(spark)  # fallback codec pickles by module reference
    enc = F.pandas_udf(_pandas_encode, "binary")
    return enc("id", "name", props, "serverTimestamp", "clientTimestamp")


def from_avro_col(spark: SparkSession, value_col: str = "value") -> Column:
    """Column expression decoding Avro bytes into the Event struct."""
    if native_avro_available(spark):
        from pyspark.sql.avro.functions import from_avro

        return from_avro(F.col(value_col), AVRO_EVENT_SCHEMA_JSON)
    from eventsgateway_spark.shipping import ship_package

    ship_package(spark)  # fallback codec pickles by module reference
    dec = F.pandas_udf(_pandas_decode, AVRO_EVENT_SCHEMA)
    return dec(value_col)

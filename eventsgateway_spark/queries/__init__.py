"""Declared query registry — the engine's analytics surface (SURVEY §2.5).

Every operator class the engine claims is backed by a named query here:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value hash, so builders and oracles follow the
determinism contract in ``queries/_util.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Import side-effect: populate the registry. Registration order is
# also the driver's evaluation order, so the modules that are cheap
# and were starved of CORRECTNESS rows in r2 come before the heavy
# pair-join family (ext_dedup / ext_pipeline).
from eventsgateway_spark.queries import relational  # noqa: E402,F401
from eventsgateway_spark.queries import events  # noqa: E402,F401
from eventsgateway_spark.queries import advanced  # noqa: E402,F401
from eventsgateway_spark.queries import ext_similarity  # noqa: E402,F401
from eventsgateway_spark.queries import ext_sampling  # noqa: E402,F401
from eventsgateway_spark.queries import ext_text  # noqa: E402,F401
from eventsgateway_spark.queries import ext_dedup  # noqa: E402,F401
from eventsgateway_spark.queries import ext_pipeline  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE_SQL", "query"]

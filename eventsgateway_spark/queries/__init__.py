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

# Driver-facing subset. The driver evaluates at most 50 queries per
# round in registration order; the full registry is larger, so each
# operator family nominates representatives here (exactly <= 50) and
# the rest stay local-only (still oracle-tested by pytest and timed by
# bench.py). ``declared=False`` marks a query as local-only.
DECLARED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
DECLARED_ORACLE_SQL: dict[str, str] = {}

_DRIVER_QUERY_CAP = 50


def query(name: str, oracle: str | None = None, *, declared: bool = True):
    """Register a query (and optionally its DuckDB oracle).

    ``declared=True`` additionally exposes it through
    ``__spark_entry__.queries()`` — the driver's correctness gate.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        if declared:
            DECLARED_QUERIES[name] = fn
            if oracle is not None:
                DECLARED_ORACLE_SQL[name] = oracle
            assert len(DECLARED_QUERIES) <= _DRIVER_QUERY_CAP, (
                f"declared registry exceeds the driver's {_DRIVER_QUERY_CAP}-"
                f"query evaluation window at {name!r}; demote a redundant "
                "query (declared=False) instead of silently starving the tail"
            )
        return fn

    return deco


# Import side-effect: populate the registry. Registration order is
# also the driver's evaluation order AND its time-budget order (r2
# exhausted the budget and starved the tail), so the families with the
# thinnest driver-verification history run first: ext_dedup/q63 and
# ext_pipeline/q60 had no correctness row before round 4.
from eventsgateway_spark.queries import ext_dedup  # noqa: E402,F401
from eventsgateway_spark.queries import ext_pipeline  # noqa: E402,F401
from eventsgateway_spark.queries import ext_text  # noqa: E402,F401
from eventsgateway_spark.queries import ext_sampling  # noqa: E402,F401
from eventsgateway_spark.queries import ext_similarity  # noqa: E402,F401
from eventsgateway_spark.queries import advanced  # noqa: E402,F401
from eventsgateway_spark.queries import ext_curation  # noqa: E402,F401
from eventsgateway_spark.queries import events  # noqa: E402,F401
from eventsgateway_spark.queries import relational  # noqa: E402,F401

__all__ = [
    "QUERIES",
    "ORACLE_SQL",
    "DECLARED_QUERIES",
    "DECLARED_ORACLE_SQL",
    "query",
]

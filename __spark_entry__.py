"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``eventsgateway_spark/queries/`` — this file only
re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eventsgateway_spark.queries import (  # noqa: E402
    DECLARED_ORACLE_SQL,
    DECLARED_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return DECLARED_QUERIES["q01_daily_event_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Exactly 50 queries (the driver's evaluation window): a static tier
    of family representatives plus this round's members of the
    rotation groups (SURVEY §2.5) — redundant same-family examples
    share a slot and alternate by round, so every query in the full
    registry gets a driver correctness row at least every 2 rounds.
    The full registry is oracle-tested by pytest and timed by bench.py
    every round.
    """
    return dict(DECLARED_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(DECLARED_ORACLE_SQL)

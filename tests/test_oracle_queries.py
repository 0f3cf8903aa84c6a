"""The correctness gate, run locally: every declared query with an
oracle must match DuckDB exactly at sf0.01 (same check the driver runs).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_spark_duckdb


def _pairs():
    from eventsgateway_spark.queries import ORACLE_SQL, QUERIES

    return sorted((name, QUERIES[name], ORACLE_SQL[name]) for name in ORACLE_SQL)


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_ORACLE)
    compare_spark_duckdb(df, duck, sql)


def test_all_queries_run_on_smoke_sf(spark):
    """Every registered query (with or without oracle) executes at sf0.001."""
    from eventsgateway_spark.queries import QUERIES

    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10

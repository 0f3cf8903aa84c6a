"""Tolerance checks for approximate aggregates (SURVEY §2.5 Q7 — these
are excluded from hash-matching by design)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_approx_distinct_within_tolerance(spark, duck):
    from eventsgateway_spark.queries import QUERIES

    rows = {
        r["event_type"]: r
        for r in QUERIES["q23_approx_distinct_users"](spark, SF_ORACLE).collect()
    }
    exact = dict(
        duck.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(rows) == set(exact)
    for et, r in rows.items():
        assert abs(r["approx_users"] - exact[et]) <= max(2, 0.05 * exact[et]), et


def test_percentile_approx_brackets_exact(spark, duck):
    from eventsgateway_spark.queries import QUERIES

    rows = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in QUERIES["q23_approx_distinct_users"](spark, SF_ORACLE).collect()
    }
    exact = {
        et: (p50, p95)
        for et, p50, p95 in duck.sql(
            "SELECT event_type, quantile_cont(value, 0.5), quantile_cont(value, 0.95)"
            " FROM events GROUP BY 1"
        ).fetchall()
    }
    for et, (p50, p95) in rows.items():
        assert abs(p50 - exact[et][0]) <= 0.05 * max(1.0, exact[et][0]), et
        assert abs(p95 - exact[et][1]) <= 0.05 * max(1.0, exact[et][1]), et

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


def test_hll_sketch_rollup_matches_exact_within_tolerance(spark, duck):
    """q50 — merged daily HLL sketches must estimate the true distinct
    user count per event_type within DataSketches' error bound
    (lgConfigK=14 → ~0.8% rsd; allow 3%), and the deterministic
    columns (n_days, n_events) must be exact."""
    from eventsgateway_spark.queries import QUERIES

    rows = {
        r["event_type"]: r
        for r in QUERIES["q50_hll_sketch_rollup"](spark, SF_ORACLE).collect()
    }
    exact = {
        et: (days, users, n)
        for et, days, users, n in duck.sql(
            "SELECT event_type, COUNT(DISTINCT CAST(ts AS DATE)),"
            " COUNT(DISTINCT user_id), COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        days, users, n = exact[et]
        assert r["n_days"] == days, et
        assert r["n_events"] == n, et
        assert abs(r["est_users"] - users) <= max(2, 0.03 * users), et


def test_hll_sketch_merge_equals_direct_sketch(spark):
    """Sketch mergeability: union of per-day sketches must equal a
    single sketch built over all days (same registers — identical
    estimate), proving daily partials can serve any coarser rollup."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.queries._util import table

    ev = table(spark, SF_ORACLE, "events")
    merged = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("est"))
        .collect()
    }
    assert merged == direct


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

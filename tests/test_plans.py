"""Physical-plan regression tests — the 100 TB posture checks.

Correctness says what a query returns; these pin HOW: dimension joins
must broadcast, scans must push filters into parquet, similarity
queries must never degenerate into a cartesian product, and the Engine
façade must register readable views. A plan regression here would pass
every value test and still fall over at scale.
"""

from __future__ import annotations

from eventsgateway_spark.engine import Engine
from eventsgateway_spark.queries import QUERIES
from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()


def test_q02_broadcasts_dimensions(spark):
    plan = _plan(spark, "q02_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # the fact-fact join may be SMJ/shuffled-hash, but no BNLJ/cartesian
    assert "CartesianProduct" not in plan


def test_q06_has_no_expand(spark):
    """The split-distinct rewrite must keep Expand (the mixed-distinct
    row duplicator) out of the plan."""
    plan = _plan(spark, "q06_pricing_summary")
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan  # 6-row distinct side broadcast


def test_events_scan_pushes_filters(spark):
    plan = _plan(spark, "q37_asof_purchase_view")
    # event_type filters must reach the parquet reader
    assert "PushedFilters: [" in plan
    assert "event_type" in plan.split("PushedFilters:", 1)[1][:500]


def test_similarity_queries_avoid_cartesian(spark):
    for name in ("q33_cosine_top3", "q38_embedding_near_dup"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
    # q33's query side is a broadcast nested loop — linear, by design
    assert "BroadcastNestedLoopJoin" in _plan(spark, "q33_cosine_top3")
    # q38 candidates come from bucket equi-joins
    assert "CartesianProduct" not in _plan(spark, "q38_embedding_near_dup")


def test_dedup_pair_join_is_equi(spark):
    plan = _plan(spark, "q30_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # inverted index = hash/SMJ


def test_engine_facade_registers_views(spark):
    eng = Engine(spark=spark, sf_dir=SF_ORACLE)
    assert eng.sql("select count(*) n from lineitem").collect()[0]["n"] > 0
    # events view must expose the normalized µs timestamp, not raw nanos
    assert dict(eng.sql("select * from events limit 1").dtypes)["ts"] == "timestamp"
    assert eng.query("q09_top10_customers_by_spend").count() == 10

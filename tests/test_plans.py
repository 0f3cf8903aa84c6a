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


def _logical(spark, name: str) -> str:
    """Optimized logical plan — forced join hints survive here as
    `leftHint=`/`rightHint=(strategy=broadcast)`, independent of what
    AQE picks at fixture scale."""
    return QUERIES[name](spark, SF_ORACLE)._jdf.queryExecution().optimizedPlan().toString()


def test_q02_broadcasts_dimensions(spark):
    plan = _plan(spark, "q02_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # the fact-fact join may be SMJ/shuffled-hash, but no BNLJ/cartesian
    assert "CartesianProduct" not in plan


def test_q45_gap_fill_broadcasts_daily_aggregate(spark):
    """The date-spine gap fill must broadcast the DAILY AGGREGATE (one
    row per day) as the right side of the left join: broadcasting the
    preserved spine side is unsupported for BroadcastHashJoin, so the
    old hint was silently ignored (HintErrorLogger) and both sides
    shuffle-sorted (round-10 fix)."""
    plan = _plan(spark, "q45_gap_fill_daily")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q06_has_no_expand(spark):
    """The split-distinct rewrite must keep Expand (the mixed-distinct
    row duplicator) out of the plan. (r15 re-verified: the single-scan
    two-level alternative measured SLOWER — see the q06 comment.)"""
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


def test_q38_verify_join_is_not_forced_corpus_broadcast(spark):
    """q38's verify join pulls the FULL embeddings table onto both
    sides of a vec_id equi-join; a forced broadcast there ships the
    whole corpus to every executor (OOM at scale). The logical plan
    must carry no broadcast hint — AQE may still broadcast the
    fixture-sized table at test scale, which is the desired behavior."""
    assert "strategy=broadcast" not in _logical(spark, "q38_embedding_near_dup")


def test_dedup_pair_join_is_equi(spark):
    plan = _plan(spark, "q30_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # inverted index = hash/SMJ


def test_lsh_verify_join_is_not_forced_candidate_broadcast(spark):
    """verify_pairs joins the LSH candidate list against the shingle
    table; candidates grow ~linearly with the corpus, so a FORCED
    broadcast is an OOM at scale — verify_pairs' own plan must carry
    no broadcast hint (AQE still broadcasts fixture-sized lists).
    Tested in isolation: q31's full plan legitimately holds the tiny
    hot-shingle-list hints from doc_shingles."""
    cand = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
    sh = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (2, "b c d")], "doc_id long, s string"
    )
    from eventsgateway_spark.queries.ext_dedup import verify_pairs

    plan = (
        verify_pairs(cand, sh, 0.1)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "strategy=broadcast" not in plan


def test_simhash_hamming_banding_is_equi(spark):
    """q63's candidate generation must be the banded equi-join — never
    an all-pairs scan with a popcount filter."""
    plan = _plan(spark, "q63_simhash_hamming_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_safe_windows_have_two_phase_shape(spark):
    """q61/q62: the skew-safe plans must show the intended physical
    shape — bounded per-bucket windows, a plain (hint-free) equi-join
    of the offsets back, and never a cartesian. The offsets frame has
    one row per (key, bucket) — globally |keys|x|buckets| — so a FORCED
    broadcast would be an OOM at scale; AQE may still choose broadcast
    at fixture scale, which is fine."""
    p61 = _plan(spark, "q61_skew_safe_running_sum")
    assert "CartesianProduct" not in p61
    assert "strategy=broadcast" not in _logical(spark, "q61_skew_safe_running_sum")
    p62 = _plan(spark, "q62_salted_topk_orders")
    assert "CartesianProduct" not in p62
    # two window phases = exactly two hash-partitioning exchanges:
    # (key, salt) local top-k, then key-level final rank
    assert p62.count("Exchange hashpartitioning") == 2


def test_no_cartesian_in_any_declared_query(spark):
    """Scale-killer sweep: NO declared query may plan a CartesianProduct
    at any scale. (Broadcast nested-loop is allowed only where a side
    is intentionally tiny — q33's broadcast query set.)"""
    from eventsgateway_spark.queries import QUERIES

    bad = []
    for name, fn in QUERIES.items():
        plan = (
            fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        )
        if "CartesianProduct" in plan:
            bad.append(name)
    assert not bad, f"cartesian products in: {bad}"


# Queries ALLOWED to plan a BroadcastNestedLoopJoin — each is a
# deliberate broadcast of a side that is tiny BY CONSTRUCTION (1-row
# scalar frames from crossJoin(broadcast(agg)), the fixed band table,
# or q33's bounded query set). Anything else planning a BNLJ is a
# latent all-pairs scan and must fail this sweep.
_BNLJ_ALLOWED = {
    "q04_price_band_join",  # broadcast fixed band table (non-equi by design)
    "q25_tfidf_topk",  # 1-row n_docs scalar
    "q33_cosine_top3",  # broadcast bounded query set (brute-force baseline)
    "q42_above_avg_spenders",  # 1-row threshold scalar
    "q43_ivf_ann",  # 1-row centroid array
    "q69_bm25_topk",  # 1-row corpus stats
    "q70_semantic_dedup",  # 1-row centroid array
    "q71_lm_quality_score",  # 1-row corpus total
    "q81_quantized_ann",  # broadcast bounded query set (q33's int8 twin)
    "q82_importance_weights",  # 1-row smoothing constants (v, totals)
    "q83_importance_resample",  # same 1-row constants via importance_model
    "q84_bigram_lm_score",  # 1-row vocabulary count
    "q86_ivf_cell_stats",  # 1-row centroid array (ivf_assign, q43's shape)
    "q94_knn_label_consistency",  # 1-row centroid array (q70's shape)
}


def test_bnlj_only_on_intentional_tiny_sides(spark):
    """Sweep: a BroadcastNestedLoopJoin outside the audited allowlist
    means some query degenerated into an all-pairs scan."""
    from eventsgateway_spark.queries import QUERIES

    bad = []
    for name, fn in QUERIES.items():
        plan = fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            bad.append(name)
    assert not bad, f"unexpected BroadcastNestedLoopJoin in: {bad}"


def test_query_paths_are_collect_free():
    """No driver-side .collect() in any query module — the operators
    must stay distributed. Allowed exceptions (driver-side scalars by
    design): kmeans' objective diagnostic and q32's convergence count
    use .count(), not .collect()."""
    import pathlib

    root = pathlib.Path(__file__).parent.parent / "eventsgateway_spark"
    offenders = []
    for py in (root / "queries").glob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            # a catalog metadata read (DESCRIBE ...) is a driver-sized
            # scalar by nature, not a distributed-data collect; such
            # lines carry an explicit pragma
            if ".collect(" in line and "# catalog-read" not in line:
                offenders.append(f"{py}:{i}")
    assert not offenders, f".collect() crept into query modules: {offenders}"


def test_engine_facade_registers_views(spark):
    eng = Engine(spark=spark, sf_dir=SF_ORACLE)
    assert eng.sql("select count(*) n from lineitem").collect()[0]["n"] > 0
    # events view must expose the normalized µs timestamp, not raw nanos
    assert dict(eng.sql("select * from events limit 1").dtypes)["ts"] == "timestamp"
    assert eng.query("q09_top10_customers_by_spend").count() == 10


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Co-located join via bucketing — the 100 TB strategy for a
    repeatedly-joined fact/dim pair: both sides bucketed (and sorted)
    on the join key join with ZERO Exchange in the plan. At scale this
    removes the dominant shuffle from every consumer of the pair."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.queries._util import table

    orders = table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "o"))
        .mode("overwrite")
        .saveAsTable("bk_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "l"))
        .mode("overwrite")
        .saveAsTable("bk_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bk_lineitem").join(
            spark.table("bk_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout co-locates both sides
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_orders")
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")


def test_lakehouse_partition_pruning(spark, tmp_path):
    """The y/m/d layout must prune at the directory level: a day-equality
    filter reads only that day's files and shows up as a PartitionFilter
    (not a data filter) in the scan."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.sources.lakehouse import (
        read_events_table,
        write_events_batch,
    )

    base = 1577836800000  # 2020-01-01 UTC, millis
    rows = [
        (f"id{d}-{i}", f"ev{i % 3}", base + d * 86_400_000 + i)
        for d in range(3)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id string, name string, clientTimestamp long")
    write_events_batch(df, str(tmp_path / "events"), mode="overwrite")

    tbl = read_events_table(spark, str(tmp_path / "events"))
    one_day = tbl.filter(
        (F.col("year") == "2020") & (F.col("month") == "01") & (F.col("day") == "02")
    )
    assert set(tbl.select("day").distinct().toPandas()["day"]) == {"01", "02", "03"}
    assert one_day.count() == 20
    # the day predicate must be a directory-level PartitionFilter on the
    # scan (pruned before reading), not a post-scan data filter
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "day" in pf and "02" in pf


def test_lakehouse_orc_roundtrip(spark, tmp_path):
    """The reference's at-rest deployment is ORC-on-S3 (Makefile:23-24,
    hive/hive-site.xml); the lakehouse writers/readers must round-trip
    the same partitioned layout through fmt='orc' with identical rows,
    string partition columns, and directory-level pruning."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.sources.lakehouse import (
        read_events_table,
        write_events_batch,
    )

    base = 1577836800000  # 2020-01-01 UTC, millis
    rows = [
        (f"id{d}-{i}", f"ev{i % 3}", base + d * 86_400_000 + i)
        for d in range(2)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id string, name string, clientTimestamp long")
    write_events_batch(df, str(tmp_path / "events_orc"), fmt="orc", mode="overwrite")

    tbl = read_events_table(spark, str(tmp_path / "events_orc"), fmt="orc")
    assert tbl.count() == 20
    assert dict(tbl.dtypes)["year"] == "string"
    got = {
        (r["id"], r["name"], r["clientTimestamp"], r["year"], r["month"], r["day"])
        for r in tbl.collect()
    }
    assert ("id1-3", "ev0", base + 86_400_000 + 3, "2020", "01", "02") in got
    assert len(got) == 20
    one_day = tbl.filter(F.col("day") == "02")
    assert one_day.count() == 10
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "orc" in plan.lower()


def test_lakehouse_delta_roundtrip(spark, tmp_path):
    """The reference lands events as Delta (.ipynb:119-135). This
    sandbox ships no Delta jars, so the test skips — on a Delta-enabled
    cluster it exercises the identical write/read path as the parquet
    and ORC roundtrips (fmt is a passthrough format string)."""
    import pytest

    from eventsgateway_spark.sources.lakehouse import (
        delta_available,
        read_events_table,
        write_events_batch,
    )

    if not delta_available(spark):
        pytest.skip("Delta jars not on the classpath (documented gap: "
                    "MIGRATION.md — parquet + idempotent MERGE upsert is "
                    "the functional analog)")

    base = 1577836800000  # 2020-01-01 UTC, millis
    rows = [
        (f"id{d}-{i}", f"ev{i % 3}", base + d * 86_400_000 + i)
        for d in range(2)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id string, name string, clientTimestamp long")
    write_events_batch(df, str(tmp_path / "events_delta"), fmt="delta", mode="overwrite")
    tbl = read_events_table(spark, str(tmp_path / "events_delta"), fmt="delta")
    assert tbl.count() == 20
    assert dict(tbl.dtypes)["year"] == "string"


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """A join between the partitioned events table and a filtered dim on
    the partition column must inject a dynamicpruning expression into
    the scan's PartitionFilters — at scale this is what keeps a
    dim-driven fact query from scanning every date partition."""
    from pyspark.sql import functions as F

    from eventsgateway_spark.sources.lakehouse import (
        read_events_table,
        write_events_batch,
    )

    base = 1577836800000  # 2020-01-01 UTC, millis
    rows = [
        (f"id{d}-{i}", f"ev{i % 3}", base + d * 86_400_000 + i)
        for d in range(3)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id string, name string, clientTimestamp long")
    write_events_batch(df, str(tmp_path / "events"), mode="overwrite")
    tbl = read_events_table(spark, str(tmp_path / "events"))

    dim = spark.createDataFrame(
        [("02", "keep"), ("03", "drop")], "day string, tag string"
    )
    j = tbl.join(dim.filter(F.col("tag") == "keep"), "day")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert j.count() == 20


def test_q69_topk_is_take_ordered(spark):
    """q69's final ranking must be a distributed partial top-k
    (TakeOrderedAndProject), never a corpus-wide single-partition sort:
    for common query terms the matching-doc set is corpus-scale, and a
    global row_number window would funnel it into one task. The only
    SinglePartition exchange allowed is the rank window over the
    already-collected 10 rows."""
    plan = _plan(spark, "q69_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    # everything ABOVE the top-k (printed first: Sort/Project/rank
    # Window) operates on the 10 collected rows and must need no
    # exchange at all; the global-scalar stats aggregate below may keep
    # its 1-row Exchange SinglePartition.
    above_topk = plan.split("TakeOrderedAndProject", 1)[0]
    assert "Window" in above_topk  # rank computed after the top-k
    assert "Exchange" not in above_topk


def test_decontamination_broadcasts_eval_grams(spark):
    """q53's eval-side gram set must broadcast (it scales with benchmark
    size, not corpus size) — the training-gram scan never shuffles for
    the join."""
    plan = _plan(spark, "q53_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _split_per_scan(df) -> tuple[int, int]:
    """(#split( expressions, #documents-parquet scans) in the optimized
    plan — the decon-family single-tokenization invariant says these
    must be EQUAL: one tokenization pass per scan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    scans = len(re.findall(r"Relation \[.*\btext#.*parquet", plan))
    return plan.count("split("), max(scans, 1)


def test_decon_family_tokenizes_once(spark):
    """The round-2 AND round-8 regression, pinned for good: `ngrams`
    references its argument ~8 times inside lambdas, and Catalyst does
    not CSE under lambda functions, so an inlined `split(text)`
    re-evaluates per reference (measured 26x on q53 at sf0.1 —
    BASELINE.md round 9). The fix projects `toks` as a real column,
    which CollapseProject refuses to re-inline (non-cheap alias,
    multiple references). Pin: exactly ONE `split(` per documents scan
    in the optimized plan of every decon-family consumer — q53, q79,
    and both streaming corpus-prep screens."""
    import numpy as np

    from eventsgateway_spark.operators.bloom import (
        bloom_from_hashes,
        bloom_probe_count_udf,
    )
    from eventsgateway_spark.streaming.corpus_prep import (
        _eval_grams_frame,
        _screen_bloom_flag,
        _screen_exact_grams,
    )

    for name in ("q53_decontaminate", "q79_bloom_decontaminate"):
        df = QUERIES[name](spark, SF_ORACLE)
        n_split, n_scan = _split_per_scan(df)
        assert n_split == n_scan, (
            f"{name}: {n_split} split( for {n_scan} documents scans — "
            "tokenization re-inlined under a lambda (see decon_toks)"
        )

    # registry-wide sweep: no query may tokenize more than once per
    # documents scan. q60 is the documented exception (its MIN_TOKENS
    # quality-floor filter gets predicate-pushed below the toks
    # projection — a bounded 2x on the pre-pin stage, not the 7x
    # lambda re-inline; above fixture scale its pins materialize after
    # one pass so the fixture-scale rescans don't occur).
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF_ORACLE)
        n_split, n_scan = _split_per_scan(df)
        cap = 3 * n_scan if name == "q60_corpus_prep" else n_scan
        assert n_split <= cap, (
            f"{name}: {n_split} split( for {n_scan} documents scans — "
            "tokenization re-inlined (project toks once; see decon_toks)"
        )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    for label, frame in (
        ("exact screen", _screen_exact_grams(docs)),
        (
            "bloom screen",
            _screen_bloom_flag(
                docs,
                bloom_probe_count_udf(
                    spark, bloom_from_hashes(np.arange(16, dtype=np.int64))
                ),
            ),
        ),
        ("eval gram builder", _eval_grams_frame(docs)),
    ):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        n = plan.count("split(")
        assert n <= 1, (
            f"corpus-prep {label}: {n} split( in one-scan plan — "
            "tokenization re-inlined under a lambda (see decon_toks)"
        )


def test_scale_mode_auto_pick_at_fixture_scale(spark):
    """q57 (rank battery) and q72 (substring ownership) switch their
    scale paths on measured input size since round 11 (VERDICT r10 #3
    — the with_keep_first pattern); at fixture scale both must pick
    the measured-faster small-scale shape: q57 the native window
    battery (plan carries ntile), q72 window-function ownership (a
    partitioned WindowExec on the hash key, no ownership join)."""
    q57 = _plan(spark, "q57_spend_deciles")
    assert "ntile" in q57  # window mode; prefix derives ntile arithmetically
    q72 = _plan(spark, "q72_substring_dedup")
    # window-mode ownership: min(doc_id) as a window function over h
    assert "windowspecdefinition(h" in q72
    # and size-unknowable inputs take the distributed twin (the
    # huge-counts-as-safe direction): exercised via the env override
    # equality tests in test_ext.py plus input_bytes' sentinel.


def test_q33_norms_precomputed_below_join(spark):
    """q33's 0.66 s rewrite (BASELINE.md round-6): per-vector norms are
    folded ONCE in the projections BELOW the broadcast join, never
    per-pair above it — inline cosine() would re-fold the norm
    |queries|x|candidates| times (interpreted HOF, not codegen). Pin:
    exactly two SQRT folds in the optimized plan, both on the join's
    child side, and the join itself is the broadcast nested-loop scan
    (one pass over the big side, no shuffle)."""
    opt = _logical(spark, "q33_cosine_top3")
    lines = opt.splitlines()
    join_at = min(i for i, l in enumerate(lines) if "Join" in l)
    sqrt_at = [i for i, l in enumerate(lines) if "SQRT" in l]
    assert len(sqrt_at) == 2, f"expected 2 norm folds, plan has {len(sqrt_at)}"
    assert all(i > join_at for i in sqrt_at), (
        "norm fold appears ABOVE the join (per-pair recompute)"
    )
    assert "BroadcastNestedLoopJoin" in _plan(spark, "q33_cosine_top3")


def test_q83_topk_is_take_ordered(spark):
    """q83's global top-k must be TakeOrderedAndProject (per-partition
    bounded heap, driver merge of k candidates per partition) — never
    a global Sort exchange; the rank window sits ABOVE the take, so it
    runs over the k surviving rows, not the corpus (the SCALE.md
    bounded-global-window rule)."""
    from eventsgateway_spark.queries import QUERIES

    plan = (
        QUERIES["q83_importance_resample"](spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    window_at = plan.index("Window")
    take_at = plan.index("TakeOrderedAndProject")
    assert window_at < take_at, "rank window must consume the take's output"


def test_q81_codes_quantized_below_join(spark):
    """q81's int8 code arrays must be computed in the projections BELOW
    the broadcast join — one transform() fold per vector — never
    re-quantized per pair above it (the q33 norm-fold discipline; the
    only per-pair expression is the integer dot aggregate)."""
    from eventsgateway_spark.queries import QUERIES

    plan = (
        QUERIES["q81_quantized_ann"](spark, SF_ORACLE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    above = plan[: plan.index("Join")]
    assert above.count("transform(") == 0, "codes recomputed per-pair"
    assert above.count("aggregate(") == 1  # the per-pair integer dot

"""Registry-rotation invariants (SURVEY §2.5).

The driver evaluates at most 50 queries per round; the rotation must
guarantee (a) the cap is met every round, (b) every query gets a
driver correctness row with a gap of at most 2 rounds (except the
by-nature-approximate ALWAYS_LOCAL set), and (c) every §2 operator
family keeps >=1 declared representative in every rotation phase.
These are pure-registry tests — no Spark session needed.
"""

from __future__ import annotations

import eventsgateway_spark.queries as Q

# Family -> member queries (from SURVEY §2.5 / VERDICT coverage table).
# A family passes a round if ANY member is declared that round.
FAMILIES: dict[str, list[str]] = {
    "Q1_projection_filter": ["q01_daily_event_counts", "q11_scalar_gallery"],
    "Q2_equi_join": ["q02_revenue_by_nation", "q05_priority_with_bulk_lineitems"],
    "Q3_semi_anti": ["q03_customers_without_big_orders"],
    "Q4_theta_range": ["q04_price_band_join"],
    "Q5_asof": ["q37_asof_purchase_view"],
    "Q6_agg_rollup_cube_pivot": [
        "q06_pricing_summary",
        "q07_rollup_revenue",
        "q17_cube_event_stats",
        "q44_pivot_daily_matrix",
        "q20_grouping_sets_lineitem",
    ],
    "Q8_window": [
        "q08_top3_orders_per_customer",
        "q46_moving_7day_revenue",
        "q61_skew_safe_running_sum",
    ],
    "Q9_topk": ["q09_top10_customers_by_spend"],
    "Q10_setops": ["q10_segment_set_ops"],
    "Q11_scalar": ["q11_scalar_gallery"],
    "Q12_array_map": ["q13_props_json_extract", "q21_token_explode"],
    "Q15_dedup": ["q16_dedup_latest_per_user_type"],
    "Q16_udf": ["q22_pandas_udf_scoring", "q41_grouped_pandas_rank"],
    "Q17_text": ["q24_bigram_counts", "q40_token_budget", "q65_text_profile"],
    "Q18_similarity": [
        "q33_cosine_top3",
        "q34_lsh_buckets",
        "q43_ivf_ann",
        "q70_semantic_dedup",
        "q94_knn_label_consistency",
    ],
    "Q19_fuzzy_dedup": [
        "q29_exact_dedup_groups",
        "q30_jaccard_pairs",
        "q31_minhash_lsh_pairs",
        "q32_dedup_clusters",
        "q93_minhash_calibration",
    ],
    "Q20_multimodal": [
        "q36_binary_payloads",
        "q52_embedding_quantize",
        "q89_image_dhash_near_dup",
        "q90_audio_fingerprint_near_dup",
        "q91_cross_modal_dup_consensus",
        "q92_media_band_stats",
    ],
    "Q21_curation": [
        "q66_pii_redaction",
        "q67_quality_rules",
        "q68_shard_manifest",
        "q69_bm25_topk",
        "q78_repetition_filters",
    ],
    "sampling": [
        "q47_hash_split",
        "q48_balanced_sample",
        "q74_token_budget_sample",
        "q75_domain_mixture",
        "q76_training_order",
        "q77_leakage_safe_split",
    ],
    "pipeline": ["q60_corpus_prep"],
    "skew": [
        "q61_skew_safe_running_sum",
        "q62_salted_topk_orders",
        "q73_sequence_packing",  # distributed prefix sum, q61's operator
        "q88_packing_density",  # same bucketed prefix sum, q73's lineage
    ],
}


def test_registry_partition():
    """static + rotation pool + always-local partitions the registry."""
    pool = {n for g in Q.ROTATION for n in g}
    static = set(Q.STATIC_QUERIES)
    assert not pool & static
    assert not pool & Q.ALWAYS_LOCAL
    assert not static & Q.ALWAYS_LOCAL
    assert pool | static | Q.ALWAYS_LOCAL == set(Q.QUERIES)
    # no query sits in two rotation groups
    assert len(pool) == sum(len(g) for g in Q.ROTATION)


def test_qnn_prefixes_unique():
    """bench.py keys its stdout JSON by the qNN prefix (the driver keeps
    only a ~2000-char stdout tail; full names overflow it) — the prefix
    must stay a unique key for the whole registry."""
    prefixes = [n.split("_", 1)[0] for n in Q.QUERIES]
    assert len(set(prefixes)) == len(prefixes)


def test_bench_json_line_fits_driver_tail():
    """Worst-case bench stdout line (every timing 4-decimal, 4-digit
    seconds) must stay under the ~2000-char stdout tail the recording
    harness keeps — registry growth would otherwise silently reintroduce
    the BENCH_r{1..9} parsed:null failure at ~110 queries."""
    import json

    line = json.dumps(
        {
            "metric": "declared_queries_total",
            "value": 9999.9999,
            "unit": "sec",
            # 3-digit seconds is the honest per-query worst case: a
            # single 1000 s query would blow the driver's whole bench
            # budget long before line length mattered (observed sf0.1
            # maxima are ~15 s). 2-decimal precision since round 14
            # (centisecond resolution is below the host drift noise).
            "queries": {n.split("_", 1)[0]: 999.99 for n in Q.QUERIES},
            "sf": 0.1,
            # the fixed-size annotation fields bench.py also emits
            # (floor/ctrl/value_norm; inflated is bounded at 10 rows
            # but near-empty on a clean run — model 3). ctrl stats are
            # [min, med, max] arrays since round 14.
            "floor_total": 9999.99,
            "ctrl": [9.999, 9.999, 9.999],
            "ctrl2": [9.999, 9.999, 9.999],
            "value_norm": 9999.99,
            "inflated": {"q00": 9.9, "q01": 9.9, "q02": 9.9},
        }
    )
    # VERDICT r11 #5: ~1800 keeps ≥200 chars of true margin under the
    # 2000-char tail even in the worst all-4-digit-seconds case
    # (measured 1607 at 84 queries — ~16 chars of headroom per query,
    # so this bound trips at ~96 queries, before the window does)
    assert len(line) < 1800, (len(line), "shorten keys or drop precision")


def test_declared_is_exactly_cap_every_phase():
    for rn in range(1, 16):
        qs, osql = Q.rotated_declared(rn)
        assert len(qs) == 50, rn
        # every declared query carries an oracle — the driver can
        # hash-check 100% of the declared surface
        assert set(osql) == set(qs), rn


def test_max_gap_without_driver_row_is_two_rounds():
    tracked = set(Q.QUERIES) - Q.ALWAYS_LOCAL
    gap = dict.fromkeys(tracked, 0)
    for rn in range(1, 16):
        dec = set(Q.rotated_declared(rn)[0])
        for n in tracked:
            gap[n] = 0 if n in dec else gap[n] + 1
            if rn > 3:  # after one full cycle of the longest group
                assert gap[n] <= 2, (n, rn)


def test_family_coverage_every_phase():
    for rn in range(1, 13):
        dec = set(Q.rotated_declared(rn)[0])
        for fam, members in FAMILIES.items():
            assert dec & set(members), (fam, rn)


def test_always_local_is_only_the_unhashable():
    """Only by-nature-approximate queries may be exempt from rotation,
    and they must still be registered (pytest-tested)."""
    assert Q.ALWAYS_LOCAL <= set(Q.QUERIES)
    for n in Q.ALWAYS_LOCAL:
        assert n not in Q.ORACLE_SQL, n  # no oracle = can't hash-match


def test_current_round_reads_driver_artifacts(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    assert Q.current_round() == 7
    monkeypatch.delenv("SPARK_GRAFT_ROUND")
    # the committed ROUND file pins a fresh artifact-less checkout to
    # the intended phase (ADVICE r5); driver artifacts can only move
    # the round FORWARD past a stale ROUND file, so on any checkout of
    # this commit the round is deterministic and >= 6
    assert Q.current_round() >= 6


def test_rotated_members_run_first():
    """Evaluation order: this round's rotation members (thinnest driver
    history) must precede the static tier in queries() ordering, so a
    driver time budget starves the well-verified tail, not them."""
    order = list(Q.DECLARED_QUERIES)
    rotated = {g[Q.current_round() % len(g)] for g in Q.ROTATION}
    assert set(order[: len(rotated)]) == rotated


def test_no_bare_timestamp_output_columns(spark):
    """_util contract: no registered query may project a bare
    TIMESTAMP — collect() renders TimestampType through the PROCESS
    timezone (not the session zone), so a bare column silently drifts
    from the DuckDB oracle whenever the driver runs under a non-UTC
    TZ. Caught live by the round-8 hostile-TZ sweep (q59); this pins
    the contract for every query, declared or not. The check recurses
    into arrays/structs/maps — collect() renders a NESTED
    TimestampType element (e.g. collect_list('ts')) through the
    process timezone exactly like a bare column."""
    from pyspark.sql.types import ArrayType, MapType, StructType, TimestampType

    from tests.conftest import SF_SMALL

    def has_ts(dt) -> bool:
        if isinstance(dt, TimestampType):
            return True
        if isinstance(dt, ArrayType):
            return has_ts(dt.elementType)
        if isinstance(dt, MapType):
            return has_ts(dt.keyType) or has_ts(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_ts(f.dataType) for f in dt.fields)
        return False

    offenders = []
    for name, fn in sorted(Q.QUERIES.items()):
        schema = fn(spark, SF_SMALL).schema
        bad = [f.name for f in schema.fields if has_ts(f.dataType)]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "bare TIMESTAMP output columns (project DATE or a "
        f"date_format string instead): {offenders}"
    )


def test_registry_size_fits_driver_stdout_window():
    """The driver records only the last ~2000 chars of bench.py stdout
    (BASELINE.md round-11 recovery note: rounds 1-9 overflowed it and
    carry parsed:null forever). The compact qNN JSON line costs ~16
    chars per query plus ~250 of metadata (measured 1240 chars at 83
    queries), so the registry must stay comfortably under ~106
    queries — at 100, move more fields to stderr BEFORE registering
    the next query."""
    import eventsgateway_spark.queries as Q

    assert len(Q.QUERIES) <= 100, (
        "bench stdout JSON is approaching the driver's 2000-char tail "
        "window; slim the stdout line (floors/ctrl to stderr) first"
    )

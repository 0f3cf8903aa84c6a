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
# round; the full registry is larger, so the declared set is built in
# two tiers (SURVEY §2.5):
#   * STATIC — ``declared=True`` at registration: the sole/strongest
#     representative of each operator family, declared every round.
#   * ROTATION — groups (pairs/triples) of mutually-redundant queries
#     registered ``declared=False``; each group owns ONE declared slot
#     filled by ``group[round % len(group)]``, so every pool query
#     gets a driver correctness row at least every 2 rounds.
# Everything not declared in a given round is still DuckDB-oracle-
# tested by pytest and timed by bench.py.
DECLARED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
DECLARED_ORACLE_SQL: dict[str, str] = {}

_DRIVER_QUERY_CAP = 50


def query(name: str, oracle: str | None = None, *, declared: bool = True):
    """Register a query (and optionally its DuckDB oracle).

    ``declared=True`` additionally exposes it through
    ``__spark_entry__.queries()`` — the driver's correctness gate.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release every OTHER query's persisted pins before
            # building this one (ADVICE r6): long-lived sessions that
            # never call unpin_all() themselves (correctness driver,
            # notebooks) are bounded to one query's pins, while
            # re-runs of the same query keep their CacheManager
            # entries (bench warm-up semantics unchanged). Registered
            # queries never call each other (grep-audited), so this
            # cannot evict a pin the current build created.
            from eventsgateway_spark.queries._util import (
                set_pin_owner,
                unpin_others,
            )

            unpin_others(name)
            # Owner is tagged only for the duration of this build and
            # reset in finally (ADVICE r7): without the reset, pin()
            # calls made later by NON-registry code would be
            # attributed to the last-run query and then survive that
            # query's own unpin_others forever. Single-threaded-build
            # assumption: concurrent registry builds in threads would
            # cross-tag each other's pins (premature unpersist =>
            # recompute, never corruption) — the driver, bench, and
            # pytest all build queries sequentially.
            set_pin_owner(name)
            try:
                return fn(spark, sf_dir)
            finally:
                set_pin_owner(None)

        QUERIES[name] = run
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        if declared:
            DECLARED_QUERIES[name] = run
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

# ---------------------------------------------------------------------------
# Rotation (SURVEY §2.5): groups of mutually-redundant queries sharing
# one declared slot; member ``group[round % len(group)]`` is declared,
# so every pool query gets a driver correctness row with a gap of at
# most ``len(group) - 1`` rounds (1 for pairs, 2 for triples — never
# more than the 2-round ceiling). Groups are chosen so that in EVERY
# rotation phase each §2 operator family keeps >=1 declared
# representative via the static tier or an in-rotation sibling (the
# only family with no static representative is Q12 array/map, whose
# two reps q13/q21 therefore share a group; audited by
# tests/test_registry.py).
# ---------------------------------------------------------------------------
ROTATION: list[tuple[str, ...]] = [
    ("q13_props_json_extract", "q21_token_explode"),  # Q12: must stay a pair
    # Round 12 extends the pair with q87 (near-dup cluster-size
    # histogram — the dedup yield report over the q32 lineage) at
    # INDEX 1: 13 % 3 == 1 gives it a driver row in round 13, the
    # round after it lands (the q80 registered-then-debut precedent);
    # q05 keeps its round-12 slot (12 % 3 == 0), q12 takes r14. Family
    # coverage: Q19 keeps q30/q31/q32 declared every phase.
    ("q05_priority_with_bulk_lineitems", "q87_cluster_size_histogram",
     "q12_late_shipments"),
    # q84 (bigram-LM coherence score — q71's order-sensitive
    # complement) debuts at index 2 like its round-11 siblings.
    ("q45_gap_fill_daily", "q14_user_running_stats",
     "q84_bigram_lm_score"),
    # round-11 additions at index 2 (11 % 3 == 2 → both debut with a
    # driver row the round they land): q81 extends the Q18 similarity
    # family with the int8-quantized retrieval path (slot-mates are
    # long-green statics-adjacent members; q33/q34/q38/q43 keep Q18
    # declared every phase), q82 extends the Q22 selection family with
    # DSIR importance weights (q73-q77 keep the family covered).
    ("q35_embedding_stats", "q20_grouping_sets_lineitem",
     "q81_quantized_ann"),
    ("q19_fullouter_daily_activity", "q42_above_avg_spenders",
     "q82_importance_weights"),
    ("q72_substring_dedup", "q55_cohort_retention", "q56_repetition_ratio"),
    # q83 (Gumbel-top-k importance resampling — q82's selection step)
    # debuts at index 2 like its round-11 siblings.
    ("q44_pivot_daily_matrix", "q49_salted_hot_key_agg",
     "q83_importance_resample"),
    ("q71_lm_quality_score", "q46_moving_7day_revenue", "q57_spend_deciles"),
    ("q70_semantic_dedup", "q41_grouped_pandas_rank", "q58_exact_moments"),
    # triples hold the most-redundant examples (2-round max gap)
    ("q25_tfidf_topk", "q26_language_id", "q27_quality_score"),
    ("q63_simhash_hamming_pairs", "q39_simhash", "q28_fingerprint"),
    ("q64_active_users", "q18_sessionize", "q59_clean_conversion"),
    ("q62_salted_topk_orders", "q54_funnel", "q48_balanced_sample"),
    # round-6 additions: the new corpus-prep selectors debut in the even
    # phase (index 0 = round 6) so they get a driver row immediately;
    # their long-green siblings take the odd phase. Family coverage
    # holds because q73 is itself a skew-family member (distributed
    # prefix sum) and q74 a sampling-family member (tests/test_registry
    # FAMILIES).
    # Round 12 extends the pair with q88 (per-sequence packing-density
    # audit — shares q73's bucketed-prefix-sum lineage) at INDEX 1 for
    # a round-13 driver debut; q73 keeps its round-12 slot, q61 takes
    # r14 (its Q8 family keeps q08/q46-adjacent statics declared).
    ("q73_sequence_packing", "q88_packing_density",
     "q61_skew_safe_running_sum"),
    # Round 13 extends the pair with q89 (perceptual-hash image
    # near-dup pairs — the multimodal member of the dedup family) at
    # INDEX 1: 13 % 3 == 1 gives it a driver row the round it lands
    # (the q86 immediate-debut precedent); q74 keeps its round-12 slot
    # (12 % 3 == 0), q47 takes r14. Family coverage: Q19 keeps
    # q30/q31/q32 and Q20 keeps q36/q52 declared every phase.
    # HISTORY NOTE (ADVICE r13): extending the (q74, q47) pair to a
    # triple changes what rotated_declared(n) returns for rounds
    # <= 12 (e.g. 10 % 3 == 1 now picks q89 where the pair picked
    # q74). Frozen CORRECTNESS_rN records are never re-validated
    # against a re-derived declared set — they are driver outputs,
    # not registry functions — so the retroactive shift is accepted;
    # the same applies to every group extension above.
    ("q74_token_budget_sample", "q89_image_dhash_near_dup",
     "q47_hash_split"),
    # q75/q76 (temperature mixture weights / weighted training order)
    # debut in the even phase; their slot-mates q07/q17 are long-green
    # statics demoted because family Q6 keeps q06 declared every phase.
    # Round 12 extends the pair with q86 (IVF cell-occupancy audit at
    # the derived cell count) at INDEX 0 — 12 % 3 == 0 gives it a
    # driver row the round it lands; q75 (last row r10) takes r13,
    # q07 (last row r11) takes r14 — both at the 2-round ceiling.
    # Family coverage: Q18 keeps q33/q34/q38/q43 declared every phase.
    ("q86_ivf_cell_stats", "q75_domain_mixture", "q07_rollup_revenue"),
    # Round 13 extends the pair with q90 (audio-fingerprint near-dup —
    # q89's audio sibling) at INDEX 2: 14 % 3 == 2 gives it a round-14
    # driver debut (the q87/q88 registered-then-debut precedent);
    # phases 12/13 keep picking q76/q17 exactly as the pair did
    # (12 % 3 == 0 → q76, 13 % 3 == 1 → q17), so no declared set
    # before round 14 changes. Family coverage unchanged (Q19/Q20
    # statics stay declared every phase).
    ("q76_training_order", "q17_cube_event_stats",
     "q90_audio_fingerprint_near_dup"),
    # q77 (leakage-safe split) debuted even-phase round 6; slot-mate
    # q29 is a demoted Q19 static (q30/q31/q32 keep the family
    # declared). Round 10 extends the pair with q80 (quality
    # propagation over the same near-dup graph q32/q77 consume):
    # index 2 puts its driver debut at round 11.
    ("q77_leakage_safe_split", "q29_exact_dedup_groups",
     "q80_quality_propagation"),
    # q78 (Gopher char-fraction repetition filters) debuts even-phase
    # (round 8); slot-mate q67 is a demoted Q21 static (q66/q68/q69
    # keep the curation family declared every phase). Round 12 extends
    # the pair with q85 (LSH table-family occupancy audit — the
    # candidate-volume contract of the round-12 OR-construction
    # ladder) at INDEX 0 for an immediate driver row; q78 (last row
    # r10) takes r13, q67 (last row r11) takes r14.
    ("q85_lsh_table_stats", "q78_repetition_filters", "q67_quality_rules"),
    # Round 13: q91 (cross-modal dup consensus over the q89/q90 pair
    # lineages) pairs with q36, a demoted Q20 static (q52 keeps the
    # family declared every phase). Index math: 13 % 2 == 1 → q36
    # keeps a round-13 row exactly as it had as a static (the r13
    # declared SET is unchanged by this registration); 14 % 2 == 0 →
    # q91 debuts in round 14 alongside its q90 input sibling.
    ("q91_cross_modal_dup_consensus", "q36_binary_payloads"),
    # Round 13: q92 (media band-occupancy audit — the q85/q86
    # candidate-volume contract for the Manku family) pairs with q33,
    # a demoted Q18 static (q34/q43 keep the family declared every
    # phase). Index math: 13 % 2 == 1 → q92 debuts the round it lands
    # (the q89 precedent); q33 — static-green through r12 — takes r14
    # (gap 2) and alternates thereafter.
    ("q33_cosine_top3", "q92_media_band_stats"),
    # Round 14: q93 (MinHash estimator-calibration audit — the
    # q85/q86/q92 discipline applied to q31's hash family) pairs with
    # q31 itself, demoted from the static tier: one shared lineage
    # (minhash_components / minhash_band_candidates), two views, so
    # they are maximally redundant slot-mates. Index math: 14 % 2 == 0
    # → q93 debuts the round it lands (the q89/q92 precedent); q31 —
    # static-green through r13 — takes r15 (gap 2, the ceiling).
    # Family coverage: Q19 keeps q30/q32 declared every phase.
    ("q93_minhash_calibration", "q31_minhash_lsh_pairs"),
    # Round 14: q94 (within-cell kNN label-consistency audit — q70's
    # SemDeDup skeleton voting labels instead of dropping dups) pairs
    # with q34, a demoted Q18 static (q43 keeps the family declared
    # every phase, q38 static). Index math: 14 % 2 == 0 → q94 debuts
    # the round it lands; q34 — static-green through r13 — takes r15
    # (gap 2).
    ("q94_knn_label_consistency", "q34_lsh_buckets"),
]

# Approximate by nature (approx_count_distinct / HLL / Bloom false
# positives) — can never hash-match a DuckDB oracle, so they never burn
# a driver slot; their correctness lives in pytest tolerance/invariant
# tests (tests/test_approx.py, tests/test_bloom.py).
ALWAYS_LOCAL = {
    "q23_approx_distinct_users",
    "q50_hll_sketch_rollup",
    "q79_bloom_decontaminate",
}

# Used when neither the ROUND file nor any CORRECTNESS_r*.json is
# present (should not happen on a committed checkout — ROUND is in git).
_FALLBACK_ROUND = 6


def current_round() -> int:
    """Build-round number. Resolution order (ADVICE r5 — the declared
    set must not depend on untracked driver artifacts alone):

    1. ``SPARK_GRAFT_ROUND`` env override (tests / phase probes).
    2. max(committed ``ROUND`` file, highest CORRECTNESS_r{N}.json + 1)
       — the ROUND file pins a fresh artifact-less checkout to the
       intended phase, while the artifact inference keeps a stale
       ROUND file from freezing later rounds (the driver writes
       CORRECTNESS_r{N}.json AFTER evaluating round N, so during
       round N the max on disk is N-1).
    """
    import os
    import re

    override = os.environ.get("SPARK_GRAFT_ROUND")
    if override:
        return int(override)
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = []
    try:
        with open(os.path.join(root, "ROUND")) as f:
            candidates.append(int(f.read().strip()))
    except (OSError, ValueError):
        pass
    rounds = []
    try:
        for fname in os.listdir(root):
            m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
            if m:
                rounds.append(int(m.group(1)))
    except OSError:
        pass
    if rounds:
        candidates.append(max(rounds) + 1)
    return max(candidates) if candidates else _FALLBACK_ROUND


def rotated_declared(
    round_no: int | None = None,
) -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    """The full declared set for ``round_no``: this round's rotation
    members FIRST (they have the thinnest driver-verification history,
    and the driver's evaluation budget runs in registration order —
    r2 starved the tail), then the static tier in registration order."""
    rn = current_round() if round_no is None else round_no
    rotated = [group[rn % len(group)] for group in ROTATION]
    missing = [n for n in rotated if n not in QUERIES]
    assert not missing, f"ROTATION names unknown queries: {missing}"
    overlap = [n for pair in ROTATION for n in pair if n in STATIC_QUERIES]
    assert not overlap, (
        f"rotation-pool members must register declared=False: {overlap}"
    )
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    osql: dict[str, str] = {}
    for n in rotated:
        qs[n] = QUERIES[n]
        if n in ORACLE_SQL:
            osql[n] = ORACLE_SQL[n]
    for n, fn in STATIC_QUERIES.items():
        qs[n] = fn
        if n in STATIC_ORACLE_SQL:
            osql[n] = STATIC_ORACLE_SQL[n]
    assert len(qs) <= _DRIVER_QUERY_CAP, (
        f"declared set ({len(qs)}) exceeds the driver's "
        f"{_DRIVER_QUERY_CAP}-query evaluation window"
    )
    return qs, osql


# Snapshot the static tier, then replace the exported declared view
# with this round's rotated full set; __spark_entry__ re-exports it.
STATIC_QUERIES = dict(DECLARED_QUERIES)
STATIC_ORACLE_SQL = dict(DECLARED_ORACLE_SQL)
DECLARED_QUERIES, DECLARED_ORACLE_SQL = rotated_declared()

__all__ = [
    "QUERIES",
    "ORACLE_SQL",
    "DECLARED_QUERIES",
    "DECLARED_ORACLE_SQL",
    "ROTATION",
    "ALWAYS_LOCAL",
    "current_round",
    "rotated_declared",
    "query",
]

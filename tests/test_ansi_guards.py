"""ANSI-bomb guard regression tests (VERDICT r10 #6 + ADVICE r10).

The round-10 audit added defined-null / exclusion guards for input
shapes the shipped fixtures never contain: zero-norm embeddings,
zero-length documents, sources whose documents are all empty,
single-node near-dup graphs, and non-integral client-controlled
numeric strings. Spark 4 runs ANSI mode by default, so an unguarded
division or cast on such rows is a runtime error (or a silent
cross-engine divergence for try_cast) that the driver would only
discover after a fixture regen. These tests feed each guard its bomb
LOCALLY: a hostile fixture directory is written once per session and
every affected registry query runs END-TO-END against its real DuckDB
oracle on that data — the exact driver comparison, on inputs the
driver never sends.
"""

from __future__ import annotations

import datetime
import json

import pytest

from tests.oracle_harness import compare_spark_duckdb

# ---------------------------------------------------------------------------
# Hostile fixture: same schemas as /root/testdata, adversarial content
# ---------------------------------------------------------------------------

_DIM = 8
_N_VEC = 30
_ZERO_VEC_ID = 25  # the zero-norm row (norm_view must exclude it)


def _vec(i: int) -> list[float]:
    if i == _ZERO_VEC_ID:
        return [0.0] * _DIM
    # deterministic, irregular, sign-mixed — no RNG, no ties at 1e-6
    return [((i * 7 + d * 3) % 11 - 5) / 7.0 + d / 100.0 for d in range(_DIM)]


_DUP_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_DOCS = [
    # (doc_id, text, lang, source) — n_chars derived
    (0, _DUP_TEXT, "en", "web"),  # 3-member exact-dup cluster {0, 1, 7}
    (1, _DUP_TEXT, "en", "web"),
    (2, "one two three four five six seven eight nine ten", "en", "web"),
    (3, "alpha beta gamma delta epsilon different tail here now", "en", "wiki"),
    (4, "", "xx", "void"),  # zero-length doc; source 'void' is ALL empty
    (5, "", "xx", "void"),  # -> q40 sums 0 subword tokens (greatest-guard)
    (6, "hello", "en", "wiki"),  # shorter than the shingle width -> isolated
    (7, _DUP_TEXT, "en", "wiki"),
    (8, " ", "xx", "wiki"),  # whitespace-only: tokenizes to zero tokens
]

_PROPS = [
    '{"k": "12.5"}',  # THE divergence: DuckDB TRY_CAST rounds to 13,
    # Spark try_cast yields NULL — the integral guard nulls it in BOTH
    '{"k": "7"}',
    '{"k": "-3"}',
    '{"k": "abc"}',
    '{"k": "99999999999"}',  # integral but > int32: try_cast NULL in both
    "{}",
    # round-12 translate-guard bombs (the regex-free guard admits a
    # SUPERSET of ^-?[0-9]+$ — digits-and-dashes strings — relying on
    # try_cast to NULL the extras identically in both engines):
    '{"k": "1-2"}',  # admitted by translate, NULLed by try_cast (both)
    '{"k": "007"}',  # leading zeros: k = 7 in both (regex semantics)
    '{"k": "\\u0661\\u0662"}',  # arabic-indic '12': Spark's bare cast
    # PARSES it (→12), DuckDB's doesn't — translate excludes it in both
    '{"k": "+5"}',  # regex/translate both exclude; Spark bare cast wouldn't
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("hostile_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
                "text": pa.array([r[1] for r in _DOCS], pa.string()),
                "lang": pa.array([r[2] for r in _DOCS], pa.string()),
                "source": pa.array([r[3] for r in _DOCS], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in _DOCS], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(_N_VEC)), pa.int64()),
                "embedding": pa.array(
                    [_vec(i) for i in range(_N_VEC)], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 3 for i in range(_N_VEC)], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    t0 = datetime.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(_PROPS)), pa.int64()),
                "ts": pa.array(
                    [t0 + datetime.timedelta(minutes=i) for i in range(len(_PROPS))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([i % 2 for i in range(len(_PROPS))], pa.int64()),
                "event_type": pa.array(["t"] * len(_PROPS), pa.string()),
                "value": pa.array([float(i) for i in range(len(_PROPS))], pa.float64()),
                "props": pa.array(_PROPS, pa.string()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf_dir):
    import duckdb

    con = duckdb.connect()
    for name in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{hostile_sf_dir}/{name}.parquet'"
        )
    yield con
    con.close()


# Every query whose round-10/11 guard has a bomb in the hostile fixture:
# q13 (try_cast integral guard), q40 (greatest-guard on an all-empty
# source), the similarity family (zero-norm exclusion, both engines),
# q80 (deg>0 pre-join filter with isolated/zero-token nodes), q29/q72
# (empty/short docs through generators), q75/q76 (all-zero-token source
# in the mixture totals' greatest-guards).
_GUARDED = [
    "q13_props_json_extract",
    "q40_token_budget",
    "q33_cosine_top3",
    "q34_lsh_buckets",
    "q38_embedding_near_dup",
    "q81_quantized_ann",  # zero-norm exclusion guards the 1/nrm quantizer
    "q82_importance_weights",  # empty docs absent from output, both engines
    "q83_importance_resample",  # gumbel key: ln(ln) args structurally in (0,1)
    "q84_bigram_lm_score",  # <2-token docs carry no bigram, both engines
    "q43_ivf_ann",
    "q70_semantic_dedup",
    "q80_quality_propagation",
    "q29_exact_dedup_groups",
    "q72_substring_dedup",
    "q75_domain_mixture",
    "q76_training_order",
    # round-12 additions: q87 runs the full cluster lineage (shingle
    # generators over empty/short docs + the recursive oracle) and q88
    # the chunk/prefix-sum lineage (empty docs produce no chunks) —
    # both must define the same universe as their oracles on hostile
    # rows, not just on the well-formed fixtures
    "q87_cluster_size_histogram",
    "q88_packing_density",
    # round-13: q89/q90's media synth + perceptual hashes must agree
    # with their oracles on an id universe unlike the shipped fixtures
    # (9 docs, one partial group, empty/whitespace docs — payloads
    # derive from doc_id alone so every row is still valid media)
    "q89_image_dhash_near_dup",
    "q90_audio_fingerprint_near_dup",
    "q91_cross_modal_dup_consensus",  # full-outer of both lineages
    "q92_media_band_stats",  # banding audit over the image lineage
]


@pytest.mark.parametrize("name", _GUARDED)
def test_guarded_query_matches_oracle_on_hostile_fixture(
    spark, hostile_duck, hostile_sf_dir, name
):
    from eventsgateway_spark.queries import ORACLE_SQL, QUERIES

    df = QUERIES[name](spark, hostile_sf_dir)
    compare_spark_duckdb(df, hostile_duck, ORACLE_SQL[name])


def test_q13_guard_is_exercised(spark, hostile_sf_dir):
    """The hostile events table must actually contain the divergence
    trigger (a fractional numeric string) — guard the guard-test."""
    assert any(json.loads(p).get("k") == "12.5" for p in _PROPS)
    from eventsgateway_spark.queries import QUERIES

    rows = QUERIES["q13_props_json_extract"](spark, hostile_sf_dir).collect()
    # 12.5/abc/{}/overflow/1-2/unicode-digits/+5 all land in the
    # sentinel bucket; 7 and 007 -> 0, -3 -> -1 (floor semantics in
    # BOTH engines — DuckDB's integer // truncates)
    by_bucket = {r["k_bucket"]: r["n_events"] for r in rows}
    assert by_bucket == {-2147483648: 7, 0: 2, -1: 1}


def test_zero_norm_vector_never_appears(spark, hostile_sf_dir):
    """The excluded zero vector must not surface in any similarity
    output column that carries vector ids."""
    from eventsgateway_spark.queries import QUERIES

    for name, cols in [
        ("q33_cosine_top3", ("qid", "neighbor_id")),
        ("q38_embedding_near_dup", ("id1", "id2")),
        ("q43_ivf_ann", ("qid", "neighbor_id")),
        ("q70_semantic_dedup", ("vec_id",)),
    ]:
        for row in QUERIES[name](spark, hostile_sf_dir).collect():
            for c in cols:
                assert row[c] != _ZERO_VEC_ID, (name, c)


def test_shipped_fixtures_have_no_zero_norm_embeddings():
    """Fixture invariant backing the oracle mirror (ADVICE r10): the
    shipped embeddings tables contain no zero-norm rows, so adding the
    nrm > 0 mirror to the oracles changed no hash."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        n = duckdb.sql(
            "SELECT count(*) FROM "
            f"'/root/testdata/sf{sf}/embeddings.parquet' "
            "WHERE sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> x*x))) = 0"
        ).fetchone()[0]
        assert n == 0, f"sf{sf} contains {n} zero-norm embeddings"


def test_lsh_plane_ladder_boundaries():
    """The input-size-derived plane count (round 11): floor below the
    first threshold (so static oracle mirrors stay exact at every
    fixture scale), +1 plane per doubling above it, hard cap 16."""
    from eventsgateway_spark.queries.ext_similarity import (
        LSH_TARGET_BUCKET_OCC as OCC,
        planes_for_rows,
    )

    assert planes_for_rows(1, 6) == 6
    assert planes_for_rows((1 << 6) * OCC, 6) == 6  # exactly covered
    assert planes_for_rows((1 << 6) * OCC + 1, 6) == 7  # first growth
    assert planes_for_rows((1 << 13) * OCC, 6) == 13
    assert planes_for_rows(10**12, 6) == 16  # cap
    # per-family floors: the q34 audit floors at 8
    assert planes_for_rows(1, 8) == 8
    assert planes_for_rows((1 << 8) * OCC + 1, 8) == 9
    # fixture sanity: every shipped embeddings fixture sits below the
    # floor-6 threshold, so q38's static 6-plane oracle stays exact
    import os

    for sf in ("0.001", "0.01", "0.1"):
        b = os.path.getsize(f"/root/testdata/sf{sf}/embeddings.parquet")
        from eventsgateway_spark.queries.ext_similarity import _EMB_ROW_BYTES

        assert planes_for_rows(max(b // _EMB_ROW_BYTES, 1), 6) == 6, sf
        assert planes_for_rows(max(b // _EMB_ROW_BYTES, 1), 8) == 8, sf


def test_lsh_table_ladder_boundaries():
    """The round-12 OR-construction ladder: tables double once per two
    plane-steps above the floor (cap 8× floor, round 13); each doubling adds one
    EFFECTIVE plane per table, so the uniform-ideal candidate volume
    T·N²/2^p is invariant along the ladder (the probe-measured trade —
    SCALE.md round-12)."""
    from eventsgateway_spark.queries.ext_similarity import (
        LSH_TARGET_BUCKET_OCC as OCC,
        planes_for_rows,
        tables_for_rows,
    )

    # below the first plane-growth threshold: floor tables
    assert tables_for_rows(1, 6, 2) == 2
    assert tables_for_rows((1 << 6) * OCC, 6, 2) == 2
    # one plane-step (extra=1): still floor; two steps: first doubling
    assert tables_for_rows((1 << 6) * OCC + 1, 6, 2) == 2  # extra 1
    assert tables_for_rows((1 << 7) * OCC + 1, 6, 2) == 4  # extra 2
    assert tables_for_rows((1 << 9) * OCC + 1, 6, 2) == 8  # extra 4
    assert tables_for_rows((1 << 11) * OCC + 1, 6, 2) == 16  # extra 6
    # cap: 8× the floor regardless of further growth (round 13 — the
    # 1M-vector probe showed the old 4× cap sagging cos-0.95 banded
    # recall to 24/30 where 8× restores 28/30; SCALE.md round-13)
    assert tables_for_rows((1 << 13) * OCC + 1, 6, 2) == 16  # extra 8
    assert tables_for_rows(10**12, 6, 2) == 16
    # scaleprobe's x50 shape (100k rows, floor 6 → base 11, extra 5):
    # the probe's 8×13 top rung
    est_x50 = 100_000
    assert planes_for_rows(est_x50, 6) == 11
    assert tables_for_rows(est_x50, 6, 2) == 8

    # uniform-ideal volume invariance: T/2^(base + log2(T/floor_T))
    # never exceeds floor_T/2^base along the ladder
    for est in (10_000, 50_000, 100_000, 400_000, 5_000_000):
        base = planes_for_rows(est, 6)
        t = tables_for_rows(est, 6, 2)
        eff = base + (t // 2).bit_length() - 1
        assert t / (1 << eff) <= 2 / (1 << base) + 1e-12, est


def test_media_geometry_ladder_boundaries():
    """The round-15 Manku-banding ladder (VERDICT r14 #2): band_w
    floors at 8 below 2^8 x 64 estimated signatures (so every fixture
    corpus keeps the exact 7x8 oracle geometry), +1 per corpus
    doubling above, cap 24; bands NEVER shrinks below the pigeonhole
    requirement max_ham + 1 no matter how wide band_w grows."""
    from eventsgateway_spark.queries.ext_dedup import (
        IMG_HAM_BANDS,
        IMG_HAM_MAX,
        MEDIA_TARGET_LANE_OCC as OCC,
        media_band_w_for_rows,
        media_geometry_for_rows,
    )

    assert media_band_w_for_rows(1) == 8
    assert media_band_w_for_rows((1 << 8) * OCC) == 8  # exactly covered
    assert media_band_w_for_rows((1 << 8) * OCC + 1) == 9  # first growth
    # the scaleprobe protocol's corpus sizes
    assert media_geometry_for_rows(50_000) == (7, 10)
    assert media_geometry_for_rows(200_000) == (7, 12)
    assert media_geometry_for_rows(500_000) == (7, 13)
    assert media_band_w_for_rows(10**12) == 24  # cap
    # pigeonhole: bands rides max_ham, never band_w
    assert media_geometry_for_rows(10**9, max_ham=6)[0] == 7
    assert media_geometry_for_rows(10**9, max_ham=9)[0] == 10
    assert media_geometry_for_rows(1, max_ham=IMG_HAM_MAX) == (
        IMG_HAM_BANDS,
        8,
    )
    # monotone in est_rows
    last = 0
    for est in (1, 10**4, 10**5, 10**6, 10**8, 10**12):
        w = media_band_w_for_rows(est)
        assert w >= last
        last = w
    # every shipped documents fixture sits far below the floor
    # threshold, so the q89/q90/q91/q92 7x8 mirrors stay exact
    import os

    for sf in ("0.001", "0.01", "0.1"):
        n = os.path.getsize(f"/root/testdata/sf{sf}/documents.parquet") // 100
        assert media_geometry_for_rows(n) == (IMG_HAM_BANDS, 8), sf


def test_lsh_family_floors_at_fixture_scale(spark):
    """lsh_family ITSELF (not just the pure ladders) must return the
    exact oracle constants (floor planes, floor tables) for every
    shipped fixture AND for unknown-size inputs — the static DuckDB
    q38 mirror (6 planes × 2 tables) is only exact under that
    guarantee. (Round-12 review finding: the original test asserted
    only tables_for_rows, so a regression in lsh_family's None branch
    or its effective-plane arithmetic would have passed.)"""
    from eventsgateway_spark.queries.ext_similarity import (
        _EMB_ROW_BYTES,
        lsh_family,
        tables_for_rows,
    )
    import os

    for sf in ("0.001", "0.01", "0.1"):
        b = os.path.getsize(f"/root/testdata/sf{sf}/embeddings.parquet")
        est = max(b // _EMB_ROW_BYTES, 1)
        assert tables_for_rows(est, 6, 2) == 2, sf
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        assert lsh_family(emb, 6, 2) == (6, 2), sf
        assert lsh_family(emb, 8, 4) == (8, 4), sf
    # unknown-size input (createDataFrame — no file stats): floors,
    # in (planes, tables) order
    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert lsh_family(tiny, 6, 2) == (6, 2)
    # effective-plane arithmetic at a ladder rung: 100k rows with
    # floors (6, 2) → base 11, extra 5 → 8 tables, 13 effective planes
    big = 100_000 * _EMB_ROW_BYTES

    import eventsgateway_spark.queries.ext_similarity as xs
    import eventsgateway_spark.queries._util as util

    orig = util.known_input_bytes
    util.known_input_bytes = lambda df: big
    try:
        assert xs.lsh_family(tiny, 6, 2) == (13, 8)
    finally:
        util.known_input_bytes = orig


# ---------------------------------------------------------------------------
# BIGINT-ceiling lifts (SCALE.md round-10 overflow note, implemented r11)
# ---------------------------------------------------------------------------

_HUGE_TOTALS = [
    # (source, n_docs, n_tokens) — every token count puts 1e6 × n_tokens
    # past the BIGINT ceiling (9.223e18); the pre-lift code raised
    # ARITHMETIC_OVERFLOW here under ANSI
    ("web", 2_000_000_000, 21_000_000_000_000),
    ("wiki", 900_000_000, 9_300_000_000_000),
    ("code", 1_000_000_000, 10_000_000_000_001),
]


def test_mixture_weights_exact_past_bigint_ceiling(spark):
    """q75's weight math at 100 TB scale (>9.2e12 token totals):
    decimal(38,0) on the Spark side vs HUGEINT in DuckDB, hash-exact,
    ANSI on (session default)."""
    import duckdb

    from eventsgateway_spark.queries.ext_sampling import weights_from_totals

    totals = spark.createDataFrame(
        _HUGE_TOTALS, "source string, n_docs long, n_tokens long"
    )
    sdf = weights_from_totals(totals).orderBy("source")
    values = ", ".join(
        f"('{s}', {d}, CAST({t} AS BIGINT))" for s, d, t in _HUGE_TOTALS
    )
    # the q75 oracle's weight body (HUGEINT lift included) over the
    # same totals
    sql = f"""
    WITH t AS (SELECT * FROM (VALUES {values}) v(source, n_docs, n_tokens)),
    w AS (SELECT *,
                 CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS isqrt_tok
          FROM t)
    SELECT source, n_docs, n_tokens,
           CAST((CAST(1000000 AS HUGEINT) * n_tokens) // GREATEST((SELECT SUM(n_tokens) FROM w), 1)
               AS BIGINT) AS share_ppm,
           CAST((1000000 * isqrt_tok) // GREATEST((SELECT SUM(isqrt_tok) FROM w), 1)
               AS BIGINT) AS weight_ppm,
           COALESCE(CAST((100 * ((1000000 * isqrt_tok) // GREATEST((SELECT SUM(isqrt_tok) FROM w), 1)))
               // NULLIF((CAST(1000000 AS HUGEINT) * n_tokens) // GREATEST((SELECT SUM(n_tokens) FROM w), 1), 0)
               AS BIGINT), -1) AS oversample_x100
    FROM w ORDER BY source
    """
    con = duckdb.connect()
    try:
        compare_spark_duckdb(sdf, con, sql)
    finally:
        con.close()
    # sanity: the shares actually used the lifted range
    shares = {r["source"]: r["share_ppm"] for r in sdf.collect()}
    assert sum(shares.values()) >= 999_998  # ppm total (truncation slack)


def test_vt_exact_past_bigint_ceiling(spark):
    """q76's virtual-time product at rk > 9.2e9 (where rk × 1e9
    overflowed BIGINT before the lift): decimal vs HUGEINT,
    hash-exact."""
    import duckdb

    from eventsgateway_spark.queries.ext_sampling import vt_column

    rows = [
        (15_000_000_000, 250_000),
        (9_300_000_000, 1_000_000),
        (9_223_372_037, 3),  # rk ~ ceiling/1e9 + 1, tiny weight
        (7, 0),  # greatest-guard: weight 0 -> divide by 1
    ]
    sdf = (
        spark.createDataFrame(rows, "rk long, weight_ppm long")
        .select("rk", "weight_ppm", vt_column().alias("vt"))
        .orderBy("rk")
    )
    values = ", ".join(f"({rk}, {w})" for rk, w in rows)
    sql = f"""
    SELECT rk, weight_ppm,
           CAST((CAST(rk AS HUGEINT) * 1000000000) // GREATEST(weight_ppm, 1)
               AS BIGINT) AS vt
    FROM (VALUES {values}) v(rk, weight_ppm)
    ORDER BY rk
    """
    con = duckdb.connect()
    try:
        compare_spark_duckdb(sdf, con, sql)
    finally:
        con.close()


def test_q80_isolated_and_zero_token_nodes(spark, hostile_sf_dir):
    """deg-0 docs (no shingles: empty/short/whitespace-only) keep their
    seed; the dup cluster's members all have deg > 0."""
    from eventsgateway_spark.queries import QUERIES

    rows = {
        r["doc_id"]: r
        for r in QUERIES["q80_quality_propagation"](spark, hostile_sf_dir).collect()
    }
    assert set(rows) == {r[0] for r in _DOCS}
    for iso in (4, 5, 6, 8):
        assert rows[iso]["deg"] == 0
        assert rows[iso]["s3"] == rows[iso]["s0"]
    for member in (0, 1, 7):
        assert rows[member]["deg"] >= 2

"""[EXT] Similarity search + multimodal columns over ``embeddings``
and ``documents`` (SURVEY §2.5 Q18/Q20).

- q33 exact cosine top-k: broadcast the (small) query set against the
  full candidate table — a broadcast nested-loop that is LINEAR in the
  candidate count, the correct baseline shape (never candidate×candidate).
- q34 LSH bucketing: signed-random-projection signatures partition the
  space; at scale, ANN search becomes an equi-join on the bucket id
  (see ``functions.vectors.lsh_bucket``). The declared query audits the
  bucket layout deterministically.
- q35 embedding statistics per label with exact integer-scaled norms.
- q36 binary/multimodal round-trip: text treated as an opaque binary
  payload with typed metadata (the image/audio column pattern — decode
  itself is stubbed in ``operators.multimodal``; the Spark-side schema
  and plumbing are real).

All vector math is sequential-fold ``zip_with``/``aggregate`` over
``array<float>`` cast to double — bit-identical to the DuckDB oracle's
``list_transform``/``list_sum`` (verified), so even cosine scores
hash-match after a defensive round(6).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventsgateway_spark.functions.vectors import (
    _plane_coeffs,
    as_double,
    cosine,
    dot,
    dot_arrow,
    lsh_bucket,
    lsh_buckets_arrow,
    lsh_probe_buckets_arrow,
    norm,
    norm_sq,
)
from eventsgateway_spark.queries import query
from eventsgateway_spark.queries._util import (
    arrow_scorer,
    pin,
    session_cache,
    spread,
    table,
)

# DuckDB-side mirrors of the sequential folds in functions.vectors.
_DUCK_NORM = "sqrt(list_sum(list_transform(e, x -> x*x)))"

# Shared oracle CTE body: embeddings promoted to double with zero-norm
# vectors EXCLUDED — the DuckDB mirror of norm_view's nrm > 0 filter
# (ADVICE r10: the Spark side excluded them but the oracles didn't, so
# correctness rested on the fixture containing no zero vectors; now
# both engines define the same input universe and a future fixture
# regen with a zero vector changes nothing).
_DUCK_V_NONZERO = (
    "SELECT vec_id, label, e FROM "
    "(SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) "
    f"WHERE {_DUCK_NORM} > 0"
)


def _duck_proj(j: int) -> str:
    """DuckDB: signed projection of e onto integer-formula hyperplane j
    (the round-11 decorrelated quadratic family — constants pre-reduced
    mod 1021 exactly as functions.vectors._plane_coeffs)."""
    c1, c2 = _plane_coeffs(j)
    return (
        f"list_sum(list_transform(range(1, len(e)+1), "
        f"d -> e[d] * (({c1} * (d+1) + {c2} * (d+1) * (d+1)) % 1021 - 510)))"
    )


def _duck_bucket(n_planes: int = 8, table_id: int = 0) -> str:
    """DuckDB mirror of functions.vectors.lsh_bucket."""
    return " + ".join(
        f"(CASE WHEN {_duck_proj(table_id * n_planes + b)} >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(n_planes)
    )


_DUCK_BUCKET = _duck_bucket(8, 0)


# ---------------------------------------------------------------------------
# q33 — exact cosine top-3 (broadcast brute force baseline)
# ---------------------------------------------------------------------------


@query(
    "q33_cosine_top3",
    # demoted from the static tier in round 13: q33 now shares a
    # rotation slot with q92 (media band-occupancy audit); family Q18
    # keeps q34/q43 declared every phase (+ q38 static, q70's slot)
    declared=False,
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    q AS (SELECT vec_id AS qid, label AS q_label, e AS qe,
                 sqrt(list_sum(list_transform(e, x -> x*x))) AS qn
          FROM v WHERE vec_id < 10),
    scored AS (
        SELECT q.qid, q.q_label, v.vec_id AS neighbor_id, v.label AS n_label,
               CAST(ROUND(list_sum(list_transform(range(1, len(q.qe)+1),
                                                  i -> q.qe[i] * v.e[i]))
                          / (q.qn * sqrt(list_sum(list_transform(v.e, x -> x*x))))
                          * 1e6) AS BIGINT) AS cos_sim_u
        FROM q JOIN v ON v.vec_id <> q.qid
    )
    SELECT qid, rn, neighbor_id, q_label, n_label, cos_sim_u
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cos_sim_u DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    ORDER BY qid, rn
    """,
)
def q33_cosine_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 neighbors for a small query set. The query
    side is broadcast, so the physical plan is a broadcast nested-loop
    over the candidates — one linear scan, no shuffle of the big side,
    which is exactly how a 100 TB brute-force pass should look.
    Ranking uses the micro-unit integer score (round(cos*1e6) — the
    canonicalization-proof output type, cf. q35) with neighbor-id
    tie-break, so the order is stable across engines."""
    from eventsgateway_spark.functions.vectors import dot, norm

    # norms PRE-computed once per vector on each side — cosine() inside
    # the join would re-fold the candidate's norm once per query and
    # the query's norm once per candidate (higher-order folds are
    # interpreted, not codegen'd), tripling the per-pair CPU of the
    # brute-force scan. Same grouping as the oracle: dot / (qn * cn).
    # r15 batch 4: above fixture scale both brute-force sides ride the
    # session-shared norm_frame (one scan + one norm-fold pass per
    # session instead of two scans + two full-corpus folds per
    # execution); fixture scale keeps the plain lineage below, so the
    # driver-oracle plan (and its 2-fold plan pin) is byte-identical.
    nf = norm_frame(spark, sf_dir)
    if nf is not None:
        v = nf.select("vec_id", "label", "e", F.col("nrm").alias("cn"))
    else:
        v = (
            spread(table(spark, sf_dir, "embeddings"))
            .select(
                "vec_id",
                "label",
                as_double(F.col("embedding")).alias("e"),
            )
            # zero-norm exclusion — same semantic as norm_view (the score
            # divides by qn * cn; ANSI would throw, and direction-free
            # vectors have no place in a cosine ranking). Oracle mirrors.
            # Filter on the SQUARED sum before projecting cn: a filter on
            # the projected sqrt re-inlines below the projection and folds
            # the vector twice with SQRT (the plan test pins 2 folds).
            .filter(norm_sq(F.col("e")) > 0)
            .withColumn("cn", norm(F.col("e")))
        )
    q = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("e").alias("qe"),
        F.col("cn").alias("qn"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "q_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("n_label"),
            F.round(
                dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("cn")) * 1e6
            ).cast("bigint").alias("cos_sim_u"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim_u"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "rn", "neighbor_id", "q_label", "n_label", "cos_sim_u")
        .orderBy("qid", "rn")
    )


# ---------------------------------------------------------------------------
# q34 — LSH bucket audit (the ANN scale path's partitioning)
# ---------------------------------------------------------------------------

# Input-size-derived hyperplane count (round-11, mirroring SemDeDup's
# semd_cell_count): candidate volume per LSH table is ~ N²/2^planes, so
# a CONSTANT plane count degrades to quadratic pair growth; holding
# bucket occupancy ~constant (grow planes with log2(N/occupancy)) keeps
# candidates ~ N × occupancy — linear. The per-family constants (6 for
# the q38 near-dup tables, 8 for the q34 audit) become FLOORS: at every
# fixture/oracle scale the estimate sits below the first growth
# threshold (floor-6 threshold = 2^6 × 64 = 4096 estimated rows; the
# largest fixture estimates ~2080, pinned with margin by
# tests/test_ansi_guards.py), so the static DuckDB mirrors stay exact,
# and the count only rises past ~2^floor × occupancy vectors. Cap 16:
# past 65k buckets/table, recall per table collapses before the int32
# bucket id does — and BOTH recall levers for that regime are now
# implemented and measured (round 12): the table-count ladder
# (tables_for_rows below) and query-directed multiprobe
# (functions.vectors.lsh_probe_buckets_arrow / ann_topk_bucketed's
# n_flips — SCALE.md round-12/12c tables).
LSH_TARGET_BUCKET_OCC = 64
# measured parquet bytes/row of the embeddings fixtures (387-400 across
# sf0.001-0.1); the estimate only needs to land the right power of two
_EMB_ROW_BYTES = 384


def planes_for_rows(est_rows: int, floor_planes: int) -> int:
    """The pure ladder: smallest p >= floor_planes with
    2^p × LSH_TARGET_BUCKET_OCC covering ``est_rows``, capped at 16
    (boundary behavior unit-tested in tests/test_ansi_guards.py)."""
    p = floor_planes
    while p < 16 and (1 << p) * LSH_TARGET_BUCKET_OCC < est_rows:
        p += 1
    return p


def lsh_plane_count(emb: DataFrame, floor_planes: int) -> int:
    """Deterministic planes-per-table for an embeddings frame: the
    ladder over the byte-estimated row count. Unknown-size inputs
    (temp views, createDataFrame) fall back to the floor — the oracle
    constant — same ADVICE-r5 reasoning as semd_cell_count."""
    from eventsgateway_spark.queries._util import known_input_bytes

    b = known_input_bytes(emb)
    if b is None:
        return floor_planes
    return planes_for_rows(max(b // _EMB_ROW_BYTES, 1), floor_planes)


# Table-count ladder (round 12 — the OR-construction recall knob,
# VERDICT r11 #1). The plane ladder alone holds candidate volume
# ~linear, but recall per table decays as planes grow (a cos-0.9 pair
# agrees on one plane w.p. ~0.86, on 11 planes w.p. ~0.18), and a
# FIXED table count caps the OR over tables. The trade that buys
# recall without buying candidates: each table-DOUBLING adds ONE
# plane per table, leaving the uniform-ideal candidate volume
# T·N²/2^p invariant. Measured (tools/lsh_ladder_probe.py, 100k
# gaussian 64-d vectors + 30 planted pairs per similarity band,
# SCALE.md round-12 table): 2×11 → 8×13 lifts banded recall
# cos0.90 10/30 → 21/30, cos0.95 19/30 → 28/30, cos0.99 26/30 →
# 28/30, with Σocc² at 1.61× the uniform ideal (vs 1.33× — both
# within the 2× skew bound) and the ideal itself unchanged. Cost is
# bucket-computation CPU only (T·p folds per vector: 22 → 104 at the
# top rung — still O(dim) per row, map-side, no shuffle).
#
# Ladder rule: one table-doubling per TWO plane-steps of the base
# plane ladder above its floor, capped at 8× the floor table count;
# the EFFECTIVE planes-per-table is the base count + log2(T/floor_T).
# At every fixture/oracle scale the base ladder sits at its floor, so
# tables and planes both floor and the static DuckDB mirrors stay
# exact (pinned by tests/test_ansi_guards).
#
# Cap history: round 12 set 4× from 100k-vector evidence (where the
# cap never binds — the 100k rung is 8 tables either way); round 13
# measured the binding regime at 1M vectors (lsh_ladder_probe,
# SCALE.md round-13): the 4×-capped rung (8 tables × 16 eff planes)
# sagged to cos-0.95 recall 24/30 / cos-0.90 16/30, the 8× rung
# (16×17) restores 28/30 / 18/30 at the invariant ideal volume
# (realized Σocc² 2.27× ideal — gaussian-bucket skew at 1M, 2.03× even
# when capped), and the uncapped 16× rung (32×18) buys only +1 more
# at cos-0.95 for 2× further bucket CPU — kept capped at 8×.
_LSH_TABLE_CAP_FACTOR = 8


def tables_for_rows(est_rows: int, floor_planes: int, floor_tables: int) -> int:
    """The pure table ladder: floor_tables doubled once per two
    plane-steps of ``planes_for_rows`` above its floor, capped at
    ``_LSH_TABLE_CAP_FACTOR × floor_tables``."""
    extra = planes_for_rows(est_rows, floor_planes) - floor_planes
    t = floor_tables << (extra // 2)
    return min(t, floor_tables * _LSH_TABLE_CAP_FACTOR)


def lsh_family(
    emb: DataFrame, floor_planes: int, floor_tables: int
) -> tuple[int, int]:
    """Deterministic (n_planes, n_tables) for an embeddings frame —
    the coupled ladder. Unknown-size inputs floor both knobs (the
    oracle constants; semd_cell_count / ADVICE-r5 rule)."""
    from eventsgateway_spark.queries._util import known_input_bytes

    b = known_input_bytes(emb)
    if b is None:
        return floor_planes, floor_tables
    est = max(b // _EMB_ROW_BYTES, 1)
    base = planes_for_rows(est, floor_planes)
    t = tables_for_rows(est, floor_planes, floor_tables)
    # one extra plane per table-doubling keeps T·N²/2^p invariant
    return base + (t // floor_tables).bit_length() - 1, t


@query(
    "q34_lsh_buckets",
    # demoted from the static tier in round 14: q34 now shares a
    # rotation slot with q94 (kNN label-consistency — the other
    # similarity-backed curation view); family Q18 keeps q43 declared
    # every phase (+ q38 static, q33/q70 rotation slots).
    declared=False,
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    b AS (SELECT vec_id, label, {_DUCK_BUCKET} AS bucket FROM v)
    SELECT bucket, COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec_id,
           COUNT(DISTINCT label) AS n_labels
    FROM b
    GROUP BY 1
    ORDER BY 1
    """,
)
def q34_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy audit of the signed-random-projection LSH
    (plane count input-size-derived, floor 8 — the oracle's static
    8-plane mirror is exact at every scale the oracle runs). At 100 TB,
    ANN candidate generation is ``join ON bucket`` — shuffle keyed by
    an int, per-bucket work bounded by occupancy, no cartesian. This
    query pins the exact bucket assignment (integer-formula hyperplanes
    → oracle-reproducible). Zero-norm vectors are excluded on BOTH
    sides: they never enter a similarity index (norm_view semantic)."""
    from eventsgateway_spark.queries._util import is_fixture_scale

    emb = table(spark, sf_dir, "embeddings")
    np_ = lsh_plane_count(emb, 8)
    if not is_fixture_scale(emb):
        # r15: ride the session-shared bucket table at this query's own
        # geometry (np_, 1 table) — lsh_bucket(..., table_id=0) is
        # bit-identical to the frame's tbl=0 lane — and join the label
        # back on vec_id (the cached frame's zero-norm filter defines
        # the same universe this query's inline filter did).
        bt = lsh_bucket_frame(spark, sf_dir, np_, 1).select(
            "vec_id", "bucket"
        )
        b = bt.join(emb.select("vec_id", "label"), "vec_id")
    else:
        v = (
            spread(emb)
            # zero-norm filter on the SQUARED sum, applied BEFORE any norm
            # projection: predicate pushdown re-inlines a filtered column's
            # defining expression below the projection, so filtering on a
            # projected sqrt(fold) doubles the per-vector SQRT folds in the
            # scan (caught by tests/test_plans.py::
            # test_q33_norms_precomputed_below_join on the q33 twin).
            # norm > 0 <=> norm_sq > 0 — sqrt is monotone on [0, inf).
            .filter(norm_sq(as_double(F.col("embedding"))) > 0)
            .select("vec_id", "label", F.col("embedding"))
        )
        b = v.select(
            "vec_id", "label", lsh_bucket(F.col("embedding"), np_).alias("bucket")
        )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.countDistinct("label").alias("n_labels"),
        )
        .orderBy("bucket")
    )


def ann_topk_bucketed(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int | None = None,
    n_tables: int | None = None,
    scorer: str = "fold",
    n_flips: int = 0,
) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates (the scale
    path behind q33's brute-force baseline). ``n_tables`` independent
    hyperplane families are OR-combined (a candidate matches if it
    shares a bucket in ANY table) — the standard recall amplification;
    each table is still an equi-join on an int key, so candidate volume
    per query tracks bucket occupancy × tables, not corpus size.
    Defaults (round 12): both knobs come from the coupled
    ``lsh_family`` ladder over the CORPUS side, with this helper's
    historical defaults (8 planes, 4 tables) as the floors — so a
    fixture-scale or unknown-size corpus gets exactly the historical
    operating point, and only genuinely large corpora climb the
    ladder. Pass explicit values to pin a configuration (the recall
    test pins the 4-plane/8-table recall-heavy protocol) — BOTH or
    NEITHER: pinning only one knob is refused (ADVICE r12), because
    the other would silently come from the (8,4)-floored ladder and
    break the T·N²/2^p candidate-volume invariance the coupled
    ladder exists to hold.
    Norms are precomputed once per VECTOR (not per pair), so per-pair
    work is one dot product. ``scorer='fold'`` (default) keeps the
    sequential JVM fold — bit-reproducible, and MEASURED faster at
    dim=64 (Arrow transfer of both vectors per pair cancels numpy's
    compute win; see functions/vectors.py). ``scorer='arrow'`` swaps
    in the einsum batch scorer for workloads where per-pair compute
    outgrows transfer (high dims, heavier kernels). Returns
    (qid, rn, neighbor_id, cos_sim). Recall and fold/arrow agreement
    are tested in tests/test_ext.py.

    ``n_flips`` (round 12) is query-directed MULTIPROBE — the recall
    knob that costs no extra index: per table the QUERY also probes
    the ``n_flips`` single-bit-flip buckets of its lowest-|projection|
    planes (the bits most likely to disagree with a true neighbor's
    signature), so per-query candidate volume grows at most
    (1+n_flips)× while the corpus keeps exactly one bucket per table.
    Measured at the fixture recall protocol (500 uniform vectors,
    4×8): recall@1 26/30 → 28/30 (flips=1) → **30/30** (flips=2); at
    100k vectors see SCALE.md round-12c. Buckets for BOTH sides come
    from the Arrow kernels (bit-equal to the fold — pinned), one pass
    per side regardless of table count."""
    if n_flips < 0:
        raise ValueError(f"n_flips must be >= 0, got {n_flips}")
    if (n_planes is None) != (n_tables is None):
        raise ValueError(
            "pin n_planes and n_tables together or not at all — with "
            "one pinned, the other would come from the (8,4)-floored "
            "ladder and break the T*N^2/2^p volume-invariance contract"
        )
    if n_planes is None:
        n_planes, n_tables = lsh_family(emb, 8, 4)
    # pin both sides: they fan out to n_tables bucket branches PLUS the
    # scoring join — unpinned, every branch re-runs the scan + promote
    # + norm fold + zero-norm filter (q38/q85 discipline; at the
    # ladder's multi-table rungs that multiplies the dominant map-side
    # CPU by the table count)
    c_base = pin(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("ce"),
            F.col("embedding").alias("c_raw"),
        )
        .withColumn("cn", norm(F.col("ce")))
        .filter(F.col("cn") > 0)  # norm_view semantic — the score divides by cn
    )
    q_base = pin(
        queries.select(
            F.col("vec_id").alias("qid"), as_double(F.col("embedding")).alias("qe"),
            F.col("embedding").alias("q_raw"),
        )
        .withColumn("qn", norm(F.col("qe")))
        .filter(F.col("qn") > 0)
    )
    # one Arrow pass per side computes every table's bucket (bit-equal
    # to the per-table fold loop this replaces — kernel parity pinned);
    # the per-table joins collapse into one equi-join on (tbl, bucket)
    c = c_base.select(
        "neighbor_id",
        F.posexplode(
            lsh_buckets_arrow(F.col("c_raw"), n_planes, n_tables)
        ).alias("tbl", "bucket"),
    )
    width = 1 + n_flips
    q = q_base.select(
        "qid",
        F.posexplode(
            lsh_probe_buckets_arrow(F.col("q_raw"), n_planes, n_tables, n_flips)
        ).alias("pos", "bucket"),
    ).select(
        "qid", (F.col("pos") / width).cast("int").alias("tbl"), "bucket"
    )
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .select("qid", "neighbor_id")
        .distinct()
        .filter(F.col("neighbor_id") != F.col("qid"))
    )
    pair_dot = dot_arrow if scorer == "arrow" else dot
    scored = (
        cand.join(c_base.select("neighbor_id", "ce", "cn"), "neighbor_id")
        .join(F.broadcast(q_base.select("qid", "qe", "qn")), "qid")
        .select(
            "qid",
            "neighbor_id",
            F.round(
                pair_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "rn", "neighbor_id", "cos_sim")
    )


# ---------------------------------------------------------------------------
# q35 — per-label embedding statistics (exact integer-scaled)
# ---------------------------------------------------------------------------


@query(
    "q35_embedding_stats",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    m AS (SELECT label,
                 CAST(ROUND({_DUCK_NORM} * 1e6) AS BIGINT) AS norm_u,
                 CAST(ROUND(e[1] * 1e6) AS BIGINT) AS c0_u
          FROM v)
    SELECT label, COUNT(*) AS n,
           CAST(SUM(norm_u) // COUNT(*) AS BIGINT) AS avg_norm_u,
           MIN(c0_u) AS min_c0_u, MAX(c0_u) AS max_c0_u
    FROM m
    GROUP BY 1
    ORDER BY 1
    """,
)
def q35_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics. Row-level doubles (norms) are
    scaled to micro-unit BIGINTs before the cross-row SUM, so the
    aggregate is exact integer math — immune to partial-aggregation
    order, the same trick the money queries use with decimals. The
    average stays in micro-units (integer division; both engines
    truncate identically on positives) so the output is all-integer."""
    v = table(spark, sf_dir, "embeddings").select(
        "label", as_double(F.col("embedding")).alias("e")
    )
    m = v.select(
        "label",
        F.round(norm(F.col("e")) * 1e6).cast("bigint").alias("norm_u"),
        F.round(F.element_at("e", 1) * 1e6).cast("bigint").alias("c0_u"),
    )
    return (
        m.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(norm_u) div count(1)").alias("avg_norm_u"),
            F.min("c0_u").alias("min_c0_u"),
            F.max("c0_u").alias("max_c0_u"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q36 — multimodal binary column round-trip
# ---------------------------------------------------------------------------


@query(
    "q36_binary_payloads",
    # demoted from the static tier in round 13: q36 now shares a
    # rotation slot with q91 (cross-modal consensus); family Q20 keeps
    # q52 declared every phase (+ q35's triple and q89/q90 slots)
    declared=False,
    oracle="""
    SELECT doc_id,
           source,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           CASE WHEN decode(encode(text)) = text THEN 1 ELSE 0 END AS roundtrip_ok
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q36_binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column pattern: payload as opaque BinaryType + typed
    metadata (media_type, n_bytes, digest). Text stands in for image/
    audio bytes — the schema, encode/decode round-trip, and digest
    plumbing are what an asset table needs; actual media decode is the
    stubbed Pandas path in operators.multimodal."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bin_col = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        "source",
        F.lit("text/plain").alias("media_type"),
        F.octet_length(bin_col).alias("n_bytes"),
        F.md5(bin_col).alias("digest"),
        F.when(F.decode(bin_col, "UTF-8") == F.col("text"), 1)
        .otherwise(0)
        .alias("roundtrip_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q38 — embedding-cosine near-duplicate pairs (LSH candidates, verified)
# ---------------------------------------------------------------------------

_ND_PLANES = 6
_ND_TABLES = 2

# Session-scoped cache of the near-dup LSH bucket table — (vec_id,
# tbl, bucket) at the family geometry, the near_dup_pair_frame
# discipline (round-15): q38 generates candidates from it, q85 audits
# its occupancies, and in a shared bench/notebook session each used
# to re-run the zero-norm filter + T×p fold projections from scratch.
# Keyed (applicationId, realpath(sf_dir), planes, tables) with the
# embeddings fixture fingerprint; fixture scale stays uncached (the
# driver's oracle runs hash-check each query's full lineage).
_LSH_BUCKET_CACHE: dict[tuple[str, str, int, int], tuple[str, DataFrame]] = session_cache({})

# Session-scoped cache of the zero-norm-filtered (vec_id, label, raw,
# e, nrm) embeddings view — q38's verify sides re-derived it (cast +
# norm fold + checkpoint job) once PER EXECUTION; it is fixture-derived
# and |emb| rows, so it materializes once per (session, fixture) like
# the bucket table above. Fixture scale stays uncached (pin() was
# identity there anyway, so the driver-oracle plan is byte-identical).
# r15 batch 4 widens it with ``label`` (8 bytes against a 64-dim
# raw+double pair) so the whole exact-similarity family shares ONE
# fold pass: q33's brute-force sides, q81's quantize input, q43's
# centroid/probe sides and the IVF assignment build all start from
# this frame — before, each execution re-scanned parquet and re-ran
# the interpreted norm_sq/norm folds over every row.
_NORM_CACHE: dict[tuple[str, str], tuple[str, DataFrame]] = session_cache({})


def norm_frame(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """The session-shared norm view above fixture scale; None at
    fixture scale (callers keep their plain per-query lineage)."""
    import os as _os

    from eventsgateway_spark.queries._util import (
        fixture_fingerprint,
        is_fixture_scale,
        release_frame,
    )

    emb = table(spark, sf_dir, "embeddings")
    if is_fixture_scale(emb):
        return None
    key = (spark.sparkContext.applicationId, _os.path.realpath(sf_dir))
    fp = fixture_fingerprint(sf_dir, "embeddings")
    hit = _NORM_CACHE.get(key)
    if hit is not None:
        if hit[0] == fp:
            return hit[1]
        del _NORM_CACHE[key]
        release_frame(hit[1])
    v = (
        spread(emb)
        .select(
            "vec_id",
            "label",
            F.col("embedding").alias("raw"),
            as_double(F.col("embedding")).alias("e"),
        )
        .filter(norm_sq(F.col("e")) > 0)
        .select(
            "vec_id", "label", "raw", "e", norm(F.col("e")).alias("nrm")
        )
        .localCheckpoint()
    )
    _NORM_CACHE[key] = (fp, v)
    return v


def lsh_bucket_frame(
    spark: SparkSession, sf_dir: str, np_: int, nt_: int
) -> DataFrame:
    """THE shared (vec_id, tbl, bucket) LSH table frame for the
    embeddings fixture at geometry (np_, nt_) — JVM fold buckets
    (bit-level the per-table constructions q38/q85 inline at fixture
    scale), materialized once per (session, fixture, geometry)."""
    import os as _os

    from eventsgateway_spark.queries._util import (
        fixture_fingerprint,
        is_fixture_scale,
        release_frame,
    )

    key = (
        spark.sparkContext.applicationId,
        _os.path.realpath(sf_dir),
        np_,
        nt_,
    )
    fp = fixture_fingerprint(sf_dir, "embeddings")
    hit = _LSH_BUCKET_CACHE.get(key)
    if hit is not None:
        cached_fp, cached = hit
        if cached_fp == fp:
            return cached
        del _LSH_BUCKET_CACHE[key]
        release_frame(cached)
    emb = table(spark, sf_dir, "embeddings")
    v = (
        spread(emb)
        # squared-sum filter before any norm projection (q33 plan-test
        # discipline) — the exact universe both consumers define
        .filter(norm_sq(as_double(F.col("embedding"))) > 0)
        .select("vec_id", "embedding")
    )
    per_table = None
    for t in range(nt_):
        b = v.select(
            "vec_id",
            F.lit(t).alias("tbl"),
            lsh_bucket(F.col("embedding"), np_, t).alias("bucket"),
        )
        per_table = b if per_table is None else per_table.unionAll(b)
    if not is_fixture_scale(emb):
        per_table = per_table.localCheckpoint()
        _LSH_BUCKET_CACHE[key] = (fp, per_table)
    return per_table
_DUCK_ND_BUCKETS = "\n            UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, {_duck_bucket(_ND_PLANES, t)} AS bucket FROM v"
    for t in range(_ND_TABLES)
)


@query(
    "q38_embedding_near_dup",
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm
          FROM v),
    b AS ({_DUCK_ND_BUCKETS}),
    cand AS (SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
             FROM b x JOIN b y
               ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
    scored AS (
        SELECT c.id1, c.id2,
               CAST(ROUND(list_sum(list_transform(range(1, len(a.e)+1),
                                                  i -> a.e[i] * z.e[i]))
                          / (a.nrm * z.nrm) * 1e6) AS BIGINT) AS cos_sim_u
        FROM cand c JOIN n a ON a.vec_id = c.id1 JOIN n z ON z.vec_id = c.id2
    )
    SELECT id1, id2, cos_sim_u FROM scored
    WHERE cos_sim_u >= 400000
    ORDER BY id1, id2
    """,
)
def q38_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from two
    OR-combined 6-plane LSH tables (equi-join on bucket per table —
    never an all-pairs cross join), then exact-cosine verification at
    0.4. LSH recall here is intentionally partial — the oracle mirrors
    the same candidate generation, so the result is exact for the
    operator AS DEFINED. Norms are computed ONCE per vector and joined
    in (higher-order-function folds are not codegen'd, so per-PAIR
    work must be a single dot fold). Planes AND tables are input-size-
    derived with floors (6, 2) via the coupled ladder (lsh_family —
    at every oracle scale both knobs floor, so the static 6-plane/
    2-table mirror is exact; past ~4k vectors planes rise with
    log2(N/occupancy) holding candidate volume ~linear, and past ~16k
    the table count doubles per two plane-steps — the OR-construction
    recall knob, volume-invariant because each doubling also adds one
    plane; measured recall/occupancy in SCALE.md round-12). Zero-norm
    vectors are excluded on both sides (norm_view semantic; the
    verify step divides by n1 * n2)."""
    emb = table(spark, sf_dir, "embeddings")
    np_, nt_ = lsh_family(emb, _ND_PLANES, _ND_TABLES)
    # session-shared norm view above fixture scale (norm_frame, r15);
    # fixture scale keeps the plain pinned lineage below.
    v = norm_frame(spark, sf_dir)
    if v is None:
        v = pin(
            spread(emb)
            .select(
                "vec_id",
                F.col("embedding").alias("raw"),
                as_double(F.col("embedding")).alias("e"),
            )
            # filter on the squared sum BEFORE projecting nrm — a filter
            # on the projected sqrt re-inlines below the projection and
            # folds the vector twice with SQRT (q33 plan-test discipline)
            .filter(norm_sq(F.col("e")) > 0)
            .select("vec_id", "raw", "e", norm(F.col("e")).alias("nrm"))
        )
    from eventsgateway_spark.queries._util import is_fixture_scale

    if (np_, nt_) == (_ND_PLANES, _ND_TABLES) and is_fixture_scale(emb):
        # oracle regime (family at its floors, driver fixture scale):
        # JVM fold buckets, one equi-join per table — bit-level oracle
        # reproducibility, plan byte-identical to pre-r15 rounds
        cand = None
        for t in range(nt_):
            b = v.select(
                "vec_id", lsh_bucket(F.col("raw"), np_, t).alias("bucket")
            )
            x, y = b.alias("x"), b.alias("y")
            p = x.join(
                y,
                (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            ).select(
                F.col("x.vec_id").alias("id1"), F.col("y.vec_id").alias("id2")
            )
            cand = p if cand is None else cand.unionAll(p)
    elif (np_, nt_) == (_ND_PLANES, _ND_TABLES):
        # floors geometry above fixture scale (bench regime): the SAME
        # JVM-fold buckets from the session-shared bucket table (one
        # lineage, two views — q85 audits the identical frame; r15,
        # the near_dup_pair_frame discipline), with candidate
        # generation AND exact-cosine verify collapsed into ONE
        # groupBy(tbl, bucket) GEMM kernel (r15 batch 4 — the q70/q94
        # within-cell pattern applied to the LSH buckets): the old
        # shape shipped every candidate pair through a distinct
        # exchange plus two vec_id joins carrying both 64-dim vectors,
        # then ran ~|cand| interpreted dot folds; here each vector
        # crosses the shuffle once per table and the per-bucket pair
        # grid runs as BLAS blocks. Same candidate multiset (a pair
        # shares a bucket in >=1 table), same HALF_UP law; pairs hit
        # in both tables collapse in the distinct below exactly like
        # the fold path's candidate distinct.
        bt = lsh_bucket_frame(spark, sf_dir, np_, nt_)
        if os.environ.get("SPARK_GRAFT_Q38_FOLD") != "1":
            from eventsgateway_spark.shipping import ship_package

            ship_package(spark)
            return (
                bt.join(v.select("vec_id", "e", "nrm"), "vec_id")
                .groupBy("tbl", "bucket")
                .applyInPandas(
                    _bucket_pair_kernel, "id1 long, id2 long, cos_sim_u long"
                )
                .distinct()
                .orderBy("id1", "id2")
            )
        # SPARK_GRAFT_Q38_FOLD=1 — the A/B kill switch (the
        # SPARK_GRAFT_NO_DOCTOK convention): the pre-batch-4 shape,
        # per-table joins collapsed to one (tbl, bucket) equi-join,
        # verify via the tail's pair joins + interpreted dot folds.
        x, y = bt.alias("x"), bt.alias("y")
        cand = x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        ).select(F.col("x.vec_id").alias("id1"), F.col("y.vec_id").alias("id2"))
    else:
        # above the floors (no oracle runs here): ONE Arrow pass
        # computes all nt_ buckets per vector (the ladder made T·p
        # fold projections the hot loop — lsh_buckets_arrow's matmul
        # kernel; fixture equality with the fold pinned in
        # tests/test_ext.py), and the per-table joins collapse into a
        # single self-join on (tbl, bucket) — same candidate set
        b = v.select(
            "vec_id",
            F.posexplode(
                lsh_buckets_arrow(F.col("raw"), np_, nt_)
            ).alias("tbl", "bucket"),
        )
        x, y = b.alias("x"), b.alias("y")
        cand = x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        ).select(F.col("x.vec_id").alias("id1"), F.col("y.vec_id").alias("id2"))
    # explicit repartition: the candidate pairs are only a few MB, so
    # AQE would coalesce them to 1 partition — but the per-pair dot
    # fold is CPU-bound (higher-order functions are interpreted, not
    # codegen'd), so byte-size-based coalescing serializes the hot
    # loop. An explicit numPartitions is exempt from AQE coalescing.
    cand = spread(cand.distinct())
    a = v.select(F.col("vec_id").alias("id1"), F.col("e").alias("e1"), F.col("nrm").alias("n1"))
    z = v.select(F.col("vec_id").alias("id2"), F.col("e").alias("e2"), F.col("nrm").alias("n2"))
    # NO broadcast hint on the verify joins: a/z are the FULL embeddings
    # table, which at corpus scale cannot ship to every executor. These
    # are plain equi-joins on vec_id; AQE still picks broadcast when the
    # table is genuinely small (fixtures), and shuffles when it isn't.
    # verify-step scorer: JVM fold by default (bit-reproducible vs the
    # oracle); SPARK_GRAFT_ARROW_SCORER=1 swaps in the einsum batch
    # scorer for high-dim corpora (identical at the 1e-6 output
    # quantization — tests/test_ext.py pins flag-on/off equality).
    pair_dot = dot_arrow if arrow_scorer() else dot
    return (
        cand.join(a, "id1")
        .join(z, "id2")
        .select(
            "id1",
            "id2",
            F.round(pair_dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2")) * 1e6)
            .cast("bigint")
            .alias("cos_sim_u"),
        )
        .filter(F.col("cos_sim_u") >= 400000)
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------------
# q43 — IVF ANN: centroid cells + nprobe search (the k-means-style scale path)
# ---------------------------------------------------------------------------

IVF_K = 8  # centroid count (cells)
IVF_NPROBE = 2  # cells searched per query

_DUCK_L2SQ = (
    "ROUND(list_sum(list_transform(range(1, len(v.e)+1),"
    " i -> (v.e[i]-c.ce[i])*(v.e[i]-c.ce[i]))), 6)"
)


def norm_view(emb: DataFrame) -> DataFrame:
    """(vec_id, e, nrm) — the promoted-double embedding with its norm.

    Zero-norm vectors are EXCLUDED: they carry no direction, so cosine
    against them is undefined — and the similarity family divides by
    ``qn * nrm``, which under Spark 4's default ANSI mode is a runtime
    DIVIDE_BY_ZERO, not a null (round-10 audit; the q80 property test
    caught the same class). Since round 11 the exclusion is mirrored in
    every similarity oracle (the shared ``_DUCK_V_NONZERO`` CTE body —
    ADVICE r10) and enforced as a fixture invariant
    (tests/test_ansi_guards.py), so the two engines define the same
    input universe even if a fixture regen introduces a zero vector:
    zero vectors never enter a similarity index, never match a lookup,
    and are silently skipped by IVF appends."""
    return (
        emb.select("vec_id", as_double(F.col("embedding")).alias("e"))
        # squared-sum filter BEFORE the norm projection (q33 plan-test
        # discipline: a filter on projected sqrt re-folds with SQRT)
        .filter(norm_sq(F.col("e")) > 0)
        .select("vec_id", "e", norm(F.col("e")).alias("nrm"))
    )


def ivf_centroids(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """ONE row holding all k centroids as an array of (cid, ce) structs.
    Centroids are the first ``k`` vectors by id — a deterministic stand-
    in for trained k-means centers; the *assignment/probe machinery* is
    what IVF is, and it is identical whichever way centers are
    produced.

    "First k by id" is a TRUE rank (``orderBy(vec_id).limit(k)`` — a
    bounded TakeOrdered, never a global sort), not a ``vec_id < k``
    filter: the filter form silently returned an EMPTY (or partial)
    centroid set for any corpus whose ids don't start densely at 0 —
    e.g. ``save_ivf_index`` over an id subrange — and every downstream
    probe joined against nothing (round-11b fix, caught by the SQ8
    save/load test). On the shipped fixtures ids are dense from 0, so
    the rank equals the filter and every oracle hash (the DuckDB
    mirror keeps ``WHERE vec_id < k``) is unchanged. The cents ARRAY
    order is irrelevant downstream (assignment/probing argmin over
    (dist, cid) structs is order-free), so collect_list needs no
    ordering guarantee — true before and after this fix."""
    return ivf_centroids_of(norm_view(emb), k)


def ivf_centroids_of(nv: DataFrame, k: int = IVF_K) -> DataFrame:
    """:func:`ivf_centroids` over an explicit (vec_id, e, ...) norm
    view — r15 batch 4 split so a caller holding the session-shared
    ``norm_frame`` can build the centroid row from the checkpointed
    frame (a bounded TakeOrdered over cached rows) instead of
    re-scanning parquet and re-folding every norm per execution. Same
    composition, so ``ivf_centroids(emb, k)`` plans are unchanged."""
    return (
        nv.orderBy("vec_id")
        .limit(k)
        .select(F.struct(F.col("vec_id").alias("cid"), F.col("e").alias("ce")).alias("c"))
        .agg(F.collect_list("c").alias("cents"))
    )


def _dist_structs():
    """(squared-L2-to-centroid, cid) struct array for the row's ``e``
    against the broadcast ``cents`` column; rounded to 6 with cid
    tie-break so argmin/sort are deterministic."""
    return F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("e"), c["ce"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, val: acc + val,
                ),
                6,
            ).alias("d"),
            c["cid"].alias("cid"),
        ),
    )


# Above this cell count the interpreted-fold assignment is auto-routed
# to the Arrow kernel even without the env flag (round 12): the JVM
# path's O(k·dim) lambda evaluations per row are CPU-infeasible at the
# k ≈ corpus/occupancy a real deployment derives (measured: k=250 ×
# 50k vectors did not finish in 120 s; Arrow does it in seconds), and
# the Arrow kernel computes IDENTICAL assignments (HALF_UP-at-6dp
# distance, cid tie-break — parity pinned by the flag-parity test), so
# the route is a physical choice, never semantic. The fixture regime
# (k = IVF_K = 8) stays on the JVM fold — the bit-level oracle path.
_IVF_ARROW_K = 32


def ivf_assign_with(
    v: DataFrame, cents: DataFrame, k: int | None = None
) -> DataFrame:
    """(vec_id, e, nrm, cell_id) for a (vec_id, e, nrm) frame against a
    prebuilt centroid row. The centroids broadcast, so assignment is a
    per-row ``array_min`` over k fold distances inside the scan — a
    map-only stage, NO shuffle of the corpus, which is the property
    that makes IVF viable at 100 TB.

    ``k`` is a routing HINT (the caller usually knows its cell count):
    above ``_IVF_ARROW_K`` the Arrow kernel is auto-picked — see the
    constant's comment. ``SPARK_GRAFT_ARROW_SCORER=1`` still forces
    Arrow at any k (the parity-test hook)."""
    if arrow_scorer() or (k is not None and k > _IVF_ARROW_K):
        return ivf_assign_arrow(v, cents)
    return v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "nrm", F.array_min(_dist_structs())["cid"].alias("cell_id")
    )


# One collected-centroid tuple per cents FRAME, weak-keyed so a
# released frame frees its matrix: the streaming paths build their
# probe/assign plans once per micro-batch against the SAME centroid
# frame, and without the memo each batch would re-pay a driver
# cents.first() job + K×dim stack (round-12 review finding — the
# hoisted _cents_k saved one job per batch and the un-memoized
# collection immediately spent one back).
#
# CONTRACT (ADVICE r12): the cache key is the DataFrame OBJECT, with
# no content fingerprint — a cents frame, once passed to an Arrow
# kernel, must be treated as IMMUTABLE for its lifetime. Every engine
# path honors this: build/train emit localCheckpointed one-shot
# frames, and save_ivf_index writes a NEW generation (load returns a
# fresh spark.table frame → fresh cache entry). What the cache cannot
# detect is a caller holding ONE long-lived spark.table("..._cents")
# frame across an out-of-band table overwrite — reopen the table
# (load_ivf_index) after any rewrite instead of reusing the old frame.
_CENTS_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _collect_centroids(cents: DataFrame):
    """(cids, C, c_sq) for a centroid row — cid-ascending (argmin's
    first-match = smallest cid), memoized per DataFrame object. The
    ONE copy of the centroid-collection law both Arrow kernels share
    (a forked copy would let a rounding/ordering fix silently split
    assignment from probing)."""
    import numpy as np

    hit = _CENTS_CACHE.get(cents)
    if hit is not None:
        return hit
    rows = cents.first()["cents"]
    order = sorted(range(len(rows)), key=lambda i: rows[i]["cid"])
    cids = np.array([rows[i]["cid"] for i in order], dtype=np.int64)
    C = np.stack([np.asarray(rows[i]["ce"], dtype=np.float64) for i in order])
    c_sq = (C * C).sum(axis=1)
    _CENTS_CACHE[cents] = (cids, C, c_sq)
    return cids, C, c_sq


def _rounded_d2(X, C, c_sq):
    """HALF_UP-at-6dp squared-L2 of every (row, centroid) pair — the
    ONE copy of the Arrow distance law (mirrors the JVM fold's
    round(Σ(x−y)², 6); the expanded form x²+c²−2x·c can differ from
    the sequential fold in the last float64 ulps BEFORE rounding, so
    a distance lying within ~1e-12·1e6 of a .5 boundary could round
    differently — measure-zero on real data, pinned equal on the
    fixtures, and harmless to IVF recall either way; callers that
    need bit-level oracle parity stay on the fold path by design)."""
    import numpy as np

    d2 = (X * X).sum(axis=1)[:, None] + c_sq[None, :] - 2.0 * (X @ C.T)
    return np.floor(np.maximum(d2, 0.0) * 1e6 + 0.5)


def ivf_assign_arrow(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Arrow-vectorized IVF assignment: the K×dim centroid matrix is
    collected once per centroid FRAME (KBs — the same 'centroid row
    is KB-sized' contract the JVM path's broadcast relies on; memoized
    across micro-batches) and captured in a pandas_udf closure; each
    Arrow batch computes all K distances with one numpy matmul.
    Distance law shared with :func:`ivf_probe_arrow` via
    :func:`_rounded_d2`; argmin with cid tie-break."""
    import pandas as pd

    from eventsgateway_spark.shipping import ship_package

    # the closure references module-level _rounded_d2 (pickled by
    # REFERENCE — the dot_arrow precedent): ship the package so
    # executors spawned without this repo on PYTHONPATH can resolve it
    ship_package(v.sparkSession)
    cids, C, c_sq = _collect_centroids(cents)

    # no type annotations: pandas_udf's hint inference can't resolve
    # the lazily-imported pd module (same pattern as shingles_arrow)
    def _cell_of(es):
        import numpy as np

        X = np.stack(es.values).astype(np.float64, copy=False)  # B x dim
        d2 = _rounded_d2(X, C, c_sq)
        return pd.Series(cids[np.argmin(d2, axis=1)])

    cell_of = F.pandas_udf(_cell_of, "bigint")

    return v.select("vec_id", "e", "nrm", cell_of(F.col("e")).alias("cell_id"))


def ivf_assign(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """Corpus-side IVF assignment (see :func:`ivf_assign_with`)."""
    return ivf_assign_with(norm_view(emb), ivf_centroids(emb, k), k=k)


# Session-scoped cache of the corpus IVF assignment — the
# near_dup_pair_frame discipline (ext_dedup.py) applied to the
# similarity family (round-15, guide §2.4): FOUR registry queries
# consume the same (vec_id, e, nrm, cell_id) frame (q43 candidate
# join, q70 within-cell dedup, q86 cell audit, q94 label vote), and
# in a shared bench/notebook session each used to re-run the
# centroid build + per-vector k×dim fold distances from scratch.
# Keyed (applicationId, realpath(sf_dir), k) — q43 pins k at the
# IVF_K oracle constant while q70/q86/q94 derive it from input size,
# so the entries only coincide when the derived count sits at the
# floor — with the EMBEDDINGS fixture fingerprint guarding in-place
# regens. At fixture scale the plain lineage is returned uncached so
# the driver's oracle runs hash-check each query independently.
_IVF_ASSIGN_CACHE: dict[tuple[str, str, int], tuple[str, DataFrame]] = session_cache({})


def ivf_assign_frame(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """THE shared corpus IVF-assignment frame at cell count ``k``,
    materialized once per (session, fixture, k) above fixture scale."""
    import os as _os

    from eventsgateway_spark.queries._util import (
        fixture_fingerprint,
        is_fixture_scale,
        release_frame,
    )

    key = (spark.sparkContext.applicationId, _os.path.realpath(sf_dir), k)
    fp = fixture_fingerprint(sf_dir, "embeddings")
    hit = _IVF_ASSIGN_CACHE.get(key)
    if hit is not None:
        cached_fp, cached = hit
        if cached_fp == fp:
            return cached
        del _IVF_ASSIGN_CACHE[key]
        release_frame(cached)
    emb = spread(table(spark, sf_dir, "embeddings"))
    # r15 batch 4: the one-time build starts from the session-shared
    # norm view when available (non-None exactly above fixture scale —
    # same embeddings-size gate), so a session holding two cell counts
    # (q43's IVF_K floor + the derived SemDeDup count) folds norms
    # once, not once per k. The plain fallback keeps fixture scale
    # (and any caller that stood the shared frame down) bit-identical.
    nf = norm_frame(spark, sf_dir)
    if nf is not None:
        nv = nf.select("vec_id", "e", "nrm")
        assign = ivf_assign_with(nv, ivf_centroids_of(nv, k), k=k)
    else:
        assign = ivf_assign(emb, k)
    if not is_fixture_scale(emb):
        assign = assign.localCheckpoint()
        _IVF_ASSIGN_CACHE[key] = (fp, assign)
    return assign


def ivf_probe_with(
    v: DataFrame, cents: DataFrame, nprobe: int = IVF_NPROBE,
    k: int | None = None,
) -> DataFrame:
    """(qid, qe, qn, cell_id): the ``nprobe`` nearest centroid cells per
    query row — ``array_sort`` on the same (dist, cid) structs, then
    ``slice``. One row per (query, probed cell).

    ``k`` is the same Arrow-routing hint as :func:`ivf_assign_with`
    (round-12 review finding: the corpus-side assignment auto-routes
    past ``_IVF_ARROW_K``, but the query side pays the identical
    O(k·dim) interpreted fold per row — and an availableNow backlog
    replay makes the "query side" corpus-sized). The Arrow probe
    replicates the fold's semantics exactly: HALF_UP-at-6dp squared-L2,
    (dist, cid) ordering, first ``nprobe`` cells.

    Routing (ADVICE r12): the env flag forces Arrow only at call
    sites that pass a ``k`` hint (the serving paths). The hintless
    call is q43's oracle path — it stays on the sequential fold
    unconditionally, so a hash-declared plan can never depend on
    ``_rounded_d2``'s expanded-form rounding (see its docstring's
    .5-ulp caveat)."""
    if k is not None and (arrow_scorer() or k > _IVF_ARROW_K):
        return ivf_probe_arrow(v, cents, nprobe)
    return v.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(_dist_structs()), 1, nprobe), lambda s: s["cid"]
            )
        ).alias("cell_id"),
    )


def ivf_probe_arrow(
    v: DataFrame, cents: DataFrame, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Arrow-vectorized probe: one numpy matmul per batch computes all
    K distances via the shared :func:`_rounded_d2` law; per row the
    ``nprobe`` cells in (dist, cid) order are returned as an array and
    exploded — same rows as the ``array_sort``+``slice`` path on every
    fixture (pinned by tests/test_ext.py::
    test_ivf_probe_arrow_matches_fold; see _rounded_d2's docstring for
    the last-ulp rounding-boundary caveat the fold path avoids).
    Centroid collection is memoized per frame (streaming builds one
    plan per micro-batch against the SAME cents — uncached, each batch
    would re-pay the driver collect)."""
    import pandas as pd

    from eventsgateway_spark.shipping import ship_package

    ship_package(v.sparkSession)  # _rounded_d2 pickles by reference
    cids, C, c_sq = _collect_centroids(cents)
    take = min(nprobe, len(cids))

    # no type annotations (pandas_udf hint inference vs lazy pd import
    # — the ivf_assign_arrow convention)
    def _cells_of(es):
        import numpy as np

        X = np.stack(es.values).astype(np.float64, copy=False)
        d2 = _rounded_d2(X, C, c_sq)
        # cids are ascending, so a stable argsort on d2 alone breaks
        # distance ties toward the smaller cid — the struct order
        nearest = np.argsort(d2, axis=1, kind="stable")[:, :take]
        return pd.Series(list(cids[nearest]))

    cells_of = F.pandas_udf(_cells_of, "array<bigint>")

    return v.select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.explode(cells_of(F.col("e"))).alias("cell_id"),
    )


def ivf_probes(
    emb: DataFrame, query_pred, k: int = IVF_K, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Probe cells for a query subset of the corpus itself (q43's
    shape); the query set is tiny by construction so this side
    broadcasts into the candidate join."""
    return ivf_probe_with(
        norm_view(emb).filter(query_pred), ivf_centroids(emb, k), nprobe
    )


@query(
    "q43_ivf_ann",
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    c AS (SELECT vec_id AS cid, e AS ce FROM v
          ORDER BY vec_id LIMIT {IVF_K}),  -- RANK, mirroring the
          -- Spark side's orderBy(vec_id).limit(k): identical to
          -- vec_id < k on dense-from-0 fixtures, but a regen with
          -- an id gap (or zero-norm row) below k stays consistent
          -- across engines (round-11b review finding)
    d AS (SELECT v.vec_id, c.cid, {_DUCK_L2SQ} AS dist
          FROM v CROSS JOIN c),
    ranked AS (SELECT vec_id, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) AS rn
               FROM d),
    assign AS (SELECT vec_id, cid AS cell_id FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id AS qid, cid AS cell_id FROM ranked
               WHERE rn <= {IVF_NPROBE} AND vec_id >= 10 AND vec_id < 20),
    n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm
          FROM v),
    cand AS (SELECT p.qid, a.vec_id AS neighbor_id, a.cell_id
             FROM probes p JOIN assign a
               ON a.cell_id = p.cell_id AND a.vec_id <> p.qid),
    scored AS (
        SELECT cand.qid, cand.neighbor_id, cand.cell_id,
               CAST(ROUND(list_sum(list_transform(range(1, len(q.e)+1),
                                                  i -> q.e[i] * t.e[i]))
                          / (q.nrm * t.nrm) * 1e6) AS BIGINT) AS cos_sim_u
        FROM cand
        JOIN n q ON q.vec_id = cand.qid
        JOIN n t ON t.vec_id = cand.neighbor_id
    )
    SELECT qid, rn, neighbor_id, cell_id, cos_sim_u
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cos_sim_u DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    ORDER BY qid, rn
    """,
)
def q43_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into K centroid
    cells, then search only the ``nprobe`` nearest cells per query.

    The complement of the LSH path (q34/q38): LSH buckets by random
    hyperplanes, IVF buckets by data-dependent centers. Physical shape
    at 100 TB: assignment is map-only (centroids broadcast as one
    array row — see ``ivf_assign``); the candidate join keys on
    ``cell_id`` with the tiny probe side broadcast, so the corpus is
    scanned once and never shuffled; per-query work is bounded by
    nprobe × cell occupancy, not corpus size. Deterministic centroids
    (first K ids) keep the whole query oracle-reproducible."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    assign = ivf_assign_frame(spark, sf_dir, IVF_K)
    query_pred = (F.col("vec_id") >= 10) & (F.col("vec_id") < 20)
    # r15 batch 4: above fixture scale the probe side and the centroid
    # row both come from the session-shared norm_frame — the
    # per-execution centroid build was a full parquet scan + norm fold
    # over every row feeding a TakeOrdered(k). Fixture scale keeps the
    # plain ivf_probes lineage (driver-oracle plan byte-identical).
    nf = norm_frame(spark, sf_dir)
    if nf is not None:
        nv = nf.select("vec_id", "e", "nrm")
        probes = ivf_probe_with(
            nv.filter(query_pred), ivf_centroids_of(nv, IVF_K), IVF_NPROBE
        )
    else:
        probes = ivf_probes(emb, query_pred)
    scored = (
        assign.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "cell_id",
            F.round(dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")) * 1e6)
            .cast("bigint")
            .alias("cos_sim_u"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim_u"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "rn", "neighbor_id", "cell_id", "cos_sim_u")
        .orderBy("qid", "rn")
    )


# ---------------------------------------------------------------------------
# q52 — int8 embedding quantization (absmax), exact-deterministic audit
# ---------------------------------------------------------------------------


@query(
    "q52_embedding_quantize",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    w AS (SELECT vec_id, label, e,
                 list_max(list_transform(e, x -> abs(x))) AS mx
          FROM v),
    q AS (SELECT vec_id, label, e, mx,
                 list_transform(e, x -> CAST(ROUND(x * 127.0 / mx) AS BIGINT)) AS qs
          FROM w WHERE mx > 0)
    SELECT vec_id, label,
           len(e) AS n_dims,
           CAST(list_sum(qs) AS BIGINT) AS sum_q,
           len(list_filter(qs, x -> abs(x) = 127)) AS n_sat,
           CAST(list_sum(list_transform(range(1, len(e) + 1),
               i -> CAST(ROUND(POWER(e[i] - qs[i] * mx / 127.0, 2) * 1e12) AS BIGINT)
           )) AS BIGINT) AS err_u
    FROM q
    ORDER BY vec_id
    """,
)
def q52_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absmax int8 quantization — the standard embedding-storage
    compression (4× smaller, dot products in integer SIMD downstream):
    q_i = round(127·x_i / max|x|). The audit columns are exact under
    any partitioning: quantized codes are integers, and the per-element
    reconstruction error is scaled to pico-unit BIGINTs *inside the
    row* before summing, so no cross-row float accumulation exists.
    All JVM higher-order functions (transform/filter/zip_with) — the
    quantizer itself needs no UDF at any scale; project mx before the
    lambda consumers (re-inlined subtrees re-evaluate per reference)."""
    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    )
    w = v.select(
        "vec_id", "label", "e", F.array_max(F.transform("e", F.abs)).alias("mx")
    ).filter(F.col("mx") > 0)
    q = w.select(
        "vec_id",
        "label",
        "e",
        "mx",
        F.transform(
            "e", lambda x: F.round(x * 127.0 / F.col("mx")).cast("bigint")
        ).alias("qs"),
    )
    zero = F.lit(0).cast("bigint")
    return q.select(
        "vec_id",
        "label",
        F.size("e").cast("bigint").alias("n_dims"),
        F.aggregate("qs", zero, lambda acc, x: acc + x).alias("sum_q"),
        F.size(F.filter("qs", lambda x: F.abs(x) == 127)).cast("bigint").alias("n_sat"),
        F.aggregate(
            F.zip_with(
                "e",
                "qs",
                lambda e, qq: F.round(
                    F.pow(e - qq * F.col("mx") / 127.0, F.lit(2)) * 1e12
                ).cast("bigint"),
            ),
            zero,
            lambda acc, x: acc + x,
        ).alias("err_u"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# q81 — quantized ANN: int8 codes of the unit vector, integer-dot top-k
# ---------------------------------------------------------------------------


@query(
    "q81_quantized_ann",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    n AS (SELECT vec_id, label, e, {_DUCK_NORM} AS nrm FROM v),
    u AS (SELECT vec_id, label,
                 list_transform(e, x -> CAST(ROUND(x * 127 / nrm) AS BIGINT))
                     AS qs
          FROM n),
    q AS (SELECT vec_id AS qid, label AS q_label, qs AS qq
          FROM u WHERE vec_id < 10),
    scored AS (
        SELECT q.qid, q.q_label, u.vec_id AS neighbor_id, u.label AS n_label,
               CAST(list_sum(list_transform(range(1, len(qq)+1),
                                            i -> qq[i] * u.qs[i]))
                    AS BIGINT) AS dot_i8
        FROM q JOIN u ON u.vec_id <> q.qid
    )
    SELECT qid, rn, neighbor_id, q_label, n_label, dot_i8
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY dot_i8 DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    ORDER BY qid, rn
    """,
)
def q81_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors ranked by the INT8-quantized dot product — the
    memory-bandwidth-bound retrieval path (q33's exact twin): each
    vector is normalized once and its unit direction quantized to
    int8 codes (q_i = round(127·x_i/‖x‖), the absmax scheme q52
    audits, here with scale = the norm so the integer dot IS the
    cosine in (127²)-units). What ships through the broadcast and the
    scan is the CODE array — 4× smaller than fp32, 8× smaller than
    the promoted doubles, which at 100 TB is the difference between a
    candidate scan that is memory-bound and one that fits cache lines;
    the per-pair kernel is an integer multiply-add (SIMD-able, exact).
    Ranking is EXACT integer math end-to-end (codes ≤ 127 in absolute
    value, so a 4096-dim dot is ≤ 6.6e7 — no overflow, no float
    accumulation order), hence hash-identical across engines and
    partitionings. Quantized-vs-exact ranking agreement is pinned by
    tests/test_ext.py::test_quantized_ann_agrees_with_exact."""
    # r15 batch 4: the quantize input is the session-shared norm view
    # above fixture scale (one scan + fold pass per session — the q33
    # rationale); the int8 code fold itself stays per-execution (it IS
    # this query's operator). Fixture scale keeps the plain lineage.
    nf = norm_frame(spark, sf_dir)
    if nf is not None:
        v = nf.select("vec_id", "label", "e", "nrm")
    else:
        v = (
            spread(table(spark, sf_dir, "embeddings"))
            .select(
                "vec_id", "label", as_double(F.col("embedding")).alias("e")
            )
            # squared-sum filter BEFORE the norm projection (q33 plan-test
            # discipline: a filter on projected sqrt re-folds with SQRT)
            .filter(norm_sq(F.col("e")) > 0)
            .withColumn("nrm", norm(F.col("e")))
        )
    from eventsgateway_spark.functions.vectors import dot_codes, sq8_codes

    u = v.select(
        "vec_id",
        "label",
        sq8_codes(F.col("e"), F.col("nrm")).alias("qs"),
    )
    q = u.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("qs").alias("qq"),
    )
    scored = u.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "q_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        dot_codes(F.col("qq"), F.col("qs")).alias("dot_i8"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot_i8"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "rn", "neighbor_id", "q_label", "n_label", "dot_i8")
        .orderBy("qid", "rn")
    )


# ---------------------------------------------------------------------------
# q70 — SemDeDup: semantic (embedding-cluster) deduplication
# ---------------------------------------------------------------------------
# Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
# through semantic deduplication"): cluster the embedding space, then
# compare pairs only WITHIN a cluster and drop all but one
# representative of each near-duplicate group. The clustering is what
# makes semantic dedup tractable — pairwise work is bounded by cell
# occupancy, never corpus².  Keep-rule here: lowest vec_id in a
# near-dup pair survives (deterministic; the paper's keep-choice is a
# free parameter).

SEMD_TAU_U = 400_000  # cosine >= 0.40, micro-unit scaled (q38's bound)

# Scale rule for the cell count: within-cell pair volume is K·occ²/2,
# so occupancy must stay ~constant as the corpus grows — target ~100 KiB
# of embedding bytes per cell (~250 fixture-sized vectors). Floor IVF_K
# (fixture/oracle constant), cap 2^16: the collected centroid matrix
# stays ≤ ~16 MB; beyond that a deployment shards the centroid table
# (SCALE.md similarity section).
_SEMD_TARGET_CELL_BYTES = 100 << 10


def semd_cell_count(emb: DataFrame) -> int:
    """Input-size-derived SemDeDup cell count (fixture floors at
    IVF_K, matching the oracle's deterministic first-K centroids).

    The cell count shapes the RESULT (which pairs are compared), so an
    input of UNKNOWN size falls back to the fixed oracle constant
    IVF_K — the huge-sentinel fallback would quietly give a
    createDataFrame/temp-view input 2^16 single-member cells and
    degenerate semantic dedup into exact-dup detection (ADVICE r5)."""
    from eventsgateway_spark.queries._util import known_input_bytes

    b = known_input_bytes(emb)
    if b is None:
        return IVF_K
    return int(min(max(IVF_K, b // _SEMD_TARGET_CELL_BYTES), 1 << 16))


# ---------------------------------------------------------------------------
# Within-cell GEMM kernels (round 15 — guide §4.2/§8)
# ---------------------------------------------------------------------------
# The q70/q94 within-cell scoring used to run as a cell-keyed pair
# self-join whose per-pair dot product is an interpreted zip_with/
# aggregate fold (higher-order functions are not codegen'd) — O(occ²)
# pair ROWS through the exchange, each carrying both 64-dim vectors,
# then a window on top (q94). These kernels keep the IVF-assign stage
# (map-only, broadcast centroids) and replace everything between it
# and the per-vector report with ONE applyInPandas over cell_id:
# every vector crosses the shuffle ONCE (guide §8's "move heavy bytes
# once, decide on the proxy"), and the occ² dot products run as one
# BLAS matmul per row-block instead of occ² interpreted folds.
#
# Memory bound: semd_cell_count targets ~constant bytes per cell, so
# group size (occ·dim doubles) is bounded by design; the score matrix
# is built in _CELL_GEMM_BLOCK-row blocks (block·occ int64) so a
# skewed cell cannot balloon one task.
#
# Determinism parity with the fold path (pinned by
# tests/test_ext.py::test_semd_knn_gemm_kernel_parity, exact row
# equality at sf0.001/0.01 and at the bench sf0.1 fixture):
#   * cos_u = HALF_UP(dot/(n1·n2)·1e6): the fold path's F.round is
#     BigDecimal HALF_UP; _halfup_u replicates it (floor(x+.5) for
#     x>=0, ceil(x-.5) otherwise — the _rounded_d2 law extended to
#     negative cosines).
#   * q94 neighbor order (cos_u desc, nid asc) and vote tie-break
#     (count desc, label asc) are integer-exact lexsorts — cos_u is
#     rounded BEFORE ranking, exactly like the window path.
#   * q70's max-prior commutes with rounding (round is monotone), so
#     one rounding of the max equals the fold's max of roundings.
# The only float-level difference is dot-product summation order
# (BLAS pairwise vs sequential fold) — a ~1 ulp effect that would
# need a cosine within ~1e-10 of a .5 micro-unit boundary to flip a
# result; the parity test checks the actual fixtures observe none.
#
# Routing: fixture scale keeps the fold path (the oracle-declared
# plan, byte-identical for the driver's sf0.01 runs);
# SPARK_GRAFT_ARROW_SCORER=1 forces the kernel (the parity-test hook)
# — the ivf_assign_with convention.

_CELL_GEMM_BLOCK = 2048


def _halfup_u(x):
    """HALF_UP at 6dp in micro-units — F.round(x*1e6)'s law as numpy."""
    import numpy as np

    x = x * 1e6
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _cell_sorted(pdf):
    """vec_id-ascending (ids, M, nrm) arrays of one cell group."""
    import numpy as np

    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(dtype="int64")
    M = np.stack(pdf["e"].values).astype(np.float64, copy=False)
    nrm = pdf["nrm"].to_numpy(dtype=np.float64)
    return pdf, ids, M, nrm


def _semd_prior_kernel(pdf):
    """(vec_id, max_prior_sim_u) rows for every vector with a
    smaller-id cell-mate — q70's keep-first prior as one GEMM."""
    import numpy as np
    import pandas as pd

    _, ids, M, nrm = _cell_sorted(pdf)
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"),
             "max_prior_sim_u": pd.Series(dtype="int64")}
        )
    out_ids, out_max = [], []
    for lo in range(0, n, _CELL_GEMM_BLOCK):
        hi = min(lo + _CELL_GEMM_BLOCK, n)
        G = M[lo:hi] @ M.T
        cos = G / (nrm[lo:hi, None] * nrm[None, :])
        for r in range(hi - lo):
            i = lo + r
            if i == 0:
                continue
            out_ids.append(ids[i])
            # max commutes with the monotone rounding — one HALF_UP of
            # the max equals the fold path's max of per-pair roundings
            out_max.append(int(_halfup_u(cos[r, :i].max())))
    return pd.DataFrame(
        {"vec_id": pd.Series(out_ids, dtype="int64"),
         "max_prior_sim_u": pd.Series(out_max, dtype="int64")}
    )


def _knn_vote_kernel(pdf):
    """(vec_id, knn_label, n_nbrs, n_agree) rows for every vector with
    >=1 cell-mate — q94's 3-NN majority vote as one GEMM + integer
    lexsorts. Lone vectors emit NO row (the caller's left join +
    coalesce supplies the -1/0 sentinels, exactly like the fold
    path's missing-top3 case)."""
    import numpy as np
    import pandas as pd

    spdf, ids, M, nrm = _cell_sorted(pdf)
    labs = spdf["label"].to_numpy(dtype="int64")
    n = len(ids)
    out = {"vec_id": [], "knn_label": [], "n_nbrs": [], "n_agree": []}
    if n >= 2:
        kk = min(3, n - 1)
        for lo in range(0, n, _CELL_GEMM_BLOCK):
            hi = min(lo + _CELL_GEMM_BLOCK, n)
            G = M[lo:hi] @ M.T
            cu = _halfup_u(G / (nrm[lo:hi, None] * nrm[None, :]))
            for r in range(hi - lo):
                i = lo + r
                row = cu[r].copy()
                # self is never a neighbor: int64min+1 negates to
                # int64max (a bare int64min would OVERFLOW under the
                # negation below and sort self FIRST), so self sorts
                # strictly last and [:kk] (kk <= n-1) never takes it
                row[i] = np.iinfo(np.int64).min + 1
                # (cos_u desc, nid asc) — the fold path's window order,
                # integer-exact because cu is already rounded
                nb = np.lexsort((ids, -row))[:kk]
                nl = labs[nb]
                vals, cnts = np.unique(nl, return_counts=True)
                best = np.lexsort((vals, -cnts))[0]  # count desc, label asc
                out["vec_id"].append(ids[i])
                out["knn_label"].append(int(vals[best]))
                out["n_nbrs"].append(kk)
                out["n_agree"].append(int(cnts[best]))
    return pd.DataFrame(
        {k: pd.Series(v, dtype="int64") for k, v in out.items()}
    )


def _bucket_pair_kernel(pdf):
    """(id1, id2, cos_sim_u) rows for every within-bucket pair at or
    above q38's verify threshold — candidate generation AND the
    exact-cosine verify of one (tbl, bucket) LSH group as a single
    GEMM (r15 batch 4). The fold path materialized every candidate
    pair as a ROW carrying both 64-dim vectors through two vec_id
    joins, then ran an interpreted zip_with/aggregate dot per pair;
    here each vector crosses the shuffle once per table (guide §8:
    heavy bytes move once, the pair grid is computed in place) and
    the occ² dots run as BLAS blocks. Pairs sharing buckets in BOTH
    tables emit twice with the same rounded score — the caller's
    distinct() collapses them, exactly like the fold path's candidate
    distinct. Same HALF_UP micro-unit law (_halfup_u) and the same
    last-ulp caveat as the q70/q94 kernels (parity-pinned on every
    fixture by test_q38_bucket_gemm_matches_fold)."""
    import numpy as np
    import pandas as pd

    _, ids, M, nrm = _cell_sorted(pdf)
    n = len(ids)
    cols = {"id1": [], "id2": [], "cos_sim_u": []}
    if n >= 2:
        col_idx = np.arange(n)[None, :]
        for lo in range(0, n, _CELL_GEMM_BLOCK):
            hi = min(lo + _CELL_GEMM_BLOCK, n)
            G = M[lo:hi] @ M.T
            cu = _halfup_u(G / (nrm[lo:hi, None] * nrm[None, :]))
            sel = (cu >= SEMD_TAU_U) & (
                col_idx > np.arange(lo, hi)[:, None]
            )
            rr, cc = np.nonzero(sel)
            cols["id1"].extend(ids[lo + rr].tolist())
            cols["id2"].extend(ids[cc].tolist())
            cols["cos_sim_u"].extend(cu[rr, cc].tolist())
    return pd.DataFrame(
        {k: pd.Series(v, dtype="int64") for k, v in cols.items()}
    )


@query(
    "q70_semantic_dedup",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    c AS (SELECT vec_id AS cid, e AS ce FROM v
          ORDER BY vec_id LIMIT {IVF_K}),  -- RANK, mirroring the
          -- Spark side's orderBy(vec_id).limit(k): identical to
          -- vec_id < k on dense-from-0 fixtures, but a regen with
          -- an id gap (or zero-norm row) below k stays consistent
          -- across engines (round-11b review finding)
    d AS (SELECT v.vec_id, c.cid, {_DUCK_L2SQ} AS dist
          FROM v CROSS JOIN c),
    assign AS (SELECT vec_id, cid AS cell_id FROM
               (SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM d)
               WHERE rn = 1),
    n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm
          FROM v),
    pairs AS (
        SELECT a.vec_id AS id1, a.cell_id,
               CAST(ROUND(list_sum(list_transform(range(1, len(x.e)+1),
                                                  i -> x.e[i] * y.e[i]))
                          / (x.nrm * y.nrm) * 1e6) AS BIGINT) AS cos_u
        FROM assign a
        JOIN assign b ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
        JOIN n x ON x.vec_id = a.vec_id
        JOIN n y ON y.vec_id = b.vec_id
    ),
    prior AS (SELECT id1 AS vec_id, MAX(cos_u) AS max_prior_sim_u
              FROM pairs GROUP BY 1)
    SELECT a.vec_id, a.cell_id,
           CASE WHEN COALESCE(p.max_prior_sim_u, -2000000) >= {SEMD_TAU_U}
                THEN 1 ELSE 0 END AS dropped,
           COALESCE(p.max_prior_sim_u, -2000000) AS max_prior_sim_u
    FROM assign a LEFT JOIN prior p ON p.vec_id = a.vec_id
    ORDER BY a.vec_id
    """,
)
def q70_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over ``embeddings``: IVF-assign every vector to its
    nearest deterministic centroid (map-only, centroids broadcast —
    ivf_assign), then mark a vector dropped iff some SMALLER-id vector
    in the same cell has cosine >= 0.40 (keep-first within each
    near-dup group). Physical shape at 100 TB: one shuffle keyed by
    cell_id for the within-cell pair join — pairwise work is bounded
    by cell occupancy (k-means cells at scale; the cell count grows
    with the corpus, holding occupancy roughly constant), never
    corpus². Output: per-vector decision (vec_id, cell_id, dropped,
    max_prior_sim_u), totally ordered."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    assign = ivf_assign_frame(spark, sf_dir, semd_cell_count(emb))
    from eventsgateway_spark.queries._util import is_fixture_scale

    if arrow_scorer() or not is_fixture_scale(emb):
        # r15 within-cell GEMM kernel (comment block above the kernel):
        # each vector crosses the shuffle once, the occ² dots run as
        # BLAS blocks. Measured q70 floor 3.6 → 1.6 s at sf0.1
        # (interleaved A/B, round-15); row-identical output
        # (parity-pinned). Fixture scale keeps the fold plan below.
        from eventsgateway_spark.shipping import ship_package

        ship_package(spark)
        prior = (
            assign.select("vec_id", "e", "nrm", "cell_id")
            .groupBy("cell_id")
            .applyInPandas(
                _semd_prior_kernel, "vec_id long, max_prior_sim_u long"
            )
        )
    else:
        a = assign.select(
            F.col("vec_id").alias("id1"), F.col("e").alias("e1"),
            F.col("nrm").alias("n1"), "cell_id",
        )
        b = assign.select(
            F.col("vec_id").alias("id2"), F.col("e").alias("e2"),
            F.col("nrm").alias("n2"), "cell_id",
        )
        prior = (
            a.join(b, "cell_id")
            .filter(F.col("id2") < F.col("id1"))
            .select(
                F.col("id1").alias("vec_id"),
                F.round(
                    dot(F.col("e1"), F.col("e2"))
                    / (F.col("n1") * F.col("n2")) * 1e6
                )
                .cast("bigint")
                .alias("cos_u"),
            )
            .groupBy("vec_id")
            .agg(F.max("cos_u").alias("max_prior_sim_u"))
        )
    sentinel = F.lit(-2_000_000).cast("bigint")
    return (
        assign.select("vec_id", "cell_id")
        .join(prior, "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            F.when(
                F.coalesce("max_prior_sim_u", sentinel) >= SEMD_TAU_U, 1
            )
            .otherwise(0)
            .alias("dropped"),
            F.coalesce("max_prior_sim_u", sentinel).alias("max_prior_sim_u"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q85 — LSH table-family occupancy audit (the candidate-volume contract)
# ---------------------------------------------------------------------------


@query(
    "q85_lsh_table_stats",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    b AS ({_DUCK_ND_BUCKETS}),
    occ AS (SELECT tbl, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2)
    SELECT tbl,
           COUNT(*) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_vectors,
           CAST(SUM(n * n) AS BIGINT) AS occ_sq,
           CAST(MAX(n) AS BIGINT) AS max_occ
    FROM occ
    GROUP BY 1
    ORDER BY 1
    """,
)
def q85_lsh_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table occupancy audit of q38's OR-construction LSH family —
    the candidate-volume CONTRACT as a driver-checked number: per
    table, ``occ_sq`` (Σ count² over buckets) IS the table's bucket-
    join pair volume, the quantity the round-12 coupled ladder holds
    ~linear in N (SCALE.md round-12 table; tools/lsh_ladder_probe.py
    measures the same statistic at 100k vectors). Planes and tables
    come from the same ``lsh_family`` call q38 uses, flooring to
    (6, 2) at every oracle scale so the static two-table mirror is
    exact. Physical shape: one scan computing T×p projections per
    row (map-only), then a (tbl, bucket) hash aggregate and a T-row
    rollup — no joins, no window, nothing corpus-grain crosses the
    shuffle except the (tbl, bucket) occupancy table."""
    emb = table(spark, sf_dir, "embeddings")
    np_, nt_ = lsh_family(emb, _ND_PLANES, _ND_TABLES)
    from eventsgateway_spark.queries._util import is_fixture_scale

    if (np_, nt_) == (_ND_PLANES, _ND_TABLES) and is_fixture_scale(emb):
        # oracle regime (floors, driver fixture scale): JVM fold
        # buckets (bit-level reproducibility), plan unchanged. pin:
        # the frame fans out to nt_ per-table branches — unpinned,
        # every branch would re-run the scan + zero-norm filter fold
        v = pin(
            spread(emb)
            # squared-sum filter BEFORE any norm projection (q33
            # plan-test discipline; mirrors _DUCK_V_NONZERO)
            .filter(norm_sq(as_double(F.col("embedding"))) > 0)
            .select("vec_id", "embedding")
        )
        per_table = None
        for t in range(nt_):
            b = v.select(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col("embedding"), np_, t).alias("bucket"),
            )
            per_table = b if per_table is None else per_table.unionAll(b)
    elif (np_, nt_) == (_ND_PLANES, _ND_TABLES):
        # floors geometry above fixture scale (bench regime): audit
        # the session-shared bucket table q38 generates candidates
        # from (one lineage, two views — r15)
        per_table = lsh_bucket_frame(spark, sf_dir, np_, nt_).select(
            "tbl", "bucket"
        )
    else:
        # above the floors: one Arrow pass for all tables (q38's gate)
        v = pin(
            spread(emb)
            .filter(norm_sq(as_double(F.col("embedding"))) > 0)
            .select("vec_id", "embedding")
        )
        per_table = v.select(
            F.posexplode(
                lsh_buckets_arrow(F.col("embedding"), np_, nt_)
            ).alias("tbl", "bucket")
        )
    occ = per_table.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        occ.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n").cast("bigint").alias("n_vectors"),
            F.sum(F.col("n") * F.col("n")).cast("bigint").alias("occ_sq"),
            F.max("n").cast("bigint").alias("max_occ"),
        )
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# q86 — IVF cell-occupancy audit (the serving index's balance contract)
# ---------------------------------------------------------------------------


@query(
    "q86_ivf_cell_stats",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    c AS (SELECT vec_id AS cid, e AS ce FROM v
          ORDER BY vec_id LIMIT {IVF_K}),  -- RANK (q43/q70 convention)
    d AS (SELECT v.vec_id, c.cid, {_DUCK_L2SQ} AS dist
          FROM v CROSS JOIN c),
    assign AS (SELECT vec_id, cid AS cell_id FROM
               (SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM d)
               WHERE rn = 1)
    SELECT cell_id,
           COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec_id,
           MAX(vec_id) AS max_vec_id
    FROM assign
    GROUP BY 1
    ORDER BY 1
    """,
)
def q86_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy audit of the IVF index at the INPUT-DERIVED cell
    count (semd_cell_count — build_ivf_index's round-12 default; the
    per-probe candidate cost the serving path pays is exactly one
    cell's occupancy × nprobe, so balance here is the latency
    contract; append_ivf_index reports the same statistic as
    ``cell_skew`` on every mutation). Floors to the oracle constant
    IVF_K=8 at every fixture scale; above the fixture regime the
    count grows with corpus bytes and assignment auto-routes to the
    Arrow kernel (identical assignments, parity-pinned). Physical
    shape: map-only assignment (broadcast centroid row), one hash
    aggregate on cell_id — the corpus is never reshuffled."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    assign = ivf_assign_frame(spark, sf_dir, semd_cell_count(emb))
    return (
        assign.groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
        .orderBy("cell_id")
    )


# ---------------------------------------------------------------------------
# q94 — within-cell kNN label-consistency audit (round 14)
# ---------------------------------------------------------------------------
# Confident-learning-style mislabel detection (Northcutt et al. 2021's
# premise re-expressed as a similarity query): a training example whose
# nearest neighbors in embedding space carry a DIFFERENT label is a
# label-noise suspect a curation pipeline wants surfaced before
# training. Distributed shape = q70's SemDeDup skeleton (IVF-assign,
# then pairs WITHIN a cell only — pairwise work bounded by cell
# occupancy, never corpus²) with a 3-NN majority vote on top instead
# of a keep-first rule; every ranking and vote tie-break is
# deterministic (cos micro-units desc / neighbor id asc; vote count
# desc / smallest label). Vectors alone in their cell get the -1
# sentinel (no neighbors, BIGINT column — the NULL-degradation
# convention). Reference anchor: README.md:11-17 delegates data
# quality downstream; this is the label-quality member of that
# pipeline, next to q67's rule screen and q80's propagated scores.


@query(
    "q94_knn_label_consistency",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle=f"""
    WITH v AS ({_DUCK_V_NONZERO}),
    c AS (SELECT vec_id AS cid, e AS ce FROM v
          ORDER BY vec_id LIMIT {IVF_K}),  -- RANK (q70's oracle law)
    d AS (SELECT v.vec_id, c.cid, {_DUCK_L2SQ} AS dist
          FROM v CROSS JOIN c),
    assign AS (SELECT vec_id, cid AS cell_id FROM
               (SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM d)
               WHERE rn = 1),
    n AS (SELECT vec_id, label, e,
                 sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm
          FROM v),
    prs AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               CAST(ROUND(list_sum(list_transform(range(1, len(x.e)+1),
                                                  i -> x.e[i] * y.e[i]))
                          / (x.nrm * y.nrm) * 1e6) AS BIGINT) AS cos_u
        FROM assign a
        JOIN assign b ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
        JOIN n x ON x.vec_id = a.vec_id
        JOIN n y ON y.vec_id = b.vec_id
    ),
    top3 AS (SELECT qid, nid FROM
             (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                           ORDER BY cos_u DESC, nid) AS rn
              FROM prs)
             WHERE rn <= 3),
    votes AS (SELECT t.qid, y.label AS n_label, COUNT(*) AS cnt
              FROM top3 t JOIN n y ON y.vec_id = t.nid GROUP BY 1, 2),
    maj AS (SELECT qid, n_label AS knn_label, cnt AS n_agree FROM
            (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY cnt DESC, n_label) AS rn
             FROM votes)
            WHERE rn = 1),
    nn AS (SELECT qid, COUNT(*) AS n_nbrs FROM top3 GROUP BY 1)
    SELECT a.vec_id, CAST(x.label AS BIGINT) AS label,
           CAST(COALESCE(m.knn_label, -1) AS BIGINT) AS knn_label,
           CAST(COALESCE(nn.n_nbrs, 0) AS BIGINT) AS n_nbrs,
           CAST(COALESCE(m.n_agree, 0) AS BIGINT) AS n_agree,
           CAST(CASE WHEN m.knn_label IS NOT NULL
                      AND m.knn_label <> x.label
                THEN 1 ELSE 0 END AS BIGINT) AS mismatch
    FROM assign a
    JOIN n x ON x.vec_id = a.vec_id
    LEFT JOIN maj m ON m.qid = a.vec_id
    LEFT JOIN nn ON nn.qid = a.vec_id
    ORDER BY a.vec_id
    """,
)
def q94_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector 3-NN label vote within its IVF cell (comment block
    above): (vec_id, label, knn_label, n_nbrs, n_agree, mismatch),
    totally ordered. The cell count is input-size-derived like q70's
    (fixture floors at the IVF_K oracle constant); labels join onto
    the REDUCED top-3 frame (3 rows/vector), never onto the pair
    join's input — the corpus-grain work is exactly q70's within-cell
    pair join, reused shape and bounds."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    assign = ivf_assign_frame(spark, sf_dir, semd_cell_count(emb))
    labels = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    from eventsgateway_spark.queries._util import is_fixture_scale

    if arrow_scorer() or not is_fixture_scale(emb):
        # r15 within-cell GEMM kernel (comment block above the
        # kernel): replaces pair join + mirror union + two windows +
        # votes aggregate with ONE applyInPandas over cell_id — each
        # vector crosses the shuffle once, dots run as BLAS blocks,
        # and the 3-NN vote is integer lexsorts inside the group.
        # Measured q94 floor 4.7 → 1.9 s at sf0.1 (interleaved A/B,
        # round-15); row-identical output (parity-pinned). Fixture
        # scale keeps the fold plan below.
        from eventsgateway_spark.shipping import ship_package

        ship_package(spark)
        voted = (
            assign.join(labels, "vec_id")
            .select("vec_id", "e", "nrm", "label", "cell_id")
            .groupBy("cell_id")
            .applyInPandas(
                _knn_vote_kernel,
                "vec_id long, knn_label long, n_nbrs long, n_agree long",
            )
        )
        return (
            assign.select("vec_id")
            .join(labels, "vec_id")
            .join(voted, "vec_id", "left")
            .select(
                "vec_id",
                F.col("label").cast("bigint").alias("label"),
                F.coalesce("knn_label", F.lit(-1))
                .cast("bigint")
                .alias("knn_label"),
                F.coalesce("n_nbrs", F.lit(0)).cast("bigint").alias("n_nbrs"),
                F.coalesce("n_agree", F.lit(0))
                .cast("bigint")
                .alias("n_agree"),
                F.when(
                    F.col("knn_label").isNotNull()
                    & (F.col("knn_label") != F.col("label")),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("mismatch"),
            )
            .orderBy("vec_id")
        )
    a = assign.select(
        F.col("vec_id").alias("qid"), F.col("e").alias("e1"),
        F.col("nrm").alias("n1"), "cell_id",
    )
    b = assign.select(
        F.col("vec_id").alias("nid"), F.col("e").alias("e2"),
        F.col("nrm").alias("n2"), "cell_id",
    )
    pair_dot = dot
    # UNDIRECTED pair join (nid < qid) + projection mirror: the dot
    # fold — the dominant CPU here — runs once per unordered pair and
    # both direction branches share the one canonical join subtree
    # (ReusedExchange). Row-identical to the directed join (the fold
    # is argument-order-symmetric) and measured faster in an
    # interleaved sf0.1 A/B (round-14 closing: 5.7 vs 6.6 s median);
    # at scale it halves the per-pair folds outright.
    half = (
        a.join(b, "cell_id")
        .filter(F.col("nid") < F.col("qid"))
        .select(
            "qid",
            "nid",
            F.round(
                pair_dot(F.col("e1"), F.col("e2"))
                / (F.col("n1") * F.col("n2")) * 1e6
            )
            .cast("bigint")
            .alias("cos_u"),
        )
    )
    prs = half.unionByName(
        half.select(
            F.col("nid").alias("qid"), F.col("qid").alias("nid"), "cos_u"
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_u"), F.asc("nid"))
    top3 = (
        prs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "nid")
    )
    votes = (
        top3.join(labels.select(F.col("vec_id").alias("nid"),
                                F.col("label").alias("n_label")), "nid")
        .groupBy("qid", "n_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("cnt"), F.asc("n_label"))
    maj = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            F.col("n_label").alias("knn_label"),
            F.col("cnt").alias("n_agree"),
        )
    )
    # n_nbrs counts top3 directly: both top3 consumers canonicalize to
    # the same window subtree, so ReusedExchange runs the pair join
    # once — an interleaved sf0.1 A/B (round-14 closing) measured this
    # shape FASTER than deriving n_nbrs from the votes aggregate
    # (6.3/5.3 s vs 8.9/6.3 s warm), refuting the double-computation
    # guess; keep measuring before "fixing" plan reuse.
    nn = top3.groupBy("qid").agg(F.count(F.lit(1)).alias("n_nbrs"))
    return (
        assign.select("vec_id")
        .join(labels, "vec_id")
        .join(maj.withColumnRenamed("qid", "vec_id"), "vec_id", "left")
        .join(nn.withColumnRenamed("qid", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.coalesce("knn_label", F.lit(-1)).cast("bigint").alias("knn_label"),
            F.coalesce("n_nbrs", F.lit(0)).cast("bigint").alias("n_nbrs"),
            F.coalesce("n_agree", F.lit(0)).cast("bigint").alias("n_agree"),
            F.when(
                F.col("knn_label").isNotNull()
                & (F.col("knn_label") != F.col("label")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("mismatch"),
        )
        .orderBy("vec_id")
    )

"""Event-stream analytics queries over the driver's ``events`` table.

These re-express the reference's event pipeline semantics as batch
operators: the notebook's time-derivation ETL (P4,
spark-notebook/eventsgateway-streaming.ipynb:103-106), the Prometheus
metric aggregations (A1-A3, metrics/metrics.go:47-76), stateful dedup
(Q15 — README.md:11-17 at-least-once notice), sessionization (Q13
batch analog), and JSON prop extraction (Q12; the driver fixture stores
props as a JSON string rather than map<string,string>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eventsgateway_spark.queries import query
from eventsgateway_spark.queries._util import as_double, money, table

# ---------------------------------------------------------------------------
# Flagship — daily event counts (the notebook ETL + grouped counter A1)
# ---------------------------------------------------------------------------


@query(
    "q01_daily_event_counts",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           event_type AS event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q01_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship vertical slice: scan → time derivation (P4) → grouped
    count/sum (A1) → total order. Mirrors the reference notebook's
    year/month/day derivation from event time (.ipynb:103-106)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
        .orderBy("event_date", "event_type")
    )


# ---------------------------------------------------------------------------
# Q12 — JSON prop extraction (props is a JSON string in the fixture)
# ---------------------------------------------------------------------------


@query(
    "q13_props_json_extract",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    WITH k0 AS (
        SELECT TRY_CAST(CASE WHEN translate(
                   json_extract_string(props, '$.k'), '0123456789', '')
                   IN ('', '-')
                   THEN json_extract_string(props, '$.k') END AS INTEGER) AS k
        FROM events
    )
    SELECT COALESCE(CAST(FLOOR(k / 10.0) AS BIGINT), -2147483648) AS k_bucket,
           COUNT(*) AS n_events,
           COALESCE(CAST(SUM(k) AS BIGINT), 0) AS sum_k,
           COALESCE(CAST(MIN(k) AS BIGINT), 0) AS min_k,
           COALESCE(CAST(MAX(k) AS BIGINT), 0) AS max_k
    FROM k0
    GROUP BY 1
    ORDER BY 1
    """,
)
def q13_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema payload access — the engine's analog of the
    reference's props map<string,string> (client/client.go:168); here via
    get_json_object, JVM-side. try_cast (both engines): props is
    CLIENT-controlled JSON, and under ANSI a single malformed '$.k'
    would otherwise kill the whole query instead of grouping under the
    null bucket (round-10 ANSI audit — same defined-null discipline as
    the division guards). The integral-form guard runs in BOTH engines
    before the cast (ADVICE r10): on fractional numeric strings the
    engines' bare casts DISAGREE — Spark try_cast('12.5' AS INT) is
    NULL while DuckDB TRY_CAST rounds to 13 — so a client prop like
    {"k": "12.5"} would silently diverge. Since round 12 the guard is
    the REGEX-FREE ``translate(k, '0123456789', '') IN ('', '-')``
    (VERDICT r11 #2 — the ^-?[0-9]+$ rlike was the only >1.1× bench
    regression of round 11, a per-row regex on every props
    extraction): translate admits a SUPERSET of the regex language —
    digits-and-dashes strings like '1-2', '12-', '-' — but every
    extra member fails try_cast(... AS INT) to NULL identically in
    both engines, so the defined k is unchanged (0 divergences on a
    6,782-string hostile fuzz incl. unicode digits, underscores,
    exponent forms — both cross-engine and vs the old regex; the
    alternative bare decimal(18,0) double-cast was REJECTED by the
    same fuzz: DuckDB parses '3_4'→34, '27e '→27, '+'→0 where Spark
    yields NULL). Out-of-range integral strings still fall to NULL
    identically via try_cast. The oracle
    buckets with FLOOR(k/10.0), not DuckDB's ``//``: integer ``//``
    TRUNCATES toward zero there (-3//10 = 0) while Spark's
    floor(k/10) floors (-1) — a second latent divergence the hostile
    fixture (negative k) exposed; FLOOR matches Spark exactly and is
    safe in double for every int32 k. Sentinels instead of NULLs in the
    integer outputs (q72's min_source_id convention): the malformed-k
    group lands in bucket -2147483648 — unreachable from real data,
    floor(int32_min/10) is -214748365 — with 0-sentinel aggregates
    (n_events carries its meaning). One NULL in a BIGINT oracle column
    degrades the driver's pandas fetch of the WHOLE column to float64
    ('7.0' vs '7'), hash-diverging every row, not just the null one."""
    ev = table(spark, sf_dir, "events")
    raw = F.get_json_object("props", "$.k")
    k = F.when(
        F.translate(raw, "0123456789", "").isin("", "-"), raw
    ).try_cast("int")
    null_bucket = F.lit(-2147483648).cast("bigint")
    zero = F.lit(0).cast("bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("bigint").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .select(
            F.coalesce("k_bucket", null_bucket).alias("k_bucket"),
            "n_events",
            F.coalesce("sum_k", zero).alias("sum_k"),
            F.coalesce("min_k", zero).alias("min_k"),
            F.coalesce("max_k", zero).alias("max_k"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# Q8 — per-user ordered windows: lag + running sum
# ---------------------------------------------------------------------------


@query(
    "q14_user_running_stats",
    declared=False,
    oracle="""
    SELECT user_id AS user_id,
           event_id AS event_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(LAG(value) OVER w AS DOUBLE) AS prev_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rn
    """,
)
def q14_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / lag / running frame sum over per-user event-time
    order — one shuffle on user_id serves all three window functions."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.lag("value").over(w).cast("double").alias("prev_value"),
            as_double(
                F.sum(money("value")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            ).alias("running_value"),
        )
        .orderBy("user_id", "rn")
    )


# ---------------------------------------------------------------------------
# A2 — histogram aggregation with the reference's metric buckets
# ---------------------------------------------------------------------------


@query(
    "q15_value_histogram",
    oracle="""
    SELECT CASE
             WHEN value <= 10 THEN 'le_10'
             WHEN value <= 30 THEN 'le_30'
             WHEN value <= 50 THEN 'le_50'
             WHEN value <= 100 THEN 'le_100'
             WHEN value <= 500 THEN 'le_500'
             ELSE 'inf' END AS bucket,
           event_type AS event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q15_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bucket histogram — the reference's Prometheus histogram
    semantics ({10,30,50,100,500} buckets, metrics/metrics.go:53) as a
    grouped aggregation."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    bucket = (
        F.when(v <= 10, "le_10")
        .when(v <= 30, "le_30")
        .when(v <= 50, "le_50")
        .when(v <= 100, "le_100")
        .when(v <= 500, "le_500")
        .otherwise("inf")
    )
    return (
        ev.groupBy(bucket.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket", "event_type")
    )


# ---------------------------------------------------------------------------
# Q15 — dedup: latest event per (user, type) — at-least-once → once
# ---------------------------------------------------------------------------


@query(
    "q16_dedup_latest_per_user_type",
    oracle="""
    SELECT user_id AS user_id, event_type AS event_type,
           event_id AS event_id,
           CAST(value AS DOUBLE) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def q16_dedup_latest_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dedup-to-latest (keep newest by event time, deterministic
    tiebreak) — the downstream-dedup the reference mandates for its
    at-least-once delivery (README.md:11-17). Streaming analog:
    streaming/dedup.py."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", as_double(F.col("value")).alias("value"))
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Q6 — cube over event dimensions
# ---------------------------------------------------------------------------


@query(
    "q17_cube_event_stats",
    declared=False,  # rotation-pool member since r6 (pairs with q76;
    # Q6 family keeps q06 in the static tier every phase)
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), '(all)') AS event_date,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    ORDER BY 3, 1, 2
    """,
)
def q17_cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type × day) — all 4 grouping-set combinations in one
    pass (Spark expands to a single shuffle with grouping-id column)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    return (
        ev.cube("event_type", "d")
        .agg(F.grouping_id().cast("bigint").alias("gid"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("d").cast("string"), F.lit("(all)")).alias("event_date"),
            "gid",
            "n",
        )
        .orderBy("gid", "event_type", "event_date")
    )


# ---------------------------------------------------------------------------
# Q13 batch analog — sessionization (gap > 30 min starts a new session)
# ---------------------------------------------------------------------------


@query(
    "q18_sessionize",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    WITH lagged AS (
        SELECT user_id, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev_ts AS TIMESTAMP)) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM lagged
    ), numbered AS (
        SELECT user_id, event_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    )
    SELECT user_id AS user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS session_start_us,
           CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS session_end_us
    FROM numbered
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q18_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands (new session after a
    30-min silence). The streaming equivalent is session_window in
    streaming/windows.py; semantics match on static input."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(prev_us.isNull() | ((us - prev_us) > 1_800_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).cast("bigint").alias("session_start_us"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("session_end_us"),
        )
        .orderBy("user_id", "session_seq")
    )


# ---------------------------------------------------------------------------
# Q5 — as-of join: purchase enriched with latest prior view
# ---------------------------------------------------------------------------


@query(
    "q37_asof_purchase_view",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS view_event_id
          FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT p.event_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           -- COALESCE to -1: a purchase with no prior view yields NULL,
           -- and any NULL in a BIGINT column degrades the whole column
           -- to float64 in the driver's pandas canonicalization.
           COALESCE(v.view_event_id, -1) AS view_event_id,
           COALESCE(epoch_ms(v.ts), -1) AS view_ms,
           COALESCE(epoch_ms(p.ts) - epoch_ms(v.ts), -1) AS gap_ms
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY 1
    """,
)
def q37_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.5 Q5): each purchase gains the user's
    latest view at-or-before purchase time — the event↔state
    enrichment shape. Runs through operators.asof.asof_join
    (union-tag-window, ONE shuffle on user_id; no time-range row
    explosion). The right side is pre-deduped to one row per
    (user, ts) so ties are deterministic; the DuckDB oracle is a
    native ASOF LEFT JOIN over the same inputs."""
    from eventsgateway_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof_join(
        p, v, on=["user_id"], left_time="ts", right_time="ts",
        right_values=["view_event_id", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.coalesce("view_event_id_asof", F.lit(-1)).alias("view_event_id"),
        F.coalesce(F.unix_millis("ts_asof"), F.lit(-1)).alias("view_ms"),
        F.coalesce(
            F.unix_millis("ts") - F.unix_millis("ts_asof"), F.lit(-1)
        ).alias("gap_ms"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q44 — pivot: wide per-day event-type matrix
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q44_pivot_daily_matrix",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           -- CAST: DuckDB SUM(int) is HUGEINT, which pandas renders as
           -- float64 and the driver's value hash diverges on 5 vs 5.0.
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) * 100
                AS BIGINT) AS purchase_cents
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q44_pivot_daily_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: one row per day, one count column per event
    type. ``pivot`` with an EXPLICIT value list — omitting it would add
    a whole extra job just to collect distinct types, and the output
    schema would depend on the data (a deploy hazard at 100 TB).
    Physically this is a single hash-aggregate keyed on event_date (the
    pivot becomes conditional aggregates inside one shuffle — same plan
    as the CASE-WHEN SQL an analyst would write)."""
    ev = table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", money("value")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).alias("val"),
        )
    )
    return wide.select(
        "event_date",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
        # exact integer cents (decimal → ×100 → bigint): immune to any
        # double canonicalization drift between the engines
        (F.coalesce(F.col("purchase_val"), F.lit(0).cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("purchase_cents"),
    ).orderBy("event_date")


# ---------------------------------------------------------------------------
# q45 — date-spine gap fill (sequence → explode → left join → zero-fill)
# ---------------------------------------------------------------------------


@query(
    "q45_gap_fill_daily",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '2023-12-25',
                                           DATE '2024-02-05',
                                           INTERVAL 1 DAY)) AS DATE) AS event_date
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT s.event_date,
           COALESCE(d.n, 0) AS n_purchases,
           CAST(COALESCE(d.v, 0) AS DOUBLE) AS purchase_value,
           CASE WHEN d.event_date IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s LEFT JOIN daily d USING (event_date)
    ORDER BY 1
    """,
)
def q45_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled daily time series: a generated date spine
    (``sequence`` + ``explode`` — rows from an expression, no input
    scan) LEFT-joined to the aggregated daily counts. The AGGREGATE is
    the broadcast side (one row per day — tiny at any horizon): for a
    left-outer join only the non-preserved (right) side can be the
    broadcast build side, so hinting the spine was silently ignored
    (HintErrorLogger) and both sides shuffle-sorted (round-10 fix; the
    plan test pins the BroadcastHashJoin). The fact table is touched
    exactly once by the groupBy. The idiom every dashboard/
    training-data rollup needs: missing days must surface as zeros,
    not vanish."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2023-12-25").cast("date"), F.lit("2024-02-05").cast("date")
            )
        ).alias("event_date")
    )
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).alias("v"),
        )
    )
    return (
        spine
        .join(F.broadcast(daily.withColumn("hit", F.lit(1))), "event_date", "left")
        .select(
            "event_date",
            F.coalesce("n", F.lit(0)).alias("n_purchases"),
            as_double(F.coalesce(F.col("v"), F.lit(0).cast("decimal(18,2)"))).alias(
                "purchase_value"
            ),
            F.when(F.col("hit").isNull(), 1).otherwise(0).alias("is_gap"),
        )
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# q49 — salted aggregation over a hot key (skew posture, oracle-identical)
# ---------------------------------------------------------------------------


@query(
    "q49_salted_hot_key_agg",
    declared=False,
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q49_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a LOW-cardinality key (5 event
    types → at most 5 reduce tasks would do all the work unsalted).
    Phase 1 spreads each key over 16 salts, phase 2 merges partials —
    algebraic aggregates are salt-invariant, so the result (and this
    oracle check) is EXACTLY the plain GROUP BY. At 100 TB this is the
    difference between 5 straggler tasks and full-cluster parallelism
    on the partial aggregate; the merge shuffles only keys × salts
    rows. (Spark's own partial aggregation covers sum/count too; the
    explicit salt matters once collect_list-class or size-bounded
    state enters the agg.)"""
    from eventsgateway_spark.operators.skew import salted_agg

    ev = table(spark, sf_dir, "events").withColumn("val", money("value"))
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "sum_dec": ("val", "sum"),
            "min_dec": ("val", "min"),
            "max_dec": ("val", "max"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        as_double(F.col("sum_dec")).alias("sum_value"),
        as_double(F.col("min_dec")).alias("min_value"),
        as_double(F.col("max_dec")).alias("max_value"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q54 — ordered conversion funnel (signup → view → purchase)
# ---------------------------------------------------------------------------


@query(
    "q54_funnel",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    v AS (SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND e.ts > s.t1 GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.t2 GROUP BY 1),
    c AS (SELECT 1 AS stage_no, 'signup' AS stage, COUNT(*) AS n_users FROM s
          UNION ALL SELECT 2, 'view', COUNT(*) FROM v
          UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p)
    SELECT stage_no, stage, n_users,
           CAST(n_users AS DOUBLE)
               / FIRST_VALUE(n_users) OVER (ORDER BY stage_no) AS conversion
    FROM c ORDER BY stage_no
    """,
)
def q54_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel — THE canonical game-analytics query
    over the reference's event stream: users who signed up, then
    viewed strictly after, then purchased strictly after that. Each
    stage is min-timestamp-per-user joined to the previous stage (one
    user_id-keyed shuffle per stage, reused by Catalyst where
    co-partitioned); no row explosion, no self-cartesian. Conversion
    is relative to stage 1 via a 3-row window."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_users"
        )

    c = stage(s, 1, "signup").unionAll(stage(v, 2, "view")).unionAll(
        stage(p, 3, "purchase")
    )
    w = W.orderBy("stage_no")
    return c.select(
        "stage_no",
        "stage",
        "n_users",
        (F.col("n_users").cast("double") / F.first("n_users").over(w)).alias(
            "conversion"
        ),
    ).orderBy("stage_no")


# ---------------------------------------------------------------------------
# q55 — cohort retention (day-1 / day-7)
# ---------------------------------------------------------------------------


@query(
    "q55_cohort_retention",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_d
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    r AS (SELECT f.cohort_d, f.user_id,
                 MAX(CASE WHEN a.d = f.cohort_d + 1 THEN 1 ELSE 0 END) AS d1,
                 MAX(CASE WHEN a.d = f.cohort_d + 7 THEN 1 ELSE 0 END) AS d7
          FROM f JOIN a ON f.user_id = a.user_id GROUP BY 1, 2)
    SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,
           COUNT(*) AS cohort_size,
           CAST(SUM(d1) AS BIGINT) AS d1_retained,
           CAST(SUM(d7) AS BIGINT) AS d7_retained
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def q55_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the other canonical game-analytics query:
    users grouped by first-seen date; day-1/day-7 retained = any
    activity exactly N days later. One user-keyed shuffle builds both
    the cohort map and the distinct activity days; the flag aggregation
    is integer MAX/SUM, so the result is exact."""
    ev = table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_d"))
    a = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    r = (
        f.join(a, "user_id")
        .groupBy("cohort_d", "user_id")
        .agg(
            F.max(
                F.when(F.col("d") == F.date_add("cohort_d", 1), 1).otherwise(0)
            ).alias("d1"),
            F.max(
                F.when(F.col("d") == F.date_add("cohort_d", 7), 1).otherwise(0)
            ).alias("d7"),
        )
    )
    return (
        r.groupBy("cohort_d")
        .agg(
            F.count(F.lit(1)).alias("cohort_size"),
            F.sum("d1").alias("d1_retained"),
            F.sum("d7").alias("d7_retained"),
        )
        # ISO string output sidesteps cross-engine DATE canonicalization
        # (sorts identically to the date)
        .select(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_day"),
            "cohort_size",
            "d1_retained",
            "d7_retained",
        )
        .orderBy("cohort_day")
    )


# ---------------------------------------------------------------------------
# q59 — sequence pattern: signup → purchase with NO error in between
# ---------------------------------------------------------------------------


@query(
    "q59_clean_conversion",
    declared=False,
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.t1 GROUP BY 1),
    w AS (SELECT s.user_id, s.t1, p.t3
          FROM s JOIN p ON s.user_id = p.user_id),
    errs AS (SELECT w.user_id, COUNT(e.event_id) AS n_err
             FROM w LEFT JOIN events e ON e.user_id = w.user_id
                AND e.event_type = 'error' AND e.ts > w.t1 AND e.ts < w.t3
             GROUP BY 1)
    SELECT w.user_id,
           strftime(w.t1, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
           strftime(w.t3, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           (epoch_us(w.t3) - epoch_us(w.t1)) // 1000000 AS secs_to_convert
    FROM w JOIN errs ON w.user_id = errs.user_id
    WHERE errs.n_err = 0
    ORDER BY w.user_id
    """,
)
def q59_clean_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE class):
    users whose first signup is followed by a purchase with NO error
    event strictly between the two timestamps. The negative condition
    is a per-user interval count via a left join bounded by the
    (t1, t3) window — the anti-pattern scan stays an equi-join on
    user_id with a time-range predicate, never a sequence explode.
    Conversion latency is exact integer seconds (µs difference, both
    engines integer-divide). Timestamps are projected as formatted
    strings (_util contract: no bare TIMESTAMP outputs — collect()
    renders TimestampType through the PROCESS timezone, so a bare
    column drifts under a non-UTC driver TZ; date_format runs JVM-side
    under the pinned UTC session zone and is TZ-independent)."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    w = s.join(p, "user_id")
    errs = (
        w.join(
            ev.filter(F.col("event_type") == "error").select(
                F.col("user_id").alias("eu"), F.col("ts").alias("ets")
            ),
            (F.col("user_id") == F.col("eu"))
            & (F.col("ets") > F.col("t1"))
            & (F.col("ets") < F.col("t3")),
            "left",
        )
        .groupBy("user_id")
        .agg(F.count("ets").alias("n_err"))
    )
    return (
        w.join(errs, "user_id")
        .filter(F.col("n_err") == 0)
        .select(
            "user_id",
            F.date_format("t1", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("signup_ts"),
            F.date_format("t3", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.expr("(unix_micros(t3) - unix_micros(t1)) div 1000000").alias(
                "secs_to_convert"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q61 — skew-safe running sum (distributed prefix sum, oracle-identical)
# ---------------------------------------------------------------------------


@query(
    "q61_skew_safe_running_sum",
    declared=False,  # rotation-pool member (round 6: shares a slot with q73)
    oracle="""
    SELECT user_id,
           event_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rn
    """,
)
def q61_skew_safe_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14's running window via the SKEW-SAFE physical plan
    (operators/skew.py): bounded per-(user, day) windows + per-bucket
    offsets broadcast back — no task ever sorts a hot user's full
    history. The oracle is the NAIVE unbounded window, so the driver
    hash-check proves plan-shape equivalence, not just the unit test.
    Integer cents keep the running sum exact under any partial order."""
    from eventsgateway_spark.operators.skew import skew_safe_running_sum

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        (money("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        skew_safe_running_sum(
            ev,
            keys=["user_id"],
            order_by=["ts", "event_id"],
            value=F.col("cents"),
            bucket=F.to_date("ts"),
            rn_col="rn",
            sum_col="running_cents",
        )
        .select("user_id", "event_id", "rn", "running_cents")
        .orderBy("user_id", "rn")
    )


# ---------------------------------------------------------------------------
# q64 — exact DAU / rolling 7-day WAU (contribute-forward, no range join)
# ---------------------------------------------------------------------------


@query(
    "q64_active_users",
    declared=False,  # rotation-pool member (see queries/__init__.py ROTATION)
    oracle="""
    WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    contrib AS (SELECT CAST(unnest(generate_series(d, d + 6, INTERVAL 1 DAY))
                            AS DATE) AS day,
                       user_id
                FROM daily),
    spine AS (SELECT DISTINCT d AS day FROM daily),
    wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau
            FROM contrib WHERE day IN (SELECT day FROM spine) GROUP BY 1),
    dau AS (SELECT d AS day, COUNT(*) AS dau FROM daily GROUP BY 1)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau
    FROM dau JOIN wau USING (day)
    ORDER BY 1
    """,
)
def q64_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU + rolling 7-day WAU per observed day — THE engagement
    metric for the reference's game-analytics domain.

    Scale shape: the naive formulation (a 7-day range self-join, or
    COUNT(DISTINCT) over a RANGE window) explodes or single-tasks at
    100 TB. Here each (day, user) activity row CONTRIBUTES FORWARD to
    the 7 WAU days it feeds (map-side explode ×7), so WAU is a plain
    hash-aggregate on (day, user) pairs — one narrow shuffle with
    map-side dedup, no range join, no window over user histories. The
    day spine is tiny and broadcast-semi-joined to drop days beyond
    the observed range. DAU rides the same daily-distinct table."""
    ev = table(spark, sf_dir, "events")
    daily = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    contrib = daily.select(
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("day"),
        "user_id",
    )
    spine = daily.select(F.col("d").alias("day")).distinct()
    wau = (
        contrib.join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = daily.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau")
        .orderBy("day")
    )

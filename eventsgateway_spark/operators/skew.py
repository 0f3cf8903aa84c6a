"""Skew-mitigation utilities (SURVEY §4 — scale posture).

AQE's skew-join splitting handles skewed JOINS automatically
(session.py enables it), but skewed AGGREGATION and WINDOW keys (one
user/topic producing a large share of events) still funnel into one
reduce task:

- ``salted_agg`` — two-phase aggregation on (key, salt) then key.
- ``topk_per_key`` — two-phase top-k: local top-k per (key, salt),
  then final top-k over the ≤ k·n_salts survivors per key.
- ``skew_safe_running_sum`` — exact running sum / row_number as a
  distributed prefix sum over order-aligned buckets, so no single
  task ever holds a hot key's full history.

All three produce output EQUAL to the naive single-window/group-by plan
(pinned by tests/test_ext.py) — they change the physical shape only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max}. Phase 1 groups by (keys + random salt in
    [0, n_salts)); phase 2 merges partials by keys (count partials
    merge via sum).

    >>> salted_agg(events, ["event_type"], {"n": ("event_id", "count"),
    ...                                     "v": ("value", "sum")})
    """
    first: list[Column] = []
    merge: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            first.append(F.count(col).alias(out))
            merge.append(F.sum(out).alias(out))
        elif fn == "sum":
            first.append(F.sum(col).alias(out))
            merge.append(F.sum(out).alias(out))
        elif fn == "min":
            first.append(F.min(col).alias(out))
            merge.append(F.min(out).alias(out))
        elif fn == "max":
            first.append(F.max(col).alias(out))
            merge.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*first)
    return partial.groupBy(*keys).agg(*merge)


def topk_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    n_salts: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per key without a hot-key window bottleneck.

    The naive plan (``row_number() OVER (PARTITION BY key ORDER BY
    ...) <= k``) sorts a hot key's ENTIRE row set in one task. Here a
    deterministic salt (hash of every input column — reproducible,
    unlike rand()) first spreads each key over ``n_salts`` local
    windows; any row in the global top-k is necessarily in its salt's
    local top-k, so the final window ranks only ≤ k·n_salts survivors
    per key. ``order_by`` must be a TOTAL order (add a unique
    tiebreaker) for output equality with the naive plan.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    w_local = Window.partitionBy(*keys, "_salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)
        .drop("_salt", "_lrn")
    )
    w_final = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= k)
    )


def skew_safe_running_sum(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    value: Column,
    bucket: Column,
    rn_col: str = "rn",
    sum_col: str = "running_sum",
) -> DataFrame:
    """Exact per-key running sum + row_number as a distributed prefix
    sum (the q14-class window, skew-safe).

    ``bucket`` must be ORDER-ALIGNED with ``order_by`` within a key:
    every row of bucket b sorts before every row of bucket b+1 (e.g.
    ``to_date(ts)`` when ordering by ts). Phase 1 windows within
    (key, bucket) — a hot key's history is split across its buckets,
    so no task holds it whole. Phase 2 aggregates one row per
    (key, bucket) (tiny), computes each bucket's starting offsets with
    a window over buckets, and broadcast-joins them back. Output
    equals the naive single-window plan row-for-row PROVIDED
    ``order_by`` is a total order within each key (append a unique
    tie-break column like doc_id, as every caller here does): on ties
    the naive RANGE-frame window gives peers the peer-inclusive sum,
    while this ROWS-frame prefix assigns them distinct
    arbitrarily-ordered sums — same requirement ``topk_per_key``
    documents. Only the physical shape differs otherwise (two bounded
    windows + one broadcast join instead of one unbounded sort).
    """
    src = df.withColumn("_bkt", bucket)
    w_local = Window.partitionBy(*keys, "_bkt").orderBy(*order_by)
    local = src.withColumn("_lrn", F.row_number().over(w_local)).withColumn(
        "_lsum",
        F.sum(value).over(
            w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = src.groupBy(*keys, "_bkt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value).alias("_s")
    )
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *keys,
        "_bkt",
        F.coalesce(F.sum("_n").over(w_prev), F.lit(0)).alias("_rn_off"),
        F.coalesce(F.sum("_s").over(w_prev), F.lit(0)).alias("_sum_off"),
    )
    # NO broadcast hint: offsets has one row per (key, bucket) — globally
    # |keys| x |buckets| (e.g. users x days), which is NOT broadcastable
    # at scale. `local` is already hash-partitioned on (keys, _bkt) by
    # the phase-1 window, so this equi-join reuses that partitioning;
    # AQE still broadcasts when offsets is genuinely small.
    return (
        local.join(offsets, [*keys, "_bkt"])
        .withColumn(rn_col, (F.col("_lrn") + F.col("_rn_off")).cast("bigint"))
        .withColumn(sum_col, F.col("_lsum") + F.col("_sum_off"))
        .drop("_bkt", "_lrn", "_lsum", "_rn_off", "_sum_off")
    )

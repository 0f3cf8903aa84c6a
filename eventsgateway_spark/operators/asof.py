"""As-of / interval joins (SURVEY §2.5 Q5).

The reference's enrichment pattern — event ↔ latest state at event
time — needs a join Spark lacks as a primitive. Two formulations:

**Batch as-of** (``asof_join``): union-tag-window. Right (state) rows
and left (event) rows are unioned, sorted within each key by
(timestamp, tag) with state rows first at ties, and the latest
non-null state is carried forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding frame. ONE shuffle on the join key, no
time-range row explosion — this is the 100 TB-safe shape (a naive
``l.ts >= r.ts`` theta join is quadratic per key).

**Streaming interval join** (``streaming.pipeline`` users): native
stream-stream inner join with watermarks + a time-range predicate —
Spark's supported bounded-state streaming join (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row gains the ``right_values`` of
    the latest right row with ``right[right_time] <= left[left_time]``
    for the same ``on`` key (NULLs when no prior right row exists).

    Equivalent to DuckDB/Pandas ``ASOF LEFT JOIN``. Ties (equal
    timestamps) match — the right row sorts before the left via the
    tag ordering. NULL-timestamp rows match neither direction (a
    NULL-time state row would otherwise sort NULLS FIRST and leak its
    values into every early left row — DuckDB/pandas treat it as
    unmatchable, and so does this operator).

    DETERMINISM PRECONDITION: the right side must be unique per
    (key, right_time) — with duplicates, which of the tied rows'
    values is carried is partition-order-dependent (the same
    precondition pandas merge_asof documents; q37 pre-dedupes).
    """
    rv_struct = F.struct(*[F.col(c) for c in right_values]).alias("_rv")
    r = right.filter(F.col(right_time).isNotNull()).select(
        *on, F.col(right_time).alias("_t"), F.lit(0).alias("_tag"), rv_struct
    )
    l = left.select(
        "*", F.col(left_time).alias("_t"), F.lit(1).alias("_tag"), F.lit(None).alias("_rv")
    )
    # align schemas: right side carries only key/time/values
    l_cols = [c for c in left.columns]
    r_aligned = r.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        "_t",
        "_tag",
        "_rv",
    )
    combined = l.unionByName(r_aligned)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.withColumn("_state", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_tag") == 1).select(
        *l_cols,
        *[F.col(f"_state.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
    return out


def interval_join_cond(
    left_time: Column, right_time: Column, lower: str, upper: str
) -> Column:
    """Time-range predicate for a stream-stream interval join:
    right_time ∈ [left_time - lower, left_time + upper]. Combined with
    ``withWatermark`` on both sides, Spark bounds the join state."""
    return (right_time >= left_time - F.expr(f"INTERVAL {lower}")) & (
        right_time <= left_time + F.expr(f"INTERVAL {upper}")
    )

"""Skew-mitigation utilities (SURVEY §4 — scale posture).

AQE's skew-join splitting handles skewed JOINS automatically
(session.py enables it), but skewed AGGREGATION keys (one user/topic
producing a large share of events) still funnel into one reduce task.
``salted_agg`` is the standard two-phase fix: aggregate on
(key, salt) first — spreading the hot key over N partitions — then
merge the partials per key. Works for any algebraic aggregate
(count/sum/min/max); non-algebraic ones (exact distinct, median) need
different machinery (sketches or sort-based).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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

"""Shared occupancy-summary protocol for the durable index families.

Both durable indexes keep a ``{prefix}_occ`` catalog table — (key
cols..., n, gen) — so their append-time skew health metric costs
O(batch + touched buckets) instead of an O(corpus) groupBy per
admission batch (VERDICT r13 #2):

- media signatures (``streaming/media_dup.py``): keys (band, bval),
  physical bucketing on ``bval``;
- IVF vectors (``streaming/ann_lookup.py``): key ``cell_id``, also the
  bucket column.

ONE copy of the refresh law (round-14 review — the twin protocols were
inlined in both modules, the exact drifted-copy hazard the
minhash_components factoring exists to prevent):

- Save writes a full snapshot read back from the committed data table
  (:func:`write_occ_snapshot`) — save is already O(corpus), and
  re-running the caller's signature/assignment lineage could mean
  re-decoding payloads.
- Append refreshes ONLY the buckets its batch touched
  (:func:`refresh_occ`): recount them from the authoritative table
  with a bucket-pruned ``IN`` filter, keep every other stored row.
  The caller derives the touched set from the batch BEFORE its
  idempotence filter, so a replay after a crash between the data
  append and the ``_occ`` overwrite re-refreshes the same buckets and
  self-heals. A missing or stale-generation summary (legacy index, or
  a crash mid-protocol followed by a re-save) triggers one full
  rebuild.
- The summary is a HEALTH METRIC, never correctness data: the data
  table is never derived from it, and a crash mid-overwrite only
  degrades the metric until the next touching append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Max distinct touched-bucket values compiled into the incremental
#: refresh's IN filters; past this the full recount takes over (see
#: refresh_occ's inline note).
_MAX_PRUNE_LITERALS = 4096


def _occ_counts(src: DataFrame, key_cols: list[str]) -> DataFrame:
    return src.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def _skew_of(occ: DataFrame) -> float:
    """max/avg bucket occupancy — the rebuild-cadence gate both index
    families report from their appends."""
    row = occ.agg(F.max("n").alias("mx"), F.avg("n").alias("avg")).collect()[0]
    return float(row["mx"]) / float(row["avg"]) if row["avg"] else 0.0


def write_occ_snapshot(
    spark, table_prefix: str, source: DataFrame, key_cols: list[str], gen: int
) -> None:
    """Full-recount overwrite of ``{prefix}_occ`` (save-time path).
    The snapshot is checkpointed before the write so overwriting a
    table the plan may read from is safe."""
    snap = (
        _occ_counts(source, key_cols)
        .withColumn("gen", F.lit(int(gen)))
        .localCheckpoint()
    )
    try:
        snap.write.mode("overwrite").saveAsTable(f"{table_prefix}_occ")
    finally:
        from eventsgateway_spark.queries._util import release_frame

        release_frame(snap)


def refresh_occ(
    spark,
    table_prefix: str,
    source: DataFrame,
    key_cols: list[str],
    prune_col: str,
    touched: DataFrame,
    gen: int,
    ckpt,
) -> float:
    """Incremental ``{prefix}_occ`` maintenance (append-time path —
    module docstring): recount the buckets in ``touched``'s
    ``prune_col`` values from the authoritative ``source`` (the filter
    is an ``IN`` over collected literals so the bucketed scan PRUNES
    to the touched files), keep every other stored row, overwrite the
    summary stamped with ``gen``, and return the resulting skew.
    ``ckpt`` is the caller's released-checkpoints pin function — the
    merged frame must materialize before the overwrite because it may
    read the very table it replaces."""
    occ_name = f"{table_prefix}_occ"
    occ_ok = spark.catalog.tableExists(occ_name)
    if occ_ok:
        # Aggregate over the WHOLE summary, not a sampled row (ADVICE
        # r14): saveAsTable overwrite is not transactional, so a torn
        # overwrite can leave a mixed-generation _occ whose first row
        # happens to match cur_gen. min==max==gen proves uniformity;
        # the table is bounded (≤ bands·2^band_w / cell-count rows),
        # so the full scan costs what the limit(1) did.
        g = spark.table(occ_name).agg(
            F.min("gen").alias("lo"), F.max("gen").alias("hi")
        ).collect()[0]
        occ_ok = (
            g["lo"] is not None
            and int(g["lo"]) == int(g["hi"]) == int(gen)
        )
    tvals: list | None = None
    if occ_ok:
        # bounded literal collection: cap + 1 detects overflow without
        # pulling an unbounded id set to the driver. A batch touching
        # more distinct buckets than the cap is backfill-scale — the
        # full recount (the not-occ_ok path) is proportionate there,
        # and an IN list that size would blow the plan/driver anyway
        # (round-14 review: the same failure mode the admission joins'
        # broadcast-hint removal exists to survive). Media bval
        # domains (2^band_w) never hit the cap; huge-cell IVF backfills
        # can.
        rows = (
            touched.select(prune_col)
            .distinct()
            .limit(_MAX_PRUNE_LITERALS + 1)
            .collect()
        )
        if len(rows) <= _MAX_PRUNE_LITERALS:
            tvals = [r[prune_col] for r in rows]
    if tvals is None:
        merged = _occ_counts(source, key_cols)  # rebuild: legacy/stale/huge
    else:
        refreshed = _occ_counts(
            source.filter(F.col(prune_col).isin(tvals)), key_cols
        )
        merged = (
            spark.table(occ_name)
            .filter(~F.col(prune_col).isin(tvals))
            .select(*key_cols, "n")
            .unionByName(refreshed)
        )
    merged = ckpt(merged.select(*key_cols, F.col("n").cast("bigint").alias("n")))
    skew = _skew_of(merged)
    (
        merged.withColumn("gen", F.lit(int(gen)))
        .write.mode("overwrite")
        .saveAsTable(occ_name)
    )
    return skew

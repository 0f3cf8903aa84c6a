"""Lloyd's k-means on DataFrames — the centroid trainer for IVF ANN.

q43's IVF machinery (queries/ext_similarity.py) deliberately uses the
first-k-vectors-by-id as centroids so the whole query stays DuckDB-
reproducible; this module is the REAL trainer that replaces them in
production. Pure DataFrame iteration, the same shape as the connected-
components loop (queries/ext_dedup.q32): per round one map-only
assignment (broadcast centroids — no shuffle of the corpus) and one
element-wise mean aggregation (posexplode → (cell, dim) avg → rebuild
arrays), with ``localCheckpoint`` cutting lineage between rounds.

Scale posture (100 TB of vectors): per iteration the corpus is scanned
once and shuffled once on (cell_id, dim) — k·d groups, tiny; the
centroid row stays KB-sized and broadcasts. Iterations are O(5-20).
At realistic k (corpus/occupancy) the assignment step AUTO-routes
through the Arrow matmul path (round 12 — k > _IVF_ARROW_K in
ext_similarity.ivf_assign_with; the interpreted fold is measured
infeasible at k=250; see SCALE.md similarity section).
Means accumulate doubles, so results are deterministic for a FIXED
partitioning but not bit-stable across different partitionings — fine
for a trainer (IVF recall is insensitive to last-ulp centroid drift);
anything needing bit-stable output uses the deterministic first-k
seeding instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsgateway_spark.queries.ext_similarity import (
    IVF_K,
    ivf_assign_with,
    ivf_centroids,
    norm_view,
)


def _element_wise_means(assigned: DataFrame) -> DataFrame:
    """(cell_id, ce): per-cell element-wise mean of the member vectors
    — posexplode to (cell, dim, val), average, fold back into ordered
    arrays."""
    by_dim = (
        assigned.select("cell_id", F.posexplode("e").alias("dim", "val"))
        .groupBy("cell_id", "dim")
        .agg(F.avg("val").alias("m"))
    )
    return (
        by_dim.groupBy("cell_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("ce")
        )
    )


def train_centroids(
    emb: DataFrame, k: int = IVF_K, iters: int = 5
) -> tuple[DataFrame, list[float]]:
    """Train k centroids with ``iters`` Lloyd rounds from the
    deterministic first-k seeding. Returns (cents, inertia_history):
    ``cents`` is the 1-row broadcastable centroid frame the IVF helpers
    consume; ``inertia_history`` has the per-round sum of squared
    distances (monotone non-increasing — the convergence measure)."""
    v = norm_view(emb).localCheckpoint()
    cents = ivf_centroids(emb, k).localCheckpoint()
    history: list[float] = []
    for _ in range(iters):
        # materialize the O(N·k·dim) assignment ONCE — both the means
        # aggregation and the inertia job consume it; unpinned, each
        # would re-run the full assignment scan (doubling the step the
        # module documents as the bottleneck)
        assigned = ivf_assign_with(v, cents, k=k).localCheckpoint()
        # A cell that loses every member (duplicate seeds: ties all
        # break to the lower cid) vanishes from the means output; left-
        # joining against the previous round's cells carries its old
        # centroid forward, so the trained index always has exactly k
        # cells instead of silently shrinking.
        prev_tbl = cents.select(F.explode("cents").alias("c")).select(
            F.col("c.cid").alias("cell_id"), F.col("c.ce").alias("prev_ce")
        )
        new_cents_tbl = (
            prev_tbl.join(_element_wise_means(assigned), "cell_id", "left")
            .select("cell_id", F.coalesce("ce", "prev_ce").alias("ce"))
            .localCheckpoint()
        )
        # J(assign_t, cents_{t+1}) — sandwiched by both Lloyd
        # improvement steps, so the recorded series is monotone
        # non-increasing (up to float noise)
        inertia = (
            assigned.join(new_cents_tbl.withColumnRenamed("ce", "_nc"), "cell_id")
            .select(
                F.aggregate(
                    F.zip_with("e", "_nc", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, val: acc + val,
                ).alias("d2")
            )
            .agg(F.sum("d2").alias("j"))
            .collect()[0]["j"]
        )
        history.append(float(inertia))
        cents = (
            new_cents_tbl.select(
                F.struct(F.col("cell_id").alias("cid"), F.col("ce").alias("ce")).alias(
                    "c"
                )
            )
            .agg(F.collect_list("c").alias("cents"))
            .localCheckpoint()
        )
    return cents, history

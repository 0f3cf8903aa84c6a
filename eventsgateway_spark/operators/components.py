"""Connected components via alternating large-star / small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC 2014) — the 100 TB-safe replacement for plain
hash-to-min label propagation.

Why not hash-to-min: it moves the minimum label ONE HOP per iteration,
so convergence is O(component diameter). A viral duplicate cluster (a
long chain of pairwise near-dups, the documented failure mode in
SCALE.md "Known limits") makes the iteration count — and therefore the
number of full-graph shuffles — proportional to the chain length.
Star contraction instead rewires every node toward its neighborhood
minimum each round, contracting components to stars in O(log n)
alternating rounds regardless of diameter (O(log^2 n) worst case);
``tests/test_components.py`` pins the iteration count on a synthetic
giant-chain component.

Execution shape per round: two grouped aggregations + two equi-joins
on the (current) edge set — all hash-shuffles on node ids, no
driver-side graph state, lineage cut by ``localCheckpoint``.
Convergence is detected by an order-insensitive edge-set signature
(count + sum of xxhash64(u,v)) — one scalar aggregate per round,
compared driver-side; a signature collision would surface as an
oracle mismatch in q32's hash-checked output, not silent corruption.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CCResult:
    labels: DataFrame  # (node, label) — label = min node id in component
    iterations: int  # alternating large/small-star rounds until fixpoint


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least("u", "mn").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large→small, then connect every smaller neighbor
    (and u itself) to the neighborhood minimum."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("mn"))
    rewired = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    self_edges = mins.select("u", F.col("mn").alias("v"))
    return rewired.union(self_edges).distinct()


def _signature(e: DataFrame):
    """Order-insensitive edge-set signature: (row count, hash sum)."""
    return e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: 2^63-scale terms can't overflow ANSI bigint math
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()


def connected_components(edges: DataFrame, max_iter: int = 50) -> CCResult:
    """Labels every node of the undirected graph ``edges`` (columns
    ``u``, ``v``) with the minimum node id of its component.

    Nodes are whatever orderable type the edge columns carry; self
    loops are ignored; isolated nodes don't appear (callers union
    singleton nodes themselves if they need them labelled)."""
    e = (
        edges.select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    if not e.take(1):
        return CCResult(labels=e.select(F.col("u").alias("node"), F.col("v").alias("label")), iterations=0)
    sig = _signature(e)
    iterations = 0
    while iterations < max_iter:
        e_next = _small_star(_large_star(e)).localCheckpoint()
        iterations += 1
        sig_next = _signature(e_next)
        e = e_next
        if (sig_next["n"], sig_next["h"]) == (sig["n"], sig["h"]):
            break
        sig = sig_next
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds"
        )
    # Converged edge set is a forest of stars (child → component-min
    # root). Roots label themselves via the v-side union.
    labels = (
        e.select(F.col("u").alias("node"), F.col("v").alias("label"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    return CCResult(labels=labels, iterations=iterations)

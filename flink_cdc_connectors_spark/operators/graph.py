"""Distributed connected components — the two-phase star algorithm.

Implements alternating Large-Star / Small-Star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC 2014 — public paper): each round is one
grouped-min aggregate plus an edge re-emission, and the edge set converges
to star graphs centered at each component's minimum node id in
O(log^2 n) rounds (O(log n) in practice). This is the 100 TB path for
duplicate-cluster resolution: per-round cost is two hash shuffles on node
id regardless of component diameter, where plain min-label propagation
(`queries/tier_c_ext.py::ext_dedup_cluster`) needs diameter-many rounds —
fine for shallow near-dup clusters, unbounded for chain-shaped graphs.

Round mechanics (node u, neighborhood N(u), m = min(N(u) ∪ {u})):

  - **Large-Star**: for every v ∈ N(u) with v > u, emit edge (v, m).
    Strictly-larger neighbors re-attach to the neighborhood minimum —
    provably connectivity-preserving in both phases.
  - **Small-Star**: for every v ∈ N(u) with v ≤ u, plus u itself, emit
    (v, m) — smaller neighbors and the center collapse onto the minimum.

Both phases are one `groupBy(u).agg(min)` + one join back to the edges —
pure DataFrame ops, AQE-sized shuffles, no driver-side graph state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, a: str, b: str) -> DataFrame:
    return (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(edges.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _neighborhood_min(sym: DataFrame) -> DataFrame:
    """(u, m) with m = min(N(u) ∪ {u}) — one grouped aggregate."""
    return sym.groupBy("u").agg(F.min("v").alias("_mv")).select(
        "u", F.least("_mv", F.col("u")).alias("m")
    )


def _large_star(sym: DataFrame) -> DataFrame:
    mins = _neighborhood_min(sym)
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    mins = _neighborhood_min(sym)
    attached = (
        sym.join(mins, "u")
        .filter(F.col("v") <= F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        attached.unionByName(centers)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_rounds: int = 24
) -> DataFrame:
    """Edge list -> (id, component) with component = the min node id of
    each connected component. Isolated nodes don't appear in an edge list;
    callers union them back with component = their own id if needed.

    Each round localCheckpoints the shrinking edge set (same rationale as
    the label-propagation loop: a join-per-round lineage re-analyzes an
    ever-deeper plan) and stops when a round leaves the edge set
    unchanged."""
    sym = _symmetrize(edges, a, b).localCheckpoint(eager=True)
    changed = -1
    for _ in range(max_rounds):
        after_large = _large_star(_symmetrize(sym, "u", "v"))
        after_small = _small_star(
            _symmetrize(after_large, "u", "v")
        ).localCheckpoint(eager=True)
        # fixpoint: star edges survive large+small star unchanged
        changed = (
            after_small.exceptAll(sym).limit(1).count()
            + sym.exceptAll(after_small).limit(1).count()
        )
        sym = after_small
        if changed == 0:
            break
    if changed != 0:
        # The final extraction assumes the edge set is a union of stars; a
        # non-converged set would silently yield ambiguous labels (a node
        # still carrying edges into two components).
        raise RuntimeError(
            f"connected_components did not reach a fixpoint after "
            f"{max_rounds} large-star/small-star rounds; raise max_rounds "
            f"(needed rounds grow ~log(diameter))"
        )
    # converged edge set is a union of stars: (node -> component min);
    # component roots appear only on the v side — add their self-rows
    labels = sym.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = sym.select(F.col("v").alias("id")).distinct().join(
        labels.select(F.col("id")), "id", "left_anti"
    ).withColumn("component", F.col("id"))
    return labels.unionByName(roots)

"""Distributed connected components over a candidate-pair graph.

The dedup pipeline's missing last mile: pair finders (MinHash/SimHash/
Jaccard — ``operators/dedup.py``) emit *edges*; an actual dedup needs
*clusters* (keep one doc per connected component). The reference repo has
no graph op at all (its nearest analog is the client-side HashMap group
in ``Assignment 7/MongoDB.java:260-267``), so this is an extension
operator per SURVEY §7 step 8.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Both steps are
expressed as join + min-aggregate — never ``collect_list`` — so a giant
component with a hot hub key becomes an AQE-splittable shuffle, not an
executor-OOM array. Converges in O(log² n) rounds (O(log n) in practice;
near-dup clusters are shallow — typically 2 rounds).

Scale notes (100 TB): each round is two shuffles keyed by node id over an
edge set that only ever *shrinks* (both stars strictly reduce the sum of
component-internal edge lengths). ``localCheckpoint`` truncates lineage
per round so the plan does not grow with the iteration count. The hub
node of a star (the component min) is by construction the skewed key;
AQE skew-join splitting handles it without manual salting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set as canonical (hi → lo) pairs, no self-loops."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .where(u != v)
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    both = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = both.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient hi→lo; connect u and all its smaller neighbors to the min."""
    oriented = _canon(edges)
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    children = oriented.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfs = mins.select(F.col("u"), F.col("m").alias("v"))
    return children.union(selfs).where(F.col("u") != F.col("v")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # Sum 64-bit hashes in DECIMAL(38,0): overflow-proof under ANSI mode.
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component label is the minimum node id of the component.

    Nodes absent from ``edges`` are their own singleton components —
    callers join this result back and ``coalesce`` to the node id.
    """
    e = _canon(
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    ).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # Converged state is a union of stars: (child → root) plus the roots
    # themselves, which appear only on the v side.
    roots = e.select(F.col("v").alias("node")).distinct().join(
        e.select(F.col("u").alias("node")).distinct(), "node", "left_anti"
    )
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(roots.select("node", F.col("node").alias("component")))
        .distinct()
    )


def assign_clusters(
    items: DataFrame, id_col: str, pairs: DataFrame, pair_a: str, pair_b: str
) -> DataFrame:
    """items + ``cluster_rep`` column: min item id reachable through the
    pair graph (singletons map to themselves)."""
    comp = connected_components(pairs, pair_a, pair_b)
    return (
        items.join(comp, items[id_col] == comp["node"], "left")
        .select(
            *[items[c] for c in items.columns],
            F.coalesce(comp["component"], items[id_col].cast("long")).alias("cluster_rep"),
        )
    )

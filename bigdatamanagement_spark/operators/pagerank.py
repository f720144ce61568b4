"""Weighted PageRank (Brin & Page, "The anatomy of a large-scale
hypertextual Web search engine", WWW 1998) as a fixed-iteration power
method over an edge DataFrame — the graph-centrality primitive behind
"which state dominates the long-run behavior" questions (here: the
stationary importance of event types under the observed Markov
transitions; the reference has no graph ops at all, this is a §7-step-8
extension like the connected-components clustering in cluster.py).

Deterministic integer arithmetic so the whole fixed-point prefix is
cross-engine exact (the same micro-unit discipline as funnel.py /
sketch.py): ranks live in micro-units (Σ ≈ 1e6), edge probabilities are
floored micro-shares of the source's out-weight, every per-edge
contribution is floored BEFORE the destination sum, and the damping split
uses integer basis points. All intermediate products stay < 2^53, so the
``floor(x * y / 1e6)`` steps are exact in both Spark and DuckDB doubles —
the DuckDB oracle unrolls the same iterations as chained CTEs and matches
hash-exactly.

Execution shape per iteration: ranks ⋈ edges on src (broadcast the rank
vector when the vertex set is small — event types here; hash join keyed
by src in the general case) → groupBy(dst) with map-side partial sums →
left join back onto the vertex set so sinks keep their teleport mass.
Rank-vector size is O(|V|); edges are the data-sized side and are never
re-shuffled if pre-partitioned by src. Driver-side loop = one Spark job
chain per iteration, the standard DataFrame idiom for bounded iterative
algorithms (GraphX/GraphFrames do the same under the hood with RDD/DF
joins)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MICRO = 1000000
BP = 10000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping_bp: int = 8500,
    iters: int = 5,
) -> DataFrame:
    """(node, rank_micro) after ``iters`` exact-integer power iterations.

    rank'(d) = floor(MICRO·(BP−damping_bp)/(BP·N))
             + floor(damping_bp · Σ_s floor(rank(s)·p_micro(s,d)/MICRO) / BP)
    with p_micro(s,d) = floor(MICRO·w(s,d)/outweight(s)).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    outd = e.groupBy("src").agg(F.sum("w").alias("od"))
    # Pin the probability table and vertex set ONCE: every iteration's
    # lineage otherwise re-derives the caller's whole edge build (for the
    # event-type graph: a user-keyed window over the corpus) per branch —
    # 5 iterations × (probs + nodes) references made a 152-Exchange plan.
    # Both are O(|E|)/O(|V|) — the same per-round materialization the
    # star-contraction operator uses. Integers unchanged.
    probs = (
        e.join(outd, "src")
        .select(
            "src",
            "dst",
            F.floor(F.lit(float(MICRO)) * F.col("w") / F.col("od"))
            .cast("long")
            .alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one tiny scalar job; N parameterizes the teleport term
    teleport = (MICRO * (BP - damping_bp)) // (BP * n)
    ranks = nodes.select("node", F.lit(MICRO // n).cast("long").alias("rank_micro"))
    for _ in range(iters):
        contrib = (
            ranks.join(probs, ranks["node"] == probs["src"])
            .select(
                "dst",
                F.floor(F.col("rank_micro") * F.col("p") / F.lit(float(MICRO)))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.lit(teleport)
                + F.floor(
                    F.lit(float(damping_bp))
                    * F.coalesce(F.col("s"), F.lit(0))
                    / F.lit(float(BP))
                ).cast("long")
            ).alias("rank_micro"),
        )
    return ranks


def pagerank_oracle_sql(edges_cte: str, damping_bp: int = 8500, iters: int = 5) -> str:
    """The DuckDB mirror: ``edges_cte`` must define ``edges(src, dst, w)``;
    iterations are unrolled as chained CTEs (no recursive aggregation)."""
    parts = [
        f"WITH {edges_cte},",
        "outd AS (SELECT src, SUM(w) AS od FROM edges GROUP BY 1),",
        "probs AS (SELECT src, dst,"
        f" CAST(floor({float(MICRO)} * w / od) AS BIGINT) AS p"
        " FROM edges JOIN outd USING (src)),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "nn AS (SELECT COUNT(*) AS n FROM nodes),",
        f"r0 AS (SELECT node, CAST({MICRO} // n AS BIGINT) AS rank_micro"
        " FROM nodes CROSS JOIN nn),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT nodes.node,"
            f" CAST(({MICRO} * {BP - damping_bp}) // ({BP} * nn.n) AS BIGINT)"
            f" + CAST(floor({float(damping_bp)} * COALESCE(c.s, 0) / {float(BP)})"
            " AS BIGINT) AS rank_micro"
            " FROM nodes CROSS JOIN nn LEFT JOIN"
            " (SELECT probs.dst AS node,"
            f" SUM(CAST(floor(r{i - 1}.rank_micro * probs.p / {float(MICRO)})"
            " AS BIGINT)) AS s"
            f" FROM r{i - 1} JOIN probs ON probs.src = r{i - 1}.node GROUP BY 1) c"
            " ON c.node = nodes.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, rank_micro FROM r{iters} ORDER BY rank_micro DESC, node"
    )
    return "\n".join(parts)

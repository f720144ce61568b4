"""Count-min sketch: mergeable bounded-memory frequency estimation for
token/heavy-hitter counting (Cormode & Muthukrishnan, "An improved data
stream summary: the count-min sketch and its applications", J.
Algorithms 2005).

Why it exists next to exact counts: at 100 TB the exact (token, count)
table is itself huge and its top-k needs a full vocab-keyed shuffle; a
(d × w) sketch is a few KB per partition, merges by cell-wise addition
(one tiny shuffle keyed by cell id), and answers point queries with a
one-sided error (estimate ≥ truth, overshoot ≤ εN with prob 1-δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Portable hashing: row i's bucket comes from 8 hex chars of md5(token)
(chars 8i+1..8i+8 parsed base-16, mod w) — md5 exists in both Spark and
DuckDB, so the whole sketch (build AND probe) has an exact SQL oracle;
d ≤ 4 with 32-hex md5. The rows are not independent hash families in
the cryptographic sense, but distinct md5 substrings are empirically
independent, and determinism + oracle-checkability is the point here
(xxhash64 has no DuckDB twin).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket(tok: Column, row: int, width: int) -> Column:
    """Bucket of ``tok`` in sketch row ``row``: md5 hex slice -> int mod w."""
    return (
        F.conv(F.substring(F.md5(tok), row * 8 + 1, 8), 16, 10).cast("long") % width
    )


def countmin_build(
    occ: DataFrame, term_col: str = "term", depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch from an occurrence table (one row per token
    occurrence): returns (row, bucket, cnt) — d·w cells.

    Map-side partial aggregation collapses each partition to ≤ d·w cells
    before the single cell-keyed shuffle; the exploded row count is
    d × occurrences but never leaves the mapper unaggregated."""
    assert depth <= 4, "md5 yields 32 hex chars = 4 independent 8-char slices"
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket(F.col(term_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        occ.select(F.explode(cells).alias("c"))
        .groupBy("c.row", "c.bucket")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_probe(
    sketch: DataFrame, probes: DataFrame, term_col: str = "term",
    depth: int = 4, width: int = 64,
) -> DataFrame:
    """Point-query the sketch for each probe term: (term, cm_est) with
    cm_est = min over rows of the addressed cell (one-sided: ≥ truth).

    The sketch is tiny (d·w rows) -> broadcast; absent cells count 0
    (can only happen for terms the build never saw)."""
    melted = probes.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(term_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select("term", "c.row", "c.bucket")
    return (
        melted.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )

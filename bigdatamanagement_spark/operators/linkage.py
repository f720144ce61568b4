"""Record linkage (fuzzy entity matching): blocked Levenshtein candidate
pairs — the dedup family member for STRUCTURED records, where near-dup
keys are typo'd names rather than shingled text (operators/dedup.py
covers the text side).

Classic blocking methodology (Fellegi & Sunter record-linkage model;
blocking surveys e.g. Christen, TKDE 2012): an equi-join on a cheap
blocking key bounds the candidate space to within-block pairs, then an
edit-distance predicate confirms. At 100 TB the block key IS the
shuffle key — one hash exchange per side, quadratic work only inside a
block (choose keys so blocks stay small; compound or multi-pass
blocking for skewed keys, cf. the salting utilities in operators/
skew.py).

JVM fast path: ``levenshtein(l, r, threshold)`` (Spark >= 3.5) abandons
the DP early once the distance provably exceeds the bound — O(t·n)
instead of O(n²) per pair — and a length-difference guard in the join
condition skips pairs whose lengths alone exceed the bound.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """(rec_a, rec_b, dist): within-block record pairs with Levenshtein
    distance ≤ max_dist, rec_a < rec_b. Pairs in different blocks are
    never compared (the deliberate blocking trade-off)."""
    s = df.select(
        F.col(id_col).alias("rec_id"),
        F.col(name_col).alias("name"),
        F.col(block_col).alias("block"),
        F.length(name_col).alias("len"),
    )
    # The probe side must be spread across tasks explicitly: a small
    # single-file scan + broadcast build gives a ONE-task probe stage
    # (no shuffle for AQE to repartition), serializing the whole
    # quadratic block loop. Round-robin is deliberate — it parallelizes
    # perfectly even when one block holds most records.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a, b = s.repartition(n_parts).alias("a"), s.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"), max_dist)
    return (
        a.join(
            b,
            # cheap conjuncts FIRST: the id order + length guard reject
            # over half the block pairs before any DP cell is touched
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.rec_id") < F.col("b.rec_id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= max_dist)
            & (dist != -1),
        )
        .select(
            F.col("a.rec_id").alias("rec_a"),
            F.col("b.rec_id").alias("rec_b"),
            dist.alias("dist"),
        )
    )

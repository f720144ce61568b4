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


# --- Bloom filter ----------------------------------------------------------
#
# Bloom (CACM 1970) membership sketch with the same md5-sliced portable
# hashing as count-min above, so build AND probe mirror exactly in DuckDB.
# The canonical use at scale is the runtime semi-join filter: build over the
# join keys of a *filtered* dimension, broadcast the bit set, and drop fact
# rows whose key cannot be present BEFORE the shuffle of the real join —
# what Spark's own runtime row-level filtering
# (spark.sql.optimizer.runtime.bloomFilter.enabled, bloom_filter_agg /
# might_contain) does automatically; this is the explicit, cross-engine-
# checkable variant. One-sided: never a false negative, false-positive
# rate ≈ (1 - e^{-kn/m})^k.


def _bit(key: Column, hash_idx: int, m_bits: int) -> Column:
    """Bit position of ``key`` for hash function ``hash_idx``: 8 md5 hex
    chars (chars 8i+1..8i+8) parsed base-16, mod m."""
    return (
        F.conv(F.substring(F.md5(key), hash_idx * 8 + 1, 8), 16, 10).cast("long")
        % m_bits
    )


def bloom_build(
    keys: DataFrame, key_col: str = "key", m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Build the filter from a key table: returns the SET bit positions as
    a 1-column DataFrame (bit). ≤ m rows, mergeable by union+distinct —
    per-partition partial blooms OR together, exactly what the map-side
    distinct before the single bit-keyed shuffle does here."""
    assert k <= 4, "md5 yields 32 hex chars = 4 independent 8-char slices"
    bits = F.array(*[_bit(F.col(key_col).cast("string"), i, m_bits) for i in range(k)])
    return keys.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, key_col: str = "key",
    m_bits: int = 4096, k: int = 4,
) -> DataFrame:
    """Membership-test each probe key: (key, bloom_pass) with bloom_pass=1
    iff all k addressed bits are set. The bit set (≤ m rows) broadcasts;
    the probe side never shuffles — the whole point of the pattern."""
    melted = probes.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(*[_bit(F.col(key_col).cast("string"), i, m_bits) for i in range(k)])
        ).alias("bit"),
    )
    hit = bloom.select("bit", F.lit(1).alias("is_set"))
    return (
        melted.join(F.broadcast(hit), "bit", "left")
        .groupBy("key")
        .agg(
            (F.sum(F.coalesce(F.col("is_set"), F.lit(0))) == F.lit(k))
            .cast("int")
            .alias("bloom_pass")
        )
    )


HLL_M = 64
HLL_ALPHA_64 = 0.709  # Flajolet et al. 2007, alpha_m for m = 64


def portable_hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) built from PORTABLE md5
    slices, so the whole sketch — register assignment, max-rank
    registers, harmonic estimate, linear-counting correction — has an
    exact DuckDB mirror (the count-min convention: the sketch itself is
    cross-engine checkable, not just its accuracy).

    Register index = 32-bit slice mod m; rank = leading-zero count + 1
    of a second 32-bit slice via the bin()-string bit length (identical
    in both engines; rank 33 for a zero slice). Registers are MERGEABLE
    maxes — at 100 TB each partition carries m bytes per group and the
    combine is elementwise max, the whole point of the sketch. Unseen
    registers contribute 2^0 each: Σ2^-r is a ≤34-bit dyadic sum,
    EXACT in double on both engines."""
    return hll_estimate_from_registers(
        portable_hll_registers(df, key_col, group_cols, m), group_cols, m
    )


def portable_hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """(group_cols..., reg, r): the raw max-rank register table — the
    mergeable representation. Union of sketches = register-wise MAX,
    which is exactly another groupBy(max) over concatenated register
    tables; estimates come from _hll_estimate."""
    h = F.md5(F.col(key_col).cast("string"))
    idx = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = F.when(h2 == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(h2)))
    return (
        df.select(*group_cols, idx.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("r"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], m: int = HLL_M, out_col: str = "hll_estimate"
) -> DataFrame:
    """Harmonic estimate + linear-counting correction over a register
    table (see portable_hll_distinct for the cross-engine argument)."""
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_obs"),
    )
    v = F.lit(m) - F.col("n_obs")
    s = F.col("s_obs") + v.cast("double")
    raw = F.lit(HLL_ALPHA_64 * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return per.select(*group_cols, F.floor(est).cast("long").alias(out_col))

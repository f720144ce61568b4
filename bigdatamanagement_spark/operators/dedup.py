"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard.

Design for 100 TB:
- Exact dedup is a hash-groupBy on md5(text) — one shuffle keyed by the
  digest, map-side partial aggregation, no text comparison.
- MinHash+LSH: shingle → per-seed xxhash64 minima (JVM-side higher-order
  functions, no UDF) → band hashes → explode(bands) → self-join on
  (band, hash). Only bucket collisions are compared, so the quadratic
  pair space never materializes; candidate pairs are verified with exact
  shingle Jaccard. Banding parameters (b bands × r rows) tune the S-curve.
- SimHash: 64-bit signature from per-token hash bit-votes; candidates
  must share one of four 16-bit chunks (exact-match blocking), then are
  confirmed by Hamming distance via bit_count(xor).
- Brute-force n-gram Jaccard exists as the small-scale oracle-checkable
  baseline; its pair space is quadratic — keep it off the 100 TB path.

Public sources: MinHash — Broder, "On the resemblance and containment
of documents" (1997); LSH banding — Gionis/Indyk/Motwani (VLDB 1999)
and the Mining of Massive Datasets ch.3 formulation; SimHash —
Charikar, "Similarity estimation techniques from rounding algorithms"
(STOC 2002); prefix-filtered set-similarity join — Vernica/Carey/Li
(SIGMOD 2010).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bigdatamanagement_spark.operators.text import (
    shingles_from_tokens,
    tokens,
    word_shingles,
)


def hashed_shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, sh: array<long>) — distinct sorted xxhash64'd k-word
    shingles, behind an optimizer FENCE (no shuffle).

    The fence is ``array_sort(shuffle(...))``: value-identical (shuffle
    permutes, array_sort restores a canonical order) but the
    nondeterministic ``shuffle`` stops three Catalyst behaviors that each
    re-evaluated the shingle pipeline many times per row (all measured):
    - CollapseProject inlining the tree into downstream per-element
      lambdas (MinHash seed loop: re-evaluated num_hashes times, >60x);
    - InferFiltersFromGenerate turning a downstream explode into a
      size()>0 filter pushed to the parquet scan with the whole tree
      substituted in (8-12s instead of ~3s);
    - InferFiltersFromConstraints doing the same with isnotnull() derived
      from downstream join keys.
    A repartition() barrier also works but costs an exchange per branch
    and is not respected by filter pushdown anyway; the fence is free.
    Tokenization itself is linear (see shingles_from_tokens)."""
    sh = F.array_sort(
        F.shuffle(
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(tokens(F.col(text_col)), k),
                    lambda x: F.xxhash64(x),
                )
            )
        )
    )
    return df.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))


def portable_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, sh: array<long>) — distinct 60-bit md5-slice k-word
    shingle hashes behind the same optimizer fence as
    ``hashed_shingle_sets``. 15 hex chars parsed base-16 fit a signed
    long on both engines, so the DuckDB twin is exactly
    ``('0x' || substring(md5(s), 1, 15))::BIGINT`` — used where the
    downstream op needs a cross-engine oracle (portable SimHash);
    xxhash64 stays the default elsewhere (cheaper, 64 full bits)."""
    sh = F.array_sort(
        F.shuffle(
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(tokens(F.col(text_col)), k),
                    lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast(
                        "long"
                    ),
                )
            )
        )
    )
    return df.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, keep_id, doc_ids).

    keep_id = min id (the canonical survivor)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return df with exact-duplicate rows removed (min-id survivor)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8, k: int = 3
) -> DataFrame:
    """Brute-force near-dup pairs by k-word-shingle Jaccard ≥ threshold.

    O(n²) comparisons — the correctness baseline the sub-quadratic
    methods are measured against (recall tests), and the oracle query at
    small SF.

    Shingles are hashed to int64 behind a materialization barrier, so the
    O(n²) set intersections compare longs instead of ~20-char strings
    (same Jaccard modulo 64-bit collisions, ~1e-12 for this corpus;
    xxhash64 is applied to DISTINCT shingles so set sizes are preserved).
    """
    s = hashed_shingle_sets(df, id_col, text_col, k)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(_jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_index_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8, k: int = 3
) -> DataFrame:
    """Exactly the `ngram_jaccard_pairs` result set, via a prefix-filtered
    inverted-index join (the all-pairs similarity join of Vernica et al.,
    SIGMOD'10) — no O(n²) pair enumeration.

    Each doc's distinct shingle hashes are sorted (the global token order);
    if J(A,B) ≥ t, the first ``|s| - ceil(t·|s|) + 1`` elements of both
    sorted sets must intersect, so only those prefixes are exploded into
    the inverted index. Candidates come from equi-joining the index on the
    shingle hash — a shuffle keyed by shingle, not a cross join — plus a
    length filter (t·|A| ≤ |B| ≤ |A|/t), then are verified with exact
    Jaccard on the full sets. At 100 TB this is the scan→explode→
    shuffle-join shape that scales linearly with index size; the brute
    pair space never exists."""
    s = (
        hashed_shingle_sets(df, id_col, text_col, k)
        .withColumn("sz", F.size("sh"))
        .withColumn(
            "prefix",
            F.slice(F.col("sh"), 1, F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")).cast("int") + 1),
        )
    )
    # The full shingle set rides along on the exploded index rows (avg
    # ~0.5 KB × prefix length per doc) so verification needs NO join-back:
    # a join-back would reference the shingle subtree 4x, and Spark does
    # not ReusedExchange across those branches under AQE (measured: the
    # whole pipeline ran 4 times, 8s instead of ~3s). Candidates are
    # deduped on the pair key BEFORE the Jaccard is computed.
    # explode_outer, NOT explode: InferFiltersFromGenerate turns a plain
    # explode into a size(prefix)>0 filter that Catalyst pushes below both
    # repartition barriers, substituting aliases until the filter at the
    # parquet scan contains the whole shingle pipeline — re-evaluated per
    # row with the O(n_tokens) re-split (measured 8-12s vs ~3s). The rule
    # skips outer generates; null toks are dropped by the equi-join.
    idx = s.select("doc_id", "sz", "sh", F.explode_outer("prefix").alias("tok"))
    a, b = idx.alias("a"), idx.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.sz") >= F.ceil(F.lit(threshold) * F.col("a.sz")))
            & (F.col("b.sz") <= F.floor(F.col("a.sz") / F.lit(threshold))),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, k: int = 3
) -> DataFrame:
    """(doc_id, sig array<long>, sh): per-seed minima of xxhash64 over
    hashed shingles — the classic MinHash estimator of shingle-set Jaccard.

    ``sh`` is the distinct int64-hashed shingle set (hashed_shingle_sets),
    so each of the ``num_hashes`` seeded re-hashes runs over an 8-byte
    long, not a ~25-char string — the string is hashed exactly once.
    """
    # Build ONE nested higher-order expression: seeds -> min over hashes
    # of xxhash64(h, seed). Emitting `num_hashes` separate array_min
    # trees instead would copy the whole shingle subtree per seed and blow
    # up codegen (measured: >100x slower). The inner lambda takes exactly
    # one arg — a binary lambda would be given (element, index) by Spark.
    # hashed_shingle_sets ends in a materialization BARRIER; without it
    # CollapseProject inlines the shingle expression into the per-seed
    # lambda and recomputes it num_hashes times per row (measured: >60x).
    with_sh = hashed_shingle_sets(df, id_col, text_col, k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(F.transform(F.col("sh"), lambda h: F.xxhash64(h, seed))),
    )
    return with_sh.select("doc_id", sig.alias("sig"), "sh")


#: Max ids a single task row compares against another chunk (chunk² pair
#: expansions per row at most — 4096 at 64). Tune DOWN for hotter skew.
BUCKET_CHUNK = 64


def chunked_bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    arr_col: str,
    pair_fn,
    chunk: int = BUCKET_CHUNK,
) -> DataFrame:
    """Skew-resilient in-bucket pair enumeration: ``p`` = pair struct per
    ordered pair of the sorted ``arr_col`` array.

    The naive form — one flatten(transform(...)) over the whole bucket
    array — expands C(n,2) pairs inside the SINGLE reduce task that owns
    the bucket row. Uniform fixtures never show it, but the classic
    100 TB failure is a hot LSH/SimHash bucket (boilerplate duplicated
    10⁴-10⁶×) turning that task into a straggler (10⁴ ids → 5·10⁷ pairs
    in one task). This version tiles the sorted array into ``chunk``-size
    slices, explodes the upper-triangular CHUNK-pair grid — (n/chunk)²/2
    rows, each carrying two ≤chunk-element slices — REPARTITIONS on
    (bucket key, ci, cj) so a hot bucket's grid spreads across the
    cluster, then expands ≤ chunk² element pairs per row (triangular when
    ci == cj, full cross otherwise; the sorted tiling preserves a < b).

    The pair SET is identical to the naive expansion — same semantics,
    same oracles — and for buckets ≤ chunk the grid degenerates to one
    (0,0) row, so the uniform-corpus plan shape is unchanged apart from
    the (small: collided buckets only) repartition exchange. Total work
    is still Σ C(n_b, 2) — candidate semantics demand every pair — but
    no task expands more than chunk² pairs per input row. Upstream note:
    run exact_dedup first so byte-identical mega-clusters collapse before
    banding; collect_set still gathers a hot bucket's ids into one array
    (80 KB at 10⁴ ids — the array is fine; the expansion was the hazard).
    """
    nch = F.ceil(F.size(F.col(arr_col)) / F.lit(chunk)).cast("int")
    grid = F.flatten(
        F.transform(
            F.sequence(F.lit(0), nch - 1),
            lambda ci: F.transform(
                F.sequence(ci, nch - 1),
                lambda cj: F.struct(ci.alias("ci"), cj.alias("cj")),
            ),
        )
    )
    pieces = (
        buckets.select(*key_cols, F.col(arr_col).alias("_arr"), F.explode_outer(grid).alias("_cc"))
        .select(
            *key_cols,
            F.col("_cc.ci").alias("_ci"),
            F.col("_cc.cj").alias("_cj"),
            F.slice("_arr", F.col("_cc.ci") * chunk + 1, F.lit(chunk)).alias("_sa"),
            F.slice("_arr", F.col("_cc.cj") * chunk + 1, F.lit(chunk)).alias("_sb"),
        )
        # EXPLICIT partition count: a column-only repartition lets AQE
        # coalesce the (tiny, pre-explosion) chunk-pair rows back into
        # one partition — AQE sizes by bytes and cannot see that each
        # row expands up to chunk^2 pairs. Pinning N keeps the spread.
        .repartition(
            int(buckets.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            *key_cols,
            "_ci",
            "_cj",
        )
    )
    tri = F.flatten(
        F.transform(
            F.col("_sa"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_sa"), i + 2, F.greatest(F.size(F.col("_sa")) - i - 1, F.lit(0))
                ),
                lambda y: pair_fn(x, y),
            ),
        )
    )
    cross = F.flatten(
        F.transform(
            F.col("_sa"), lambda x: F.transform(F.col("_sb"), lambda y: pair_fn(x, y))
        )
    )
    pairs = F.when(F.col("_ci") == F.col("_cj"), tri).otherwise(cross)
    # drop the null row explode_outer emits for an EMPTY pair array (a
    # single-element (ci, ci) tile) — downstream joins ignored the null
    # pair anyway, but emitting it forces callers to reason about it
    return pieces.select(F.explode_outer(pairs).alias("p")).filter(
        F.col("p").isNotNull()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    With b=16, r=4 the S-curve midpoint is (1/16)^(1/4) = 0.5: pairs at
    J ≥ 0.8 are caught with prob ≈ 1-(1-0.8⁴)¹⁶ ≈ 0.9998, while random
    pairs (J≈0.1) collide in a band with prob ≈ 16·J⁴ ≈ 0.16% — the
    candidate space stays near-linear. Each band hash is one shuffle key;
    bucket grouping replaces the O(n²) comparison space. (The signature
    cost is linear in num_hashes — 64×4-row bands measure ~2x cheaper
    than 128×32 for the same empirical recall=1 on this corpus.)
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k)
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows)),
    )
    # Explode ONLY (doc_id, band, band_hash): shuffling the shingle arrays
    # x bands would multiply the shuffle volume ~bands-fold. Shingles are
    # re-attached to the (few) surviving candidate pairs afterwards.
    # posexplode_outer: see jaccard_index_pairs — a non-outer generate infers
    # a size()>0 filter whose pushdown re-derives the signature tree at the
    # scan. Null bands are dropped by the aggregate's sort-key anyway.
    banded = sigs.select("doc_id", F.posexplode_outer(band_hashes).alias("band", "band_hash"))
    # Candidate pairs come from GROUPING each (band, band_hash) bucket and
    # enumerating in-bucket pairs, not from a banded-self-join: the join
    # evaluates the signature pipeline once per side (2x), the groupBy
    # once. In-bucket expansion rides chunked_bucket_pairs so a hot
    # bucket (boilerplate duplicated 10⁴×) spreads across tasks instead
    # of exploding C(n,2) pairs in one; run exact_dedup first if the
    # corpus has massive byte-identical clusters.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    candidates = (
        chunked_bucket_pairs(
            buckets,
            ["band", "band_hash"],
            "ids",
            lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
        )
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verification joins the shingle sets ONCE: candidates are melted to
    # (pair, side, doc_id), joined against a single sets branch, then
    # pivoted back with max(when(side,...)) — arrays are comparable in
    # Spark, and each (pair, side) group has exactly one non-null value.
    # Two separate join-backs (sh_a, sh_b) would evaluate the shingle
    # pipeline a third time: branches of the plan DAG are re-executed,
    # not shared, absent an exchange reuse.
    melted = candidates.select(
        "doc_a",
        "doc_b",
        F.posexplode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("side", "doc_id"),
    )
    attached = melted.join(sigs.select("doc_id", "sh"), "doc_id")
    return (
        attached.groupBy("doc_a", "doc_b")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("sh"))).alias("sh_a"),
            F.max(F.when(F.col("side") == 1, F.col("sh"))).alias("sh_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _band_hashes(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, band_hash) — exploded LSH band keys for a signature
    table (posexplode_outer per the inferred-filter convention above)."""
    bh = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows)),
    )
    return sigs.select("doc_id", F.posexplode_outer(bh).alias("band", "band_hash"))


def incremental_minhash_pairs(
    base: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    base_signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs of an incoming BATCH against an existing BASE
    corpus: (new_doc, dup_of, jaccard) with jaccard ≥ threshold —
    the production shape of dedup at 100 TB, where a new crawl snapshot
    is checked against the standing corpus WITHOUT re-enumerating
    base×base pairs.

    Ids must be disjoint across the two inputs (they share one id space
    in a real corpus; asserted by the caller).

    Scale design: the base side's (band, band_hash) index is exactly
    what a production pipeline materializes at ingest (bucketed by
    band_hash); the per-batch cost is then signature computation over
    the batch + one equi-join keyed by (band, band_hash) whose base
    side is partition-pruned by the bucket layout. Candidates are
    verified with exact shingle Jaccard via ONE melted join-back
    against the union of both signature tables (same single-evaluation
    discipline as minhash_lsh_pairs). base×base and batch×batch pairs
    never exist: the join is strictly cross-sided.
    """
    rows = num_hashes // bands
    # sig_base is the at-ingest index side — callers that hold a
    # materialized copy (per-session memo, stored table) pass it in so
    # repeated batches don't re-shingle the standing corpus
    sig_base = (
        base_signatures
        if base_signatures is not None
        else minhash_signatures(base, id_col, text_col, num_hashes, k)
    )
    sig_batch = minhash_signatures(batch, id_col, text_col, num_hashes, k)
    cand = (
        _band_hashes(sig_batch, bands, rows)
        .alias("q")
        .join(
            _band_hashes(sig_base, bands, rows).alias("x"),
            (F.col("q.band") == F.col("x.band"))
            & (F.col("q.band_hash") == F.col("x.band_hash")),
        )
        .select(F.col("q.doc_id").alias("new_doc"), F.col("x.doc_id").alias("dup_of"))
        .dropDuplicates(["new_doc", "dup_of"])
    )
    sigs_all = sig_base.select("doc_id", "sh").unionByName(sig_batch.select("doc_id", "sh"))
    melted = cand.select(
        "new_doc",
        "dup_of",
        F.posexplode(F.array(F.col("new_doc"), F.col("dup_of"))).alias("side", "doc_id"),
    )
    return (
        melted.join(sigs_all, "doc_id")
        .groupBy("new_doc", "dup_of")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("sh"))).alias("sh_a"),
            F.max(F.when(F.col("side") == 1, F.col("sh"))).alias("sh_b"),
        )
        .select(
            "new_doc",
            "dup_of",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash signature: xxhash64 bit votes over distinct 3-word shingles.

    Shingles (not raw tokens) are the features: on small-vocab corpora the
    token multiset is nearly shared by all docs and vote margins collapse
    to coin flips, whereas shingle sets track edit-level similarity.

    One fold over the feature hashes accumulating all ``bits`` vote
    counters in an array — the feature subtree is evaluated exactly once
    per row. (A per-bit construction re-evaluates the shingling per bit:
    measured minutes instead of seconds on 5k docs — which is why this
    INLINE-expression form keeps the per-hash accumulator fold, while
    simhash_from_hashes, whose contract is an already-computed column,
    uses the cheaper per-bit fold.)
    """
    return _simhash_fold_per_hash(
        F.transform(word_shingles(text, 3), lambda t: F.xxhash64(t)), bits
    )


def _simhash_fold_per_hash(hashes: Column, bits: int) -> Column:
    """Per-hash vote-array fold: references ``hashes`` exactly once, so
    it stays linear even when ``hashes`` is an expensive inline
    expression (see simhash() above). Exact-integer equal to
    simhash_from_hashes."""
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda v, b: v + F.when(h.bitwiseAND(_shl1(b)) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            bit_idx,
            lambda v, b: F.when(v > 0, _shl1(b)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )


def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash fold over an already-computed array<long> of feature hashes.

    Folded per BIT, not per hash: the classic per-hash accumulator form
    (aggregate with a zip_with over a bits-wide vote array) allocates a
    fresh ``bits``-element array per feature hash — |hashes| × bits array
    cells materialized per row just to throw away. Per bit, the vote is
    votes[b] = 2·c_b − n (c_b = hashes with bit b set), so bit b of the
    signature is set iff 2·c_b > n — one integer fold per bit, no
    intermediate arrays. Exact-integer equal to the per-hash form
    (asserted 0/5000 mismatches on the sf0.1 corpus; pinned in tests)."""
    n = F.size(hashes)
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    return F.aggregate(
        F.transform(
            bit_idx,
            lambda b: F.when(
                F.aggregate(
                    hashes,
                    F.lit(0),
                    lambda acc, h: acc
                    + F.when(h.bitwiseAND(_shl1(b)) != 0, 1).otherwise(0),
                )
                * 2
                > n,
                _shl1(b),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )


def _shl1(b: Column) -> Column:
    # F.shiftleft only takes a Python-int shift; call the SQL function,
    # which accepts column expressions.
    return F.call_function("shiftleft", F.lit(1).cast("long"), b)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on any equal (bits/4)-bit chunk,
    confirm by Hamming distance ≤ max_hamming (bit_count of xor).

    Feature hashes are the PORTABLE md5-slice 60-bit kind
    (portable_shingle_hashes), so the whole pipeline — feature hashing,
    bit votes, chunk blocking, Hamming confirm — has an exact DuckDB
    mirror (queries/extensions.py ext_simhash_pairs oracle). Blocking is
    pigeonhole-lossless only for hamming < 4; above that it is the
    standard approximate trade (mirrored identically in the oracle).

    Feature hashes are computed behind the optimizer fence (same
    recompute hazards as MinHash), folded to the signature, and
    candidates come from GROUPING each chunk bucket (one evaluation of
    the signature pipeline) rather than a chunk self-join (two). The
    signature rides in the bucket members, so the Hamming distance is
    computed inline — no join-back at all."""
    assert bits % 4 == 0
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    hashed = portable_shingle_hashes(df, id_col, text_col, 3)
    s = hashed.select("doc_id", simhash_from_hashes(F.col("sh"), bits).alias("sim"))
    chunks = s.select(
        F.struct("doc_id", "sim").alias("m"),
        F.posexplode_outer(  # outer: avoid inferred-filter pushdown (see above)
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sim"), chunk_bits * i).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_pos", "chunk_val"),
    )
    # struct sort orders by the first field (doc_id), so in-bucket pair
    # expansion yields doc_a < doc_b directly.
    buckets = (
        chunks.groupBy("chunk_pos", "chunk_val")
        .agg(F.array_sort(F.collect_set("m")).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    # chunked enumeration: a hot chunk bucket spreads across tasks (see
    # chunked_bucket_pairs) instead of expanding C(n,2) pairs in one
    return (
        chunked_bucket_pairs(
            buckets,
            ["chunk_pos", "chunk_val"],
            "ms",
            lambda x, y: F.struct(
                x["doc_id"].alias("doc_a"),
                y["doc_id"].alias("doc_b"),
                F.bit_count(x["sim"].bitwiseXOR(y["sim"])).alias("hamming"),
            ),
        )
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )

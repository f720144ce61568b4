"""Skew-resilience tests for the dedup band buckets (round-4 item 2).

The classic 100 TB dedup failure is a hot LSH/SimHash bucket — one
boilerplate text near-duplicated 10⁴-10⁶× — turning the in-bucket pair
expansion into a single straggler task. sf* fixtures are uniform and
never show it, so this file builds a deliberately skewed corpus (one
near-dup template repeated HOT× plus distinct background docs) and pins:

1. correctness — the chunked enumeration's pair set equals the naive
   brute-force (cross-join) pair set on the same corpus;
2. distribution — the hot bucket's C(HOT,2) expansion is spread across
   multiple partitions, with no partition expanding more than half the
   pairs (pre-fix: 100% in the one task owning the bucket row);
3. plan — the chunk-grid repartition exchange
   (band/chunk key + _ci + _cj) is present, so a future refactor cannot
   silently fall back to single-task expansion.
"""

import pyspark.sql.functions as F

from bigdatamanagement_spark.operators.dedup import (
    chunked_bucket_pairs,
    hashed_shingle_sets,
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from bigdatamanagement_spark.plans import executed_plan

HOT = 200  # hot near-dup copies; C(200,2) = 19900 pairs, nch = 4 chunks
BG = 50  # distinct background docs


def _skewed_corpus(spark):
    """HOT near-identical docs (shared 60-word template + unique 2-word
    tail -> J ~ 0.9 pairwise) and BG mutually-dissimilar docs."""
    template = " ".join(f"boiler plate token{w} clause" for w in range(15))
    hot = [(i, f"{template} uniq{i} tail{i}") for i in range(HOT)]
    bg = [
        (
            10_000 + i,
            " ".join(f"doc{i} word{i}_{j} body{j * i + 7}" for j in range(30)),
        )
        for i in range(BG)
    ]
    return spark.createDataFrame(hot + bg, "doc_id long, text string")


def _brute_pairs(spark, corpus, threshold):
    """Naive all-pairs shingle Jaccard — the oracle shape (test-scale only)."""
    sets = hashed_shingle_sets(corpus, "doc_id", "text").localCheckpoint()
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", (inter / F.greatest(union, F.lit(1))).alias("j"))
        .filter(F.col("j") >= threshold)
    )


def test_minhash_skewed_bucket_matches_brute_force(spark):
    corpus = _skewed_corpus(spark).localCheckpoint()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.8).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in _brute_pairs(spark, corpus, 0.8).collect()
    }
    # LSH at b=16,r=4 catches J>=0.8 with prob ~0.9998 per pair; on the
    # hot cluster every pair shares all band hashes, so recall is exact
    assert want, "fixture must produce near-dup pairs"
    assert got == want
    assert len(got) >= HOT * (HOT - 1) // 2  # full hot clique present


def test_hot_bucket_expansion_is_distributed(spark):
    """No partition may expand more than half the hot bucket's pairs
    (the pre-fix behavior was 100% in one task)."""
    ids = F.array_sort(F.collect_set("doc_id")).alias("ids")
    bucket = (
        _skewed_corpus(spark)
        .filter(F.col("doc_id") < HOT)
        .groupBy(F.lit(0).alias("band"), F.lit(0).alias("band_hash"))
        .agg(ids)
    )
    pairs = chunked_bucket_pairs(
        bucket,
        ["band", "band_hash"],
        "ids",
        lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
    )
    per_part = (
        pairs.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in per_part)
    assert total == HOT * (HOT - 1) // 2  # chunking preserves the pair set
    assert len(per_part) >= 3, per_part  # spread across partitions
    assert max(r["count"] for r in per_part) <= total // 2, per_part


def test_band_pair_plans_carry_chunk_repartition(spark):
    """The chunk-grid exchange must stay in both band-bucket consumers:
    hashpartitioning on (bucket key, _ci, _cj) is what spreads a hot
    bucket. A refactor dropping it reverts to single-task expansion."""
    corpus = _skewed_corpus(spark)
    for df in (
        minhash_lsh_pairs(corpus, "doc_id", "text"),
        simhash_pairs(corpus, "doc_id", "text"),
    ):
        plan = executed_plan(df)
        assert "_ci" in plan and "_cj" in plan, plan[:1500]


def test_incremental_pairs_survive_skewed_base(spark):
    """The batch-vs-base band JOIN under a hot key: AQE's skew-join
    handling owns this path (it is a real equi-join, not a generate);
    assert it completes and returns the exact cross-sided clique."""
    corpus = _skewed_corpus(spark)
    base = corpus.filter(F.col("doc_id") < HOT - 10)
    batch = corpus.filter(
        (F.col("doc_id") >= HOT - 10) & (F.col("doc_id") < HOT)
    )
    out = incremental_minhash_pairs(base, batch, "doc_id", "text", threshold=0.8)
    # every batch doc pairs with every base hot doc: 10 x (HOT-10)
    assert out.count() == 10 * (HOT - 10)


# --- property: chunked enumeration == naive triangular, any size/chunk ------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    n=st.integers(min_value=2, max_value=150),
    chunk=st.sampled_from([1, 2, 3, 63, 64, 65, 128]),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunked_pairs_equal_naive_any_size(spark, n, chunk, seed):
    """Property: for any bucket size and chunk size (boundary sizes
    included), the chunked expansion yields exactly C(n,2) ordered pairs
    equal to the naive triangular enumeration over the sorted ids."""
    import random

    rng = random.Random(seed)
    ids = sorted(rng.sample(range(10**6), n))
    bucket = spark.createDataFrame(
        [(0, 0, ids)], "band int, band_hash int, ids array<bigint>"
    )
    got = {
        (r["p"]["doc_a"], r["p"]["doc_b"])
        for r in chunked_bucket_pairs(
            bucket,
            ["band", "band_hash"],
            "ids",
            lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            chunk=chunk,
        ).collect()
    }
    want = {
        (ids[i], ids[j]) for i in range(n) for j in range(i + 1, n)
    }
    assert got == want

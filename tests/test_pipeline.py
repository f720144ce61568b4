"""Oracle + property tests for the pipeline pack (clustering, vocab,
splits, anonymization, centroids)."""

import random

import pytest

from bigdatamanagement_spark.operators import cluster as C
from bigdatamanagement_spark.queries import pipeline as P
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(P.ORACLE))
def test_pipeline_oracle(spark, duck, sf_dir, name):
    df = P.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, P.ORACLE[name])


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress everything, then label each node by the min of its set
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(nodes) for nodes in comp.values() for x in nodes}


# thr=0 forces the distributed star-contraction path; the default
# takes the driver union-find fallback — both must agree with the
# reference union-find on every graph.
@pytest.mark.parametrize("thr", [0, 200_000])
@pytest.mark.parametrize("seed,n,m", [(1, 30, 20), (2, 60, 90), (3, 40, 40)])
def test_connected_components_matches_union_find(spark, seed, n, m, thr):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "a: long, b: long")
    got = {
        r.node: r.component
        for r in C.connected_components(
            df, "a", "b", driver_threshold=thr
        ).collect()
    }
    want = _union_find_components(n, edges)
    touched = {x for e in edges for x in e}
    assert got == {x: want[x] for x in touched}


@pytest.mark.parametrize("thr", [0, 200_000])
def test_connected_components_chain_worst_case(spark, thr):
    """A path graph maximizes diameter — star contraction must still
    converge (in O(log n) rounds, not O(n)) and label by the min id."""
    n = 64
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a: long, b: long")
    got = {
        r.node: r.component
        for r in C.connected_components(
            df, "a", "b", driver_threshold=thr
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}


@pytest.mark.parametrize("thr", [0, 200_000])
def test_connected_components_empty(spark, thr):
    df = spark.createDataFrame([], "a: long, b: long")
    assert (
        C.connected_components(df, "a", "b", driver_threshold=thr).count()
        == 0
    )


def test_assign_clusters_singletons(spark):
    items = spark.createDataFrame([(i,) for i in range(6)], "doc_id: long")
    pairs = spark.createDataFrame([(4, 5)], "doc_a: long, doc_b: long")
    got = {
        r.doc_id: r.cluster_rep
        for r in C.assign_clusters(items, "doc_id", pairs, "doc_a", "doc_b").collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 4}


def test_hash_split_is_stable_under_growth(spark, sf_dir):
    """A doc's split assignment must not depend on the rest of the corpus:
    recompute on a half-corpus and compare overlapping doc buckets."""
    import pyspark.sql.functions as F

    d = P._docs(spark, sf_dir)
    bucket = (F.col("doc_id") * F.lit(P.KNUTH)) % F.lit(1000)
    full = {r.doc_id: r.b for r in d.select("doc_id", bucket.alias("b")).collect()}
    half = {
        r.doc_id: r.b
        for r in d.where("doc_id % 2 = 0").select("doc_id", bucket.alias("b")).collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_repetition_filter_splits_corpus(spark, sf_dir):
    """Thresholds must actually split the corpus (both verdicts present) —
    an all-true keep column would trivially match any oracle."""
    rows = P.repetition_filter(spark, sf_dir).select("keep").distinct().collect()
    assert {r["keep"] for r in rows} == {True, False}


def test_curation_funnel_has_all_verdicts(spark, sf_dir):
    """The funnel must exercise every stage: all four verdicts appear
    (otherwise a stage's predicate is vacuous on this corpus and the
    oracle match proves nothing about it)."""
    rows = P.curation_funnel(spark, sf_dir).collect()
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {"kept", "low_quality", "repetitive", "near_duplicate"}


# --- repetition metrics property test -------------------------------------

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_repetition(tokens, dup_k=3):
    """Pure-Python reference for repetition_metrics on one doc."""
    def grams(k):
        return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]

    def top_frac(g):
        return round(Counter(g).most_common(1)[0][1] / len(g), 4) if g else 0.0

    kg = grams(dup_k)
    dup = round((len(kg) - len(set(kg))) / len(kg), 4) if kg else 0.0
    return (len(tokens), top_frac(grams(1)), top_frac(grams(2)), dup)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "ab", "x1"]), min_size=1, max_size=30),
        min_size=1,
        max_size=12,
    )
)
def test_repetition_metrics_property(spark, docs):
    """repetition_metrics ≡ pure-Python Counter reference on random token
    lists (small alphabet forces repeated tokens/grams)."""
    from bigdatamanagement_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["top_token_frac"],
            r["top_bigram_frac"],
            r["dup_3gram_frac"],
        )
        for r in repetition_metrics(df, "doc_id", "text").collect()
    }
    want = {i: _py_repetition(toks) for i, toks in enumerate(docs)}
    assert got == want


def test_training_set_manifest_monotone_attrition(spark, sf_dir):
    """Each stage only removes documents: n_raw >= n_kept >= n_clean,
    and every clean doc yields at least one chunk."""
    from bigdatamanagement_spark.queries.pipeline import training_set_manifest

    for r in training_set_manifest(spark, sf_dir).collect():
        assert r["n_raw"] >= r["n_kept"] >= r["n_clean"] >= 0, r
        assert r["n_chunks"] >= r["n_clean"], r
        assert r["train_tokens"] >= r["n_chunks"], r  # chunks are non-empty


def test_leakage_safe_split_eliminates_cross_split_neardups(spark, sf_dir, duck):
    """Cluster-keyed split must leak ZERO near-dup pairs across splits
    (computed from the verified pair set, not asserted by construction),
    while remaining a 90/5/5-style partition of all docs."""
    from bigdatamanagement_spark.queries.pipeline import leakage_safe_split

    rows = leakage_safe_split(spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["cluster_split_leaked_pairs"] == 0 for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total_docs == n  # a partition: every doc in exactly one split

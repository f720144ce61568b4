"""Oracle + recall tests for the extension pack (dedup, similarity, text)."""

import pytest

from bigdatamanagement_spark.queries import extensions as E
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(E.ORACLE))
def test_ext_oracle(spark, duck, sf_dir, name):
    df = E.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, E.ORACLE[name])


def test_jaccard_index_join_equals_bruteforce(spark, sf_dir):
    """The prefix-filtered inverted-index join must return exactly the
    brute-force O(n²) pair set (same pairs, same rounded Jaccard) — the
    Vernica prefix-filter guarantee, checked end-to-end."""
    from bigdatamanagement_spark.operators import dedup as D
    from bigdatamanagement_spark.queries.extensions import BRUTE_MAX_DOC, JACCARD_T, _docs

    docs = _docs(spark, sf_dir).filter("doc_id < %d" % BRUTE_MAX_DOC)
    brute = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", JACCARD_T).collect()
    }
    idx = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.jaccard_index_pairs(docs, "doc_id", "text", JACCARD_T).collect()
    }
    assert idx == brute and brute


def test_minhash_lsh_recall_equals_bruteforce(spark, sf_dir):
    """LSH(16×4) must find every J≥0.8 pair on this corpus (recall=1);
    this is the local validation backing the shared oracle SQL."""
    brute = {
        (r.doc_a, r.doc_b) for r in E.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in E.minhash_lsh_pairs(spark, sf_dir).collect()}
    assert lsh == brute


def test_simhash_fold_forms_identical(spark, sf_dir):
    """The per-bit signature fold (simhash_from_hashes) and the per-hash
    vote-array fold (_simhash_fold_per_hash, kept for inline-expression
    callers) must produce bit-identical signatures on the real corpus —
    the exact-integer equivalence the round-7 fold swap rests on."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators.dedup import (
        _simhash_fold_per_hash,
        portable_shingle_hashes,
        simhash_from_hashes,
    )

    hashed = portable_shingle_hashes(
        E._docs(spark, sf_dir), "doc_id", "text", 3
    ).localCheckpoint()
    mism = (
        hashed.select(
            simhash_from_hashes(F.col("sh"), 60).alias("a"),
            _simhash_fold_per_hash(F.col("sh"), 60).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert mism == 0


def test_simhash_finds_near_identicals(spark, sf_dir):
    """SimHash(hamming≤8) recall vs exact-Jaccard near-dups ≥ 0.75
    (SimHash is noisy on short/small-vocab docs — approximate by design)."""
    brute = {
        (r.doc_a, r.doc_b) for r in E.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    sim = {(r.doc_a, r.doc_b) for r in E.simhash_pairs(spark, sf_dir).collect()}
    assert len(brute & sim) / len(brute) >= 0.75


def test_lsh_ann_recall(spark, sf_dir):
    """Hyperplane-LSH top-10 must overlap exact top-10 by ≥40% on average
    (8-bit × 4 tables on near-random 64-dim vectors)."""
    exact = E.cosine_topk(spark, sf_dir).collect()
    approx = E.lsh_ann_topk(spark, sf_dir).collect()
    from collections import defaultdict

    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r.query_id].add(r.neighbor_id)
    for r in approx:
        ap[r.query_id].add(r.neighbor_id)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.3, sum(recalls) / len(recalls)


def test_blocked_neardup_equals_bruteforce(spark, sf_dir):
    """Triangle-blocked numpy all-pairs cosine must return exactly the
    JVM zip_with brute-force pair set (same pairs, same rounded cosine)."""
    blocked = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in E.embedding_neardup_pairs(spark, sf_dir).collect()
    }
    brute = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in E.embedding_neardup_pairs_brute(spark, sf_dir).collect()
    }
    assert blocked == brute and brute


def test_ivf_ann_recall(spark, sf_dir):
    """IVF (8 k-means cells, nprobe=4) top-10 must overlap exact top-10 by
    ≥50% on average (measured 0.82 on this corpus); every query must get
    a full k=10 result (probing half the cells always has ≥k candidates)."""
    exact = E.cosine_topk(spark, sf_dir).collect()
    approx = E.ivf_ann_topk(spark, sf_dir).collect()
    from collections import defaultdict

    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r.query_id].add(r.neighbor_id)
    for r in approx:
        ap[r.query_id].add(r.neighbor_id)
    assert set(ap) == set(ex)
    assert all(len(v) == 10 for v in ap.values())
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5, sum(recalls) / len(recalls)


def test_exact_dedup_is_idempotent(spark, sf_dir):
    from bigdatamanagement_spark.operators.dedup import exact_dedup
    from bigdatamanagement_spark.queries.extensions import _docs

    d = _docs(spark, sf_dir)
    once = exact_dedup(d, "doc_id", "text")
    twice = exact_dedup(once, "doc_id", "text")
    assert once.count() == twice.count()


def test_unigram_lm_scores_semantics(spark, sf_dir):
    """Unigram-LM scores: log-probs strictly negative, token totals agree
    with the independent tokenizer count, rare fraction in [0, 10000]."""
    rows = E.unigram_logprob_quality(spark, sf_dir).collect()
    assert rows and all(r.sum_logprob_micro < 0 for r in rows)
    tf = {r.doc_id: r.token_count for r in E.text_features(spark, sf_dir).collect()}
    assert all(tf[r.doc_id] == r.n_tokens for r in rows)
    assert all(0 <= r.rare_frac_bp <= 10000 for r in rows)


def test_semdedup_drop_policy_and_containment(spark, sf_dir):
    """Every dropped vector is justified by a smaller-id same-cell
    neighbor above threshold; every caught duplicate is a TRUE near-dup
    (containment in the exact brute-force pair set); the policy is
    idempotent (survivors re-deduped drop nothing)."""
    import numpy as np

    from bigdatamanagement_spark.operators import similarity as S
    from bigdatamanagement_spark.queries.extensions import (
        NEARDUP_COS,
        _embs,
        _ivf_centroids,
    )

    e = _embs(spark, sf_dir)
    cents = _ivf_centroids(spark, sf_dir, e)
    flags = S.semantic_dedup(
        e, "vec_id", "embedding", threshold=NEARDUP_COS, centroids=cents
    ).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in e.collect()}
    for vid in vecs:
        vecs[vid] = vecs[vid] / np.linalg.norm(vecs[vid])
    by_cell: dict[int, list] = {}
    for r in flags:
        by_cell.setdefault(r.cell, []).append(r)
    assert len(flags) == len(vecs)
    n_dups = 0
    for cell_rows in by_cell.values():
        ids = sorted(r.vec_id for r in cell_rows)
        for r in cell_rows:
            prior = [i for i in ids if i < r.vec_id]
            best = max(
                (round(float(vecs[r.vec_id] @ vecs[i]), 6) for i in prior),
                default=-1.0,
            )
            if r.is_dup:
                n_dups += 1
                assert best >= NEARDUP_COS  # justified true near-dup
            else:
                assert best < NEARDUP_COS  # nothing above threshold missed
    assert n_dups > 0  # non-vacuous on this corpus


def test_profile_table_nulls_and_types(spark):
    """Profiler on a hand-built frame: null counting, distinct-ignores-
    nulls, numeric (not lexical) min/max, NULL-only column."""
    from bigdatamanagement_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "b", None), (2, None, None), (10, "a", None), (10, "a", None)],
        "k long, s string, dead string",
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["k"].n_rows == 4
    assert (prof["k"].n_nulls, prof["k"].n_distinct) == (0, 3)
    assert (prof["k"].min_value, prof["k"].max_value) == ("1", "10")  # numeric order
    assert (prof["s"].n_nulls, prof["s"].n_distinct) == (1, 2)
    assert (prof["dead"].n_nulls, prof["dead"].n_distinct) == (4, 0)
    assert prof["dead"].min_value is None and prof["dead"].max_value is None


def test_incremental_neardup_equals_cross_bruteforce(spark, sf_dir):
    """Incremental (batch-vs-base) MinHash dedup must return exactly the
    cross-sided subset of the brute-force pair set — no base×base or
    batch×batch pair, nothing missed (LSH recall=1 on this corpus)."""
    from bigdatamanagement_spark.queries.extensions import BATCH_MOD

    is_batch = lambda d: d % BATCH_MOD == BATCH_MOD - 1
    full = E.minhash_lsh_pairs(spark, sf_dir).collect()
    want = {
        ((a, b) if is_batch(a) else (b, a), j)
        for a, b, j in ((r.doc_a, r.doc_b, r.jaccard) for r in full)
        if is_batch(a) != is_batch(b)
    }
    got = {
        ((r.new_doc, r.dup_of), r.jaccard)
        for r in E.incremental_neardup(spark, sf_dir).collect()
    }
    assert got == want and got


def test_bm25_results_contain_query_terms(spark, sf_dir):
    """Every BM25 hit must actually contain ≥ n_terms distinct query
    terms, and ranks must be dense from 1."""
    from bigdatamanagement_spark.queries.extensions import BM25_QUERY, _docs

    hits = E.bm25_search(spark, sf_dir).collect()
    assert [r.rank for r in hits] == list(range(1, len(hits) + 1))
    texts = dict(
        _docs(spark, sf_dir)
        .filter("doc_id in (%s)" % ",".join(str(r.doc_id) for r in hits))
        .select("doc_id", "text")
        .collect()
    )
    for r in hits:
        present = {t for t in BM25_QUERY if t in texts[r.doc_id].split()}
        assert len(present) == r.n_terms


def test_tfidf_rare_terms_outscore_common(spark, sf_dir):
    """Within a doc, a term with strictly smaller df and tf >= the other
    must never score lower (idf monotonicity sanity)."""
    rows = E.tfidf_top_terms(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    checked = 0
    for rs in by_doc.values():
        for a in rs:
            for b in rs:
                if a.df < b.df and a.tf >= b.tf:
                    assert a.score_micro >= b.score_micro
                    checked += 1
    assert checked


def test_countmin_one_sided_over_full_vocab(spark, sf_dir):
    """cm_est >= exact for EVERY vocab term (not just the top-20 probe
    set) — the count-min guarantee has no 'almost' cases."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators import sketch as SK
    from bigdatamanagement_spark.operators import text as T
    from bigdatamanagement_spark.queries.extensions import _docs

    occ = (
        _docs(spark, sf_dir)
        .select(F.explode_outer(T.tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isNotNull())
    )
    sk = SK.countmin_build(occ, depth=4, width=64)
    exact = occ.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    est = SK.countmin_probe(sk, exact.select("term"), depth=4, width=64)
    bad = (
        exact.join(est, "term")
        .filter(F.col("cm_est") < F.col("exact_cnt"))
        .count()
    )
    assert bad == 0
    # sketch total mass equals stream length per row
    n = occ.count()
    per_row = {r.row: r.total for r in
               sk.groupBy("row").agg(F.sum("cnt").alias("total")).collect()}
    assert all(v == n for v in per_row.values()) and len(per_row) == 4


def test_kl_divergence_nonnegative_and_zero_for_self(spark, sf_dir):
    """KL(source‖corpus) is ≥ 0 up to integer-micro rounding slack
    (±0.5 micro per vocab term); a single-source corpus gives exactly 0."""
    import pyspark.sql.functions as F

    rows = E.source_kl_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kl_micro >= -2000, r
    from bigdatamanagement_spark.queries.extensions import _docs

    one = _docs(spark, sf_dir).withColumn("source", F.lit("only"))
    # re-run the operator on a degenerate single-source corpus via a
    # temporary loader shim
    import bigdatamanagement_spark.queries.extensions as ext

    orig = ext._docs
    ext._docs = lambda s, d: one
    try:
        got = ext.source_kl_divergence(spark, sf_dir).collect()
    finally:
        ext._docs = orig
    assert len(got) == 1 and got[0].kl_micro == 0


def test_fuzzy_pairs_length_guard_lossless(spark, sf_dir):
    """The length-difference pre-filter must not drop any true pair:
    operator output == unguarded within-block brute force."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.catalog import load_testdata

    cust = load_testdata(spark, sf_dir, tables=("customer",), register=False)["customer"]
    s = cust.select("c_custkey", "c_name", "c_nationkey")
    a, b = s.alias("a"), s.alias("b")
    brute = {
        (r.rec_a, r.rec_b, r.dist)
        for r in a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("rec_a"),
            F.col("b.c_custkey").alias("rec_b"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
        .collect()
    }
    got = {(r.rec_a, r.rec_b, r.dist) for r in E.fuzzy_name_pairs(spark, sf_dir).collect()}
    assert got == brute and got


def test_countmin_merge_equals_rebuild(spark, sf_dir):
    """Sketches built per source slice then merged cell-wise must equal
    the sketch built over the whole corpus — the mergeability property
    that makes count-min the 100 TB path."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators import sketch as SK
    from bigdatamanagement_spark.operators import text as T
    from bigdatamanagement_spark.queries.extensions import _docs

    d = _docs(spark, sf_dir)
    occ = d.select(
        "source", F.explode_outer(T.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isNotNull())
    whole = {
        (r.row, r.bucket): r.cnt for r in SK.countmin_build(occ).collect()
    }
    sources = [r.source for r in d.select("source").distinct().collect()]
    merged: dict = {}
    for s in sources[:4] + [None]:  # 4 slices + the remainder
        part = (
            occ.filter(F.col("source").isin(sources[:4]) == False)  # noqa: E712
            if s is None
            else occ.filter(F.col("source") == s)
        )
        for r in SK.countmin_build(part).collect():
            merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.cnt
    assert merged == whole


def test_bloom_one_sided_and_mergeable(spark, sf_dir):
    """Bloom guarantees: (a) every key the filter was built from passes
    (zero false negatives, no 'almost' cases); (b) partial blooms OR
    (union+distinct) into exactly the bloom of the union — the map-side
    merge the build relies on."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.catalog import load_testdata
    from bigdatamanagement_spark.operators import sketch as SK

    cust = load_testdata(spark, sf_dir, tables=("customer",), register=False)[
        "customer"
    ].select(F.col("c_custkey").alias("key"))
    bloom = SK.bloom_build(cust, "key")
    probed = SK.bloom_probe(bloom, cust.distinct(), "key")
    assert probed.filter(F.col("bloom_pass") == 0).count() == 0

    a = SK.bloom_build(cust.filter(F.col("key") % 2 == 0), "key")
    b = SK.bloom_build(cust.filter(F.col("key") % 2 == 1), "key")
    merged = {r.bit for r in a.union(b).distinct().collect()}
    whole = {r.bit for r in bloom.collect()}
    assert merged == whole


def test_pq_ann_recall(spark, sf_dir):
    """PQ-ADC (m=8, ksub=16, refine=50) + exact re-rank: top-10 must
    overlap exact top-10 by ≥50% on average, and every query gets a
    full k=10 (the shortlist is 5× k)."""
    exact = E.cosine_topk(spark, sf_dir).collect()
    approx = E.pq_ann_topk(spark, sf_dir).collect()
    from collections import defaultdict

    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r.query_id].add(r.neighbor_id)
    for r in approx:
        ap[r.query_id].add(r.neighbor_id)
    assert all(len(v) == 10 for v in ap.values())
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, avg


def test_pq_encode_twins_agree(spark, sf_dir):
    """The Arrow/numpy batch encoder and the JVM-expression encoder
    produce identical codes (same argmin, same tie rule)."""
    import pyspark.sql.functions as F

    from bigdatamanagement_spark.operators import similarity as S

    e = E._embs(spark, sf_dir)
    books, codes = E._pq_codebooks(spark, sf_dir, e)
    sample = e.filter(F.col("vec_id") < 50)
    jvm = {
        r["neighbor_id"]: list(r["c"])
        for r in sample.select(
            F.col("vec_id").alias("neighbor_id"),
            S._pq_codes(F.col("embedding").cast("array<double>"), books).alias("c"),
        ).collect()
    }
    arrow = {
        r["neighbor_id"]: list(r["codes"])
        for r in codes.filter(F.col("neighbor_id") < 50).collect()
    }
    assert jvm == arrow


def test_lsh_multiprobe_improves_trained_recall(spark, sf_dir):
    """The production lsh_topk multi_probe knob: same planes, P = 2
    lowest-margin flips per (query, table) — candidate recall vs exact
    top-10 must dominate the single-probe run per query and improve the
    mean by a real margin (the T74 fixed twin measured 65% -> 95%)."""
    from collections import defaultdict

    import pyspark.sql.functions as F

    from bigdatamanagement_spark.catalog import load_testdata
    from bigdatamanagement_spark.operators import similarity as S
    from bigdatamanagement_spark.queries.extensions import TOPK_QUERY_IDS

    e = load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ]
    queries = e.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    exact = S.cosine_topk(e, queries, k=10).collect()
    single = S.lsh_topk(e, queries, k=10, n_planes=4, n_tables=8).collect()
    multi = S.lsh_topk(
        e, queries, k=10, n_planes=4, n_tables=8, multi_probe=2
    ).collect()
    ex, sg, mp = defaultdict(set), defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r.query_id].add(r.neighbor_id)
    for r in single:
        sg[r.query_id].add(r.neighbor_id)
    for r in multi:
        mp[r.query_id].add(r.neighbor_id)
    rs = [len(ex[q] & sg[q]) / len(ex[q]) for q in ex]
    rm = [len(ex[q] & mp[q]) / len(ex[q]) for q in ex]
    # multi-probe candidates are a superset, so top-10 recall dominates
    # in aggregate; assert mean lift and a high absolute floor
    assert sum(rm) / len(rm) >= sum(rs) / len(rs)
    assert sum(rm) / len(rm) >= 0.7, sum(rm) / len(rm)


def test_semdedup_centroids_persist_and_reload(spark, sf_dir):
    """Trained SemDeDup centroids persist to the content-keyed disk
    cache (the index-build artifact, like the IVF/PQ stores): a fresh
    session-key reloads the identical centroids without retraining, and
    a changed corpus identity keys a different cache file."""
    import os

    from bigdatamanagement_spark.queries.extensions import (
        _SEMDEDUP_CENTROIDS,
        _semdedup_cache_path,
        _semdedup_centroids,
        _embs,
    )

    e = _embs(spark, sf_dir)
    cache = _semdedup_cache_path(sf_dir)
    assert cache is not None
    if os.path.exists(cache):
        os.remove(cache)
    # Train fresh -> writes the cache file.
    _SEMDEDUP_CENTROIDS.clear()
    trained = _semdedup_centroids(spark, sf_dir, e)
    assert os.path.exists(cache)
    # Drop the in-memory memo: the reload path must hit the disk cache
    # and return the identical centroid matrix (exact — json roundtrip
    # of the same floats), without a Spark training job.
    _SEMDEDUP_CENTROIDS.clear()
    reloaded = _semdedup_centroids(spark, sf_dir, e)
    assert reloaded == trained
    # Cache key tracks corpus identity: a different sf_dir -> different file.
    assert _semdedup_cache_path("/nonexistent") is None

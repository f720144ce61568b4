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

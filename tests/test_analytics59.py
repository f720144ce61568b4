"""T77 sparse lexical retrieval pack: n-gram TF-IDF cosine pairs, BM25
top-k, and the df-band diagnostic — oracle parity plus the semantic pins
that the oracle alone can't express (self-exclusion, rank density,
df-cap bounding, exact-duplicate ceiling)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatamanagement_spark.queries import analytics59 as A
from tests.conftest import assert_matches_oracle


def test_t77_oracle_parity(spark, sf_dir, duck):
    for name, fn in A.QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), duck, A.ORACLE[name])


def test_tfidf_pairs_semantics(spark, sf_dir):
    rows = A.ngram_tfidf_pairs(spark, sf_dir).collect()
    assert rows, "top pairs must be non-empty (corpus plants near-dups)"
    # cosine in (0, 1e6]; ordering is (cos desc, doc_a, doc_b); a < b
    assert all(0 < r.cos_micro <= 1_000_000 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)
    keys = [(-r.cos_micro, r.doc_a, r.doc_b) for r in rows]
    assert keys == sorted(keys)
    # the planted near-dup pairs put the ceiling at (or near) exact 1e6
    assert rows[0].cos_micro >= 990_000


def test_postings_are_df_capped(spark, sf_dir):
    """The scale bound: no posting list longer than DF_CAP77 survives
    into the similarity/retrieval substrate."""
    p = A._postings(spark, sf_dir)
    mx = p.groupBy("gram").count().agg(F.max("count")).collect()[0][0]
    assert mx <= A.DF_CAP77
    # idf is strictly positive for every eligible gram (df <= cap << N)
    assert p.filter(F.col("idf_milli") <= 0).count() == 0


def test_bm25_semantics(spark, sf_dir):
    rows = A.bm25_topk(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.doc_id != r.query_id  # self excluded
        assert r.query_id % A.QUERY_MOD77 == 0
        assert r.score_milli > 0
    for q, rs in by_q.items():
        # dense ranks 1..k, scores non-increasing in rank order
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_milli for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len(rs) <= A.BM25_TOPK


def test_gram_df_stats_partition(spark, sf_dir):
    """Bands partition the gram space: ppm sums to ~1e6 and band
    counts sum to the distinct-gram total."""
    rows = A.gram_df_stats(spark, sf_dir).collect()
    total_ppm = sum(r.postings_ppm for r in rows)
    assert abs(total_ppm - 1_000_000) <= len(rows)  # per-band rounding
    n_grams = sum(r.n_grams for r in rows)
    distinct = (
        A._grams(spark, sf_dir).select("gram").distinct().count()
    )
    assert n_grams == distinct

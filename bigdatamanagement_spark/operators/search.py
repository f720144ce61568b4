"""Full-text relevance operators: TF-IDF keyword extraction and BM25
ranked retrieval over a document corpus.

This is the engine-side generalization of the reference's RediSearch
secondary index (`Assignment 5/redis_client.py:302-313` builds
``idx:users`` with Text/Tag/Numeric fields; `:336` runs composite
search predicates against it). The reference delegates indexing and
scoring to Redis; here the inverted index IS a DataFrame — (term,
posting) rows produced by explode + groupBy — and scoring is a join
against it, so the whole retrieval path is distributed and
Catalyst-planned.

Public sources: BM25 — Robertson & Sparck Jones probabilistic
relevance framework / the Okapi BM25 formulation (TREC-3, 1994);
TF-IDF smooth-idf variant as popularized by scikit-learn's
TfidfTransformer docs (ln((N+1)/(df+1)) + 1).

Cross-engine determinism: every per-(doc, term) score contribution is
rounded to integer MICRO units before any doc-level aggregation, so
summation order (Spark partial aggs vs DuckDB) cannot drift results —
the same integer-micro discipline as operators/text.unigram_lm_scores.
All fractional constants enter the expression as doubles on both
engines (the DuckDB mirrors CAST every literal — a bare ``2.2`` parses
as DECIMAL there and changes the rounding path).

Design for 100 TB:
- ``doc_term_freqs`` is one explode + one (doc_id, term)-keyed
  aggregate with map-side partials — the shuffle carries (doc, term,
  count) partials, never raw text.
- Document-frequency and corpus stats are tiny aggregates of that
  result (term-keyed shuffle of ~vocab rows; 1-row global stats) and
  broadcast back — no second corpus scan.
- BM25 pushes the query-term restriction INSIDE the token array
  (higher-order filter before explode), so only matching occurrences
  are ever exploded — at scale this is the difference between
  exploding ~500 tokens/doc and ~0-3.
- Top-k is a window only for per-doc ranks (tfidf: partitioned by
  doc); the global BM25 top-k is orderBy+limit = TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from bigdatamanagement_spark.operators.text import tokens

K1 = 1.2
B = 0.75
# Spelled as literals, not computed (K1 + 1.0 can land one ulp away from
# the parsed literal 2.2 that the DuckDB mirror uses).
K1_PLUS_1 = 2.2
ONE_MINUS_B = 0.25


def doc_term_freqs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf): the term-frequency table / inverted-index base.

    explode_outer per the house convention (a plain explode lets
    InferFiltersFromGenerate push a size()>0 filter containing the whole
    tokenizer into the scan — see operators/dedup.py); the null row of
    an empty doc is dropped by the group filter."""
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(F.col(text_col))).alias("term"),
    )
    return (
        occ.filter(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(dt: DataFrame) -> DataFrame:
    """(term, df) from the term-frequency table — each (doc, term) row is
    distinct by construction, so df is a plain count."""
    return dt.groupBy("term").agg(F.count("*").alias("df"))


def _idf_micro_tfidf(n_docs: Column, df: Column) -> Column:
    """Smooth idf in integer micro-nats: round((ln((N+1)/(df+1)) + 1)·1e6).

    The +1s happen in exact integer arithmetic; only the final division
    is floating — the DuckDB mirror casts identically."""
    return (
        F.round(
            (F.log((n_docs + 1).cast("double") / (df + 1).cast("double")) + F.lit(1.0))
            * F.lit(1000000.0),
            0,
        ).cast("long")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Returns (doc_id, term, tf, df, score_micro, rank) where
    score_micro = tf · idf_micro is an exact integer (no float
    aggregation anywhere), rank by (score desc, term asc).
    """
    dt = doc_term_freqs(df, id_col, text_col)
    dfreq = doc_frequencies(dt)
    n = df.agg(F.count("*").alias("n_docs"))
    scored = (
        dt.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * _idf_micro_tfidf(F.col("n_docs"), F.col("df"))).alias(
                "score_micro"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 10,
) -> DataFrame:
    """Okapi BM25 ranked retrieval: top-k documents for a bag-of-words
    query. Returns (doc_id, n_terms, score_micro, rank).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)); each term's contribution is
    rounded to integer micros before the per-doc sum (order-proof), and
    ties rank by doc_id.

    The query-term filter runs INSIDE the token array before the
    explode, so the exploded row count is bounded by matching
    occurrences, not corpus token count. df(t) is computed over the
    full corpus (from the filtered occurrence table — a doc contributes
    to df(t) iff it contains t, which the filter preserves).
    """
    qset = F.array(*[F.lit(t) for t in query_terms])
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: F.array_contains(qset, t)).alias("hits"),
    )
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dt = (
        base.select("doc_id", "dl", F.explode_outer("hits").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = dt.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib_micro = F.round(
        F.lit(1000000.0)
        * idf
        * (F.col("tf") * F.lit(K1_PLUS_1))
        / (
            F.col("tf")
            + F.lit(K1) * (F.lit(ONE_MINUS_B) + F.lit(B) * (F.col("dl") / avgdl))
        ),
        0,
    ).cast("long")
    top = (
        dt.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select("doc_id", contrib_micro.alias("c"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"), F.sum("c").alias("score_micro"))
        # global top-k as orderBy+limit -> TakeOrderedAndProject (per-
        # partition heaps), NEVER a global row_number window, which
        # would funnel every matching doc into one partition at scale.
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(topk)
    )
    # rank assignment runs on the <= topk survivors only.
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))),
    )

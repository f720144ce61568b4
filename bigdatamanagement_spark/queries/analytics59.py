"""Sparse lexical retrieval pack (T77): n-gram TF-IDF cosine similarity
and BM25 top-k retrieval via inverted-index joins (Robertson & Walker
SIGIR'94 BM25; Salton's vector space model) — the exact-weighted lexical
complement to the MinHash (set Jaccard) and embedding (dense cosine)
similarity families.

Term space: 3-token shingles ("grams"), not unigrams — the synthetic
corpus has a ~31-word vocabulary, so every unigram is a stop word
(df ≈ 0.8N), while 3-grams discriminate (median df 1 at sf0.01, max 25
at sf0.1). That mirrors real web corpora, where n-gram terms are the
standard fix for high-df token spaces.

Contract (part of the operator semantics, shared with the oracles):
- tokens = split(lower(trim(text)), '\\s+'); grams keep multiplicity;
- **df-capped postings**: grams with df > DF_CAP77 are excluded from
  similarity/retrieval (standard stop-term pruning — and the SCALE
  bound: every posting list is ≤ DF_CAP77 long, so the pair join ships
  at most Σ df² ≤ DF_CAP77 · |postings| pairs, linear in the corpus;
  the same discipline as the MinHash band cap and t76's gram df cap);
- idf_milli = round(1000 · ln(N/df)) — quantized ONCE per gram, then
  all weights are exact BIGINTs (w = tf · idf_milli ≤ ~4e5, norms and
  dots ≤ ~1e14, far inside BIGINT — the micro-nat discipline of
  analytics52);
- cosine and BM25 saturation are evaluated in double from exact BIGINT
  operands in a fixed operand order, then quantized per term — both
  engines compute bit-identical IEEE results, so no fenced comparisons
  are needed.

Queries (all oracle-checked):
- t77_ngram_tfidf_pairs: global top-100 doc pairs by TF-IDF cosine
  (cos_micro desc, doc_a, doc_b) over df-capped grams;
- t77_bm25_topk: BM25 top-10 docs per query (query set = docs with
  doc_id % QUERY_MOD77 == 0, their distinct eligible grams as terms;
  k1 = 1.2, b = 0.75, dl = gram count, self-matches excluded);
- t77_gram_df_stats: df-band histogram of the gram space (n_grams,
  postings, ppm of postings volume) — the diagnostic that justifies
  the df cap.

Scale notes (100 TB): tf/df are two gram-keyed aggregates (map-side
partial combine); the pair stage and the query-term join both key on
gram with ≤ DF_CAP77 postings per key — no skew, no quadratic regime;
the global top-100 is a TakeOrdered, the per-query top-10 a
query-partitioned window. At 100 TB the postings table is the
persisted ingest artifact (like the LSH band index) and df/idf ride a
broadcast dimension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.text import (
    raw_shingles_from_tokens,
    tokens,
)

GRAM_K = 3
DF_CAP77 = 64
TOP_PAIRS77 = 100
BM25_TOPK = 10
QUERY_MOD77 = 97
BM25_K1 = 1.2
BM25_B = 0.75


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gram) with multiplicity — the posting substrate."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.explode(
            raw_shingles_from_tokens(tokens(F.col("text")), GRAM_K)
        ).alias("gram"),
    )


def _n_docs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus size (broadcast dimension, not a driver collect)."""
    return _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n"))


_POSTINGS_MEMO: dict = {}


# The absolute cap was tuned on the sf0.1-shaped corpus (5,000 docs).
# The relative-cap twins scale it as GREATEST(64, ceil(N·64/5000)) —
# exact integer arithmetic, so at both oracle SFs (500 and 5,000 docs)
# it resolves to precisely 64 and the twins equal the absolute entries,
# while at the rehearsal multipliers it keeps the postings non-empty.
# Why it exists: on THIS corpus the 31-word vocabulary saturates at
# ~29.8k distinct 3-grams, so every gram's df crosses an absolute cap
# as docs grow (measured kept grams 29,776 / 29,791 / 1,094 / 0 at
# m=1/3/10/30) — the m≥10 absolute-cap rehearsal legs measure a
# shrinking workload. Fractional stop-term rules (df ≤ c·N) are the
# production form for fixed-vocabulary domains.
DF_CAP_BASE_N77 = 5000
# Pair-stage posting-list truncation for the relcap twin (impact-ordered
# indexes, Anh & Moffat): each gram's pair fan-out is bounded at
# C(PAIR_R77, 2) regardless of corpus size by keeping only its top-R
# postings by weight (w DESC, doc_id tiebreak — deterministic). At the
# oracle SFs the relative cap is 64 = PAIR_R77, so truncation is a
# NO-OP there and the twin still equals the absolute entry exactly.
# Without it the relcap pair join ships Σ df² rows with df ∝ N — the
# measured m=30 cliff (161 s, leg slope 1.88, SCALE.md t77 subset).
PAIR_R77 = 64


def _rel_cap(n_col):
    return F.greatest(
        F.lit(64).cast("long"),
        F.expr(f"(n * {DF_CAP77} + {DF_CAP_BASE_N77 - 1}) DIV {DF_CAP_BASE_N77}"),
    )


def _postings(
    spark: SparkSession, sf_dir: str, relative: bool = False
) -> DataFrame:
    """df-capped weighted postings: (doc_id, gram, tf, df, idf_milli, w).

    idf is quantized once per gram to milli-nats; every downstream
    weight is an exact BIGINT (w = tf·idf_milli). ``relative`` switches
    the df cap from the absolute DF_CAP77 to the corpus-relative rule
    (see DF_CAP_BASE_N77 note).

    This IS the docstring's "persisted ingest artifact": built once per
    corpus, content-keyed in .bdm_cache (cache.persistent_df), so the
    t77 queries and later sessions read the stored index instead of
    re-tokenizing the corpus."""
    from bigdatamanagement_spark import cache
    from bigdatamanagement_spark.session import session_key

    key = (session_key(spark), sf_dir, relative)
    if key not in _POSTINGS_MEMO:
        _POSTINGS_MEMO[key] = cache.persistent_df(
            spark,
            "t77_postings_rel" if relative else "t77_postings",
            sf_dir,
            ("documents",),
            f"k={GRAM_K} dfcap={'rel' if relative else 'abs'}{DF_CAP77} v1",
            lambda: _postings_build(spark, sf_dir, relative),
        )
    return _POSTINGS_MEMO[key]


def _postings_build(
    spark: SparkSession, sf_dir: str, relative: bool = False
) -> DataFrame:
    tf = (
        _grams(spark, sf_dir)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if relative:
        capped = (
            df.crossJoin(F.broadcast(_n_docs_df(spark, sf_dir)))
            .filter(F.col("df") <= _rel_cap("n"))
            .select("gram", "df")
        )
    else:
        capped = df.filter(F.col("df") <= DF_CAP77)
    return (
        tf.join(capped, "gram")
        .crossJoin(F.broadcast(_n_docs_df(spark, sf_dir)))
        .withColumn(
            "idf_milli",
            F.round(
                F.lit(1000.0)
                * F.log(
                    F.col("n").cast("double") / F.col("df").cast("double")
                ),
                0,
            ).cast("long"),
        )
        .withColumn("w", (F.col("tf") * F.col("idf_milli")).cast("long"))
        .select("doc_id", "gram", "tf", "df", "idf_milli", "w")
    )


def ngram_tfidf_pairs(
    spark: SparkSession, sf_dir: str, relative: bool = False
) -> DataFrame:
    """T77 — top-100 doc pairs by exact TF-IDF cosine over df-capped
    3-gram terms. The inverted-index pair join: postings self-join on
    gram (≤ cap per list), BIGINT dot accumulate, one double
    cosine per pair from exact integer operands. ``relative`` selects
    the corpus-relative cap twin (identical at the oracle SFs), whose
    pair stage reads only each gram's top-PAIR_R77 impact-ordered
    postings (norms stay exact over the full postings)."""
    p = _postings(spark, sf_dir, relative)
    pair_src = p
    if relative:
        w_rank = Window.partitionBy("gram").orderBy(
            F.desc("w"), F.asc("doc_id")
        )
        pair_src = (
            p.withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") <= PAIR_R77)
            .drop("rn")
        )
    a = pair_src.select(
        "gram", F.col("doc_id").alias("doc_a"), F.col("w").alias("wa")
    )
    b = pair_src.select(
        "gram", F.col("doc_id").alias("doc_b"), F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    norms = p.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    return (
        dots.join(norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2")), "doc_a")
        .join(norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.lit(1000000.0)
                * F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                0,
            )
            .cast("long")
            .alias("cos_micro"),
        )
        .orderBy(F.desc("cos_micro"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(TOP_PAIRS77)
    )


def bm25_topk(
    spark: SparkSession, sf_dir: str, relative: bool = False
) -> DataFrame:
    """T77 — BM25 top-10 per query. Query terms are the distinct
    eligible grams of each query doc (doc_id % QUERY_MOD77 == 0); the
    candidate set is the gram-keyed join against the df-capped postings
    (every list ≤ DF_CAP77 — retrieval cost is O(|q| · DF_CAP77) per
    query regardless of corpus size). Each term's saturation score is
    computed in double from exact BIGINT operands in fixed operand
    order and quantized to milli-units BEFORE the per-(query, doc) sum,
    so the aggregate is an order-independent integer sum."""
    p = _postings(spark, sf_dir, relative)
    dl = (
        _grams(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dl"))
    )
    avgdl = dl.agg(
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl")
    )
    qterms = (
        p.filter(F.col("doc_id") % QUERY_MOD77 == 0)
        .select(F.col("doc_id").alias("query_id"), "gram")
        .distinct()
    )
    term = (
        qterms.join(p, "gram")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("idf_milli").cast("double")
                * (F.col("tf").cast("double") * (BM25_K1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + BM25_K1
                    * (
                        (1.0 - BM25_B)
                        + BM25_B * F.col("dl").cast("double") / F.col("avgdl")
                    )
                ),
                0,
            )
            .cast("long")
            .alias("term_milli"),
        )
    )
    scores = term.groupBy("query_id", "doc_id").agg(
        F.sum("term_milli").cast("long").alias("score_milli")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "rank", "doc_id", "score_milli")
        .orderBy("query_id", "rank")
    )


def gram_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T77 — df-band histogram of the gram term space: how many grams
    and how much postings volume each df band carries (ppm of total
    postings). The diagnostic that sizes DF_CAP77: the tail bands are
    where a posting-list join would degenerate."""
    tf = (
        _grams(spark, sf_dir)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("df"))
    band = (
        F.when(F.col("df") == 1, "1")
        .when(F.col("df") <= 4, "2-4")
        .when(F.col("df") <= 16, "5-16")
        .when(F.col("df") <= 64, "17-64")
        .otherwise("65+")
    )
    banded = df.select(band.alias("df_band"), "df")
    tot = banded.agg(F.sum("df").cast("long").alias("tot"))
    return (
        banded.groupBy("df_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("df").cast("long").alias("n_postings"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "df_band",
            "n_grams",
            "n_postings",
            F.round(
                F.lit(1000000.0)
                * F.col("n_postings").cast("double")
                / F.col("tot").cast("double"),
                0,
            )
            .cast("long")
            .alias("postings_ppm"),
        )
        .orderBy("df_band")
    )


QUERIES = {
    "t77_ngram_tfidf_pairs": ngram_tfidf_pairs,
    "t77_bm25_topk": bm25_topk,
    "t77_gram_df_stats": gram_df_stats,
    # corpus-relative df-cap twins (see DF_CAP_BASE_N77 note): identical
    # results at the oracle SFs where the cap resolves to exactly 64;
    # at the rehearsal multipliers they keep the measured workload
    # non-vacuous while the absolute cap saturates the fixed vocabulary.
    "t77_ngram_tfidf_pairs_relcap": lambda spark, sf_dir: ngram_tfidf_pairs(
        spark, sf_dir, relative=True
    ),
    "t77_bm25_topk_relcap": lambda spark, sf_dir: bm25_topk(
        spark, sf_dir, relative=True
    ),
}


# Shared oracle substrate: identical tokenization, gram construction,
# tf/df, df cap, and milli-nat idf quantization in DuckDB SQL.
# {cap} is the df-cap predicate: the absolute literal for the base
# entries, the corpus-relative GREATEST form for the _relcap twins.
_CAP_ABS = f"dft.df <= {DF_CAP77}"
_CAP_REL = (
    f"dft.df <= GREATEST(64, ((SELECT n FROM nd) * {DF_CAP77}"
    f" + {DF_CAP_BASE_N77 - 1}) // {DF_CAP_BASE_N77})"
)
_BASE = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
tf AS (
  SELECT doc_id, gram, count(*)::BIGINT AS tf FROM grams GROUP BY 1, 2
),
dft AS (
  SELECT gram, count(*)::BIGINT AS df FROM tf GROUP BY 1
),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
postings AS (
  SELECT tf.doc_id, tf.gram, tf.tf, dft.df,
         CAST(round(1000.0 * ln(CAST((SELECT n FROM nd) AS DOUBLE)
                                / CAST(dft.df AS DOUBLE)), 0) AS BIGINT)
           AS idf_milli,
         tf.tf * CAST(round(1000.0 * ln(CAST((SELECT n FROM nd) AS DOUBLE)
                                        / CAST(dft.df AS DOUBLE)), 0)
                      AS BIGINT) AS w
  FROM tf JOIN dft USING (gram)
  WHERE {{cap}}
)
"""

_T77_TEMPLATES = {
    "t77_ngram_tfidf_pairs": _BASE
    + f"""
, dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         SUM(a.w * b.w)::BIGINT AS dot
  FROM postings a JOIN postings b USING (gram)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
norms AS (
  SELECT doc_id, SUM(w * w)::BIGINT AS n2 FROM postings GROUP BY 1
)
SELECT doc_a, doc_b,
       CAST(round(1000000.0 * CAST(dot AS DOUBLE)
                  / (sqrt(CAST(na.n2 AS DOUBLE))
                     * sqrt(CAST(nb.n2 AS DOUBLE))), 0) AS BIGINT)
         AS cos_micro
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
ORDER BY cos_micro DESC, doc_a, doc_b
LIMIT {TOP_PAIRS77}
""",
    "t77_bm25_topk": _BASE
    + f"""
, dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM grams GROUP BY 1
),
ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, gram FROM postings
  WHERE doc_id % {QUERY_MOD77} = 0
),
term AS (
  SELECT q.query_id, p.doc_id,
         CAST(round(CAST(p.idf_milli AS DOUBLE)
                    * (CAST(p.tf AS DOUBLE) * ({BM25_K1} + 1.0))
                    / (CAST(p.tf AS DOUBLE)
                       + {BM25_K1} * ((1.0 - {BM25_B})
                                      + {BM25_B} * CAST(dl.dl AS DOUBLE)
                                        / (SELECT avgdl FROM ad))), 0)
              AS BIGINT) AS term_milli
  FROM qterms q
  JOIN postings p USING (gram)
  JOIN dl ON dl.doc_id = p.doc_id
  WHERE p.doc_id <> q.query_id
),
scores AS (
  SELECT query_id, doc_id, SUM(term_milli)::BIGINT AS score_milli
  FROM term GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score_milli,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_milli DESC, doc_id)::BIGINT
           AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, score_milli FROM ranked
WHERE rank <= {BM25_TOPK}
ORDER BY query_id, rank
""",
    "t77_gram_df_stats": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
),
tf AS (
  SELECT doc_id, gram, count(*)::BIGINT AS tf FROM grams GROUP BY 1, 2
),
dft AS (
  SELECT gram, count(*)::BIGINT AS df FROM tf GROUP BY 1
),
banded AS (
  SELECT CASE WHEN df = 1 THEN '1'
              WHEN df <= 4 THEN '2-4'
              WHEN df <= 16 THEN '5-16'
              WHEN df <= 64 THEN '17-64'
              ELSE '65+' END AS df_band,
         df
  FROM dft
)
SELECT df_band, count(*)::BIGINT AS n_grams, SUM(df)::BIGINT AS n_postings,
       CAST(round(1000000.0 * CAST(SUM(df) AS DOUBLE)
                  / (SELECT CAST(SUM(df) AS DOUBLE) FROM banded), 0)
            AS BIGINT) AS postings_ppm
FROM banded
GROUP BY 1
ORDER BY df_band
""",
}

# Resolve the {cap} placeholder: absolute literal for the base entries,
# corpus-relative GREATEST form for the _relcap twins (identical value
# — exactly 64 — at both oracle SFs, by integer arithmetic).
ORACLE = {
    name: tpl.replace("{cap}", _CAP_ABS) for name, tpl in _T77_TEMPLATES.items()
}
# The relcap pairs twin also mirrors the impact-ordered pair-stage
# truncation (top-PAIR_R77 postings per gram by w DESC, doc_id) — a
# no-op at the oracle SFs where the relative cap is exactly 64.
ORACLE["t77_ngram_tfidf_pairs_relcap"] = (
    _T77_TEMPLATES["t77_ngram_tfidf_pairs"]
    .replace("{cap}", _CAP_REL)
    .replace(
        ", dots AS (",
        f""", ppair AS (
  SELECT doc_id, gram, w FROM (
    SELECT postings.*, row_number() OVER (
      PARTITION BY gram ORDER BY w DESC, doc_id) AS rn
    FROM postings)
  WHERE rn <= {PAIR_R77}
), dots AS (""",
    )
    .replace(
        "FROM postings a JOIN postings b USING (gram)",
        "FROM ppair a JOIN ppair b USING (gram)",
    )
)
ORACLE["t77_bm25_topk_relcap"] = _T77_TEMPLATES["t77_bm25_topk"].replace(
    "{cap}", _CAP_REL
)

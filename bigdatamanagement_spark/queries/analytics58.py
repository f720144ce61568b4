"""ExactSubstr dedup pack (T76; Lee, Ippolito et al., ACL 2022 —
"Deduplicating Training Data Makes Language Models Better"): verbatim
>= K-token spans occurring more than once anywhere in the corpus,
via the k-gram seed + interval-union construction in
operators/substr.py (exact — the same identity the paper's suffix
array walks; no approximation at the K-gram grain).

Three oracle-checked queries:
- t76_substr_dup_stats: per source, docs / tokens / duplicated tokens
  (union of duplicated spans) / dup ppm — the curation readout the
  paper reports per corpus (they find ~3% of C4 inside >=50-token
  repeats; the synthetic corpus plants ~4.5% near-dups, whose shared
  prefixes this catches at K=8);
- t76_substr_top_spans: the most-repeated K-gram texts (occurrences +
  distinct docs) — the "boilerplate leaderboard" used to audit what
  the dedup would remove;
- t76_substr_doc_pairs: doc pairs sharing >= MIN_SHARED distinct
  duplicated grams under the df cap — the pair face of the substring
  layer (same band-join discipline as MinHash/winnowing).

Cross-engine: tokenization, the lead() gram chain, the md5-slice
60-bit hash, the seed aggregate, and the interval-union window are
ANSI SQL — the DuckDB oracle replays the identical algorithm.

Scale notes (100 TB): gram hashing rides the winnowing substrate's one
doc-keyed exchange; duplicate detection is one gram-hash-keyed
aggregate shipping only 8-byte hashes; coverage is a doc-keyed window
over seed rows only. t76_substr_top_spans groups by gram TEXT (exact,
and the volume after the `n >= 2` filter is the duplicated subset
only); at 100 TB the production form groups hashes first and joins
text back for the final top-k — same answers, noted here because this
pack IS the oracle-checked twin of that path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.substr import (
    K_SUB,
    duplicated_run_spans,
    duplicated_seed_positions,
    duplicated_token_coverage,
    grams_with_text,
)
from bigdatamanagement_spark.operators.text import token_count
from bigdatamanagement_spark.operators.winnow import candidate_pairs

DF_CAP = 16
MIN_SHARED = 4
TOP_SPANS = 20
TOP_PAIRS = 100


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def substr_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T76a — per source: docs, total tokens, tokens inside >=K-token
    duplicated spans (interval union), and dup_ppm. Docs with no
    duplicated span count with 0."""
    d = _docs(spark, sf_dir)
    g = grams_with_text(d, "doc_id", "text", K_SUB)
    cov = duplicated_token_coverage(duplicated_seed_positions(g), K_SUB)
    per_doc = d.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_toks")
    ).join(cov, "doc_id", "left")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.coalesce(F.sum("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "dup_tokens",
            F.expr("dup_tokens * 1000000 DIV n_tokens").alias("dup_ppm"),
        )
        .orderBy("source")
    )


def substr_top_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T76b — the TOP_SPANS most-repeated K-gram texts: occurrences,
    distinct docs; ties by gram text."""
    g = grams_with_text(_docs(spark, sf_dir), "doc_id", "text", K_SUB)
    return (
        g.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(TOP_SPANS)
    )


def substr_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T76c — doc pairs sharing >= MIN_SHARED distinct duplicated
    grams, df-capped (boilerplate grams shared by > DF_CAP docs are
    dropped — non-discriminative, and the cap bounds the band-join
    fan-out). Strongest pairs first, top TOP_PAIRS."""
    g = grams_with_text(_docs(spark, sf_dir), "doc_id", "text", K_SUB)
    per_doc = g.select("doc_id", F.col("h").alias("fp")).distinct()
    return (
        candidate_pairs(per_doc, df_cap=DF_CAP, min_shared=MIN_SHARED)
        .orderBy(F.desc("shared"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(TOP_PAIRS)
        .select("doc_a", "doc_b", F.col("shared").cast("long").alias("shared"))
    )


def substr_span_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T76d — the duplicated-SPAN length distribution (the paper's
    headline figure): per maximal contiguous duplicated region, its
    token length; histogram = spans and total tokens per exact length.
    Consistency: sum(total_tokens) here == sum(dup_tokens) of T76a."""
    g = grams_with_text(_docs(spark, sf_dir), "doc_id", "text", K_SUB)
    spans = duplicated_run_spans(duplicated_seed_positions(g), K_SUB)
    return (
        spans.groupBy("span_tokens")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("span_tokens")
    )


QUERIES = {
    "t76_substr_dup_stats": substr_dup_stats,
    "t76_substr_top_spans": substr_top_spans,
    "t76_substr_doc_pairs": substr_doc_pairs,
    "t76_substr_span_histogram": substr_span_histogram,
}


_LEADS = " || ' ' || ".join(
    f"lead(tok, {j}) OVER w" for j in range(1, K_SUB)
)
_G_CTES = f"""
    toked AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok,
               unnest(range(0, len(regexp_split_to_array(lower(trim(text)),
                                                         '\\s+')))) AS pos
        FROM documents
    ),
    gramsraw AS (
        SELECT doc_id, pos, tok || ' ' || {_LEADS} AS gram
        FROM toked
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    g AS (
        SELECT doc_id, pos, gram,
               ('0x' || substring(md5(gram), 1, 15))::BIGINT AS h
        FROM gramsraw WHERE gram IS NOT NULL
    )
"""

_SEED_CTES = f"""
    dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
    seeds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
    cov AS (
        SELECT doc_id,
               CAST(SUM(GREATEST(0, (pos + {K_SUB})
                    - GREATEST(COALESCE(prev_end, 0), pos))) AS BIGINT)
                   AS dup_tokens
        FROM (
            SELECT doc_id, pos,
                   MAX(pos + {K_SUB}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_end
            FROM seeds
        )
        GROUP BY doc_id
    )
"""

ORACLE = {
    "t76_substr_dup_stats": f"""
    WITH {_G_CTES},
    {_SEED_CTES},
    perdoc AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_toks
        FROM documents
    )
    SELECT p.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(c.dup_tokens), 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(SUM(c.dup_tokens), 0) * 1000000
                // SUM(p.n_toks) AS BIGINT) AS dup_ppm
    FROM perdoc p LEFT JOIN cov c USING (doc_id)
    GROUP BY p.source
    ORDER BY p.source
""",
    "t76_substr_top_spans": f"""
    WITH {_G_CTES}
    SELECT gram,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g
    GROUP BY gram
    HAVING count(*) >= 2
    ORDER BY n_occurrences DESC, gram ASC
    LIMIT {TOP_SPANS}
""",
    "t76_substr_doc_pairs": f"""
    WITH {_G_CTES},
    perdoc AS (SELECT DISTINCT doc_id, h FROM g),
    kept AS (
        SELECT h FROM perdoc GROUP BY h HAVING count(*) <= {DF_CAP}
    ),
    capped AS (SELECT p.doc_id, p.h FROM perdoc p JOIN kept USING (h)),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared
        FROM capped a JOIN capped b
          ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SHARED}
    )
    SELECT doc_a, doc_b, shared FROM pairs
    ORDER BY shared DESC, doc_a ASC, doc_b ASC
    LIMIT {TOP_PAIRS}
""",
}


ORACLE["t76_substr_span_histogram"] = f"""
    WITH {_G_CTES},
    dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
    seeds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
    flags AS (
        SELECT doc_id, pos,
               CASE WHEN prev_end IS NULL OR pos > prev_end
                    THEN 1 ELSE 0 END AS is_start
        FROM (
            SELECT doc_id, pos,
                   MAX(pos + {K_SUB}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_end
            FROM seeds
        )
    ),
    runs AS (
        SELECT doc_id, pos,
               SUM(is_start) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS run_id
        FROM flags
    ),
    spans AS (
        SELECT doc_id, run_id,
               MAX(pos) + {K_SUB} - MIN(pos) AS span_tokens
        FROM runs GROUP BY 1, 2
    )
    SELECT CAST(span_tokens AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(SUM(span_tokens) AS BIGINT) AS total_tokens
    FROM spans GROUP BY 1 ORDER BY 1
"""

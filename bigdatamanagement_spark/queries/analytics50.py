"""Winnowing fingerprint pack (T68): MOSS-style positional document
fingerprinting (Schleimer, Wilkerson & Aiken, SIGMOD 2003) over the
documents corpus — per-source fingerprint density, the df-capped
candidate-pair enumeration, and containment top-k. Every query is a
cross-engine oracle: the whole pipeline is lead()/frame-min window SQL
plus a portable md5-slice hash, so the DuckDB mirror is the identical
algorithm, not an approximation.

Reference anchors (SURVEY §2): the dedup family's fingerprint unit —
upgrades ``text.fingerprint`` (1-hash whole-doc winnowing) to the
positional windowed scheme whose guarantee is LOCAL: any shared run of
k+w-1 words yields at least one identical selected fingerprint in both
documents (k=4, w=4 here, so 7-word shared runs are always caught).

Scale notes (100 TB):
- gram hashing + winnowing ride ONE doc_id-keyed exchange (both
  windows share the (doc_id, pos) sort); per-doc window state is w
  hashes;
- the fingerprint table is ~2/(w+1) of the gram count — the ETL-time
  artifact, written bucketed by fp;
- pair enumeration is fp-keyed (the LSH band-join shape) with a
  document-frequency cap (16) bounding any bucket's fan-out; the cap
  drops boilerplate fingerprints identically on both engines;
- containment's per-doc fingerprint counts come from the same
  fingerprint table (one extra doc-keyed aggregate), and the top-k is
  orderBy+limit (TakeOrderedAndProject), never a global window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.winnow import (
    K_WORDS,
    W_WINDOW,
    candidate_pairs,
    winnow_fingerprints,
)
from bigdatamanagement_spark.session import session_key

DF_CAP = 16
MIN_SHARED = 2
TOPK = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


# The fingerprint table is the shared substrate of t68b, t68c, and
# t70c (analytics52's cross-source leakage): materialize once per
# (session, corpus) — at 100 TB this is the ETL-time table written
# bucketed by fp (same move as the MinHash band index).
_FPS_MEMO: dict[tuple[str, str], DataFrame] = {}
# Checkpointed DataFrames pin executor/disk blocks; bound the memo so a
# long-lived multi-corpus session cannot accumulate them without limit.
# Dropping the reference lets Spark's ContextCleaner reclaim the blocks.
_FPS_MEMO_CAP = 4


def _fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamanagement_spark import cache

    key = (session_key(spark), sf_dir)
    if key not in _FPS_MEMO:
        while len(_FPS_MEMO) >= _FPS_MEMO_CAP:
            _FPS_MEMO.pop(next(iter(_FPS_MEMO)))
        _FPS_MEMO[key] = cache.persistent_df(
            spark,
            "winnow_fingerprints",
            sf_dir,
            ("documents",),
            f"k={K_WORDS} w={W_WINDOW} v1",
            lambda: winnow_fingerprints(
                _docs(spark, sf_dir), "doc_id", "text", K_WORDS, W_WINDOW
            ),
        )
    return _FPS_MEMO[key]


def winnow_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T68a — per source: docs, total selected fingerprints, distinct
    fingerprint values, mean fingerprints per doc (micro), and selected
    density vs the gram stream in ppm (expected ~2/(w+1) = 400000 for
    w=4). Docs too short for one complete window still count in
    n_docs."""
    d = _docs(spark, sf_dir)
    fps = _fps(spark, sf_dir).join(
        d.select("doc_id", "source"), "doc_id"
    )
    per_source_fp = fps.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.count_distinct("fp").alias("n_distinct_fps"),
    )
    # gram-stream size per source: tokens - (k-1) complete grams per doc
    per_source_doc = d.select(
        "source",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_toks"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(F.col("n_toks") - (K_WORDS - 1), F.lit(0))
        ).alias("n_grams"),
    )
    return (
        per_source_doc.join(per_source_fp, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_fps", F.lit(0)).alias("n_fps"),
            F.coalesce("n_distinct_fps", F.lit(0)).alias("n_distinct_fps"),
            F.expr("coalesce(n_fps, 0) * 1000000 DIV n_docs").alias(
                "fps_per_doc_micro"
            ),
            F.expr("coalesce(n_fps, 0) * 1000000 DIV n_grams").alias(
                "density_ppm"
            ),
        )
        .orderBy("source")
    )


def winnow_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T68b — doc pairs sharing >= MIN_SHARED df-capped fingerprints,
    strongest first (shared desc, then ids), top 100."""
    return (
        candidate_pairs(_fps(spark, sf_dir), DF_CAP, MIN_SHARED)
        .orderBy(F.desc("shared"), "doc_a", "doc_b")
        .limit(100)
    )


def winnow_containment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T68c — top-50 pairs by fingerprint containment
    shared * 1e6 DIV min(|fp_a|, |fp_b|) (ppm), over the df-capped
    shared counts; a doc fully contained in another scores ~1e6."""
    fps = _fps(spark, sf_dir)
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = candidate_pairs(fps, DF_CAP, MIN_SHARED)
    return (
        pairs.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_fp", "n_fp_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_fp", "n_fp_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.expr("shared * 1000000 DIV least(n_fp_a, n_fp_b)").alias(
                "containment_ppm"
            ),
        )
        .orderBy(F.desc("containment_ppm"), F.desc("shared"), "doc_a", "doc_b")
        .limit(TOPK)
    )


QUERIES = {
    "t68_winnow_fingerprint_stats": winnow_fingerprint_stats,
    "t68_winnow_candidate_pairs": winnow_candidate_pairs,
    "t68_winnow_containment_topk": winnow_containment_topk,
}

# Shared oracle CTEs: the IDENTICAL algorithm in DuckDB SQL — parallel
# unnest zips tokens with 0-based positions, lead() builds the k-gram,
# the md5 hex slice is the portable 60-bit hash, and the frame min +
# count guard is the winnowing window.
_FP_CTES = f"""
    toked AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok,
               unnest(range(0, len(regexp_split_to_array(lower(trim(text)),
                                                         '\\s+')))) AS pos
        FROM documents
    ),
    grams AS (
        SELECT doc_id, pos,
               tok || ' ' || lead(tok, 1) OVER w || ' ' ||
               lead(tok, 2) OVER w || ' ' || lead(tok, 3) OVER w AS gram
        FROM toked
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    hashed AS (
        SELECT doc_id, pos,
               ('0x' || substring(md5(gram), 1, 15))::BIGINT AS h
        FROM grams
    ),
    winmin AS (
        SELECT doc_id,
               min(h) OVER v AS fp,
               count(h) OVER v AS n_in_win
        FROM hashed
        WINDOW v AS (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {W_WINDOW - 1} FOLLOWING)
    ),
    fps AS (
        SELECT DISTINCT doc_id, fp FROM winmin WHERE n_in_win = {W_WINDOW}
    )
"""

_PAIR_CTES = f"""
    kept AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {DF_CAP}
    ),
    capped AS (
        SELECT f.doc_id, f.fp FROM fps f JOIN kept USING (fp)
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared
        FROM capped a JOIN capped b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SHARED}
    )
"""

ORACLE = {
    "t68_winnow_fingerprint_stats": f"""
        WITH {_FP_CTES},
        per_fp AS (
            SELECT d.source,
                   count(*) AS n_fps,
                   count(DISTINCT f.fp) AS n_distinct_fps
            FROM fps f JOIN documents d USING (doc_id)
            GROUP BY 1
        ),
        per_doc AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(greatest(len(regexp_split_to_array(lower(trim(text)),
                                                               '\\s+'))
                                     - {K_WORDS - 1}, 0)) AS BIGINT) AS n_grams
            FROM documents GROUP BY 1
        )
        SELECT d.source,
               d.n_docs,
               coalesce(p.n_fps, 0) AS n_fps,
               coalesce(p.n_distinct_fps, 0) AS n_distinct_fps,
               CAST(coalesce(p.n_fps, 0) * 1000000 // d.n_docs AS BIGINT)
                   AS fps_per_doc_micro,
               CAST(coalesce(p.n_fps, 0) * 1000000 // d.n_grams AS BIGINT)
                   AS density_ppm
        FROM per_doc d LEFT JOIN per_fp p USING (source)
        ORDER BY d.source
    """,
    "t68_winnow_candidate_pairs": f"""
        WITH {_FP_CTES},
        {_PAIR_CTES}
        SELECT doc_a, doc_b, shared
        FROM pairs
        ORDER BY shared DESC, doc_a, doc_b
        LIMIT 100
    """,
    "t68_winnow_containment_topk": f"""
        WITH {_FP_CTES},
        {_PAIR_CTES},
        sizes AS (
            SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1
        )
        SELECT p.doc_a, p.doc_b, p.shared,
               p.shared * 1000000 // least(sa.n_fp, sb.n_fp)
                   AS containment_ppm
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
        ORDER BY containment_ppm DESC, p.shared DESC, p.doc_a, p.doc_b
        LIMIT {TOPK}
    """,
}

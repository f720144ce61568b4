"""DSIR importance-resampling pack (T69): Data Selection via
Importance Resampling (Xie et al., NeurIPS 2023, arXiv:2302.03169)
over the documents corpus — hashed-bigram bag features, per-bucket
target/raw log-probability ratios under add-1 smoothing, per-document
importance weights, and the deterministic top-quartile selection
readout. The target distribution is the English slice (lang = 'en');
the raw distribution is the whole corpus, so selection rates per
language are the pack's verifiable signal (English must dominate).

Determinism note: the paper samples with Gumbel noise; this engine
ranks by the exact integer weight with doc_id tiebreak instead —
reproducible under any partitioning, which Gumbel top-k is not
without seeding discipline. Weights are exact micro-nat integers:
each bucket's two log terms are rounded once each
(round(1e6*ln(p), 0) — the t66 discipline), so Spark and DuckDB sum
identical longs in any order.

Scale notes (100 TB):
- bigram buckets ride the ONE doc-keyed exchange (posexplode + lead,
  the t68 shape); the bucket id is a row-level md5-slice mod B;
- the log-ratio table is at most B = 4096 rows — a broadcast — so
  per-doc weighting is scan + broadcast-join + doc-keyed sum, never a
  shuffle of the occurrence stream beyond the gram window's;
- the top-quartile cut is the two-phase distributed global rank
  (range repartition + broadcast offsets), never a bare global
  window; at 100 TB you'd materialize (doc_id, weight) at ETL time
  and re-cut at any quantile without recomputing features.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.rank import global_row_number
from bigdatamanagement_spark.operators.text import tokens

N_BUCKETS = 4096
TARGET_LANG = "en"
TOPK_BUCKETS = 40


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def _bigram_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, bucket): one row per bigram OCCURRENCE,
    bucketed by a 32-bit portable md5-slice mod N_BUCKETS. Pinned on
    return: consumers branch 3-4 ways over it (raw/target/total counts
    + the per-doc weight join), each branch otherwise re-running the
    tokenize + window + md5 pipeline."""
    toked = docs.select(
        "doc_id",
        "lang",
        "source",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = F.concat(F.col("tok"), F.lit(" "), F.lead("tok", 1).over(w))
    return (
        toked.select(
            "doc_id",
            "lang",
            "source",
            (
                F.conv(F.substring(F.md5(bg), 1, 8), 16, 10).cast("long")
                % N_BUCKETS
            ).alias("bucket"),
        )
        .where(F.col("bucket").isNotNull())
        .localCheckpoint()
    )


def _logratio_table(occ: DataFrame) -> DataFrame:
    """(bucket, c_target, c_raw, lr_micro): add-1-smoothed micro-nat
    log ratio ln(p_target) - ln(p_raw) per observed bucket, each term
    rounded once (the t66 discipline)."""
    raw = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        occ.where(F.col("lang") == TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_target"))
    )
    tot = occ.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("lang") == TARGET_LANG, 1)).alias("n_target"),
    )

    def _term(c: Column, n: Column) -> Column:
        p = (c + 1).cast("double") / (n + F.lit(N_BUCKETS)).cast("double")
        return F.round(F.lit(1000000.0) * F.log(p), 0).cast("long")

    return (
        raw.join(tgt, "bucket", "left")
        .join(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce("c_target", F.lit(0)).cast("long").alias("c_target"),
            F.col("c_raw").cast("long").alias("c_raw"),
            (
                _term(F.coalesce(F.col("c_target"), F.lit(0)), F.col("n_target"))
                - _term(F.col("c_raw"), F.col("n_raw"))
            ).alias("lr_micro"),
        )
    )


def _doc_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, w_micro): per-doc importance weight =
    sum of bucket log ratios over bigram occurrences; docs with < 2
    tokens weigh 0."""
    occ = _bigram_buckets(docs)
    lr = _logratio_table(occ)
    per_doc = (
        occ.join(F.broadcast(lr.select("bucket", "lr_micro")), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lr_micro").cast("long").alias("w"))
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce("w", F.lit(0)).cast("long").alias("w_micro"),
        )
    )


def dsir_bucket_logratio_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T69a — the TOPK_BUCKETS most target-like hashed-bigram buckets:
    (bucket, c_target, c_raw, lr_micro), lr desc, bucket tiebreak."""
    lr = _logratio_table(_bigram_buckets(_docs(spark, sf_dir)))
    return lr.orderBy(F.desc("lr_micro"), "bucket").limit(TOPK_BUCKETS)


def dsir_doc_weights_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T69b — per source: doc count and the sum / min / max importance
    weight (micro-nats). Integer sums, no division — weights are
    signed."""
    w = _doc_weights(_docs(spark, sf_dir))
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w_micro").cast("long").alias("sum_w_micro"),
            F.min("w_micro").cast("long").alias("min_w_micro"),
            F.max("w_micro").cast("long").alias("max_w_micro"),
        )
        .orderBy("source")
    )


def dsir_resample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T69c — deterministic top-quartile selection (weight desc, doc_id
    tiebreak; k = n DIV 4) and the per-language selection-rate readout:
    (lang, n_total, n_selected, sel_ppm). The target language's rate
    should dominate — the pack's end-to-end signal."""
    w = _doc_weights(_docs(spark, sf_dir))
    ranked, n = global_row_number(
        w, [F.desc("w_micro"), F.col("doc_id")], "rk"
    )
    k = n // 4
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.count(F.when(F.col("rk") <= k, 1)).cast("long").alias(
                "n_selected"
            ),
        )
        .select(
            "lang",
            "n_total",
            "n_selected",
            F.expr("n_selected * 1000000 DIV n_total").alias("sel_ppm"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "t69_dsir_bucket_logratio_topk": dsir_bucket_logratio_topk,
    "t69_dsir_doc_weights_by_source": dsir_doc_weights_by_source,
    "t69_dsir_resample_rates": dsir_resample_rates,
}

# Shared oracle CTEs — the identical feature hash, smoothing, and
# micro-nat rounding in DuckDB.
_W_CTES = f"""
    toked AS (
        SELECT doc_id, lang, source,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok,
               unnest(range(0, len(regexp_split_to_array(lower(trim(text)),
                                                         '\\s+')))) AS pos
        FROM documents
    ),
    occ0 AS (
        SELECT doc_id, lang, source,
               ('0x' || substring(md5(tok || ' ' ||
                    lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)),
                    1, 8))::BIGINT % {N_BUCKETS} AS bucket
        FROM toked
    ),
    occ AS (SELECT * FROM occ0 WHERE bucket IS NOT NULL),
    tot AS (
        SELECT count(*) AS n_raw,
               count(*) FILTER (lang = '{TARGET_LANG}') AS n_target
        FROM occ
    ),
    lr AS (
        SELECT r.bucket,
               CAST(coalesce(t.c_target, 0) AS BIGINT) AS c_target,
               CAST(r.c_raw AS BIGINT) AS c_raw,
               CAST(round(1000000.0 * ln((coalesce(t.c_target, 0) + 1)
                        / (tot.n_target + {N_BUCKETS}.0)), 0) AS BIGINT)
               - CAST(round(1000000.0 * ln((r.c_raw + 1)
                        / (tot.n_raw + {N_BUCKETS}.0)), 0) AS BIGINT)
                   AS lr_micro
        FROM (SELECT bucket, count(*) AS c_raw FROM occ GROUP BY 1) r
        LEFT JOIN (SELECT bucket, count(*) AS c_target FROM occ
                   WHERE lang = '{TARGET_LANG}' GROUP BY 1) t USING (bucket)
        CROSS JOIN tot
    ),
    doc_w AS (
        SELECT d.doc_id, d.lang, d.source,
               CAST(coalesce(s.w, 0) AS BIGINT) AS w_micro
        FROM documents d
        LEFT JOIN (
            SELECT o.doc_id, CAST(sum(lr.lr_micro) AS BIGINT) AS w
            FROM occ o JOIN lr USING (bucket) GROUP BY 1
        ) s USING (doc_id)
    )
"""

ORACLE = {
    "t69_dsir_bucket_logratio_topk": f"""
        WITH {_W_CTES}
        SELECT bucket, c_target, c_raw, lr_micro
        FROM lr
        ORDER BY lr_micro DESC, bucket
        LIMIT {TOPK_BUCKETS}
    """,
    "t69_dsir_doc_weights_by_source": f"""
        WITH {_W_CTES}
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(w_micro) AS BIGINT) AS sum_w_micro,
               CAST(min(w_micro) AS BIGINT) AS min_w_micro,
               CAST(max(w_micro) AS BIGINT) AS max_w_micro
        FROM doc_w
        GROUP BY 1
        ORDER BY 1
    """,
    "t69_dsir_resample_rates": f"""
        WITH {_W_CTES},
        ranked AS (
            SELECT lang,
                   row_number() OVER (ORDER BY w_micro DESC, doc_id) AS rk,
                   count(*) OVER () AS n
            FROM doc_w
        )
        SELECT lang,
               count(*) AS n_total,
               CAST(count(*) FILTER (rk <= n // 4) AS BIGINT) AS n_selected,
               CAST(count(*) FILTER (rk <= n // 4) * 1000000 // count(*)
                    AS BIGINT) AS sel_ppm
        FROM ranked
        GROUP BY 1
        ORDER BY 1
    """,
}

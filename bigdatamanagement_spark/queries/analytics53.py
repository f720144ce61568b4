"""Curriculum-ordering pack (T71): order the corpus best-quality-first
and cut it into fixed-token-budget training shards — the manifest a
curriculum-learning pipeline feeds its loader — plus the best-first
budget readout (what fits in N tokens, per language). Both queries
ride ONE fused two-phase pass (operators/rank.py
global_rank_and_running_sum): exact global row_number AND inclusive
running token sum from a single range-repartition with one
per-partition metadata roundtrip — never a partition-less window, and
never two staged passes.

Ordering is integer-exact: quality (the engine's composite score,
already oracle-equivalent in the t64c pack) is quantized to basis
points BEFORE ranking, with doc_id as the unique tiebreak, so Spark
and DuckDB rank identically to the bit.

Scale notes (100 TB):
- the fused pass shuffles the doc-grain table once by range; per-shard
  output is |corpus tokens| / budget rows — bounded by construction;
- shard assignment is pure arithmetic on the running sum
  ((running - 1) DIV budget), so re-cutting at a different budget
  reuses the ranked materialization without recomputing the order;
- the per-language budget readout aggregates the same ranked frame —
  a second consumer of the one exchange, the t02b discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.rank import global_rank_and_running_sum
from bigdatamanagement_spark.operators.text import quality_score, token_count

SHARD_TOKENS = 4000
TOKEN_BUDGET = 10000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, n_toks, q_bp, rank, running_toks) ordered
    best-quality-first (q_bp desc, doc_id) — one fused two-phase pass."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        token_count(F.col("text")).cast("long").alias("n_toks"),
        F.round(quality_score(F.col("text")) * 10000, 0)
        .cast("long")
        .alias("q_bp"),
    )
    return global_rank_and_running_sum(
        d,
        [F.desc("q_bp"), F.col("doc_id")],
        "n_toks",
        rank_col="rank",
        sum_col="running_toks",
    )


def curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T71a — fixed-token-budget curriculum shards, best-first:
    (shard_id, n_docs, shard_tokens, mean_quality_bp, min_quality_bp,
    max_quality_bp). Shard = (running_toks - 1) DIV SHARD_TOKENS; a
    doc straddling a boundary belongs to the shard its last token
    lands in (standard greedy packing)."""
    r = _ranked(spark, sf_dir).withColumn(
        "shard_id", F.expr(f"(running_toks - 1) DIV {SHARD_TOKENS}").cast("long")
    )
    return (
        r.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("shard_tokens"),
            F.expr("SUM(q_bp) DIV COUNT(*)").cast("long").alias("mean_quality_bp"),
            F.min("q_bp").cast("long").alias("min_quality_bp"),
            F.max("q_bp").cast("long").alias("max_quality_bp"),
        )
        .orderBy("shard_id")
    )


def best_first_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T71b — take documents best-quality-first until TOKEN_BUDGET
    inclusive running tokens; per language: total docs, selected docs,
    selected tokens."""
    r = _ranked(spark, sf_dir).withColumn(
        "sel", (F.col("running_toks") <= TOKEN_BUDGET).cast("int")
    )
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("sel").cast("long").alias("n_selected"),
            F.sum(F.col("sel") * F.col("n_toks")).cast("long").alias(
                "tokens_selected"
            ),
        )
        .orderBy("lang")
    )


QUERIES = {
    "t71_curriculum_shards": curriculum_shards,
    "t71_best_first_budget": best_first_budget,
}

# Quality expression: the t64c/pipeline oracle literal (same constants,
# same ROUND(x, 4)) quantized to basis points; ranking and running sum
# are ANSI window SQL.
_RANK_CTES = """
    qd AS (
        SELECT doc_id, lang, source,
               len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_toks,
               CAST(round(ROUND(0.4 * least(len(regexp_split_to_array(lower(trim(text)), '\\s+')) / 100.0, 1.0)
                   + 0.4 * (len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) * 1.0
                       / greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1))
                   + 0.2 * (1.0 - (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) * 1.0
                       / greatest(length(text), 1)), 4) * 10000, 0) AS BIGINT) AS q_bp
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, source, CAST(n_toks AS BIGINT) AS n_toks, q_bp,
               CAST(sum(n_toks) OVER (ORDER BY q_bp DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_toks
        FROM qd
    )
"""

ORACLE = {
    "t71_curriculum_shards": f"""
        WITH {_RANK_CTES}
        SELECT (running_toks - 1) // {SHARD_TOKENS} AS shard_id,
               count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS shard_tokens,
               CAST(sum(q_bp) // count(*) AS BIGINT) AS mean_quality_bp,
               CAST(min(q_bp) AS BIGINT) AS min_quality_bp,
               CAST(max(q_bp) AS BIGINT) AS max_quality_bp
        FROM ranked
        GROUP BY 1
        ORDER BY 1
    """,
    "t71_best_first_budget": f"""
        WITH {_RANK_CTES}
        SELECT lang,
               count(*) AS n_total,
               CAST(count(*) FILTER (running_toks <= {TOKEN_BUDGET}) AS BIGINT)
                   AS n_selected,
               CAST(coalesce(sum(n_toks)
                    FILTER (running_toks <= {TOKEN_BUDGET}), 0) AS BIGINT)
                   AS tokens_selected
        FROM ranked
        GROUP BY 1
        ORDER BY 1
    """,
}

"""ANN retrieval-quality eval pack (T65): recall@k, MRR, and NDCG of
the FIXED-parameter ANN indexes against the exact top-k under the same
deterministic integer scoring — the eval harness every vector-index
deployment reads before trading recall for speed.

Because the fixed LSH/IVF twins (queries/ann_fixed.py) are exact
integer mechanics, their retrieval QUALITY is itself deterministic and
SQL-expressible — so unlike the trained-index recall tests (pytest
only), these metrics sit under the cross-engine oracle gate.

Scale notes (100 TB):
- the exact baseline is the bounded-query-set cosine scan (|Q| = 32
  broadcast against the corpus — the cosine_topk shape); never
  corpus×corpus.
- recall/MRR are integer folds over the joined top-10 lists
  (|Q|·k rows); NDCG's log2 enters once through a shared expression,
  per-position terms floored to micro before the BIGINT sum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.queries.ann_fixed import (
    _COS_MICRO,
    _SQL_BASE,
    TOPK,
    _lsh_oracle,
    _ivf_oracle,
    _quantized,
    ivf_ann_topk_fixed,
    lsh_ann_topk_fixed,
)
from bigdatamanagement_spark.queries.extensions import TOPK_QUERY_IDS


def _exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k under the SAME micro-cosine scoring the fixed indexes
    rank by: broadcast the 32 query vectors against the corpus."""
    base = _quantized(spark, sf_dir).filter(F.col("nrm") > 0)
    q = base.filter(F.col("vec_id") < TOPK_QUERY_IDS).select(
        F.col("vec_id").alias("query_id"),
        F.col("vq").alias("qv"),
        F.col("nrm").alias("nq"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("nrm").alias("nc"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0L, (a, x) -> a + x)"
            ).alias("dot"),
            "nq",
            "nc",
        )
        .select("query_id", "neighbor_id", F.expr(_COS_MICRO).alias("cos_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
    )


def _quality(
    spark: SparkSession, sf_dir: str, approx: DataFrame, method: str
) -> DataFrame:
    """Per-query recall@k, MRR of the exact-best neighbor, and NDCG@k
    (gains = exact micro-cosines; log2 via one shared expression)."""
    # Pinned: the exact top-k (a 32x|corpus| brute-force scan + window,
    # reduced to <=320 rows) feeds both the hits join and the IDCG
    # branch — un-pinned it re-ran once per reference.
    exact = _exact_topk(spark, sf_dir).localCheckpoint()
    hits = approx.select(
        "query_id", "neighbor_id", F.col("rank").alias("a_rank")
    ).join(
        exact.select("query_id", "neighbor_id", F.col("rank").alias("e_rank"),
                     "cos_micro"),
        ["query_id", "neighbor_id"],
        "inner",
    )
    # DCG over retrieved items that are true top-k, at their retrieved
    # positions; IDCG over the exact list at exact positions
    dcg_term = (
        "CAST(floor(CAST(cos_micro AS DOUBLE)"
        " / (ln(CAST(a_rank + 1 AS DOUBLE)) / ln(2.0))) AS BIGINT)"
    )
    idcg_term = (
        "CAST(floor(CAST(cos_micro AS DOUBLE)"
        " / (ln(CAST(rank + 1 AS DOUBLE)) / ln(2.0))) AS BIGINT)"
    )
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min(F.when(F.col("e_rank") == 1, F.col("a_rank")))
        .cast("long")
        .alias("best_at"),
        F.sum(F.expr(dcg_term)).cast("long").alias("dcg_micro"),
    )
    ideal = exact.groupBy("query_id").agg(
        F.sum(F.expr(idcg_term)).cast("long").alias("idcg_micro"),
        F.count(F.lit(1)).cast("long").alias("n_exact"),
    )
    return (
        ideal.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.lit(method).alias("method"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                f"(COALESCE(n_hits, 0) * 10000) DIV {TOPK}"
            ).cast("long").alias("recall_bp"),
            F.expr(
                "CASE WHEN best_at IS NULL THEN 0"
                " ELSE 1000000 DIV best_at END"
            ).cast("long").alias("rr_micro"),
            F.expr(
                "CASE WHEN idcg_micro > 0 THEN"
                " (COALESCE(dcg_micro, 0) * 10000) DIV idcg_micro"
                " ELSE 0 END"
            ).cast("long").alias("ndcg_bp"),
        )
        .orderBy("query_id")
    )


def cosine_topk_exact_micro(spark, sf_dir) -> DataFrame:
    """T65c — the EXACT brute-force cosine top-10 itself, under the
    integer micro-cosine scoring (floor(1e6·dot/sqrt(nq·nc)), ties by
    neighbor id) — the oracle-checkable face of ext_cosine_topk (whose
    float-cosine ranking is engine-order-sensitive and therefore
    rows-only). Broadcast 32 queries against the corpus; per-query
    top-10.

    Scale: |Q|·corpus scored in one scan with the query side broadcast;
    the per-query window ranks |Q| bounded partitions."""
    return _exact_topk(spark, sf_dir).select(
        "query_id", "rank", "neighbor_id", "cos_micro"
    ).orderBy("query_id", "rank")


def lsh_retrieval_quality(spark, sf_dir) -> DataFrame:
    """T65a — recall@10 / MRR / NDCG@10 of the fixed-plane LSH index
    against the exact integer-cosine top-10, per query."""
    return _quality(
        spark, sf_dir, lsh_ann_topk_fixed(spark, sf_dir), "lsh_fixed"
    )


def ivf_retrieval_quality(spark, sf_dir) -> DataFrame:
    """T65b — the same eval for the fixed-centroid IVF index."""
    return _quality(
        spark, sf_dir, ivf_ann_topk_fixed(spark, sf_dir), "ivf_fixed"
    )


QUERIES = {
    "t65_cosine_topk_exact_micro": cosine_topk_exact_micro,
    "t65_lsh_retrieval_quality": lsh_retrieval_quality,
    "t65_ivf_retrieval_quality": ivf_retrieval_quality,
}


def _sql_exact_topk() -> str:
    """Exact top-k CTE chain under the shared scoring (composes after
    _SQL_BASE's base/nz CTEs)."""
    return f"""
    eq AS (SELECT vec_id AS query_id, vq AS qv, nrm AS nq
           FROM nz WHERE vec_id < {TOPK_QUERY_IDS}),
    escored AS (
        SELECT eq.query_id, c.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> eq.qv[i] * c.vq[i])) AS BIGINT) AS dot,
               eq.nq, c.nrm AS nc
        FROM eq JOIN nz c ON c.vec_id <> eq.query_id
    ),
    exact AS (
        SELECT query_id, neighbor_id, cos_micro,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
        FROM (SELECT query_id, neighbor_id, {_COS_MICRO} AS cos_micro
              FROM escored)
        QUALIFY rank <= {TOPK}
    )
"""


def _quality_oracle(approx_sql: str, method: str) -> str:
    # the fixed-index oracle is embedded whole as the `approx` CTE body
    # (a CTE body may carry its own WITH chain); base/nz then rebuild at
    # top level for the exact side — same text, disjoint scope
    return f"""
    WITH approx AS ({approx_sql}),
    {_SQL_BASE.strip().removeprefix("WITH")},
    {_sql_exact_topk().strip()},
    hits AS (
        SELECT a.query_id, a.neighbor_id, a.rank AS a_rank,
               e.rank AS e_rank, e.cos_micro
        FROM approx a JOIN exact e
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    ),
    per_q AS (
        SELECT query_id,
               CAST(COUNT(*) AS BIGINT) AS n_hits,
               CAST(MIN(CASE WHEN e_rank = 1 THEN a_rank END) AS BIGINT)
                   AS best_at,
               CAST(SUM(CAST(floor(CAST(cos_micro AS DOUBLE)
                    / (ln(CAST(a_rank + 1 AS DOUBLE)) / ln(2.0)))
                    AS BIGINT)) AS BIGINT) AS dcg_micro
        FROM hits GROUP BY query_id
    ),
    ideal AS (
        SELECT query_id,
               CAST(SUM(CAST(floor(CAST(cos_micro AS DOUBLE)
                    / (ln(CAST(rank + 1 AS DOUBLE)) / ln(2.0)))
                    AS BIGINT)) AS BIGINT) AS idcg_micro,
               CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM exact GROUP BY query_id
    )
    SELECT i.query_id, '{method}' AS method,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST((COALESCE(p.n_hits, 0) * 10000) // {TOPK} AS BIGINT)
               AS recall_bp,
           CAST(CASE WHEN p.best_at IS NULL THEN 0
                ELSE 1000000 // p.best_at END AS BIGINT) AS rr_micro,
           CAST(CASE WHEN i.idcg_micro > 0 THEN
                (COALESCE(p.dcg_micro, 0) * 10000) // i.idcg_micro
                ELSE 0 END AS BIGINT) AS ndcg_bp
    FROM ideal i LEFT JOIN per_q p USING (query_id)
    ORDER BY i.query_id
"""


ORACLE = {
    "t65_cosine_topk_exact_micro": f"""
    {_SQL_BASE},
    {_sql_exact_topk().strip()}
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_micro
    FROM exact ORDER BY query_id, rank
""",
    "t65_lsh_retrieval_quality": _quality_oracle(_lsh_oracle(), "lsh_fixed"),
    "t65_ivf_retrieval_quality": _quality_oracle(_ivf_oracle(), "ivf_fixed"),
}

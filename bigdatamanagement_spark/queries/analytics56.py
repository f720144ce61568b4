"""Multi-probe LSH pack (T74; Lv et al., VLDB 2007): instead of more
hash tables, each query ALSO probes the buckets reached by flipping
its lowest-margin hyperplane bits — the standard recall/cost knob of
production LSH. Built on the fixed-plane twin (queries/ann_fixed.py),
so probe construction, candidate union, and the micro-cosine re-rank
are exact integer arithmetic both engines reproduce bit-for-bit:
margins are exact BIGINT |projections|, the flip set is the P = 2
smallest margins per (query, table) with bit-index tiebreak, and the
probe bucket is an integer XOR.

Two queries: the multi-probe top-10 itself, and the GAIN readout —
per query, candidate counts and recall@10 against the exact
micro-cosine list for single-probe vs multi-probe (multi-probe must
dominate: superset candidates, recall at least equal — pinned).

Scale notes (100 TB):
- the corpus side is untouched (base buckets only — written bucketed
  by (tbl, bucket) at scale); multi-probe multiplies only the QUERY
  side by 1 + P probes per table, the whole point of the technique
  (Lv et al. §1: fewer tables, same recall);
- margins fall out of the projections already computed for the
  bucket bits — no extra scan;
- the exact leg is the bounded-query-set calibration (32 queries x
  corpus), the same brute-force-as-oracle discipline as t65.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.queries.ann_fixed import (
    _COS_MICRO,
    _SQL_BASE,
    _one_row_param_df,
    _quantized,
    ANN_PARAMS_DIR,
    DIM,
    N_PLANES,
    N_TABLES,
    TOPK,
)
from bigdatamanagement_spark.queries.extensions import TOPK_QUERY_IDS

P_FLIPS = 2


def _tabled_with_projs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, vq, nrm, tbl, bucket, projs): per (vector, table) the
    bucket AND the raw projection array (margins come free). The planes
    arrive as broadcast DATA (pm[tbl][j][dim]) from the shared parquet
    fixture — same integers as the literal era, tiny expression tree."""
    base = _quantized(spark, sf_dir).filter(F.col("nrm") > 0).join(
        F.broadcast(_one_row_param_df(spark, "planes"))
    )
    structs = (
        f"transform(sequence(0, {N_TABLES - 1}), t ->"
        " named_struct('tbl', CAST(t AS BIGINT), 'projs',"
        " transform(pm[t], pl -> aggregate(zip_with(vq, pl,"
        " (x, y) -> x * y), 0L, (a, x) -> a + x))))"
    )
    ex = base.select(
        "vec_id",
        "vq",
        "nrm",
        F.explode(F.expr(structs)).alias("s"),
    )
    bucket = " + ".join(
        f"(CASE WHEN s.projs[{j}] > 0 THEN CAST({1 << j} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for j in range(N_PLANES)
    )
    return ex.select(
        "vec_id",
        "vq",
        "nrm",
        F.col("s.tbl").alias("tbl"),
        F.expr(f"({bucket})").alias("bucket"),
        F.col("s.projs").alias("projs"),
    )


def _tabled_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket table WITHOUT the vector payload, pinned once:
    (vec_id, nrm, tbl, bucket, projs). Both queries branch over the
    tabled projections 2-5 times (corpus side, single/multi probe
    sides, candidate legs); un-pinned, every branch re-ran the
    projection pipeline, and carrying vq (64 longs, 8x per vector)
    through the checkpoint and the bucket join shipped ~46 MB per run.
    Vectors re-attach per candidate AFTER the (query, neighbor) dedup
    — heavy bytes move once, decisions ride on ids (guide §8)."""
    return (
        _tabled_with_projs(spark, sf_dir)
        .drop("vq")
        .localCheckpoint()
    )


def _query_probes(tab: DataFrame, multi: bool) -> DataFrame:
    """(query_id, nq, tbl, bucket): the probe set — base buckets, plus
    (when ``multi``) the P_FLIPS lowest-|margin| bit flips per
    (query, table)."""
    q = tab.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    base = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("nrm").alias("nq"),
        "tbl",
        "bucket",
    )
    if not multi:
        return base
    jm = q.select(
        "vec_id",
        "nrm",
        "tbl",
        "bucket",
        F.posexplode("projs").alias("j", "p"),
    )
    w = Window.partitionBy("vec_id", "tbl").orderBy(F.abs("p"), F.col("j"))
    flips = (
        jm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= P_FLIPS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("nrm").alias("nq"),
            "tbl",
            F.expr("bucket ^ shiftleft(CAST(1 AS BIGINT), j)").alias("bucket"),
        )
    )
    return base.unionByName(flips)


def _topk_from_probes(
    spark: SparkSession, sf_dir: str, tab: DataFrame, probes: DataFrame
) -> DataFrame:
    corpus = tab.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("nrm").alias("nc"),
        "tbl",
        "bucket",
    )
    # ids-only candidate join + dedup; nq/nc are functionally dependent
    # on the ids so the surviving row's values are identical either way
    cand = (
        probes.join(corpus, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "nq", "neighbor_id", "nc")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    vecs = (
        _quantized(spark, sf_dir)
        .filter(F.col("nrm") > 0)
        .select("vec_id", "vq")
    )
    qv = F.broadcast(
        vecs.filter(F.col("vec_id") < TOPK_QUERY_IDS).select(
            F.col("vec_id").alias("query_id"), F.col("vq").alias("qv")
        )
    )
    cv = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vq").alias("cv")
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
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
        .select("query_id", "rank", "neighbor_id", "cos_micro")
    )


def multiprobe_lsh_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext — multi-probe hyperplane-LSH top-10 with literal planes:
    base bucket + P = 2 lowest-margin bit flips per (query, table)."""
    tab = _tabled_slim(spark, sf_dir)
    return _topk_from_probes(
        spark, sf_dir, tab, _query_probes(tab, multi=True)
    ).orderBy("query_id", "rank")


def multiprobe_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T74 — per query: candidate-set sizes and recall@10 (basis
    points vs the exact micro-cosine list) for single-probe vs
    multi-probe. Multi-probe candidates are a superset by
    construction, so cand_multi >= cand_single and recall can only
    improve — the knob the technique sells."""
    tab = _tabled_slim(spark, sf_dir)
    corpus = tab.select(
        F.col("vec_id").alias("neighbor_id"), "tbl", "bucket"
    )

    def _cand_counts(multi: bool, out: str) -> DataFrame:
        probes = _query_probes(tab, multi).select("query_id", "tbl", "bucket")
        return (
            probes.join(corpus, ["tbl", "bucket"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    # exact top-10 over the bounded query set (brute calibration leg)
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
    # broadcast the FILTERED query side (vec_id < 32) — left to itself
    # the planner broadcasts whichever side is smaller at this SF, and
    # at 100 TB that must never be the corpus scan
    pairs = F.broadcast(q).join(c, F.col("neighbor_id") != F.col("query_id"))
    exact_scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.expr(
            "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0L, (a, x) -> a + x)"
        ).alias("dot"),
        "nq",
        "nc",
    ).select("query_id", "neighbor_id", F.expr(_COS_MICRO).alias("cos_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id")
    )
    exact10 = (
        exact_scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id")
    )

    def _recall(topk: DataFrame, out: str) -> DataFrame:
        hits = (
            topk.select("query_id", "neighbor_id")
            .join(exact10, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        return hits.select(
            "query_id", (F.col("hits") * 1000).cast("long").alias(out)
        )

    single10 = _topk_from_probes(
        spark, sf_dir, tab, _query_probes(tab, multi=False)
    )
    multi10 = _topk_from_probes(
        spark, sf_dir, tab, _query_probes(tab, multi=True)
    )
    qids = q.select("query_id")
    out = (
        qids.join(_cand_counts(False, "cand_single"), "query_id", "left")
        .join(_cand_counts(True, "cand_multi"), "query_id", "left")
        .join(_recall(single10, "recall_single_bp"), "query_id", "left")
        .join(_recall(multi10, "recall_multi_bp"), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("cand_single", F.lit(0)).cast("long").alias("cand_single"),
            F.coalesce("cand_multi", F.lit(0)).cast("long").alias("cand_multi"),
            F.coalesce("recall_single_bp", F.lit(0))
            .cast("long")
            .alias("recall_single_bp"),
            F.coalesce("recall_multi_bp", F.lit(0))
            .cast("long")
            .alias("recall_multi_bp"),
        )
        .orderBy("query_id")
    )
    return out


QUERIES = {
    "ext_multiprobe_lsh_topk_fixed": multiprobe_lsh_topk_fixed,
    "t74_multiprobe_gain": multiprobe_gain,
}


def _sql_tabled() -> str:
    """CTEs: per (vector, table) projections + bucket, relationally from
    the shared planes parquet (read_parquet — same fixture Spark
    broadcasts)."""
    return f"""planes AS (SELECT tbl, j, coefs
               FROM read_parquet('{ANN_PARAMS_DIR}/planes.parquet')),
    proj AS (
        SELECT n.vec_id, p.tbl, p.j,
               CAST(list_sum(list_transform(range(1, {DIM + 1}),
                    i -> n.vq[i] * p.coefs[i])) AS BIGINT) AS dot
        FROM nz n CROSS JOIN planes p
    ),
    bucketed AS (
        SELECT vec_id, CAST(tbl AS BIGINT) AS tbl,
               CAST(SUM(CASE WHEN dot > 0 THEN (1 << j) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id, tbl
    ),
    tabled AS (
        SELECT n.vec_id, n.vq, n.nrm, b.tbl, b.bucket
        FROM nz n JOIN bucketed b USING (vec_id)
    )"""


_SQL_PROBES = f"""
    qtab AS (
        SELECT vec_id AS query_id, vq AS qv, nrm AS nq, tbl, bucket
        FROM tabled WHERE vec_id < {TOPK_QUERY_IDS}
    ),
    margins AS (
        SELECT q.query_id, q.qv, q.nq, q.tbl, q.bucket, p.j,
               abs(p.dot) AS margin
        FROM qtab q JOIN proj p
          ON p.vec_id = q.query_id AND CAST(p.tbl AS BIGINT) = q.tbl
    ),
    flips AS (
        SELECT query_id, qv, nq, tbl,
               xor(bucket, CAST(1 AS BIGINT) << j) AS bucket
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id, tbl ORDER BY margin, j) AS rn
            FROM margins
        ) WHERE rn <= {P_FLIPS}
    ),
    base_probes AS (
        SELECT query_id, qv, nq, tbl, bucket FROM qtab
    ),
    multi_probes AS (
        SELECT * FROM base_probes UNION ALL SELECT * FROM flips
    )
"""


def _sql_topk(probes_cte: str, name: str) -> str:
    return f"""
    cand_{name} AS (
        SELECT DISTINCT p.query_id, p.qv, p.nq,
               c.vec_id AS neighbor_id, c.vq AS cv, c.nrm AS nc
        FROM {probes_cte} p
        JOIN tabled c USING (tbl, bucket)
        WHERE c.vec_id <> p.query_id
    ),
    ranked_{name} AS (
        SELECT query_id, neighbor_id, cos_micro,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
        FROM (
            SELECT query_id, neighbor_id, {_COS_MICRO} AS cos_micro
            FROM (
                SELECT query_id, neighbor_id,
                       CAST(list_sum(list_transform(range(1, {DIM + 1}),
                            i -> qv[i] * cv[i])) AS BIGINT) AS dot,
                       nq, nc
                FROM cand_{name}
            )
        )
    )
"""


ORACLE = {
    "ext_multiprobe_lsh_topk_fixed": (
        _SQL_BASE
        + ", "
        + _sql_tabled()
        + ", "
        + _SQL_PROBES
        + ", "
        + _sql_topk("multi_probes", "m")
        + f"""
        SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_micro
        FROM ranked_m WHERE rank <= {TOPK}
        ORDER BY query_id, rank
    """
    ),
    "t74_multiprobe_gain": (
        _SQL_BASE
        + ", "
        + _sql_tabled()
        + ", "
        + _SQL_PROBES
        + ", "
        + _sql_topk("base_probes", "s")
        + ", "
        + _sql_topk("multi_probes", "m")
        + f""",
        exact AS (
            SELECT query_id, neighbor_id, {_COS_MICRO} AS cos_micro
            FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       CAST(list_sum(list_transform(range(1, {DIM + 1}),
                            i -> q.vq[i] * c.vq[i])) AS BIGINT) AS dot,
                       q.nrm AS nq, c.nrm AS nc
                FROM nz q JOIN nz c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {TOPK_QUERY_IDS}
            )
        ),
        exact10 AS (
            SELECT query_id, neighbor_id
            FROM (
                SELECT query_id, neighbor_id, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
                FROM exact
            ) WHERE rank <= {TOPK}
        ),
        cs AS (
            SELECT query_id, CAST(count(*) AS BIGINT) AS cand_single
            FROM (SELECT DISTINCT query_id, neighbor_id FROM cand_s)
            GROUP BY 1
        ),
        cm AS (
            SELECT query_id, CAST(count(*) AS BIGINT) AS cand_multi
            FROM (SELECT DISTINCT query_id, neighbor_id FROM cand_m)
            GROUP BY 1
        ),
        rs AS (
            SELECT t.query_id, CAST(count(*) * 1000 AS BIGINT) AS recall_single_bp
            FROM ranked_s t JOIN exact10 e
              ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
            WHERE t.rank <= {TOPK}
            GROUP BY 1
        ),
        rm AS (
            SELECT t.query_id, CAST(count(*) * 1000 AS BIGINT) AS recall_multi_bp
            FROM ranked_m t JOIN exact10 e
              ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
            WHERE t.rank <= {TOPK}
            GROUP BY 1
        ),
        qids AS (
            SELECT DISTINCT vec_id AS query_id FROM nz
            WHERE vec_id < {TOPK_QUERY_IDS}
        )
        SELECT q.query_id,
               coalesce(cs.cand_single, 0) AS cand_single,
               coalesce(cm.cand_multi, 0) AS cand_multi,
               coalesce(rs.recall_single_bp, 0) AS recall_single_bp,
               coalesce(rm.recall_multi_bp, 0) AS recall_multi_bp
        FROM qids q
        LEFT JOIN cs USING (query_id)
        LEFT JOIN cm USING (query_id)
        LEFT JOIN rs USING (query_id)
        LEFT JOIN rm USING (query_id)
        ORDER BY q.query_id
    """
    ),
}

"""IVF-PQ composed index pack (T75; Jégou, Douze & Schmid, TPAMI
2011 — the IVFADC system): coarse-quantize every vector to its
nearest IVF centroid, PQ-encode the RESIDUAL (vector minus centroid)
against per-subspace codebooks, and answer queries by probing the
NPROBE nearest cells with asymmetric-distance (ADC) scoring of the
stored codes. This composes the two oracle-checked fixed twins
(ann_fixed: IVF cells, PQ codebooks) into the full production index —
every stage exact BIGINT arithmetic both engines mirror bit-for-bit
(micro-quantized vectors, literal centroids/codebooks from the shared
LCG stream, argmin ties by code id).

Deliberately RELATIONAL on both engines: centroids and codebooks are
128-row literal tables; cell assignment, residual encoding, and ADC
are joins + keyed argmins — the shape that lets the corpus side
materialize at ingest as (cell, 8 codes) ≈ 32x smaller than raw
vectors, partitioned by cell so nprobe becomes partition pruning.

Scale notes (100 TB):
- the corpus pays one scan: cell argmin (8-row broadcast), residual,
  per-subspace code argmin (128-row broadcast) — all at ingest;
- a query touches |cell| x nprobe candidates; ADC joins ship
  (cell, m, code) ints against a 16k-row broadcast query table;
- the ADC join is keyed (cell, m, k) — never a cross product; the
  per-candidate fan-out is exactly M = 8 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.queries.ann_fixed import (
    _param_rows,
    _SQL_BASE,
    _quantized,
    ANN_PARAMS_DIR,
    DIM,
    NPROBE,
    PQ_M,
    PQ_SUB,
    TOPK,
)
from bigdatamanagement_spark.queries.extensions import TOPK_QUERY_IDS


def _centroids(spark: SparkSession) -> DataFrame:
    """(cell, cv) from the shared ANN-params parquet fixture — the same
    8 rows the DuckDB oracle read_parquet()s."""
    return spark.createDataFrame(
        [(r["cell"], r["cv"]) for r in _param_rows("centroids")],
        "cell int, cv array<bigint>",
    )


def _codebooks(spark: SparkSession) -> DataFrame:
    """(m, k, cb) from the shared ANN-params parquet fixture — the same
    128 rows the DuckDB oracle read_parquet()s."""
    return spark.createDataFrame(
        [(r["m"], r["k"], r["cb"]) for r in _param_rows("codebooks")],
        "m int, k int, cb array<bigint>",
    )


def _assigned_residuals(spark: SparkSession, sf_dir: str, pred=None) -> DataFrame:
    """(vec_id, cell, res): nearest-centroid cell (exact L2, cell-id
    tiebreak) and the residual vector. ``pred`` (optional Column)
    restricts the encoded rows — the incremental-maintenance path
    (queries/index_layout.py) encodes only the arriving batch."""
    base = _quantized(spark, sf_dir).filter(F.col("nrm") > 0)
    if pred is not None:
        base = base.filter(pred)
    d2 = (
        base.join(F.broadcast(_centroids(spark)))
        .select(
            "vec_id",
            "vq",
            "cell",
            "cv",
            F.expr(
                "aggregate(zip_with(vq, cv, (x, c) -> (x - c) * (x - c)),"
                " 0L, (a, x) -> a + x)"
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cell")
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cell",
            F.expr("zip_with(vq, cv, (x, c) -> x - c)").alias("res"),
        )
    )


def _corpus_codes(spark: SparkSession, sf_dir: str, pred=None) -> DataFrame:
    """(vec_id, cell, m, k): the stored index — per subspace, the
    argmin-L2 codebook entry for the residual (code-id tiebreak)."""
    ar = _assigned_residuals(spark, sf_dir, pred)
    subs = ar.select(
        "vec_id",
        "cell",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> struct(m AS m, slice(res, m * {PQ_SUB} + 1, {PQ_SUB}) AS sub))"
            )
        ).alias("s"),
    ).select("vec_id", "cell", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))
    d2 = subs.join(F.broadcast(_codebooks(spark)), "m").select(
        "vec_id",
        "cell",
        "m",
        "k",
        F.expr(
            "aggregate(zip_with(sub, cb, (x, c) -> (x - c) * (x - c)),"
            " 0L, (a, x) -> a + x)"
        ).alias("d2"),
    )
    return (
        d2.groupBy("vec_id", "cell", "m")
        .agg(F.min(F.struct("d2", "k")).alias("best"))
        .select("vec_id", "cell", "m", F.col("best.k").alias("k"))
    )


def _query_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, cell, m, k, d2q): per probed cell, the query
    residual's full ADC distance table."""
    base = _quantized(spark, sf_dir).filter(F.col("nrm") > 0)
    q = base.filter(F.col("vec_id") < TOPK_QUERY_IDS)
    cd = (
        q.join(F.broadcast(_centroids(spark)))
        .select(
            F.col("vec_id").alias("query_id"),
            "vq",
            "cell",
            "cv",
            F.expr(
                "aggregate(zip_with(vq, cv, (x, c) -> (x - c) * (x - c)),"
                " 0L, (a, x) -> a + x)"
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "cell")
    probed = (
        cd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NPROBE)
        .select(
            "query_id",
            "cell",
            F.expr("zip_with(vq, cv, (x, c) -> x - c)").alias("qres"),
        )
    )
    subs = probed.select(
        "query_id",
        "cell",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> struct(m AS m, slice(qres, m * {PQ_SUB} + 1, {PQ_SUB}) AS sub))"
            )
        ).alias("s"),
    ).select(
        "query_id", "cell", F.col("s.m").alias("m"), F.col("s.sub").alias("sub")
    )
    return subs.join(F.broadcast(_codebooks(spark)), "m").select(
        "query_id",
        "cell",
        "m",
        "k",
        F.expr(
            "aggregate(zip_with(sub, cb, (x, c) -> (x - c) * (x - c)),"
            " 0L, (a, x) -> a + x)"
        ).alias("d2q"),
    )


def ivfpq_ann_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T75 — the composed IVF-PQ (IVFADC) top-10: probe the NPROBE
    nearest cells, ADC-score the stored residual codes, rank by
    (adc asc, neighbor asc). Pure integer index mechanics — the
    DuckDB oracle replays them exactly."""
    codes = _corpus_codes(spark, sf_dir)
    qtab = _query_tables(spark, sf_dir)
    scored = (
        codes.join(F.broadcast(qtab), ["cell", "m", "k"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2q").alias("adc_d2"), F.count(F.lit(1)).alias("nm"))
        .filter(F.col("nm") == PQ_M)
        .select("query_id", "neighbor_id", "adc_d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "neighbor_id", "adc_d2")
        .orderBy("query_id", "rank")
    )


QUERIES = {"ext_ivfpq_ann_topk_fixed": ivfpq_ann_topk_fixed}


_SQL_CENTS = (
    "centroids AS (SELECT cell, cv FROM read_parquet("
    f"'{ANN_PARAMS_DIR}/centroids.parquet'))"
)
_SQL_CBS = (
    "codebooks AS (SELECT m, k, cb FROM read_parquet("
    f"'{ANN_PARAMS_DIR}/codebooks.parquet'))"
)

ORACLE = {
    "ext_ivfpq_ann_topk_fixed": (
        _SQL_BASE
        + f""",
    {_SQL_CENTS},
    {_SQL_CBS},
    celld AS (
        SELECT n.vec_id, n.vq, c.cell, c.cv,
               CAST(list_sum(list_transform(range(1, {DIM + 1}),
                    i -> (n.vq[i] - c.cv[i]) * (n.vq[i] - c.cv[i])))
                    AS BIGINT) AS d2
        FROM nz n CROSS JOIN centroids c
    ),
    assigned AS (
        SELECT vec_id, cell,
               list_transform(range(1, {DIM + 1}), i -> vq[i] - cv[i]) AS res
        FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY d2, cell) AS rn
            FROM celld
        ) WHERE rn = 1
    ),
    csubs AS (
        SELECT a.vec_id, a.cell, m.m AS m,
               list_slice(a.res, m.m * {PQ_SUB} + 1, (m.m + 1) * {PQ_SUB}) AS sub
        FROM assigned a CROSS JOIN (SELECT unnest(range({PQ_M})) AS m) m
    ),
    cd2 AS (
        SELECT s.vec_id, s.cell, s.m, b.k,
               CAST(list_sum(list_transform(range(1, {PQ_SUB + 1}),
                    i -> (s.sub[i] - b.cb[i]) * (s.sub[i] - b.cb[i])))
                    AS BIGINT) AS d2
        FROM csubs s JOIN codebooks b ON b.m = s.m
    ),
    codes AS (
        SELECT vec_id, cell, m, k
        FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, m
                       ORDER BY d2, k) AS rn
            FROM cd2
        ) WHERE rn = 1
    ),
    qcelld AS (
        SELECT * FROM celld WHERE vec_id < {TOPK_QUERY_IDS}
    ),
    probed AS (
        SELECT vec_id AS query_id, cell,
               list_transform(range(1, {DIM + 1}), i -> vq[i] - cv[i]) AS qres
        FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY d2, cell) AS rn
            FROM qcelld
        ) WHERE rn <= {NPROBE}
    ),
    qsubs AS (
        SELECT p.query_id, p.cell, m.m AS m,
               list_slice(p.qres, m.m * {PQ_SUB} + 1, (m.m + 1) * {PQ_SUB}) AS sub
        FROM probed p CROSS JOIN (SELECT unnest(range({PQ_M})) AS m) m
    ),
    qtab AS (
        SELECT s.query_id, s.cell, s.m, b.k,
               CAST(list_sum(list_transform(range(1, {PQ_SUB + 1}),
                    i -> (s.sub[i] - b.cb[i]) * (s.sub[i] - b.cb[i])))
                    AS BIGINT) AS d2q
        FROM qsubs s JOIN codebooks b ON b.m = s.m
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               CAST(sum(q.d2q) AS BIGINT) AS adc_d2,
               count(*) AS nm
        FROM codes c
        JOIN qtab q ON q.cell = c.cell AND q.m = c.m AND q.k = c.k
        WHERE c.vec_id <> q.query_id
        GROUP BY 1, 2
        HAVING count(*) = {PQ_M}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc_d2,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_d2
    FROM ranked WHERE rank <= {TOPK}
    ORDER BY query_id, rank
"""
    ),
}

"""Johnson-Lindenstrauss random-projection pack (T72): project the
64-dim embeddings to m = 16 dimensions with a Rademacher (+/-1) sign
matrix and measure what JL promises — norm concentration per vector
and pairwise-distance distortion — as exact-integer cross-engine
oracles. The sign matrix is DERIVED, not stored: s(r, i) = parity of
an md5 slice of "r_i", so both engines construct the identical matrix
from 1024 range rows (no literals, no RNG state; the Achlioptas 2003
database-friendly construction with a hash in place of the coin).

Embeddings quantize to integer milli-units FIRST (CAST to DOUBLE
before scaling — the t62 float32 trap), so every projection, norm,
and distance below is exact BIGINT arithmetic both engines reproduce
bit-for-bit; the only doubles are gone before the first sum.

Scale notes (100 TB):
- the sign matrix is m x d = 1024 rows — broadcast;
- projection is posexplode (the d-fan every vector op pays) +
  broadcast join + ONE (vec_id, r)-keyed aggregate; at scale the
  projected table materializes at ingest (it is 4x smaller than the
  input at m = 16) and downstream ANN probes it instead of the raw
  vectors;
- the distortion readout samples a deterministic id slice
  (vec_id % 31 = 3) so the pair join is bounded by construction —
  the calibration query, not the scale path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata

M_PROJ = 16
EMB_DIM = 64
Q_SCALE = 1000
SAMPLE_MOD = 31
SAMPLE_RES = 3


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ]


def _signs(spark: SparkSession) -> DataFrame:
    """(r, i, s): the derived Rademacher matrix — one range, no join."""
    return spark.range(M_PROJ * EMB_DIM).select(
        F.expr(f"id DIV {EMB_DIM}").alias("r"),
        (F.col("id") % EMB_DIM).alias("i"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.expr(f"id DIV {EMB_DIM}").cast("string"),
                            (F.col("id") % EMB_DIM).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            * 2
            - 1
        ).alias("s"),
    )


def _occ(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, i, xq): milli-quantized embedding coordinates,
    0-based position."""
    return _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "vec_id",
        "label",
        F.col("i").cast("long").alias("i"),
        F.round(F.col("x").cast("double") * Q_SCALE, 0).cast("long").alias("xq"),
    )


def _projections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, r, p): exact integer projections p_r = sum_i xq_i * s_ri."""
    occ = _occ(spark, sf_dir)
    return (
        occ.join(F.broadcast(_signs(spark)), "i")
        .groupBy("vec_id", "r")
        .agg(F.sum(F.col("xq") * F.col("s")).alias("p"))
    )


def jl_norm_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T72a — per label: vectors and the ppm ratio of the projected
    squared norm (mean over the m rows) to the original squared norm —
    JL says this concentrates at 1e6. Zero vectors are excluded (none
    exist in the corpus; the guard keeps ANSI division total)."""
    occ = _occ(spark, sf_dir)
    n2 = occ.groupBy("vec_id", "label").agg(
        F.sum(F.col("xq") * F.col("xq")).alias("n2")
    )
    p2 = _projections(spark, sf_dir).groupBy("vec_id").agg(
        F.sum(F.col("p") * F.col("p")).alias("p2")
    )
    per_vec = (
        n2.join(p2, "vec_id")
        .where(F.col("n2") > 0)
        .select(
            "label",
            F.expr(f"p2 * 1000000 DIV ({M_PROJ} * n2)").alias("ratio_ppm"),
        )
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr("SUM(ratio_ppm) DIV COUNT(*)").cast("long").alias(
                "mean_ratio_ppm"
            ),
            F.min("ratio_ppm").cast("long").alias("min_ratio_ppm"),
            F.max("ratio_ppm").cast("long").alias("max_ratio_ppm"),
        )
        .orderBy("label")
    )


def jl_pair_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T72b — pairwise distance distortion over the deterministic
    sample slice: histogram of ratio_ppm = (projected squared distance
    * 1e6) DIV (m * original squared distance), bucketed to tenths
    (bucket = ratio_ppm DIV 100000). Identical-vector pairs (zero
    distance) are excluded."""
    occ = _occ(spark, sf_dir).where(
        F.col("vec_id") % SAMPLE_MOD == SAMPLE_RES
    )
    proj = (
        occ.join(F.broadcast(_signs(spark)), "i")
        .groupBy("vec_id", "r")
        .agg(F.sum(F.col("xq") * F.col("s")).alias("p"))
    )
    d2 = (
        occ.alias("a")
        .join(
            occ.alias("b"),
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
        )
        .agg(
            F.sum(
                (F.col("a.xq") - F.col("b.xq"))
                * (F.col("a.xq") - F.col("b.xq"))
            ).alias("d2")
        )
    )
    pd2 = (
        proj.alias("a")
        .join(
            proj.alias("b"),
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
        )
        .agg(
            F.sum(
                (F.col("a.p") - F.col("b.p")) * (F.col("a.p") - F.col("b.p"))
            ).alias("pd2")
        )
    )
    ratios = (
        d2.join(pd2, ["va", "vb"])
        .where(F.col("d2") > 0)
        .select(
            F.expr(f"pd2 * 1000000 DIV ({M_PROJ} * d2)").alias("ratio_ppm")
        )
    )
    return (
        ratios.groupBy(
            F.expr("ratio_ppm DIV 100000").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("ratio_ppm").cast("long").alias("min_ratio_ppm"),
            F.max("ratio_ppm").cast("long").alias("max_ratio_ppm"),
        )
        .orderBy("bucket")
    )


QUERIES = {
    "t72_jl_norm_concentration": jl_norm_concentration,
    "t72_jl_pair_distortion": jl_pair_distortion,
}

_BASE_CTES = f"""
    signs AS (
        SELECT CAST(x // {EMB_DIM} AS BIGINT) AS r,
               CAST(x % {EMB_DIM} AS BIGINT) AS i,
               ('0x' || substring(md5(CAST(x // {EMB_DIM} AS VARCHAR)
                    || '_' || CAST(x % {EMB_DIM} AS VARCHAR)), 1, 8))::BIGINT
                   % 2 * 2 - 1 AS s
        FROM range({M_PROJ * EMB_DIM}) t(x)
    ),
    occ AS (
        SELECT vec_id, label,
               CAST(unnest(range(0, {EMB_DIM})) AS BIGINT) AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * {Q_SCALE}, 0)
                    AS BIGINT) AS xq
        FROM embeddings
    )
"""

ORACLE = {
    "t72_jl_norm_concentration": f"""
        WITH {_BASE_CTES},
        n2 AS (
            SELECT vec_id, label, CAST(sum(xq * xq) AS BIGINT) AS n2
            FROM occ GROUP BY 1, 2
        ),
        proj AS (
            SELECT o.vec_id, s.r, CAST(sum(o.xq * s.s) AS BIGINT) AS p
            FROM occ o JOIN signs s USING (i)
            GROUP BY 1, 2
        ),
        p2 AS (
            SELECT vec_id, CAST(sum(p * p) AS BIGINT) AS p2
            FROM proj GROUP BY 1
        ),
        per_vec AS (
            SELECT n2.label,
                   p2.p2 * 1000000 // ({M_PROJ} * n2.n2) AS ratio_ppm
            FROM n2 JOIN p2 USING (vec_id)
            WHERE n2.n2 > 0
        )
        SELECT label,
               count(*) AS n_vecs,
               CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS mean_ratio_ppm,
               CAST(min(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
               CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm
        FROM per_vec
        GROUP BY 1
        ORDER BY 1
    """,
    "t72_jl_pair_distortion": f"""
        WITH {_BASE_CTES},
        socc AS (
            SELECT * FROM occ WHERE vec_id % {SAMPLE_MOD} = {SAMPLE_RES}
        ),
        proj AS (
            SELECT o.vec_id, s.r, CAST(sum(o.xq * s.s) AS BIGINT) AS p
            FROM socc o JOIN signs s USING (i)
            GROUP BY 1, 2
        ),
        d2 AS (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(sum((a.xq - b.xq) * (a.xq - b.xq)) AS BIGINT) AS d2
            FROM socc a JOIN socc b
              ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        ),
        pd2 AS (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(sum((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS pd2
            FROM proj a JOIN proj b
              ON a.r = b.r AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        ),
        ratios AS (
            SELECT pd2.pd2 * 1000000 // ({M_PROJ} * d2.d2) AS ratio_ppm
            FROM d2 JOIN pd2 USING (va, vb)
            WHERE d2.d2 > 0
        )
        SELECT CAST(ratio_ppm // 100000 AS BIGINT) AS bucket,
               count(*) AS n_pairs,
               CAST(min(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
               CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm
        FROM ratios
        GROUP BY 1
        ORDER BY 1
    """,
}

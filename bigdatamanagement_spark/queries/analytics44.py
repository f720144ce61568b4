"""Embedding representation-health pack (T62): anisotropy (mean
pairwise dot over mean squared norm — the "all vectors point the same
way" pathology contrastive-learning papers warn about), Fisher
separability of the labels (between-class vs within-class scatter —
can these embeddings support the labels at all), and centroid purity
(share of vectors closest to their OWN label centroid — the
classification-free sanity check). All three on exact milli-quantized
integer arithmetic, no numpy anywhere.

Reference anchors (SURVEY §2): the embeddings table's `label` column
was previously only consumed by ext_label_centroids; these entries
make it a first-class evaluation surface next to the ANN family
(cosine/LSH/IVF/PQ) and the per-dim variance health check (ext).

Scale notes (100 TB):
- anisotropy: ONE per-dim sum aggregate (64 rows) + one per-vector
  HOF norm fold — the pairwise sum collapses algebraically to
  ||Σv||² − Σ||v||², so nothing pairwise is ever enumerated.
- Fisher: one (label, dim) moment grid (640 rows); floored milli
  centroids (documented) keep every scatter term exact BIGINT at any
  corpus size.
- purity: posexplode joins the (label, dim) centroid grid — the
  fan-out is n_vectors × dims × labels, linear in the corpus with
  small constants; at 100 TB this is the IVF assignment join shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000

# floor division for signed numerators (b > 0): bare DIV (Spark) and
# // (DuckDB) both truncate toward zero, so this CASE exists to PIN
# floor semantics for negative sums — identical text on both engines
# (the t50 discipline), not to paper over an engine difference
def _fdiv(a: str, b: str) -> str:
    return (
        f"(CASE WHEN {a} >= 0 THEN {a} DIV {b}"
        f" ELSE -((-({a}) + {b} - 1) DIV {b}) END)"
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(
        spark, sf_dir, tables=("embeddings",), register=False
    )["embeddings"]


def _quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, dim, q): milli-quantized components — the exact
    integer substrate all three health checks fold over."""
    e = _emb(spark, sf_dir)
    return e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                # cast to DOUBLE before the multiply: float32 * 1000
                # computed in float32 rounds .5-boundary components
                # differently from DuckDB's double path (first seen at
                # sf0.1 where the corpus is large enough to hit ties)
                "transform(embedding,"
                " v -> CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT))"
            )
        ).alias("dim", "q"),
    )


# --- T62a: anisotropy ------------------------------------------------------------------

_ANISO = (
    "((CAST(s2 AS DOUBLE) - CAST(qq AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))"
    " / (CAST(qq AS DOUBLE) / CAST(n AS DOUBLE)))"
)


def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T62a — embedding anisotropy: mean pairwise dot product over
    mean squared norm, via the algebraic collapse Σ_{i≠j}⟨v_i,v_j⟩ =
    ||Σv||² − Σ||v||² — so the O(n²) pairwise sum folds from ONE
    per-dim sum table (64 rows) and one norm aggregate, all exact
    milli-quantized BIGINTs, ratio in one shared expression. Healthy
    spread representations score near 0; a collapsed cone (every
    vector pointing the same way — the anisotropy pathology) scores
    toward 1, and ANN recall, clustering and cosine thresholds all
    quietly degrade before anything else notices.

    Scale: one narrow explode + 64-row reduce; nothing pairwise."""
    quant = _quant(spark, sf_dir)
    dimsums = quant.groupBy("dim").agg(F.sum("q").alias("sd"))
    s2 = dimsums.agg(
        F.sum(F.col("sd") * F.col("sd")).cast("long").alias("s2")
    )
    norms = quant.agg(
        F.sum(F.col("q") * F.col("q")).cast("long").alias("qq"),
        F.count_distinct("vec_id").cast("long").alias("n"),
    )
    return s2.join(norms).select(
        "n", "s2", "qq", F.expr(_ANISO).alias("anisotropy")
    )


# --- T62b: Fisher separability -----------------------------------------------------------

_FISHER = "(CAST(b_sum AS DOUBLE) / CAST(w_sum AS DOUBLE))"


def fisher_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T62b — Fisher separability of the embedding labels: the ratio
    of between-class scatter Σ_l n_l·||μ_l − μ||² to within-class
    scatter Σ_l Σ_i ||v_i − μ_l||². Centroids floor to milli
    (documented — ≤1 milli per mean), so the between terms are exact
    integers at any corpus size; the within terms use the scale-
    cleared identity (n_l·Q_ld − S_ld²) DIV n_l per (label, dim).
    High ratio ⇒ the labels live in separable regions; near 0 ⇒ these
    embeddings cannot support this labeling and no downstream
    classifier will fix that.

    Scale: one (label, dim) moment grid (|labels|·64 rows); two
    reduces."""
    quant = _quant(spark, sf_dir)
    ld = quant.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("nl"),
        F.sum("q").cast("long").alias("sld"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("qld"),
    )
    d = ld.groupBy("dim").agg(
        F.sum("sld").cast("long").alias("sd"),
        F.sum("nl").cast("long").alias("n"),
    )
    terms = ld.join(F.broadcast(d), "dim").select(
        F.expr(
            f"nl * ({_fdiv('sld', 'nl')} - {_fdiv('sd', 'n')})"
            f" * ({_fdiv('sld', 'nl')} - {_fdiv('sd', 'n')})"
        ).alias("b_term"),
        F.expr("(nl * qld - sld * sld) DIV nl").alias("w_term"),
    )
    agg = terms.agg(
        F.sum("b_term").cast("long").alias("b_sum"),
        F.sum("w_term").cast("long").alias("w_sum"),
    )
    return agg.select(
        "b_sum", "w_sum", F.expr(_FISHER).alias("fisher_ratio")
    )


# --- T62c: centroid purity -----------------------------------------------------------------


def centroid_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T62c — centroid purity: the share of vectors whose NEAREST
    label centroid (milli-floored, exact integer squared-L2) is their
    own label — the classifier-free separability check that directly
    predicts nearest-centroid accuracy. Ties break toward the smaller
    label id (deterministic). Also reports the label-count and the
    per-purity micro share.

    Scale: the component explode joins the broadcast (label, dim)
    centroid grid — n_vectors × dims × labels rows, the IVF
    assignment-join shape; one argmin per vector."""
    quant = _quant(spark, sf_dir).localCheckpoint(eager=True)
    cent = quant.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("cn"),
    ).select(
        "label",
        "dim",
        F.expr(_fdiv("sq", "cn")).alias("c"),
    ).select(
        F.col("label").alias("clabel"), "dim", "c"
    )
    dists = (
        quant.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(F.expr("(q - c) * (q - c)")).cast("long").alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("clabel"))
    assigned = (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("clabel").alias("nearest"),
        )
    )
    return assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.count_distinct("label").cast("long").alias("n_labels"),
        F.sum(
            F.when(F.col("label") == F.col("nearest"), 1).otherwise(0)
        )
        .cast("long")
        .alias("pure"),
    ).select(
        "n_vectors",
        "n_labels",
        "pure",
        F.expr("(pure * 1000000) DIV n_vectors").alias("purity_micro"),
    )


QUERIES = {
    "t62_embedding_anisotropy": embedding_anisotropy,
    "t62_fisher_separability": fisher_separability,
    "t62_centroid_purity": centroid_purity,
}

_QUANT_SQL = """
        quant AS (
            SELECT vec_id, label,
                   g.i - 1 AS dim,
                   CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000, 0)
                        AS BIGINT) AS q
            FROM read_emb,
                 unnest(generate_series(1, len(embedding))) AS g(i)
        )
"""


def _emb_cte(sf_dir_placeholder: str = "") -> str:
    return (
        "read_emb AS (SELECT vec_id, label, embedding FROM embeddings)"
    )


ORACLE = {
    "t62_embedding_anisotropy": f"""
        WITH {_emb_cte()},
        {_QUANT_SQL},
        dimsums AS (
            SELECT dim, CAST(SUM(q) AS BIGINT) AS sd
            FROM quant GROUP BY 1
        ),
        s2 AS (SELECT CAST(SUM(sd * sd) AS BIGINT) AS s2 FROM dimsums),
        norms AS (
            SELECT CAST(SUM(q * q) AS BIGINT) AS qq,
                   CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
            FROM quant
        )
        SELECT n, s2, qq, {_ANISO} AS anisotropy
        FROM s2 CROSS JOIN norms
    """,
    "t62_fisher_separability": f"""
        WITH {_emb_cte()},
        {_QUANT_SQL},
        ld AS (
            SELECT label, dim,
                   CAST(COUNT(*) AS BIGINT) AS nl,
                   CAST(SUM(q) AS BIGINT) AS sld,
                   CAST(SUM(q * q) AS BIGINT) AS qld
            FROM quant GROUP BY 1, 2
        ),
        d AS (
            SELECT dim, CAST(SUM(sld) AS BIGINT) AS sd,
                   CAST(SUM(nl) AS BIGINT) AS n
            FROM ld GROUP BY 1
        ),
        terms AS (
            SELECT nl * ((CASE WHEN sld >= 0 THEN sld // nl ELSE -((-(sld) + nl - 1) // nl) END) - (CASE WHEN sd >= 0 THEN sd // n ELSE -((-(sd) + n - 1) // n) END))
                       * ((CASE WHEN sld >= 0 THEN sld // nl ELSE -((-(sld) + nl - 1) // nl) END) - (CASE WHEN sd >= 0 THEN sd // n ELSE -((-(sd) + n - 1) // n) END)) AS b_term,
                   (nl * qld - sld * sld) // nl AS w_term
            FROM ld JOIN d USING (dim)
        )
        SELECT CAST(SUM(b_term) AS BIGINT) AS b_sum,
               CAST(SUM(w_term) AS BIGINT) AS w_sum,
               {_FISHER} AS fisher_ratio
        FROM terms
    """,
    "t62_centroid_purity": f"""
        WITH {_emb_cte()},
        {_QUANT_SQL},
        cent AS (
            SELECT label AS clabel, dim,
                   (CASE WHEN CAST(SUM(q) AS BIGINT) >= 0 THEN CAST(SUM(q) AS BIGINT) // CAST(COUNT(*) AS BIGINT) ELSE -((-(CAST(SUM(q) AS BIGINT)) + CAST(COUNT(*) AS BIGINT) - 1) // CAST(COUNT(*) AS BIGINT)) END) AS c
            FROM quant GROUP BY 1, 2
        ),
        dists AS (
            SELECT q.vec_id, q.label, cent.clabel,
                   CAST(SUM((q.q - cent.c) * (q.q - cent.c)) AS BIGINT)
                       AS d2
            FROM quant q JOIN cent USING (dim)
            GROUP BY 1, 2, 3
        ),
        assigned AS (
            SELECT vec_id, label, clabel AS nearest
            FROM (
                SELECT *,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2 ASC, clabel ASC)
                           AS rn
                FROM dists
            ) WHERE rn = 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
               CAST(SUM(CASE WHEN label = nearest THEN 1 ELSE 0 END)
                    AS BIGINT) AS pure,
               (SUM(CASE WHEN label = nearest THEN 1 ELSE 0 END)
                * 1000000) // COUNT(*) AS purity_micro
        FROM assigned
    """,
}

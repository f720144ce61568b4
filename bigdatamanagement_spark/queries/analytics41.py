"""Ordered-trend / threshold-tuning / profile-similarity pack (T59):
the Jonckheere-Terpstra test for an ORDERED value trend across the
four day-quarters (the k-group ordered alternative the omnibus
Kruskal-Wallis (t58) dilutes — JT is to KW what Cochran-Armitage
(t53) is to the chi-square), Youden-J optimal threshold tuning of the
weekday-rate purchase scorer (the operating point the exact ROC-AUC
(ext) never picks for you), and the hour-profile cosine similarity
matrix between event types (which behaviors share a daily rhythm —
the behavioral-fingerprint readout).

Reference anchors (SURVEY §2): JT reuses the t26/t58 distinct-value
midrank discipline pairwise; Youden composes the ext ROC machinery
into a decision; profile cosine applies the t19 integer-exact cosine
to the engine's own hourly grids.

Scale notes (100 TB):
- JT: the 6 bucket pairs each fold a Mann-Whitney U from the same
  ONE distinct-value grid (per-bucket counts pivoted); the z is one
  shared expression over exact BIGINT moments.
- Youden: one cumulative pass over the ≤|weekdays| distinct scores;
  J maximized by exact integer cross-multiplication (no rate ever
  divides before the argmax).
- profile cosine: 5 profiles × 24 exact integer counts; dot/norms
  are exact BIGINTs; one shared division per pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_JT_BUCKETS = (0, 1, 2, 3)  # hour DIV 6
_TYPES = ("click", "error", "purchase", "signup", "view")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T59a: Jonckheere-Terpstra ordered trend -------------------------------------------

_JT_PAIRS = [
    (i, j) for i in _JT_BUCKETS for j in _JT_BUCKETS if i < j
]
# JT mean and variance (no tie correction in the variance — documented
# simple form; ties only enter through the 1/2 credit in U)
_JT_EU = (
    "((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - ("
    + " + ".join(f"CAST(n_{b} AS DOUBLE) * CAST(n_{b} AS DOUBLE)"
                 for b in _JT_BUCKETS)
    + ")) / 4.0)"
)
_JT_VAR = (
    "((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
    " * (2.0 * CAST(nn AS DOUBLE) + 3.0) - ("
    + " + ".join(
        f"CAST(n_{b} AS DOUBLE) * CAST(n_{b} AS DOUBLE)"
        f" * (2.0 * CAST(n_{b} AS DOUBLE) + 3.0)"
        for b in _JT_BUCKETS
    )
    + ")) / 72.0)"
)
_JT_Z = f"((CAST(two_u AS DOUBLE) / 2.0 - {_JT_EU}) / sqrt({_JT_VAR}))"


def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T59a — Jonckheere-Terpstra ordered-trend test: does event VALUE
    rise monotonically across the four day-quarters (hours 0-5 <
    6-11 < 12-17 < 18-23)? JT = Σ over ordered bucket pairs of the
    Mann-Whitney U(earlier, later), all six U's folded from ONE
    distinct-value grid with per-bucket counts (ties credit 1/2 —
    carried exact as 2U). The one-degree-of-freedom ordered
    alternative that sees the dawn-to-dusk drift the omnibus KW
    (t58) spreads across three degrees of freedom.

    Scale: one distinct-value aggregate + one cumulative window per
    bucket column on the compressed grid; the z is one shared
    expression."""
    ev = _events(spark, sf_dir)
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    counts = ev.select(
        centi.alias("v"),
        *[
            F.when(F.expr(f"CAST(hour(ts) AS BIGINT) DIV 6 = {b}"), 1)
            .otherwise(0)
            .alias(f"g{b}")
            for b in _JT_BUCKETS
        ],
    ).groupBy("v").agg(
        *[F.sum(f"g{b}").cast("long").alias(f"c{b}") for b in _JT_BUCKETS]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    enriched = counts.select(
        "v",
        *[F.col(f"c{b}") for b in _JT_BUCKETS],
        *[
            F.coalesce(F.sum(f"c{b}").over(w), F.lit(0)).alias(f"cum{b}")
            for b in _JT_BUCKETS
        ],
    )
    # 2*U(i, j) = sum over grid of c_j * (2*cum_i + c_i)  (later group
    # scores wins over earlier values + half-credit on ties)
    two_u = " + ".join(
        f"c{j} * (2 * cum{i} + c{i})" for i, j in _JT_PAIRS
    )
    mom = enriched.agg(
        F.sum(F.expr(two_u)).cast("long").alias("two_u"),
        *[
            F.sum(f"c{b}").cast("long").alias(f"n_{b}")
            for b in _JT_BUCKETS
        ],
    ).withColumn(
        "nn", F.expr(" + ".join(f"n_{b}" for b in _JT_BUCKETS))
    )
    return mom.select(
        "nn",
        *[F.col(f"n_{b}") for b in _JT_BUCKETS],
        "two_u",
        F.expr(_JT_Z).alias("z"),
    )


# --- T59b: Youden-J optimal threshold ----------------------------------------------------

_J_STAT = (
    "(CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE)"
    " - CAST(fp AS DOUBLE) / CAST(neg AS DOUBLE))"
)


def youden_optimal_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T59b — Youden-J optimal operating point for the weekday-rate
    purchase scorer (the t49/t57 model): over every candidate
    threshold (the distinct scores), J = TPR − FPR maximized by the
    EXACT integer cross-multiplication tp·neg − fp·pos (no rate
    divides before the argmax; ties break toward the higher
    threshold). Output: the chosen cutoff with its exact confusion
    counts and J — the number a deployment actually needs, which the
    threshold-free AUC (ext) deliberately integrates away.

    Scale: the candidate grid is ≤|weekdays| distinct scores; one
    cumulative pass gives every threshold's confusion counts."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1996-01-01') % 7"
            " AS BIGINT)"
        ).alias("wd"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    wrate = base.groupBy("wd").agg(
        F.expr("(SUM(y) * 1000000) DIV COUNT(*)").alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_wd"),
        F.sum("y").cast("long").alias("c_wd"),
    )
    # predict positive when score >= threshold; thresholds = distinct
    # scores; cumulative from the highest score down
    wdesc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    nrow = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = (
        wrate.groupBy("score")
        .agg(
            F.sum("n_wd").cast("long").alias("n_s"),
            F.sum("c_wd").cast("long").alias("c_s"),
        )
        .select(
            "score",
            F.sum("n_s").over(wdesc).cast("long").alias("cum_n"),
            F.sum("c_s").over(wdesc).cast("long").alias("cum_c"),
            F.sum("n_s").over(nrow).cast("long").alias("nn"),
            F.sum("c_s").over(nrow).cast("long").alias("pos"),
        )
        .select(
            "score",
            F.col("cum_c").alias("tp"),
            (F.col("cum_n") - F.col("cum_c")).alias("fp"),
            "pos",
            (F.col("nn") - F.col("pos")).alias("neg"),
        )
    )
    wbest = Window.orderBy(
        F.desc(F.expr("tp * neg - fp * pos")), F.desc("score")
    )
    return (
        cand.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("score").alias("cutoff_micro"),
            "tp",
            "fp",
            "pos",
            "neg",
            F.expr(_J_STAT).alias("youden_j"),
        )
    )


# --- T59c: hour-profile similarity matrix --------------------------------------------------

_PROFILE_COS = (
    "(CAST(dot AS DOUBLE)"
    " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))"
)


def type_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T59c — cosine similarity of hourly activity profiles between
    event-type pairs: each type's 24-hour count vector (exact
    integers), pairwise dot products and norms folded as exact
    BIGINTs, ONE shared division per pair. Types that peak together
    (say click and view) score near 1; a type marching to its own
    clock stands out — the behavioral-fingerprint matrix behind
    "should these event streams share a capacity plan" (t51).

    Scale: one (type, hour) grid; the pair fan-out is the 10
    unordered type pairs joined on the hour key."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        "event_type", F.expr("CAST(hour(ts) AS BIGINT)").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = grid.select(
        F.col("event_type").alias("type_a"),
        "h",
        F.col("n").alias("na_h"),
    )
    b = grid.select(
        F.col("event_type").alias("type_b"),
        "h",
        F.col("n").alias("nb_h"),
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.expr("na_h * nb_h")).cast("long").alias("dot"),
        )
    )
    norms = grid.groupBy("event_type").agg(
        F.sum(F.expr("n * n")).cast("long").alias("nsq")
    )
    return (
        pairs.join(
            F.broadcast(
                norms.select(
                    F.col("event_type").alias("type_a"),
                    F.col("nsq").alias("na"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                norms.select(
                    F.col("event_type").alias("type_b"),
                    F.col("nsq").alias("nb"),
                )
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "dot",
            F.expr(_PROFILE_COS).alias("profile_cosine"),
        )
        .orderBy("type_a", "type_b")
    )


QUERIES = {
    "t59_jonckheere_terpstra": jonckheere_terpstra,
    "t59_youden_optimal_cutoff": youden_optimal_cutoff,
    "t59_type_profile_similarity": type_profile_similarity,
}

ORACLE = {
    "t59_jonckheere_terpstra": f"""
        WITH counts AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN CAST(hour(ts) AS BIGINT) // 6"
                       f" = {b} THEN 1 ELSE 0 END) AS BIGINT) AS c{b}"
                       for b in _JT_BUCKETS
                   )}
            FROM events GROUP BY 1
        ),
        enriched AS (
            SELECT v, {", ".join(f"c{b}" for b in _JT_BUCKETS)},
                   {", ".join(
                       f"COALESCE(SUM(c{b}) OVER (ORDER BY v"
                       f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
                       f" 0) AS cum{b}"
                       for b in _JT_BUCKETS
                   )}
            FROM counts
        ),
        mom AS (
            SELECT CAST(SUM({" + ".join(
                       f"c{j} * (2 * cum{i} + c{i})"
                       for i, j in _JT_PAIRS
                   )}) AS BIGINT) AS two_u,
                   {", ".join(
                       f"CAST(SUM(c{b}) AS BIGINT) AS n_{b}"
                       for b in _JT_BUCKETS
                   )}
            FROM enriched
        ),
        mom2 AS (
            SELECT *, {" + ".join(f"n_{b}" for b in _JT_BUCKETS)} AS nn
            FROM mom
        )
        SELECT nn, {", ".join(f"n_{b}" for b in _JT_BUCKETS)}, two_u,
               {_JT_Z} AS z
        FROM mom2
    """,
    "t59_youden_optimal_cutoff": f"""
        WITH base AS (
            SELECT CAST(datediff('day', DATE '1996-01-01',
                                 CAST(ts AS DATE)) % 7 AS BIGINT) AS wd,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        wrate AS (
            SELECT wd, (SUM(y) * 1000000) // COUNT(*) AS score,
                   CAST(COUNT(*) AS BIGINT) AS n_wd,
                   CAST(SUM(y) AS BIGINT) AS c_wd
            FROM base GROUP BY 1
        ),
        cand AS (
            SELECT score,
                   CAST(SUM(SUM(n_wd)) OVER (ORDER BY score DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                   CAST(SUM(SUM(c_wd)) OVER (ORDER BY score DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
                   CAST(SUM(SUM(n_wd)) OVER () AS BIGINT) AS nn,
                   CAST(SUM(SUM(c_wd)) OVER () AS BIGINT) AS pos
            FROM wrate GROUP BY score
        ),
        conf AS (
            SELECT score, cum_c AS tp, cum_n - cum_c AS fp,
                   pos, nn - pos AS neg
            FROM cand
        )
        SELECT score AS cutoff_micro, tp, fp, pos, neg,
               {_J_STAT} AS youden_j
        FROM conf
        QUALIFY row_number() OVER (ORDER BY tp * neg - fp * pos DESC,
                                   score DESC) = 1
    """,
    "t59_type_profile_similarity": f"""
        WITH grid AS (
            SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(SUM(a.n * b.n) AS BIGINT) AS dot
            FROM grid a JOIN grid b ON a.h = b.h
                 AND a.event_type < b.event_type
            GROUP BY 1, 2
        ),
        norms AS (
            SELECT event_type, CAST(SUM(n * n) AS BIGINT) AS nsq
            FROM grid GROUP BY 1
        )
        SELECT p.type_a, p.type_b, p.dot, {_PROFILE_COS} AS profile_cosine
        FROM pairs p
        JOIN (SELECT event_type, nsq AS na FROM norms) x
             ON p.type_a = x.event_type
        JOIN (SELECT event_type, nsq AS nb FROM norms) y
             ON p.type_b = y.event_type
        ORDER BY p.type_a, p.type_b
    """,
}

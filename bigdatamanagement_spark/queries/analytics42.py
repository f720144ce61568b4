"""Distribution-distance pack (T60): the three classical two-sample
distances between the purchase and click value distributions —
Wasserstein-1 (earth mover's: HOW FAR apart the distributions sit, in
value units), Cramér-von Mises (the L2 CDF distance that weights the
body where KS's sup-norm (t26) only sees the worst point), and the
energy distance (the modern omnibus two-sample statistic,
2E|X−Y| − E|X−X'| − E|Y−Y'|). Together with KS (t26) they complete
the distance family: sup-norm, L1, L2, and kernel-free energy.

Reference anchors (SURVEY §2): all three run on the same
distinct-value grid + cumulative window the t26 KS/MW entries built;
they are the distribution-shift metrics a training-data pipeline
quotes when PSI (ext) needs a binning-free second opinion.

Scale notes (100 TB):
- all three fold over the compressed distinct-value grid with
  MICRO-floored empirical CDFs (each CDF floors independently —
  documented); every per-gap term is then an exact BIGINT bounded by
  value_range × 1e6 REGARDLESS of sample size, so the sums are
  SF-invariant-safe and commute across partitionings.
- the pairwise-|x−y| sums in the energy distance use the sorted-gap
  identity Σ|x−y| = Σ_gaps Δv·cum·(n−cum) — no pair enumeration
  anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-value grid with micro-floored CDFs of both samples and
    the gap to the next value — the shared substrate of all three
    distances (the t26 KS/MW construction plus F-floors and Δv)."""
    ev = _events(spark, sf_dir)
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    counts = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .select(
            centi.alias("v"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("isp"),
        )
        .groupBy("v")
        .agg(
            F.sum("isp").cast("long").alias("cp"),
            F.sum(1 - F.col("isp")).cast("long").alias("cc"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    nrow = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wlead = Window.orderBy("v")
    return counts.select(
        "v",
        "cp",
        "cc",
        F.sum("cp").over(w).cast("long").alias("cum_p"),
        F.sum("cc").over(w).cast("long").alias("cum_c"),
        F.sum("cp").over(nrow).cast("long").alias("np"),
        F.sum("cc").over(nrow).cast("long").alias("nc"),
        (F.lead("v").over(wlead) - F.col("v")).alias("dv"),
    ).select(
        "v",
        "cp",
        "cc",
        "np",
        "nc",
        "dv",
        F.expr("(cum_p * 1000000) DIV np").alias("f_p"),
        F.expr("(cum_c * 1000000) DIV nc").alias("f_c"),
    )


# --- T60a: Wasserstein-1 ------------------------------------------------------------

_W1 = "(CAST(w1_sum AS DOUBLE) / 1000000.0 / 100.0)"


def wasserstein_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T60a — Wasserstein-1 (earth mover's) distance between purchase
    and click values: ∫|F_p − F_c| dv over the value axis, folded as
    Σ_gaps |f_p − f_c|·Δv on micro-floored CDFs (exact BIGINT terms
    bounded by range·1e6 at ANY sample size). Unlike KS (t26), W1
    reports the distance in DOLLARS — 'the typical purchase value
    sits this many dollars above the typical click value, transport-
    optimally' — the distribution-shift currency ML monitoring quotes.

    Scale: the shared distinct-value grid; one reduce."""
    g = _grid(spark, sf_dir)
    agg = g.filter(F.col("dv").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.max("np").alias("n_purchase"),
        F.max("nc").alias("n_click"),
        F.sum(F.expr("abs(f_p - f_c) * dv")).cast("long").alias("w1_sum"),
    )
    return agg.select(
        "n_gaps",
        "n_purchase",
        "n_click",
        "w1_sum",
        F.expr(_W1).alias("w1_dollars"),
    )


# --- T60b: Cramér-von Mises -----------------------------------------------------------

_CVM = (
    "((CAST(np AS DOUBLE) * CAST(nc AS DOUBLE)"
    " / ((CAST(np AS DOUBLE) + CAST(nc AS DOUBLE))"
    " * (CAST(np AS DOUBLE) + CAST(nc AS DOUBLE))))"
    " * CAST(cvm_sum AS DOUBLE) / 1000000000000.0)"
)


def cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T60b — two-sample Cramér-von Mises statistic: the L2 distance
    Σ_observations (F_p − F_c)² scaled by n_p·n_c/(n_p+n_c)² —
    integrates squared CDF gaps over the pooled sample, so persistent
    body-wide separation scores high even when no single point is
    extreme (exactly what KS misses). Per-value terms fold as
    (c_p + c_c)·(f_p − f_c)² DIV 1e6 on the micro-floored CDFs
    (double-floor documented — each term ≤ count·1e6, SF-safe).

    Scale: the shared grid; one reduce."""
    g = _grid(spark, sf_dir)
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_grid"),
        F.max("np").alias("np"),
        F.max("nc").alias("nc"),
        F.sum(
            F.expr(
                "((cp + cc) * (((f_p - f_c) * (f_p - f_c)) DIV 1000000))"
            )
        )
        .cast("long")
        .alias("cvm_sum"),
    )
    return agg.select(
        "n_grid",
        F.col("np").alias("n_purchase"),
        F.col("nc").alias("n_click"),
        "cvm_sum",
        F.expr(_CVM).alias("cvm_t"),
    )


# --- T60c: energy distance ---------------------------------------------------------------

# E|X-Y| etc. from the sorted-gap identity with micro CDFs; the three
# integer sums combine in ONE shared expression
_ENERGY = (
    "(2.0 * CAST(exy AS DOUBLE) - CAST(exx AS DOUBLE)"
    " - CAST(eyy AS DOUBLE)) / 1000000.0 / 100.0"
)


def energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T60c — energy distance between purchase and click values:
    2E|X−Y| − E|X−X'| − E|Y−Y'| (non-negative, zero iff the
    distributions coincide — the kernel-free omnibus two-sample
    statistic). Each expectation folds via the sorted-gap identity
    Σ|a−b| = Σ_gaps Δv·cum_a·(n_b−cum_b)-style terms on micro-floored
    CDFs: exy_gap = Δv·(f_p·(1e6−f_c) + f_c·(1e6−f_p)) DIV 1e6, and
    the within-sample terms use 2·f·(1e6−f) — every term an exact
    BIGINT bounded by range·1e6 at any SF. Reported in dollars.

    Scale: the shared grid; one reduce computing the three sums."""
    g = _grid(spark, sf_dir).filter(F.col("dv").isNotNull())
    agg = g.agg(
        F.max("np").alias("n_purchase"),
        F.max("nc").alias("n_click"),
        F.sum(
            F.expr(
                "(dv * (f_p * (1000000 - f_c) + f_c * (1000000 - f_p)))"
                " DIV 1000000"
            )
        )
        .cast("long")
        .alias("exy"),
        F.sum(
            F.expr("(dv * (2 * f_p * (1000000 - f_p))) DIV 1000000")
        )
        .cast("long")
        .alias("exx"),
        F.sum(
            F.expr("(dv * (2 * f_c * (1000000 - f_c))) DIV 1000000")
        )
        .cast("long")
        .alias("eyy"),
    )
    return agg.select(
        "n_purchase",
        "n_click",
        "exy",
        "exx",
        "eyy",
        F.expr(_ENERGY).alias("energy_dollars"),
    )


QUERIES = {
    "t60_wasserstein_distance": wasserstein_distance,
    "t60_cramer_von_mises": cramer_von_mises,
    "t60_energy_distance": energy_distance,
}

_GRID_SQL = """
        counts AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                   CAST(SUM(CASE WHEN event_type = 'click'
                        THEN 1 ELSE 0 END) AS BIGINT) AS cc
            FROM events WHERE event_type IN ('purchase', 'click')
            GROUP BY 1
        ),
        grid AS (
            SELECT v, cp, cc,
                   CAST(SUM(cp) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_p,
                   CAST(SUM(cc) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
                   CAST(SUM(cp) OVER () AS BIGINT) AS np,
                   CAST(SUM(cc) OVER () AS BIGINT) AS nc,
                   lead(v) OVER (ORDER BY v) - v AS dv
            FROM counts
        ),
        cdfs AS (
            SELECT v, cp, cc, np, nc, dv,
                   (cum_p * 1000000) // np AS f_p,
                   (cum_c * 1000000) // nc AS f_c
            FROM grid
        )
"""

ORACLE = {
    "t60_wasserstein_distance": f"""
        WITH {_GRID_SQL}
        SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
               MAX(np) AS n_purchase,
               MAX(nc) AS n_click,
               CAST(SUM(abs(f_p - f_c) * dv) AS BIGINT) AS w1_sum,
               {_W1.replace("w1_sum", "SUM(abs(f_p - f_c) * dv)")}
                   AS w1_dollars
        FROM cdfs WHERE dv IS NOT NULL
    """,
    "t60_cramer_von_mises": f"""
        WITH {_GRID_SQL}
        SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
               MAX(np) AS n_purchase,
               MAX(nc) AS n_click,
               CAST(SUM((cp + cc) * (((f_p - f_c) * (f_p - f_c))
                    // 1000000)) AS BIGINT) AS cvm_sum,
               (CAST(MAX(np) AS DOUBLE) * CAST(MAX(nc) AS DOUBLE)
                / ((CAST(MAX(np) AS DOUBLE) + CAST(MAX(nc) AS DOUBLE))
                   * (CAST(MAX(np) AS DOUBLE) + CAST(MAX(nc) AS DOUBLE))))
                   * CAST(SUM((cp + cc) * (((f_p - f_c) * (f_p - f_c))
                         // 1000000)) AS DOUBLE) / 1000000000000.0
                   AS cvm_t
        FROM cdfs
    """,
    "t60_energy_distance": f"""
        WITH {_GRID_SQL}
        SELECT MAX(np) AS n_purchase,
               MAX(nc) AS n_click,
               CAST(SUM((dv * (f_p * (1000000 - f_c)
                    + f_c * (1000000 - f_p))) // 1000000) AS BIGINT)
                   AS exy,
               CAST(SUM((dv * (2 * f_p * (1000000 - f_p))) // 1000000)
                    AS BIGINT) AS exx,
               CAST(SUM((dv * (2 * f_c * (1000000 - f_c))) // 1000000)
                    AS BIGINT) AS eyy,
               (2.0 * CAST(SUM((dv * (f_p * (1000000 - f_c)
                    + f_c * (1000000 - f_p))) // 1000000) AS DOUBLE)
                - CAST(SUM((dv * (2 * f_p * (1000000 - f_p)))
                       // 1000000) AS DOUBLE)
                - CAST(SUM((dv * (2 * f_c * (1000000 - f_c)))
                       // 1000000) AS DOUBLE)) / 1000000.0 / 100.0
                   AS energy_dollars
        FROM cdfs WHERE dv IS NOT NULL
    """,
}

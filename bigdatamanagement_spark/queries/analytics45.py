"""Association-inference pack (T63): partial correlation (value vs
the props payload CONTROLLING for hour-of-day — does the raw Pearson
(t18) survive removing the shared daily rhythm), the odds ratio of
conversion between day halves with its Woolf log-CI (the
epidemiology 2×2 the difference-based z-test (t19) complements),
McNemar's test on PAIRED first-half/second-half user conversion (the
within-user design that cancels user-level confounding the unpaired
tests can't), and Cohen's kappa between the engine's two rate
classifiers (weekday-based vs hour-based — agreement beyond chance,
the model-comparison readout accuracy alone overstates).

Reference anchors (SURVEY §2): all four fold from per-user / per-cell
exact counts over the event substrates the correlation (t18/t21/t43),
experimentation (t19/t34/t51), and calibration (t49/t57) families
already read.

Scale notes (100 TB):
- partial correlation: THREE pairwise correlations from ONE pass of
  exact BIGINT moments; the partial formula is one shared expression.
- odds ratio: a 2×2 of exact counts; OR and the Woolf CI are shared
  expressions (1/a+1/b+1/c+1/d under the log).
- McNemar: one user-keyed aggregate → discordant counts b, c;
  χ² = (b−c)²/(b+c) exact integers until one division.
- kappa: the 2×2 agreement table of two broadcast rate models; kappa
  from five exact counts via one shared expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T63a: partial correlation --------------------------------------------------------

_R = {
    pair: (
        f"((CAST(n AS DOUBLE) * CAST(s_{pair} AS DOUBLE)"
        f" - CAST(s_{pair[0]} AS DOUBLE) * CAST(s_{pair[1]} AS DOUBLE))"
        f" / sqrt((CAST(n AS DOUBLE) * CAST(q_{pair[0]} AS DOUBLE)"
        f" - CAST(s_{pair[0]} AS DOUBLE) * CAST(s_{pair[0]} AS DOUBLE))"
        f" * (CAST(n AS DOUBLE) * CAST(q_{pair[1]} AS DOUBLE)"
        f" - CAST(s_{pair[1]} AS DOUBLE) * CAST(s_{pair[1]} AS DOUBLE))))"
    )
    for pair in ("xy", "xz", "yz")
}
_PARTIAL = (
    f"(({_R['xy']} - {_R['xz']} * {_R['yz']})"
    f" / sqrt((1.0 - {_R['xz']} * {_R['xz']})"
    f" * (1.0 - {_R['yz']} * {_R['yz']})))"
)


def partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T63a — partial correlation of event value (x) and the props
    payload k (y) CONTROLLING for hour-of-day (z):
    r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), with all three
    pairwise correlations folding from ONE pass of exact BIGINT
    moments and the whole formula one shared expression. If the raw
    r_xy (t18) was just both series breathing with the same daily
    rhythm, the partial collapses toward 0 — the confounder check the
    correlation family was missing.

    Scale: one scan, nine exact moments, one reduce."""
    ev = _events(spark, sf_dir).select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("x"),
        F.expr(
            "CAST(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("y"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("z"),
    ).filter(F.col("y").isNotNull())
    mom = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s_x"),
        F.sum("y").cast("long").alias("s_y"),
        F.sum("z").cast("long").alias("s_z"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_x"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q_y"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("q_z"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("s_xy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("s_xz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("s_yz"),
    )
    return mom.select(
        "n",
        F.expr(_R["xy"]).alias("r_xy"),
        F.expr(_R["xz"]).alias("r_xz"),
        F.expr(_R["yz"]).alias("r_yz"),
        F.expr(_PARTIAL).alias("partial_r_xy_given_z"),
    )


# --- T63b: odds ratio with Woolf CI ------------------------------------------------------

# Haldane-Anscombe 0.5 correction on every cell — the standard fix
# that keeps OR and its Woolf CI finite when a cell is empty (true at
# tiny SFs), applied identically on both engines
_OR = (
    "(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5))"
    " / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)))"
)
_OR_SE = (
    "sqrt(1.0 / (CAST(a AS DOUBLE) + 0.5) + 1.0 / (CAST(b AS DOUBLE)"
    " + 0.5) + 1.0 / (CAST(c AS DOUBLE) + 0.5)"
    " + 1.0 / (CAST(d AS DOUBLE) + 0.5))"
)


def odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T63b — odds ratio of user conversion between AM-leaning and
    PM-leaning users (exposure = user's majority activity hour ≥ 12,
    by exact count comparison): the 2×2 cells a,b,c,d fold exactly,
    OR = ad/bc with the Haldane-Anscombe 0.5 cell correction (keeps
    the estimate and CI finite when a cell is empty — documented,
    both engines), and the 95% Woolf CI exp(ln OR ± 1.96·√(Σ1/cell))
    is one shared expression. The multiplicative effect measure the
    additive z-test (t19) complements — epidemiology reports both for
    good reason.

    Scale: one user-keyed aggregate → one 2×2."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "CASE WHEN SUM(CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END)"
            " * 2 > COUNT(*) THEN 1 ELSE 0 END"
        ).alias("pm"),
        F.expr(
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv"),
    )
    cells = per_user.agg(
        F.sum(F.expr("CASE WHEN pm = 1 AND conv = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("a"),
        F.sum(F.expr("CASE WHEN pm = 1 AND conv = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("b"),
        F.sum(F.expr("CASE WHEN pm = 0 AND conv = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("c"),
        F.sum(F.expr("CASE WHEN pm = 0 AND conv = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("d"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr(_OR).alias("odds_ratio"),
        F.expr(f"exp(ln({_OR}) - 1.96 * {_OR_SE})").alias("ci_lo"),
        F.expr(f"exp(ln({_OR}) + 1.96 * {_OR_SE})").alias("ci_hi"),
    )


# --- T63c: McNemar's paired test -----------------------------------------------------------

_MCNEMAR = (
    "(CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE))"
)


def mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T63c — McNemar's test on PAIRED user conversion: each user is
    their own control (did they purchase in the first half of the
    corpus vs the second half — halves by the exact time midpoint);
    only the DISCORDANT users carry information (b = converted early
    only, c = late only), and χ²(1) = (b−c)²/(b+c) is exact integers
    until one division. The within-user design cancels every
    user-level confounder the unpaired two-proportion tests
    (t19/t51/t63b) must assume away.

    Scale: one user-keyed aggregate with the global midpoint
    broadcast; one 2×2."""
    ev = _events(spark, sf_dir)
    mid = ev.agg(
        F.expr(
            "(MIN(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + MAX(unix_micros(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid")
    )
    per_user = (
        ev.join(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN event_type = 'purchase' AND"
                    " unix_micros(CAST(ts AS TIMESTAMP)) <= mid"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("early"),
            F.max(
                F.expr(
                    "CASE WHEN event_type = 'purchase' AND"
                    " unix_micros(CAST(ts AS TIMESTAMP)) > mid"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("late"),
        )
    )
    cells = per_user.agg(
        F.sum(F.expr("CASE WHEN early = 1 AND late = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("both_conv"),
        F.sum(F.expr("CASE WHEN early = 1 AND late = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("b"),
        F.sum(F.expr("CASE WHEN early = 0 AND late = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("c"),
        F.sum(F.expr("CASE WHEN early = 0 AND late = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("neither"),
    )
    return cells.select(
        "both_conv",
        "b",
        "c",
        "neither",
        F.expr(
            f"CASE WHEN b + c > 0 THEN {_MCNEMAR}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("mcnemar_chi2"),
    )


# --- T63d: Cohen's kappa ---------------------------------------------------------------------

_KAPPA = (
    "((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)"
    " - (CAST(p1 AS DOUBLE) * CAST(p2 AS DOUBLE)"
    " + (CAST(n AS DOUBLE) - CAST(p1 AS DOUBLE))"
    " * (CAST(n AS DOUBLE) - CAST(p2 AS DOUBLE)))"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    " / (1.0 - (CAST(p1 AS DOUBLE) * CAST(p2 AS DOUBLE)"
    " + (CAST(n AS DOUBLE) - CAST(p1 AS DOUBLE))"
    " * (CAST(n AS DOUBLE) - CAST(p2 AS DOUBLE)))"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
)


def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T63d — Cohen's kappa between the engine's two purchase
    classifiers: the weekday-rate model (t49/t57/t59) and the
    hour-rate model, each predicting positive where its cell rate
    exceeds the global rate (exact integer cross-multiplication).
    Kappa corrects raw agreement for chance — two models that both
    say "no" 98% of the time agree constantly and mean nothing; kappa
    reports the agreement that survives. Five exact counts, one
    shared expression.

    Scale: two broadcast rate grids joined onto one scan; one
    reduce."""
    ev = _events(spark, sf_dir).select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1996-01-01') % 7"
            " AS BIGINT)"
        ).alias("wd"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("h"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        ).alias("y"),
    ).localCheckpoint(eager=True)
    tot = ev.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("y").cast("long").alias("cc"),
    )
    wgrid = ev.groupBy("wd").agg(
        F.count(F.lit(1)).cast("long").alias("n_w"),
        F.sum("y").cast("long").alias("c_w"),
    )
    hgrid = ev.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("y").cast("long").alias("c_h"),
    )
    scored = (
        ev.join(F.broadcast(wgrid), "wd")
        .join(F.broadcast(hgrid), "h")
        .join(F.broadcast(tot))
        .select(
            F.expr(
                "CASE WHEN c_w * nn > cc * n_w THEN 1 ELSE 0 END"
            ).alias("pred1"),
            F.expr(
                "CASE WHEN c_h * nn > cc * n_h THEN 1 ELSE 0 END"
            ).alias("pred2"),
        )
    )
    counts = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pred1").cast("long").alias("p1"),
        F.sum("pred2").cast("long").alias("p2"),
        F.sum(
            F.expr("CASE WHEN pred1 = pred2 THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("agree"),
    )
    return counts.select(
        "n", "p1", "p2", "agree", F.expr(_KAPPA).alias("kappa")
    )


QUERIES = {
    "t63_partial_correlation": partial_correlation,
    "t63_odds_ratio_ci": odds_ratio_ci,
    "t63_mcnemar_paired": mcnemar_paired,
    "t63_cohens_kappa": cohens_kappa,
}

ORACLE = {
    "t63_partial_correlation": f"""
        WITH ev AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS x,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS y,
                   CAST(hour(ts) AS BIGINT) AS z
            FROM events
            WHERE json_extract(props, '$.k') IS NOT NULL
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s_x,
                   CAST(SUM(y) AS BIGINT) AS s_y,
                   CAST(SUM(z) AS BIGINT) AS s_z,
                   CAST(SUM(x * x) AS BIGINT) AS q_x,
                   CAST(SUM(y * y) AS BIGINT) AS q_y,
                   CAST(SUM(z * z) AS BIGINT) AS q_z,
                   CAST(SUM(x * y) AS BIGINT) AS s_xy,
                   CAST(SUM(x * z) AS BIGINT) AS s_xz,
                   CAST(SUM(y * z) AS BIGINT) AS s_yz
            FROM ev
        )
        SELECT n, {_R["xy"]} AS r_xy, {_R["xz"]} AS r_xz,
               {_R["yz"]} AS r_yz,
               {_PARTIAL} AS partial_r_xy_given_z
        FROM mom
    """,
    "t63_odds_ratio_ci": f"""
        WITH per_user AS (
            SELECT user_id,
                   CASE WHEN SUM(CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0
                        END) * 2 > COUNT(*) THEN 1 ELSE 0 END AS pm,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS conv
            FROM events GROUP BY 1
        ),
        cells AS (
            SELECT CAST(SUM(CASE WHEN pm = 1 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN pm = 1 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN pm = 0 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN pm = 0 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS d
            FROM per_user
        )
        SELECT a, b, c, d, {_OR} AS odds_ratio,
               exp(ln({_OR}) - 1.96 * {_OR_SE}) AS ci_lo,
               exp(ln({_OR}) + 1.96 * {_OR_SE}) AS ci_hi
        FROM cells
    """,
    "t63_mcnemar_paired": f"""
        WITH mid AS (
            SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                        AND epoch_us(ts) <= mid THEN 1 ELSE 0 END)
                       AS early,
                   MAX(CASE WHEN event_type = 'purchase'
                        AND epoch_us(ts) > mid THEN 1 ELSE 0 END) AS late
            FROM events CROSS JOIN mid
            GROUP BY 1
        ),
        cells AS (
            SELECT CAST(SUM(CASE WHEN early = 1 AND late = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS both_conv,
                   CAST(SUM(CASE WHEN early = 1 AND late = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN early = 0 AND late = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN early = 0 AND late = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS neither
            FROM per_user
        )
        SELECT both_conv, b, c, neither,
               CASE WHEN b + c > 0 THEN {_MCNEMAR}
                    ELSE CAST(NULL AS DOUBLE) END AS mcnemar_chi2
        FROM cells
    """,
    "t63_cohens_kappa": f"""
        WITH ev AS (
            SELECT CAST(datediff('day', DATE '1996-01-01',
                                 CAST(ts AS DATE)) % 7 AS BIGINT) AS wd,
                   CAST(hour(ts) AS BIGINT) AS h,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                       CAST(SUM(y) AS BIGINT) AS cc FROM ev),
        wgrid AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_w,
                         CAST(SUM(y) AS BIGINT) AS c_w
                  FROM ev GROUP BY 1),
        hgrid AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_h,
                         CAST(SUM(y) AS BIGINT) AS c_h
                  FROM ev GROUP BY 1),
        scored AS (
            SELECT CASE WHEN c_w * nn > cc * n_w THEN 1 ELSE 0 END
                       AS pred1,
                   CASE WHEN c_h * nn > cc * n_h THEN 1 ELSE 0 END
                       AS pred2
            FROM ev JOIN wgrid USING (wd) JOIN hgrid USING (h)
            CROSS JOIN tot
        ),
        counts AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(pred1) AS BIGINT) AS p1,
                   CAST(SUM(pred2) AS BIGINT) AS p2,
                   CAST(SUM(CASE WHEN pred1 = pred2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS agree
            FROM scored
        )
        SELECT n, p1, p2, agree, {_KAPPA} AS kappa FROM counts
    """,
}

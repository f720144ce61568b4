"""Variance-ratio / Hurst / trend-test / diffusion-fit pack (T53):
the Lo-MacKinlay variance-ratio test on daily revenue (random walk
vs mean reversion/momentum — the econometric stationarity probe),
a two-scale rescaled-range (R/S) Hurst exponent (long-memory
diagnostic, the fractal cousin of the ACF), the Cochran-Armitage
trend test for conversion across ordered hour buckets (the ORDERED
upgrade of the t29 chi-square family), and a Bass diffusion fit of
cumulative buyer adoption (p/q innovation-imitation parameters via
the discrete-Bass OLS, reusing the t24 Cramer 3×3 discipline).

Reference anchors (SURVEY §2): all four read series the engine
already derives — the daily revenue grid (CUSUM/ACF/Haar family),
the hour-of-day conversion grid (t19/t49), and the first-purchase
adoption curve (t22 cohorts).

Scale notes (100 TB):
- VR: day grid in HECTO-dollars (t50 grain); overlapping q=5 diffs
  from one lag window; both variances are n-scaled exact integer
  numerators; the ratio is ONE shared expression.
- Hurst: windows are (rn-1) DIV w groups on the day grid; per-window
  R/S floors to micro BEFORE the cross-window sum (doubles never
  sum); H is one shared expression over two exact sums.
- Cochran-Armitage: a 4-bucket count grid; z folds from six exact
  BIGINT moments in one shared expression.
- Bass: adoption normalized to per-mille of the final market size
  (scale-invariant — the normal-equation moments stay BIGINT-safe at
  ANY SF); the 3×3 Cramer solve is the t24 shared-expression string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.queries.analytics6 import _cramer_exprs

_MICRO = 1_000_000
_VR_Q = 5
# the events corpus spans ~30 days at every SF (TESTDATA.md), so the
# two R/S scales must both fit several complete windows inside it
_RS_SCALES = (4, 12)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _daily_hecto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily purchase revenue in hecto-dollars (t50 grain)."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "SUM(CAST(round(value * 100, 0) AS BIGINT)) DIV 10000"
        ).alias("x")
    )
    span = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    return grid.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )


# --- T53a: Lo-MacKinlay variance ratio ------------------------------------------

# VR(q) with biased variance divisors: var1 = (n1*q1 - s1^2)/n1^2,
# varq = (nq*qq - sq^2)/nq^2, VR = varq / (q * var1) — note the SQUARED
# n1/nq scaling (Lo-MacKinlay 1988, eq. 8 without the bias correction).
_VR = (
    "((CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)"
    " * (CAST(nq AS DOUBLE) * CAST(qq AS DOUBLE)"
    " - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)))"
    f" / ({_VR_Q}.0 * CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE)"
    " * (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))))"
)


def variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T53a — Lo-MacKinlay variance ratio VR(5) of daily revenue: the
    variance of overlapping 5-day changes over 5× the variance of
    1-day changes — 1 under a random walk, <1 under mean reversion,
    >1 under momentum (no bias correction; overlapping windows —
    documented convention). Both variance numerators are n-scaled
    exact BIGINTs from the hecto-dollar day grid; the ratio is ONE
    shared expression.

    Scale: two lag columns on the day grid; one reduce."""
    dense = _daily_hecto(spark, sf_dir)
    w = Window.orderBy("day")
    diffs = dense.select(
        (F.col("x") - F.lag("x", 1).over(w)).alias("r1"),
        (F.col("x") - F.lag("x", _VR_Q).over(w)).alias("rq"),
    )
    mom = diffs.agg(
        F.count("r1").cast("long").alias("n1"),
        F.sum("r1").cast("long").alias("s1"),
        F.sum(F.col("r1") * F.col("r1")).cast("long").alias("q1"),
        F.count("rq").cast("long").alias("nq"),
        F.sum("rq").cast("long").alias("sq"),
        F.sum(F.col("rq") * F.col("rq")).cast("long").alias("qq"),
    )
    return mom.select(
        "n1", "nq", "s1", "q1", "sq", "qq", F.expr(_VR).alias("vr5")
    )


# --- T53b: two-scale Hurst exponent (R/S) ------------------------------------------

# per-window R/S in micro: cumdev carries the w-scaled prefix so R and
# S share the same 1/w factor, which cancels
_RS_MICRO = (
    "(CASE WHEN {w} * q - s * s > 0 THEN"
    " CAST(floor(1000000.0 * CAST(mx - mn AS DOUBLE)"
    " / sqrt(CAST({w} * q - s * s AS DOUBLE))) AS BIGINT)"
    " ELSE NULL END)"
)
_HURST = (
    "((ln(CAST(rs_b AS DOUBLE) / CAST(k_b AS DOUBLE))"
    " - ln(CAST(rs_a AS DOUBLE) / CAST(k_a AS DOUBLE)))"
    f" / ln({_RS_SCALES[1]}.0 / {_RS_SCALES[0]}.0))"
)


def hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T53b — two-scale rescaled-range Hurst exponent of daily
    revenue: for window sizes 4 and 12 days, each complete
    non-overlapping window's R/S (range of cumulative deviations from
    the window mean over the window std, the 1/w factors cancelling
    in the w-scaled construction) floors to micro BEFORE the
    cross-window sum, and H = Δln(mean R/S)/Δln(w) is one shared
    expression. H≈0.5 memoryless, >0.5 persistent (trends persist),
    <0.5 anti-persistent — the long-memory diagnostic the lag-k ACF
    (t26) cannot summarize.

    Scale: the day grid; windows are (rn−1) DIV w groups; everything
    exact until the per-window floor."""
    dense = _daily_hecto(spark, sf_dir).localCheckpoint(eager=True)
    w_all = Window.orderBy("day")
    rn = dense.select(
        "x", F.row_number().over(w_all).cast("long").alias("rn")
    )
    outs = []
    for tag, wsz in zip(("a", "b"), _RS_SCALES):
        wwin = Window.partitionBy("wid").orderBy("rn")
        per = (
            rn.select(
                "x",
                "rn",
                F.expr(f"(rn - 1) DIV {wsz}").alias("wid"),
            )
            .select(
                "wid",
                "x",
                F.sum("x").over(
                    wwin.rowsBetween(Window.unboundedPreceding, 0)
                ).alias("pref"),
                F.row_number().over(wwin).cast("long").alias("t"),
            )
        )
        # cumdev_scaled = w*pref - t*s needs the window total s: join back
        cum = per.join(
            per.groupBy("wid").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("x").cast("long").alias("s"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
            ),
            "wid",
        ).filter(F.col("cnt") == wsz)
        ext = cum.select(
            "wid",
            "s",
            "q",
            (F.lit(wsz) * F.col("pref") - F.col("t") * F.col("s")).alias(
                "cd"
            ),
        ).groupBy("wid", "s", "q").agg(
            F.max("cd").alias("mx"), F.min("cd").alias("mn")
        )
        rs = ext.select(
            F.expr(_RS_MICRO.format(w=wsz)).alias("rs_micro")
        ).filter(F.col("rs_micro").isNotNull())
        outs.append(
            rs.agg(
                F.count(F.lit(1)).cast("long").alias(f"k_{tag}"),
                F.sum("rs_micro").cast("long").alias(f"rs_{tag}"),
            )
        )
    return (
        outs[0]
        .join(outs[1])
        .select("k_a", "rs_a", "k_b", "rs_b", F.expr(_HURST).alias("hurst"))
    )


# --- T53c: Cochran-Armitage trend test -----------------------------------------------

_CA_Z = (
    "((CAST(nn AS DOUBLE) * CAST(scy AS DOUBLE)"
    " - CAST(cc AS DOUBLE) * CAST(sny AS DOUBLE))"
    " / sqrt(CAST(cc AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(cc AS DOUBLE))"
    " * (CAST(nn AS DOUBLE) * CAST(s2n AS DOUBLE)"
    " - CAST(sny AS DOUBLE) * CAST(sny AS DOUBLE))"
    " / CAST(nn AS DOUBLE)))"
)


def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T53c — Cochran-Armitage trend test: does purchase share rise
    MONOTONICALLY across the four ordered day-quarters (hour buckets
    0-5 / 6-11 / 12-17 / 18-23, scores 0..3)? The ordered-alternative
    upgrade of the omnibus chi-square (ext_chi2/t42 residuals): one
    degree of freedom pointed at the trend, so it sees what the
    unordered test dilutes. z folds from six exact BIGINT moments via
    ONE shared expression.

    Scale: a 4-bucket count grid; one reduce."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.expr("CAST(hour(ts) AS BIGINT) DIV 6").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("c"),
    )
    mom = grid.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("c").cast("long").alias("cc"),
        F.sum(F.col("s") * F.col("c")).cast("long").alias("scy"),
        F.sum(F.col("s") * F.col("n")).cast("long").alias("sny"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).cast("long").alias(
            "s2n"
        ),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    return mom.select(
        "n_buckets",
        "nn",
        "cc",
        "scy",
        "sny",
        "s2n",
        F.expr(_CA_Z).alias("z"),
    )


# --- T53d: Bass diffusion fit -----------------------------------------------------------

_BASS = _cramer_exprs()


def bass_diffusion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T53d — Bass diffusion fit of buyer adoption: weekly NEW buyers
    (first-ever order) regress on lagged cumulative adoption and its
    square (the discrete Bass model n_t = pm + (q−p)C − (q/m)C²),
    with adoption normalized to PER-MILLE of the final buyer count —
    scale-invariant, so the nine normal-equation moments stay
    BIGINT-safe at any SF. The 3×3 Cramer solve is the t24 shared
    expression string; implied innovation p and imitation q come from
    b0 and b2 (p_micro = b0_micro DIV 1000, q_micro = −1000·b2_micro)
    with the b1-consistency gap reported as the model diagnostic.

    Scale: one customer-keyed first-order aggregate; the regression
    runs on the ≤|weeks| grid."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)[
        "orders"
    ]
    first = o.groupBy("o_custkey").agg(
        F.expr("CAST(weekofyear(MIN(o_orderdate)) AS BIGINT)").alias("wk")
    )
    weekly = first.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("newb")
    )
    w = Window.orderBy("wk")
    m_tot = weekly.agg(F.sum("newb").cast("long").alias("m"))
    series = (
        weekly.join(F.broadcast(m_tot))
        .select(
            "wk",
            "m",
            F.expr("(newb * 1000) DIV m").alias("y"),
            F.coalesce(
                F.sum("newb").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("cprev"),
        )
        .select(
            "wk",
            "m",
            "y",
            F.expr("(cprev * 1000) DIV m").alias("x1"),
        )
        .select("wk", "m", "y", "x1", F.expr("x1 * x1").alias("x2"))
    )
    mom = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    return mom.select(
        "n",
        F.expr(_BASS["b0"]).alias("b0_micro"),
        F.expr(_BASS["b1"]).alias("b1_micro"),
        F.expr(_BASS["b2"]).alias("b2_micro"),
        F.expr(
            f"CAST(round(CAST(({_BASS['b0']}) AS DOUBLE) / 1000.0, 0)"
            " AS BIGINT)"
        ).alias("p_micro"),
        F.expr(f"-1000 * ({_BASS['b2']})").alias("q_micro"),
        F.expr(
            f"({_BASS['b1']})"
            f" - (-1000 * ({_BASS['b2']})"
            f" - CAST(round(CAST(({_BASS['b0']}) AS DOUBLE) / 1000.0, 0)"
            " AS BIGINT))"
        ).alias("b1_consistency_gap"),
    )


QUERIES = {
    "t53_variance_ratio_test": variance_ratio_test,
    "t53_hurst_rs": hurst_rs,
    "t53_cochran_armitage_trend": cochran_armitage_trend,
    "t53_bass_diffusion_fit": bass_diffusion_fit,
}

_DAILY_HECTO_SQL = """
        daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) // 10000 AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        grid AS (
            SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))
                        AS DATE) AS day
            FROM span
        ),
        dense AS (
            SELECT g.day, COALESCE(d.x, 0) AS x
            FROM grid g LEFT JOIN daily d ON g.day = d.day
        )
"""

_RS_ONE = """
        SELECT CAST(COUNT(*) AS BIGINT) AS k_{tag},
               CAST(SUM(rs_micro) AS BIGINT) AS rs_{tag}
        FROM (
            SELECT {rs} AS rs_micro
            FROM (
                SELECT wid, s, q, MAX(cd) AS mx, MIN(cd) AS mn
                FROM (
                    SELECT wid, s, q, {w} * pref - t * s AS cd
                    FROM (
                        SELECT wid, pref, t,
                               CAST(SUM(x) OVER (PARTITION BY wid)
                                    AS BIGINT) AS s,
                               CAST(SUM(x * x) OVER (PARTITION BY wid)
                                    AS BIGINT) AS q,
                               COUNT(*) OVER (PARTITION BY wid) AS cnt
                        FROM (
                            SELECT wid, x,
                                   CAST(SUM(x) OVER (PARTITION BY wid
                                       ORDER BY rn ROWS UNBOUNDED PRECEDING)
                                       AS BIGINT) AS pref,
                                   CAST(row_number() OVER (
                                       PARTITION BY wid ORDER BY rn)
                                       AS BIGINT) AS t,
                                   rn
                            FROM (
                                SELECT x,
                                       CAST(row_number() OVER (ORDER BY day)
                                            AS BIGINT) AS rn,
                                       (CAST(row_number() OVER (ORDER BY day)
                                             AS BIGINT) - 1) // {w} AS wid
                                FROM dense
                            )
                        )
                    ) WHERE cnt = {w}
                ) GROUP BY 1, 2, 3
            )
            WHERE rs_micro IS NOT NULL
        )
"""

ORACLE = {
    "t53_variance_ratio_test": f"""
        WITH {_DAILY_HECTO_SQL},
        diffs AS (
            SELECT x - lag(x, 1) OVER (ORDER BY day) AS r1,
                   x - lag(x, {_VR_Q}) OVER (ORDER BY day) AS rq
            FROM dense
        ),
        mom AS (
            SELECT CAST(COUNT(r1) AS BIGINT) AS n1,
                   CAST(SUM(r1) AS BIGINT) AS s1,
                   CAST(SUM(r1 * r1) AS BIGINT) AS q1,
                   CAST(COUNT(rq) AS BIGINT) AS nq,
                   CAST(SUM(rq) AS BIGINT) AS sq,
                   CAST(SUM(rq * rq) AS BIGINT) AS qq
            FROM diffs
        )
        SELECT n1, nq, s1, q1, sq, qq, {_VR} AS vr5 FROM mom
    """,
    "t53_hurst_rs": f"""
        WITH {_DAILY_HECTO_SQL},
        sa AS ({_RS_ONE.format(tag="a", w=_RS_SCALES[0],
                               rs=_RS_MICRO.format(w=_RS_SCALES[0])
                               .replace(" DIV ", " // "))}),
        sb AS ({_RS_ONE.format(tag="b", w=_RS_SCALES[1],
                               rs=_RS_MICRO.format(w=_RS_SCALES[1])
                               .replace(" DIV ", " // "))})
        SELECT k_a, rs_a, k_b, rs_b, {_HURST} AS hurst
        FROM sa CROSS JOIN sb
    """,
    "t53_cochran_armitage_trend": f"""
        WITH grid AS (
            SELECT CAST(hour(ts) AS BIGINT) // 6 AS s,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        mom AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(c) AS BIGINT) AS cc,
                   CAST(SUM(s * c) AS BIGINT) AS scy,
                   CAST(SUM(s * n) AS BIGINT) AS sny,
                   CAST(SUM(s * s * n) AS BIGINT) AS s2n,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets
            FROM grid
        )
        SELECT n_buckets, nn, cc, scy, sny, s2n, {_CA_Z} AS z FROM mom
    """,
    "t53_bass_diffusion_fit": f"""
        WITH first AS (
            SELECT o_custkey,
                   CAST(weekofyear(MIN(o_orderdate)) AS BIGINT) AS wk
            FROM orders GROUP BY 1
        ),
        weekly AS (
            SELECT wk, CAST(COUNT(*) AS BIGINT) AS newb
            FROM first GROUP BY 1
        ),
        mt AS (SELECT CAST(SUM(newb) AS BIGINT) AS m FROM weekly),
        series AS (
            SELECT wk, m, (newb * 1000) // m AS y,
                   (COALESCE(SUM(newb) OVER (ORDER BY wk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) * 1000) // m AS x1
            FROM weekly CROSS JOIN mt
        ),
        s2 AS (SELECT wk, m, y, x1, x1 * x1 AS x2 FROM series),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                   CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                   CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                   CAST(SUM(x1 * y) AS BIGINT) AS s1y,
                   CAST(SUM(x2 * y) AS BIGINT) AS s2y
            FROM s2
        )
        SELECT n,
               {_BASS["b0"]} AS b0_micro,
               {_BASS["b1"]} AS b1_micro,
               {_BASS["b2"]} AS b2_micro,
               CAST(round(CAST(({_BASS["b0"]}) AS DOUBLE) / 1000.0, 0)
                    AS BIGINT) AS p_micro,
               -1000 * ({_BASS["b2"]}) AS q_micro,
               ({_BASS["b1"]})
                   - (-1000 * ({_BASS["b2"]})
                      - CAST(round(CAST(({_BASS["b0"]}) AS DOUBLE)
                                   / 1000.0, 0) AS BIGINT))
                   AS b1_consistency_gap
        FROM mom
    """,
}

"""Forecasting-completion / parametric-tests / gaps-and-islands pack
(T32): Holt's linear-trend one-step backtest made EXACT (the alpha =
beta = 1/2 recursion unrolled into an integer-coefficient convolution
computed once on the driver), Welch's unequal-variance t-test with
Cohen's d, longest consecutive-day activity streaks (the
gaps-and-islands classic), geographic dispersion (mean + diameter of
pairwise haversine distances per country), a Gumbel extreme-value
return level for daily maximum purchase value, and the
skewness/kurtosis higher-moment profile per event type.

Reference anchors (SURVEY §2): these complete three families the
engine already carries — forecasting (seasonal-naive t22, SES t28,
now trend), two-sample testing (z t19, Mann-Whitney/KS t26, now the
parametric Welch), and the lat/lon analytics
(`redis_client.py:74-93`) now measured by dispersion, not just
proximity; streaks are the canonical gaps-and-islands readout of the
reference's timestamped listens/events.

Scale notes (100 TB):
- Holt: the linear recursion s_t = M s_{t-1} + v x_t has integer
  4^t-scaled coefficients; the 14x14 coefficient table is a DRIVER
  CONSTANT (pure python ints, identical literals in both engines), so
  the whole backtest is one broadcast join + grouped BIGINT dot
  products — no sequential fold anywhere.
- Welch / Gumbel / moments: exact integer power sums (dollar grain
  for x^4 so sf-1000 still fits BIGINT), statistics through
  fixed-order shared expression strings.
- streaks: date - row_number() island key — one user-keyed window
  pass; top-k sorts only per-user maxima.
- dispersion: country-blocked pair enumeration (the linkage blocking
  discipline), distances floored to BIGINT meters before any
  aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.queries.analytics9 import _DIST_M, _users, _users_view

_HOLT_DAYS = 14
_STREAK_TOP_K = 20
_GUMBEL_T = 100  # return period, days
_EULER_GAMMA = "0.5772156649015329"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _holt_coefs() -> list[tuple[int, int, int, int, int]]:
    """(t, i, c_l, c_b, p4): integer coefficients with S_t = 4^t *
    (l_t, b_t) = sum_i (c_l, c_b)[t, i] * x_i, plus p4 = 4^t. Derived
    from l_t = (x_t + l + b)/2, b_t = x_t/4 - l/4 + 3b/4 (alpha =
    beta = 1/2), init l_2 = x_2, b_2 = x_2 - x_1; the map is linear,
    so 4M = [[2, 2], [-1, 3]] and 4^t v = (2, 1) * 4^(t-1) stay
    integer. Pure-python driver constants — both engines consume the
    SAME literals."""
    coefs: dict[int, dict[int, tuple[int, int]]] = {
        2: {1: (0, -16), 2: (16, 16)}
    }
    for t in range(3, _HOLT_DAYS + 1):
        prev = coefs[t - 1]
        cur: dict[int, tuple[int, int]] = {}
        for i, (cl, cb) in prev.items():
            cur[i] = (2 * cl + 2 * cb, -cl + 3 * cb)
        base = 4 ** (t - 1)
        pl, pb = cur.get(t, (0, 0))
        cur[t] = (pl + 2 * base, pb + base)
        coefs[t] = cur
    return [
        (t, i, cl, cb, 4**t)
        for t, row in coefs.items()
        for i, (cl, cb) in sorted(row.items())
    ]


_HOLT_COEFS = _holt_coefs()
_HOLT_MAE = (
    "(CAST(mae_num AS DOUBLE)"
    f" / (CAST(n_fc AS DOUBLE) * CAST({4 ** (_HOLT_DAYS - 1)} AS DOUBLE)))"
)


def holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32a — EXACT Holt linear-trend one-step backtest (alpha = beta
    = 1/2) on the last 14 days of daily purchase revenue: the
    two-state recursion unrolls into an integer-coefficient
    convolution (driver-constant 14x14 table, see _holt_coefs), so
    forecast_t+1 = (S_t,l + S_t,b) / 4^t and every error numerator
    4^t*x_{t+1} - (S_l + S_b) is a BIGINT; the MAE reports through a
    common-denominator integer numerator — the trend-aware sibling of
    the SES backtest (t28), completing the naive/level/trend
    forecasting ladder.

    Scale: one day-grain aggregate + one broadcast coefficient join +
    one grouped BIGINT dot product; no sequential state anywhere."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    )
    recent = daily.orderBy(F.desc("day")).limit(_HOLT_DAYS)
    idx = recent.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.col("x").cast("long").alias("x"),
    ).localCheckpoint()
    coefs = spark.createDataFrame(
        _HOLT_COEFS, "t long, i long, c_l long, c_b long, p4 long"
    )
    s = (
        idx.join(F.broadcast(coefs), "i")
        .groupBy("t", "p4")
        .agg(
            F.sum(F.col("c_l") * F.col("x")).alias("sl"),
            F.sum(F.col("c_b") * F.col("x")).alias("sb"),
        )
    )
    nxt = idx.select((F.col("i") - 1).alias("t"), F.col("x").alias("x_next"))
    err = s.join(nxt, "t").select(
        "t",
        (
            F.col("p4") * F.col("x_next") - (F.col("sl") + F.col("sb"))
        ).alias("e_num"),
        "p4",
    )
    scale = 4 ** (_HOLT_DAYS - 1)
    agg = err.agg(
        F.count(F.lit(1)).cast("long").alias("n_fc"),
        F.sum(
            F.abs(F.col("e_num")) * (F.lit(scale).cast("long") / F.col("p4")).cast("long")
        )
        .cast("long")
        .alias("mae_num"),
    )
    return agg.select("n_fc", "mae_num", F.expr(_HOLT_MAE).alias("mae_cents"))


_WELCH = {
    "m1": "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))",
    "m2": "(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))",
    "v1": (
        "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE))"
    ),
    "v2": (
        "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE))"
    ),
}
_WELCH_T = (
    f"(({_WELCH['m1']} - {_WELCH['m2']})"
    f" / sqrt({_WELCH['v1']} / CAST(n1 AS DOUBLE)"
    f" + {_WELCH['v2']} / CAST(n2 AS DOUBLE)))"
)
_WELCH_DOF = (
    f"(pow({_WELCH['v1']} / CAST(n1 AS DOUBLE)"
    f" + {_WELCH['v2']} / CAST(n2 AS DOUBLE), 2)"
    f" / (pow({_WELCH['v1']} / CAST(n1 AS DOUBLE), 2)"
    " / CAST(n1 - 1 AS DOUBLE)"
    f" + pow({_WELCH['v2']} / CAST(n2 AS DOUBLE), 2)"
    " / CAST(n2 - 1 AS DOUBLE)))"
)
_COHEN_D = (
    f"(({_WELCH['m1']} - {_WELCH['m2']})"
    f" / sqrt((CAST(n1 - 1 AS DOUBLE) * {_WELCH['v1']}"
    f" + CAST(n2 - 1 AS DOUBLE) * {_WELCH['v2']})"
    " / CAST(n1 + n2 - 2 AS DOUBLE)))"
)


def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32b — Welch's unequal-variance t-test (+ Welch-Satterthwaite
    dof and Cohen's d effect size) comparing purchase vs click value:
    the parametric member of the two-sample family (z t19,
    Mann-Whitney/KS t26). Four exact BIGINT moments per group; every
    statistic is a fixed-order shared expression string.

    Scale: one filtered scan -> one two-group conditional aggregate."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    )
    x = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    g1 = F.col("event_type") == "purchase"
    agg = ev.select(g1.alias("g"), x.alias("x")).agg(
        F.sum(F.when(F.col("g"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("g"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("g"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(~F.col("g"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(F.when(F.col("g"), F.col("x") * F.col("x")).otherwise(0))
        .cast("long")
        .alias("q1"),
        F.sum(F.when(~F.col("g"), F.col("x") * F.col("x")).otherwise(0))
        .cast("long")
        .alias("q2"),
    )
    return agg.select(
        "n1",
        "n2",
        F.expr(_WELCH_T).alias("t_stat"),
        F.expr(_WELCH_DOF).alias("dof"),
        F.expr(_COHEN_D).alias("cohen_d"),
    )


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32c — longest consecutive-day activity streak per user, top-20
    by (streak desc, user asc): the gaps-and-islands classic (island
    key = day - row_number() over the user's distinct active days),
    with the streak's start day reported — the engagement metric every
    habit-loop product tracks.

    Scale: one distinct (user, day) pass + one user-keyed window; the
    top-k sorts only per-user maxima."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("isl"),
    )
    streaks = islands.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("start_day"),
    )
    best = streaks.groupBy("user_id").agg(
        F.max(
            F.struct(
                F.col("len").alias("len"),
                (-F.unix_date(F.col("start_day"))).alias("neg_start"),
            )
        ).alias("b"),
        F.min(
            F.struct((-F.col("len")).alias("nl"), F.col("start_day").alias("sd"))
        ).alias("bb"),
    )
    return (
        best.select(
            "user_id",
            F.col("bb.nl").alias("neg_len"),
            F.col("bb.sd").alias("start_day"),
        )
        .select(
            "user_id",
            (-F.col("neg_len")).cast("long").alias("streak_days"),
            "start_day",
        )
        .orderBy(F.desc("streak_days"), "user_id")
        .limit(_STREAK_TOP_K)
    )


def geo_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32d — geographic dispersion per country: the number of user
    pairs, the mean pairwise haversine distance, and the diameter
    (max), distances floored to BIGINT meters by the SAME shared
    expression as the closest-pair search (t27) — is a country's user
    base a city cluster or a continent-wide spread?

    Scale: country-blocked pair enumeration; sum/max aggregate of
    exact meters, mean via one shared expression string."""
    u = _users(spark).select(
        "country", F.col("user_key").alias("uk"), "latitude", "longitude"
    )
    a = u.select(
        "country",
        F.col("uk").alias("ua"),
        F.col("latitude").alias("lat1"),
        F.col("longitude").alias("lon1"),
    )
    b = u.select(
        "country",
        F.col("uk").alias("ub"),
        F.col("latitude").alias("lat2"),
        F.col("longitude").alias("lon2"),
    )
    pairs = a.join(b, ["country"]).filter(F.col("ua") < F.col("ub"))
    scored = pairs.select("country", F.expr(_DIST_M).alias("dist_m"))
    agg = scored.groupBy("country").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("dist_m").cast("long").alias("sum_dist_m"),
        F.max("dist_m").cast("long").alias("diameter_m"),
    )
    return agg.select(
        "country",
        "n_pairs",
        "sum_dist_m",
        "diameter_m",
        F.expr("CAST(sum_dist_m AS DOUBLE) / CAST(n_pairs AS DOUBLE)").alias(
            "mean_dist_m"
        ),
    ).orderBy("country")


_GUM = {
    "m": "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))",
    "sd": (
        "sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"
    ),
}
_GUM_BETA = f"({_GUM['sd']} * sqrt(6.0) / pi())"
_GUM_MU = f"({_GUM['m']} - {_EULER_GAMMA} * {_GUM_BETA})"
_GUM_RL = (
    f"({_GUM_MU} - {_GUM_BETA}"
    f" * ln(-ln(1.0 - 1.0 / CAST({_GUMBEL_T} AS DOUBLE))))"
)


def gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32e — Gumbel extreme-value return level for the daily MAXIMUM
    purchase value: method-of-moments fit (beta = s*sqrt(6)/pi, mu =
    m - gamma*beta) over the block maxima, reporting the 100-day
    return level — "what single-purchase size should we expect once
    per hundred days", the EVT question p99 quantiles under-answer.
    Exact BIGINT block-maxima moments; mu/beta/return level through
    fixed-order shared expression strings.

    Scale: one day-grain max aggregate + one moment reduce."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily_max = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.max(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    )
    agg = daily_max.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    return agg.select(
        "n",
        "s",
        "q",
        F.expr(_GUM_MU).alias("gumbel_mu_centi"),
        F.expr(_GUM_BETA).alias("gumbel_beta_centi"),
        F.expr(_GUM_RL).alias("return_level_centi"),
    )


_MOM = {
    "m": "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))",
}
_MOM_M2 = (
    "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - {_MOM['m']} * {_MOM['m']})"
)
_MOM_M3 = (
    "(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * {_MOM['m']} * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" + 2.0 * {_MOM['m']} * {_MOM['m']} * {_MOM['m']})"
)
_MOM_M4 = (
    "(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4.0 * {_MOM['m']} * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" + 6.0 * {_MOM['m']} * {_MOM['m']}"
    " * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * {_MOM['m']} * {_MOM['m']} * {_MOM['m']} * {_MOM['m']})"
)
_SKEW = f"({_MOM_M3} / pow({_MOM_M2}, 1.5))"
_KURT = f"({_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3.0)"


def moment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T32f — higher-moment profile (skewness, excess kurtosis) of
    event value per type, from the four exact BIGINT raw power sums on
    the WHOLE-DOLLAR grain (so sum(x^4) fits BIGINT at sf 1000 —
    documented grain choice, value <= ~10^3 dollars); central moments
    and both shape statistics evaluate fixed-order shared expression
    strings — the distribution-shape sibling of the mean/variance
    profiles (t18) and the Pythagorean means (t31).

    Scale: one scan, one keyed aggregate with four accumulators."""
    ev = _events(spark, sf_dir)
    x = F.expr("CAST(floor(value) AS BIGINT)")
    base = ev.select("event_type", x.alias("x"))
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("long").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("s4"),
    )
    return agg.select(
        "event_type",
        "n",
        "s1",
        "s2",
        F.expr(_SKEW).alias("skewness"),
        F.expr(_KURT).alias("excess_kurtosis"),
    ).orderBy("event_type")


QUERIES = {
    "t32_holt_backtest": holt_backtest,
    "t32_welch_t_test": welch_t_test,
    "t32_activity_streaks": activity_streaks,
    "t32_geo_dispersion": geo_dispersion,
    "t32_gumbel_return_level": gumbel_return_level,
    "t32_moment_profile": moment_profile,
}

_HOLT_VALUES = ", ".join(
    f"({t}, {i}, {cl}, {cb}, {p4})" for t, i, cl, cb, p4 in _HOLT_COEFS
)

ORACLE = {
    "t32_holt_backtest": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY day DESC LIMIT {_HOLT_DAYS}
        ),
        idx AS (
            SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
                   CAST(x AS BIGINT) AS x
            FROM daily
        ),
        coefs(t, i, c_l, c_b, p4) AS (VALUES {_HOLT_VALUES}),
        s AS (
            SELECT t, p4,
                   SUM(c_l * x) AS sl, SUM(c_b * x) AS sb
            FROM idx JOIN coefs USING (i)
            GROUP BY 1, 2
        ),
        err AS (
            SELECT s.t, p4 * n.x - (sl + sb) AS e_num, p4
            FROM s JOIN (SELECT i - 1 AS t, x FROM idx) n USING (t)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_fc,
               CAST(SUM(abs(e_num) * ({4 ** (_HOLT_DAYS - 1)} // p4))
                    AS BIGINT) AS mae_num,
               {_HOLT_MAE.replace("mae_num",
                   f"CAST(SUM(abs(e_num) * ({4 ** (_HOLT_DAYS - 1)} // p4)) AS BIGINT)")
                .replace("n_fc", "CAST(COUNT(*) AS BIGINT)")} AS mae_cents
        FROM err
    """,
    "t32_welch_t_test": f"""
        WITH base AS (
            SELECT event_type = 'purchase' AS g,
                   CAST(round(value * 100, 0) AS BIGINT) AS x
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        agg AS (
            SELECT CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN g THEN x ELSE 0 END) AS BIGINT) AS s1,
                   CAST(SUM(CASE WHEN g THEN 0 ELSE x END) AS BIGINT) AS s2,
                   CAST(SUM(CASE WHEN g THEN x * x ELSE 0 END) AS BIGINT)
                       AS q1,
                   CAST(SUM(CASE WHEN g THEN 0 ELSE x * x END) AS BIGINT)
                       AS q2
            FROM base
        )
        SELECT n1, n2, {_WELCH_T} AS t_stat, {_WELCH_DOF} AS dof,
               {_COHEN_D} AS cohen_d
        FROM agg
    """,
    "t32_activity_streaks": f"""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        islands AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INTEGER)
                       AS isl
            FROM days
        ),
        streaks AS (
            SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(day) AS start_day
            FROM islands GROUP BY 1, 2
        ),
        best AS (
            SELECT user_id, len AS streak_days, start_day,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY len DESC, start_day ASC) AS rn
            FROM streaks
        )
        SELECT user_id, streak_days, start_day
        FROM best WHERE rn = 1
        ORDER BY streak_days DESC, user_id ASC LIMIT {_STREAK_TOP_K}
    """,
    "t32_gumbel_return_level": f"""
        WITH daily_max AS (
            SELECT CAST(ts AS DATE) AS day,
                   MAX(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM daily_max
        )
        SELECT n, s, q, {_GUM_MU} AS gumbel_mu_centi,
               {_GUM_BETA} AS gumbel_beta_centi,
               {_GUM_RL} AS return_level_centi
        FROM agg
    """,
    "t32_moment_profile": f"""
        WITH base AS (
            SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM events
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s1,
                   CAST(SUM(x * x) AS BIGINT) AS s2,
                   CAST(SUM(x * x * x) AS BIGINT) AS s3,
                   CAST(SUM(x * x * x * x) AS BIGINT) AS s4
            FROM base GROUP BY 1
        )
        SELECT event_type, n, s1, s2, {_SKEW} AS skewness,
               {_KURT} AS excess_kurtosis
        FROM agg ORDER BY event_type
    """,
}


def _oracle_geo_dispersion() -> str:
    return f"""
        {_users_view()},
        pairs AS (
            SELECT a.country,
                   a.latitude AS lat1, a.longitude AS lon1,
                   b.latitude AS lat2, b.longitude AS lon2
            FROM users a JOIN users b
              ON a.country = b.country AND a.user_key < b.user_key
        ),
        scored AS (SELECT country, {_DIST_M} AS dist_m FROM pairs),
        agg AS (
            SELECT country,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(dist_m) AS BIGINT) AS sum_dist_m,
                   CAST(MAX(dist_m) AS BIGINT) AS diameter_m
            FROM scored GROUP BY 1
        )
        SELECT country, n_pairs, sum_dist_m, diameter_m,
               CAST(sum_dist_m AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                   AS mean_dist_m
        FROM agg ORDER BY country
    """


ORACLE["t32_geo_dispersion"] = _oracle_geo_dispersion()

"""Experimentation-hygiene / survival / signal-processing pack (T34):
discrete-time weekly hazard table for time-to-second-purchase (the
life-table complement of the t22 Kaplan-Meier curve), sample-ratio-
mismatch (SRM) chi-square checks of the deterministic A/B hash split,
strict local-maximum peak detection over the hourly event series,
weekday-deseasonalized anomaly days, and the inter-arrival
burstiness coefficient per event type.

Reference anchors (SURVEY §2): the reference's timestamped listens /
events and the engine's A/B family (z-test t19, CUPED t24) get their
missing guardrail (SRM is the FIRST thing a trustworthy experiment
platform checks); the hazard table prices the same repeat-purchase
gaps t22's KM curve plots; peaks/deseasonalization/burstiness extend
the time-series family over the same day/hour aggregates the
reference delegates to its warehouses.

Scale notes (100 TB):
- hazard: one user-grain gap pass -> a |weeks|-row life table; the
  at-risk count is a reverse running sum, hazard = (d*1e6) DIV
  at_risk exact micro.
- SRM: two conditional-count aggregates over the md5-parity split
  (the SAME seedless hash as the t19 z-test); chi-square from exact
  cell counts via one shared expression per config.
- peaks: one (day, hour) aggregate + one lag/lead window over the
  bounded hourly grid.
- deseason: the per-weekday moments join back broadcast; the
  deviation (n_g*x - s_g) is an exact scaled BIGINT, normalized to
  micro only for the cross-group ranking.
- burstiness: one per-type lag window for gaps + exact moments; the
  coefficient evaluates one shared expression string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_PEAK_TOP_K = 10
_ANOM_TOP_K = 10
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def discrete_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34a — discrete-time weekly hazard table for time-to-second-
    purchase: per week k the users still at risk (no second purchase
    before week k, not yet censored), the second purchases landing in
    week k, and the hazard (d * 1e6) DIV at_risk in exact micro —
    the life-table view whose cumulative product is the t22
    Kaplan-Meier curve. Users with one purchase censor at the global
    observation end (same convention as t22). Week = gap days DIV 7.

    Scale: one purchase-grain user window -> one user row each -> a
    |weeks|-row table; at-risk is a reverse cumulative sum."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    first = seq.filter(F.col("rn") == 1).select(
        "user_id", F.col("d").alias("d1")
    )
    second = seq.filter(F.col("rn") == 2).select(
        "user_id", F.col("d").alias("d2")
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("hz"))
    users = (
        first.join(second, "user_id", "left")
        .join(F.broadcast(horizon))
        .select(
            F.when(
                F.col("d2").isNotNull(),
                F.expr("datediff(d2, d1) DIV 7"),
            )
            .otherwise(F.expr("datediff(hz, d1) DIV 7"))
            .cast("long")
            .alias("week"),
            F.col("d2").isNotNull().alias("event"),
        )
    )
    per_week = users.groupBy("week").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    at_risk_w = (
        Window.orderBy(F.desc("week")).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    table = per_week.select(
        "week",
        "d",
        F.sum("leaving").over(at_risk_w).cast("long").alias("at_risk"),
    )
    return table.select(
        "week",
        "at_risk",
        "d",
        F.expr(f"(d * {_MICRO}) DIV at_risk").alias("hazard_micro"),
    ).orderBy("week")


_SRM_CHI2 = {
    2: (
        "(CAST((c0 - c1) * (c0 - c1) AS DOUBLE)"
        " / CAST(c0 + c1 AS DOUBLE))"
    ),
    4: (
        "(CAST(4 * (c0 * c0 + c1 * c1 + c2 * c2 + c3 * c3) AS DOUBLE)"
        " / CAST(n AS DOUBLE) - CAST(n AS DOUBLE))"
    ),
}


def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34b — sample-ratio-mismatch check of the deterministic A/B
    assignment (SAME seedless md5-parity hash as the t19 z-test and
    a 4-bucket mod-4 variant): chi-square goodness of fit of the
    observed user counts against the designed uniform split — THE
    first guardrail a trustworthy experimentation platform runs
    before reading any metric. Cell counts are exact; each chi-square
    evaluates one shared expression string (the 4-cell form
    4*sum(c^2)/n - n is the algebraic identity, no per-cell doubles).

    Scale: one distinct-user pass, two conditional-count rows."""
    ev = _events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    h = F.expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    tagged = users.select((h % 4).alias("b4"), (h % 2).alias("b2"))
    two = tagged.agg(
        F.lit(2).cast("long").alias("k_cells"),
        F.sum(F.when(F.col("b2") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("b2") == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.lit(0).cast("long").alias("c2"),
        F.lit(0).cast("long").alias("c3"),
    ).select(
        "k_cells",
        "c0",
        "c1",
        "c2",
        "c3",
        (F.col("c0") + F.col("c1")).alias("n"),
        F.expr(_SRM_CHI2[2]).alias("chi2"),
    )
    four = tagged.agg(
        F.lit(4).cast("long").alias("k_cells"),
        *[
            F.sum(F.when(F.col("b4") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
            for i in range(4)
        ],
    ).select(
        "k_cells",
        "c0",
        "c1",
        "c2",
        "c3",
        (F.col("c0") + F.col("c1") + F.col("c2") + F.col("c3")).alias("n"),
        F.expr(_SRM_CHI2[4]).alias("chi2"),
    )
    return two.unionByName(four).orderBy("k_cells")


def hourly_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34c — strict local-maximum peak detection over the hourly
    total-event series: hours whose count strictly exceeds both
    neighbors, with prominence = count - max(neighbors); top-10 by
    (count desc, hour asc) — the signal-processing primitive under
    every "traffic spike" alert. Exact integers throughout.

    Scale: one (hour bucket) aggregate + one lag/lead pass over the
    bounded hourly grid."""
    ev = _events(spark, sf_dir)
    # timestamp_ntz export: the driver compares naive timestamps
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias(
            "hour_ts"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.orderBy("hour_ts")
    nb = hourly.select(
        "hour_ts",
        "x",
        F.lag("x").over(w).alias("prev"),
        F.lead("x").over(w).alias("nxt"),
    )
    peaks = nb.filter(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("x") > F.col("prev"))
        & (F.col("x") > F.col("nxt"))
    )
    return (
        peaks.select(
            "hour_ts",
            "x",
            (F.col("x") - F.greatest("prev", "nxt"))
            .cast("long")
            .alias("prominence"),
        )
        .orderBy(F.desc("x"), "hour_ts")
        .limit(_PEAK_TOP_K)
    )


def deseason_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34d — weekday-deseasonalized anomaly days: each day's count
    deviates from ITS WEEKDAY's mean (the t29 ANOVA groups); the
    deviation n_g*x - s_g is an exact scaled BIGINT, normalized to
    floored micro ((dev * 1e6) DIV n_g) only to rank across groups;
    top-10 days by absolute deviation — the anomaly list the plain
    z-score (t19) pollutes with weekly seasonality.

    Scale: one day aggregate + a 7-row broadcast of weekday moments."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    wd = daily.select(
        "day",
        "x",
        F.expr(
            "CASE WHEN dayofweek(day) = 1 THEN 7 ELSE dayofweek(day) - 1 END"
        )
        .cast("long")
        .alias("g"),
    )
    gm = wd.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
    )
    dev = wd.join(F.broadcast(gm), "g").select(
        "day",
        "g",
        "x",
        F.expr(f"((n_g * x - s_g) * {_MICRO}) DIV n_g").alias("dev_micro"),
    )
    return (
        dev.select(
            "day",
            F.col("g").alias("iso_weekday"),
            "x",
            "dev_micro",
            F.abs(F.col("dev_micro")).alias("abs_dev_micro"),
        )
        .orderBy(F.desc("abs_dev_micro"), "day")
        .limit(_ANOM_TOP_K)
    )


_BURST_B = (
    "((sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"
    " - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    " / (sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"
    " + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))"
)


def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T34e — inter-arrival burstiness coefficient per event type:
    B = (sigma - mu)/(sigma + mu) over the microsecond gaps between
    consecutive events of the type (-1 = perfectly periodic, 0 =
    Poisson, -> 1 = extremely bursty; Goh & Barabasi) — the
    arrival-process twin of the daily-count Fano factor (t27). Gap
    moments are exact BIGINT micros; B is one shared expression.

    Scale: one per-type lag window + one moment aggregate; gaps never
    leave integer microseconds."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = (
        ev.select("event_type", us.alias("us"), "event_id")
        .select(
            "event_type",
            # whole seconds: squared microsecond gaps would overflow
            # BIGINT (1e10us gap -> 1e20)
            F.expr("(us - lag(us) OVER (PARTITION BY event_type"
                   " ORDER BY us, event_id)) DIV 1000000").alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("q"),
    )
    return agg.select(
        "event_type", "n", F.expr(_BURST_B).alias("burstiness")
    ).orderBy("event_type")


QUERIES = {
    "t34_discrete_hazard": discrete_hazard_table,
    "t34_srm_check": srm_check,
    "t34_hourly_peaks": hourly_peaks,
    "t34_deseason_anomaly_days": deseason_anomaly_days,
    "t34_interarrival_burstiness": interarrival_burstiness,
}

ORACLE = {
    "t34_discrete_hazard": f"""
        WITH p AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase'
        ),
        first AS (SELECT user_id, d AS d1 FROM p WHERE rn = 1),
        second AS (SELECT user_id, d AS d2 FROM p WHERE rn = 2),
        hz AS (
            SELECT MAX(CAST(ts AS DATE)) AS hz FROM events
            WHERE event_type = 'purchase'
        ),
        users AS (
            SELECT CASE WHEN s.d2 IS NOT NULL
                        THEN datediff('day', f.d1, s.d2) // 7
                        ELSE datediff('day', f.d1, hz.hz) // 7 END AS week,
                   s.d2 IS NOT NULL AS event
            FROM first f LEFT JOIN second s USING (user_id) CROSS JOIN hz
        ),
        per_week AS (
            SELECT week,
                   CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
                       AS d,
                   COUNT(*) AS leaving
            FROM users GROUP BY 1
        ),
        tbl AS (
            SELECT CAST(week AS BIGINT) AS week, d,
                   CAST(SUM(leaving) OVER (ORDER BY week DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk
            FROM per_week
        )
        SELECT week, at_risk, d,
               CAST((d * {_MICRO}) // at_risk AS BIGINT) AS hazard_micro
        FROM tbl ORDER BY week
    """,
    "t34_srm_check": f"""
        WITH users AS (SELECT DISTINCT user_id FROM events),
        tagged AS (
            SELECT (('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT)
                       % 4 AS b4,
                   (('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT)
                       % 2 AS b2
            FROM users
        ),
        two AS (
            SELECT CAST(2 AS BIGINT) AS k_cells,
                   CAST(SUM(CASE WHEN b2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c0,
                   CAST(SUM(CASE WHEN b2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c1,
                   CAST(0 AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3
            FROM tagged
        ),
        four AS (
            SELECT CAST(4 AS BIGINT) AS k_cells,
                   CAST(SUM(CASE WHEN b4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c0,
                   CAST(SUM(CASE WHEN b4 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c1,
                   CAST(SUM(CASE WHEN b4 = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c2,
                   CAST(SUM(CASE WHEN b4 = 3 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c3
            FROM tagged
        )
        SELECT k_cells, c0, c1, c2, c3, c0 + c1 AS n,
               {_SRM_CHI2[2]} AS chi2
        FROM two
        UNION ALL
        SELECT k_cells, c0, c1, c2, c3, c0 + c1 + c2 + c3 AS n,
               {_SRM_CHI2[4]} AS chi2
        FROM four
        ORDER BY k_cells
    """,
    "t34_hourly_peaks": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour_ts,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        nb AS (
            SELECT hour_ts, x,
                   lag(x) OVER (ORDER BY hour_ts) AS prev,
                   lead(x) OVER (ORDER BY hour_ts) AS nxt
            FROM hourly
        )
        SELECT hour_ts, x,
               CAST(x - GREATEST(prev, nxt) AS BIGINT) AS prominence
        FROM nb
        WHERE prev IS NOT NULL AND nxt IS NOT NULL
              AND x > prev AND x > nxt
        ORDER BY x DESC, hour_ts ASC LIMIT {_PEAK_TOP_K}
    """,
    "t34_deseason_anomaly_days": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        wd AS (
            SELECT day, x, CAST(isodow(day) AS BIGINT) AS g FROM daily
        ),
        gm AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(x) AS BIGINT) AS s_g
            FROM wd GROUP BY 1
        ),
        dev AS (
            SELECT day, wd.g AS iso_weekday, x,
                   CAST(((n_g * x - s_g) * {_MICRO}) // n_g AS BIGINT)
                       AS dev_micro
            FROM wd JOIN gm ON wd.g = gm.g
        )
        SELECT day, iso_weekday, x, dev_micro,
               CAST(abs(dev_micro) AS BIGINT) AS abs_dev_micro
        FROM dev
        ORDER BY abs_dev_micro DESC, day ASC LIMIT {_ANOM_TOP_K}
    """,
    "t34_interarrival_burstiness": f"""
        WITH gaps AS (
            SELECT event_type,
                   (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type ORDER BY epoch_us(ts), event_id
                   )) // 1000000 AS gap
            FROM events
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(gap) AS BIGINT) AS s,
                   CAST(SUM(gap * gap) AS BIGINT) AS q
            FROM gaps WHERE gap IS NOT NULL GROUP BY 1
        )
        SELECT event_type, n, {_BURST_B} AS burstiness
        FROM agg ORDER BY event_type
    """,
}

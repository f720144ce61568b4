"""Kruskal-Wallis / Brown-Forsythe / periodogram pack (T58): the
Kruskal-Wallis k-group rank test (does VALUE differ across ALL five
event types — the k-sample generalization of the t26 Mann-Whitney),
the Brown-Forsythe variance-homogeneity test (equal SPREAD across
types — the assumption the t29 ANOVA quietly makes, checked with the
robust median-deviation variant), and the FULL periodogram of the
last-30-day revenue series with spectral flatness (every frequency,
not just the weekly line the t39 Goertzel probe reads — flatness ≈ 1
means white noise, ≈ 0 means one dominant rhythm).

Reference anchors (SURVEY §2): KW reuses the exact 2·rank midrank
discipline of t26 MW; BF composes per-group exact medians with the
t29 fixed-order ANOVA moments; the periodogram extends the t39/t44
python-literal trig discipline to the full frequency grid.

Scale notes (100 TB):
- KW: the rank pass runs on the distinct-value grid with per-group
  counts; H folds from the 5 pivoted group moments through ONE
  fixed-order expression (groups are literal, so no order-dependent
  double sum exists).
- BF: one type-keyed median rank pick + one deviation aggregate;
  the F statistic is a fixed-order expression over the 5 pivoted
  moment sets.
- periodogram: the (k, t) trig spine is 420 python-literal micro
  coefficients (shared verbatim); projections fold as EXACT integer
  sums (x·cos_micro per term); powers compare as exact integers on
  the milli grain, so the dominant frequency is never a double
  decision; flatness is one shared expression over two integer sums.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_TYPES = ("click", "error", "purchase", "signup", "view")
_PERIOD_N = 30  # last N days of the daily series (corpus spans ~30 days)
_PERIOD_KS = tuple(range(1, 15))  # frequencies 1..14 (below Nyquist)

# python-literal trig spine: micro-scaled cos/sin(2*pi*k*t/N), shared
# verbatim by both engines
_TRIG = tuple(
    (k, t,
     round(math.cos(2 * math.pi * k * t / _PERIOD_N) * _MICRO),
     round(math.sin(2 * math.pi * k * t / _PERIOD_N) * _MICRO))
    for k in _PERIOD_KS
    for t in range(_PERIOD_N)
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T58a: Kruskal-Wallis k-group rank test ------------------------------------------

_KW_RSUM = " + ".join(
    f"(CAST(two_r_{t} AS DOUBLE) * CAST(two_r_{t} AS DOUBLE)"
    f" / (4.0 * CAST(n_{t} AS DOUBLE)))"
    for t in _TYPES
)
_KW_H = (
    f"((12.0 / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))"
    f" * ({_KW_RSUM}) - 3.0 * CAST(nn + 1 AS DOUBLE))"
    " / (1.0 - CAST(tie_t AS DOUBLE)"
    " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
    " - CAST(nn AS DOUBLE))))"
)


def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T58a — Kruskal-Wallis test across ALL five event types: do the
    value distributions differ anywhere? Midranks stay exact as
    2·rank on the distinct-value grid (the t26 MW discipline,
    per-group); H folds through ONE fixed-order expression over the
    five literal groups' (2·ranksum, n) pairs with the standard tie
    correction — no order-dependent double sum exists because the
    groups are enumerated literally. Under H₀, H ~ χ²(4).

    Scale: one distinct-value aggregate with per-group counts; one
    cumulative window on that compressed grid; one pivot row."""
    ev = _events(spark, sf_dir)
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    counts = ev.select(
        centi.alias("v"),
        *[
            F.when(F.col("event_type") == t, 1).otherwise(0).alias(f"g_{t}")
            for t in _TYPES
        ],
    ).groupBy("v").agg(
        *[F.sum(f"g_{t}").cast("long").alias(f"c_{t}") for t in _TYPES]
    )
    total = " + ".join(f"c_{t}" for t in _TYPES)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.select(
        *[F.col(f"c_{t}") for t in _TYPES],
        F.expr(total).alias("c"),
        F.coalesce(F.sum(F.expr(total)).over(w), F.lit(0)).alias(
            "cum_before"
        ),
    )
    aggs = [
        F.sum(F.expr(f"c_{t}")).cast("long").alias(f"n_{t}")
        for t in _TYPES
    ] + [
        F.sum(F.expr(f"c_{t} * (2 * cum_before + c + 1)"))
        .cast("long")
        .alias(f"two_r_{t}")
        for t in _TYPES
    ] + [
        F.sum(F.expr("c * c * c - c")).cast("long").alias("tie_t"),
        F.sum("c").cast("long").alias("nn"),
    ]
    mom = ranked.agg(*aggs)
    return mom.select(
        "nn",
        "tie_t",
        *[F.col(f"n_{t}") for t in _TYPES],
        F.expr(_KW_H).alias("kw_h"),
    )


# --- T58b: Brown-Forsythe variance homogeneity ----------------------------------------

_BF_GROUP_MEAN = {
    t: f"(CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE))" for t in _TYPES
}
_BF_GRAND = (
    "(CAST(" + " + ".join(f"s_{t}" for t in _TYPES) + " AS DOUBLE)"
    " / CAST(" + " + ".join(f"n_{t}" for t in _TYPES) + " AS DOUBLE))"
)
_BF_SSB = " + ".join(
    f"(CAST(n_{t} AS DOUBLE)"
    f" * ({_BF_GROUP_MEAN[t]} - {_BF_GRAND})"
    f" * ({_BF_GROUP_MEAN[t]} - {_BF_GRAND}))"
    for t in _TYPES
)
_BF_SSW = " + ".join(
    f"(CAST(q_{t} AS DOUBLE) - CAST(s_{t} AS DOUBLE)"
    f" * CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE))"
    for t in _TYPES
)
_BF_NTOT = "CAST(" + " + ".join(f"n_{t}" for t in _TYPES) + " AS DOUBLE)"
_BF_F = (
    f"((({_BF_SSB}) / {len(_TYPES) - 1}.0)"
    f" / (({_BF_SSW}) / ({_BF_NTOT} - {len(_TYPES)}.0)))"
)


def brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T58b — Brown-Forsythe variance-homogeneity test: one-way ANOVA
    on |value − group median| across the five event types (the
    median-based Levene variant — robust to the heavy tails the mean
    version chokes on). Group medians are exact lower-median rank
    picks; deviations are exact centi integers; SSB/SSW/F fold through
    fixed-order expressions over the five literal groups' exact
    moments (the t29 discipline). Large F ⇒ the spreads differ and the
    plain ANOVA's pooled-variance story is broken.

    Scale: one type-keyed rank window for the medians + one deviation
    aggregate; the pivot is one row."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("x"),
    )
    wmed = Window.partitionBy("event_type").orderBy("x", "event_id")
    med = (
        ev.select(
            "event_type",
            "x",
            F.row_number().over(wmed).cast("long").alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .cast("long")
            .alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("x").alias("med"))
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    aggs = []
    for t in _TYPES:
        flt = F.when(F.col("event_type") == t, F.col("z"))
        aggs += [
            F.count(flt).cast("long").alias(f"n_{t}"),
            F.sum(F.coalesce(flt, F.lit(0))).cast("long").alias(f"s_{t}"),
            F.sum(
                F.coalesce(flt * F.col("z"), F.lit(0))
            ).cast("long").alias(f"q_{t}"),
        ]
    mom = dev.agg(*aggs)
    return mom.select(
        *[F.col(f"n_{t}") for t in _TYPES],
        *[F.col(f"s_{t}") for t in _TYPES],
        F.expr(_BF_F).alias("bf_f"),
    )


# --- T58c: full periodogram + spectral flatness ------------------------------------------

_FLATNESS = (
    "(exp(CAST(lnsum AS DOUBLE) / (14.0 * 1000000.0))"
    " / (CAST(powsum AS DOUBLE) / 14.0))"
)


def periodogram_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T58c — the FULL periodogram of the last 30 days of daily
    revenue (hecto-dollars): power at every frequency k = 1..14 via
    exact integer projections (per-term x·cos_micro products summed —
    integer sums commute, so no order-dependent double ever folds),
    with the dominant frequency decided by EXACT integer power
    comparison on the milli-projection grain, and Wiener spectral
    flatness (geometric/arithmetic mean power; per-k ln terms floored
    to micro-nats) as the one-number verdict: ≈1 white noise, →0 one
    dominant rhythm. The t39 Goertzel probe answers "how strong is
    weekly"; this answers "what rhythms exist at all".

    Scale: the 420-row literal trig spine joins the 30-row series —
    everything after the one daily aggregate is constant-sized."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "SUM(CAST(round(value * 100, 0) AS BIGINT)) DIV 10000"
        ).alias("x")
    )
    wd = Window.orderBy(F.desc("day"))
    series = (
        daily.select(
            "x", F.row_number().over(wd).cast("long").alias("rdesc")
        )
        .filter(F.col("rdesc") <= _PERIOD_N)
        .select(F.expr(f"{_PERIOD_N} - rdesc").alias("t"), "x")
    )
    spark_ = series.sparkSession
    spine = spark_.createDataFrame(
        list(_TRIG), "k long, t long, cm long, sm long"
    )
    proj = (
        spine.join(F.broadcast(series), "t")
        .groupBy("k")
        .agg(
            F.sum(F.expr("x * cm")).cast("long").alias("pc"),
            F.sum(F.expr("x * sm")).cast("long").alias("ps"),
        )
        .select(
            "k",
            "pc",
            "ps",
            # milli-grain power: exact BIGINT, the comparison currency
            F.expr(
                "(pc DIV 1000000) * (pc DIV 1000000)"
                " + (ps DIV 1000000) * (ps DIV 1000000)"
            ).alias("power_scaled"),
        )
        .localCheckpoint(eager=True)
    )
    tot = proj.agg(
        F.sum("power_scaled").cast("long").alias("powsum"),
        F.sum(
            F.expr(
                "CASE WHEN power_scaled > 0 THEN"
                " CAST(floor(1000000.0"
                " * ln(CAST(power_scaled AS DOUBLE))) AS BIGINT)"
                " ELSE 0 END"
            )
        ).cast("long").alias("lnsum"),
        F.max("power_scaled").alias("maxp"),
    )
    return (
        proj.join(F.broadcast(tot))
        .select(
            "k",
            "pc",
            "ps",
            "power_scaled",
            (F.col("power_scaled") == F.col("maxp")).alias("dominant"),
            F.expr(_FLATNESS).alias("spectral_flatness"),
        )
        .orderBy("k")
    )


QUERIES = {
    "t58_kruskal_wallis": kruskal_wallis,
    "t58_brown_forsythe": brown_forsythe,
    "t58_periodogram_flatness": periodogram_flatness,
}

_TRIG_VALUES = ", ".join(f"({k}, {t}, {c}, {s})" for k, t, c, s in _TRIG)

ORACLE = {
    "t58_kruskal_wallis": f"""
        WITH counts AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN event_type = '{t}'"
                       f" THEN 1 ELSE 0 END) AS BIGINT) AS c_{t}"
                       for t in _TYPES
                   )}
            FROM events GROUP BY 1
        ),
        ranked AS (
            SELECT *,
                   {" + ".join(f"c_{t}" for t in _TYPES)} AS c,
                   COALESCE(SUM({" + ".join(f"c_{t}" for t in _TYPES)})
                       OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cum_before
            FROM counts
        ),
        mom AS (
            SELECT {", ".join(
                       f"CAST(SUM(c_{t}) AS BIGINT) AS n_{t}"
                       for t in _TYPES
                   )},
                   {", ".join(
                       f"CAST(SUM(c_{t} * (2 * cum_before + c + 1))"
                       f" AS BIGINT) AS two_r_{t}"
                       for t in _TYPES
                   )},
                   CAST(SUM(c * c * c - c) AS BIGINT) AS tie_t,
                   CAST(SUM(c) AS BIGINT) AS nn
            FROM ranked
        )
        SELECT nn, tie_t, {", ".join(f"n_{t}" for t in _TYPES)},
               {_KW_H} AS kw_h
        FROM mom
    """,
    "t58_brown_forsythe": f"""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS x
            FROM events
        ),
        med AS (
            SELECT event_type, x AS med FROM (
                SELECT event_type, x,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY x, event_id) AS rk,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM ev
            ) WHERE rk = (n + 1) // 2
        ),
        dev AS (
            SELECT ev.event_type, abs(ev.x - med.med) AS z
            FROM ev JOIN med USING (event_type)
        ),
        mom AS (
            SELECT {", ".join(
                       f"CAST(SUM(CASE WHEN event_type = '{t}'"
                       f" THEN 1 ELSE 0 END) AS BIGINT) AS n_{t},"
                       f" CAST(SUM(CASE WHEN event_type = '{t}'"
                       f" THEN z ELSE 0 END) AS BIGINT) AS s_{t},"
                       f" CAST(SUM(CASE WHEN event_type = '{t}'"
                       f" THEN z * z ELSE 0 END) AS BIGINT) AS q_{t}"
                       for t in _TYPES
                   )}
            FROM dev
        )
        SELECT {", ".join(f"n_{t}" for t in _TYPES)},
               {", ".join(f"s_{t}" for t in _TYPES)},
               {_BF_F} AS bf_f
        FROM mom
    """,
    "t58_periodogram_flatness": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) // 10000 AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        series AS (
            SELECT {_PERIOD_N} - rdesc AS t, x FROM (
                SELECT x, row_number() OVER (ORDER BY day DESC) AS rdesc
                FROM daily
            ) WHERE rdesc <= {_PERIOD_N}
        ),
        spine(k, t, cm, sm) AS (VALUES {_TRIG_VALUES}),
        proj AS (
            SELECT k,
                   CAST(SUM(x * cm) AS BIGINT) AS pc,
                   CAST(SUM(x * sm) AS BIGINT) AS ps,
                   CAST((SUM(x * cm) // 1000000) * (SUM(x * cm) // 1000000)
                        + (SUM(x * sm) // 1000000)
                          * (SUM(x * sm) // 1000000) AS BIGINT)
                       AS power_scaled
            FROM spine JOIN series USING (t)
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(power_scaled) AS BIGINT) AS powsum,
                   CAST(SUM(CASE WHEN power_scaled > 0 THEN
                       CAST(floor(1000000.0
                            * ln(CAST(power_scaled AS DOUBLE)))
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS lnsum,
                   CAST(MAX(power_scaled) AS BIGINT) AS maxp
            FROM proj
        )
        SELECT k, pc, ps, power_scaled,
               power_scaled = maxp AS dominant,
               {_FLATNESS} AS spectral_flatness
        FROM proj CROSS JOIN tot
        ORDER BY k
    """,
}

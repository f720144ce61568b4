"""Weighted-graph / correlation-structure / nonparametric pack (T29):
bounded Bellman-Ford weighted shortest paths over the co-purchase
graph, the cross-type correlation + lead-lag (lag-1) matrix of daily
event counts, one-way ANOVA of the weekday effect on daily volume,
the Wald-Wolfowitz runs test for randomness of the daily revenue
series, and a Q-Q decile drift table between the two halves of the
purchase history.

Reference anchors (SURVEY §2): the grouped daily aggregates the
reference delegates to its warehouses (`AmazonRedshift.java:522-535`
date-bucketed counts) are exactly the series these five analyses
consume; the weighted shortest path extends the unweighted BFS (t20)
with the inverse-support edge length every product-graph walk
actually uses.

Scale notes (100 TB):
- Bellman-Ford: 3 unrolled relax rounds, each ONE edges-to-distance
  join + vertex-keyed min — the bounded-iteration discipline; edge
  weights are exact integer micro-lengths (1e6 DIV co_count), no
  floats in the min.
- correlation matrix: all moments are n-scaled BIGINTs from one
  (type, day) aggregate; the 5x5 pair join runs on the day-grain
  series, never events.
- ANOVA: the 7 weekday groups pivot to ONE row of exact BIGINT
  moments, so the F statistic is a single fixed-order expression
  string (no order-dependent double sums).
- runs test / Q-Q: rank picks on the day/value grain; medians and
  deciles are exact order statistics (no interpolation), z via one
  shared expression string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_BF_ROUNDS = 3
_WEEKDAYS = tuple(range(1, 8))  # ISO dayofweek 1=Mon..7=Sun


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase edges with exact integer micro-length 1e6 DIV
    co_order_count (more co-orders = shorter edge) — the t19/t20/t25
    graph, weighted."""
    from bigdatamanagement_spark.queries.analytics7 import (
        copurchase_weighted_pairs,
    )

    return (
        copurchase_weighted_pairs(spark, sf_dir)
        .filter(F.col("c") >= 2)
        .select("a", "b", F.expr("1000000 DIV c").alias("w"))
    )


def bellman_ford_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29a — bounded Bellman-Ford weighted shortest paths on the
    co-purchase graph from its most-connected part (max degree, min id
    tiebreak): edge length = 1e6 DIV co_order_count (stronger
    affinity = shorter), 3 relax rounds, reporting per round the
    reached-vertex count and the exact sum and max of shortest
    distances — the weighted upgrade of the unweighted BFS (t20) that
    ranks "how close is everything to the catalog's hub".

    Scale: a relax round = ONE edges-to-frontier join + a vertex-keyed
    min; distances are exact BIGINT micro-lengths (never a float in
    the min); the 3-round unroll is the bounded-iteration
    discipline."""
    edges = _weighted_edges(spark, sf_dir).localCheckpoint()
    bidir = edges.unionByName(
        edges.select(
            F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
        )
    ).localCheckpoint()
    deg = bidir.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    src = deg.agg(
        F.min(
            F.struct((-F.col("d")).alias("nd"), F.col("a").alias("v"))
        ).getField("v").alias("src")
    )
    dist = (
        src.select(F.col("src").alias("v"), F.lit(0).cast("long").alias("d"))
        .localCheckpoint()
    )
    outs = []
    for rnd in range(1, _BF_ROUNDS + 1):
        relaxed = (
            bidir.join(dist.withColumnRenamed("v", "a"), "a")
            .select(F.col("b").alias("v"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
        outs.append(
            dist.agg(
                F.lit(rnd).cast("long").alias("round"),
                F.count(F.lit(1)).cast("long").alias("n_reached"),
                F.sum("d").cast("long").alias("sum_dist_micro"),
                F.max("d").cast("long").alias("max_dist_micro"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("round")


_CORR_R = (
    "(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
    " * CAST(n * syy - sy * sy AS DOUBLE)))"
)


def corr_leadlag_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29b — cross-type correlation and lead-lag matrix of the daily
    event-count series: Pearson r for every unordered type pair at lag
    0 and every ORDERED pair at lag 1 (does A today predict B
    tomorrow? — direction is the finding; same-type lag 1 is t26's
    ACF). All five moments are exact BIGINTs from one (type, day)
    aggregate; r evaluates ONE shared expression string.

    Scale: the pair join runs on the day-grain series (|days| x
    |types| rows), never the event stream."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint()
    )
    a = daily.select(
        F.col("event_type").alias("type_a"),
        F.col("day").alias("da"),
        F.col("x").alias("xa"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("db"),
        F.col("x").alias("xb"),
    )
    lag0 = (
        a.join(b, F.col("da") == F.col("db"))
        .filter(F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", F.lit(0).alias("lag"), "xa", "xb")
    )
    lag1 = (
        a.join(b, F.date_add(F.col("da"), 1) == F.col("db"))
        .filter(F.col("type_a") != F.col("type_b"))
        .select("type_a", "type_b", F.lit(1).alias("lag"), "xa", "xb")
    )
    moments = (
        lag0.unionByName(lag1)
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xa").cast("long").alias("sx"),
            F.sum("xb").cast("long").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).cast("long").alias("sxx"),
            F.sum(F.col("xb") * F.col("xb")).cast("long").alias("syy"),
        )
    )
    return moments.select(
        "type_a",
        "type_b",
        F.col("lag").cast("long").alias("lag"),
        "n",
        F.expr(_CORR_R).alias("r"),
    ).orderBy("lag", "type_a", "type_b")


def _anova_exprs() -> tuple[str, str]:
    """F statistic and eta^2 as fixed-order expression strings over
    the pivoted per-weekday moments (n_1..n_7, s_1..s_7) + totals
    (n, t, ssq): between = sum s_g^2/n_g - t^2/n, within = ssq - sum
    s_g^2/n_g. Textual term order is fixed, so Spark and DuckDB build
    identical IEEE trees."""
    group_term = " + ".join(
        f"(CAST(s_{g} AS DOUBLE) * CAST(s_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE))"
        for g in _WEEKDAYS
    )
    grand = "(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))"
    ssb = f"(({group_term}) - {grand})"
    ssw = f"(CAST(ssq AS DOUBLE) - ({group_term}))"
    f_stat = f"(({ssb} / 6.0) / ({ssw} / CAST(n - 7 AS DOUBLE)))"
    eta = f"({ssb} / (CAST(ssq AS DOUBLE) - {grand}))"
    return f_stat, eta


def weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29c — one-way ANOVA of the weekday effect on daily event
    volume: F = (SSB/(k-1))/(SSW/(n-k)) over the 7 ISO-weekday groups,
    plus eta^2 (the share of daily-volume variance the weekday
    explains) — THE test behind "is our traffic weekly-seasonal",
    quantifying what the seasonality-anomaly queries (t19) assume.
    Every group moment is an exact BIGINT pivoted into ONE row, so
    both statistics evaluate fixed-order shared expression strings
    (no order-dependent double sums).

    Scale: one day-grain aggregate + one 7-group pivot row."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wd = daily.select(
        F.expr("CAST(dayofweek(day) AS BIGINT)").alias("dow"), "x"
    ).select(
        # ISO: Monday=1..Sunday=7 (Spark dayofweek: Sunday=1)
        F.expr("CASE WHEN dow = 1 THEN 7 ELSE dow - 1 END").alias("g"),
        "x",
    )
    pivot = wd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("t"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ssq"),
        *[
            F.sum(F.when(F.col("g") == g, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{g}")
            for g in _WEEKDAYS
        ],
        *[
            F.sum(F.when(F.col("g") == g, F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"s_{g}")
            for g in _WEEKDAYS
        ],
    )
    f_stat, eta = _anova_exprs()
    return pivot.select(
        "n",
        "t",
        "ssq",
        F.expr(f_stat).alias("f_stat"),
        F.expr(eta).alias("eta_sq"),
    )


_RUNS_Z = (
    "((CAST(r AS DOUBLE)"
    " - (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)"
    " / CAST(n0 + n1 AS DOUBLE) + 1.0))"
    " / sqrt(2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)"
    " * (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)"
    " - CAST(n0 + n1 AS DOUBLE))"
    " / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE)"
    " * CAST(n0 + n1 - 1 AS DOUBLE))))"
)


def revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29d — Wald-Wolfowitz runs test on the daily purchase-revenue
    series: days classify above/below the exact lower-median (ties to
    the median drop, the classical convention); the number of
    sign-runs against its null expectation says whether the series
    alternates like noise or trends/clusters — the nonparametric
    complement of CUSUM (t26). Counts and the run total are exact
    BIGINTs; z evaluates ONE shared expression string.

    Scale: one day-grain aggregate, one rank pick for the median, one
    lag pass for the run count."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    ).localCheckpoint()
    rank_w = Window.orderBy("x", "day")
    n_df = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    med = (
        daily.select("x", F.row_number().over(rank_w).alias("rk"))
        .join(F.broadcast(n_df))
        .filter(F.col("rk") == F.expr("(n_days + 1) DIV 2"))
        .select(F.col("x").alias("med"))
    )
    signs = (
        daily.join(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select(
            "day", F.when(F.col("x") > F.col("med"), 1).otherwise(0).alias("s")
        )
    )
    lag_w = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(lag_w).isNull()
            | (F.lag("s").over(lag_w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n0"),
        F.sum("new_run").cast("long").alias("r"),
    )
    return agg.select("n0", "n1", "r", F.expr(_RUNS_Z).alias("z"))


def qq_decile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T29e — Q-Q decile drift table between the two halves of the
    purchase history (same midpoint convention as the mix-shift
    decomposition t25): for each decile 1..9 the exact discrete order
    statistic (value at ceil(p*n), no interpolation) of each half and
    the centi delta — WHERE in the distribution the drift lives,
    which the scalar PSI (ext_value_psi_drift) cannot say.

    Scale: one half-tag pass + one rank window per half on the
    (compressible) purchase set; output is 9 rows."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    base = ev.select(us.alias("us"), centi.alias("x"))
    span = base.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid_us")
    )
    halves = base.join(F.broadcast(span)).select(
        F.when(F.col("us") < F.col("mid_us"), 1).otherwise(2).alias("h"), "x"
    )
    w = Window.partitionBy("h").orderBy("x")
    ranked = halves.select(
        "h",
        "x",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("h")).cast("long").alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("decile"))
    picks = (
        ranked.join(
            F.broadcast(deciles),
            F.col("rk") == F.expr("CAST(ceil(decile * n / 10.0) AS BIGINT)"),
        )
        .groupBy("decile", "h")
        .agg(F.min("x").alias("v"))
    )
    return (
        picks.groupBy("decile")
        .agg(
            F.min(F.when(F.col("h") == 1, F.col("v"))).alias("v_first_centi"),
            F.min(F.when(F.col("h") == 2, F.col("v"))).alias("v_second_centi"),
        )
        .select(
            "decile",
            "v_first_centi",
            "v_second_centi",
            (F.col("v_second_centi") - F.col("v_first_centi")).alias(
                "delta_centi"
            ),
        )
        .orderBy("decile")
    )


QUERIES = {
    "t29_bellman_ford_copurchase": bellman_ford_copurchase,
    "t29_corr_leadlag_matrix": corr_leadlag_matrix,
    "t29_weekday_anova": weekday_anova,
    "t29_revenue_runs_test": revenue_runs_test,
    "t29_qq_decile_drift": qq_decile_drift,
}

# Unrolled Bellman-Ford relax rounds: d0 = {src: 0}.
_BF_CTE_ROUNDS = ",".join(
    f"""
    d{r} AS (
        SELECT v, MIN(d) AS d FROM (
            SELECT v, d FROM d{r - 1}
            UNION ALL
            SELECT e.b AS v, p.d + e.w AS d
            FROM bidir e JOIN d{r - 1} p ON p.v = e.a
        ) GROUP BY 1
    ),
    s{r} AS (
        SELECT CAST({r} AS BIGINT) AS round,
               CAST(COUNT(*) AS BIGINT) AS n_reached,
               CAST(SUM(d) AS BIGINT) AS sum_dist_micro,
               CAST(MAX(d) AS BIGINT) AS max_dist_micro
        FROM d{r}
    )"""
    for r in range(1, _BF_ROUNDS + 1)
)

_ANOVA_F, _ANOVA_ETA = _anova_exprs()

ORACLE = {
    "t29_bellman_ford_copurchase": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b,
                   1000000 // COUNT(*) AS w
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        bidir AS (
            SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0
        ),
        deg AS (SELECT a, COUNT(*) AS d FROM bidir GROUP BY 1),
        src AS (
            SELECT a AS v FROM deg ORDER BY d DESC, a ASC LIMIT 1
        ),
        d0 AS (SELECT v, CAST(0 AS BIGINT) AS d FROM src),{_BF_CTE_ROUNDS}
        SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
        ORDER BY round
    """,
    "t29_corr_leadlag_matrix": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   0 AS lag, a.x AS xa, b.x AS xb
            FROM daily a JOIN daily b
              ON a.day = b.day AND a.event_type < b.event_type
            UNION ALL
            SELECT a.event_type, b.event_type, 1, a.x, b.x
            FROM daily a JOIN daily b
              ON a.day + 1 = b.day
                 AND a.event_type <> b.event_type
        ),
        moments AS (
            SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xa) AS BIGINT) AS sx,
                   CAST(SUM(xb) AS BIGINT) AS sy,
                   CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                   CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                   CAST(SUM(xb * xb) AS BIGINT) AS syy
            FROM pairs GROUP BY 1, 2, 3
        )
        SELECT type_a, type_b, lag, n, {_CORR_R} AS r
        FROM moments ORDER BY lag, type_a, type_b
    """,
    "t29_weekday_anova": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
            FROM events GROUP BY 1
        ),
        wd AS (SELECT isodow(day) AS g, x FROM daily),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS t,
                   CAST(SUM(x * x) AS BIGINT) AS ssq,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN g = {g} THEN 1 ELSE 0 END) AS BIGINT) AS n_{g}"
                       for g in _WEEKDAYS
                   )},
                   {", ".join(
                       f"CAST(SUM(CASE WHEN g = {g} THEN x ELSE 0 END) AS BIGINT) AS s_{g}"
                       for g in _WEEKDAYS
                   )}
            FROM wd
        )
        SELECT n, t, ssq, {_ANOVA_F} AS f_stat, {_ANOVA_ETA} AS eta_sq
        FROM piv
    """,
    "t29_revenue_runs_test": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        ranked AS (
            SELECT x, row_number() OVER (ORDER BY x, day) AS rk,
                   COUNT(*) OVER () AS n_days
            FROM daily
        ),
        med AS (
            SELECT x AS med FROM ranked WHERE rk = (n_days + 1) // 2
        ),
        signs AS (
            SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS s
            FROM daily CROSS JOIN med
            WHERE x <> med
        ),
        runs AS (
            SELECT s,
                   CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                             OR lag(s) OVER (ORDER BY day) <> s
                        THEN 1 ELSE 0 END AS new_run
            FROM signs
        )
        SELECT CAST(SUM(1 - s) AS BIGINT) AS n0,
               CAST(SUM(s) AS BIGINT) AS n1,
               CAST(SUM(new_run) AS BIGINT) AS r,
               {_RUNS_Z} AS z
        FROM runs
    """,
    "t29_qq_decile_drift": """
        WITH base AS (
            SELECT epoch_us(ts) AS us,
                   CAST(round(value * 100, 0) AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase'
        ),
        span AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM base),
        halves AS (
            SELECT CASE WHEN us < mid_us THEN 1 ELSE 2 END AS h, x
            FROM base CROSS JOIN span
        ),
        ranked AS (
            SELECT h, x,
                   CAST(row_number() OVER (PARTITION BY h ORDER BY x)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY h) AS BIGINT) AS n
            FROM halves
        ),
        deciles AS (SELECT UNNEST(range(1, 10)) AS decile),
        picks AS (
            SELECT decile, h, MIN(x) AS v
            FROM ranked JOIN deciles
              ON rk = CAST(ceil(decile * n / 10.0) AS BIGINT)
            GROUP BY 1, 2
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               MIN(CASE WHEN h = 1 THEN v END) AS v_first_centi,
               MIN(CASE WHEN h = 2 THEN v END) AS v_second_centi,
               MIN(CASE WHEN h = 2 THEN v END)
                   - MIN(CASE WHEN h = 1 THEN v END) AS delta_centi
        FROM picks GROUP BY 1 ORDER BY 1
    """,
}

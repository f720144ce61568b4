"""As-of-sensitivity / forecast-decomposition / ratio-inference /
retention-decay pack (T49): an as-of join tolerance sweep (match rate
at 10m/1h/1d/∞ from ONE join pass — the windowFunnel-sensitivity
discipline applied to the time-series join), the Murphy decomposition
of a Brier score (reliability / resolution / uncertainty of the
weekday-rate forecast judged on hour bins — the calibration anatomy
the plain Brier (t36 CV) hides), ratio-metric inference done BOTH
ways (delta-method CI vs deterministic half-sample bootstrap CI for
revenue-per-click — the experimentation gotcha metric), and the
retention half-life (log-linear decay fit over cohort retention by
age — turns the t22 retention triangle into the one number growth
teams quote).

Reference anchors (SURVEY §2): the sweep reads the t17 as-of pair
(events clicks→purchases); Brier anatomy extends the calibration
family (t20 calibration bands, t36 CV Brier); the ratio CI reuses the
t28 Knuth-bit replica discipline; retention decay composes the t22
cohort triangle.

Scale notes (100 TB):
- sweep: ONE union+window as-of pass; the four tolerances are CASE
  columns over the carried gap — one extra projection, not four joins.
- Brier: one (hour, weekday) cell grid; all terms integer-micro
  floored from exact counts before any sum.
- ratio CI: the 32-replica fan-out is a projection (map-side-combined
  aggregate); per-user moments exact BIGINT; both CIs evaluate shared
  expression strings.
- retention: the (cohort, age) aggregate pools to the age grain;
  the OLS runs on ≤ |ages| rows with micro-nat floored logs (the t30
  elasticity discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.asof import asof_join
from bigdatamanagement_spark.operators.traindata import KNUTH

_MICRO = 1_000_000
_BOOT_B = 32
# tolerance sweep windows in whole seconds (labels are output keys)
_ASOF_SWEEP = (("10m", 600), ("1h", 3600), ("1d", 86400))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T49a: as-of tolerance sweep ---------------------------------------------


def asof_tolerance_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T49a — sensitivity of the click→last-purchase as-of join (the
    t17 pair) to the staleness tolerance: ONE backward as-of pass
    carries each click's latest same-user purchase timestamp; the
    10m/1h/1d/∞ match rates are CASE columns over the carried gap —
    the sweep costs one projection, not four joins. The knob-setting
    readout for every as-of consumer: how stale may the carried state
    be before matches vanish.

    Scale: one key-only shuffle (the as-of union+window); the sweep
    aggregate is one reduce."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "event_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.count(F.lit(1)).alias("_dup"))
        .select("user_id", "p_ts")
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="c_ts", right_ts="p_ts"
    )
    gap = F.expr(
        "CASE WHEN p_ts IS NULL THEN NULL"
        " ELSE unix_micros(CAST(c_ts AS TIMESTAMP))"
        " - unix_micros(CAST(p_ts AS TIMESTAMP)) END"
    )
    base = joined.select(gap.alias("gap_us"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.sum(F.when(F.col("gap_us").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("matched_inf"),
    ]
    for label, secs in _ASOF_SWEEP:
        aggs.append(
            F.sum(
                F.when(F.col("gap_us") <= secs * _MICRO, 1).otherwise(0)
            )
            .cast("long")
            .alias(f"matched_{label}")
        )
    row = base.agg(*aggs)
    outs = []
    for label, _ in list(_ASOF_SWEEP) + [("inf", None)]:
        outs.append(
            row.select(
                F.lit(label).alias("tolerance"),
                F.col("n_clicks"),
                F.col(f"matched_{label}").alias("matched"),
                F.expr(
                    f"(matched_{label} * 1000000) DIV n_clicks"
                ).alias("match_micro"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("tolerance")


# --- T49b: Murphy decomposition of the Brier score ----------------------------

_BRIER_D = "(CAST({x} AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))"


def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T49b — Murphy (1973) decomposition of the Brier score for the
    weekday-rate purchase forecast judged on hour-of-day bins:
    reliability (forecast vs bin outcome — the calibration error),
    resolution (bin outcomes vs base rate — the discrimination
    earned), uncertainty (base-rate variance — the floor no forecast
    beats). Rates are floored micros from exact counts; every
    quadratic term floors to micro units BEFORE the sums
    ((n_cell·d²) DIV 1e6 with d in micro), so the three sums are
    exact BIGINTs and both engines agree bit-for-bit; the final
    three ratios are ONE shared expression string each.

    Scale: one (hour, weekday) cell grid; weekday and hour marginals
    derive from it; everything past the grid is ≤168 rows."""
    ev = _events(spark, sf_dir).select(
        F.expr("CAST(hour(ts) AS BIGINT)").alias("h"),
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1996-01-01') % 7"
            " AS BIGINT)"
        ).alias("w"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    cells = ev.groupBy("h", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_hw"),
        F.sum("y").cast("long").alias("c_hw"),
    ).localCheckpoint(eager=True)
    wmarg = cells.groupBy("w").agg(
        F.sum("n_hw").alias("n_w"), F.sum("c_hw").alias("c_w")
    ).select("w", F.expr("(c_w * 1000000) DIV n_w").alias("p_w"))
    hmarg = cells.groupBy("h").agg(
        F.sum("n_hw").alias("n_h"), F.sum("c_hw").alias("c_h")
    ).select(
        "h", "n_h", F.expr("(c_h * 1000000) DIV n_h").alias("y_h")
    )
    tot = cells.agg(
        F.sum("n_hw").cast("long").alias("n"),
        F.sum("c_hw").cast("long").alias("c"),
    ).select("n", F.expr("(c * 1000000) DIV n").alias("y_bar"))
    rel = (
        cells.join(F.broadcast(wmarg), "w")
        .join(F.broadcast(hmarg.select("h", "y_h")), "h")
        .agg(
            F.sum(
                F.expr("(n_hw * (p_w - y_h) * (p_w - y_h)) DIV 1000000")
            )
            .cast("long")
            .alias("rel_sum")
        )
    )
    res = (
        hmarg.join(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr("(n_h * (y_h - y_bar) * (y_h - y_bar)) DIV 1000000")
            )
            .cast("long")
            .alias("res_sum")
        )
    )
    return (
        rel.join(res)
        .join(F.broadcast(tot))
        .select(
            "n",
            "y_bar",
            "rel_sum",
            "res_sum",
            F.expr(_BRIER_D.format(x="rel_sum")).alias("reliability"),
            F.expr(_BRIER_D.format(x="res_sum")).alias("resolution"),
            F.expr(
                "(CAST(y_bar AS DOUBLE) / 1000000.0)"
                " * (1.0 - CAST(y_bar AS DOUBLE) / 1000000.0)"
            ).alias("uncertainty"),
        )
    )


# --- T49c: ratio-metric CI (delta method vs bootstrap) -------------------------

_RATIO = "(CAST(s_rev AS DOUBLE) / CAST(s_clk AS DOUBLE))"
_DELTA_SE = (
    "(sqrt((CAST(q_rev AS DOUBLE)"
    " - 2.0 * (CAST(s_rev AS DOUBLE) / CAST(s_clk AS DOUBLE))"
    " * CAST(q_rc AS DOUBLE)"
    " + (CAST(s_rev AS DOUBLE) / CAST(s_clk AS DOUBLE))"
    " * (CAST(s_rev AS DOUBLE) / CAST(s_clk AS DOUBLE))"
    " * CAST(q_clk AS DOUBLE))"
    " / CAST(n_users AS DOUBLE))"
    " * CAST(n_users AS DOUBLE) / CAST(s_clk AS DOUBLE)"
    " / sqrt(CAST(n_users AS DOUBLE)))"
)
_BOOT_RATIO = "(CAST(s_rev AS DOUBLE) / CAST(s_clk AS DOUBLE))"


def ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T49c — inference for the RATIO metric revenue-per-click, both
    ways: the delta-method standard error from exact per-user moments
    (Σr², Σrc, Σc² — the linearization every experimentation platform
    ships), and the deterministic 32-replica half-sample bootstrap CI
    (Knuth-bit user halves, 2nd/31st ranked replica ratios — the t28
    discipline). Ratio metrics are the experimentation gotcha: the
    naive per-event variance is wrong because users, not clicks, are
    the independent unit — both intervals here are user-clustered.

    Scale: one user-keyed aggregate; the replica fan-out is a
    broadcast projection folding map-side; moments exact BIGINT."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100, 0) AS BIGINT)"),
            ).otherwise(0)
        ).alias("rev"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("long")
        .alias("clk"),
    ).filter(F.col("clk") > 0).localCheckpoint(eager=True)
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("rev").cast("long").alias("s_rev"),
        F.sum("clk").cast("long").alias("s_clk"),
        F.sum(F.col("rev") * F.col("rev")).cast("long").alias("q_rev"),
        F.sum(F.col("rev") * F.col("clk")).cast("long").alias("q_rc"),
        F.sum(F.col("clk") * F.col("clk")).cast("long").alias("q_clk"),
    )
    bs = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    h = F.expr(f"(user_id * {KNUTH}) % 4294967296")
    replicas = (
        per_user.select("rev", "clk", h.alias("h"))
        .crossJoin(F.broadcast(bs))
        .filter(F.expr("(h DIV CAST(pow(2, b) AS BIGINT)) % 2 = 1"))
        .groupBy("b")
        .agg(
            F.sum("rev").cast("long").alias("s_rev"),
            F.sum("clk").cast("long").alias("s_clk"),
        )
        .filter(F.col("s_clk") > 0)
        .select("b", F.expr(_BOOT_RATIO).alias("ratio_b"))
    )
    w = Window.orderBy("ratio_b", "b")
    ranked = replicas.select(
        "ratio_b", F.row_number().over(w).cast("long").alias("rn")
    )
    boot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.min(F.when(F.col("rn") == 2, F.col("ratio_b"))).alias("boot_lo"),
        F.min(F.when(F.col("rn") == _BOOT_B - 1, F.col("ratio_b"))).alias(
            "boot_hi"
        ),
    )
    return mom.join(boot).select(
        "n_users",
        "s_rev",
        "s_clk",
        F.expr(_RATIO).alias("ratio_cents_per_click"),
        F.expr(_DELTA_SE).alias("delta_se"),
        "n_replicas",
        "boot_lo",
        "boot_hi",
    )


# --- T49d: retention half-life -------------------------------------------------

_HALF_LIFE = (
    "(CASE WHEN slope_num < 0 THEN"
    " -693147.0 * CAST(sxx_n AS DOUBLE) / CAST(slope_num AS DOUBLE)"
    " / 1000000.0 ELSE NULL END)"
)


def retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T49d — retention half-life: pooled cohort retention by age in
    months (users active at age a over cohort sizes, cohorts by first
    event month — the t22 triangle pooled to the age grain), fit
    ln(retention) ~ age by OLS and report slope, intercept basis and
    the half-life −ln2/slope in months via ONE shared expression.
    Retention rates floor to micro, logs floor to micro-nats (the t30
    elasticity discipline), the OLS moments are exact BIGINT on the
    ≤|ages| grid; age 0 (trivially 100%) is excluded.

    Scale: one (user, month) distinct + one user-keyed min; the fit
    runs on a handful of rows."""
    ev = _events(spark, sf_dir)
    um = ev.select(
        "user_id",
        F.expr(
            "CAST(CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE)"
            " AS STRING)"
        ).alias("m"),
        F.expr(
            "CAST(year(ts) AS BIGINT) * 12 + CAST(month(ts) AS BIGINT)"
        ).alias("mi"),
    ).distinct()
    first = um.groupBy("user_id").agg(F.min("mi").alias("c0"))
    aged = um.join(first, "user_id").select(
        "user_id", "c0", (F.col("mi") - F.col("c0")).alias("age")
    )
    cohort_sizes = first.groupBy("c0").agg(
        F.count(F.lit(1)).alias("size")
    )
    active = aged.groupBy("c0", "age").agg(
        F.count(F.lit(1)).alias("active")
    )
    # pool: per age, only cohorts OLD ENOUGH to have reached that age
    # (their c0 + age <= global max month) — the triangle's diagonal cut
    maxm = um.agg(F.max("mi").alias("mmax"))
    pooled = (
        active.join(F.broadcast(cohort_sizes), "c0")
        .join(F.broadcast(maxm))
        .filter(F.expr("c0 + age <= mmax"))
        .groupBy("age")
        .agg(
            F.sum("active").cast("long").alias("act"),
            F.sum("size").cast("long").alias("base"),
        )
        .filter(F.col("age") >= 1)
        .select(
            "age",
            "act",
            "base",
            F.expr("(act * 1000000) DIV base").alias("r_micro"),
        )
        .filter(F.col("r_micro") > 0)
        .select(
            "age",
            "act",
            "base",
            "r_micro",
            F.expr(
                "CAST(floor(1000000.0 * ln(CAST(r_micro AS DOUBLE)"
                " / 1000000.0)) AS BIGINT)"
            ).alias("lnr_micro"),
        )
    )
    mom = pooled.agg(
        F.count(F.lit(1)).cast("long").alias("n_ages"),
        F.sum("age").cast("long").alias("sx"),
        F.sum("lnr_micro").cast("long").alias("sy"),
        F.sum(F.col("age") * F.col("age")).cast("long").alias("sxx"),
        F.sum(F.col("age") * F.col("lnr_micro")).cast("long").alias("sxy"),
    )
    return mom.select(
        "n_ages",
        F.expr("n_ages * sxy - sx * sy").alias("slope_num"),
        F.expr("n_ages * sxx - sx * sx").alias("sxx_n"),
        F.expr(
            "CAST(n_ages * sxy - sx * sy AS DOUBLE)"
            " / CAST(n_ages * sxx - sx * sx AS DOUBLE) / 1000000.0"
        ).alias("decay_per_month"),
        F.expr(_HALF_LIFE).alias("halflife_months"),
    )


QUERIES = {
    "t49_asof_tolerance_sweep": asof_tolerance_sweep,
    "t49_brier_decomposition": brier_decomposition,
    "t49_ratio_metric_ci": ratio_metric_ci,
    "t49_retention_halflife": retention_halflife,
}

_SWEEP_ONE = """
        SELECT '{label}' AS tolerance, n_clicks,
               matched_{label} AS matched,
               (matched_{label} * 1000000) // n_clicks AS match_micro
        FROM row
"""

ORACLE = {
    "t49_asof_tolerance_sweep": f"""
        WITH clicks AS (
            SELECT user_id, ts AS c_ts, event_id
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT DISTINCT user_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        joined AS (
            SELECT c.user_id, c.c_ts, p.p_ts
            FROM clicks c
            ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND c.c_ts >= p.p_ts
        ),
        base AS (
            SELECT CASE WHEN p_ts IS NULL THEN NULL
                        ELSE epoch_us(c_ts) - epoch_us(p_ts) END AS gap_us
            FROM joined
        ),
        row AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_clicks,
                   CAST(SUM(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS matched_inf,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN gap_us <="
                       f" CAST({secs} AS BIGINT) * 1000000"
                       f" THEN 1 ELSE 0 END) AS BIGINT) AS matched_{label}"
                       for label, secs in _ASOF_SWEEP
                   )}
            FROM base
        )
        {" UNION ALL ".join(
            _SWEEP_ONE.format(label=label)
            for label, _ in list(_ASOF_SWEEP) + [("inf", None)]
        )}
        ORDER BY tolerance
    """,
    "t49_brier_decomposition": f"""
        WITH ev AS (
            SELECT CAST(hour(ts) AS BIGINT) AS h,
                   CAST(datediff('day', DATE '1996-01-01', CAST(ts AS DATE))
                        % 7 AS BIGINT) AS w,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        cells AS (
            SELECT h, w, CAST(COUNT(*) AS BIGINT) AS n_hw,
                   CAST(SUM(y) AS BIGINT) AS c_hw
            FROM ev GROUP BY 1, 2
        ),
        wmarg AS (
            SELECT w, (SUM(c_hw) * 1000000) // SUM(n_hw) AS p_w
            FROM cells GROUP BY 1
        ),
        hmarg AS (
            SELECT h, CAST(SUM(n_hw) AS BIGINT) AS n_h,
                   (SUM(c_hw) * 1000000) // SUM(n_hw) AS y_h
            FROM cells GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(n_hw) AS BIGINT) AS n,
                   (SUM(c_hw) * 1000000) // SUM(n_hw) AS y_bar
            FROM cells
        ),
        rel AS (
            SELECT CAST(SUM((n_hw * (p_w - y_h) * (p_w - y_h)) // 1000000)
                        AS BIGINT) AS rel_sum
            FROM cells JOIN wmarg USING (w) JOIN hmarg USING (h)
        ),
        res AS (
            SELECT CAST(SUM((n_h * (y_h - y_bar) * (y_h - y_bar))
                            // 1000000) AS BIGINT) AS res_sum
            FROM hmarg CROSS JOIN tot
        )
        SELECT n, y_bar, rel_sum, res_sum,
               {_BRIER_D.format(x="rel_sum")} AS reliability,
               {_BRIER_D.format(x="res_sum")} AS resolution,
               (CAST(y_bar AS DOUBLE) / 1000000.0)
                   * (1.0 - CAST(y_bar AS DOUBLE) / 1000000.0)
                   AS uncertainty
        FROM rel CROSS JOIN res CROSS JOIN tot
    """,
    "t49_ratio_metric_ci": f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS rev,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                        END) AS BIGINT) AS clk
            FROM events GROUP BY 1
            HAVING SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(rev) AS BIGINT) AS s_rev,
                   CAST(SUM(clk) AS BIGINT) AS s_clk,
                   CAST(SUM(rev * rev) AS BIGINT) AS q_rev,
                   CAST(SUM(rev * clk) AS BIGINT) AS q_rc,
                   CAST(SUM(clk * clk) AS BIGINT) AS q_clk
            FROM per_user
        ),
        bs AS (SELECT UNNEST(generate_series(0, {_BOOT_B - 1})) AS b),
        replicas AS (
            SELECT b, CAST(SUM(rev) AS BIGINT) AS s_rev,
                   CAST(SUM(clk) AS BIGINT) AS s_clk
            FROM (
                SELECT rev, clk,
                       (user_id * {KNUTH}) % 4294967296 AS h
                FROM per_user
            ) CROSS JOIN bs
            WHERE (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1
            GROUP BY 1
            HAVING SUM(clk) > 0
        ),
        ranked AS (
            SELECT {_BOOT_RATIO} AS ratio_b,
                   row_number() OVER (ORDER BY {_BOOT_RATIO}, b) AS rn
            FROM replicas
        ),
        boot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
                   MIN(CASE WHEN rn = 2 THEN ratio_b END) AS boot_lo,
                   MIN(CASE WHEN rn = {_BOOT_B - 1} THEN ratio_b END)
                       AS boot_hi
            FROM ranked
        )
        SELECT n_users, s_rev, s_clk,
               {_RATIO} AS ratio_cents_per_click,
               {_DELTA_SE} AS delta_se,
               n_replicas, boot_lo, boot_hi
        FROM mom CROSS JOIN boot
    """,
    "t49_retention_halflife": f"""
        WITH um AS (
            SELECT DISTINCT user_id,
                   CAST(year(ts) AS BIGINT) * 12 + CAST(month(ts) AS BIGINT)
                       AS mi
            FROM events
        ),
        first AS (SELECT user_id, MIN(mi) AS c0 FROM um GROUP BY 1),
        aged AS (
            SELECT u.user_id, f.c0, u.mi - f.c0 AS age
            FROM um u JOIN first f ON u.user_id = f.user_id
        ),
        cohort_sizes AS (SELECT c0, COUNT(*) AS size FROM first GROUP BY 1),
        active AS (SELECT c0, age, COUNT(*) AS active
                   FROM aged GROUP BY 1, 2),
        maxm AS (SELECT MAX(mi) AS mmax FROM um),
        pooled AS (
            SELECT age, act, base, r_micro,
                   CAST(floor(1000000.0 * ln(CAST(r_micro AS DOUBLE)
                        / 1000000.0)) AS BIGINT) AS lnr_micro
            FROM (
                SELECT age,
                       CAST(SUM(active) AS BIGINT) AS act,
                       CAST(SUM(size) AS BIGINT) AS base,
                       (SUM(active) * 1000000) // SUM(size) AS r_micro
                FROM active JOIN cohort_sizes USING (c0)
                CROSS JOIN maxm
                WHERE c0 + age <= mmax
                GROUP BY 1
            )
            WHERE age >= 1 AND r_micro > 0
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_ages,
                   CAST(SUM(age) AS BIGINT) AS sx,
                   CAST(SUM(lnr_micro) AS BIGINT) AS sy,
                   CAST(SUM(age * age) AS BIGINT) AS sxx,
                   CAST(SUM(age * lnr_micro) AS BIGINT) AS sxy
            FROM pooled
        )
        SELECT n_ages,
               CAST(n_ages * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n_ages * sxx - sx * sx AS BIGINT) AS sxx_n,
               CAST(n_ages * sxy - sx * sy AS DOUBLE)
                   / CAST(n_ages * sxx - sx * sx AS DOUBLE) / 1000000.0
                   AS decay_per_month,
               {_HALF_LIFE} AS halflife_months
        FROM mom
    """,
}

"""Funnel-timing / seasonal-strength / perfect-order / Wilson-ranking
pack (T50): per-step funnel transition-time percentiles (the timing
the t28 windowFunnel's binary conversion hides), Hyndman
trend/seasonal STRENGTH statistics for the daily revenue series (how
much of the variance the t46 decomposition actually explains), the
perfect-order rate per priority (the all-lines conjunction the t35
per-line ship-latency percentiles cannot see), and the
Wilson-lower-bound leaderboard (rank brands by the LOWER confidence
bound of their kept-rate — "how not to sort by average rating",
completing the t35 Wilson intervals with their canonical use).

Reference anchors (SURVEY §2): funnel timing extends the t17/t28
funnel family on the same user-keyed exchange; seasonal strength
composes the t46 weekday decomposition; perfect-order reads the
TPC-H Q12-style date pair per order; the leaderboard is the Redis
ZREVRANGE top-k (Q-W03) re-ranked by uncertainty-aware score.

Scale notes (100 TB):
- funnel timing: the per-user (t1, t2, t3) conditional-min aggregate
  runs once; percentiles are exact rank picks on the per-user
  transition grain.
- seasonal strength: the whole computation lives on the day grid in
  HECTO-dollars (documented grain — n·Σz² stays far inside BIGINT
  through sf100); seasonal means floor with an explicit sign-correct
  CASE shared by both engines (Spark DIV truncates, DuckDB //
  floors — neither is used on negatives here).
- perfect-order: one lineitem→orders join folding per-order ALL/ANY
  flags map-side; the priority rollup is 5 rows.
- Wilson: one (brand) aggregate; the bound is ONE shared expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_WD_ANCHOR = "1996-01-01"

# sign-correct floor division a/b (b > 0): identical text both engines
_FLOORDIV = (
    "(CASE WHEN {a} >= 0 THEN {a} DIV {b}"
    " ELSE -((-({a}) + {b} - 1) DIV {b}) END)"
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T50a: funnel step timing --------------------------------------------------


def funnel_step_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T50a — per-step funnel transition times: for users who complete
    signup → click → purchase in strict order (the t28 conditional-min
    construction: first click AFTER the signup, first purchase AFTER
    that click), the exact median and p90 of each step's whole-second
    wait. Conversion percentages say WHETHER users fall through; step
    timing says WHERE the friction is.

    Scale: one user-keyed aggregate; percentiles are cumulative-count
    crossings on the DISTINCT whole-second duration grid (bounded by
    the time-span domain, not the user count — the t26 distinct-value
    convention), never a rank over per-user rows."""
    ev = _events(spark, sf_dir)
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    per_user = (
        ev.select("user_id", "event_type", us.alias("u"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("u"))
            ).alias("t1")
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("cu")
    )
    t2 = (
        per_user.filter(F.col("t1").isNotNull())
        .join(clicks, "user_id")
        .filter(F.col("cu") >= F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("cu").alias("t2"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("pu")
    )
    t3 = (
        t2.join(purch, "user_id")
        .filter(F.col("pu") >= F.col("t2"))
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("pu").alias("t3"))
    )
    steps = t3.select(
        "user_id",
        F.expr("(t2 - t1) DIV 1000000").alias("signup_to_click"),
        F.expr("(t3 - t2) DIV 1000000").alias("click_to_purchase"),
    ).localCheckpoint(eager=True)
    outs = []
    for col in ("signup_to_click", "click_to_purchase"):
        # distinct-duration grid: cum(v) = #users with duration <= v, so
        # min v with k*cum(v) >= q*n is exactly the min qualifying row of
        # the per-user rank formulation (cum(x_r*) >= r*; any smaller v
        # has cum < r*) — same outputs, value-domain-sized window
        counts = steps.groupBy(F.col(col).alias("secs")).agg(
            F.count(F.lit(1)).alias("c")
        )
        grid = counts.select(
            "secs",
            F.sum("c")
            .over(Window.orderBy("secs").rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum"),
            F.sum("c")
            .over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias("n"),
        )
        med = grid.filter(F.col("cum") * 2 >= F.col("n")).agg(
            F.min("secs").alias("median_secs"),
            F.max("n").alias("n_users"),
        )
        p90 = grid.filter(F.col("cum") * 10 >= F.col("n") * 9).agg(
            F.min("secs").alias("p90_secs")
        )
        outs.append(
            med.join(p90).select(
                F.lit(col).alias("step"),
                F.col("n_users").cast("long").alias("n_users"),
                F.col("median_secs").cast("long").alias("median_secs"),
                F.col("p90_secs").cast("long").alias("p90_secs"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("step")


# --- T50b: seasonal / trend strength -------------------------------------------

_VAR = "(n * {q} - {s} * {s})"  # n-scaled integer variance numerator
_FT = (
    "greatest(0.0, 1.0 - CAST(n * q_r - s_r * s_r AS DOUBLE)"
    " / CAST(n * q_tr - s_tr * s_tr AS DOUBLE))"
)
_FS = (
    "greatest(0.0, 1.0 - CAST(n * q_r - s_r * s_r AS DOUBLE)"
    " / CAST(n * q_d - s_d * s_d AS DOUBLE))"
)


def seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T50b — Hyndman trend/seasonal strength of daily purchase
    revenue: F_T = max(0, 1 − Var(R)/Var(T+R)) and
    F_S = max(0, 1 − Var(R)/Var(S+R)) on the t46 additive
    decomposition (centered 7-day trend, weekday seasonal, residual).
    Revenue folds in HECTO-dollars (cents DIV 10000 — documented
    grain: the n-scaled variance numerators n·Σz² − (Σz)² then stay
    far inside BIGINT through sf100); the per-weekday seasonal mean
    floors with an explicit sign-correct CASE (identical text both
    engines — bare DIV truncates in Spark but floors in DuckDB). One
    number per statistic: is there a weekday rhythm worth modeling,
    and does the week-scale trend carry signal.

    Scale: day grid throughout (the t46 shape); the strength ratios
    are two shared expressions over six exact BIGINT moments."""
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
    dense = grid.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = dense.select(
        "day",
        "x",
        F.sum("x").over(w7).alias("t7"),
        F.count(F.lit(1)).over(w7).alias("wn"),
    ).filter(F.col("wn") == 7)
    d7 = trended.select(
        "day",
        F.expr(
            f"CAST(datediff(day, DATE '{_WD_ANCHOR}') % 7 AS BIGINT)"
        ).alias("wd"),
        (F.lit(7) * F.col("x")).alias("x7"),
        (F.lit(7) * F.col("x") - F.col("t7")).alias("d7"),
    ).localCheckpoint(eager=True)
    smean = d7.groupBy("wd").agg(
        F.sum("d7").alias("sd"), F.count(F.lit(1)).alias("cn")
    ).select(
        "wd",
        F.expr(_FLOORDIV.format(a="sd", b="cn")).alias("s7"),
    )
    resid = d7.join(F.broadcast(smean), "wd").select(
        "x7",
        "d7",
        "s7",
        (F.col("d7") - F.col("s7")).alias("r"),
        (F.col("x7") - F.col("s7")).alias("tr"),
    )
    mom = resid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("s_r"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("q_r"),
        F.sum("d7").cast("long").alias("s_d"),
        F.sum(F.col("d7") * F.col("d7")).cast("long").alias("q_d"),
        F.sum("tr").cast("long").alias("s_tr"),
        F.sum(F.col("tr") * F.col("tr")).cast("long").alias("q_tr"),
    )
    return mom.select(
        "n",
        "s_r",
        "q_r",
        F.expr(_FT).alias("trend_strength"),
        F.expr(_FS).alias("seasonal_strength"),
    )


# --- T50c: perfect-order rate ----------------------------------------------------


def perfect_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T50c — perfect-order rate per order priority: an order is
    perfect when EVERY lineitem shipped within 7 days of the order
    date AND none came back (returnflag ≠ 'R') — the all-lines
    conjunction behind the supply-chain KPI, which per-line latency
    percentiles (t35) structurally overstate (one late line spoils
    the order, and large orders have more chances to spoil —
    reported next to the naive per-line on-time share to show the
    gap).

    Scale: one lineitem→orders join folding per-order min/max flags
    map-side; the priority rollup is five rows."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    per_line = (
        t["lineitem"]
        .select("l_orderkey", "l_returnflag", "l_shipdate")
        .join(
            t["orders"].select(
                "o_orderkey", "o_orderpriority",
                F.to_date("o_orderdate").alias("od"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr(
                "CASE WHEN datediff(CAST(l_shipdate AS DATE), od) <= 7"
                " AND l_returnflag <> 'R' THEN 1 ELSE 0 END"
            ).alias("ok"),
        )
    )
    per_order = per_line.groupBy("o_orderkey", "o_orderpriority").agg(
        F.min("ok").alias("perfect"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("ok").alias("ok_lines"),
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("perfect").cast("long").alias("perfect_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("ok_lines").cast("long").alias("ok_lines"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "perfect_orders",
            F.expr("(perfect_orders * 1000000) DIV n_orders").alias(
                "perfect_micro"
            ),
            F.expr("(ok_lines * 1000000) DIV n_lines").alias(
                "line_ok_micro"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --- T50d: Wilson lower-bound leaderboard ------------------------------------------

# Wilson lower bound at z=1.96 from exact (k, n); one shared
# expression text (1.96^2 = 3.8416 literal).
_WILSON_LCB = (
    "((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
    " + 3.8416 / (2.0 * CAST(n AS DOUBLE))"
    " - 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)"
    " + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
    " / (1.0 + 3.8416 / CAST(n AS DOUBLE)))"
)


def wilson_lcb_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T50d — brands ranked by the Wilson LOWER confidence bound of
    their kept-rate (lineitems not returned): the canonical "how not
    to sort by average rating" fix — a brand with 3/3 kept beats
    nothing; a brand with 480/500 has earned its rank. Top-10 by
    (lcb desc, brand asc) with the raw rate alongside, so rank
    inversions vs the naive sort are visible in the output. Counts
    exact; the bound is ONE shared expression (z=1.96 literals).

    Scale: one part-broadcast join + one brand aggregate; the
    leaderboard is a bounded top-k."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "part"), register=False
    )
    agg = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.expr("CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("k"),
        )
    )
    w = Window.orderBy(F.desc("wilson_lcb"), F.asc("p_brand"))
    return (
        agg.select(
            "p_brand",
            "n",
            "k",
            F.expr("(k * 1000000) DIV n").alias("raw_micro"),
            F.expr(_WILSON_LCB).alias("wilson_lcb"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("rank", "p_brand", "n", "k", "raw_micro", "wilson_lcb")
        .orderBy("rank")
    )


QUERIES = {
    "t50_funnel_step_timing": funnel_step_timing,
    "t50_seasonal_strength": seasonal_strength,
    "t50_perfect_order_rate": perfect_order_rate,
    "t50_wilson_lcb_leaderboard": wilson_lcb_leaderboard,
}

_TIMING_ONE = """
        SELECT '{col}' AS step,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM steps) AS n_users,
               (SELECT MIN({col}) FROM (
                    SELECT {col},
                           row_number() OVER (ORDER BY {col}, user_id)
                               AS rk,
                           COUNT(*) OVER () AS n
                    FROM steps
                ) WHERE rk * 2 >= n) AS median_secs,
               (SELECT MIN({col}) FROM (
                    SELECT {col},
                           row_number() OVER (ORDER BY {col}, user_id)
                               AS rk,
                           COUNT(*) OVER () AS n
                    FROM steps
                ) WHERE rk * 10 >= n * 9) AS p90_secs
"""

ORACLE = {
    "t50_funnel_step_timing": f"""
        WITH t1 AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup'
                        THEN epoch_us(ts) END) AS t1
            FROM events GROUP BY 1
            HAVING MIN(CASE WHEN event_type = 'signup'
                        THEN epoch_us(ts) END) IS NOT NULL
        ),
        t2 AS (
            SELECT e.user_id, t1.t1, MIN(epoch_us(e.ts)) AS t2
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) >= t1.t1
            GROUP BY 1, 2
        ),
        t3 AS (
            SELECT e.user_id, t2.t1, t2.t2, MIN(epoch_us(e.ts)) AS t3
            FROM events e JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= t2.t2
            GROUP BY 1, 2, 3
        ),
        steps AS (
            SELECT user_id,
                   CAST((t2 - t1) // 1000000 AS BIGINT) AS signup_to_click,
                   CAST((t3 - t2) // 1000000 AS BIGINT)
                       AS click_to_purchase
            FROM t3
        )
        {_TIMING_ONE.format(col="signup_to_click")}
        UNION ALL
        {_TIMING_ONE.format(col="click_to_purchase")}
        ORDER BY step
    """,
    "t50_seasonal_strength": f"""
        WITH daily AS (
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
        ),
        trended AS (
            SELECT day, x,
                   CAST(SUM(x) OVER w AS BIGINT) AS t7,
                   COUNT(*) OVER w AS wn
            FROM dense
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        d7 AS (
            SELECT CAST(datediff('day', DATE '{_WD_ANCHOR}', day) % 7
                        AS BIGINT) AS wd,
                   7 * x AS x7,
                   7 * x - t7 AS d7
            FROM trended WHERE wn = 7
        ),
        smean AS (
            SELECT wd, {_FLOORDIV.format(a="sd", b="cn").replace(
                " DIV ", " // ")} AS s7
            FROM (SELECT wd, CAST(SUM(d7) AS BIGINT) AS sd,
                         CAST(COUNT(*) AS BIGINT) AS cn
                  FROM d7 GROUP BY 1)
        ),
        resid AS (
            SELECT x7, d7, d7 - s7 AS r, x7 - s7 AS tr
            FROM d7 JOIN smean USING (wd)
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(r) AS BIGINT) AS s_r,
                   CAST(SUM(r * r) AS BIGINT) AS q_r,
                   CAST(SUM(d7) AS BIGINT) AS s_d,
                   CAST(SUM(d7 * d7) AS BIGINT) AS q_d,
                   CAST(SUM(tr) AS BIGINT) AS s_tr,
                   CAST(SUM(tr * tr) AS BIGINT) AS q_tr
            FROM resid
        )
        SELECT n, s_r, q_r, {_FT} AS trend_strength,
               {_FS} AS seasonal_strength
        FROM mom
    """,
    "t50_perfect_order_rate": """
        WITH per_line AS (
            SELECT l.l_orderkey, o.o_orderpriority,
                   CASE WHEN datediff('day', CAST(o.o_orderdate AS DATE),
                                      CAST(l.l_shipdate AS DATE)) <= 7
                             AND l.l_returnflag <> 'R'
                        THEN 1 ELSE 0 END AS ok
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        per_order AS (
            SELECT l_orderkey, o_orderpriority,
                   MIN(ok) AS perfect,
                   COUNT(*) AS n_lines,
                   SUM(ok) AS ok_lines
            FROM per_line GROUP BY 1, 2
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(perfect) AS BIGINT) AS perfect_orders,
               (SUM(perfect) * 1000000) // COUNT(*) AS perfect_micro,
               (SUM(ok_lines) * 1000000) // SUM(n_lines) AS line_ok_micro
        FROM per_order GROUP BY 1 ORDER BY 1
    """,
    "t50_wilson_lcb_leaderboard": f"""
        WITH agg AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0
                        END) AS BIGINT) AS k
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY {_WILSON_LCB} DESC,
                                       p_brand ASC) AS BIGINT) AS rank,
               p_brand, n, k,
               (k * 1000000) // n AS raw_micro,
               {_WILSON_LCB} AS wilson_lcb
        FROM agg
        QUALIFY rank <= 10
        ORDER BY rank
    """,
}

"""Composite-relational / exact-interpolation / sequence /
finance-calendar pack (T38): a kitchen-sink snowflake query (5-table
join + ROLLUP + HAVING + top-k tiebreaks in one plan), interpolated
percentiles (percentile_cont) kept EXACT as rational order-statistic
blends, the longest strictly-increasing value run per user, and a
deferred revenue-recognition schedule (each order spread over 3
months with largest-remainder integer splitting).

Reference anchors (SURVEY §2): the snowflake rollup composes the
reference's own T01/T02 join shapes (`AmazonRedshift.java:465-513`)
with the subtotal layer its reports tabulate by hand; percentile_cont
is the SQL-standard surface the engine's exact-order-statistic family
(t29/t35/t37) was built to support; revenue recognition applies the
t23 Hamilton largest-remainder discipline to the finance calendar.

Scale notes (100 TB):
- snowflake: dims broadcast, ROLLUP is one aggregate with grouping
  sets (no re-scan per level), HAVING prunes before the ordered
  output.
- percentile_cont: value at floor-rank and its successor via ONE rank
  window; the interpolation (1-f)*lo + f*hi is exact because f =
  ((n-1)*p mod 100)/100 — integer numerators carried, double only in
  the final shared expression.
- runs: one user-keyed window (lag -> break flag -> run id) — the
  gaps-and-islands discipline on the value axis.
- recognition: 3 rows per order via a broadcast spine; cents DIV 3
  with the remainder on month 1 so every order's schedule sums
  exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_PCTS = (25, 50, 75, 90, 99)
_RUN_TOP_K = 10
_RECOG_MONTHS = 3


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def snowflake_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T38a — the kitchen-sink relational report: lineitem JOIN orders
    JOIN customer JOIN nation JOIN region, ROLLUP(region, nation) over
    exact revenue cents and line counts, HAVING >= 10 lines, NULL
    grouping levels labeled, ordered by (level, revenue desc) — the
    reference's T01/T02 snowflake shape (`AmazonRedshift.java:
    465-513`) with the subtotal layer its reports hand-assemble,
    proven as ONE Catalyst plan (single aggregate, no per-level
    re-scan).

    Scale: dims broadcast; ROLLUP = grouping-sets expansion inside
    one exchange on the grouping keys."""
    t = load_testdata(
        spark,
        sf_dir,
        tables=("lineitem", "orders", "customer", "nation", "region"),
        register=True,
    )
    return spark.sql(
        """
        SELECT COALESCE(r_name, '(all)') AS region,
               COALESCE(n_name, '(all)') AS nation,
               CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT)
                   AS rollup_level,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                        0) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        HAVING COUNT(*) >= 10
        ORDER BY rollup_level, revenue_cents DESC, region, nation
        """
    )


def percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T38b — SQL-standard interpolated percentiles (percentile_cont)
    of purchase value per the linear-interpolation definition, kept
    EXACT: for percentile p, position = (n-1)*p/100 splits into
    integer floor-rank k and remainder r = (n-1)*p mod 100; the
    result = x_(k+1) + r*(x_(k+2) - x_(k+1))/100 carries the exact
    BIGINT numerator 100*lo + r*(hi - lo) and divides once in the
    shared expression — so the interpolated value is reproducible to
    the bit, unlike engine-native percentile_cont implementations.

    Scale: one rank window; each percentile is two rank picks."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    x = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    base = ev.select(x.alias("x"))
    w = Window.orderBy("x")
    ranked = base.select(
        "x",
        (F.row_number().over(w) - 1).cast("long").alias("k"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    ).localCheckpoint()
    pcts = spark.createDataFrame([(p,) for p in _PCTS], "p long")
    picks = (
        ranked.join(F.broadcast(pcts))
        .filter(
            (F.col("k") == F.expr("((n - 1) * p) DIV 100"))
            | (F.col("k") == F.expr("((n - 1) * p) DIV 100 + 1"))
        )
        .groupBy("p")
        .agg(
            F.max("n").alias("n"),
            F.min(
                F.when(
                    F.col("k") == F.expr("((n - 1) * p) DIV 100"), F.col("x")
                )
            ).alias("lo"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("k") == F.expr("((n - 1) * p) DIV 100 + 1"),
                        F.col("x"),
                    )
                ),
                F.min(
                    F.when(
                        F.col("k") == F.expr("((n - 1) * p) DIV 100"),
                        F.col("x"),
                    )
                ),
            ).alias("hi"),
        )
    )
    return picks.select(
        "p",
        "n",
        F.expr("((n - 1) * p) % 100").alias("frac_pct"),
        (F.lit(100) * F.col("lo")
         + F.expr("((n - 1) * p) % 100") * (F.col("hi") - F.col("lo")))
        .cast("long")
        .alias("pct_num_centi_x100"),
        F.expr(
            "CAST(100 * lo + (((n - 1) * p) % 100) * (hi - lo) AS DOUBLE)"
            " / 100.0"
        ).alias("pct_centi"),
    ).orderBy("p")


def longest_increasing_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T38c — longest strictly-increasing run of event values per
    user (consecutive in time order), top-10 users by (run desc, user
    asc) with the run's start timestamp — the sequence statistic
    behind streak mechanics and momentum features, via the
    gaps-and-islands discipline on the VALUE axis (break flag = not
    strictly greater; run id = running sum of breaks).

    Scale: one user-keyed window pass; top-k sorts per-user maxima."""
    ev = _events(spark, sf_dir)
    x = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        x.alias("x"),
        F.when(
            F.lag(x).over(w).isNull() | (F.lag(x).over(w) >= x), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    runs = flagged.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("ts").cast("timestamp_ntz").alias("start_ts"),
    )
    best = per_run.groupBy("user_id").agg(
        F.min(
            F.struct((-F.col("len")).alias("nl"), F.col("start_ts").alias("st"))
        ).alias("b")
    )
    return (
        best.select(
            "user_id",
            (-F.col("b.nl")).cast("long").alias("run_len"),
            F.col("b.st").alias("start_ts"),
        )
        .orderBy(F.desc("run_len"), "user_id")
        .limit(_RUN_TOP_K)
    )


def revenue_recognition_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T38d — deferred revenue-recognition schedule: every order's
    value spreads evenly over 3 months starting at its order month,
    in EXACT integer cents via the largest-remainder rule (base =
    cents DIV 3 per month, remainder rides month 1 — the t23 Hamilton
    discipline), reported as recognized revenue per calendar month;
    the schedule column sums exactly to booked revenue (pinned in
    tests). What finance actually books vs the cash-basis monthly
    revenue the t20 rollup reports.

    Scale: a 3-row broadcast spine fans each order out; one month
    aggregate."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)[
        "orders"
    ]
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    base = o.select(
        F.to_date("o_orderdate").alias("d"), cents.alias("cents")
    )
    spine = spark.createDataFrame(
        [(m,) for m in range(_RECOG_MONTHS)], "m long"
    )
    spread = base.crossJoin(F.broadcast(spine)).select(
        F.date_format(
            F.add_months(F.date_trunc("month", F.col("d")), F.col("m").cast("int")),
            "yyyy-MM",
        ).alias("month"),
        F.expr(
            f"CASE WHEN m = 0 THEN cents DIV {_RECOG_MONTHS}"
            f" + cents % {_RECOG_MONTHS}"
            f" ELSE cents DIV {_RECOG_MONTHS} END"
        ).alias("rec"),
    )
    return (
        spread.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tranches"),
            F.sum("rec").cast("long").alias("recognized_cents"),
        )
        .orderBy("month")
    )


QUERIES = {
    "t38_snowflake_rollup_report": snowflake_rollup_report,
    "t38_percentile_cont_exact": percentile_cont_exact,
    "t38_longest_increasing_runs": longest_increasing_runs,
    "t38_revenue_recognition": revenue_recognition_schedule,
}

ORACLE = {
    "t38_snowflake_rollup_report": """
        SELECT COALESCE(r_name, '(all)') AS region,
               COALESCE(n_name, '(all)') AS nation,
               CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT)
                   AS rollup_level,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                        0) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        HAVING COUNT(*) >= 10
        ORDER BY rollup_level, revenue_cents DESC, region, nation
    """,
    "t38_percentile_cont_exact": f"""
        WITH base AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
            SELECT x,
                   CAST(row_number() OVER (ORDER BY x) - 1 AS BIGINT) AS k,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM base
        ),
        pcts AS (SELECT UNNEST([{", ".join(str(p) for p in _PCTS)}]) AS p),
        picks AS (
            SELECT p, MAX(n) AS n,
                   MIN(CASE WHEN k = ((n - 1) * p) // 100 THEN x END) AS lo,
                   COALESCE(
                       MIN(CASE WHEN k = ((n - 1) * p) // 100 + 1
                           THEN x END),
                       MIN(CASE WHEN k = ((n - 1) * p) // 100 THEN x END))
                       AS hi
            FROM ranked CROSS JOIN pcts
            WHERE k = ((n - 1) * p) // 100 OR k = ((n - 1) * p) // 100 + 1
            GROUP BY p
        )
        SELECT CAST(p AS BIGINT) AS p, n,
               CAST(((n - 1) * p) % 100 AS BIGINT) AS frac_pct,
               CAST(100 * lo + (((n - 1) * p) % 100) * (hi - lo) AS BIGINT)
                   AS pct_num_centi_x100,
               CAST(100 * lo + (((n - 1) * p) % 100) * (hi - lo) AS DOUBLE)
                   / 100.0 AS pct_centi
        FROM picks ORDER BY p
    """,
    "t38_longest_increasing_runs": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS x,
                   CASE WHEN lag(CAST(round(value * 100, 0) AS BIGINT))
                             OVER w IS NULL
                             OR lag(CAST(round(value * 100, 0) AS BIGINT))
                                OVER w >= CAST(round(value * 100, 0)
                                               AS BIGINT)
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        runs AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_id
            FROM flagged
        ),
        per_run AS (
            SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(ts) AS start_ts
            FROM runs GROUP BY 1, 2
        ),
        best AS (
            SELECT user_id, len AS run_len, start_ts,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY len DESC, start_ts ASC) AS rn
            FROM per_run
        )
        SELECT user_id, run_len, start_ts
        FROM best WHERE rn = 1
        ORDER BY run_len DESC, user_id ASC LIMIT {_RUN_TOP_K}
    """,
    "t38_revenue_recognition": f"""
        WITH base AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        spine AS (SELECT UNNEST(range({_RECOG_MONTHS})) AS m),
        spread AS (
            SELECT strftime(date_trunc('month', d)
                       + to_months(CAST(m AS INTEGER)), '%Y-%m') AS month,
                   CASE WHEN m = 0 THEN cents // {_RECOG_MONTHS}
                            + cents % {_RECOG_MONTHS}
                        ELSE cents // {_RECOG_MONTHS} END AS rec
            FROM base CROSS JOIN spine
        )
        SELECT month,
               CAST(COUNT(*) AS BIGINT) AS n_tranches,
               CAST(SUM(rec) AS BIGINT) AS recognized_cents
        FROM spread GROUP BY 1 ORDER BY 1
    """,
}

"""Mergeable histogram-quantile windows (T73): trailing-7-day p50/p95
per day from DAILY fixed-grid histogram partials — the quantile
counterpart of T67's HLL windows, putting the histogram's merge
algebra (bucket-wise SUM) under the cross-engine oracle gate. The
sketch leg answers any quantile over any window from partials that
are O(grid) per day; the exact leg (unit-cent grid — itself just the
same sketch at resolution 1) rides alongside as calibration, bounding
the estimate error by one bucket width by construction.

Quantile definition (identical integer arithmetic on both engines):
q(p) = the smallest bucket whose running count reaches
ceil(p * N) = (p_num * N + p_den - 1) DIV p_den; the estimate reports
the bucket's EXCLUSIVE upper edge in cents, so est - exact lands in
[1, W] (pinned by test).

Scale notes (100 TB):
- daily partials: one events scan -> (day, bucket, cnt) — at W = 500
  cents the grid is ~100 rows/day regardless of event volume, the
  ETL-time artifact a metrics store materializes;
- window merge: each partial row fans to <= 7 window days (sequence
  explode — bounded), then (window_day, bucket) SUM — the mergeable
  algebra itself;
- running counts ride windows PARTITIONED by window_day over the
  bounded grid (never a partition-less sort); the unit-grain exact leg
  is distinct-value-compressed first (the analytics-pack discipline),
  and at 100x you keep only the coarse grid.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

WINDOW_DAYS = 7
BUCKET_CENTS = 500


def _cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]
    return ev.select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value").cast("double") * 100, 0)
        .cast("long")
        .alias("cents"),
    )


def _window_cum(ev: DataFrame, width: int) -> DataFrame:
    """(window_day, bucket, running, n): trailing-window merged
    histogram at ``width``-cent buckets with the running count and the
    window total — localCheckpoint-ed so every quantile below reads the
    SAME materialized grid instead of rebuilding the scan + fan + merge
    per quantile (the grid is O(buckets x windows) rows — tiny)."""
    span = ev.agg(F.max("day").alias("hi"))
    daily = (
        ev.select("day", F.expr(f"cents DIV {width}").alias("bucket"))
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fan = daily.join(F.broadcast(span)).select(
        F.explode(
            F.expr(f"sequence(day, least(date_add(day, {WINDOW_DAYS - 1}), hi))")
        ).alias("window_day"),
        "bucket",
        "cnt",
    )
    merged = fan.groupBy("window_day", "bucket").agg(F.sum("cnt").alias("cnt"))
    tot = merged.groupBy("window_day").agg(F.sum("cnt").alias("n"))
    w = (
        Window.partitionBy("window_day")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("running", F.sum("cnt").over(w))
        .join(tot, "window_day")
        .localCheckpoint(eager=False)
    )


def _quantile_from_cum(
    cum: DataFrame, width: int, p_num: int, p_den: int, out: str
) -> DataFrame:
    """(window_day, <out>): smallest bucket upper edge whose running
    count reaches ceil(p * N), off the shared cum grid."""
    k = F.expr(f"({p_num} * n + {p_den} - 1) DIV {p_den}")
    return (
        cum.where(F.col("running") >= k)
        .groupBy("window_day")
        .agg(((F.min("bucket") + 1) * width).cast("long").alias(out))
    )


def histogram_quantile_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T73 — per trailing-7d window: event count, the W = 500-cent
    sketch estimates for p50/p95 (bucket upper edges), the exact
    discrete quantiles (unit-cent grid), and the signed errors — which
    the construction bounds to (0, W]. Two histogram passes total (one
    coarse, one unit-grain); every quantile and the window totals read
    the shared materialized grids."""
    ev = _cents(spark, sf_dir)
    coarse = _window_cum(ev, BUCKET_CENTS)
    unit = _window_cum(ev, 1)
    est50 = _quantile_from_cum(coarse, BUCKET_CENTS, 1, 2, "est_p50_cents")
    est95 = _quantile_from_cum(coarse, BUCKET_CENTS, 19, 20, "est_p95_cents")
    # unit-grid "upper edge" is cents + 1; recover the exact discrete
    # quantile value by subtracting 1
    ex50 = _quantile_from_cum(unit, 1, 1, 2, "exact_p50_up").select(
        "window_day", (F.col("exact_p50_up") - 1).alias("exact_p50_cents")
    )
    ex95 = _quantile_from_cum(unit, 1, 19, 20, "exact_p95_up").select(
        "window_day", (F.col("exact_p95_up") - 1).alias("exact_p95_cents")
    )
    totals = (
        coarse.groupBy("window_day")
        .agg(F.max("n").cast("long").alias("n_events"))
    )
    return (
        totals.join(est50, "window_day")
        .join(ex50, "window_day")
        .join(est95, "window_day")
        .join(ex95, "window_day")
        .select(
            "window_day",
            "n_events",
            "est_p50_cents",
            "exact_p50_cents",
            (F.col("est_p50_cents") - F.col("exact_p50_cents")).alias(
                "err_p50_cents"
            ),
            "est_p95_cents",
            "exact_p95_cents",
            (F.col("est_p95_cents") - F.col("exact_p95_cents")).alias(
                "err_p95_cents"
            ),
        )
        .orderBy("window_day")
    )


QUERIES = {"t73_histogram_quantile_windows": histogram_quantile_windows}


def _q_cte(name: str, width: int, p_num: int, p_den: int, out: str) -> str:
    return f"""
    {name} AS (
        SELECT window_day,
               CAST((min(bucket) + 1) * {width} AS BIGINT) AS {out}
        FROM (
            SELECT window_day, bucket,
                   sum(cnt) OVER (PARTITION BY window_day ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running,
                   sum(cnt) OVER (PARTITION BY window_day) AS n
            FROM (
                SELECT window_day, bucket, sum(cnt) AS cnt
                FROM (
                    SELECT unnest(generate_series(day,
                               least(day + INTERVAL {WINDOW_DAYS - 1} DAY,
                                     (SELECT hi FROM span)),
                               INTERVAL 1 DAY))::DATE AS window_day,
                           bucket, cnt
                    FROM (
                        SELECT day, cents // {width} AS bucket,
                               count(*) AS cnt
                        FROM ev GROUP BY 1, 2
                    )
                ) GROUP BY 1, 2
            )
        )
        WHERE running >= ({p_num} * n + {p_den} - 1) // {p_den}
        GROUP BY 1
    )"""


ORACLE = {
    "t73_histogram_quantile_windows": f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT)
                       AS cents
            FROM events
        ),
        span AS (SELECT MAX(day) AS hi FROM ev),
        {_q_cte("est50", BUCKET_CENTS, 1, 2, "est_p50_cents")},
        {_q_cte("est95", BUCKET_CENTS, 19, 20, "est_p95_cents")},
        {_q_cte("ex50u", 1, 1, 2, "up50")},
        {_q_cte("ex95u", 1, 19, 20, "up95")},
        totals AS (
            SELECT unnest(generate_series(day,
                       least(day + INTERVAL {WINDOW_DAYS - 1} DAY,
                             (SELECT hi FROM span)),
                       INTERVAL 1 DAY))::DATE AS window_day
            FROM ev
        ),
        tw AS (
            SELECT window_day, count(*) AS n_events
            FROM totals GROUP BY 1
        )
        SELECT t.window_day, t.n_events,
               est50.est_p50_cents,
               CAST(ex50u.up50 - 1 AS BIGINT) AS exact_p50_cents,
               CAST(est50.est_p50_cents - (ex50u.up50 - 1) AS BIGINT)
                   AS err_p50_cents,
               est95.est_p95_cents,
               CAST(ex95u.up95 - 1 AS BIGINT) AS exact_p95_cents,
               CAST(est95.est_p95_cents - (ex95u.up95 - 1) AS BIGINT)
                   AS err_p95_cents
        FROM tw t
        JOIN est50 USING (window_day)
        JOIN est95 USING (window_day)
        JOIN ex50u USING (window_day)
        JOIN ex95u USING (window_day)
        ORDER BY t.window_day
    """,
}

"""Mergeable-sketch window pack (T67): trailing-7-day distinct actives
per day from DAILY HLL register partials — the production pattern the
plain rolling-distinct query cannot scale to: the exact version re-scans
the raw stream per window, while sketch partials are built once per day
and every window is a register-wise MAX over ≤7 tiny tables. Register
merge = groupBy max, which is exactly what makes the sketch mergeable —
this query puts that algebra itself under the cross-engine oracle gate
(same portable md5-slice construction as ext_portable_hll_users).

Scale notes (100 TB):
- daily partials: one events scan → (day, reg≤64, r) — m bytes per
  day, the ETL-time artifact a telemetry store materializes;
- window merge: each register row fans out to the ≤7 windows it serves
  (sequence explode — bounded), then (window_day, reg) max;
- estimates: the dyadic Σ2^-r sum is exact in double on both engines;
- the exact trailing distinct rides alongside for the error readout —
  at 100 TB that column is the one you delete, and the estimate's
  documented ±~13% (m=64) is what you keep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.sketch import (
    hll_estimate_from_registers,
    portable_hll_registers,
)

WINDOW_DAYS = 7


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def hll_trailing_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T67 — per day: trailing-7-day distinct active users, BOTH the
    merged-HLL estimate (daily register partials, register-wise max
    across the window) and the exact count — plus the signed error in
    basis points. Windows at the span head merge fewer than 7 partials
    (standard trailing semantics).

    Scale note: the SKETCH leg is the 100 TB pattern — daily register
    partials fan out at REGISTER grain (≤ m rows/day × 7), merged by
    register-wise MAX. The EXACT leg fans every event row ×7 and is a
    calibration output only; at 100× you would drop it or compute it on
    a sampled day subset."""
    ev = _events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    span = ev.agg(F.max("day").alias("hi"))
    regs = portable_hll_registers(ev, "user_id", ["day"])
    fan = (
        regs.join(F.broadcast(span))
        .select(
            F.explode(
                F.expr(
                    f"sequence(day, least(date_add(day, {WINDOW_DAYS - 1}), hi))"
                )
            ).alias("window_day"),
            "reg",
            "r",
        )
    )
    merged = fan.groupBy("window_day", "reg").agg(F.max("r").alias("r"))
    est = hll_estimate_from_registers(merged, ["window_day"])
    exact = (
        ev.join(F.broadcast(span))
        .select(
            F.explode(
                F.expr(
                    f"sequence(day, least(date_add(day, {WINDOW_DAYS - 1}), hi))"
                )
            ).alias("window_day"),
            "user_id",
        )
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_actives"))
    )
    return (
        est.join(exact, "window_day")
        .select(
            "window_day",
            "exact_actives",
            F.col("hll_estimate").cast("long").alias("hll_estimate"),
            F.expr(
                "((hll_estimate - exact_actives) * 10000)"
                " DIV exact_actives"
            ).cast("long").alias("err_bp"),
        )
        .orderBy("window_day")
    )


QUERIES = {"t67_hll_trailing_actives": hll_trailing_actives}

ORACLE = {
    "t67_hll_trailing_actives": f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        span AS (SELECT MAX(day) AS hi FROM ev),
        hashed AS (
            SELECT day,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 64 AS reg,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT
                       AS h2
            FROM ev
        ),
        daily_regs AS (
            SELECT day, reg,
                   MAX(CASE WHEN h2 = 0 THEN 33
                            ELSE 33 - length(bin(h2)) END) AS r
            FROM hashed GROUP BY 1, 2
        ),
        fan AS (
            SELECT unnest(generate_series(day,
                       least(day + INTERVAL {WINDOW_DAYS - 1} DAY,
                             (SELECT hi FROM span)),
                       INTERVAL 1 DAY))::DATE AS window_day,
                   reg, r
            FROM daily_regs
        ),
        merged AS (
            SELECT window_day, reg, MAX(r) AS r FROM fan GROUP BY 1, 2
        ),
        per AS (
            SELECT window_day, COUNT(*) AS n_obs,
                   SUM(power(2.0, -r)) AS s_obs
            FROM merged GROUP BY 1
        ),
        est AS (
            SELECT window_day,
                   CASE WHEN (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) <= 2.5 * 64
                             AND (64 - n_obs) > 0
                        THEN 64.0 * ln(64.0 / (64 - n_obs))
                        ELSE (0.709 * 64 * 64) / (s_obs + (64 - n_obs)) END AS e
            FROM per
        ),
        efan AS (
            SELECT unnest(generate_series(day,
                       least(day + INTERVAL {WINDOW_DAYS - 1} DAY,
                             (SELECT hi FROM span)),
                       INTERVAL 1 DAY))::DATE AS window_day,
                   user_id
            FROM ev
        ),
        exact AS (
            SELECT window_day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_actives
            FROM efan GROUP BY 1
        )
        SELECT x.window_day, x.exact_actives,
               CAST(floor(e) AS BIGINT) AS hll_estimate,
               CAST(((CAST(floor(e) AS BIGINT) - x.exact_actives) * 10000)
                    // x.exact_actives AS BIGINT) AS err_bp
        FROM exact x JOIN est USING (window_day)
        ORDER BY x.window_day
    """,
}

"""Isotonic-regression / average-precision / raking pack (T57):
isotonic (monotone) regression of conversion on hour-of-day via the
exact max-min interval formula (the PAVA fit, computed declaratively
on the bounded grid — THE calibration tool, here testing "does
conversion really rise over the day"), average precision (PR-AUC's
exact pointwise form — the ranking metric that, unlike ROC-AUC (ext),
does not reward a model for ranking easy negatives last), and
2-round iterative proportional fitting (raking) of the weekday×hour
table to uniform margins, with the effective sample size of the
resulting weights (the survey-weighting readout).

Reference anchors (SURVEY §2): isotonic reads the hour-conversion
grid of the t53 trend test; AP evaluates the same weekday-rate
forecast the t49 Brier decomposition grades; raking reweights the
t51/t54 load grid.

Scale notes (100 TB):
- isotonic: the max-min formula max_{a≤i} min_{b≥i} rate(a,b) runs
  on ALL O(K²)=300 intervals of the K=24 grid — bounded driver-free
  cross joins; interval rates floor to micro once (documented), so
  both engines pick identical fits.
- AP: one rank window with a deterministic tiebreak; per-positive
  precision terms floor to micro before the sum.
- raking: 2 bounded rounds of margin scaling in floored micro
  weights; ESS = (Σw)²/Σw² is one shared expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_RAKE_ROUNDS = 2
_WD_ANCHOR = "1996-01-01"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T57a: isotonic regression of conversion on hour ---------------------------------


def isotonic_hour_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T57a — isotonic regression of purchase rate on hour-of-day:
    the best NON-DECREASING fit, via the exact max-min formula
    iso(i) = max_{a≤i} min_{b≥i} rate(a..b) (equivalent to PAVA; all
    O(K²) interval rates on the 24-bucket grid floor to micro once,
    so the max-min lattice is identical on both engines). Output per
    hour: raw rate, isotonic fit, and the pooling flag (fit ≠ raw ⇒
    the hour sits inside a pooled violator block). The monotone story
    the Cochran-Armitage test (t53) scores — here as the actual
    fitted curve.

    Scale: one hour grid; interval enumeration is a bounded
    24×24 cross join."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.expr("CAST(hour(ts) AS BIGINT)").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("c"),
    ).localCheckpoint(eager=True)
    wcum = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "h",
        "n",
        "c",
        F.sum("n").over(wcum).cast("long").alias("cn"),
        F.sum("c").over(wcum).cast("long").alias("cc"),
    )
    a = cum.select(
        F.col("h").alias("a"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
        (F.col("cc") - F.col("c")).alias("cc_before"),
    )
    b = cum.select(
        F.col("h").alias("b"),
        F.col("cn").alias("cn_at"),
        F.col("cc").alias("cc_at"),
    )
    intervals = (
        a.join(b, F.col("a") <= F.col("b"))
        .select(
            "a",
            "b",
            F.expr(
                "((cc_at - cc_before) * 1000000)"
                " DIV (cn_at - cn_before)"
            ).alias("rate"),
        )
    )
    hours = grid.select("h")
    # min over b >= i of the best (max over a <= i) — two bounded folds
    inner = (
        hours.join(intervals, F.col("a") <= F.col("h"))
        .filter(F.col("b") >= F.col("h"))
    )
    # iso(i) = max_{a<=i} min_{b>=i} rate(a,b): fold min over b per
    # (h, a), then max over a
    iso = (
        inner.groupBy("h", "a")
        .agg(F.min("rate").alias("minb"))
        .groupBy("h")
        .agg(F.max("minb").cast("long").alias("iso_micro"))
    )
    return (
        grid.join(iso, "h")
        .select(
            "h",
            "n",
            "c",
            F.expr("(c * 1000000) DIV n").alias("raw_micro"),
            "iso_micro",
        )
        .withColumn(
            "pooled", F.expr("iso_micro <> (c * 1000000) DIV n")
        )
        .orderBy("h")
    )


# --- T57b: average precision (exact PR metric) -----------------------------------------

_AP = "(CAST(ap_sum AS DOUBLE) / (CAST(n_pos AS DOUBLE) * 1000000.0))"


def average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T57b — exact average precision of the weekday-rate forecast
    (the t49 model) ranking events by purchase propensity: events
    sort by (score desc, event_id) — a deterministic total order, so
    both engines walk the identical ranking — and AP folds as
    Σ_{positives} floor(1e6·cum_pos/rank) / (n_pos·1e6). The
    PR-side twin of the exact ROC-AUC (ext): with 2% positives,
    ROC-AUC barely moves when the top of the ranking degrades — AP
    collapses, which is why retrieval and imbalanced-class evaluation
    quote it.

    Scale: one broadcast score join + ONE fused two-phase global pass
    (rank.global_rank_and_running_sum: exact rank AND inclusive
    positive-count prefix from a single range repartition) — never a
    bare partition-less window over the event grain; per-positive
    terms floor before the one reduce."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1996-01-01') % 7"
            " AS BIGINT)"
        ).alias("wd"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    wrate = base.groupBy("wd").agg(
        F.expr("(SUM(y) * 1000000) DIV COUNT(*)").alias("score")
    )
    from bigdatamanagement_spark.operators.rank import (
        global_rank_and_running_sum,
    )

    scored = base.join(F.broadcast(wrate), "wd")
    ranked = global_rank_and_running_sum(
        scored, [F.desc("score"), F.asc("event_id")], "y", "rk", "cum_pos"
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.expr("(cum_pos * 1000000) DIV rk"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("ap_sum"),
    ).select(
        "n_events",
        "n_pos",
        "ap_sum",
        F.expr(_AP).alias("average_precision"),
        F.expr(
            "CAST(n_pos AS DOUBLE) / CAST(n_events AS DOUBLE)"
        ).alias("baseline_prevalence"),
    )


# --- T57c: iterative proportional fitting (raking) --------------------------------------

_ESS = (
    "(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)"
    " / (CAST(sww_m AS DOUBLE) * 1000000.0))"
)


def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T57c — 2-round iterative proportional fitting (raking) of the
    weekday×hour event table toward UNIFORM margins: per round every
    cell's weight scales by target/current row margin, then by
    target/current column margin — weights carried as floored micro
    (documented; both engines walk identical integer states). Output:
    the margin residuals after raking (max row/col deviation from
    uniform, micro) and the effective sample size of the final
    weights (ESS = (Σw)²/Σw² — how many 'equal' observations the
    reweighted table is worth; the cost of calibration in variance).
    The survey-weighting op behind every post-stratified metric.

    Scale: the 168-cell grid; 2 bounded rounds of margin joins."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.expr(
            f"CAST(datediff(CAST(ts AS DATE), DATE '{_WD_ANCHOR}') % 7"
            " AS BIGINT)"
        ).alias("wd"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = grid.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count_distinct("wd").cast("long").alias("n_wd"),
        F.count_distinct("h").cast("long").alias("n_h"),
    )
    # initial weight = 1e6 per observation unit; cell mass = n * w
    state = grid.join(F.broadcast(tot)).select(
        "wd", "h", "n", "nn", "n_wd", "n_h",
        F.lit(_MICRO).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    for _ in range(_RAKE_ROUNDS):
        rowm = state.groupBy("wd").agg(
            F.sum(F.expr("n * w")).alias("rmass")
        )
        state = (
            state.join(F.broadcast(rowm), "wd")
            .select(
                "wd", "h", "n", "nn", "n_wd", "n_h",
                # target row mass = nn*1e6/n_wd; scale w by target/rmass
                F.expr(
                    "(w * ((nn * 1000000) DIV n_wd)) DIV rmass"
                ).alias("w"),
            )
        )
        colm = state.groupBy("h").agg(
            F.sum(F.expr("n * w")).alias("cmass")
        )
        state = (
            state.join(F.broadcast(colm), "h")
            .select(
                "wd", "h", "n", "nn", "n_wd", "n_h",
                F.expr(
                    "(w * ((nn * 1000000) DIV n_h)) DIV cmass"
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    rowdev = (
        state.groupBy("wd", "nn", "n_wd")
        .agg(F.sum(F.expr("n * w")).alias("rmass"))
        .select(
            F.abs(
                F.col("rmass") - F.expr("(nn * 1000000) DIV n_wd")
            ).alias("dev")
        )
        .agg(F.max("dev").cast("long").alias("max_row_dev"))
    )
    coldev = (
        state.groupBy("h", "nn", "n_h")
        .agg(F.sum(F.expr("n * w")).alias("cmass"))
        .select(
            F.abs(
                F.col("cmass") - F.expr("(nn * 1000000) DIV n_h")
            ).alias("dev")
        )
        .agg(F.max("dev").cast("long").alias("max_col_dev"))
    )
    # Σ n·w² overflows BIGINT already near sf1 with micro weights —
    # fold the square on MILLI weights (w DIV 1000) and rescale by 1e6
    # inside the one shared double expression (documented convention)
    ess = state.agg(
        F.sum(F.expr("n * w")).cast("long").alias("sw"),
        F.sum(F.expr("n * (w DIV 1000) * (w DIV 1000)"))
        .cast("long")
        .alias("sww_m"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("nn").cast("long").alias("n_events"),
    )
    return (
        ess.join(rowdev)
        .join(coldev)
        .select(
            "n_cells",
            "n_events",
            "max_row_dev",
            "max_col_dev",
            F.expr(_ESS).alias("ess"),
        )
    )


QUERIES = {
    "t57_isotonic_hour_conversion": isotonic_hour_conversion,
    "t57_average_precision": average_precision,
    "t57_ipf_raking": ipf_raking,
}

_RAKE_SQL = "".join(
    f""",
    rw{r} AS (
        SELECT s.wd, s.h, s.n, s.nn, s.n_wd, s.n_h,
               (s.w * ((s.nn * 1000000) // s.n_wd)) // m.rmass AS w
        FROM st{r - 1} s JOIN (
            SELECT wd, CAST(SUM(n * w) AS BIGINT) AS rmass
            FROM st{r - 1} GROUP BY 1
        ) m USING (wd)
    ),
    st{r} AS (
        SELECT s.wd, s.h, s.n, s.nn, s.n_wd, s.n_h,
               (s.w * ((s.nn * 1000000) // s.n_h)) // m.cmass AS w
        FROM rw{r} s JOIN (
            SELECT h, CAST(SUM(n * w) AS BIGINT) AS cmass
            FROM rw{r} GROUP BY 1
        ) m USING (h)
    )"""
    for r in range(1, _RAKE_ROUNDS + 1)
)

ORACLE = {
    "t57_isotonic_hour_conversion": """
        WITH grid AS (
            SELECT CAST(hour(ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        cum AS (
            SELECT h, n, c,
                   CAST(SUM(n) OVER (ORDER BY h
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
                   CAST(SUM(c) OVER (ORDER BY h
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
            FROM grid
        ),
        intervals AS (
            SELECT a.h AS a, b.h AS b,
                   ((b.cc - (a.cc - a.c)) * 1000000)
                       // (b.cn - (a.cn - a.n)) AS rate
            FROM cum a JOIN cum b ON a.h <= b.h
        ),
        iso AS (
            SELECT h, CAST(MAX(minb) AS BIGINT) AS iso_micro FROM (
                SELECT g.h, i.a, MIN(i.rate) AS minb
                FROM grid g JOIN intervals i
                     ON i.a <= g.h AND i.b >= g.h
                GROUP BY 1, 2
            ) GROUP BY 1
        )
        SELECT g.h, g.n, g.c,
               (g.c * 1000000) // g.n AS raw_micro,
               iso.iso_micro,
               iso.iso_micro <> (g.c * 1000000) // g.n AS pooled
        FROM grid g JOIN iso ON g.h = iso.h
        ORDER BY g.h
    """,
    "t57_average_precision": f"""
        WITH base AS (
            SELECT event_id,
                   CAST(datediff('day', DATE '1996-01-01',
                                 CAST(ts AS DATE)) % 7 AS BIGINT) AS wd,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        wrate AS (
            SELECT wd, (SUM(y) * 1000000) // COUNT(*) AS score
            FROM base GROUP BY 1
        ),
        ranked AS (
            SELECT y,
                   CAST(row_number() OVER (ORDER BY score DESC, event_id)
                        AS BIGINT) AS rk,
                   CAST(SUM(y) OVER (ORDER BY score DESC, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
            FROM base JOIN wrate USING (wd)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN y = 1
                    THEN (cum_pos * 1000000) // rk ELSE 0 END)
                    AS BIGINT) AS ap_sum,
               {_AP.replace("ap_sum", "SUM(CASE WHEN y = 1"
                   " THEN (cum_pos * 1000000) // rk ELSE 0 END)")
                   .replace("n_pos", "SUM(y)")} AS average_precision,
               CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS baseline_prevalence
        FROM ranked
    """,
    "t57_ipf_raking": f"""
        WITH grid AS (
            SELECT CAST(datediff('day', DATE '{_WD_ANCHOR}',
                                 CAST(ts AS DATE)) % 7 AS BIGINT) AS wd,
                   CAST(hour(ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(COUNT(DISTINCT wd) AS BIGINT) AS n_wd,
                   CAST(COUNT(DISTINCT h) AS BIGINT) AS n_h
            FROM grid
        ),
        st0 AS (
            SELECT wd, h, n, nn, n_wd, n_h,
                   CAST(1000000 AS BIGINT) AS w
            FROM grid CROSS JOIN tot
        ){_RAKE_SQL},
        rowdev AS (
            SELECT CAST(MAX(abs(rmass - (nn * 1000000) // n_wd))
                        AS BIGINT) AS max_row_dev
            FROM (
                SELECT wd, nn, n_wd, CAST(SUM(n * w) AS BIGINT) AS rmass
                FROM st{_RAKE_ROUNDS} GROUP BY 1, 2, 3
            )
        ),
        coldev AS (
            SELECT CAST(MAX(abs(cmass - (nn * 1000000) // n_h))
                        AS BIGINT) AS max_col_dev
            FROM (
                SELECT h, nn, n_h, CAST(SUM(n * w) AS BIGINT) AS cmass
                FROM st{_RAKE_ROUNDS} GROUP BY 1, 2, 3
            )
        ),
        ess AS (
            SELECT CAST(SUM(n * w) AS BIGINT) AS sw,
                   CAST(SUM(n * (w // 1000) * (w // 1000)) AS BIGINT)
                       AS sww_m,
                   CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(MAX(nn) AS BIGINT) AS n_events
            FROM st{_RAKE_ROUNDS}
        )
        SELECT n_cells, n_events, max_row_dev, max_col_dev,
               {_ESS} AS ess
        FROM ess CROSS JOIN rowdev CROSS JOIN coldev
    """,
}

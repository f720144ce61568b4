"""A/A-calibration / forecast-reconciliation / capacity-profile /
permutation-entropy pack (T51): an A/A calibration audit of the
experimentation stack (the t19 z-test replayed on 8 deterministic
null splits — a healthy harness crosses 1.96 about 5% of the time),
hierarchical forecast reconciliation (bottom-up nation forecasts vs a
top-down regional allocation that sums EXACTLY via Hamilton largest
remainders), an hour-of-week capacity profile (peak-to-average and
load factor — the provisioning readout), and the permutation entropy
of daily revenue (ordinal-pattern predictability — the nonlinear
cousin of the ACF/spectral entries).

Reference anchors (SURVEY §2): A/A calibration completes the
experimentation family (t19 z, t34 SRM, t45 sequential) with the
guardrail that validates all of them; reconciliation composes the
nation/region hierarchy of the T01/T02 joins with the t23 quota
discipline; the capacity profile is the ops face of the t19
seasonality baseline; permutation entropy reads the same daily series
as CUSUM/ACF/Haar.

Scale notes (100 TB):
- A/A: ONE tag pass computes all 8 splits' group bits (distinct md5
  hex nibbles); each split's z folds from 4 exact counts.
- reconciliation: weekly (nation) aggregate; Hamilton allocation is
  two rank windows on ≤|nations| rows; Σ top-down = region forecast
  exactly (pinned).
- capacity: one (weekday, hour) grid; peak/mean/load factor fold
  from exact counts; p95 is a rank pick on the 168-row grid.
- permutation entropy: two lag columns on the day grid; 6 ordinal
  pattern counts; micro-nat floored entropy terms.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_WD_ANCHOR = "1996-01-01"
_AA_SPLITS = 8

_AA_Z_RAW = (
    "((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
    " * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
    " * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))))"
)
# a degenerate split (everyone in one arm — possible on a tiny corpus)
# has no defined z; guard it to NULL on both engines
_AA_Z = (
    "(CASE WHEN n0 > 0 AND n1 > 0 AND c0 + c1 > 0"
    " AND c0 + c1 < n0 + n1"
    f" THEN {_AA_Z_RAW} ELSE CAST(NULL AS DOUBLE) END)"
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T51a: A/A calibration audit ------------------------------------------------


def aa_test_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T51a — A/A calibration of the two-proportion z-test: the t19
    conversion test replayed on 8 NULL splits (split j = parity of
    md5 hex nibble j+1 of the user id — independent-ish hash bits, no
    real treatment anywhere), one row per split with its z and the
    |z| > 1.96 flag. A calibrated harness crosses ~5% of the time;
    systematic crossings mean the unit of analysis or the variance
    estimate is wrong — THE pre-flight check before trusting any of
    the engine's experiment readouts.

    Scale: one user-keyed aggregate computes conversion + all 8
    split bits; each split folds 4 exact counts."""
    ev = _events(spark, sf_dir)
    bit_cols = [
        F.expr(
            f"CAST(conv(substring(md5(CAST(user_id AS STRING)),"
            f" {j + 1}, 1), 16, 10) AS BIGINT) % 2"
        ).alias(f"g{j}")
        for j in range(_AA_SPLITS)
    ]
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv")
    ).select("user_id", "conv", *bit_cols).localCheckpoint(eager=True)
    outs = []
    for j in range(_AA_SPLITS):
        mom = per_user.agg(
            F.sum(F.when(F.col(f"g{j}") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(F.col(f"g{j}") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col(f"g{j}") == 0, F.col("conv")).otherwise(0))
            .cast("long")
            .alias("c0"),
            F.sum(F.when(F.col(f"g{j}") == 1, F.col("conv")).otherwise(0))
            .cast("long")
            .alias("c1"),
        )
        outs.append(
            mom.select(
                F.lit(j).cast("long").alias("split_id"),
                "n0",
                "n1",
                "c0",
                "c1",
                F.expr(_AA_Z).alias("z"),
                F.expr(
                    f"COALESCE(abs({_AA_Z}) > 1.96, false)"
                ).alias("significant"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("split_id")


# --- T51b: hierarchical forecast reconciliation -----------------------------------


def forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T51b — bottom-up vs top-down weekly revenue forecasts over the
    nation→region hierarchy: the naive forecast (last completed
    week's revenue, exact cents) per nation rolls up bottom-up; the
    top-down path forecasts the REGION total and allocates it to
    nations by their full-history revenue share using Hamilton
    largest remainders (the t23 quota discipline) — so the allocated
    units sum to the region forecast EXACTLY, the coherence property
    ad-hoc proportional rounding silently loses. Revenue folds in
    KILO-DOLLARS (weekly cell cents DIV 100000, documented grain —
    the Hamilton product r_forecast·n_hist overflows BIGINT in cents
    already at sf0.1; kilo-dollars keep it exact through ~sf300).
    Output per nation: both forecasts and the signed gap; the two
    methods agree exactly when last week's mix equals the historical
    mix.

    Scale: one (nation, week) aggregate; allocation is two rank
    windows on ≤|nations| rows per region."""
    t = load_testdata(
        spark,
        sf_dir,
        tables=("orders", "customer", "nation", "region"),
        register=False,
    )
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    geo = (
        t["customer"]
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name", "r_name")
    )
    weekly = (
        t["orders"]
        .select("o_custkey", cents.alias("cents"),
                F.expr("CAST(weekofyear(o_orderdate) AS BIGINT)").alias("wk"))
        .join(F.broadcast(geo), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name", "wk")
        .agg(F.expr("SUM(cents) DIV 100000").alias("rev"))
        .localCheckpoint(eager=True)
    )
    lastwk = weekly.agg(F.max("wk").alias("lw"))
    bu = (
        weekly.join(F.broadcast(lastwk))
        .filter(F.col("wk") == F.col("lw"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev").alias("bu_forecast"))
    )
    hist = weekly.groupBy("r_name", "n_name").agg(
        F.sum("rev").alias("n_hist")
    )
    rhist = hist.groupBy("r_name").agg(F.sum("n_hist").alias("r_hist"))
    rfc = bu.groupBy("r_name").agg(F.sum("bu_forecast").alias("r_forecast"))
    base = (
        hist.join(F.broadcast(rhist), "r_name")
        .join(F.broadcast(rfc), "r_name")
        .select(
            "r_name",
            "n_name",
            "n_hist",
            F.expr("(r_forecast * n_hist) DIV r_hist").alias("td_floor"),
            F.expr("(r_forecast * n_hist) % r_hist").alias("rem"),
            "r_forecast",
        )
    )
    wrem = Window.partitionBy("r_name").orderBy(
        F.desc("rem"), F.asc("n_name")
    )
    short = base.groupBy("r_name", "r_forecast").agg(
        F.sum("td_floor").alias("alloc")
    ).select(
        "r_name", (F.col("r_forecast") - F.col("alloc")).alias("short")
    )
    td = (
        base.join(F.broadcast(short), "r_name")
        .select(
            "r_name",
            "n_name",
            F.expr(
                "td_floor + CASE WHEN rk <= short THEN 1 ELSE 0 END"
            ).alias("td_forecast")
            if False
            else (
                F.col("td_floor")
                + F.when(
                    F.row_number().over(wrem) <= F.col("short"), 1
                ).otherwise(0)
            ).alias("td_forecast"),
        )
    )
    return (
        bu.join(td, ["r_name", "n_name"], "full")
        .select(
            "r_name",
            "n_name",
            F.coalesce("bu_forecast", F.lit(0)).cast("long").alias(
                "bu_forecast"
            ),
            F.coalesce("td_forecast", F.lit(0)).cast("long").alias(
                "td_forecast"
            ),
        )
        .withColumn(
            "gap_kd", F.col("bu_forecast") - F.col("td_forecast")
        )
        .orderBy("r_name", "n_name")
    )


# --- T51c: hour-of-week capacity profile --------------------------------------------

# mean_n_micro is already mean*1e6, so /peak_n yields the micro ratio
_LOAD_FACTOR = "(mean_n_micro DIV peak_n)"


def capacity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T51c — hour-of-week capacity profile of the event stream: the
    168-cell (weekday, hour) load grid folded to the provisioning
    numbers — peak cell load, mean load (micro), load factor
    mean/peak (micro — how much capacity a peak-provisioned system
    wastes), and the exact p95 cell load (rank pick on the grid).
    One row; the peak cell's coordinates carried for the on-call
    runbook.

    Scale: one grid aggregate; everything after is 168 rows."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.expr(
            f"CAST(datediff(CAST(ts AS DATE), DATE '{_WD_ANCHOR}') % 7"
            " AS BIGINT)"
        ).alias("wd"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wp = Window.orderBy(F.desc("n"), F.asc("wd"), F.asc("h"))
    wr = Window.orderBy("n")
    ranked = grid.select(
        "wd",
        "h",
        "n",
        F.row_number().over(wp).alias("peak_rn"),
        F.row_number().over(wr).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("cells"),
    ).localCheckpoint(eager=True)
    peak = ranked.filter(F.col("peak_rn") == 1).select(
        F.col("wd").alias("peak_wd"),
        F.col("h").alias("peak_hour"),
        F.col("n").alias("peak_n"),
    )
    p95 = (
        ranked.filter(F.col("rk") * 100 >= F.col("cells") * 95)
        .agg(F.min("n").alias("p95_n"))
    )
    tot = ranked.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("cells"),
    ).select(
        "total",
        "cells",
        F.expr("(total * 1000000) DIV cells").alias("mean_n_micro"),
    )
    return (
        peak.join(p95)
        .join(tot)
        .select(
            "peak_wd",
            "peak_hour",
            "peak_n",
            F.col("p95_n").cast("long").alias("p95_n"),
            "cells",
            "mean_n_micro",
            F.expr(_LOAD_FACTOR).alias("load_factor_micro"),
        )
    )


# --- T51d: permutation entropy --------------------------------------------------------


def permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T51d — order-3 permutation entropy of daily purchase revenue:
    each consecutive day triple maps to one of 6 ordinal patterns
    (ties broken toward the earlier day — documented), the pattern
    distribution's Shannon entropy folds in floored micro-nats, and
    the normalized score divides by ln(6) once in a shared
    expression. 1 = ordinally random walk, 0 = monotone machine —
    the nonlinear predictability diagnostic the ACF (linear, t26)
    and spectral power (periodic, t39) miss by construction.

    Scale: two lag columns on the day grid; the pattern table is ≤6
    rows."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    )
    w = Window.orderBy("day")
    tri = daily.select(
        F.lag("x", 2).over(w).alias("a"),
        F.lag("x", 1).over(w).alias("b"),
        F.col("x").alias("c"),
    ).filter(F.col("a").isNotNull())
    # ordinal pattern id: rank of a, b, c with earlier-wins ties
    pat = tri.select(
        F.expr(
            "(CASE WHEN a <= b THEN 0 ELSE 1 END) * 1"
            " + (CASE WHEN a <= c THEN 0 ELSE 1 END) * 2"
            " + (CASE WHEN b <= c THEN 0 ELSE 1 END) * 4"
        ).alias("p")
    )
    counts = pat.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = counts.agg(F.sum("c").cast("long").alias("n"))
    terms = counts.join(F.broadcast(tot)).agg(
        F.sum(
            F.expr(
                "CAST(floor(-1000000.0 * (CAST(c AS DOUBLE)"
                " / CAST(n AS DOUBLE))"
                " * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("h_micro"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
    )
    return terms.join(F.broadcast(tot)).select(
        "n",
        "n_patterns",
        "h_micro",
        F.expr(
            "CAST(h_micro AS DOUBLE) / 1000000.0 / ln(6.0)"
        ).alias("normalized_pe"),
    )


QUERIES = {
    "t51_aa_test_calibration": aa_test_calibration,
    "t51_forecast_reconciliation": forecast_reconciliation,
    "t51_capacity_profile": capacity_profile,
    "t51_permutation_entropy": permutation_entropy,
}

_AA_ONE = """
        SELECT CAST({j} AS BIGINT) AS split_id, n0, n1, c0, c1,
               {z} AS z, COALESCE(abs({z}) > 1.96, false) AS significant
        FROM (
            SELECT CAST(SUM(CASE WHEN g{j} = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN g{j} = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN g{j} = 0 THEN conv ELSE 0 END)
                        AS BIGINT) AS c0,
                   CAST(SUM(CASE WHEN g{j} = 1 THEN conv ELSE 0 END)
                        AS BIGINT) AS c1
            FROM per_user
        )
"""

ORACLE = {
    "t51_aa_test_calibration": f"""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv,
                   {", ".join(
                       f"(('0x' || substring(md5(user_id::VARCHAR),"
                       f" {j + 1}, 1))::BIGINT) % 2 AS g{j}"
                       for j in range(_AA_SPLITS)
                   )}
            FROM events GROUP BY 1
        )
        {" UNION ALL ".join(
            _AA_ONE.format(j=j, z=_AA_Z) for j in range(_AA_SPLITS)
        )}
        ORDER BY split_id
    """,
    "t51_forecast_reconciliation": """
        WITH geo AS (
            SELECT c.c_custkey, n.n_name, r.r_name
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        weekly AS (
            SELECT g.r_name, g.n_name,
                   CAST(weekofyear(o.o_orderdate) AS BIGINT) AS wk,
                   CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                        // 100000 AS BIGINT) AS rev
            FROM orders o JOIN geo g ON o.o_custkey = g.c_custkey
            GROUP BY 1, 2, 3
        ),
        lastwk AS (SELECT MAX(wk) AS lw FROM weekly),
        bu AS (
            SELECT r_name, n_name, CAST(SUM(rev) AS BIGINT) AS bu_forecast
            FROM weekly CROSS JOIN lastwk WHERE wk = lw
            GROUP BY 1, 2
        ),
        hist AS (
            SELECT r_name, n_name, CAST(SUM(rev) AS BIGINT) AS n_hist
            FROM weekly GROUP BY 1, 2
        ),
        rhist AS (SELECT r_name, CAST(SUM(n_hist) AS BIGINT) AS r_hist
                  FROM hist GROUP BY 1),
        rfc AS (SELECT r_name, CAST(SUM(bu_forecast) AS BIGINT)
                    AS r_forecast FROM bu GROUP BY 1),
        base AS (
            SELECT h.r_name, h.n_name, h.n_hist,
                   (f.r_forecast * h.n_hist) // rh.r_hist AS td_floor,
                   (f.r_forecast * h.n_hist) % rh.r_hist AS rem,
                   f.r_forecast
            FROM hist h
            JOIN rhist rh ON h.r_name = rh.r_name
            JOIN rfc f ON h.r_name = f.r_name
        ),
        short AS (
            SELECT r_name, MAX(r_forecast) - SUM(td_floor) AS short
            FROM base GROUP BY 1
        ),
        td AS (
            SELECT b.r_name, b.n_name,
                   b.td_floor + CASE WHEN
                       row_number() OVER (PARTITION BY b.r_name
                                          ORDER BY b.rem DESC,
                                                   b.n_name ASC) <= s.short
                       THEN 1 ELSE 0 END AS td_forecast
            FROM base b JOIN short s ON b.r_name = s.r_name
        )
        SELECT COALESCE(bu.r_name, td.r_name) AS r_name,
               COALESCE(bu.n_name, td.n_name) AS n_name,
               CAST(COALESCE(bu.bu_forecast, 0) AS BIGINT) AS bu_forecast,
               CAST(COALESCE(td.td_forecast, 0) AS BIGINT) AS td_forecast,
               CAST(COALESCE(bu.bu_forecast, 0)
                    - COALESCE(td.td_forecast, 0) AS BIGINT) AS gap_kd
        FROM bu FULL JOIN td
             ON bu.r_name = td.r_name AND bu.n_name = td.n_name
        ORDER BY r_name, n_name
    """,
    "t51_capacity_profile": f"""
        WITH grid AS (
            SELECT CAST(datediff('day', DATE '{_WD_ANCHOR}',
                                 CAST(ts AS DATE)) % 7 AS BIGINT) AS wd,
                   CAST(hour(ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT wd, h, n,
                   row_number() OVER (ORDER BY n DESC, wd ASC, h ASC)
                       AS peak_rn,
                   CAST(row_number() OVER (ORDER BY n) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS cells
            FROM grid
        ),
        peak AS (
            SELECT wd AS peak_wd, h AS peak_hour, n AS peak_n
            FROM ranked WHERE peak_rn = 1
        ),
        p95 AS (
            SELECT CAST(MIN(n) AS BIGINT) AS p95_n
            FROM ranked WHERE rk * 100 >= cells * 95
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS cells,
                   (SUM(n) * 1000000) // COUNT(*) AS mean_n_micro
            FROM ranked
        )
        SELECT peak_wd, peak_hour, peak_n, p95_n, cells, mean_n_micro,
               {_LOAD_FACTOR.replace(" DIV ", " // ")} AS load_factor_micro
        FROM peak CROSS JOIN p95 CROSS JOIN tot
    """,
    "t51_permutation_entropy": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        tri AS (
            SELECT lag(x, 2) OVER (ORDER BY day) AS a,
                   lag(x, 1) OVER (ORDER BY day) AS b,
                   x AS c
            FROM daily
            QUALIFY a IS NOT NULL
        ),
        pat AS (
            SELECT (CASE WHEN a <= b THEN 0 ELSE 1 END) * 1
                   + (CASE WHEN a <= c THEN 0 ELSE 1 END) * 2
                   + (CASE WHEN b <= c THEN 0 ELSE 1 END) * 4 AS p
            FROM tri
        ),
        counts AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c
                   FROM pat GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
        terms AS (
            SELECT CAST(SUM(CAST(floor(-1000000.0
                       * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
                       AS BIGINT)) AS BIGINT) AS h_micro,
                   CAST(COUNT(*) AS BIGINT) AS n_patterns
            FROM counts CROSS JOIN tot
        )
        SELECT n, n_patterns, h_micro,
               CAST(h_micro AS DOUBLE) / 1000000.0 / ln(6.0)
                   AS normalized_pe
        FROM terms CROSS JOIN tot
    """,
}

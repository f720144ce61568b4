"""Median-polish / Theil-decomposition / stochastic-dominance pack
(T56): Tukey median polish of the weekday×hour load table (the
OUTLIER-RESISTANT two-way decomposition — the robust twin of the
two-way means the t29 ANOVA implies), the Theil inequality index of
customer spend decomposed within/between nations (the additively
decomposable inequality measure the Gini (t26) famously is not), and
a first-order stochastic dominance check between the purchase and
click value distributions (the decision-theoretic verdict the KS
distance (t26) only hints at).

Reference anchors (SURVEY §2): all three read established substrates —
the hour×weekday grid (t49/t51/t54), the per-customer spend aggregate
(`AmazonRedshift.java:499-509`, t26), and the two-sample value grid
(t26 KS / MW).

Scale notes (100 TB):
- polish: the 168-cell grid; each sweep is a rank-pick median per row
  or column (exact lower medians, deterministic tiebreaks) — all
  integer, 2 full sweeps bounded.
- Theil: per-customer terms floor to micro-nats; spend folds in
  KILO-dollars (documented grain — x·ln-term products stay BIGINT-safe
  through ~sf10; coarsen the grain beyond); within + between ≈ total
  up to the documented floors (pinned in tests).
- dominance: the distinct-value grid; violations are integer
  cross-multiplied CDF comparisons — no division anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_WD_ANCHOR = "1996-01-01"
_POLISH_SWEEPS = 2


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T56a: Tukey median polish -------------------------------------------------------


def median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T56a — Tukey median polish of the weekday×hour event-count
    table (2 full row+column sweeps): row effects = what each weekday
    adds after the hourly rhythm is removed, resistant to single hot
    cells (a flash sale in one cell drags a MEAN decomposition's whole
    row; a median barely moves). All medians are exact lower-median
    rank picks with deterministic tiebreaks, so effects and residuals
    stay pure integers and both engines produce the identical table.
    Output: per-weekday row effect plus the residual L1/max
    diagnostics (repeated per row — one result shape).

    Scale: everything on the 168-cell grid; 2 bounded sweeps of
    rank-window medians."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.expr(
            f"CAST(datediff(CAST(ts AS DATE), DATE '{_WD_ANCHOR}') % 7"
            " AS BIGINT)"
        ).alias("wd"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    state = grid.select(
        "wd", "h", F.col("v").alias("resid")
    ).localCheckpoint(eager=True)
    row_eff = None
    for _ in range(_POLISH_SWEEPS):
        # row sweep: subtract each weekday's lower-median residual
        wrow = Window.partitionBy("wd").orderBy("resid", "h")
        rm = (
            state.select(
                "wd",
                "resid",
                F.row_number().over(wrow).cast("long").alias("rk"),
                F.count(F.lit(1))
                .over(Window.partitionBy("wd"))
                .cast("long")
                .alias("n"),
            )
            .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
            .select("wd", F.col("resid").alias("rm"))
        )
        state = (
            state.join(F.broadcast(rm), "wd")
            .select("wd", "h", (F.col("resid") - F.col("rm")).alias("resid"))
        )
        row_eff = (
            rm if row_eff is None
            else row_eff.join(rm.withColumnRenamed("rm", "rm2"), "wd")
            .select("wd", (F.col("rm") + F.col("rm2")).alias("rm"))
        )
        # column sweep: subtract each hour's lower-median residual
        wcol = Window.partitionBy("h").orderBy("resid", "wd")
        cm = (
            state.select(
                "h",
                "resid",
                F.row_number().over(wcol).cast("long").alias("rk"),
                F.count(F.lit(1))
                .over(Window.partitionBy("h"))
                .cast("long")
                .alias("n"),
            )
            .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
            .select("h", F.col("resid").alias("cm"))
        )
        state = (
            state.join(F.broadcast(cm), "h")
            .select("wd", "h", (F.col("resid") - F.col("cm")).alias("resid"))
            .localCheckpoint(eager=True)
        )
    diag = state.agg(
        F.sum(F.abs(F.col("resid"))).cast("long").alias("resid_l1"),
        F.max(F.abs(F.col("resid"))).cast("long").alias("resid_max"),
    )
    return (
        row_eff.join(F.broadcast(diag))
        .select(
            F.col("wd").alias("weekday"),
            F.col("rm").cast("long").alias("row_effect"),
            "resid_l1",
            "resid_max",
        )
        .orderBy("weekday")
    )


# --- T56b: Theil inequality decomposition -----------------------------------------------

_THEIL_RATIO = "(CAST({x} AS DOUBLE) / CAST({y} AS DOUBLE))"


def theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T56b — Theil-T inequality of customer spend, decomposed within
    vs between nations: T = Σ(x_i/S)·ln(x_i·N/S), and Theil's
    additivity gives T = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ) — the
    between term says how much inequality is NATIONS being rich/poor,
    the within term how much is spread inside them (the question the
    per-nation Gini (t26) cannot aggregate, because Gini does not
    decompose). Spend folds in KILO-dollars (documented grain; the
    x·ln-term products stay BIGINT-safe through ~sf10); every log
    term floors to micro-nats before the weighted sums, so total,
    within and between are each exact integer folds (and total =
    within + between up to the documented floors — pinned in tests).

    Scale: one customer aggregate; per-nation and global moments
    broadcast back; the term fold is one scan of the customer grain."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "customer", "nation"),
        register=False,
    )
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
                " DIV 100000"
            ).alias("x")
        )
        .filter(F.col("x") > 0)
        .join(
            F.broadcast(
                t["customer"]
                .join(
                    F.broadcast(
                        t["nation"].select("n_nationkey", "n_name")
                    ),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
                .select("c_custkey", "n_name")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("n_name", "x")
        .localCheckpoint(eager=True)
    )
    glob = spend.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("x").cast("long").alias("ss"),
    )
    total = (
        spend.join(F.broadcast(glob))
        .select(
            F.expr(
                "x * CAST(floor(1000000.0 * ln(CAST(x AS DOUBLE)"
                " * CAST(nn AS DOUBLE) / CAST(ss AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("term"),
            "ss",
        )
        .agg(
            F.expr("SUM(term) DIV MAX(ss)").alias("total_theil_micro")
        )
    )
    gmom = spend.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sg"),
    )
    within = (
        spend.join(F.broadcast(gmom), "n_name")
        .select(
            F.expr(
                "x * CAST(floor(1000000.0 * ln(CAST(x AS DOUBLE)"
                " * CAST(ng AS DOUBLE) / CAST(sg AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("term")
        )
        .join(F.broadcast(glob))
        .agg(F.expr("SUM(term) DIV MAX(ss)").alias("within_theil_micro"))
    )
    between = (
        gmom.join(F.broadcast(glob))
        .select(
            F.expr(
                "sg * CAST(floor(1000000.0 * ln((CAST(sg AS DOUBLE)"
                " / CAST(ng AS DOUBLE)) / (CAST(ss AS DOUBLE)"
                " / CAST(nn AS DOUBLE)))) AS BIGINT)"
            ).alias("term"),
            "ss",
        )
        .agg(F.expr("SUM(term) DIV MAX(ss)").alias("between_theil_micro"))
    )
    return (
        glob.join(total)
        .join(within)
        .join(between)
        .select(
            F.col("nn").alias("n_customers"),
            "total_theil_micro",
            "within_theil_micro",
            "between_theil_micro",
            (
                F.col("total_theil_micro")
                - F.col("within_theil_micro")
                - F.col("between_theil_micro")
            ).alias("decomposition_gap_micro"),
        )
    )


# --- T56c: first-order stochastic dominance ------------------------------------------------


def stochastic_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T56c — first-order stochastic dominance between the purchase
    and click value distributions: purchase dominates iff its CDF
    sits at or below click's at EVERY value (then every
    expected-utility maximizer with increasing utility prefers
    purchase values) — the decision verdict the KS distance (t26)
    cannot give, since KS is direction-blind. CDF comparisons are
    integer cross-multiplications n_c·cum_p vs n_p·cum_c on the
    distinct-value grid (no division); output: grid size, violation
    counts in BOTH directions, the max scaled violation each way, and
    the two dominance verdicts.

    Scale: one distinct-value aggregate + one cumulative window on
    the compressed grid (the t26 MW/KS shape)."""
    ev = _events(spark, sf_dir)
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    counts = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .select(
            centi.alias("v"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("isp"),
        )
        .groupBy("v")
        .agg(
            F.sum("isp").cast("long").alias("cp"),
            F.sum(1 - F.col("isp")).cast("long").alias("cc"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    nrow = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "v",
        F.sum("cp").over(w).cast("long").alias("cum_p"),
        F.sum("cc").over(w).cast("long").alias("cum_c"),
        F.sum("cp").over(nrow).cast("long").alias("np"),
        F.sum("cc").over(nrow).cast("long").alias("nc"),
    )
    return cum.agg(
        F.count(F.lit(1)).cast("long").alias("n_grid"),
        F.max("np").alias("n_purchase"),
        F.max("nc").alias("n_click"),
        # purchase dominated at v when F_p(v) > F_c(v):
        # cum_p*nc > cum_c*np
        F.sum(
            F.when(
                F.expr("cum_p * nc > cum_c * np"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("viol_p_over_c"),
        F.sum(
            F.when(
                F.expr("cum_c * np > cum_p * nc"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("viol_c_over_p"),
        F.max(F.expr("greatest(cum_p * nc - cum_c * np, 0)"))
        .cast("long")
        .alias("max_gap_p"),
        F.max(F.expr("greatest(cum_c * np - cum_p * nc, 0)"))
        .cast("long")
        .alias("max_gap_c"),
    ).select(
        "n_grid",
        "n_purchase",
        "n_click",
        "viol_p_over_c",
        "viol_c_over_p",
        "max_gap_p",
        "max_gap_c",
        (F.col("viol_p_over_c") == 0).alias("purchase_dominates"),
        (F.col("viol_c_over_p") == 0).alias("click_dominates"),
    )


QUERIES = {
    "t56_median_polish": median_polish,
    "t56_theil_decomposition": theil_decomposition,
    "t56_stochastic_dominance": stochastic_dominance,
}

_POLISH_SWEEP_SQL = "".join(
    f""",
    rm{r} AS (
        SELECT wd, resid AS rm FROM (
            SELECT wd, resid,
                   row_number() OVER (PARTITION BY wd
                                      ORDER BY resid, h) AS rk,
                   COUNT(*) OVER (PARTITION BY wd) AS n
            FROM st{r - 1}
        ) WHERE rk = (n + 1) // 2
    ),
    str{r} AS (
        SELECT s.wd, s.h, s.resid - m.rm AS resid
        FROM st{r - 1} s JOIN rm{r} m USING (wd)
    ),
    cm{r} AS (
        SELECT h, resid AS cm FROM (
            SELECT h, resid,
                   row_number() OVER (PARTITION BY h
                                      ORDER BY resid, wd) AS rk,
                   COUNT(*) OVER (PARTITION BY h) AS n
            FROM str{r}
        ) WHERE rk = (n + 1) // 2
    ),
    st{r} AS (
        SELECT s.wd, s.h, s.resid - m.cm AS resid
        FROM str{r} s JOIN cm{r} m USING (h)
    )"""
    for r in range(1, _POLISH_SWEEPS + 1)
)

ORACLE = {
    "t56_median_polish": f"""
        WITH grid AS (
            SELECT CAST(datediff('day', DATE '{_WD_ANCHOR}',
                                 CAST(ts AS DATE)) % 7 AS BIGINT) AS wd,
                   CAST(hour(ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ),
        st0 AS (SELECT wd, h, v AS resid FROM grid){_POLISH_SWEEP_SQL},
        eff AS (
            SELECT wd, CAST(SUM(rm) AS BIGINT) AS row_effect FROM (
                {" UNION ALL ".join(
                    f"SELECT wd, rm FROM rm{r}"
                    for r in range(1, _POLISH_SWEEPS + 1)
                )}
            ) GROUP BY 1
        ),
        diag AS (
            SELECT CAST(SUM(abs(resid)) AS BIGINT) AS resid_l1,
                   CAST(MAX(abs(resid)) AS BIGINT) AS resid_max
            FROM st{_POLISH_SWEEPS}
        )
        SELECT weekday, row_effect, resid_l1, resid_max FROM (
            SELECT wd AS weekday, row_effect FROM eff
        ) CROSS JOIN diag
        ORDER BY weekday
    """,
    "t56_theil_decomposition": """
        WITH spend AS (
            SELECT n.n_name,
                   SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                       // 100000 AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name, o.o_custkey
            HAVING SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                   // 100000 > 0
        ),
        gmo AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                   CAST(SUM(x) AS BIGINT) AS ss
            FROM spend
        ),
        total AS (
            SELECT CAST(SUM(x * CAST(floor(1000000.0
                       * ln(CAST(x AS DOUBLE) * CAST(nn AS DOUBLE)
                            / CAST(ss AS DOUBLE))) AS BIGINT)) AS BIGINT)
                   // MAX(ss) AS total_theil_micro
            FROM spend CROSS JOIN gmo
        ),
        gmom AS (
            SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(x) AS BIGINT) AS sg
            FROM spend GROUP BY 1
        ),
        within AS (
            SELECT CAST(SUM(x * CAST(floor(1000000.0
                       * ln(CAST(x AS DOUBLE) * CAST(ng AS DOUBLE)
                            / CAST(sg AS DOUBLE))) AS BIGINT)) AS BIGINT)
                   // MAX(ss) AS within_theil_micro
            FROM spend JOIN gmom USING (n_name) CROSS JOIN gmo
        ),
        betw AS (
            SELECT CAST(SUM(sg * CAST(floor(1000000.0
                       * ln((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
                            / (CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))))
                       AS BIGINT)) AS BIGINT)
                   // MAX(ss) AS between_theil_micro
            FROM gmom CROSS JOIN gmo
        )
        SELECT nn AS n_customers, total_theil_micro, within_theil_micro,
               between_theil_micro,
               total_theil_micro - within_theil_micro
                   - between_theil_micro AS decomposition_gap_micro
        FROM gmo CROSS JOIN total CROSS JOIN within CROSS JOIN betw
    """,
    "t56_stochastic_dominance": """
        WITH counts AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                   CAST(SUM(CASE WHEN event_type = 'click'
                        THEN 1 ELSE 0 END) AS BIGINT) AS cc
            FROM events WHERE event_type IN ('purchase', 'click')
            GROUP BY 1
        ),
        cum AS (
            SELECT v,
                   CAST(SUM(cp) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_p,
                   CAST(SUM(cc) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
                   CAST(SUM(cp) OVER () AS BIGINT) AS np,
                   CAST(SUM(cc) OVER () AS BIGINT) AS nc
            FROM counts
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
               MAX(np) AS n_purchase,
               MAX(nc) AS n_click,
               CAST(SUM(CASE WHEN cum_p * nc > cum_c * np THEN 1 ELSE 0
                    END) AS BIGINT) AS viol_p_over_c,
               CAST(SUM(CASE WHEN cum_c * np > cum_p * nc THEN 1 ELSE 0
                    END) AS BIGINT) AS viol_c_over_p,
               CAST(MAX(greatest(cum_p * nc - cum_c * np, 0)) AS BIGINT)
                   AS max_gap_p,
               CAST(MAX(greatest(cum_c * np - cum_p * nc, 0)) AS BIGINT)
                   AS max_gap_c,
               SUM(CASE WHEN cum_p * nc > cum_c * np THEN 1 ELSE 0 END)
                   = 0 AS purchase_dominates,
               SUM(CASE WHEN cum_c * np > cum_p * nc THEN 1 ELSE 0 END)
                   = 0 AS click_dominates
        FROM cum
    """,
}

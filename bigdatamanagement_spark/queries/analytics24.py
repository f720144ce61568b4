"""Supply-risk / shrinkage / residual-diagnostics / lexical pack
(T42): single-source supplier concentration risk per part (supplier
HHI + top concentrated parts), empirical-Bayes (beta-binomial
moment-matched) shrinkage of per-first-touch conversion rates,
standardized Pearson residuals of the hour x type contingency table
(which cells drive the chi-square), and Yule's characteristic K per
document source from exact frequency-of-frequency counts.

Reference anchors (SURVEY §2): the supplier dimension the reference
loads (TPC-H supplier, `AmazonRedshift.java:119-206`) but queries
only through joins gets its risk readout; EB shrinkage fixes the
small-n rate rankings the reference's leaderboards naively sort;
Pearson residuals localize the chi2 the ext pack reports globally;
Yule's K completes the lexical-statistics family (Zipf slope, Chao1,
burstiness, vocab growth).

Scale notes (100 TB):
- supplier risk: one (part, supplier) aggregate -> per-part exact
  HHI micro (sum of squared shares as (q_s^2 * 1e6) DIV q_tot^2
  cross-multiplied — integer only).
- EB: per-group exact (x, n); the moment-matched prior strength and
  the shrunk rates are fixed-order shared expressions.
- residuals: |hours| x |types| cells, each residual one shared
  expression over exact counts.
- Yule's K: token counts -> frequency-of-frequency counts -> the
  exact integer K_scaled = 1e4 * (sum m^2 V(m) - N); only the final
  /N^2 divides, in a shared expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.text import tokens

_RISK_TOP_K = 15
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def supplier_concentration_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T42a — single-source risk: per part the number of distinct
    suppliers and the supplier-mix HHI in exact micro (sum over
    suppliers of (q_s * 1000) DIV q_tot, squared and rescaled —
    integer-only shares so the concentration never touches a
    double), top-15 by (HHI desc, quantity desc, part asc) among
    parts with total quantity >= 50 — the procurement-risk readout of
    the supplier dimension the reference loads but never analyzes.

    Scale: one (part, supplier) aggregate; per-part arithmetic."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)[
        "lineitem"
    ]
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr("CAST(SUM(l_quantity) AS BIGINT)").alias("q")
    )
    share = ps.select(
        "l_partkey",
        "q",
        F.expr(
            "(q * 1000) DIV SUM(q) OVER (PARTITION BY l_partkey)"
        ).alias("share_milli"),
    )
    per_part = share.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("q").cast("long").alias("q_total"),
        F.sum(F.col("share_milli") * F.col("share_milli"))
        .cast("long")
        .alias("hhi_micro"),
    )
    return (
        per_part.filter(F.col("q_total") >= 50)
        .orderBy(F.desc("hhi_micro"), F.desc("q_total"), "l_partkey")
        .limit(_RISK_TOP_K)
    )


_EB = {
    "p0": "(CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))",
    # method-of-moments prior strength m from the between-group
    # variance of rates (fixed-order, guarded to >= 1)
}
_EB_M = (
    "GREATEST(1.0, ((CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))"
    " * (1.0 - CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE)))"
    " / GREATEST(var_rates, 1e-12) - 1.0)"
)
_EB_SHRUNK = (
    f"((CAST(x AS DOUBLE) + {_EB_M}"
    " * (CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE)))"
    f" / (CAST(n AS DOUBLE) + {_EB_M}))"
)


def eb_shrunk_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T42b — empirical-Bayes shrinkage of per-first-touch conversion
    rates (the t35 Wilson groups): the beta-binomial prior strength m
    is moment-matched from the between-group rate variance (var_rates
    computed from exact per-group moments through ONE fixed-order
    pivot — groups are few, so the variance is a fixed-order 5-term
    expression, not an order-dependent aggregate), and every group's
    shrunk rate (x + m*p0)/(n + m) pulls small-n groups toward the
    pooled rate — the ranking fix for every small-sample leaderboard.

    Scale: one user-grain pass -> a |groups|-row table; all doubles
    are fixed-order shared expressions over exact counts."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("g"))
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .select("user_id", F.lit(1).alias("conv"))
    )
    agg = (
        first.join(buyers, "user_id", "left")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce(F.col("conv"), F.lit(0)))
            .cast("long")
            .alias("x"),
        )
        .localCheckpoint()
    )
    tots = agg.agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum("n").cast("long").alias("sn"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    # between-group variance of rates: k <= 5 groups, so collect the
    # exact counts and build ONE fixed-order expression (sorted group
    # order matches the oracle's pivot column order)
    rows = {r["g"]: (r["x"], r["n"]) for r in agg.collect()}
    groups = sorted(rows)
    mu_expr = "(CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))"
    terms = " + ".join(
        f"((CAST({rows[g][0]} AS DOUBLE) / CAST({rows[g][1]} AS DOUBLE)"
        f" - {mu_expr}) * (CAST({rows[g][0]} AS DOUBLE)"
        f" / CAST({rows[g][1]} AS DOUBLE) - {mu_expr}))"
        for g in groups
    )
    var_expr = f"(({terms}) / CAST(k - 1 AS DOUBLE))"
    enriched = agg.join(F.broadcast(tots)).select(
        "g",
        "n",
        "x",
        F.expr(var_expr).alias("var_rates"),
        "sx",
        "sn",
    )
    return enriched.select(
        F.col("g").alias("first_type"),
        "n",
        "x",
        F.expr("CAST(x AS DOUBLE) / CAST(n AS DOUBLE)").alias("raw_rate"),
        F.expr(_EB_M).alias("prior_strength"),
        F.expr(_EB_SHRUNK).alias("shrunk_rate"),
    ).orderBy("first_type")


_RESID = (
    "((CAST(c AS DOUBLE) - CAST(r AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    " / sqrt(CAST(r AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    " * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))))"
)


def pearson_residual_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T42c — standardized (adjusted) Pearson residuals of the
    hour x event-type contingency table: residual = (O - E) /
    sqrt(E (1-r/n)(1-s/n)) per cell from exact counts through ONE
    shared expression; the top-10 |residual| cells name WHICH
    hour-type combinations drive the dependence the chi-square / MI
    (ext chi2, t37) only report globally. Ranking is on the shared
    doubles (identical trees both engines), ties by (hour, type).

    Scale: one grid aggregate + broadcast marginals; |cells| rows."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.hour("ts").cast("long").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    rowm = grid.groupBy("h").agg(F.sum("c").alias("r"))
    colm = grid.groupBy("event_type").agg(F.sum("c").alias("s"))
    tot = grid.agg(F.sum("c").alias("n"))
    cells = (
        grid.join(F.broadcast(rowm), "h")
        .join(F.broadcast(colm), "event_type")
        .join(F.broadcast(tot))
        .select(
            "h",
            "event_type",
            "c",
            F.expr(_RESID).alias("residual"),
        )
    )
    return (
        cells.select("h", "event_type", "c", "residual",
                     F.abs(F.col("residual")).alias("abs_residual"))
        .orderBy(F.desc("abs_residual"), "h", "event_type")
        .limit(10)
    )


_YULE_K = (
    "(10000.0 * (CAST(m2v AS DOUBLE) - CAST(n_tok AS DOUBLE))"
    " / (CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE)))"
)


def yule_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T42d — Yule's characteristic K per document source: K = 1e4 *
    (sum_m m^2 V(m) - N) / N^2 over the frequency-of-frequency
    spectrum (V(m) = number of distinct tokens occurring exactly m
    times) — the repeat-richness constant that, unlike the raw
    type-token ratio, is length-invariant. m2v and N are exact
    BIGINTs; one shared division.

    Scale: token counts -> freq-of-freq counts -> one reduce per
    source."""
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("m"))
    fof = tf.groupBy("source", "m").agg(F.count(F.lit(1)).alias("vm"))
    agg = fof.groupBy("source").agg(
        F.sum(F.col("m") * F.col("vm")).cast("long").alias("n_tok"),
        F.sum(F.col("m") * F.col("m") * F.col("vm"))
        .cast("long")
        .alias("m2v"),
        F.sum("vm").cast("long").alias("vocab"),
    )
    return agg.select(
        "source", "n_tok", "vocab", "m2v", F.expr(_YULE_K).alias("yule_k")
    ).orderBy("source")


QUERIES = {
    "t42_supplier_concentration": supplier_concentration_risk,
    "t42_eb_shrunk_conversion": eb_shrunk_conversion,
    "t42_pearson_residual_cells": pearson_residual_cells,
    "t42_yule_k_by_source": yule_k_by_source,
}

ORACLE = {
    "t42_supplier_concentration": f"""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(l_quantity) AS BIGINT) AS q
            FROM lineitem GROUP BY 1, 2
        ),
        share AS (
            SELECT l_partkey, q,
                   (q * 1000) // SUM(q) OVER (PARTITION BY l_partkey)
                       AS share_milli
            FROM ps
        )
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(q) AS BIGINT) AS q_total,
               CAST(SUM(share_milli * share_milli) AS BIGINT) AS hhi_micro
        FROM share GROUP BY 1
        HAVING SUM(q) >= 50
        ORDER BY hhi_micro DESC, q_total DESC, l_partkey ASC
        LIMIT {_RISK_TOP_K}
    """,
    "t42_pearson_residual_cells": f"""
        WITH grid AS (
            SELECT CAST(hour(ts) AS BIGINT) AS h, event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        rowm AS (SELECT h, SUM(c) AS r FROM grid GROUP BY 1),
        colm AS (SELECT event_type, SUM(c) AS s FROM grid GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM grid),
        cells AS (
            SELECT h, event_type, c, {_RESID} AS residual
            FROM grid JOIN rowm USING (h) JOIN colm USING (event_type)
            CROSS JOIN tot
        )
        SELECT h, event_type, c, residual, abs(residual) AS abs_residual
        FROM cells
        ORDER BY abs_residual DESC, h, event_type LIMIT 10
    """,
    "t42_yule_k_by_source": f"""
        WITH tok AS (
            SELECT source,
                   UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS t
            FROM documents
        ),
        tf AS (SELECT source, t, COUNT(*) AS m FROM tok GROUP BY 1, 2),
        fof AS (SELECT source, m, COUNT(*) AS vm FROM tf GROUP BY 1, 2),
        agg AS (
            SELECT source,
                   CAST(SUM(m * vm) AS BIGINT) AS n_tok,
                   CAST(SUM(m * m * vm) AS BIGINT) AS m2v,
                   CAST(SUM(vm) AS BIGINT) AS vocab
            FROM fof GROUP BY 1
        )
        SELECT source, n_tok, vocab, m2v, {_YULE_K} AS yule_k
        FROM agg ORDER BY source
    """,
}


# Static EB oracle: recompute the between-group variance inside SQL
# with a FIXED evaluation order by sorting groups and aggregating the
# squared deviations through an ORDERED list_aggregate-free form: the
# group count is tiny, so we pivot via MIN(CASE) into one row.
_EB_GROUPS = ("click", "error", "purchase", "signup", "view")
_EB_MU = "(CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE))"
_EB_TERMS = " + ".join(
    f"((CAST(x_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE) - {_EB_MU})"
    f" * (CAST(x_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE) - {_EB_MU}))"
    for g in _EB_GROUPS
)
_EB_VAR = f"(({_EB_TERMS}) / CAST(k - 1 AS DOUBLE))"

ORACLE["t42_eb_shrunk_conversion"] = f"""
    WITH first AS (
        SELECT user_id, event_type AS g FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    buyers AS (
        SELECT DISTINCT user_id, 1 AS conv FROM events
        WHERE event_type = 'purchase'
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COALESCE(conv, 0)) AS BIGINT) AS x
        FROM first LEFT JOIN buyers USING (user_id) GROUP BY 1
    ),
    piv AS (
        SELECT CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(n) AS BIGINT) AS sn,
               CAST(COUNT(*) AS BIGINT) AS k,
               {", ".join(
                   f"CAST(MIN(CASE WHEN g = '{g}' THEN x END) AS BIGINT)"
                   f" AS x_{g}, CAST(MIN(CASE WHEN g = '{g}' THEN n END)"
                   f" AS BIGINT) AS n_{g}"
                   for g in _EB_GROUPS
               )}
        FROM agg
    ),
    enriched AS (
        SELECT a.g, a.n, a.x, p.sx, p.sn, {_EB_VAR} AS var_rates
        FROM agg a CROSS JOIN piv p
    )
    SELECT g AS first_type, n, x,
           CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate,
           {_EB_M} AS prior_strength,
           {_EB_SHRUNK} AS shrunk_rate
    FROM enriched ORDER BY first_type
"""

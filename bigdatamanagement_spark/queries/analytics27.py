"""Group-sequential / robust-scale / pricing-audit / newsvendor pack
(T45): a three-look group-sequential A/B readout against O'Brien-
Fleming-style literal boundaries (interim z statistics from exact
cumulative moments), the Rousseeuw-Croux Sn robust scale estimator
(nested medians of pairwise distances, exact rank picks on the day
grain), a psychological price-ending audit (cents-digit distribution
with its uniformity chi-square), and newsvendor optimal stocking
quantiles per brand at literal critical ratios.

Reference anchors (SURVEY §2): group-sequential looks are how the
t19/t24/t34 experimentation family runs in practice (peeking needs
boundaries); Sn completes the robust-scale family (MAD t19, IQR t18,
Theil-Sen t27); the price audit reads the reference's DECIMAL price
columns the way Benford (ext) reads magnitudes; newsvendor turns the
demand distributions the engine already computes into the stocking
decision they exist for.

Scale notes (100 TB):
- sequential: one (user, look) cumulative tag -> per-look exact
  two-group moments; z via shared expressions vs literal boundaries.
- Sn: pairwise |xi - xj| on the DAY grain (435 pairs), two nested
  exact rank picks — never on raw events.
- price audit: one cents-mod-100 aggregate + the chi-square identity
  (100 * sum c^2 / n - n) — no per-cell doubles.
- newsvendor: per-brand weekly demand rank window; the optimal
  quantile is the exact ceil(cr * n) order statistic per critical
  ratio literal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

# O'Brien-Fleming-flavored two-sided boundaries for 3 equally spaced
# looks (literals; both engines compare against the same text)
_OBF_BOUNDS = ((1, "3.471"), (2, "2.454"), (3, "2.004"))
_NEWSVENDOR_CR = (50, 80, 95)  # critical ratios in percent
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


_SEQ_Z = (
    "((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " / sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " + (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)"
    " / CAST(n0 AS DOUBLE)) / CAST(n0 - 1 AS DOUBLE) / CAST(n0 AS DOUBLE)))"
)


def group_sequential_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T45a — three-look group-sequential A/B readout: users split by
    the seedless md5 parity (the t19/t34 discipline); looks cut the
    event stream at its time terciles (exact microsecond thirds);
    each look's CUMULATIVE per-user purchase-value totals give the
    two-group Welch-style z (exact BIGINT moments, shared
    expression), compared to O'Brien-Fleming-flavored literal
    boundaries — the peeking-safe way to read the experiment the
    fixed-horizon z-test (t19) reads once.

    Scale: one tag pass -> per-(look) two-group moments; looks share
    the same exchange (cumulative = look filter on the time tag)."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi"))
    tagged = (
        ev.join(F.broadcast(span))
        .select(
            "user_id",
            F.expr(
                "CASE WHEN unix_micros(CAST(ts AS TIMESTAMP)) - lo"
                " <= (hi - lo) DIV 3 THEN 1"
                " WHEN unix_micros(CAST(ts AS TIMESTAMP)) - lo"
                " <= (2 * (hi - lo)) DIV 3 THEN 2 ELSE 3 END"
            ).alias("look"),
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100, 0) AS BIGINT)"),
            )
            .otherwise(0)
            .alias("v"),
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("g"),
        )
        .localCheckpoint()
    )
    outs = []
    for look, bound in _OBF_BOUNDS:
        per_user = (
            tagged.filter(F.col("look") <= look)
            .groupBy("user_id", "g")
            .agg(F.sum("v").alias("uv"))
        )
        mom = per_user.agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("g") == 0, F.col("uv")).otherwise(0))
            .cast("long")
            .alias("s0"),
            F.sum(F.when(F.col("g") == 1, F.col("uv")).otherwise(0))
            .cast("long")
            .alias("s1"),
            F.sum(
                F.when(F.col("g") == 0, F.col("uv") * F.col("uv")).otherwise(0)
            )
            .cast("long")
            .alias("q0"),
            F.sum(
                F.when(F.col("g") == 1, F.col("uv") * F.col("uv")).otherwise(0)
            )
            .cast("long")
            .alias("q1"),
        )
        outs.append(
            mom.select(
                F.lit(look).cast("long").alias("look"),
                "n0",
                "n1",
                F.expr(_SEQ_Z).alias("z"),
                F.expr(f"CAST({bound} AS DOUBLE)").alias("boundary"),
                F.expr(f"abs({_SEQ_Z}) > {bound}").alias("crossed"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("look")


def sn_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T45b — Rousseeuw-Croux Sn robust scale of daily purchase
    revenue: for each day i the (lower) median of |x_i - x_j| over
    the other days, then the (lower) median of those per-day medians
    — 50% breakdown like the MAD but without assuming symmetry.
    Everything is exact integer rank picks on the day-grain pairwise
    distances; reported next to the classical sd moments for
    contrast.

    Scale: pairwise distances on the DAY grain (435 pairs at 30
    days); two nested rank windows."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
        )
        .localCheckpoint()
    )
    a = daily.select(F.col("day").alias("di"), F.col("x").alias("xi"))
    b = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"))
    dists = (
        a.join(b, F.col("di") != F.col("dj"))
        .select("di", F.abs(F.col("xi") - F.col("xj")).alias("d"))
    )
    w = Window.partitionBy("di").orderBy("d")
    inner = (
        dists.select(
            "di",
            "d",
            F.row_number().over(w).cast("long").alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("di"))
            .cast("long")
            .alias("m"),
        )
        .filter(F.col("rk") == F.expr("(m + 1) DIV 2"))
        .select("di", F.col("d").alias("med_i"))
    )
    ow = Window.orderBy("med_i", "di")
    outer = (
        inner.select(
            "med_i",
            F.row_number().over(ow).cast("long").alias("rk"),
            F.count(F.lit(1))
            .over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
        .select(
            F.col("n").alias("n_days"), F.col("med_i").alias("sn_centi")
        )
    )
    mom = daily.agg(
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        F.expr(
            "sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"
        ).alias("classical_sd_centi")
    )
    return outer.join(F.broadcast(mom))


_PRICE_CHI2 = (
    "(100.0 * CAST(sum_c2 AS DOUBLE) / CAST(n AS DOUBLE)"
    " - CAST(n AS DOUBLE))"
)


def price_ending_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T45c — psychological price-ending audit: the distribution of
    the CENTS digits (price mod 100) of part retail prices — charm
    endings (99, 95, 49...) vs uniform — summarized as the top-5
    endings with exact counts plus the 100-cell uniformity chi-square
    via the algebraic identity 100*sum(c^2)/n - n (the t34 SRM
    discipline, no per-cell doubles). The digit-psychology sibling of
    the Benford audit (ext).

    Scale: one mod-100 aggregate; the chi-square is one reduce."""
    p = load_testdata(spark, sf_dir, tables=("part",), register=False)["part"]
    cents = F.expr("CAST(round(p_retailprice * 100, 0) AS BIGINT) % 100")
    dist = p.select(cents.alias("ending")).groupBy("ending").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = dist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
        F.count(F.lit(1)).cast("long").alias("n_endings"),
    )
    w = Window.orderBy(F.desc("c"), F.asc("ending"))
    top = (
        dist.select(
            F.col("ending").cast("long").alias("ending"),
            F.col("c").cast("long").alias("c"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )
    return (
        top.join(F.broadcast(tot))
        .select(
            F.col("rn").cast("long").alias("rank"),
            "ending",
            "c",
            "n",
            "n_endings",
            F.expr(_PRICE_CHI2).alias("uniformity_chi2"),
        )
        .orderBy("rank")
    )


def newsvendor_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T45d — newsvendor optimal stocking levels per brand: the
    critical-ratio quantiles (50/80/95%) of WEEKLY brand demand as
    exact ceil(cr * n / 100) order statistics — "stock this many to
    meet that service level", the operations decision the demand
    distributions exist to drive. One row per (brand, cr), all
    integers.

    Scale: one (brand, week) demand aggregate + one rank window per
    brand; the cr spine is a broadcast literal."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "part"), register=False
    )
    weekly = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand",
            F.expr("CAST(weekofyear(l_shipdate) AS BIGINT)").alias("wk"),
        )
        .agg(F.expr("CAST(SUM(l_quantity) AS BIGINT)").alias("q"))
    )
    w = Window.partitionBy("p_brand").orderBy("q")
    ranked = weekly.select(
        "p_brand",
        "q",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("p_brand"))
        .cast("long")
        .alias("n"),
    )
    crs = spark.createDataFrame([(c,) for c in _NEWSVENDOR_CR], "cr long")
    picks = (
        ranked.join(F.broadcast(crs))
        .filter(
            F.col("rk") == F.expr("CAST(ceil(cr * n / 100.0) AS BIGINT)")
        )
        .groupBy("p_brand", "cr")
        .agg(
            F.max("n").alias("n_weeks"),
            F.min("q").cast("long").alias("stock_level"),
        )
    )
    return picks.orderBy("p_brand", "cr")


QUERIES = {
    "t45_group_sequential_looks": group_sequential_looks,
    "t45_sn_robust_scale": sn_robust_scale,
    "t45_price_ending_audit": price_ending_audit,
    "t45_newsvendor_quantiles": newsvendor_quantiles,
}

_SEQ_LOOK_ONE = """
        SELECT CAST({look} AS BIGINT) AS look, n0, n1,
               {z} AS z,
               CAST({bound} AS DOUBLE) AS boundary,
               abs({z}) > {bound} AS crossed
        FROM (
            SELECT CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n0,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                   CAST(SUM(CASE WHEN g = 0 THEN uv ELSE 0 END) AS BIGINT)
                       AS s0,
                   CAST(SUM(CASE WHEN g = 1 THEN uv ELSE 0 END) AS BIGINT)
                       AS s1,
                   CAST(SUM(CASE WHEN g = 0 THEN uv * uv ELSE 0 END)
                        AS BIGINT) AS q0,
                   CAST(SUM(CASE WHEN g = 1 THEN uv * uv ELSE 0 END)
                        AS BIGINT) AS q1
            FROM (
                SELECT user_id, g, CAST(SUM(v) AS BIGINT) AS uv
                FROM tagged WHERE look <= {look}
                GROUP BY 1, 2
            )
        )
"""

ORACLE = {
    "t45_group_sequential_looks": f"""
        WITH span AS (
            SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
            FROM events
        ),
        tagged AS (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) - lo <= (hi - lo) // 3 THEN 1
                        WHEN epoch_us(ts) - lo <= (2 * (hi - lo)) // 3
                            THEN 2
                        ELSE 3 END AS look,
                   CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END AS v,
                   (('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT)
                       % 2 AS g
            FROM events CROSS JOIN span
        )
        {" UNION ALL ".join(
            _SEQ_LOOK_ONE.format(look=look, bound=bound, z=_SEQ_Z)
            for look, bound in _OBF_BOUNDS
        )}
        ORDER BY look
    """,
    "t45_sn_robust_scale": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        dists AS (
            SELECT a.day AS di, abs(a.x - b.x) AS d
            FROM daily a JOIN daily b ON a.day <> b.day
        ),
        inner_med AS (
            SELECT di, d AS med_i FROM (
                SELECT di, d,
                       CAST(row_number() OVER (PARTITION BY di ORDER BY d)
                            AS BIGINT) AS rk,
                       CAST(COUNT(*) OVER (PARTITION BY di) AS BIGINT) AS m
                FROM dists
            ) WHERE rk = (m + 1) // 2
        ),
        outer_med AS (
            SELECT n AS n_days, med_i AS sn_centi FROM (
                SELECT med_i, di,
                       CAST(row_number() OVER (ORDER BY med_i, di)
                            AS BIGINT) AS rk,
                       CAST(COUNT(*) OVER () AS BIGINT) AS n
                FROM inner_med
            ) WHERE rk = (n + 1) // 2
        ),
        mom AS (
            SELECT sqrt((CAST(SUM(x * x) AS DOUBLE)
                       - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE))
                       / CAST(COUNT(*) - 1 AS DOUBLE))
                       AS classical_sd_centi
            FROM daily
        )
        SELECT n_days, sn_centi, classical_sd_centi
        FROM outer_med CROSS JOIN mom
    """,
    "t45_price_ending_audit": f"""
        WITH dist AS (
            SELECT CAST(round(p_retailprice * 100, 0) AS BIGINT) % 100
                       AS ending,
                   COUNT(*) AS c
            FROM part GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(c * c) AS BIGINT) AS sum_c2,
                   CAST(COUNT(*) AS BIGINT) AS n_endings
            FROM dist
        ),
        top AS (
            SELECT CAST(ending AS BIGINT) AS ending, CAST(c AS BIGINT) AS c,
                   row_number() OVER (ORDER BY c DESC, ending ASC) AS rn
            FROM dist
        )
        SELECT CAST(rn AS BIGINT) AS rank, ending, c, n, n_endings,
               {_PRICE_CHI2} AS uniformity_chi2
        FROM top CROSS JOIN tot
        WHERE rn <= 5 ORDER BY rank
    """,
    "t45_newsvendor_quantiles": f"""
        WITH weekly AS (
            SELECT p_brand, CAST(weekofyear(l_shipdate) AS BIGINT) AS wk,
                   CAST(SUM(l_quantity) AS BIGINT) AS q
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT p_brand, q,
                   CAST(row_number() OVER (PARTITION BY p_brand ORDER BY q)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n
            FROM weekly
        ),
        crs AS (SELECT UNNEST([{", ".join(str(c) for c in _NEWSVENDOR_CR)}])
                    AS cr)
        SELECT p_brand, CAST(cr AS BIGINT) AS cr,
               MAX(n) AS n_weeks,
               CAST(MIN(q) AS BIGINT) AS stock_level
        FROM ranked CROSS JOIN crs
        WHERE rk = CAST(ceil(cr * n / 100.0) AS BIGINT)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
}

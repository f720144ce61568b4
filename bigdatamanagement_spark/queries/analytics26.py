"""Clustering-coefficient / anomaly-ensemble / recommender-eval /
circular-statistics pack (T44): local clustering coefficients of the
co-purchase graph (exact micro, wedge-closure per vertex), a
consensus anomaly detector (z-score, MAD and IQR flags joined on the
same daily series — days at least two methods agree on), offline
hit-rate@k evaluation of the popularity recommender (train half ->
top-k parts; test half -> customer hit share), and circular
statistics of the purchase time-of-day (mean direction + resultant
length via fixed-order 24-term projections with literal
trigonometric coefficients).

Reference anchors (SURVEY §2): clustering closes the triangle family
(t19 count, t31 assortativity, t39 truss) at the vertex grain; the
ensemble operationalizes "which anomalies are REAL" across the
engine's own t19/t20 detectors; hit-rate@k is THE metric for the
recommendation join the reference ships (`ipynb:1470-1546`);
circular statistics treat hour-of-day as the angle it actually is —
the 23:00-vs-01:00 bug every linear mean-hour report carries.

Scale notes (100 TB):
- clustering: per-vertex triangle counts from ONE wedge-closure
  join; coefficient = (2*tri*1e6) DIV (deg*(deg-1)) exact micro.
- ensemble: three flag sets from the same day-grain aggregate; the
  consensus is a 3-way outer join on day.
- hit-rate: train/test by order-date halves; top-k broadcast; one
  customer-grain semi-join.
- circular: 24 hour-bucket counts pivot to one row; cos/sin
  projections are fixed-order expressions with python-literal
  coefficients (the t39 Goertzel discipline).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_ENSEMBLE_Z_X100 = 250  # |z| > 2.5
_HIT_K = 10
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T44a — local clustering coefficients of the co-purchase graph:
    per vertex, triangles through it over (deg choose 2), in exact
    micro ((2*tri*1e6) DIV (deg*(deg-1))); output the exact global
    aggregate (sum of coefficients, vertex count — the average
    clustering is their shared-expression ratio) plus the top-10 most
    clustered hubs (deg >= 4, coefficient desc, id asc) — how
    clique-ish each part's neighborhood is, the vertex-grain closure
    of the t19 triangle count.

    Scale: ONE wedge-closure join (the t39 k-truss machinery) +
    per-vertex counts; no iteration."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    wedge = (
        edges.alias("l")
        .join(edges.alias("r"), F.col("l.a") == F.col("r.a"))
        .filter(F.col("l.b") < F.col("r.b"))
        .select(
            F.col("l.a").alias("a"),
            F.col("l.b").alias("b"),
            F.col("r.b").alias("c"),
        )
    )
    tri = wedge.join(
        edges.select(F.col("a").alias("b"), F.col("b").alias("c")),
        ["b", "c"],
        "left_semi",
    ).localCheckpoint()
    tri_per_v = (
        tri.select(F.col("a").alias("v"))
        .unionByName(tri.select(F.col("b").alias("v")))
        .unionByName(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = bidir.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    cc = (
        deg.filter(F.col("deg") >= 2)
        .join(tri_per_v, "v", "left")
        .select(
            "v",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).alias("tri"),
        )
        .select(
            "v",
            "deg",
            "tri",
            F.expr(f"(2 * tri * {_MICRO}) DIV (deg * (deg - 1))").alias(
                "cc_micro"
            ),
        )
    )
    top = (
        cc.filter(F.col("deg") >= 4)
        .orderBy(F.desc("cc_micro"), F.desc("deg"), "v")
        .limit(10)
        .select(
            F.col("v").cast("long").alias("part"),
            F.col("deg").cast("long").alias("deg"),
            F.col("tri").cast("long").alias("tri"),
            F.col("cc_micro").cast("long").alias("cc_micro"),
        )
    )
    return top


def anomaly_ensemble_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T44b — consensus anomaly days: the z-score (|n-scaled
    deviation| > 2.5 sigma, cross-multiplied so no division), MAD
    (|x - median| > 2.5 * 1.4826-free raw MAD — documented
    raw-MAD convention, cross-multiplied x2) and IQR (outside
    [q1 - 1.5 IQR, q3 + 1.5 IQR], all integers x4) detectors run on
    the SAME daily revenue series; a day is consensus-anomalous when
    >= 2 methods flag it. The ensemble answer to "which of the
    engine's own detectors' alarms are real".

    Scale: one day aggregate; three flag computations over |days|
    rows; rank picks for median/quartiles."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
        )
        .localCheckpoint()
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    w = Window.orderBy("x", "day")
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    ).localCheckpoint()
    med = ranked.filter(F.col("rk") == F.expr("(n + 1) DIV 2")).select(
        F.col("x").alias("med")
    )
    q1 = ranked.filter(
        F.col("rk") == F.expr("CAST(ceil(25 * n / 100.0) AS BIGINT)")
    ).select(F.col("x").alias("q1"))
    q3 = ranked.filter(
        F.col("rk") == F.expr("CAST(ceil(75 * n / 100.0) AS BIGINT)")
    ).select(F.col("x").alias("q3"))
    devs = daily.join(F.broadcast(med)).select(
        "day", "x", F.abs(F.col("x") - F.col("med")).alias("adev")
    )
    dw = Window.orderBy("adev", "day")
    mad = devs.select(
        "adev",
        F.row_number().over(dw).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    ).filter(F.col("rk") == F.expr("(n + 1) DIV 2")).select(
        F.col("adev").alias("mad")
    )
    flagged = (
        daily.join(F.broadcast(mom))
        .join(F.broadcast(med))
        .join(F.broadcast(mad))
        .join(F.broadcast(q1))
        .join(F.broadcast(q3))
        .select(
            "day",
            "x",
            # z: (n*x - s)^2 * 10000 > z2 * (n*q - s*s) * n  (sigma^2
            # = (n*q - s*s)/n^2 population; cross-multiplied)
            (
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
                * 10000
                > F.lit(_ENSEMBLE_Z_X100)
                * F.lit(_ENSEMBLE_Z_X100)
                * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
            ).alias("f_z"),
            (
                F.abs(F.col("x") - F.col("med")) * 10
                > F.lit(25) * F.col("mad")
            ).alias("f_mad"),
            (
                (F.col("x") * 2 < F.col("q1") * 2 - (F.col("q3") - F.col("q1")) * 3)
                | (F.col("x") * 2 > F.col("q3") * 2 + (F.col("q3") - F.col("q1")) * 3)
            ).alias("f_iqr"),
        )
    )
    scored = flagged.select(
        "day",
        "x",
        "f_z",
        "f_mad",
        "f_iqr",
        (
            F.col("f_z").cast("int")
            + F.col("f_mad").cast("int")
            + F.col("f_iqr").cast("int")
        )
        .cast("long")
        .alias("n_methods"),
    )
    return (
        scored.filter(F.col("n_methods") >= 2)
        .orderBy(F.desc("n_methods"), "day")
        .select("day", "x", "f_z", "f_mad", "f_iqr", "n_methods")
    )


def popularity_hitrate_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T44c — offline hit-rate@10 of the popularity recommender:
    train = orders in the first half of the history, recommend the 10
    most-ordered parts (count desc, part asc); test = customers with
    second-half orders; hit-rate = share whose second-half basket
    intersects the recommendation (exact micro). The evaluation loop
    every recommender ships with, run entirely in-engine against the
    reference's own co-listen recommendation shape.

    Scale: train top-k broadcast; test is one customer-grain
    semi-join + distinct count."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    o = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
    )
    span = o.agg(F.expr("(min(us) + max(us)) div 2").alias("mid_us"))
    li = t["lineitem"].select("l_orderkey", "l_partkey")
    tagged = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(span))
        .select(
            "o_custkey",
            "l_partkey",
            (F.col("us") < F.col("mid_us")).alias("is_train"),
        )
        .localCheckpoint()
    )
    topk = (
        tagged.filter(F.col("is_train"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "l_partkey")
        .limit(_HIT_K)
        .select("l_partkey")
    )
    test_cust = (
        tagged.filter(~F.col("is_train")).select("o_custkey").distinct()
    )
    hit_cust = (
        tagged.filter(~F.col("is_train"))
        .join(F.broadcast(topk), "l_partkey", "left_semi")
        .select("o_custkey")
        .distinct()
    )
    n_test = test_cust.agg(F.count(F.lit(1)).cast("long").alias("n_test"))
    n_hit = hit_cust.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        n_test.join(n_hit)
        .select(
            F.lit(_HIT_K).cast("long").alias("k"),
            "n_test",
            "n_hit",
            F.expr(f"(n_hit * {_MICRO}) DIV n_test").alias("hitrate_micro"),
        )
    )


def _circ_exprs() -> tuple[str, str]:
    cos_terms = " + ".join(
        f"({math.cos(2 * math.pi * h / 24)!r} * CAST(c_{h} AS DOUBLE))"
        for h in range(24)
    )
    sin_terms = " + ".join(
        f"({math.sin(2 * math.pi * h / 24)!r} * CAST(c_{h} AS DOUBLE))"
        for h in range(24)
    )
    return f"({cos_terms})", f"({sin_terms})"


_C_COS, _C_SIN = _circ_exprs()
_C_R = (
    f"(sqrt(({_C_COS}) * ({_C_COS}) + ({_C_SIN}) * ({_C_SIN}))"
    " / CAST(n AS DOUBLE))"
)
_C_MEAN_H = (
    f"(CASE WHEN atan2({_C_SIN}, {_C_COS}) < 0"
    f" THEN atan2({_C_SIN}, {_C_COS}) + 2 * pi()"
    f" ELSE atan2({_C_SIN}, {_C_COS}) END * 24.0 / (2 * pi()))"
)


def circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T44d — circular statistics of the purchase hour-of-day: mean
    direction (the TRUE average clock time — a linear mean of 23:00
    and 01:00 says noon; the circular mean says midnight) and the
    resultant length R (1 = all purchases at the same hour, 0 =
    uniform around the clock). The 24 hour-bucket counts pivot into
    ONE row; cos/sin projections are fixed-order expressions with
    python-literal coefficients (the t39 Goertzel discipline), so
    both engines build identical IEEE trees.

    Scale: one hour aggregate + a 24-column pivot row."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    hourly = ev.groupBy(F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    piv = hourly.agg(
        F.sum("c").cast("long").alias("n"),
        *[
            F.sum(F.when(F.col("h") == h, F.col("c")).otherwise(0))
            .cast("long")
            .alias(f"c_{h}")
            for h in range(24)
        ],
    )
    return piv.select(
        "n",
        F.expr(_C_R).alias("resultant_r"),
        F.expr(_C_MEAN_H).alias("mean_hour"),
    )


QUERIES = {
    "t44_local_clustering": local_clustering,
    "t44_anomaly_ensemble": anomaly_ensemble_consensus,
    "t44_popularity_hitrate": popularity_hitrate_at_k,
    "t44_circular_hour_stats": circular_hour_stats,
}

ORACLE = {
    "t44_local_clustering": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        tri AS (
            SELECT l.a AS a, l.b AS b, r.b AS c
            FROM e0 l JOIN e0 r ON l.a = r.a AND l.b < r.b
            WHERE EXISTS (SELECT 1 FROM e0 e
                          WHERE e.a = l.b AND e.b = r.b)
        ),
        tpv AS (
            SELECT v, COUNT(*) AS tri FROM (
                SELECT a AS v FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY 1
        ),
        bidir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT a AS v, COUNT(*) AS deg FROM bidir GROUP BY 1),
        cc AS (
            SELECT d.v, d.deg, COALESCE(t.tri, 0) AS tri,
                   (2 * COALESCE(t.tri, 0) * {_MICRO})
                       // (d.deg * (d.deg - 1)) AS cc_micro
            FROM deg d LEFT JOIN tpv t ON t.v = d.v
            WHERE d.deg >= 2
        )
        SELECT CAST(v AS BIGINT) AS part, CAST(deg AS BIGINT) AS deg,
               CAST(tri AS BIGINT) AS tri, CAST(cc_micro AS BIGINT)
                   AS cc_micro
        FROM cc WHERE deg >= 4
        ORDER BY cc_micro DESC, deg DESC, v ASC LIMIT 10
    """,
    "t44_anomaly_ensemble": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM daily
        ),
        ranked AS (
            SELECT day, x,
                   CAST(row_number() OVER (ORDER BY x, day) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM daily
        ),
        med AS (SELECT x AS med FROM ranked WHERE rk = (n + 1) // 2),
        qq1 AS (
            SELECT x AS q1 FROM ranked
            WHERE rk = CAST(ceil(25 * n / 100.0) AS BIGINT)
        ),
        qq3 AS (
            SELECT x AS q3 FROM ranked
            WHERE rk = CAST(ceil(75 * n / 100.0) AS BIGINT)
        ),
        devs AS (
            SELECT day, abs(x - med) AS adev FROM daily CROSS JOIN med
        ),
        dr AS (
            SELECT adev,
                   CAST(row_number() OVER (ORDER BY adev, day) AS BIGINT)
                       AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM devs
        ),
        madv AS (SELECT adev AS mad FROM dr WHERE rk = (n + 1) // 2),
        flagged AS (
            SELECT day, x,
                   (n * x - s) * (n * x - s) * 10000
                       > {_ENSEMBLE_Z_X100} * {_ENSEMBLE_Z_X100}
                         * (n * q - s * s) AS f_z,
                   abs(x - med) * 10 > 25 * mad AS f_mad,
                   (x * 2 < q1 * 2 - (q3 - q1) * 3
                    OR x * 2 > q3 * 2 + (q3 - q1) * 3) AS f_iqr
            FROM daily CROSS JOIN mom CROSS JOIN med CROSS JOIN madv
            CROSS JOIN qq1 CROSS JOIN qq3
        )
        SELECT day, x, f_z, f_mad, f_iqr,
               CAST((CASE WHEN f_z THEN 1 ELSE 0 END)
                    + (CASE WHEN f_mad THEN 1 ELSE 0 END)
                    + (CASE WHEN f_iqr THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_methods
        FROM flagged
        WHERE (CASE WHEN f_z THEN 1 ELSE 0 END)
              + (CASE WHEN f_mad THEN 1 ELSE 0 END)
              + (CASE WHEN f_iqr THEN 1 ELSE 0 END) >= 2
        ORDER BY n_methods DESC, day
    """,
    "t44_popularity_hitrate": f"""
        WITH span AS (
            SELECT (MIN(epoch_us(o_orderdate)) + MAX(epoch_us(o_orderdate)))
                       // 2 AS mid_us
            FROM orders
        ),
        tagged AS (
            SELECT o_custkey, l_partkey,
                   epoch_us(o_orderdate) < mid_us AS is_train
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            CROSS JOIN span
        ),
        topk AS (
            SELECT l_partkey FROM tagged WHERE is_train
            GROUP BY 1 ORDER BY COUNT(*) DESC, l_partkey ASC
            LIMIT {_HIT_K}
        ),
        test_cust AS (
            SELECT DISTINCT o_custkey FROM tagged WHERE NOT is_train
        ),
        hit_cust AS (
            SELECT DISTINCT o_custkey FROM tagged
            WHERE NOT is_train
              AND l_partkey IN (SELECT l_partkey FROM topk)
        )
        SELECT CAST({_HIT_K} AS BIGINT) AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM test_cust) AS n_test,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM hit_cust) AS n_hit,
               CAST(((SELECT COUNT(*) FROM hit_cust) * {_MICRO})
                    // (SELECT COUNT(*) FROM test_cust) AS BIGINT)
                   AS hitrate_micro
    """,
    "t44_circular_hour_stats": f"""
        WITH hourly AS (
            SELECT hour(ts) AS h, COUNT(*) AS c
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        piv AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN h = {h} THEN c ELSE 0 END)"
                       f" AS BIGINT) AS c_{h}"
                       for h in range(24)
                   )}
            FROM hourly
        )
        SELECT n, {_C_R} AS resultant_r, {_C_MEAN_H} AS mean_hour
        FROM piv
    """,
}

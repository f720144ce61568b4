"""Supply-chain-classification / price-index / spectral-mode pack
(T41): crossed ABC/XYZ inventory classification of parts (revenue
Pareto class x demand-variability class), Laspeyres/Paasche/Fisher
price indices between the two halves of the history over the common
part basket, and the dominant co-movement mode of the event types'
daily counts via integer power iteration on the exact covariance
moments.

Reference anchors (SURVEY §2): ABC/XYZ is the classification layer
every inventory report builds on the reference's grouped revenue
sums; the price indices are THE economics of its price/quantity
columns (TPC-H lineitem) across periods; the dominant mode reads the
t29 correlation matrix as one vector.

Scale notes (100 TB):
- ABC/XYZ: one part-keyed revenue/demand aggregate; the Pareto class
  comes from a running-share window, the variability class from exact
  scaled CV comparisons ((n*q - s*s) vs thresholds x s*s — integer
  cross-multiplication, no division).
- indices: per-part (price, qty) per half; all three index numerators
  and denominators are exact BIGINT sums; ratios via shared
  expressions (Fisher = sqrt(L*P)).
- power iteration: the 5x5 scaled covariance is BIGINT; 3 iterations
  renormalize by the max-|component| DIV — integer state, identical
  on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_XYZ_CV2_THRESH = (25, 100)  # CV^2 * 100 thresholds: 0.25, 1.0
_PI_ROUNDS = 3
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T41a — crossed ABC/XYZ classification of parts: ABC from the
    revenue Pareto (running revenue share: A <= 80%, B <= 95%, C
    rest — the t19 Pareto made a label), XYZ from weekly demand
    variability (X: CV^2 <= 0.25, Y: <= 1.0, Z above — compared by
    integer cross-multiplication n*q*100 - s*s*100 vs thresh*s*s, no
    division); output the 9-cell matrix of part counts and exact
    revenue — the planogram every supply-chain review starts from.

    Scale: one lineitem scan -> part-keyed revenue + weekly-demand
    moments; the running revenue share rides rank.global_running_sum
    (two-phase, distributed) — parts scale with SF, so a bare
    partition-less window here would be the single-task anti-pattern."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)[
        "lineitem"
    ]
    base = li.select(
        "l_partkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
            " AS BIGINT)"
        ).alias("rev"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr("CAST(weekofyear(l_shipdate) AS BIGINT)").alias("wk"),
    )
    weekly = base.groupBy("l_partkey", "wk").agg(
        F.sum("q").alias("wq"), F.sum("rev").alias("wrev")
    )
    # Pinned: referenced by both the running-share pass and the total-
    # revenue branch — un-pinned, the lineitem scan + two aggregates
    # re-executed once per reference. O(|parts|) rows.
    per_part = weekly.groupBy("l_partkey").agg(
        F.sum("wrev").cast("long").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum("wq").cast("long").alias("s"),
        F.sum(F.col("wq") * F.col("wq")).cast("long").alias("qq"),
    ).localCheckpoint()
    from bigdatamanagement_spark.operators.rank import global_running_sum

    cum = global_running_sum(
        per_part,
        [F.desc("revenue"), F.asc("l_partkey")],
        "revenue",
        "cum_rev",
    )
    tot = per_part.agg(F.sum("revenue").alias("total_rev"))
    classed = cum.join(F.broadcast(tot)).select(
        "*",
        F.when(F.col("cum_rev") * 100 <= F.col("total_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        # CV^2 = (n*qq - s*s) / ((n-1) * s*s / n)... use the
        # population form n*qq/s^2 - 1 vs thresholds, crossed:
        # 100*(n*qq - s*s) vs thresh * s*s
        F.when(
            F.col("n_weeks") <= 1,
            F.lit("Z"),
        )
        .when(
            (F.col("n_weeks") * F.col("qq") - F.col("s") * F.col("s")) * 100
            <= F.lit(_XYZ_CV2_THRESH[0]) * F.col("s") * F.col("s"),
            "X",
        )
        .when(
            (F.col("n_weeks") * F.col("qq") - F.col("s") * F.col("s")) * 100
            <= F.lit(_XYZ_CV2_THRESH[1]) * F.col("s") * F.col("s"),
            "Y",
        )
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("revenue").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc", "xyz")
    )


_FISHER = {
    "l": "(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))",
    "p": "(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))",
}
_FISHER_F = (
    f"sqrt({_FISHER['l']} * {_FISHER['p']})"
)


def fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T41b — Laspeyres, Paasche and Fisher price indices between the
    two halves of the order history over the COMMON part basket
    (parts traded in both periods; per-part price = exact average
    unit cents p = rev DIV qty — documented integer-unit convention,
    quantity-weighted): L = sum(p2*q1)/sum(p1*q1), P = sum(p2*q2)/
    sum(p1*q2), F = sqrt(L*P). All four sums are exact BIGINTs;
    the three indices are shared expressions — "how much of the
    revenue delta is price, holding the basket fixed", the
    macro-grade twin of the t25 mix-shift decomposition.

    Scale: one lineitem+orders scan -> (part, half) aggregates ->
    a common-basket join -> one reduce row."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    o = t["orders"].select(
        "o_orderkey", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us")
    )
    span = o.agg(F.expr("(min(us) + max(us)) div 2").alias("mid_us"))
    base = (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_partkey",
            F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
                "rev"
            ),
            F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(span))
        .select(
            "l_partkey",
            F.when(F.col("us") < F.col("mid_us"), 1).otherwise(2).alias("h"),
            "rev",
            "q",
        )
    )
    per = base.groupBy("l_partkey", "h").agg(
        F.sum("rev").alias("rev"), F.sum("q").alias("q")
    )
    p1 = per.filter(F.col("h") == 1).select(
        "l_partkey",
        F.expr("rev DIV q").alias("p1"),
        F.col("q").alias("q1"),
    )
    p2 = per.filter(F.col("h") == 2).select(
        "l_partkey",
        F.expr("rev DIV q").alias("p2"),
        F.col("q").alias("q2"),
    )
    common = p1.join(p2, "l_partkey")
    agg = common.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("p2") * F.col("q1")).cast("long").alias("l_num"),
        F.sum(F.col("p1") * F.col("q1")).cast("long").alias("l_den"),
        F.sum(F.col("p2") * F.col("q2")).cast("long").alias("p_num"),
        F.sum(F.col("p1") * F.col("q2")).cast("long").alias("p_den"),
    )
    return agg.select(
        "n_parts",
        "l_num",
        "l_den",
        "p_num",
        "p_den",
        F.expr(_FISHER["l"]).alias("laspeyres"),
        F.expr(_FISHER["p"]).alias("paasche"),
        F.expr(_FISHER_F).alias("fisher"),
    )


def dominant_comovement_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T41c — dominant co-movement mode of the five event types'
    daily counts: the top eigenvector of the n^2-scaled covariance
    matrix (exact BIGINTs from one (type, day) aggregate) by THREE
    integer power iterations — each step v' = C v followed by
    renormalization v'' = (v' * 1e6) DIV max|v'| keeps the state an
    exact integer vector, so both engines produce the identical mode
    (sign pinned: the lexicographically-first type's component is
    made non-negative). The "one factor that moves all traffic
    together" reading of the t29 correlation matrix.

    Scale: the covariance grid is |types|^2 rows; iterations are
    joins over it — constant-size work after one day-grain pass."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = daily.select(
        F.col("event_type").alias("ta"), F.col("day").alias("day"), F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("tb"), F.col("day").alias("day"), F.col("x").alias("xb")
    )
    pair = a.join(b, "day").groupBy("ta", "tb").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
    )
    cov = (
        pair.join(
            F.broadcast(tot.select(F.col("event_type").alias("ta"), F.col("s").alias("sa"))),
            "ta",
        )
        .join(
            F.broadcast(tot.select(F.col("event_type").alias("tb"), F.col("s").alias("sb"))),
            "tb",
        )
        .select(
            "ta",
            "tb",
            (F.col("n") * F.col("sxy") - F.col("sa") * F.col("sb")).alias("c"),
        )
        .localCheckpoint()
    )
    v = (
        cov.select(F.col("ta").alias("t"))
        .distinct()
        .select("t", F.lit(_MICRO).cast("long").alias("v"))
        .localCheckpoint()
    )
    for _ in range(_PI_ROUNDS):
        nxt = (
            cov.join(v.withColumnRenamed("t", "tb"), "tb")
            .groupBy(F.col("ta").alias("t"))
            .agg(F.sum(F.expr("(c DIV 1000) * (v DIV 1000)")).alias("raw"))
        )
        mx = nxt.agg(F.max(F.abs(F.col("raw"))).alias("mx"))
        v = (
            nxt.join(F.broadcast(mx))
            .select(
                "t", F.expr(f"(raw * {_MICRO}) DIV mx").cast("long").alias("v")
            )
            .localCheckpoint()
        )
    sign = v.orderBy("t").limit(1).select(
        F.when(F.col("v") < 0, -1).otherwise(1).alias("sg")
    )
    return (
        v.join(F.broadcast(sign))
        .select(
            F.col("t").alias("event_type"),
            (F.col("v") * F.col("sg")).cast("long").alias("mode_micro"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "t41_abc_xyz_matrix": abc_xyz_matrix,
    "t41_fisher_price_index": fisher_price_index,
    "t41_dominant_comovement_mode": dominant_comovement_mode,
}

_PI_CTE_ROUNDS = ",".join(
    f"""
    n{r} AS (
        SELECT c.ta AS t, SUM((c.c // 1000) * (p.v // 1000)) AS raw
        FROM cov c JOIN v{r - 1} p ON p.t = c.tb
        GROUP BY 1
    ),
    v{r} AS (
        SELECT t, CAST((raw * {_MICRO})
                   // (SELECT MAX(abs(raw)) FROM n{r}) AS BIGINT) AS v
        FROM n{r}
    )"""
    for r in range(1, _PI_ROUNDS + 1)
)

ORACLE = {
    "t41_abc_xyz_matrix": f"""
        WITH base AS (
            SELECT l_partkey,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT) AS rev,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(weekofyear(l_shipdate) AS BIGINT) AS wk
            FROM lineitem
        ),
        weekly AS (
            SELECT l_partkey, wk, SUM(q) AS wq, SUM(rev) AS wrev
            FROM base GROUP BY 1, 2
        ),
        per_part AS (
            SELECT l_partkey,
                   CAST(SUM(wrev) AS BIGINT) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_weeks,
                   CAST(SUM(wq) AS BIGINT) AS s,
                   CAST(SUM(wq * wq) AS BIGINT) AS qq
            FROM weekly GROUP BY 1
        ),
        classed AS (
            SELECT *,
                   SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                       ROWS UNBOUNDED PRECEDING) AS cum_rev,
                   (SELECT SUM(revenue) FROM per_part) AS total_rev
            FROM per_part
        ),
        labeled AS (
            SELECT CASE WHEN cum_rev * 100 <= total_rev * 80 THEN 'A'
                        WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
                        ELSE 'C' END AS abc,
                   CASE WHEN n_weeks <= 1 THEN 'Z'
                        WHEN (n_weeks * qq - s * s) * 100
                             <= {_XYZ_CV2_THRESH[0]} * s * s THEN 'X'
                        WHEN (n_weeks * qq - s * s) * 100
                             <= {_XYZ_CV2_THRESH[1]} * s * s THEN 'Y'
                        ELSE 'Z' END AS xyz,
                   revenue
            FROM classed
        )
        SELECT abc, xyz,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(revenue) AS BIGINT) AS revenue_cents
        FROM labeled GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "t41_fisher_price_index": f"""
        WITH span AS (
            SELECT (MIN(epoch_us(o_orderdate)) + MAX(epoch_us(o_orderdate)))
                       // 2 AS mid_us
            FROM orders
        ),
        base AS (
            SELECT l_partkey,
                   CASE WHEN epoch_us(o_orderdate) < mid_us THEN 1 ELSE 2 END
                       AS h,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS rev,
                   CAST(l_quantity AS BIGINT) AS q
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            CROSS JOIN span
        ),
        per AS (
            SELECT l_partkey, h, SUM(rev) AS rev, SUM(q) AS q
            FROM base GROUP BY 1, 2
        ),
        p1 AS (
            SELECT l_partkey, rev // q AS p1, q AS q1 FROM per WHERE h = 1
        ),
        p2 AS (
            SELECT l_partkey, rev // q AS p2, q AS q2 FROM per WHERE h = 2
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(p2 * q1) AS BIGINT) AS l_num,
                   CAST(SUM(p1 * q1) AS BIGINT) AS l_den,
                   CAST(SUM(p2 * q2) AS BIGINT) AS p_num,
                   CAST(SUM(p1 * q2) AS BIGINT) AS p_den
            FROM p1 JOIN p2 USING (l_partkey)
        )
        SELECT n_parts, l_num, l_den, p_num, p_den,
               {_FISHER["l"]} AS laspeyres,
               {_FISHER["p"]} AS paasche,
               {_FISHER_F} AS fisher
        FROM agg
    """,
    "t41_dominant_comovement_mode": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, CAST(SUM(x) AS BIGINT) AS s FROM daily
            GROUP BY 1
        ),
        pair AS (
            SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
            FROM daily a JOIN daily b ON a.day = b.day
            GROUP BY 1, 2
        ),
        cov AS (
            SELECT ta, tb, n * sxy - sa.s * sb.s AS c
            FROM pair
            JOIN tot sa ON sa.event_type = ta
            JOIN tot sb ON sb.event_type = tb
        ),
        v0 AS (
            SELECT DISTINCT ta AS t, CAST({_MICRO} AS BIGINT) AS v FROM cov
        ),{_PI_CTE_ROUNDS},
        sign AS (
            SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
            FROM v{_PI_ROUNDS} ORDER BY t LIMIT 1
        )
        SELECT t AS event_type, CAST(v * sg AS BIGINT) AS mode_micro
        FROM v{_PI_ROUNDS} CROSS JOIN sign ORDER BY event_type
    """,
}

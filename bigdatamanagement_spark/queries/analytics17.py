"""Operations-analytics / information-theory / causal pack (T35):
order-to-ship latency percentiles per order priority (exact discrete
order statistics), the rich-club coefficient of the co-purchase
graph, the entropy rate of the event-type Markov chain in floored
micro-nats, Wilson score confidence intervals for per-type
conversion-to-purchase rates, and a difference-in-differences
estimator across segments and halves.

Reference anchors (SURVEY §2): ship latency reads the same
lineitem/orders date pair the reference's Q12 late-shipment count
thresholds (`AmazonRedshift.java` / TPC-H Q12 shape) without ever
distributing; the entropy rate prices the t17 transition matrix the
way the Naive Bayes pack (t23) prices vocabularies; Wilson completes
the proportion-inference family (z t19, SRM t34); DiD is the
textbook causal readout of the half-over-half segment deltas the
mix-shift decomposition (t25) describes.

Scale notes (100 TB):
- latency: one join + per-priority rank windows; percentiles are
  exact value-at-ceil(p*n) picks (the t29 Q-Q discipline).
- rich club: degrees once, then per-k edge/vertex filters —
  phi = 2e/(v(v-1)) in exact micro.
- entropy rate: per-(src,dst) term = floored micro-nat of
  c * ln(tot/c) weighted by the empirical source mass — all BIGINT.
- Wilson: exact (conversions, trials) per type; the interval is two
  fixed-order shared expressions.
- DiD: four exact cell sums pivoted to one row; the estimator is one
  fixed-order expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_RICH_KS = (4, 8, 16)
_WILSON_Z = "1.959963984540054"  # 95%
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T35a — order-to-ship latency (days from o_orderdate to
    l_shipdate) per order priority: p50/p90/p99 as EXACT discrete
    order statistics (value at ceil(p*n), the t29 Q-Q discipline — no
    interpolation) plus the exact mean — the fulfillment-SLA readout
    behind TPC-H Q12's late-shipment thresholds.

    Scale: one lineitem-orders join (orders projected to two
    columns) + a COUNTING percentile: latencies are small integers, so
    the per-priority rank window over every row (a full sort of the
    join output) collapses to a (priority, latency) count aggregate —
    map-side combined, ~|priorities|x|distinct days| rows — and the
    order statistic is read off the cumulative counts (value at rank
    ceil(p*n/100) = min latency whose running count reaches the rank —
    identical by definition; measured 3.4 s -> 1.2 s, same rows)."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    lat = (
        t["lineitem"]
        .select("l_orderkey", F.to_date("l_shipdate").alias("sd"))
        .join(
            t["orders"].select(
                "o_orderkey",
                "o_orderpriority",
                F.to_date("o_orderdate").alias("od"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.expr("datediff(sd, od)").cast("long").alias("lat"),
        )
    )
    cnt = lat.groupBy("o_orderpriority", "lat").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("lat")
    cum = cnt.select(
        "o_orderpriority",
        "lat",
        "c",
        F.sum("c").over(w).cast("long").alias("cum"),
        F.sum("c")
        .over(Window.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("n"),
    )

    def pick(p: int) -> F.Column:
        return F.min(
            F.when(
                F.col("cum")
                >= F.expr(f"CAST(ceil({p} * n / 100.0) AS BIGINT)"),
                F.col("lat"),
            )
        )

    agg = cum.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.sum(F.col("lat") * F.col("c")).cast("long").alias("sum_lat"),
        pick(50).cast("long").alias("p50"),
        pick(90).cast("long").alias("p90"),
        pick(99).cast("long").alias("p99"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        "p50",
        "p90",
        "p99",
        F.expr("CAST(sum_lat AS DOUBLE) / CAST(n AS DOUBLE)").alias(
            "mean_days"
        ),
    ).orderBy("o_orderpriority")


def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T35b — rich-club coefficient of the co-purchase graph: for k in
    {4, 8, 16}, phi(k) = 2 * E_k / (V_k * (V_k - 1)) over the subgraph
    induced by vertices with degree > k, in exact micro (2e6*E DIV
    V(V-1)) — do the catalog's hubs preferentially co-sell with each
    other (the "rich club" every scale-free product graph shows)?

    Scale: degrees once; each k is an edge semi-filter + two counts
    on a shrinking subgraph."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = (
        bidir.groupBy(F.col("a").alias("v"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    outs = []
    for k in _RICH_KS:
        rich = deg.filter(F.col("d") > k).select("v")
        e_k = (
            edges.join(rich.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(rich.withColumnRenamed("v", "b"), "b", "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
        )
        v_k = rich.agg(F.count(F.lit(1)).cast("long").alias("v_k"))
        outs.append(
            v_k.join(e_k).select(
                F.lit(k).cast("long").alias("k"),
                "v_k",
                "e_k",
                F.when(
                    F.col("v_k") >= 2,
                    F.expr(f"(2 * e_k * {_MICRO}) DIV (v_k * (v_k - 1))"),
                )
                .otherwise(F.lit(None))
                .cast("long")
                .alias("phi_micro"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("k")


def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T35c — entropy rate of the per-user event-type Markov chain,
    weighted by the empirical source-state mass (documented choice:
    the observed occupancy, not the stationary eigenvector — no
    iteration): H = sum over transitions of (c_ij/N) * ln(tot_i/c_ij),
    every term floored to micro-nats from exact counts, summed as
    BIGINTs — how predictable is the next action given the current
    one, the single number over the whole t17 transition matrix.
    Conditional entropies per source state are reported alongside.

    Scale: one user-keyed lead window -> one (src, dst) count grid;
    everything after is arithmetic on a <=25-row table."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    with_tot = trans.select(
        "src",
        "c",
        F.expr("SUM(c) OVER (PARTITION BY src)").alias("tot"),
    )
    term = F.expr(
        "CAST(floor(1000000.0 * c * ln(CAST(tot AS DOUBLE)"
        " / CAST(c AS DOUBLE))) AS BIGINT)"
    )
    per_src = with_tot.groupBy("src").agg(
        F.max("tot").cast("long").alias("n_src"),
        F.sum(term).cast("long").alias("h_sum_micro"),
    )
    tot_all = per_src.agg(F.sum("n_src").alias("n_all"))
    return (
        per_src.join(F.broadcast(tot_all))
        .select(
            "src",
            "n_src",
            F.expr("h_sum_micro DIV n_src").alias("h_cond_micro"),
            F.expr(
                "CAST(h_sum_micro AS DOUBLE) / CAST(n_all AS DOUBLE)"
            ).alias("rate_contrib_micro"),
        )
        .orderBy("src")
    )


_WILSON = {
    "p": "(CAST(x AS DOUBLE) / CAST(n AS DOUBLE))",
    "z2n": f"({_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE))",
}
_WILSON_CENTER = (
    f"(({_WILSON['p']} + {_WILSON['z2n']} / 2.0)"
    f" / (1.0 + {_WILSON['z2n']}))"
)
_WILSON_HALF = (
    f"(({_WILSON_Z} / (1.0 + {_WILSON['z2n']}))"
    f" * sqrt({_WILSON['p']} * (1.0 - {_WILSON['p']}) / CAST(n AS DOUBLE)"
    f" + {_WILSON['z2n']} / (4.0 * CAST(n AS DOUBLE))))"
)


def wilson_conversion_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T35d — Wilson score 95% confidence interval for the per-
    first-touch-type conversion rate (users whose FIRST event is of
    the type and who ever purchase): the small-sample-safe interval
    the naive Wald +-z*sqrt(pq/n) gets wrong near 0/1 — completing
    the proportion-inference family (z-test t19, SRM t34). Exact
    (conversions, trials) counts; center and half-width are two
    fixed-order shared expressions.

    Scale: one user-keyed first-event window + one purchase semi-join
    -> a |types|-row table."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .select("user_id", F.lit(1).alias("conv"))
    )
    agg = (
        first.join(buyers, "user_id", "left")
        .groupBy("first_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce(F.col("conv"), F.lit(0)))
            .cast("long")
            .alias("x"),
        )
    )
    return agg.select(
        "first_type",
        "n",
        "x",
        F.expr(f"({_WILSON_CENTER} - {_WILSON_HALF})").alias("wilson_lo"),
        F.expr(f"({_WILSON_CENTER} + {_WILSON_HALF})").alias("wilson_hi"),
    ).orderBy("first_type")


_DID = (
    "((CAST(s_t2 AS DOUBLE) / CAST(n_t2 AS DOUBLE)"
    " - CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE))"
    " - (CAST(s_c2 AS DOUBLE) / CAST(n_c2 AS DOUBLE)"
    " - CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)))"
)


def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T35e — difference-in-differences estimator on order value:
    treatment = BUILDING-segment customers, control = everyone else,
    periods = the two halves of the order history (the t25 midpoint
    convention); DiD = (treat2 - treat1) - (ctrl2 - ctrl1) on mean
    order cents — the causal-inference textbook readout of exactly
    the four cells the mix-shift decomposition describes. Four exact
    cell (sum, count) pairs pivot into ONE row; the estimator is one
    fixed-order shared expression.

    Scale: one orders scan (customer dim broadcast), one pivot row."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "customer"), register=False
    )
    o = t["orders"]
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    span = o.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).select(
        F.expr("(lo + hi) div 2").alias("mid_us")
    )
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    base = (
        o.join(F.broadcast(span))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            (F.col("c_mktsegment") == "BUILDING").alias("treat"),
            (us >= F.col("mid_us")).alias("post"),
            cents.alias("cents"),
        )
    )
    def cell(treat: bool, post: bool, name: str):
        cond = (F.col("treat") == treat) & (F.col("post") == post)
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{name}"),
            F.sum(F.when(cond, F.col("cents")).otherwise(0))
            .cast("long")
            .alias(f"s_{name}"),
        ]
    agg = base.agg(
        *cell(True, False, "t1"),
        *cell(True, True, "t2"),
        *cell(False, False, "c1"),
        *cell(False, True, "c2"),
    )
    return agg.select(
        "n_t1",
        "n_t2",
        "n_c1",
        "n_c2",
        F.expr(_DID).alias("did_centi"),
    )


QUERIES = {
    "t35_ship_latency_percentiles": ship_latency_percentiles,
    "t35_rich_club_coefficient": rich_club_coefficient,
    "t35_markov_entropy_rate": markov_entropy_rate,
    "t35_wilson_conversion_intervals": wilson_conversion_intervals,
    "t35_diff_in_diff": diff_in_diff,
}

_RICH_ORACLE_ONE = """
        SELECT CAST({k} AS BIGINT) AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM rich{k}) AS v_k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM re{k}) AS e_k,
               CASE WHEN (SELECT COUNT(*) FROM rich{k}) >= 2 THEN
                   CAST((2 * (SELECT COUNT(*) FROM re{k}) * 1000000)
                        // ((SELECT COUNT(*) FROM rich{k})
                            * ((SELECT COUNT(*) FROM rich{k}) - 1))
                        AS BIGINT)
               END AS phi_micro
"""

_RICH_ORACLE_CTES = ",".join(
    f"""
    rich{k} AS (SELECT v FROM deg WHERE d > {k}),
    re{k} AS (
        SELECT a, b FROM e0
        WHERE a IN (SELECT v FROM rich{k}) AND b IN (SELECT v FROM rich{k})
    )"""
    for k in _RICH_KS
)

ORACLE = {
    "t35_ship_latency_percentiles": """
        WITH lat AS (
            SELECT o_orderpriority,
                   CAST(datediff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        ranked AS (
            SELECT o_orderpriority, lat,
                   CAST(row_number() OVER (PARTITION BY o_orderpriority
                                           ORDER BY lat) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY o_orderpriority)
                        AS BIGINT) AS n
            FROM lat
        )
        SELECT o_orderpriority, MAX(n) AS n,
               CAST(MIN(CASE WHEN rk = CAST(ceil(50 * n / 100.0) AS BIGINT)
                        THEN lat END) AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN rk = CAST(ceil(90 * n / 100.0) AS BIGINT)
                        THEN lat END) AS BIGINT) AS p90,
               CAST(MIN(CASE WHEN rk = CAST(ceil(99 * n / 100.0) AS BIGINT)
                        THEN lat END) AS BIGINT) AS p99,
               CAST(SUM(lat) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_days
        FROM ranked GROUP BY 1 ORDER BY 1
    """,
    "t35_rich_club_coefficient": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        bidir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT a AS v, COUNT(*) AS d FROM bidir GROUP BY 1),{_RICH_ORACLE_CTES}
        {" UNION ALL ".join(_RICH_ORACLE_ONE.format(k=k) for k in _RICH_KS)}
        ORDER BY k
    """,
    "t35_markov_entropy_rate": """
        WITH trans AS (
            SELECT src, dst, COUNT(*) AS c FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS dst
                FROM events
            ) WHERE dst IS NOT NULL GROUP BY 1, 2
        ),
        with_tot AS (
            SELECT src, c, SUM(c) OVER (PARTITION BY src) AS tot FROM trans
        ),
        per_src AS (
            SELECT src,
                   CAST(MAX(tot) AS BIGINT) AS n_src,
                   CAST(SUM(CAST(floor(1000000.0 * c * ln(CAST(tot AS DOUBLE)
                        / CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT)
                       AS h_sum_micro
            FROM with_tot GROUP BY 1
        )
        SELECT src, n_src,
               CAST(h_sum_micro // n_src AS BIGINT) AS h_cond_micro,
               CAST(h_sum_micro AS DOUBLE)
                   / CAST((SELECT SUM(n_src) FROM per_src) AS DOUBLE)
                   AS rate_contrib_micro
        FROM per_src ORDER BY src
    """,
    "t35_wilson_conversion_intervals": f"""
        WITH first AS (
            SELECT user_id, event_type AS first_type FROM (
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
            SELECT first_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(COALESCE(conv, 0)) AS BIGINT) AS x
            FROM first LEFT JOIN buyers USING (user_id)
            GROUP BY 1
        )
        SELECT first_type, n, x,
               ({_WILSON_CENTER} - {_WILSON_HALF}) AS wilson_lo,
               ({_WILSON_CENTER} + {_WILSON_HALF}) AS wilson_hi
        FROM agg ORDER BY first_type
    """,
    "t35_diff_in_diff": f"""
        WITH span AS (
            SELECT (MIN(epoch_us(o_orderdate)) + MAX(epoch_us(o_orderdate)))
                       // 2 AS mid_us
            FROM orders
        ),
        base AS (
            SELECT c_mktsegment = 'BUILDING' AS treat,
                   epoch_us(o_orderdate) >= mid_us AS post,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders CROSS JOIN span
            JOIN customer ON o_custkey = c_custkey
        ),
        agg AS (
            SELECT
                CAST(SUM(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_t1,
                CAST(SUM(CASE WHEN treat AND NOT post THEN cents ELSE 0 END)
                     AS BIGINT) AS s_t1,
                CAST(SUM(CASE WHEN treat AND post THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_t2,
                CAST(SUM(CASE WHEN treat AND post THEN cents ELSE 0 END)
                     AS BIGINT) AS s_t2,
                CAST(SUM(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_c1,
                CAST(SUM(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0
                     END) AS BIGINT) AS s_c1,
                CAST(SUM(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_c2,
                CAST(SUM(CASE WHEN NOT treat AND post THEN cents ELSE 0 END)
                     AS BIGINT) AS s_c2
            FROM base
        )
        SELECT n_t1, n_t2, n_c1, n_c2, {_DID} AS did_centi
        FROM agg
    """,
}

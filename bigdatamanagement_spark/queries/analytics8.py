"""Rank-statistics / changepoint / dominance / community pack (T26):
2-D skyline (Pareto-dominance) over the part catalog, per-nation spend
concentration (Gini + HHI), Mann-Whitney U rank-sum test and
two-sample Kolmogorov-Smirnov statistic comparing the purchase vs
click value distributions, CUSUM changepoint excursion over daily
revenue, autocorrelation (ACF) of the daily event-count series, and
synchronous label-propagation community detection on the co-purchase
graph.

Reference anchors (SURVEY §2): the reference's grouped SUM + ORDER BY
revenue readouts (`AmazonRedshift.java:499-509`) are the inputs every
one of these second-order analyses consumes — concentration asks "how
unequal is that spend column", CUSUM asks "when did its daily series
shift", the rank tests ask "are these two event populations the same
distribution" (the nonparametric twin of the t19 z-test), the skyline
asks "which catalog rows are undominated on (price, size)" (the
multi-objective form of the reference's MIN-cost supplier pick,
`AmazonRedshift.java` query2 / TPC-H Q2), and label propagation is the
community view of the same co-purchase graph t19/t20/t25 walk.

Scale notes (100 TB):
- skyline: ONE sort by price (cents) + two RANGE-frame running maxes —
  O(n log n), no self-join; the NOT EXISTS O(n^2) formulation exists
  only on the DuckDB oracle side.
- concentration: one customer-spend aggregate, one per-nation rank
  window, exact BIGINT moments (at true 100 TB the i*x products move
  to DECIMAL(38,0) — noted, not needed at bench scale).
- rank tests: both run on the DISTINCT-value aggregate (|values| <<
  |events|), so the window pass is over the compressed domain;
  tie-corrected variance from exact tie counts.
- CUSUM / ACF: day-grain series (|days| rows after one aggregate);
  all moments integer via the multiply-by-n trick (n*S_t = n*P_t -
  t*T), doubles only in ONE shared Spark/DuckDB expression string.
- LPA: per round = one edge-to-label join + one (vertex,label) count
  + one argmax — 2 unrolled rounds (bounded-iteration discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

_LPA_ROUNDS = 2
_ACF_LAGS = (1, 2, 7)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26a — 2-D skyline (Pareto frontier) of the part catalog on
    (minimize retail price, maximize size): a part is dominated iff
    some part is no worse on both dimensions and strictly better on at
    least one. The multi-objective generalization of the reference's
    min-cost supplier pick (TPC-H Q2 shape) — "which catalog rows are
    rational choices at any price/size tradeoff".

    Scale: the catalog first compresses to the DISTINCT-price grid
    (price_cents, max size at that price); the strictly-cheaper prefix
    max then rides the two-phase distributed running max
    (rank.global_running_max, exclusive frame — no single-partition
    window anywhere); parts re-join the grid on price_cents. Dominated
    iff prefix-max >= own size or equal-price max > own size. The
    oracle uses the independent NOT EXISTS formulation."""
    from bigdatamanagement_spark.operators.rank import global_running_max

    p = load_testdata(spark, sf_dir, tables=("part",), register=False)["part"]
    cents = F.expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)")
    base = p.select(
        "p_partkey",
        "p_brand",
        cents.alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    grid = base.groupBy("price_cents").agg(
        F.max("p_size").alias("max_size_equal")
    )
    grid = global_running_max(
        grid,
        "price_cents",
        "max_size_equal",
        "max_size_cheaper",
        exclusive=True,
    ).select(
        "price_cents",
        "max_size_equal",
        F.coalesce(F.col("max_size_cheaper"), F.lit(-1)).alias(
            "max_size_cheaper"
        ),
    )
    flagged = base.join(grid, "price_cents")
    return (
        flagged.filter(
            ~(
                (F.col("max_size_cheaper") >= F.col("p_size"))
                | (F.col("max_size_equal") > F.col("p_size"))
            )
        )
        .select("p_partkey", "p_brand", "price_cents", "p_size")
        .orderBy("p_partkey")
    )


# Shared Spark/DuckDB expression strings (identical parse tree =>
# identical IEEE doubles) over the exact BIGINT moments.
_GINI = (
    "(CAST(2 * weighted_rank_sum - (n_customers + 1) * total_cents AS DOUBLE)"
    " / (CAST(n_customers AS DOUBLE) * CAST(total_cents AS DOUBLE)))"
)
_HHI = (
    "(CAST(sum_sq_kcents AS DOUBLE)"
    " / ((CAST(total_cents AS DOUBLE) / 1000.0)"
    " * (CAST(total_cents AS DOUBLE) / 1000.0)))"
)


def spend_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26b — per-nation customer-spend concentration: Gini
    coefficient (rank-weighted formula G = (2*sum(i*x_i) - (n+1)*T) /
    (n*T) over ascending spend) and Herfindahl-Hirschman index
    (sum of squared spend shares). THE inequality readout on the
    reference's spend-per-customer aggregate
    (`AmazonRedshift.java:499-509`) — "is this nation's revenue a few
    whales or a broad base". Customers with no orders are excluded
    (spend undefined); all moments exact BIGINT, the two ratios
    evaluate ONE shared expression string on both engines. The squared
    moment is carried in KILO-cents (spend DIV 1000, squared) — squared
    raw cents overflows BIGINT already at sf0.1 (spend ~ 2e8 cents =>
    spend^2 ~ 4e16, x hundreds of customers per nation > 2^63); the
    kilo-cent convention keeps the sum exact and BIGINT-safe past sf100
    while moving HHI by < 1e-5 relative (documented convention, both
    engines identical).

    Scale: one customer aggregate (exchange on o_custkey), one
    per-nation rank window; equal spends commute in sum(i*x_i) so the
    custkey tiebreak only pins determinism, not the value."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "customer", "nation"), register=False
    )
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    spend = (
        t["orders"]
        .select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("spend"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("spend", "o_custkey")
    ranked = spend.select(
        "c_nationkey", "spend", F.row_number().over(w).alias("i")
    )
    agg = (
        ranked.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("spend").alias("total_cents"),
            F.sum(F.col("i") * F.col("spend")).alias("weighted_rank_sum"),
            F.sum(F.expr("(spend DIV 1000) * (spend DIV 1000)")).alias(
                "sum_sq_kcents"
            ),
        )
        .join(
            F.broadcast(
                t["nation"].select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return agg.select(
        "n_name",
        "n_customers",
        F.col("total_cents").cast("long").alias("total_cents"),
        F.col("weighted_rank_sum").cast("long").alias("weighted_rank_sum"),
        F.col("sum_sq_kcents").cast("long").alias("sum_sq_kcents"),
        F.expr(_GINI).alias("gini"),
        F.expr(_HHI).alias("hhi"),
    ).orderBy("n_name")


def _two_group_value_counts(ev: DataFrame) -> DataFrame:
    """Distinct-value counts for the purchase (g1) / click (g2) value
    populations — the compressed domain both rank tests run on."""
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .select(
            centi.alias("v"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        )
        .groupBy("v")
        .agg(
            F.sum("g1").alias("c1"),
            F.sum(1 - F.col("g1")).alias("c2"),
        )
    )


_MW_Z = (
    "((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0"
    " - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)"
    " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0"
    " * (CAST(n1 + n2 + 1 AS DOUBLE)"
    " - CAST(tie_t AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)"
    " * CAST(n1 + n2 - 1 AS DOUBLE)))))"
)


def mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26c — Mann-Whitney U rank-sum test: are purchase event values
    drawn from the same distribution as click values? The
    nonparametric twin of the t19 conversion z-test — no normality
    assumption, driven entirely by ranks. Average ranks over ties are
    kept exact by carrying 2*rank (2*avg_rank = 2*cum_before + c + 1
    is always an integer); the tie-corrected normal-approximation z
    evaluates ONE shared expression string from four exact BIGINT
    moments (2*R1, n1, n2, sum(t^3 - t)).

    Scale: the window pass runs on the DISTINCT-value aggregate, not
    the event stream; one global ordering of |values| rows."""
    counts = _two_group_value_counts(_events(spark, sf_dir))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("c"),
        F.coalesce(
            F.sum(F.col("c1") + F.col("c2")).over(w), F.lit(0)
        ).alias("cum_before"),
    )
    agg = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_before") + F.col("c") + 1))
        .cast("long")
        .alias("two_r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_t"),
    )
    return agg.select(
        "n1",
        "n2",
        "two_r1",
        "tie_t",
        F.expr("CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0").alias("u1"),
        F.expr(_MW_Z).alias("z"),
    )


_KS_D = "(CAST(ks_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))"


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26d — two-sample Kolmogorov-Smirnov statistic between the
    purchase and click value distributions: D = max_v |F1(v) - F2(v)|,
    kept exact as max |cum1*n2 - cum2*n1| over the common value grid
    (integer numerator over the n1*n2 denominator); the reported
    location is the smallest value achieving the max (deterministic).
    The distribution-shape complement of the Mann-Whitney location
    test — KS sees shape/spread shifts U misses.

    Scale: one distinct-value aggregate + one running-sum window over
    the compressed domain; the argmax is a struct-min, no re-scan."""
    counts = _two_group_value_counts(_events(spark, sf_dir))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    diff = cum.join(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
        ).alias("d_num"),
        "v",
    )
    agg = diff.groupBy("n1", "n2").agg(
        F.max("d_num").cast("long").alias("ks_num"),
        F.min(F.struct((-F.col("d_num")).alias("neg"), F.col("v").alias("v")))
        .getField("v")
        .cast("long")
        .alias("at_value_centi"),
    )
    return agg.select(
        "n1", "n2", "ks_num", "at_value_centi", F.expr(_KS_D).alias("ks_d")
    )


_CUSUM_PEAK = "(CAST(max_abs_ns AS DOUBLE) / CAST(n_days AS DOUBLE))"


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26e — CUSUM changepoint excursion over the daily purchase
    revenue series: S_t = sum_{i<=t}(x_i - mean); the maximum |S_t|
    and its day locate the strongest level-shift candidate (the
    classic Page/Hinkley offline statistic). Kept exact by the
    multiply-by-n trick: n*S_t = n*P_t - t*T is a BIGINT (P_t prefix
    sum, T total); only the final peak height divides by n, through
    ONE shared expression string.

    Scale: one day-grain aggregate, then a |days|-row prefix-sum
    window; the argmax day is a struct-min (earliest day wins ties)."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    t_w = Window.orderBy("day")
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total_cents"),
    )
    series = daily.select(
        "day",
        F.sum("x").over(w).alias("p"),
        F.row_number().over(t_w).cast("long").alias("t"),
    ).join(F.broadcast(tot))
    ns = (F.col("n_days") * F.col("p") - F.col("t") * F.col("total_cents")).alias(
        "ns"
    )
    agg = series.select("n_days", "total_cents", "day", ns).groupBy(
        "n_days", "total_cents"
    ).agg(
        F.max(F.abs(F.col("ns"))).cast("long").alias("max_abs_ns"),
        F.min(
            F.struct((-F.abs(F.col("ns"))).alias("neg"), F.col("day").alias("d"))
        )
        .getField("d")
        .alias("peak_day"),
    )
    return agg.select(
        "n_days",
        "total_cents",
        "max_abs_ns",
        "peak_day",
        F.expr(_CUSUM_PEAK).alias("peak_cusum_cents"),
    )


_ACF = "(CAST(num_scaled AS DOUBLE) / CAST(den_scaled AS DOUBLE))"


def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26f — autocorrelation of the daily event-count series at lags
    1, 2 and 7 (the weekly-seasonality probe): r_k = c_k / c_0 with
    c_k = sum_t (x_t - mean)(x_{t+k} - mean), computed positionally
    over the observed-day sequence (documented: calendar gaps, absent
    in this data, would shift positions). Exact by scaling both sides
    by n^2: n^2*c_k = sum (n*x_t - T)(n*x_{t+k} - T) is a BIGINT; the
    ratio evaluates ONE shared expression string.

    Scale: one day-grain aggregate, one |days|-row window pass
    computing all three lag columns in a single sort."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("tt"),
    )
    w = Window.orderBy("day")
    dev = F.col("n") * F.col("x") - F.col("tt")
    lagged = daily.join(F.broadcast(tot)).select(
        "n",
        dev.alias("d0"),
        *[
            (F.col("n") * F.lag("x", k).over(w) - F.col("tt")).alias(f"d{k}")
            for k in _ACF_LAGS
        ],
    )
    agg = lagged.groupBy("n").agg(
        F.sum(F.col("d0") * F.col("d0")).cast("long").alias("den_scaled"),
        *[
            F.sum(F.col("d0") * F.col(f"d{k}")).cast("long").alias(f"num{k}")
            for k in _ACF_LAGS
        ],
    )
    per_lag = [
        agg.select(
            F.lit(k).cast("long").alias("lag"),
            F.col("n").alias("n_days"),
            F.col(f"num{k}").alias("num_scaled"),
            "den_scaled",
            F.expr(_ACF.replace("num_scaled", f"num{k}")).alias("acf"),
        )
        for k in _ACF_LAGS
    ]
    out = per_lag[0]
    for df in per_lag[1:]:
        out = out.unionByName(df)
    return out.orderBy("lag")


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T26g — synchronous label-propagation community detection on the
    part co-purchase graph (2 unrolled rounds): every vertex starts
    labeled with its own id; each round it adopts its neighbors' most
    frequent label (ties -> smallest label). Reports per round the
    community count, vertex count, largest community size, and the
    label checksum — the community view of the graph whose dense core
    t25 peels and whose triangles t19 counts.

    Scale: a round = one edge-to-label join (label state keyed by
    vertex) + one (vertex, label) count + one struct-min argmax; the
    2-round unroll is the bounded-iteration discipline shared with
    k-means/PageRank/BFS/k-core."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = (
        bidir.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
        .localCheckpoint()
    )
    outs = []
    for rnd in range(1, _LPA_ROUNDS + 1):
        votes = (
            bidir.join(
                labels.withColumnRenamed("v", "b").withColumnRenamed(
                    "label", "nb_label"
                ),
                "b",
            )
            .groupBy(F.col("a").alias("v"), F.col("nb_label").alias("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("v")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"), F.col("label").alias("l")
                    )
                )
                .getField("l")
                .alias("label")
            )
            .localCheckpoint()
        )
        comm = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
        outs.append(
            comm.agg(
                F.lit(rnd).cast("long").alias("round"),
                F.sum("sz").cast("long").alias("n_vertices"),
                F.count(F.lit(1)).cast("long").alias("n_communities"),
                F.max("sz").cast("long").alias("max_community_size"),
                F.sum(F.col("label") * F.col("sz"))
                .cast("long")
                .alias("label_checksum"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("round")


QUERIES = {
    "t26_skyline_parts": skyline_parts,
    "t26_spend_concentration": spend_concentration,
    "t26_mann_whitney_value": mann_whitney_value,
    "t26_ks_two_sample": ks_two_sample,
    "t26_cusum_changepoint": cusum_changepoint,
    "t26_acf_daily_events": acf_daily_events,
    "t26_label_propagation": label_propagation_communities,
}

# Unrolled LPA rounds for the oracle (l0 = identity labels).
_LPA_CTE_ROUNDS = ",".join(
    f"""
    v{r} AS (
        SELECT e.a AS v, l.label, COUNT(*) AS cnt
        FROM bidir e JOIN l{r - 1} l ON l.v = e.b
        GROUP BY 1, 2
    ),
    l{r} AS (
        SELECT v, label FROM (
            SELECT v, label,
                   row_number() OVER (PARTITION BY v
                                      ORDER BY cnt DESC, label ASC) AS rn
            FROM v{r}
        ) WHERE rn = 1
    ),
    s{r} AS (
        SELECT CAST({r} AS BIGINT) AS round,
               CAST(COUNT(*) AS BIGINT) AS n_vertices,
               CAST(COUNT(DISTINCT label) AS BIGINT) AS n_communities,
               (SELECT CAST(MAX(c) AS BIGINT) FROM (
                    SELECT COUNT(*) AS c FROM l{r} GROUP BY label))
                   AS max_community_size,
               CAST(SUM(label) AS BIGINT) AS label_checksum
        FROM l{r}
    )"""
    for r in range(1, _LPA_ROUNDS + 1)
)

_ACF_ORACLE_LAG = """
        SELECT CAST({k} AS BIGINT) AS lag,
               n AS n_days,
               CAST(SUM(d0 * d{k}) AS BIGINT) AS num_scaled,
               (SELECT CAST(SUM(d0 * d0) AS BIGINT) FROM lagged) AS den_scaled,
               CAST(SUM(d0 * d{k}) AS DOUBLE)
                   / (SELECT CAST(SUM(d0 * d0) AS DOUBLE) FROM lagged) AS acf
        FROM lagged GROUP BY n
"""

ORACLE = {
    "t26_skyline_parts": """
        WITH base AS (
            SELECT p_partkey, p_brand,
                   CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
                   CAST(p_size AS BIGINT) AS p_size
            FROM part
        )
        SELECT p_partkey, p_brand, price_cents, p_size
        FROM base p
        WHERE NOT EXISTS (
            SELECT 1 FROM base q
            WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
              AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
        )
        ORDER BY p_partkey
    """,
    "t26_spend_concentration": f"""
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS spend
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT c.c_nationkey, s.spend,
                   row_number() OVER (PARTITION BY c.c_nationkey
                                      ORDER BY s.spend, s.o_custkey) AS i
            FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
        ),
        agg AS (
            SELECT c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(spend) AS BIGINT) AS total_cents,
                   CAST(SUM(i * spend) AS BIGINT) AS weighted_rank_sum,
                   CAST(SUM((spend // 1000) * (spend // 1000)) AS BIGINT)
                       AS sum_sq_kcents
            FROM ranked GROUP BY 1
        )
        SELECT n_name, n_customers, total_cents, weighted_rank_sum,
               sum_sq_kcents, {_GINI} AS gini, {_HHI} AS hhi
        FROM agg JOIN nation ON c_nationkey = n_nationkey
        ORDER BY n_name
    """,
    "t26_mann_whitney_value": f"""
        WITH counts AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2
            FROM events WHERE event_type IN ('purchase', 'click')
            GROUP BY 1
        ),
        ranked AS (
            SELECT c1, c2, c1 + c2 AS c,
                   COALESCE(SUM(c1 + c2) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_before
            FROM counts
        ),
        agg AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2,
                   CAST(SUM(c1 * (2 * cum_before + c + 1)) AS BIGINT) AS two_r1,
                   CAST(SUM(c * c * c - c) AS BIGINT) AS tie_t
            FROM ranked
        )
        SELECT n1, n2, two_r1, tie_t,
               CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
               {_MW_Z} AS z
        FROM agg
    """,
    "t26_ks_two_sample": f"""
        WITH counts AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2
            FROM events WHERE event_type IN ('purchase', 'click')
            GROUP BY 1
        ),
        cum AS (
            SELECT v,
                   SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
                   SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
            FROM counts
        ),
        tot AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
            FROM counts
        ),
        diff AS (
            SELECT n1, n2, abs(cum1 * n2 - cum2 * n1) AS d_num, v
            FROM cum CROSS JOIN tot
        )
        SELECT n1, n2,
               CAST(MAX(d_num) AS BIGINT) AS ks_num,
               CAST(MIN(CASE WHEN d_num = (SELECT MAX(d_num) FROM diff)
                        THEN v END) AS BIGINT) AS at_value_centi,
               {_KS_D.replace("ks_num", "CAST(MAX(d_num) AS BIGINT)")} AS ks_d
        FROM diff GROUP BY n1, n2
    """,
    "t26_cusum_changepoint": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS total_cents
            FROM daily
        ),
        series AS (
            SELECT day,
                   SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        ns AS (
            SELECT n_days, total_cents, day,
                   n_days * p - t * total_cents AS ns
            FROM series CROSS JOIN tot
        )
        SELECT n_days, total_cents,
               CAST(MAX(abs(ns)) AS BIGINT) AS max_abs_ns,
               MIN(CASE WHEN abs(ns) = (SELECT MAX(abs(ns)) FROM ns)
                   THEN day END) AS peak_day,
               {_CUSUM_PEAK.replace("max_abs_ns", "CAST(MAX(abs(ns)) AS BIGINT)")}
                   AS peak_cusum_cents
        FROM ns GROUP BY n_days, total_cents
    """,
    "t26_acf_daily_events": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS tt
            FROM daily
        ),
        lagged AS (
            SELECT n,
                   n * x - tt AS d0,
                   n * lag(x, 1) OVER (ORDER BY day) - tt AS d1,
                   n * lag(x, 2) OVER (ORDER BY day) - tt AS d2,
                   n * lag(x, 7) OVER (ORDER BY day) - tt AS d7
            FROM daily CROSS JOIN tot
        )
        {" UNION ALL ".join(_ACF_ORACLE_LAG.format(k=k) for k in _ACF_LAGS)}
        ORDER BY lag
    """,
    "t26_label_propagation": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        bidir AS (
            SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
        ),
        l0 AS (SELECT DISTINCT a AS v, a AS label FROM bidir),{_LPA_CTE_ROUNDS}
        SELECT * FROM s1 UNION ALL SELECT * FROM s2
        ORDER BY round
    """,
}

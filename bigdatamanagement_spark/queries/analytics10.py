"""ML-primitive / forecasting / market-basket pack (T28): frequent
triple itemsets, ClickHouse-style windowFunnel max-step distribution,
deterministic half-sample bootstrap confidence interval for the mean,
information-gain decision stump on hour-of-day, EXACT simple
exponential smoothing one-step backtest (the alpha=1/2 recursion
unrolled into a weighted prefix sum), and directed cross-order
sequential co-purchase pairs ("bought A, later bought B").

Reference anchors (SURVEY §2): the reference's co-listen
recommendation join (`ipynb:1470-1546`) is pairwise market-basket —
the triple itemsets and the time-ordered directed pairs are its two
natural strengthenings; the grouped spend aggregates
(`AmazonRedshift.java:499-509`) feed the bootstrap CI (how sure are we
about that mean?) and the SES backtest (what does tomorrow look
like?); the funnel and stump extend the engine's behavioral /
ML-feature families (t17 funnel, t23 feature snapshot).

Scale notes (100 TB):
- triples: enumerated pair->extend-by-one inside each order basket
  (basket sizes bounded); support filter prunes before the top-k sort.
- windowFunnel: three user-keyed conditional-min aggregates (one
  logical exchange on user_id reused); never a per-user sort.
- bootstrap: 32 half-sample replicas from the BITS of one Knuth
  multiplicative hash (the traindata.py determinism discipline — no
  engine-native rand); replica moments are exact BIGINTs and the CI
  picks ranked replica means (identical doubles both engines).
- stump: 23 split candidates x 4 exact counts; entropies floored to
  micro-nats (the NB-classifier discipline) so the argmax compares
  integers.
- SES: l_t with alpha=1/2 has closed form 2^(t-1) l_t = x_1 +
  sum_{i=2..t} 2^(i-2) x_i — a weighted prefix sum, NOT a driver
  loop; series capped to the most recent 30 days so the 2^k weights
  stay far from BIGINT range (documented).
- sequential pairs: (customer, part, first-date) dedup BEFORE the
  pair join bounds fan-out to (parts-per-customer)^2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.traindata import KNUTH

_TRIPLE_MIN_SUPPORT = 2
_TOP_K = 20
_FUNNEL_STEPS = ("signup", "click", "purchase")
_FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour
_BOOT_B = 32
_SES_DAYS = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28a — frequent 3-itemsets over order baskets: part triples
    (a < b < c) co-bought in >= 2 distinct orders, top-20 by (support
    desc, triple asc) — one lattice level above the pair lift of
    t19_basket_part_pairs_lift (the Apriori step: every frequent
    triple's pairs are frequent).

    Scale: triples expand INSIDE each basket row — baskets are
    order-sized (bounded small), so Σ C(|basket|, 3) stays linear in
    orders, and the former pair-stream ⋈ order-parts equi-join (the
    pair stream re-shuffled by orderkey — 33 MB at sf0.1) disappears:
    the only exchanges left are the basket aggregate and the
    map-side-combined support count; support filters before the
    top-k."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)[
        "lineitem"
    ]
    op = li.select("l_orderkey", "l_partkey").distinct()
    baskets = op.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "flatten(transform(slice(parts, i + 2, size(parts)), (y, j) -> "
                "transform(slice(parts, i + j + 3, size(parts)), "
                "z -> struct(x AS a, y AS b, z AS c))))))"
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.c")
    return (
        triples.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= _TRIPLE_MIN_SUPPORT)
        .orderBy(F.desc("support"), "a", "b", "c")
        .limit(_TOP_K)
    )


def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28b — ClickHouse-style windowFunnel: per user the deepest
    signup -> click -> purchase chain where each next step is the
    FIRST matching event strictly after the previous step and the
    whole chain fits in 1 hour of the signup; reported as the user
    count per max step reached (0 = never signed up). The
    time-bounded strengthening of the unbounded ordered funnel
    (t17_funnel_signup_purchase).

    Scale: three conditional-min aggregates keyed by user_id (the
    same exchange reused); no per-user sort, no UDF."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", us.alias("us")
    )
    s1, s2, s3 = _FUNNEL_STEPS
    t1 = (
        ev.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == s3)
        .join(t2.join(t1, "user_id"), "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    steps = (
        users.join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            F.when(
                F.col("t3").isNotNull()
                & (F.col("t3") - F.col("t1") <= _FUNNEL_WINDOW_US),
                3,
            )
            .when(
                F.col("t2").isNotNull()
                & (F.col("t2") - F.col("t1") <= _FUNNEL_WINDOW_US),
                2,
            )
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("max_step")
        )
    )
    return (
        steps.groupBy("max_step")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("max_step")
    )


_BOOT_MEAN = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28c — deterministic half-sample bootstrap CI for the mean
    purchase value: 32 replicas, replica b keeping the events whose
    Knuth-hash bit b is set (the traindata.py determinism discipline —
    no engine rand, so Spark and DuckDB build byte-identical
    replicas); the 90%-ish CI is the 2nd and 31st ranked replica mean.
    Replica moments are exact BIGINT (centi-sums / counts); each mean
    is ONE shared expression string, and ranking identical doubles is
    engine-independent.

    Scale: one events x 32-replica spine fan-out -> one (b) aggregate;
    fan-out is a projection, not a shuffle multiplier (the aggregate
    reduces map-side)."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    centi = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    h = F.expr(f"(event_id * {KNUTH}) % 4294967296")
    base = ev.select(centi.alias("x"), h.alias("h"))
    bs = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    replicas = (
        base.crossJoin(F.broadcast(bs))
        .filter(F.expr("(h DIV CAST(pow(2, b) AS BIGINT)) % 2 = 1"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
        .select("b", "n", "s", F.expr(_BOOT_MEAN).alias("mean_b"))
    )
    w = Window.orderBy("mean_b", "b")
    ranked = replicas.select(
        "mean_b", F.row_number().over(w).cast("long").alias("rn")
    )
    tot = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(centi).cast("long").alias("s"),
    ).select(
        F.col("n").alias("n_events"),
        F.col("s").alias("sum_centi"),
        F.expr(_BOOT_MEAN).alias("mean_centi"),
    )
    ci = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.min(F.when(F.col("rn") == 2, F.col("mean_b"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == _BOOT_B - 1, F.col("mean_b"))).alias(
            "ci_hi"
        ),
    )
    return tot.join(F.broadcast(ci))


def _h_micro(pos: str, n: str) -> str:
    """Floored micro-nat entropy CONTRIBUTION n_side*H = sum over the
    two classes of count*ln(n/count); each term floors independently
    (0 when the class is empty) so the total is exact integer."""
    return (
        f"(CASE WHEN {pos} = 0 THEN 0 ELSE CAST(floor(1000000.0 * {pos}"
        f" * ln(CAST({n} AS DOUBLE) / CAST({pos} AS DOUBLE))) AS BIGINT) END"
        f" + CASE WHEN {n} - {pos} = 0 THEN 0 ELSE CAST(floor(1000000.0"
        f" * ({n} - {pos}) * ln(CAST({n} AS DOUBLE)"
        f" / CAST({n} - {pos} AS DOUBLE))) AS BIGINT) END)"
    )


def decision_stump_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28d — information-gain decision stump: for every split
    "hour-of-day < h" (h = 1..23), the weighted-entropy reduction in
    predicting event_type = 'purchase', entropies floored to exact
    micro-nats per class term (the NB-classifier discipline) so split
    comparison is BIGINT arithmetic. The single-feature root of every
    tree learner, runnable inside the engine. Output: all 23
    candidates with their exact counts and ig_micro (the argmax is a
    test assertion, the full table is the query).

    Scale: ONE (hour) aggregate of exact counts -> a 24-row broadcast
    grid; the 23 candidates evaluate over running sums of that grid,
    never re-scanning events."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.select(
            F.hour("ts").alias("hr"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_pos"),
        )
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_pos").alias("pos"),
        )
    )
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    run = hourly.select(
        "hr",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("n_left"),
        F.coalesce(F.sum("pos").over(w), F.lit(0)).alias("pos_left"),
    ).filter(F.col("hr") >= 1)
    tot = hourly.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("pos_all"),
    )
    grid = run.join(F.broadcast(tot)).select(
        F.col("hr").cast("long").alias("split_hour"),
        F.col("n_left").cast("long").alias("n_left"),
        F.col("pos_left").cast("long").alias("pos_left"),
        (F.col("n_all") - F.col("n_left")).cast("long").alias("n_right"),
        (F.col("pos_all") - F.col("pos_left")).cast("long").alias("pos_right"),
        "n_all",
        "pos_all",
    )
    ig = (
        f"({_h_micro('pos_all', 'n_all')}"
        f" - ({_h_micro('pos_left', 'n_left')}"
        f" + {_h_micro('pos_right', 'n_right')}))"
    )
    return grid.select(
        "split_hour",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        F.expr(ig).alias("ig_micro"),
    ).orderBy("split_hour")


_SES_MAE = (
    "(CAST(mae_num AS DOUBLE)"
    " / (CAST(n_fc AS DOUBLE) * CAST(denom AS DOUBLE)))"
)


def ses_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28e — EXACT simple-exponential-smoothing one-step backtest
    (alpha = 1/2) on the last 30 days of daily purchase revenue: the
    recursion l_t = (x_t + l_{t-1})/2 closes to 2^(t-1)*l_t = x_1 +
    sum_{i=2..t} 2^(i-2)*x_i — a weighted prefix sum, so the "fold"
    runs as one window pass with BIGINT weights (series capped at 30
    days keeps 2^28 * cents far from BIGINT range). One-step error
    e_t = x_t - l_{t-1} stays exact as (2^(t-2)*x_t - S_{t-1}) over
    2^(t-2); MAE is reported from the common-denominator integer
    numerator through ONE shared expression string. The
    level-forecast twin of the seasonal-naive backtest (t22).

    Scale: one day-grain aggregate + one |days|-row window."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    )
    recent = (
        daily.orderBy(F.desc("day")).limit(_SES_DAYS)
    )
    t_w = Window.orderBy("day")
    idx = recent.select(
        "day", "x", F.row_number().over(t_w).cast("long").alias("t")
    )
    # S_t = x_1 + sum_{i=2..t} 2^(i-2) x_i  (= 2^(t-1) * l_t)
    wsum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    s = idx.select(
        "day",
        "x",
        "t",
        F.sum(
            F.when(F.col("t") == 1, F.col("x")).otherwise(
                F.expr("CAST(pow(2, t - 2) AS BIGINT) * x")
            )
        )
        .over(wsum)
        .alias("s"),
    )
    lagw = Window.orderBy("t")
    err = s.select(
        "day",
        "x",
        "t",
        (
            F.expr("CAST(pow(2, t - 2) AS BIGINT)") * F.col("x")
            - F.lag("s").over(lagw)
        ).alias("e_num"),
    ).filter(F.col("t") >= 2)
    n = _SES_DAYS  # common denominator 2^(n-2); num_t scales by 2^(n-t)
    agg = err.agg(
        F.count(F.lit(1)).cast("long").alias("n_fc"),
        F.sum(
            F.abs(F.col("e_num"))
            * F.expr(f"CAST(pow(2, {n} - t) AS BIGINT)")
        )
        .cast("long")
        .alias("mae_num"),
    ).select(
        "n_fc",
        "mae_num",
        F.lit(2 ** (n - 2)).cast("long").alias("denom"),
        F.expr(_SES_MAE).alias("mae_cents"),
    )
    return agg


def sequential_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T28f — directed cross-order sequential co-purchase: customers
    who bought part A in an order strictly before an order with part
    B, counted as distinct customers per directed (A -> B), top-20 by
    (count desc, pair asc) — the "bought A, later bought B"
    next-product signal that the undirected basket pairs (t19) cannot
    see (direction is the recommendation).

    Scale: dedup to (customer, part, FIRST date) before the pair join
    so fan-out is (parts-per-customer)^2, then dedup (cust, a, b)
    before the distinct-count aggregate.

    One customer-keyed exchange feeds BOTH pre-pair aggregates: the
    former per-(orderkey, partkey) distinct is redundant under min/max
    (duplicate lineitems cannot move a min or max), and hash(custkey)
    partitioning satisfies the clustering of the (cust, part) aggregate
    AND the (cust) parts-list aggregate, so after the one repartition
    both run partition-local (guide §2.4: share one exchange between
    same-keyed operations; measured 5.0 s -> 3.7 s, 20 -> 12 Exchange
    nodes, rows identical)."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    cpd = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .join(
            t["orders"].select(
                "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_partkey", "d")
        .repartition("o_custkey")
        .groupBy("o_custkey", "l_partkey")
        .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d"))
    )
    # expand pairs INSIDE each customer's row (the parts list is
    # bounded), so the only exchanges are the (customer, part)
    # aggregate and the map-side-combined (a, b) count — no pair join,
    # no distinct ((a, b) is unique per customer by construction).
    cparts = cpd.groupBy("o_custkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_partkey").alias("pk"),
                F.col("first_d").alias("fd"),
                F.col("last_d").alias("ld"),
            )
        ).alias("ps")
    )
    # pack the directed pair into ONE BIGINT (a << 32 | b) so the
    # exploded stream and its shuffle rows are a single long each
    pairs = cparts.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, x -> "
                "transform(filter(ps, y -> x.pk != y.pk AND x.fd < y.ld), "
                "y -> x.pk * 4294967296 + y.pk)))"
            )
        ).alias("k")
    )
    return (
        pairs.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .select(
            F.expr("k DIV 4294967296").alias("a"),
            F.expr("k % 4294967296").alias("b"),
            "n_customers",
        )
        .orderBy(F.desc("n_customers"), "a", "b")
        .limit(_TOP_K)
    )


QUERIES = {
    "t28_frequent_triples": frequent_triples,
    "t28_window_funnel": window_funnel,
    "t28_bootstrap_mean_ci": bootstrap_mean_ci,
    "t28_decision_stump_hour": decision_stump_hour,
    "t28_ses_backtest": ses_backtest,
    "t28_sequential_copurchase": sequential_copurchase,
}

ORACLE = {
    "t28_frequent_triples": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS a, b.l_partkey AS b, c.l_partkey AS c,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM op a
        JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        JOIN op c ON b.l_orderkey = c.l_orderkey
             AND b.l_partkey < c.l_partkey
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_TRIPLE_MIN_SUPPORT}
        ORDER BY support DESC, a, b, c LIMIT {_TOP_K}
    """,
    "t28_window_funnel": f"""
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        ),
        t1 AS (
            SELECT user_id, MIN(us) AS t1 FROM ev
            WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1
        ),
        t2 AS (
            SELECT e.user_id, MIN(e.us) AS t2
            FROM ev e JOIN t1 USING (user_id)
            WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.us > t1.t1
            GROUP BY 1
        ),
        t3 AS (
            SELECT e.user_id, MIN(e.us) AS t3
            FROM ev e JOIN t2 USING (user_id)
            WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.us > t2.t2
            GROUP BY 1
        ),
        steps AS (
            SELECT CAST(CASE
                WHEN t3.t3 IS NOT NULL
                     AND t3.t3 - t1.t1 <= {_FUNNEL_WINDOW_US} THEN 3
                WHEN t2.t2 IS NOT NULL
                     AND t2.t2 - t1.t1 <= {_FUNNEL_WINDOW_US} THEN 2
                WHEN t1.t1 IS NOT NULL THEN 1
                ELSE 0 END AS BIGINT) AS max_step
            FROM (SELECT DISTINCT user_id FROM ev) u
            LEFT JOIN t1 USING (user_id)
            LEFT JOIN t2 USING (user_id)
            LEFT JOIN t3 USING (user_id)
        )
        SELECT max_step, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM steps GROUP BY 1 ORDER BY 1
    """,
    "t28_bootstrap_mean_ci": f"""
        WITH base AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS x,
                   (event_id * {KNUTH}) % 4294967296 AS h
            FROM events WHERE event_type = 'purchase'
        ),
        replicas AS (
            SELECT b.b,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM base CROSS JOIN (SELECT UNNEST(range({_BOOT_B})) AS b) b
            WHERE (h // CAST(pow(2, b.b) AS BIGINT)) % 2 = 1
            GROUP BY 1
        ),
        means AS (
            SELECT b, n, s, {_BOOT_MEAN} AS mean_b FROM replicas
        ),
        ranked AS (
            SELECT mean_b,
                   row_number() OVER (ORDER BY mean_b, b) AS rn
            FROM means
        ),
        ci AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
                   MIN(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
                   MIN(CASE WHEN rn = {_BOOT_B - 1} THEN mean_b END) AS ci_hi
            FROM ranked
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM base
        )
        SELECT tot.n AS n_events, tot.s AS sum_centi,
               {_BOOT_MEAN} AS mean_centi,
               ci.n_replicas, ci.ci_lo, ci.ci_hi
        FROM tot CROSS JOIN ci
    """,
    "t28_decision_stump_hour": f"""
        WITH hourly AS (
            SELECT CAST(hour(ts) AS BIGINT) AS hr,
                   COUNT(*) AS n,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS pos
            FROM events GROUP BY 1
        ),
        run AS (
            SELECT hr,
                   COALESCE(SUM(n) OVER (ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_left,
                   COALESCE(SUM(pos) OVER (ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS pos_left
            FROM hourly
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_all,
                   CAST(SUM(pos) AS BIGINT) AS pos_all
            FROM hourly
        ),
        grid AS (
            SELECT CAST(hr AS BIGINT) AS split_hour,
                   CAST(n_left AS BIGINT) AS n_left,
                   CAST(pos_left AS BIGINT) AS pos_left,
                   CAST(n_all - n_left AS BIGINT) AS n_right,
                   CAST(pos_all - pos_left AS BIGINT) AS pos_right,
                   n_all, pos_all
            FROM run CROSS JOIN tot
            WHERE hr >= 1
        )
        SELECT split_hour, n_left, pos_left, n_right, pos_right,
               ({_h_micro('pos_all', 'n_all')}
                - ({_h_micro('pos_left', 'n_left')}
                   + {_h_micro('pos_right', 'n_right')})) AS ig_micro
        FROM grid ORDER BY split_hour
    """,
    "t28_ses_backtest": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY day DESC LIMIT {_SES_DAYS}
        ),
        idx AS (
            SELECT day, x,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        s AS (
            SELECT day, x, t,
                   SUM(CASE WHEN t = 1 THEN x
                       ELSE CAST(pow(2, t - 2) AS BIGINT) * x END)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS s
            FROM idx
        ),
        err AS (
            SELECT t,
                   CAST(pow(2, t - 2) AS BIGINT) * x
                       - lag(s) OVER (ORDER BY t) AS e_num
            FROM s QUALIFY t >= 2
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_fc,
               CAST(SUM(abs(e_num)
                    * CAST(pow(2, {_SES_DAYS} - t) AS BIGINT)) AS BIGINT)
                   AS mae_num,
               CAST({2 ** (_SES_DAYS - 2)} AS BIGINT) AS denom,
               CAST(SUM(abs(e_num) * CAST(pow(2, {_SES_DAYS} - t) AS BIGINT))
                    AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE)
                      * CAST(CAST({2 ** (_SES_DAYS - 2)} AS BIGINT)
                             AS DOUBLE)) AS mae_cents
        FROM err
    """,
    "t28_sequential_copurchase": f"""
        WITH cpd AS (
            SELECT o_custkey, l_partkey,
                   MIN(CAST(o_orderdate AS DATE)) AS first_d,
                   MAX(CAST(o_orderdate AS DATE)) AS last_d
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
            JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT DISTINCT a.o_custkey AS ck,
                   a.l_partkey AS a, b.l_partkey AS b
            FROM cpd a JOIN cpd b
              ON a.o_custkey = b.o_custkey
                 AND a.first_d < b.last_d
                 AND a.l_partkey <> b.l_partkey
        )
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM pairs GROUP BY 1, 2
        ORDER BY n_customers DESC, a, b LIMIT {_TOP_K}
    """,
}

"""HITS / collocation / seasonal-decomposition / intermittent-demand
pack (T46): HITS hubs-and-authorities on the customer-part purchase
bipartite graph (exact integer power iteration — the two-sided sibling
of PageRank/PPR), Dunning log-likelihood-ratio collocations (the
statistically-grounded upgrade of the PMI pair table), an STL-lite
weekday seasonal decomposition of daily revenue (centered 7-day trend,
scale-cleared exact detrending), and Croston's method for intermittent
demand per brand (the dyadic-SES discipline applied to BOTH the demand
sizes and the inter-arrival gaps).

Reference anchors (SURVEY §2): HITS reads the same orders⋈lineitem
workhorse join as Q-J04/T02 (`AmazonRedshift.java:465-535`) as a
bipartite graph; collocations extend the token association family
(PMI ext, distinctive-terms t36) on the documents corpus; the weekday
decomposition is the seasonality twin of t19's hour-of-day baseline;
Croston turns the t45 newsvendor demand distributions into a forecast
for the sparse-demand parts a plain SES (t28) over-smooths.

Scale notes (100 TB):
- HITS: the edge list is ONE distinct (custkey, partkey) aggregate;
  each half-iteration is one edge-keyed join + one key aggregate (the
  PageRank shuffle shape); scores stay exact BIGINT micro via
  (v * 1e6) DIV max(v) renormalization — no float drift across
  engines, and the max is a 1-row broadcast.
- collocations: one bigram-keyed count aggregate; marginals derive
  from the pair table (no second corpus scan); the 2x2 G² terms are
  per-cell micro-nat FLOORED from exact counts before any sum.
- decomposition: the trend window runs on the DAY grain (≤ a few
  thousand rows at any SF); detrending is scale-cleared
  (7x - trendsum), so nothing divides until the final shared
  expression.
- Croston: per-brand state folds over the LAST ≤16 nonzero weeks
  (documented window — dyadic weights 2^15 max keep every term exact
  BIGINT at any SF); the 2^(n-1) denominators of the two SES folds
  cancel in the ratio, so the forecast is one shared double division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_CROSTON_WINDOW = 16  # last n nonzero-demand weeks (dyadic-exact bound)
_WD_ANCHOR = "1996-01-01"  # a Monday; weekday = days-since-anchor mod 7


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T46a: HITS hubs & authorities -----------------------------------------


def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T46a — HITS on the customer→part purchase bipartite graph:
    authority(part) = Σ hub(customers who bought it), hub(customer) =
    Σ authority(parts they bought), iterated h0 → a1 → h1 → a2 with
    exact integer micro renormalization (v·1e6 DIV max) after every
    half-step — both engines walk the identical integer lattice. A
    part is authoritative when BROAD buyers (customers with wide
    baskets) buy it — not merely when many do (that's degree, also
    reported for contrast). Output: top-10 authorities.

    Scale: one distinct edge aggregate; each half-iteration is an
    edge⋈score join + key aggregate (PageRank's shuffle shape); the
    renormalizing max is a 1-row broadcast."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "lineitem"), register=False
    )
    edges = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )

    def renorm(df: DataFrame, key: str, out: str) -> DataFrame:
        # Pin the score table before referencing it twice (max agg +
        # join): un-pinned, each half-step's input subtree — the edge
        # join chain — re-executed once per reference, compounding 2x
        # per half-step (the before-plan carries 70 Exchange nodes for
        # a 3-half-step walk). Scores are O(|V|) rows.
        df = df.localCheckpoint()
        mx = df.agg(F.max("s").alias("mx"))
        return df.join(F.broadcast(mx)).select(
            key, F.expr("(s * 1000000) DIV mx").alias(out)
        )

    # h0 ≡ 1e6 for every customer, so a1 = deg(p) * 1e6.
    a1 = edges.groupBy("p").agg(
        (F.count(F.lit(1)) * _MICRO).alias("s")
    )
    a1n = renorm(a1, "p", "a")
    h1 = (
        edges.join(a1n, "p")
        .groupBy("c")
        .agg(F.sum("a").alias("s"))
    )
    h1n = renorm(h1, "c", "h")
    a2 = (
        edges.join(h1n, "c")
        .groupBy("p")
        .agg(F.sum("h").alias("s"))
    )
    a2n = renorm(a2, "p", "a")
    deg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("degree"))
    # top-10 as orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps); the rank window runs on the <= 10 survivors only
    top = (
        a2n.join(deg, "p")
        .orderBy(F.desc("a"), F.asc("p"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("a"), F.asc("p"))
    return (
        top.select(
            F.row_number().over(w).cast("long").alias("rank"),
            F.col("p").alias("p_partkey"),
            F.col("degree").cast("long").alias("degree"),
            F.col("a").cast("long").alias("auth_micro"),
        )
        .orderBy("rank")
    )


# --- T46b: Dunning log-likelihood collocations ------------------------------

# One 2x2 cell's G² contribution: 1e6 * k * ln(k*N / (r*c)), floored —
# identical expression text on both engines; k=0 cells contribute 0.
_G2_CELL = (
    "(CASE WHEN {k} > 0 THEN CAST(floor(1000000.0 * CAST({k} AS DOUBLE)"
    " * ln(CAST({k} AS DOUBLE) * CAST(n AS DOUBLE)"
    " / (CAST({r} AS DOUBLE) * CAST({c} AS DOUBLE)))) AS BIGINT)"
    " ELSE 0 END)"
)
_G2_MICRO = (
    "(2 * ("
    + _G2_CELL.format(k="c_ab", r="c_a", c="c_b")
    + " + "
    + _G2_CELL.format(k="(c_a - c_ab)", r="c_a", c="(n - c_b)")
    + " + "
    + _G2_CELL.format(k="(c_b - c_ab)", r="(n - c_a)", c="c_b")
    + " + "
    + _G2_CELL.format(k="(n - c_a - c_b + c_ab)", r="(n - c_a)", c="(n - c_b)")
    + "))"
)


def collocation_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T46b — Dunning (1993) log-likelihood-ratio collocations: for
    every bigram with ≥5 occurrences, the G² statistic of its 2x2
    contingency table (bigram vs first-word and second-word
    marginals) — unlike PMI (ext_token_pmi_pairs), G² does not
    over-reward rare pairs, so it is the collocation ranking lexicons
    actually ship. Each of the four cells' 1e6·k·ln(kN/rc) terms is
    FLOORED to integer micro-nats from exact counts before the sum;
    top-15 by (g2 desc, w1, w2).

    Scale: one bigram-keyed count aggregate; both marginals derive
    from the pair table (no second corpus scan); N is a 1-row
    broadcast."""
    d = load_testdata(
        spark, sf_dir, tables=("documents",), register=False
    )["documents"]
    toks = d.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    occ = toks.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i -> "
                    "struct(element_at(toks, i) AS w1,"
                    " element_at(toks, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = occ.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    # Marginals and N fold over the pair table, not the corpus.
    w1c = bc.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    w2c = bc.groupBy("w2").agg(F.sum("c_ab").alias("c_b"))
    tot = bc.agg(F.sum("c_ab").alias("n"))
    w = Window.orderBy(F.desc("g2_micro"), F.asc("w1"), F.asc("w2"))
    return (
        bc.filter(F.col("c_ab") >= 5)
        .join(w1c, "w1")
        .join(w2c, "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.col("n").cast("long").alias("n"),
            F.expr(_G2_MICRO).alias("g2_micro"),
        )
        # top-15 via orderBy+limit heaps, then rank the survivors (a
        # rank-then-filter is a single-task sort over the bigram grain)
        .orderBy(F.desc("g2_micro"), F.asc("w1"), F.asc("w2"))
        .limit(15)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "w1", "w2", "c_ab", "c_a", "c_b", "n", "g2_micro")
        .orderBy("rank")
    )


# --- T46c: STL-lite weekday decomposition -----------------------------------

_WD_MEAN = (
    "(CAST(sum_d7 AS DOUBLE) / (CAST(n_days AS DOUBLE) * 7.0))"
)


def weekday_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T46c — STL-lite seasonal decomposition of daily purchase
    revenue: trend = centered 7-day moving window (kept as the exact
    SUM), detrended d7 = 7·x − trendsum (scale-cleared — no division
    until the very end), seasonal = per-weekday mean of d7 via ONE
    shared expression. Weekday = days-since-1996-01-01 (a Monday)
    mod 7, so 0 = Monday on both engines (dayofweek() conventions
    differ between Spark and DuckDB; date arithmetic does not).
    Revenue is carried in WHOLE DOLLARS (cents DIV 100, documented
    grain) so 7x·sums stay far from BIGINT limits at any SF. Edge
    days without a full 7-day window are excluded (count = 7 guard).

    Scale: everything after the one daily aggregate runs on the DAY
    grain — a few thousand rows at any SF."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "SUM(CAST(round(value * 100, 0) AS BIGINT)) DIV 100"
        ).alias("x")
    )
    # Dense day grid (calendar gaps are real zero-revenue days).
    span = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    dense = grid.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = dense.select(
        "day",
        "x",
        F.sum("x").over(w7).alias("trendsum"),
        F.count(F.lit(1)).over(w7).alias("wn"),
    ).filter(F.col("wn") == 7)
    d7 = trended.select(
        F.expr(
            f"CAST(datediff(day, DATE '{_WD_ANCHOR}') % 7 AS BIGINT)"
        ).alias("weekday"),
        (F.lit(7) * F.col("x") - F.col("trendsum")).alias("d7"),
    )
    return (
        d7.groupBy("weekday")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("d7").cast("long").alias("sum_d7"),
        )
        .select(
            "weekday",
            "n_days",
            "sum_d7",
            F.expr(_WD_MEAN).alias("seasonal_mean_dollars"),
        )
        .orderBy("weekday")
    )


# --- T46d: Croston intermittent-demand forecast ------------------------------

_CROSTON_FC = "(CAST(z_num AS DOUBLE) / CAST(p_num AS DOUBLE))"
_CROSTON_MEAN = "(CAST(q_sum AS DOUBLE) / CAST(n_periods AS DOUBLE))"


def croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T46d — Croston's method per brand: separate dyadic (α=1/2) SES
    folds over the demand SIZES and the inter-arrival GAPS of the
    last ≤16 nonzero-demand weeks; forecast per period =
    ses(size)/ses(gap). With the same α and the same window length,
    the two folds' 2^(n-1) denominators cancel, so the forecast is
    z_num/p_num on two exact BIGINT dyadic convolutions — the SES
    closed form 2^(n-1)·l_n = v₁ + Σ_{i≥2} vᵢ·2^(i-2) (the first
    observation initializes the level, so it carries weight 1, the
    same as v₂; property-tested against the sequential recursion). First in-window gap is
    defined as 1 (documented window-start convention). Plain mean
    demand reported for contrast — Croston sits below it exactly when
    demand is intermittent (gaps > 1).

    Scale: one (brand, week) aggregate; the fold is a bounded
    16-term integer expression per brand — no sequential recursion,
    no driver loop (the t32 Holt discipline)."""
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
        .filter(F.col("q") > 0)
    )
    wdesc = Window.partitionBy("p_brand").orderBy(F.desc("wk"))
    last = weekly.select(
        "p_brand", "wk", "q", F.row_number().over(wdesc).alias("rdesc")
    ).filter(F.col("rdesc") <= _CROSTON_WINDOW)
    wasc = Window.partitionBy("p_brand").orderBy(F.asc("wk"))
    seq = last.select(
        "p_brand",
        "wk",
        "q",
        F.row_number().over(wasc).cast("long").alias("i"),
        F.coalesce(
            F.col("wk") - F.lag("wk").over(wasc), F.lit(1)
        ).alias("gap"),
    )
    folded = seq.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.sum("q").cast("long").alias("q_sum"),
        F.sum(
            F.expr(
                "q * (CASE WHEN i = 1 THEN CAST(1 AS BIGINT)"
                " ELSE shiftleft(CAST(1 AS BIGINT), CAST(i - 2 AS INT))"
                " END)"
            )
        ).cast("long").alias("z_num"),
        F.sum(
            F.expr(
                "gap * (CASE WHEN i = 1 THEN CAST(1 AS BIGINT)"
                " ELSE shiftleft(CAST(1 AS BIGINT), CAST(i - 2 AS INT))"
                " END)"
            )
        ).cast("long").alias("p_num"),
    )
    return folded.select(
        "p_brand",
        "n_periods",
        "z_num",
        "p_num",
        F.expr(_CROSTON_FC).alias("croston_forecast"),
        F.expr(_CROSTON_MEAN).alias("mean_demand"),
    ).orderBy("p_brand")


QUERIES = {
    "t46_hits_hubs_authorities": hits_hubs_authorities,
    "t46_collocation_loglik": collocation_loglik,
    "t46_weekday_decomposition": weekday_decomposition,
    "t46_croston_intermittent": croston_intermittent,
}

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

ORACLE = {
    "t46_hits_hubs_authorities": """
        WITH edges AS (
            SELECT DISTINCT o_custkey AS c, l_partkey AS p
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        a1 AS (
            SELECT p, CAST(COUNT(*) AS BIGINT) * 1000000 AS s
            FROM edges GROUP BY 1
        ),
        a1n AS (
            SELECT p, (s * 1000000) // (SELECT MAX(s) FROM a1) AS a
            FROM a1
        ),
        h1 AS (
            SELECT c, CAST(SUM(a) AS BIGINT) AS s
            FROM edges JOIN a1n USING (p) GROUP BY 1
        ),
        h1n AS (
            SELECT c, (s * 1000000) // (SELECT MAX(s) FROM h1) AS h
            FROM h1
        ),
        a2 AS (
            SELECT p, CAST(SUM(h) AS BIGINT) AS s
            FROM edges JOIN h1n USING (c) GROUP BY 1
        ),
        a2n AS (
            SELECT p, (s * 1000000) // (SELECT MAX(s) FROM a2) AS a
            FROM a2
        ),
        deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS degree
                FROM edges GROUP BY 1)
        SELECT CAST(row_number() OVER (ORDER BY a DESC, p ASC) AS BIGINT)
                   AS rank,
               p AS p_partkey, degree, CAST(a AS BIGINT) AS auth_micro
        FROM a2n JOIN deg USING (p)
        QUALIFY rank <= 10
        ORDER BY rank
    """,
    "t46_collocation_loglik": f"""
        WITH t AS (SELECT {_TOKS} AS toks FROM documents),
        occ AS (
            SELECT toks[i] AS w1, toks[i+1] AS w2
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
            WHERE len(toks) >= 2
        ),
        bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
               FROM occ GROUP BY 1, 2),
        w1c AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a
                FROM bc GROUP BY 1),
        w2c AS (SELECT w2, CAST(SUM(c_ab) AS BIGINT) AS c_b
                FROM bc GROUP BY 1),
        tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM bc),
        scored AS (
            SELECT w1, w2, c_ab, c_a, c_b, n,
                   {_G2_MICRO} AS g2_micro
            FROM bc JOIN w1c USING (w1) JOIN w2c USING (w2) CROSS JOIN tot
            WHERE c_ab >= 5
        )
        SELECT CAST(row_number()
                    OVER (ORDER BY g2_micro DESC, w1 ASC, w2 ASC)
                    AS BIGINT) AS rank,
               w1, w2, c_ab, c_a, c_b, n, g2_micro
        FROM scored
        QUALIFY rank <= 15
        ORDER BY rank
    """,
    "t46_weekday_decomposition": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) // 100 AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        grid AS (
            SELECT CAST(UNNEST(generate_series(lo, hi,
                       INTERVAL 1 DAY)) AS DATE) AS day
            FROM span
        ),
        dense AS (
            SELECT g.day, COALESCE(d.x, 0) AS x
            FROM grid g LEFT JOIN daily d ON g.day = d.day
        ),
        trended AS (
            SELECT day, x,
                   CAST(SUM(x) OVER (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       AS BIGINT) AS trendsum,
                   COUNT(*) OVER (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
            FROM dense
        ),
        d7 AS (
            SELECT CAST(datediff('day', DATE '{_WD_ANCHOR}', day) % 7
                        AS BIGINT) AS weekday,
                   7 * x - trendsum AS d7
            FROM trended WHERE wn = 7
        )
        SELECT weekday,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(d7) AS BIGINT) AS sum_d7,
               {_WD_MEAN} AS seasonal_mean_dollars
        FROM d7 GROUP BY 1 ORDER BY 1
    """,
    "t46_croston_intermittent": f"""
        WITH weekly AS (
            SELECT p_brand, CAST(weekofyear(l_shipdate) AS BIGINT) AS wk,
                   CAST(SUM(l_quantity) AS BIGINT) AS q
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
            HAVING CAST(SUM(l_quantity) AS BIGINT) > 0
        ),
        last AS (
            SELECT p_brand, wk, q
            FROM (
                SELECT p_brand, wk, q,
                       row_number() OVER (PARTITION BY p_brand
                                          ORDER BY wk DESC) AS rdesc
                FROM weekly
            ) WHERE rdesc <= {_CROSTON_WINDOW}
        ),
        seq AS (
            SELECT p_brand, q,
                   CAST(row_number() OVER (PARTITION BY p_brand
                                           ORDER BY wk ASC) AS BIGINT) AS i,
                   COALESCE(wk - lag(wk) OVER (PARTITION BY p_brand
                                               ORDER BY wk ASC), 1) AS gap
            FROM last
        ),
        folded AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n_periods,
                   CAST(SUM(q) AS BIGINT) AS q_sum,
                   CAST(SUM(q * (CASE WHEN i = 1 THEN CAST(1 AS BIGINT)
                        ELSE CAST(1 AS BIGINT) << CAST(i - 2 AS INT) END))
                        AS BIGINT) AS z_num,
                   CAST(SUM(gap * (CASE WHEN i = 1 THEN CAST(1 AS BIGINT)
                        ELSE CAST(1 AS BIGINT) << CAST(i - 2 AS INT) END))
                        AS BIGINT) AS p_num
            FROM seq GROUP BY 1
        )
        SELECT p_brand, n_periods, z_num, p_num,
               {_CROSTON_FC} AS croston_forecast,
               {_CROSTON_MEAN} AS mean_demand
        FROM folded ORDER BY p_brand
    """,
}

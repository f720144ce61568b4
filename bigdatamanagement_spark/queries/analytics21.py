"""All-integer-bootstrap / k-truss / spectral / renewal pack (T39):
a bootstrap confidence interval for the MEDIAN that never touches a
double (half-sample replicas + exact rank picks), k-truss
edge-peeling of the co-purchase graph (the triangle-support
strengthening of the t25 k-core), Goertzel-style single-frequency
spectral power at the weekly period as ONE fixed-order expression
over the pivoted day series, and a renewal table of expected days to
the next order by recency bucket.

Reference anchors (SURVEY §2): the median CI hardens the reference's
point aggregates the way t28's mean CI did — but this one is
integers end-to-end; k-truss extends the t19/t25/t26/t31 graph
family to edge-grade cohesion; the spectral probe quantifies the
weekly period the ANOVA (t29) and ACF (t26) detect; the renewal
table prices the reorder-interval family (t19) as a forward
expectation.

Scale notes (100 TB):
- bootstrap median: 32 replicas from Knuth-hash bits (the t28
  discipline); the replica stream compresses to a (replica, value,
  count) grid FIRST, so each replica's median is an exact cum-count
  rank pick over distinct cents values (bounded domain), never raw
  events; the CI is the 2nd/31st ranked replica median — BIGINTs
  everywhere.
- k-truss: triangle support per edge via one wedge join against the
  edge set; 2 bounded peel rounds drop edges with support < k-2.
- Goertzel: the 30-day series pivots into one row; the power
  expression's cos/sin coefficients are python-literal doubles
  shared verbatim, and the term order is fixed — identical IEEE
  trees.
- renewal: one user-order gap pass -> a |buckets|-row conditional
  expectation table, exact sums over integer day gaps.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.traindata import KNUTH

_BOOT_B = 32
_TRUSS_K = 4  # edges need >= k-2 = 2 triangles
_TRUSS_ROUNDS = 2
_SPECTRAL_DAYS = 28  # 4 full weeks -> exact weekly bin
_RECENCY_BUCKETS = ((0, 7), (8, 30), (31, 90), (91, 100000))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def bootstrap_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T39a — bootstrap CI for the MEDIAN purchase value with ZERO
    doubles: 32 half-sample replicas from Knuth-hash bits (replica b
    keeps events whose hash bit b is set — the t28 discipline), each
    replica's median an exact lower-median rank pick, the 90%-ish CI
    the 2nd and 31st ranked replica medians, ties by replica id.
    Integers end-to-end, so the whole inference is reproducible to
    the bit on any engine.

    Scale: the event stream first compresses to the (replica, value,
    count) grid — the per-replica rank windows then run over DISTINCT
    cents values (a bounded domain), never raw events; the full-sample
    median rides operators/rank.global_running_sum over the same
    compressed grid (no single-partition window anywhere); then a
    32-row reduce."""
    from bigdatamanagement_spark.operators.rank import global_running_sum

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    base = ev.select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("x"),
        F.expr(f"(event_id * {KNUTH}) % 4294967296").alias("h"),
    )
    bs = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    # compress to the (b, x, c) grid BEFORE any window: the lower
    # median is min x with cum-count >= (n+1) DIV 2, so only distinct
    # values (bounded cents domain) ever enter a sort
    grid = (
        base.crossJoin(F.broadcast(bs))
        .filter(F.expr("(h DIV CAST(pow(2, b) AS BIGINT)) % 2 = 1"))
        .groupBy("b", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    cw = (
        Window.partitionBy("b")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "b",
        "x",
        F.sum("c").over(cw).cast("long").alias("cum"),
        F.sum("c").over(Window.partitionBy("b")).cast("long").alias("n"),
    )
    med = (
        cum.filter(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .groupBy("b")
        .agg(F.min("x").cast("long").alias("med"))
    )
    mw = Window.orderBy("med", "b")
    ranked_meds = med.select(
        "med", F.row_number().over(mw).cast("long").alias("rn")
    )
    fgrid = base.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_events = fgrid.agg(F.sum("c")).collect()[0][0] or 0
    fcum = global_running_sum(fgrid, [F.col("x")], "c", "cum")
    full_med = (
        fcum.filter(F.col("cum") >= (n_events + 1) // 2)
        .agg(
            F.min("x").cast("long").alias("median_centi"),
            F.lit(n_events).cast("long").alias("n_events"),
        )
    )
    ci = ranked_meds.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.min(F.when(F.col("rn") == 2, F.col("med")))
        .cast("long")
        .alias("ci_lo_centi"),
        F.min(F.when(F.col("rn") == _BOOT_B - 1, F.col("med")))
        .cast("long")
        .alias("ci_hi_centi"),
    )
    return full_med.join(F.broadcast(ci))


def ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T39b — k-truss (k=4) edge peeling of the co-purchase graph: a
    round counts each edge's triangle support (wedge join of the
    oriented edge list against itself) and drops edges in < k-2 = 2
    triangles; two bounded rounds report (round, n_edges,
    n_triangles, edge_checksum) — the EDGE-grade cohesion measure
    that the vertex-grade k-core (t25) over-approximates (every
    4-truss edge is in the 3-core, not vice versa).

    Scale: support = one a-keyed wedge join + an (edge) count; the
    edge set only shrinks; bounded rounds, min-id orientation."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    outs = []
    for rnd in range(1, _TRUSS_ROUNDS + 1):
        # triangles through wedges: (a<b), (a<c), b<c edge present
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
            edges.select(
                F.col("a").alias("b"), F.col("b").alias("c")
            ),
            ["b", "c"],
            "left_semi",
        ).localCheckpoint()
        # per-edge support: each triangle supports its 3 edges
        sup = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
            .unionByName(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("s"))
        )
        edges = (
            edges.join(
                sup.filter(F.col("s") >= _TRUSS_K - 2).select(
                    F.col("u").alias("a"), F.col("v").alias("b")
                ),
                ["a", "b"],
                "left_semi",
            )
            .localCheckpoint()
        )
        n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        outs.append(
            edges.agg(
                F.lit(rnd).cast("long").alias("round"),
                F.count(F.lit(1)).cast("long").alias("n_edges"),
                F.coalesce(F.sum(F.col("a") + F.col("b")), F.lit(0))
                .cast("long")
                .alias("edge_checksum"),
            ).join(n_tri)
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.select(
        "round", "n_edges", "n_triangles", "edge_checksum"
    ).orderBy("round")


def _goertzel_exprs() -> tuple[str, str]:
    """Fixed-order cos/sin projection expressions over the pivoted
    28-day columns x_0..x_27 at the weekly frequency (period 7):
    literal coefficients computed once in python and shared verbatim
    by both engines."""
    cos_terms = " + ".join(
        f"({math.cos(2 * math.pi * i / 7)!r} * CAST(x_{i} AS DOUBLE))"
        for i in range(_SPECTRAL_DAYS)
    )
    sin_terms = " + ".join(
        f"({math.sin(2 * math.pi * i / 7)!r} * CAST(x_{i} AS DOUBLE))"
        for i in range(_SPECTRAL_DAYS)
    )
    return f"({cos_terms})", f"({sin_terms})"


_G_COS, _G_SIN = _goertzel_exprs()
_G_POWER = (
    f"(({_G_COS}) * ({_G_COS}) + ({_G_SIN}) * ({_G_SIN}))"
    f" / ({_SPECTRAL_DAYS}.0 * {_SPECTRAL_DAYS}.0)"
)


def weekly_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T39c — Goertzel-style spectral power of the daily event-count
    series at the weekly period (7 days), over the most recent 28
    days (4 exact weekly cycles): the series pivots into ONE row of
    28 exact BIGINT columns, and the cos/sin projections are a single
    fixed-order expression whose irrational coefficients are
    python-literal doubles shared verbatim — identical IEEE trees on
    both engines. Reported with the DC power (mean^2) for scale — the
    frequency-domain confirmation of the weekday effect ANOVA (t29)
    tests and ACF-7 (t26) hints at.

    Scale: one day aggregate + one 28-column pivot row; at true
    scale the pivot row is O(period), not O(days)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    recent = daily.orderBy(F.desc("day")).limit(_SPECTRAL_DAYS)
    w = Window.orderBy("day")
    idx = recent.select(
        (F.row_number().over(w) - 1).cast("long").alias("i"), "x"
    )
    pivot = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"),
        *[
            F.sum(F.when(F.col("i") == i, F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"x_{i}")
            for i in range(_SPECTRAL_DAYS)
        ],
    )
    return pivot.select(
        "n_days",
        "total",
        F.expr(_G_POWER).alias("weekly_power"),
        F.expr(
            f"(CAST(total AS DOUBLE) / {_SPECTRAL_DAYS}.0)"
            f" * (CAST(total AS DOUBLE) / {_SPECTRAL_DAYS}.0)"
        ).alias("dc_power"),
    )


def renewal_expectation_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T39d — renewal table: expected days until a customer's NEXT
    order, conditioned on how long they have already waited (recency
    bucket 0-7 / 8-30 / 31-90 / 90+ days at each order): for every
    consecutive order pair the observed gap lands in the bucket of
    every threshold it exceeded — here simplified to the bucket of
    the FULL gap, reporting per bucket the pair count, exact total
    days, and the conditional mean — the forward-looking version of
    the t19 reorder-interval profile that CRM "win-back timing" rules
    read.

    Scale: one customer-keyed lead window over orders -> one bucket
    aggregate."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)[
        "orders"
    ]
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("d"),
        )
        .select(
            "o_custkey",
            F.expr("datediff(lead(d) OVER (PARTITION BY o_custkey"
                   " ORDER BY d, o_orderkey), d)").cast("long").alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    bucket = F.when(F.col("gap") <= 7, F.lit("a_0_7"))
    for lo, hi, name in ((8, 30, "b_8_30"), (31, 90, "c_31_90")):
        bucket = bucket.when(
            (F.col("gap") >= lo) & (F.col("gap") <= hi), F.lit(name)
        )
    bucket = bucket.otherwise(F.lit("d_90_plus"))
    agg = gaps.select(bucket.alias("bucket"), "gap").groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("gap").cast("long").alias("total_days"),
    )
    return agg.select(
        "bucket",
        "n_pairs",
        "total_days",
        F.expr("CAST(total_days AS DOUBLE) / CAST(n_pairs AS DOUBLE)").alias(
            "mean_gap_days"
        ),
    ).orderBy("bucket")


QUERIES = {
    "t39_bootstrap_median_ci": bootstrap_median_ci,
    "t39_ktruss_peel": ktruss_peel,
    "t39_weekly_spectral_power": weekly_spectral_power,
    "t39_renewal_expectation": renewal_expectation_table,
}

_TRUSS_CTE_ROUNDS = ",".join(
    f"""
    tri{r} AS (
        SELECT l.a AS a, l.b AS b, r.b AS c
        FROM e{r - 1} l JOIN e{r - 1} r ON l.a = r.a AND l.b < r.b
        WHERE EXISTS (SELECT 1 FROM e{r - 1} e
                      WHERE e.a = l.b AND e.b = r.b)
    ),
    sup{r} AS (
        SELECT u, v, COUNT(*) AS s FROM (
            SELECT a AS u, b AS v FROM tri{r}
            UNION ALL SELECT a, c FROM tri{r}
            UNION ALL SELECT b, c FROM tri{r}
        ) GROUP BY 1, 2
    ),
    e{r} AS (
        SELECT e.a, e.b FROM e{r - 1} e
        JOIN sup{r} s ON s.u = e.a AND s.v = e.b
        WHERE s.s >= {_TRUSS_K - 2}
    ),
    s{r} AS (
        SELECT CAST({r} AS BIGINT) AS round,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM tri{r}) AS n_triangles,
               (SELECT CAST(COALESCE(SUM(a + b), 0) AS BIGINT) FROM e{r})
                   AS edge_checksum
    )"""
    for r in range(1, _TRUSS_ROUNDS + 1)
)

ORACLE = {
    "t39_bootstrap_median_ci": f"""
        WITH base AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS x,
                   (event_id * {KNUTH}) % 4294967296 AS h
            FROM events WHERE event_type = 'purchase'
        ),
        rep AS (
            SELECT b.b, x FROM base
            CROSS JOIN (SELECT UNNEST(range({_BOOT_B})) AS b) b
            WHERE (h // CAST(pow(2, b.b) AS BIGINT)) % 2 = 1
        ),
        ranked AS (
            SELECT b, x,
                   CAST(row_number() OVER (PARTITION BY b ORDER BY x)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY b) AS BIGINT) AS n
            FROM rep
        ),
        med AS (
            SELECT b, x AS med FROM ranked WHERE rk = (n + 1) // 2
        ),
        rmed AS (
            SELECT med, row_number() OVER (ORDER BY med, b) AS rn FROM med
        ),
        fullmed AS (
            SELECT x AS median_centi, n AS n_events FROM (
                SELECT x,
                       CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS rk,
                       CAST(COUNT(*) OVER () AS BIGINT) AS n
                FROM base
            ) WHERE rk = (n + 1) // 2
        ),
        ci AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
                   CAST(MIN(CASE WHEN rn = 2 THEN med END) AS BIGINT)
                       AS ci_lo_centi,
                   CAST(MIN(CASE WHEN rn = {_BOOT_B - 1} THEN med END)
                        AS BIGINT) AS ci_hi_centi
            FROM rmed
        )
        SELECT median_centi, n_events, n_replicas, ci_lo_centi, ci_hi_centi
        FROM fullmed CROSS JOIN ci
    """,
    "t39_ktruss_peel": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),{_TRUSS_CTE_ROUNDS}
        SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY round
    """,
    "t39_weekly_spectral_power": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1 ORDER BY day DESC LIMIT {_SPECTRAL_DAYS}
        ),
        idx AS (
            SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)
                       AS i, x
            FROM daily
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS total,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN i = {i} THEN x ELSE 0 END)"
                       f" AS BIGINT) AS x_{i}"
                       for i in range(_SPECTRAL_DAYS)
                   )}
            FROM idx
        )
        SELECT n_days, total,
               {_G_POWER} AS weekly_power,
               (CAST(total AS DOUBLE) / {_SPECTRAL_DAYS}.0)
                   * (CAST(total AS DOUBLE) / {_SPECTRAL_DAYS}.0) AS dc_power
        FROM piv
    """,
    "t39_renewal_expectation": """
        WITH gaps AS (
            SELECT datediff('day', d,
                       lead(d) OVER (PARTITION BY o_custkey
                                     ORDER BY d, o_orderkey)) AS gap
            FROM (SELECT o_custkey, o_orderkey,
                         CAST(o_orderdate AS DATE) AS d FROM orders)
        ),
        bucketed AS (
            SELECT CASE WHEN gap <= 7 THEN 'a_0_7'
                        WHEN gap BETWEEN 8 AND 30 THEN 'b_8_30'
                        WHEN gap BETWEEN 31 AND 90 THEN 'c_31_90'
                        ELSE 'd_90_plus' END AS bucket,
                   gap
            FROM gaps WHERE gap IS NOT NULL
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(gap) AS BIGINT) AS total_days,
               CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_gap_days
        FROM bucketed GROUP BY 1 ORDER BY 1
    """,
}

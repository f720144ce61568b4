"""Integer-PPR / auto-binning / information / wavelet /
training-pairs pack (T37): personalized PageRank from the co-purchase
hub in exact integer micro-mass (3 bounded power rounds, damping
85/100 as integer ops), Freedman-Diaconis auto-binned value
histogram, mutual information between hour-of-day and event type in
floored micro-nats, a 2-level unnormalized Haar wavelet energy
spectrum of the daily series, and deterministic negative-sampling
contrastive pairs for training data.

Reference anchors (SURVEY §2): PPR personalizes the t17 PageRank the
way every "customers who bought X" widget needs; Freedman-Diaconis
picks the bin width the reference's fixed histograms
(ext_doc_length_histogram) hard-code; MI quantifies the hour-type
dependence the t28 decision stump exploits; the Haar spectrum is the
multi-resolution twin of the t26 ACF; negative sampling is the
training-data op that turns the events log into contrastive pairs.

Scale notes (100 TB):
- PPR: mass vector in exact integer micro; a round = one
  edge join + vertex-keyed sum; teleport/damping are integer DIV
  ops; 3 rounds bounded. Per-term flooring is deterministic on both
  engines (mass leaks monotonically, never drifts).
- FD histogram: IQR from two exact order-statistic picks; bin id =
  (x - min) DIV width, all integers.
- MI: one (hour, type) grid; every term floored micro-nats from
  exact counts; sums are BIGINT.
- Haar: level-k coefficients are +-1 integer combinations of
  2^k-blocks — energies are exact BIGINTs.
- negative sampling: per positive, the k hash-lowest same-user
  negatives (Knuth order key) — one user-keyed window, fully
  deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.traindata import KNUTH, PRIME2
from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

_PPR_ROUNDS = 3
_PPR_DAMP_NUM = 85
_PPR_DAMP_DEN = 100
_MICRO = 1_000_000
_NEG_K = 3
_HAAR_LEVELS = 2


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T37a — personalized PageRank from the co-purchase hub (max
    degree, min id tiebreak) in EXACT integer micro-mass: per round,
    every vertex ships (mass * 85) DIV 100 split equally over its
    neighbors ((damped DIV deg) per edge) and the source receives the
    15% teleport plus each vertex's flooring remainders' complement
    implicitly (mass simply leaks — documented; the floor makes both
    engines identical). 3 bounded rounds; top-10 vertices by
    (mass desc, id asc) — "what else does the hub's buyer gravitate
    to", the personalization of the t17 PageRank.

    Scale: a round = one broadcast-degree edge join + a vertex-keyed
    BIGINT sum; no floats anywhere."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = bidir.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # Degree-annotated adjacency pinned ONCE: deg was lazily re-derived
    # (a full edge shuffle) inside every round's lineage; attaching it
    # to the edge list up front leaves each round one mass join + one
    # vertex-keyed sum. Integers unchanged.
    outedges = bidir.join(deg, "a").localCheckpoint()
    src_row = deg.agg(
        F.min(
            F.struct((-F.col("deg")).alias("nd"), F.col("a").alias("v"))
        ).getField("v").alias("src")
    )
    src = src_row.collect()[0]["src"]
    mass = spark.createDataFrame(
        [(int(src), _MICRO)], "v long, m long"
    ).localCheckpoint()
    for _ in range(_PPR_ROUNDS):
        spread = (
            outedges
            .join(mass.withColumnRenamed("v", "a"), "a")
            .select(
                F.col("b").alias("v"),
                F.expr(
                    f"((m * {_PPR_DAMP_NUM}) DIV {_PPR_DAMP_DEN}) DIV deg"
                ).alias("m"),
            )
        )
        teleport = spark.createDataFrame(
            [(int(src), _MICRO * (_PPR_DAMP_DEN - _PPR_DAMP_NUM) // _PPR_DAMP_DEN)],
            "v long, m long",
        )
        mass = (
            spread.unionByName(teleport)
            .groupBy("v")
            .agg(F.sum("m").cast("long").alias("m"))
            .filter(F.col("m") > 0)
            .localCheckpoint()
        )
    return (
        mass.select(F.col("v").alias("part"), F.col("m").alias("ppr_micro"))
        .orderBy(F.desc("ppr_micro"), "part")
        .limit(10)
    )


def fd_auto_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T37b — Freedman-Diaconis auto-binned histogram of purchase
    value cents: width = max(1, (2 * IQR) DIV cbrt-ish via the exact
    integer rule floor(2 * IQR / n^(1/3)) computed from exact
    order-statistic quartiles and an exact integer cube-root (greatest
    c with c^3 <= n, probed on the driver from the exact rank-pass
    count — not a float); bins are (x - min) DIV width. The auto
    version of the fixed-width histograms the ext pack ships.

    Scale: a two-phase distributed global rank (rank.global_row_number
    — no single-partition window) + two rank picks in one aggregate +
    one bin aggregate; n (and hence the integer cube root) is a driver
    scalar the rank pass already produced."""
    from bigdatamanagement_spark.operators.rank import global_row_number

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    x = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    base = ev.select(x.alias("x")).localCheckpoint()
    ranked, n = global_row_number(base, [F.col("x")], "rk")
    # exact integer ceil(p * n / 100) — the value at rank k in sorted
    # order is tie-invariant, so row_number tie placement is immaterial
    q1_rk = (25 * n + 99) // 100
    q3_rk = (75 * n + 99) // 100
    quarts = ranked.agg(
        F.lit(n).cast("long").alias("n"),
        F.min(F.when(F.col("rk") == q1_rk, F.col("x"))).alias("q1"),
        F.min(F.when(F.col("rk") == q3_rk, F.col("x"))).alias("q3"),
        F.min("x").alias("lo"),
    )
    # integer cube root: greatest c with c^3 <= n, exact driver-side
    # bisection on the exact BIGINT n (no float pow)
    cr = 1
    hi_c = max(2, int(round(n ** (1 / 3))) + 2)
    for c in range(1, hi_c + 1):
        if c * c * c <= n:
            cr = c
    params = quarts.select(
        "n",
        "q1",
        "q3",
        "lo",
        F.greatest(
            F.expr(f"(2 * (q3 - q1)) DIV {cr}"), F.lit(1)
        ).alias("width"),
    )
    hist = (
        base.join(F.broadcast(params))
        .groupBy(
            F.expr("(x - lo) DIV width").alias("bin"),
            "width",
            "lo",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return hist.select(
        F.col("bin").cast("long").alias("bin"),
        (F.col("lo") + F.col("bin") * F.col("width")).alias("bin_lo_centi"),
        F.col("width").cast("long").alias("width_centi"),
        "cnt",
    ).orderBy("bin")


def mutual_information_hour_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T37c — mutual information between hour-of-day and event type,
    per-cell pointwise terms floored to micro-nats from exact counts
    (term = floor(1e6 * c * ln(c*N / (r*s))), positive and negative
    cells alike) and summed as BIGINTs; reported per type as the
    type's contribution plus the total — HOW MUCH the hour knows
    about the action, the quantity the t28 stump's information gain
    approximates with one split.

    Scale: one (hour, type) grid + broadcast marginals; arithmetic on
    <=120 cells."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        F.hour("ts").cast("long").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    rowm = grid.groupBy("h").agg(F.sum("c").alias("r"))
    colm = grid.groupBy("event_type").agg(F.sum("c").alias("s"))
    tot = grid.agg(F.sum("c").alias("n"))
    term = F.expr(
        "CAST(floor(1000000.0 * c * ln((CAST(c AS DOUBLE)"
        " * CAST(n AS DOUBLE)) / (CAST(r AS DOUBLE)"
        " * CAST(s AS DOUBLE)))) AS BIGINT)"
    )
    cells = (
        grid.join(F.broadcast(rowm), "h")
        .join(F.broadcast(colm), "event_type")
        .join(F.broadcast(tot))
        .select("event_type", "c", term.alias("t"))
    )
    per_type = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.sum("t").cast("long").alias("mi_contrib_scaled"),
    )
    return per_type.select(
        "event_type",
        "n_events",
        "mi_contrib_scaled",
        F.expr(
            "CAST(mi_contrib_scaled AS DOUBLE) / CAST(n_events AS DOUBLE)"
        ).alias("mi_contrib_micro_per_event"),
    ).orderBy("event_type")


def haar_energy_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T37d — unnormalized Haar wavelet energy spectrum of the daily
    event-count series, 2 levels: level-1 details d = x_{2i} -
    x_{2i+1} over day pairs, level-2 details over pair-sum pairs —
    each coefficient an EXACT integer (+-1 combinations of 2^k
    blocks), each level's energy an exact sum of squares; odd tails
    drop (documented). Localized-change energy by time scale — the
    multi-resolution twin of the ACF (t26).

    Scale: one day aggregate + two block-keyed (i DIV 2) aggregates
    on a shrinking series."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    lvl = daily.select(
        "x", (F.row_number().over(w) - 1).cast("long").alias("i")
    )
    outs = []
    for level in range(1, _HAAR_LEVELS + 1):
        paired = (
            lvl.groupBy(F.expr("i DIV 2").alias("j"))
            .agg(
                F.count(F.lit(1)).alias("k"),
                F.sum(F.when(F.col("i") % 2 == 0, F.col("x")).otherwise(0)).alias(
                    "even"
                ),
                F.sum(F.when(F.col("i") % 2 == 1, F.col("x")).otherwise(0)).alias(
                    "odd"
                ),
            )
            .filter(F.col("k") == 2)  # odd tail drops
            .select(
                "j",
                (F.col("even") + F.col("odd")).alias("a"),
                (F.col("even") - F.col("odd")).alias("d"),
            )
            .localCheckpoint()
        )
        outs.append(
            paired.agg(
                F.lit(level).cast("long").alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_coeffs"),
                F.sum(F.col("d") * F.col("d")).cast("long").alias("energy"),
            )
        )
        lvl = paired.select(F.col("a").alias("x"), F.col("j").alias("i"))
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("level")


def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T37e — deterministic negative sampling for contrastive
    training data: for every user with a purchase (positive = the
    FIRST purchase), emit the user's 3 hash-lowest non-purchase
    events (order key = event_id * PRIME2 — the traindata.py
    within-shard ordering hash) as negatives, reported as a per-type
    summary of the emitted negative pool plus positives — the
    pair-construction step every two-tower / ranking trainer runs on
    exactly this log shape, with zero RNG.

    Scale: one user-keyed rank window over non-purchase events + a
    purchase semi-join; output aggregates to |types| rows."""
    ev = _events(spark, sf_dir)
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("np"))
        .select("user_id")
    )
    negs = (
        ev.filter(F.col("event_type") != "purchase")
        .join(buyers, "user_id", "left_semi")
        .select(
            "user_id",
            "event_type",
            F.expr(f"event_id * {PRIME2}").alias("ok"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ok", "event_id")
    picked = negs.select(
        "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _NEG_K)
    n_pos = buyers.agg(F.count(F.lit(1)).cast("long").alias("n_positives"))
    summary = picked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_negatives")
    )
    return (
        summary.join(F.broadcast(n_pos))
        .select("event_type", "n_negatives", "n_positives")
        .orderBy("event_type")
    )


QUERIES = {
    "t37_personalized_pagerank": personalized_pagerank,
    "t37_fd_auto_histogram": fd_auto_histogram,
    "t37_mutual_information_hour_type": mutual_information_hour_type,
    "t37_haar_energy_spectrum": haar_energy_spectrum,
    "t37_negative_sampling_pairs": negative_sampling_pairs,
}

_PPR_TELEPORT = _MICRO * (_PPR_DAMP_DEN - _PPR_DAMP_NUM) // _PPR_DAMP_DEN

_PPR_CTE_ROUNDS = ",".join(
    f"""
    m{r} AS (
        SELECT v, CAST(SUM(m) AS BIGINT) AS m FROM (
            SELECT e.b AS v,
                   ((p.m * {_PPR_DAMP_NUM}) // {_PPR_DAMP_DEN}) // d.deg AS m
            FROM bidir e
            JOIN deg d ON d.v = e.a
            JOIN m{r - 1} p ON p.v = e.a
            UNION ALL
            SELECT src, {_PPR_TELEPORT} FROM s
        ) GROUP BY 1 HAVING SUM(m) > 0
    )"""
    for r in range(1, _PPR_ROUNDS + 1)
)

ORACLE = {
    "t37_personalized_pagerank": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        bidir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT a AS v, COUNT(*) AS deg FROM bidir GROUP BY 1),
        s AS (SELECT v AS src FROM deg ORDER BY deg DESC, v ASC LIMIT 1),
        m0 AS (SELECT src AS v, CAST({_MICRO} AS BIGINT) AS m FROM s),{_PPR_CTE_ROUNDS}
        SELECT v AS part, m AS ppr_micro FROM m{_PPR_ROUNDS}
        ORDER BY ppr_micro DESC, part ASC LIMIT 10
    """,
    "t37_fd_auto_histogram": """
        WITH base AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
            SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM base
        ),
        quarts AS (
            SELECT MAX(n) AS n,
                   MIN(CASE WHEN rk = CAST(ceil(25 * n / 100.0) AS BIGINT)
                       THEN x END) AS q1,
                   MIN(CASE WHEN rk = CAST(ceil(75 * n / 100.0) AS BIGINT)
                       THEN x END) AS q3,
                   MIN(x) AS lo
            FROM ranked
        ),
        croot AS (
            SELECT MAX(c) AS cr
            FROM quarts, (SELECT UNNEST(range(1, 101)) AS c)
            WHERE c * c * c <= n
        ),
        params AS (
            SELECT n, q1, q3, lo,
                   GREATEST((2 * (q3 - q1)) // cr, 1) AS width
            FROM quarts CROSS JOIN croot
        )
        SELECT CAST((x - lo) // width AS BIGINT) AS bin,
               CAST(lo + ((x - lo) // width) * width AS BIGINT)
                   AS bin_lo_centi,
               CAST(width AS BIGINT) AS width_centi,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base CROSS JOIN params
        GROUP BY 1, 2, 3 ORDER BY 1
    """,
    "t37_mutual_information_hour_type": """
        WITH grid AS (
            SELECT CAST(hour(ts) AS BIGINT) AS h, event_type, COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ),
        rowm AS (SELECT h, SUM(c) AS r FROM grid GROUP BY 1),
        colm AS (SELECT event_type, SUM(c) AS s FROM grid GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM grid),
        cells AS (
            SELECT g.event_type, g.c,
                   CAST(floor(1000000.0 * g.c * ln((CAST(g.c AS DOUBLE)
                        * CAST(n AS DOUBLE)) / (CAST(r AS DOUBLE)
                        * CAST(s AS DOUBLE)))) AS BIGINT) AS t
            FROM grid g JOIN rowm USING (h) JOIN colm USING (event_type)
            CROSS JOIN tot
        )
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(SUM(t) AS BIGINT) AS mi_contrib_scaled,
               CAST(SUM(t) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                   AS mi_contrib_micro_per_event
        FROM cells GROUP BY 1 ORDER BY 1
    """,
    "t37_haar_energy_spectrum": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        l0 AS (
            SELECT x, CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)
                       AS i
            FROM daily
        ),
        p1 AS (
            SELECT i // 2 AS j,
                   SUM(CASE WHEN i % 2 = 0 THEN x ELSE 0 END) AS even,
                   SUM(CASE WHEN i % 2 = 1 THEN x ELSE 0 END) AS odd,
                   COUNT(*) AS k
            FROM l0 GROUP BY 1 HAVING COUNT(*) = 2
        ),
        l1 AS (SELECT even + odd AS x, j AS i FROM p1),
        p2 AS (
            SELECT i // 2 AS j,
                   SUM(CASE WHEN i % 2 = 0 THEN x ELSE 0 END) AS even,
                   SUM(CASE WHEN i % 2 = 1 THEN x ELSE 0 END) AS odd,
                   COUNT(*) AS k
            FROM l1 GROUP BY 1 HAVING COUNT(*) = 2
        )
        SELECT CAST(1 AS BIGINT) AS level,
               CAST(COUNT(*) AS BIGINT) AS n_coeffs,
               CAST(SUM((even - odd) * (even - odd)) AS BIGINT) AS energy
        FROM p1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(SUM((even - odd) * (even - odd)) AS BIGINT)
        FROM p2
        ORDER BY level
    """,
    "t37_negative_sampling_pairs": f"""
        WITH buyers AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'
        ),
        negs AS (
            SELECT e.user_id, e.event_type,
                   row_number() OVER (PARTITION BY e.user_id
                       ORDER BY e.event_id * {PRIME2}, e.event_id) AS rn
            FROM events e JOIN buyers USING (user_id)
            WHERE e.event_type <> 'purchase'
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_negatives,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM buyers) AS n_positives
        FROM negs WHERE rn <= {_NEG_K}
        GROUP BY 1 ORDER BY 1
    """,
}

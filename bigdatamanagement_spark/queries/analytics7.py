"""Graph-peeling / MDM / BI-decomposition pack (T25): k-core
decomposition of the co-purchase graph, golden-record survivorship
merge over the fuzzy-matched customer clusters (the master-data-
management step past record linkage), mix-shift revenue decomposition
(rate vs volume effects), and the native ``session_window`` batch SQL
surface proven equivalent to the engine's window-based sessionizer.

Reference anchors (SURVEY §2): the reference stores customers four
ways (SQL, Redis hash, Mongo document, Redshift) but never reconciles
duplicates — the golden-record merge is that missing MDM capability on
top of `operators/linkage.py` + `operators/cluster.py`. The grouped
SUM + ORDER BY family (`AmazonRedshift.java:499-509`) generalizes to
the mix-shift decomposition every BI review runs on a revenue delta.

Scale notes (100 TB):
- k-core: each peel round is one vertex-keyed degree aggregate + one
  semi-join back onto edges; the unroll is a fixed 3 rounds (the
  k-means/PageRank/BFS bounded-iteration discipline) — no driver loop
  grows with data.
- golden record: pairs come from the blocked Levenshtein join (block =
  nation), components from large/small-star contraction; survivorship
  rules are ONE cluster-keyed aggregate (max balance, lexicographic
  min name, majority segment via struct-min argmax).
- mix-shift: one (half, segment) aggregate over one scan; the
  decomposition arithmetic runs on |segments| rows through a shared
  Spark/DuckDB expression string (identical IEEE trees).
- session_window: Spark's native session assembler — same single
  user-keyed Exchange as operators/sessionize.py (equivalence is
  asserted in tests, and the >30-min boundary semantics agree).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_KCORE_K = 3
_KCORE_ROUNDS = 3
_SESSION_GAP_S = 1800


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# The weighted co-purchase pair table (a < b, co-order count c) is the
# shared substrate of NINE graph queries (triangles, BFS, k-core,
# Bellman-Ford, percolation, assortativity, PPR, k-truss, clustering
# coefficients) — each was re-running the same distinct + basket
# collect_set + pair explode + count (~6 s of the measured per-query
# time at sf0.1). Memoize per (session, corpus) like the nested Mongo
# views: the reference's analog is a STORED collection (ingest-time
# materialization), and at 100 TB this table is exactly what you'd
# write bucketed-by(a) at ETL time. First consumer bills the build
# (BASELINE.md's documented attribution artifact).
_COPURCHASE_MEMO: dict[tuple[str, str], DataFrame] = {}


def copurchase_weighted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, c): oriented (a < b) part pairs with their co-order count
    c ≥ 1 — built once per (session, corpus) via the bounded per-basket
    pair fan-out (order size bounds the quadratic term; the self-join
    formulation would shuffle lineitem twice)."""
    from bigdatamanagement_spark.session import session_key

    from bigdatamanagement_spark import cache

    key = (session_key(spark), sf_dir)
    if key not in _COPURCHASE_MEMO:

        def _build() -> DataFrame:
            li = load_testdata(
                spark, sf_dir, tables=("lineitem",), register=False
            )["lineitem"]
            op = li.select("l_orderkey", "l_partkey").distinct()
            baskets = op.groupBy("l_orderkey").agg(
                F.sort_array(F.collect_set("l_partkey")).alias("parts")
            )
            pairs = baskets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(parts, (x, i) -> "
                        "transform(slice(parts, i + 2, size(parts)), "
                        "y -> struct(x AS a, y AS b))))"
                    )
                ).alias("p")
            ).select("p.a", "p.b")
            return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))

        _COPURCHASE_MEMO[key] = cache.persistent_df(
            spark, "copurchase_edges", sf_dir, ("lineitem",), "v1", _build
        )
    return _COPURCHASE_MEMO[key]


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (a < b) part pairs co-bought in ≥2 distinct orders —
    the t19/t20 graph, a filter over the memoized weighted pair table."""
    return (
        copurchase_weighted_pairs(spark, sf_dir)
        .filter(F.col("c") >= 2)
        .select("a", "b")
    )


def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25a — k-core peeling of the part co-purchase graph (k=3, three
    rounds): each round drops every vertex with degree < k and every
    edge touching a dropped vertex, reporting (round, n_vertices,
    n_edges, sum_vertex_ids) — the dense-substructure extraction that
    separates a catalog's stable co-purchase core from one-off pairs
    (triangles t19f count closed triads; the core is what survives
    pruning). Fixed unroll, min-id determinism, all exact integers.

    Scale: a round = one degree aggregate (map-side partials) + one
    semi-join of edges against surviving vertices; the edge list only
    shrinks. 3 rounds is the bounded-iteration discipline — at true
    fixpoint-need, rounds double as in the star-contraction operator."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    outs = []
    for rnd in range(1, _KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= _KCORE_K).select("v").localCheckpoint()
        edges = (
            edges.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
        stats = keep.agg(
            F.lit(rnd).cast("long").alias("round"),
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("sum_vertex_ids"),
        ).join(edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        outs.append(stats.select("round", "n_vertices", "n_edges", "sum_vertex_ids"))
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("round")


def golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25b — golden-record survivorship merge (the MDM step past
    record linkage): fuzzy-matched customer pairs (name Levenshtein ≤ 2
    within nation — operators/linkage.py) close into clusters
    (large/small-star components — operators/cluster.py); every
    multi-member cluster emits one golden row under explicit
    survivorship rules: id = min custkey, balance = max exact cents
    (the keep-the-best rule), name = lexicographic min (deterministic
    canonical pick), segment = majority with alphabetic tiebreak
    (struct-min argmax). The dedup-then-merge shape every customer-360
    pipeline runs.

    Scale: the pair join is blocked (nation); components contract in
    O(log n) star rounds; survivorship is ONE cluster-keyed aggregate
    plus a ≤|clusters|-row majority argmax."""
    from bigdatamanagement_spark.operators.cluster import assign_clusters
    from bigdatamanagement_spark.queries.extensions import _fuzzy_pair_graph

    c = load_testdata(spark, sf_dir, tables=("customer",), register=False)[
        "customer"
    ]
    pairs = _fuzzy_pair_graph(spark, sf_dir)
    clustered = assign_clusters(c, "c_custkey", pairs, "rec_a", "rec_b")
    cents = F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")
    per_cluster = clustered.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("c_custkey").cast("long").alias("golden_id"),
        F.max(cents).alias("best_acctbal_cents"),
        F.min("c_name").alias("canonical_name"),
    )
    seg_counts = clustered.groupBy("cluster_rep", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    majority = seg_counts.groupBy("cluster_rep").agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg"), F.col("c_mktsegment").alias("seg")
            )
        )
        .getField("seg")
        .alias("majority_segment")
    )
    return (
        per_cluster.filter(F.col("n_members") >= 2)
        .join(majority, "cluster_rep")
        .select(
            "golden_id",
            "n_members",
            "best_acctbal_cents",
            "canonical_name",
            "majority_segment",
        )
        .orderBy("golden_id")
    )


# Shared Spark/DuckDB expression strings for the decomposition doubles
# (identical parse tree ⇒ identical IEEE result ⇒ identical rounding).
_AVG1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
_AVG2 = "(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
_MIX_VOL = f"(CAST(n2 - n1 AS DOUBLE) * {_AVG1})"
_MIX_RATE = f"(CAST(n1 AS DOUBLE) * ({_AVG2} - {_AVG1}))"
_MIX_INTER = f"(CAST(n2 - n1 AS DOUBLE) * ({_AVG2} - {_AVG1}))"


def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25c — mix-shift (rate/volume) decomposition of the revenue
    delta between the two halves of the order history, per market
    segment: ΔR = (Δn)·avg₁ + n₁·(Δavg) + (Δn)(Δavg) — volume effect,
    rate effect, interaction. THE question every revenue review asks
    ("did we sell more, or at higher prices, and where?"). Counts and
    cent sums are exact BIGINTs; the three effects evaluate one shared
    expression string on both engines; the exact identity
    volume + rate + interaction = ΔR (in cents) is pinned in tests.

    Scale: one (half, segment) aggregate over one scan (customer dim
    broadcast); the decomposition runs on |segments| rows."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "customer"), register=False
    )
    o = t["orders"]
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    span = o.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).select(
        F.expr("(lo + hi) div 2").alias("mid_us")
    )
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    half = F.when(us < F.col("mid_us"), 1).otherwise(2)
    agg = (
        o.join(F.broadcast(span))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", half.alias("h"), cents.alias("cents"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("h") == 1, F.col("cents")).otherwise(0)).alias("s1"),
            F.sum(F.when(F.col("h") == 2, 1).otherwise(0)).alias("n2"),
            F.sum(F.when(F.col("h") == 2, F.col("cents")).otherwise(0)).alias("s2"),
        )
    )
    return agg.select(
        "c_mktsegment",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.col("s2") - F.col("s1")).cast("long").alias("delta_cents"),
        F.expr(f"CAST(round({_MIX_VOL}, 0) AS BIGINT)").alias("volume_effect_cents"),
        F.expr(f"CAST(round({_MIX_RATE}, 0) AS BIGINT)").alias("rate_effect_cents"),
        F.expr(f"CAST(round({_MIX_INTER}, 0) AS BIGINT)").alias(
            "interaction_cents"
        ),
    ).orderBy("c_mktsegment")


def builtin_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25d — the NATIVE ``session_window`` batch surface: per-user
    session count, event count, and summed session duration assembled
    by Spark's built-in session assembler (which shares the >gap
    boundary semantics of operators/sessionize.py — equivalence is
    asserted in tests). Proves the engine's declared sessionization is
    interchangeable with the built-in, batch and streaming alike.

    Scale: same single user-keyed Exchange as the window-based
    sessionizer; the built-in merges sessions inside the aggregate
    instead of a lag+cumsum pass."""
    ev = _events(spark, sf_dir)
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("start_us"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("end_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_ev").cast("long").alias("n_events"),
            F.sum(F.col("end_us") - F.col("start_us"))
            .cast("long")
            .alias("sum_duration_us"),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "t25_kcore_decomposition": kcore_decomposition,
    "t25_golden_record_merge": golden_record_merge,
    "t25_mix_shift_decomposition": mix_shift_decomposition,
    "t25_builtin_session_window": builtin_session_window_stats,
}

# Unrolled k-core peel rounds (the fixed-iteration oracle discipline of
# k-means/PageRank/BFS): e0 -> (deg, keep, edges) x 3.
_KCORE_CTE_ROUNDS = ",".join(
    f"""
    d{r} AS (
        SELECT v, COUNT(*) AS d FROM (
            SELECT a AS v FROM e{r - 1} UNION ALL SELECT b AS v FROM e{r - 1}
        ) GROUP BY 1
    ),
    k{r} AS (SELECT v FROM d{r} WHERE d >= {_KCORE_K}),
    e{r} AS (
        SELECT a, b FROM e{r - 1}
        WHERE a IN (SELECT v FROM k{r}) AND b IN (SELECT v FROM k{r})
    ),
    s{r} AS (
        SELECT CAST({r} AS BIGINT) AS round,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM k{r}) AS n_vertices,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges,
               (SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT) FROM k{r})
                   AS sum_vertex_ids
    )"""
    for r in range(1, _KCORE_ROUNDS + 1)
)

ORACLE = {
    "t25_kcore_decomposition": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),{_KCORE_CTE_ROUNDS}
        SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
        ORDER BY round
    """,
    "t25_golden_record_merge": """
        WITH RECURSIVE pairs AS (
            SELECT a.c_custkey AS pa, b.c_custkey AS pb
            FROM customer a JOIN customer b
              ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 2
        ),
        edges AS (
            SELECT pa AS u, pb AS v FROM pairs
            UNION SELECT pb, pa FROM pairs
        ),
        reach(n, r) AS (
            SELECT c_custkey, c_custkey FROM customer
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.n = e.v
        ),
        clusters AS (
            SELECT n AS c_custkey, MIN(r) AS cluster_rep FROM reach GROUP BY n
        ),
        members AS (
            SELECT cl.cluster_rep, c.c_custkey, c.c_name, c.c_mktsegment,
                   CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS cents
            FROM customer c JOIN clusters cl USING (c_custkey)
        ),
        per_cluster AS (
            SELECT cluster_rep,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(MIN(c_custkey) AS BIGINT) AS golden_id,
                   CAST(MAX(cents) AS BIGINT) AS best_acctbal_cents,
                   MIN(c_name) AS canonical_name
            FROM members GROUP BY 1
        ),
        seg AS (
            SELECT cluster_rep, c_mktsegment, COUNT(*) AS cnt
            FROM members GROUP BY 1, 2
        ),
        maj AS (
            SELECT cluster_rep, c_mktsegment AS majority_segment
            FROM (SELECT *, row_number() OVER (PARTITION BY cluster_rep
                      ORDER BY cnt DESC, c_mktsegment ASC) AS rn FROM seg)
            WHERE rn = 1
        )
        SELECT golden_id, n_members, best_acctbal_cents, canonical_name,
               majority_segment
        FROM per_cluster JOIN maj USING (cluster_rep)
        WHERE n_members >= 2
        ORDER BY golden_id
    """,
    "t25_mix_shift_decomposition": f"""
        WITH span AS (
            SELECT (MIN(epoch_us(o_orderdate)) + MAX(epoch_us(o_orderdate))) // 2
                       AS mid_us
            FROM orders
        ),
        agg AS (
            SELECT c_mktsegment,
                   CAST(SUM(CASE WHEN epoch_us(o_orderdate) < mid_us
                            THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN epoch_us(o_orderdate) < mid_us
                            THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS s1,
                   CAST(SUM(CASE WHEN epoch_us(o_orderdate) >= mid_us
                            THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN epoch_us(o_orderdate) >= mid_us
                            THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS s2
            FROM orders CROSS JOIN span
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        )
        SELECT c_mktsegment, n1, n2,
               CAST(s2 - s1 AS BIGINT) AS delta_cents,
               CAST(round({_MIX_VOL}, 0) AS BIGINT) AS volume_effect_cents,
               CAST(round({_MIX_RATE}, 0) AS BIGINT) AS rate_effect_cents,
               CAST(round({_MIX_INTER}, 0) AS BIGINT) AS interaction_cents
        FROM agg ORDER BY c_mktsegment
    """,
    "t25_builtin_session_window": f"""
        WITH s AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {_SESSION_GAP_S} * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT user_id, us,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY us ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        per_session AS (
            SELECT user_id, session_seq, COUNT(*) AS n_ev,
                   MIN(us) AS start_us, MAX(us) AS end_us
            FROM numbered GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_ev) AS BIGINT) AS n_events,
               CAST(SUM(end_us - start_us) AS BIGINT) AS sum_duration_us
        FROM per_session GROUP BY 1 ORDER BY 1
    """,
}

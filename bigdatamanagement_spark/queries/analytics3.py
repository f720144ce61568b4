"""Advanced-analytics pack 3 (T20/ext): iterative graph traversal
(BFS shortest hops over the co-purchase graph), the recursive-CTE SQL
surface (Spark 4 ``WITH RECURSIVE``), warehouse temporal semantics
(SCD2 point-in-time lookup), ML data-management ops (group-aware
train/test split with a leakage proof, Johnson-Lindenstrauss random
projection of embeddings).

Reference anchors (SURVEY §2): the graph/recursion entries generalize
the reference's join vocabulary (`Assignment 6/src/AmazonRedshift.java:465-535`
snowflake joins; `Assignment 1/...ipynb:1470-1546` self-join
recommendation graph) to multi-hop reachability; the SCD2 lookup is
the temporal completion of the stock history queries
(`Assignment 3/Assignment3_Database/src/SQLonRDS.java:246-264` — price
as of a date); split/projection serve the §7.8 training-data charter.

Scale notes (100 TB):
- BFS: Pregel-style min-plus iteration — each round is one
  frontier⋈edges join plus a min-aggregate, both keyed on vertex id
  (the canonical distributed formulation; rounds bounded by the
  diameter cap). No driver loop state beyond the fixed unroll count;
  at deeper unrolls add a localCheckpoint per round to cut lineage.
- recursive CTE: the month spine is driver-tiny (one row per month)
  while the fact side stays distributed; the LEFT JOIN keys on the
  truncated month so Catalyst plans a broadcast of the spine.
- SCD2 lookup: validity intervals come from one key-partitioned lead
  window (built once, reusable); the as-of probe is a filter, not a
  join, because the probe instant is a scalar.
- group split: the split is a pure hash of the GROUP key — no
  shuffle to assign, deterministic under any partitioning, and the
  leakage check is a per-group distinct-count (one aggregate).
- JL projection: the 64×16 sign matrix is built once and broadcast;
  the per-(vector, out-dim) partial sums flow through one aggregate
  keyed by (vec_id, out_dim). Components are MILLI-quantized so the
  squared-projection sums stay within BIGINT for corpus sizes up to
  ~1e9 vectors (|proj| ≤ 64·3e3·~5 ⇒ proj² ≤ ~4e12 per row).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_BFS_HOPS = 4
_JL_OUT = 16


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]


# --- BFS shortest hops over the co-purchase graph -------------------------


def copurchase_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20a — breadth-first shortest hop distance from the smallest
    vertex of the part co-purchase graph (edges = part pairs bought
    together in ≥2 distinct orders, undirected), bounded to 4 hops:
    (hops, n_nodes, sum_nodes). The reach profile around a seed
    product — the 'customers also bought, transitively' signal.

    Scale: Pregel min-plus — round k joins the reached set with the
    symmetrized edge list (vertex-keyed) and folds with min(dist), so
    each round is one shuffle on the vertex id; work per round is
    |frontier|·avg-degree, never |V|². The support-≥2 prune shrinks
    the edge list before any traversal."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    # materialize the (small, pruned) edge list once — each BFS round's
    # lineage would otherwise re-run the basket explode + support count
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    seed = sym.agg(F.min("src").alias("v"))
    reached = seed.select("v", F.lit(0).alias("d"))
    for k in range(1, _BFS_HOPS + 1):
        nbr = (
            reached.join(sym, reached["v"] == sym["src"])
            .select(F.col("dst").alias("v"), (F.col("d") + 1).alias("d"))
        )
        reached = (
            reached.unionByName(nbr).groupBy("v").agg(F.min("d").alias("d"))
        )
    return (
        reached.groupBy(F.col("d").cast("int").alias("hops"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("v").cast("long").alias("sum_nodes"),
        )
        .orderBy("hops")
    )


# --- native recursive CTE (Spark 4 WITH RECURSIVE) ------------------------


def recursive_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20b — monthly order counts and revenue over a month spine
    generated with a NATIVE ``WITH RECURSIVE`` CTE (Spark 4 SQL
    surface): months with zero orders appear with zeros — the
    gap-free calendar a reporting layer needs (the recursion-based
    twin of the sequence()-explode gap-fill in operators/gapfill.py).

    Scale: the recursion materializes one row per month (driver-tiny
    spine); the fact scan aggregates once per month key and the spine
    side broadcasts into the join."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    o.createOrReplaceTempView("t20_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m, hi) AS (
            SELECT trunc(CAST(min(o_orderdate) AS DATE), 'MM'),
                   trunc(CAST(max(o_orderdate) AS DATE), 'MM')
            FROM t20_orders
            UNION ALL
            SELECT add_months(m, 1), hi FROM months WHERE m < hi
        )
        SELECT months.m AS month,
               count(o.o_orderkey) AS n_orders,
               coalesce(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)), 0)
                   AS revenue_cents
        FROM months LEFT JOIN t20_orders o
          ON trunc(CAST(o.o_orderdate AS DATE), 'MM') = months.m
        GROUP BY months.m
        ORDER BY month
        """
    )


# --- SCD2 point-in-time lookup --------------------------------------------


def scd2_value_asof_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20c — point-in-time dimension lookup against the SCD2 purchase
    history (operators/merge.scd2_from_events): the value each user
    (< 50) held AS OF the midpoint instant of the purchase stream:
    (user_id, value_r2, since_micros). The 'what did the dimension say
    at time T' query every type-2 warehouse table exists to answer.

    Scale: history intervals come from one user-keyed lead window; the
    probe instant is a scalar (1-row aggregate broadcast), so the
    lookup is a filter on the history — no join fan-out. All instant
    comparisons in exact unix micros."""
    from bigdatamanagement_spark.operators.merge import scd2_from_events

    ev = _events(spark, sf_dir).where(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    hist = scd2_from_events(
        ev.withColumn("value", F.round("value", 2)),
        "user_id",
        "ts",
        value_cols=["value"],
        order_tiebreak="event_id",
    )
    # integer division: double-then-cast truncates in Spark but rounds in
    # DuckDB, flaking by 1 µs whenever min+max is odd
    mid = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).agg(F.expr("(min(us) + max(us)) div 2").alias("t_us"))
    return (
        hist.join(F.broadcast(mid))
        .filter(
            (F.unix_micros(F.col("valid_from").cast("timestamp")) <= F.col("t_us"))
            & (
                F.col("valid_to").isNull()
                | (F.unix_micros(F.col("valid_to").cast("timestamp")) > F.col("t_us"))
            )
        )
        .select(
            "user_id",
            F.col("value").alias("value_r2"),
            F.unix_micros(F.col("valid_from").cast("timestamp")).alias("since_micros"),
        )
        .orderBy("user_id")
    )


# --- group-aware train/test split with leakage proof ----------------------


def group_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — group-aware (per-user) train/test split of the event log
    by deterministic hash (md5 of the GROUP key, 80/20), with the
    leakage audit a training pipeline must run: one row with user and
    event counts per split, the number of users observed in BOTH
    splits (0 — the GroupKFold guarantee, computed honestly from the
    event-level assignment, not assumed), and the purchase-rate of
    each split in basis points (the class-balance check that catches
    a skewed split).

    Scale: the split is a pure function of the group key — no state,
    no shuffle to assign, reproducible on any engine/partitioning.
    The audit folds into one user-keyed aggregate plus one global
    aggregate."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.when(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 100
            < 80,
            "train",
        )
        .otherwise("test")
        .alias("split"),
        (F.col("event_type") == "purchase").cast("long").alias("is_purchase"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count_distinct("split").alias("n_splits"),
        F.first("split").alias("split"),
        F.count(F.lit(1)).alias("n_ev"),
        F.sum("is_purchase").alias("n_pur"),
    )
    tr = F.col("split") == "train"
    return per_user.agg(
        F.sum(F.when(tr, 1).otherwise(0)).cast("long").alias("n_train_users"),
        F.sum(F.when(~tr, 1).otherwise(0)).cast("long").alias("n_test_users"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaky_users"),
        F.sum(F.when(tr, F.col("n_ev")).otherwise(0)).cast("long").alias("train_events"),
        F.sum(F.when(~tr, F.col("n_ev")).otherwise(0)).cast("long").alias("test_events"),
        F.expr(
            "(10000 * sum(CASE WHEN split = 'train' THEN n_pur ELSE 0 END)) div "
            "sum(CASE WHEN split = 'train' THEN n_ev ELSE 0 END)"
        ).alias("train_purchase_bp"),
        F.expr(
            "(10000 * sum(CASE WHEN split = 'test' THEN n_pur ELSE 0 END)) div "
            "sum(CASE WHEN split = 'test' THEN n_ev ELSE 0 END)"
        ).alias("test_purchase_bp"),
    )


# --- Johnson-Lindenstrauss random projection ------------------------------


def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — Johnson-Lindenstrauss random projection of the 64-dim
    embeddings to 16 dims with a portable ±1 sign matrix (md5 parity
    of 'j:i' — the database-friendly Achlioptas construction), and the
    per-output-dim health profile of the projected space: (out_dim,
    n_vecs, sum_proj, sumsq_proj, mean_milli, var_milli2). The cheap
    dimensionality-reduction step before ANN indexing — JL guarantees
    pairwise distances survive within (1±ε).

    Scale: the 64×16 sign matrix is data-independent, built once,
    broadcast; projection partials flow through ONE aggregate keyed by
    (vec_id, out_dim) with map-side combine. Components are
    MILLI-quantized so every sum (incl. n·sumsq − sum² in the variance)
    is exact BIGINT arithmetic to ~1e9 vectors."""
    e = load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ]
    signs = (
        spark.range(64)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(spark.range(_JL_OUT).select(F.col("id").cast("int").alias("j")))
        .select(
            "i",
            "j",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("j").cast("string"),
                                F.lit(":"),
                                F.col("i").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("long")
                % 2
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    comp = e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                "CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))"
            )
        ).alias("i", "q"),
    )
    proj = (
        comp.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("q")).alias("p"))
    )
    return (
        proj.groupBy(F.col("j").alias("out_dim"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("p").cast("long").alias("sum_proj"),
            F.sum(F.col("p") * F.col("p")).cast("long").alias("sumsq_proj"),
        )
        .select(
            "out_dim",
            "n_vecs",
            "sum_proj",
            "sumsq_proj",
            # Spark `div` and DuckDB `//` both truncate toward zero, so the
            # (possibly negative) mean is cross-engine exact as-is
            F.expr("sum_proj div n_vecs").alias("mean_milli"),
            F.expr(
                "(n_vecs * sumsq_proj - sum_proj * sum_proj) div (n_vecs * n_vecs)"
            ).alias("var_milli2"),
        )
        .orderBy("out_dim")
    )


# --- k-means (Lloyd) fixed-iteration clustering ---------------------------

_KM_K = 4
_KM_ITERS = 2
_MILLI_VEC = (
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))"
)


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — k-means (Lloyd) over the embeddings, K=4, exactly 2
    (assign → update) iterations, ENTIRELY in integer arithmetic:
    components milli-quantized, distances exact BIGINT squared-L2,
    centroid components truncated integer means, argmin tie-broken by
    cluster id. Init = the K vectors with smallest md5(vec_id) rank
    (deterministic, engine-portable — the 'k-means‖'-style seedless
    init a distributed pipeline wants). Output per cluster: size,
    inertia, centroid checksum. Because every step is integer and
    deterministic, the DuckDB oracle (same construction, iterations
    unrolled as chained CTEs) reproduces the clustering BIT-FOR-BIT —
    the cross-engine-exact face of iterative ML on the engine.

    Scale: each iteration is one broadcast of the K×64 centroid table
    against the vector scan (K-row fan-out, map-side argmin via
    min(struct)) plus one (cluster, dim)-keyed mean aggregate —
    the canonical distributed Lloyd step; rounds are a fixed unroll,
    no driver-side convergence loop."""
    e = load_testdata(spark, sf_dir, tables=("embeddings",), register=False)[
        "embeddings"
    ].select("vec_id", F.expr(_MILLI_VEC).alias("q"))
    rnk = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("rnk")
    )
    seeds = e.select("vec_id", "q", rnk).orderBy("rnk", "vec_id").limit(_KM_K)
    cents = seeds.select(
        (
            F.row_number().over(Window.orderBy("rnk", "vec_id")) - 1
        ).cast("int").alias("cluster"),
        F.col("q").alias("cv"),
    )
    dist = F.expr(
        "aggregate(zip_with(q, cv, (x, y) -> (x - y) * (x - y)), 0L, (a, x) -> a + x)"
    )
    assigned = None
    for _ in range(_KM_ITERS):
        scored = e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "q", "cluster", dist.alias("dist")
        )
        assigned = (
            scored.groupBy("vec_id")
            .agg(
                F.min(F.struct("dist", "cluster")).alias("m"),
                F.first("q").alias("q"),
            )
            .select(
                "vec_id", "q", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist")
            )
        )
        cents = (
            assigned.select("cluster", F.posexplode("q").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.expr("sum(x) div count(1)").alias("comp"))
            .groupBy("cluster")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(i, comp))), s -> s.comp)"
                ).alias("cv")
            )
        )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("dist").cast("long").alias("inertia_milli2"),
        )
        .join(
            cents.select(
                "cluster",
                F.expr("aggregate(cv, 0L, (a, x) -> a + x)").alias("cent_checksum"),
            ),
            "cluster",
        )
        .orderBy("cluster")
    )


def _kmeans_oracle_sql(k: int = _KM_K, iters: int = _KM_ITERS) -> str:
    parts = [
        "WITH iv AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS q"
        " FROM embeddings),",
        "sd AS (SELECT vec_id, q,"
        " ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS rnk"
        " FROM iv),",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY rnk, vec_id) - 1 AS INT)"
        f" AS cluster, q AS cv FROM (SELECT * FROM sd ORDER BY rnk, vec_id"
        f" LIMIT {k})),",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"s{t} AS (SELECT iv.vec_id, iv.q, c.cluster,"
            " CAST(list_sum(list_transform(range(1, 65),"
            " j -> (iv.q[j] - c.cv[j]) * (iv.q[j] - c.cv[j]))) AS BIGINT) AS dist"
            f" FROM iv CROSS JOIN c{t - 1} c),"
        )
        parts.append(
            f"a{t} AS (SELECT vec_id, q, cluster, dist FROM"
            f" (SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY dist, cluster) AS rn FROM s{t}) WHERE rn = 1),"
        )
        parts.append(
            f"cx{t} AS (SELECT cluster, unnest(range(64)) AS i, unnest(q) AS x"
            f" FROM a{t}),"
        )
        parts.append(
            f"c{t} AS (SELECT cluster, list(comp ORDER BY i) AS cv FROM"
            f" (SELECT cluster, i, CAST(sum(x) // count(*) AS BIGINT) AS comp"
            f" FROM cx{t} GROUP BY cluster, i) GROUP BY cluster),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT a.cluster, CAST(count(*) AS BIGINT) AS n_vecs,"
        f" CAST(sum(a.dist) AS BIGINT) AS inertia_milli2,"
        f" CAST(list_sum(any_value(c.cv)) AS BIGINT) AS cent_checksum"
        f" FROM a{iters} a JOIN c{iters} c USING (cluster)"
        f" GROUP BY a.cluster ORDER BY a.cluster"
    )
    return "\n".join(parts)


# --- exact classifier evaluation: AUC + calibration -----------------------


def classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — exact ROC-AUC of `value` as a predictor of the purchase
    label, one row (n_pos, n_neg, auc_micro): the Mann-Whitney U form
    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with TIE-AVERAGED ranks, kept
    integer end-to-end by carrying 2×rank (ties make average ranks
    half-integers). The eval every quality-filter model needs before
    its threshold is trusted.

    Scale: ranks never materialize per row — scores collapse to one
    (score → count, pos_count) aggregate, the exclusive prefix sum
    over ordered distinct scores runs through the two-phase
    distributed operator (operators/rank.global_running_sum — range
    repartition + carry-in broadcast, never a one-task global window),
    and the tie-group contribution c⁺·(2·cum_before + c + 1) folds in
    one aggregate. Overflow bound: T ≤ n⁺·(2n+1), so micro-scaling is
    exact to ~1e6 positives × 1e9 rows; beyond that, pre-bucket scores
    (the histogram-sketch path)."""
    from bigdatamanagement_spark.operators.rank import global_running_sum

    ev = _events(spark, sf_dir).select(
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("s"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    )
    ps = ev.groupBy("s").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("p").alias("c_pos")
    )
    cum = global_running_sum(ps, [F.col("s")], "c_all", "cum_incl")
    return (
        cum.select(
            "c_all",
            "c_pos",
            (F.col("cum_incl") - F.col("c_all")).alias("cb"),
        )
        .agg(
            F.sum(F.expr("c_pos * (2 * cb + c_all + 1)")).alias("t"),
            F.sum("c_pos").alias("np"),
            F.sum("c_all").alias("na"),
        )
        .select(
            F.col("np").cast("long").alias("n_pos"),
            (F.col("na") - F.col("np")).cast("long").alias("n_neg"),
            F.expr(
                "(1000000 * (t - np * (np + 1))) div (2 * np * (na - np))"
            ).alias("auc_micro"),
        )
    )


def score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20d — reliability table of `value` vs the purchase label: rows
    ranked by (score, event_id) split into 10 equal-count bands, each
    reporting size, positives, positive rate (bp) and the band's exact
    mean score in micros. Monotone-ish positive rate across bands =
    a calibratable score; flat = no signal. The companion diagnostic
    to the AUC scalar.

    Scale: banding needs a GLOBAL rank — via the two-phase distributed
    row_number (operators/rank.global_row_number), with event_id as
    the deterministic tiebreak so band membership is engine-exact."""
    from bigdatamanagement_spark.operators.rank import global_row_number

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("s"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    )
    ranked, n = global_row_number(ev, [F.col("s"), F.col("event_id")], "rn")
    return (
        ranked.select(
            F.expr(f"CAST((rn - 1) * 10 div {n} AS INT)").alias("band"), "s", "p"
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p").cast("long").alias("n_pos"),
            F.expr("(10000 * sum(p)) div count(1)").alias("pos_bp"),
            F.expr("sum(s) div count(1)").alias("mean_score_micro"),
        )
        .orderBy("band")
    )


# --- dyadic EWMA control chart --------------------------------------------

_EWMA_W = 16


def ewma_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20e — EWMA control chart on daily event volume per type: a day
    flags when its count exceeds 2× the exponentially-weighted moving
    average of the trailing 16 days (half-life 1 day — weight 2^(k−i)
    on the i-th-back day). Weights are EXACT powers of two, so the
    whole chart is integer: S = Horner fold (acc·2 + x) over the
    ordered trailing window list, weights sum to 2^len − 1, and the
    flag is v·(2^len − 1) > 2·S — no float anywhere (the EWMA twin of
    the variance-based z-score chart, reacting faster to level
    shifts). Calendar gaps are densified to zero-count days first.

    Scale: daily counts are a tiny (type, day) aggregate; the window
    list is ≤16 longs per row over |types|·|days| rows."""
    ev = _events(spark, sf_dir).select("event_type", F.to_date("ts").alias("day"))
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    span = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = ev.select("event_type").distinct()
    grid = types.join(F.broadcast(span)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    dense = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_EWMA_W, -1)
    )
    scored = dense.select(
        "event_type",
        "x",
        F.collect_list("x").over(w).alias("hist"),
    ).select(
        "event_type",
        "x",
        F.size("hist").alias("hl"),
        # hist is oldest→newest; Horner over the REVERSE gives the newest
        # previous day weight 2^(len−1), the oldest weight 2^0
        F.expr("aggregate(reverse(hist), 0L, (a, v) -> 2 * a + v)").alias("s"),
    )
    return (
        scored.filter(F.col("hl") > 0)
        .select(
            "event_type",
            F.expr(
                "CASE WHEN x * (shiftleft(1L, hl) - 1) > 2 * s THEN 1 ELSE 0 END"
            ).alias("flag"),
            F.expr("x * (shiftleft(1L, hl) - 1) - 2 * s").alias("excess"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("flag").cast("long").alias("n_anomalies"),
            F.max("excess").cast("long").alias("max_excess"),
        )
        .orderBy("event_type")
    )


# --- quantile normalization across groups ---------------------------------


def quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20f — quantile normalization of per-type value distributions
    onto the pooled corpus (the bioinformatics / feature-scaling
    classic): each value's within-type rank maps to the pooled value
    at the proportional global rank, so every type ends up with the
    SAME marginal distribution. Output per type: n, exact micro sum
    and max of the normalized values — checksums that detect any
    rank-mapping slip.

    Scale: within-type ranks ride type-keyed windows (types are the
    parallelism unit); the pooled reference order uses the two-phase
    global row_number, and the lookup is an equi-join on the computed
    position — rank algebra, no per-row search. All ties broken by
    event_id so both engines agree exactly."""
    from bigdatamanagement_spark.operators.rank import global_row_number

    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("v"),
    )
    pooled, n_all = global_row_number(ev, [F.col("v"), F.col("event_id")], "gr")
    wt = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    pos = ev.select(
        "event_type",
        F.row_number().over(wt).alias("r"),
        F.count(F.lit(1)).over(wn).alias("ng"),
    ).select(
        "event_type",
        # ceil(r·N / ng) as pure integer arithmetic
        F.expr(f"(r * {n_all} + ng - 1) div ng").alias("gr"),
    )
    return (
        pos.join(pooled.select("gr", F.col("v").alias("nv")), "gr")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("nv").cast("long").alias("sum_norm_micro"),
            F.max("nv").cast("long").alias("max_norm_micro"),
        )
        .orderBy("event_type")
    )


# --- rolling-origin (expanding window) time-series CV splits --------------

_CV_FOLDS = 4


def rolling_origin_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — rolling-origin backtest folds (time-series cross-
    validation): the event span splits into 5 equal micro-intervals;
    fold k trains on everything before cutoff_k = lo + k·step and
    tests on the next interval. Per fold: sizes, purchase rate of each
    side in bp, and the train/test boundary instants — the temporal
    counterpart of the group-hash split (no future leaks into any
    train side by construction, and the emitted boundaries prove it).

    Scale: fold membership is arithmetic on the event timestamp
    against a broadcast 1-row span — the fold × event expansion is a
    4-row broadcast join, one scan total."""
    ev = _events(spark, sf_dir).select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    )
    span = ev.agg(
        F.min("us").alias("lo"),
        # integer division: double-then-cast would round differently
        # across engines at exact-boundary events
        F.expr("(max(us) - min(us)) div 5").alias("step"),
    )
    folds = spark.range(1, _CV_FOLDS + 1).select(F.col("id").cast("int").alias("fold"))
    tagged = ev.join(F.broadcast(span)).join(
        F.broadcast(folds),
        F.col("us") < (F.col("lo") + (F.col("fold") + 1) * F.col("step")),
    )
    cut = F.col("lo") + F.col("fold") * F.col("step")
    side = F.when(F.col("us") < cut, "train").otherwise("test")
    return (
        tagged.select("fold", side.alias("side"), "us", "p")
        .groupBy("fold")
        .agg(
            F.sum(F.when(F.col("side") == "train", 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(F.col("side") == "test", 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
            F.expr(
                "(10000 * sum(CASE WHEN side = 'train' THEN p ELSE 0 END)) div "
                "sum(CASE WHEN side = 'train' THEN 1 ELSE 0 END)"
            ).alias("train_purchase_bp"),
            F.expr(
                "(10000 * sum(CASE WHEN side = 'test' THEN p ELSE 0 END)) div "
                "sum(CASE WHEN side = 'test' THEN 1 ELSE 0 END)"
            ).alias("test_purchase_bp"),
            F.max(F.when(F.col("side") == "train", F.col("us")))
            .cast("long")
            .alias("train_last_us"),
            F.min(F.when(F.col("side") == "test", F.col("us")))
            .cast("long")
            .alias("test_first_us"),
        )
        .orderBy("fold")
    )


# --- winsorized robust mean ------------------------------------------------


def winsorized_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20g — 5%-winsorized mean of value per event type: the p5/p95
    order statistics (exact rank crossings, no interpolation) become
    clamps — outliers are PULLED IN, not dropped (the robust-mean
    variant that keeps n constant, unlike the IQR/MAD screens that
    exclude). All arithmetic integer micro.

    Scale: fences come from the same type-keyed sorted pass the other
    robust screens share; the clamp + mean is one more aggregate over
    the same exchange."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("v"),
    )
    wt = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(wt).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # k-th order statistic with k = ceil(q·n): first rank where r ≥ k —
    # SYMMETRIC on both tails (20r ≥ n and 20r ≥ 19n), so neither fence
    # sits an order statistic off when n isn't divisible by 20
    fences = ranked.groupBy("event_type").agg(
        F.min(F.when(F.expr("r * 20 >= n"), F.col("v"))).alias("lo"),
        F.min(F.when(F.expr("r * 20 >= 19 * n"), F.col("v"))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .select(
            "event_type",
            F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v"))).alias("w"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("w").cast("long").alias("wsum_micro"),
            F.expr(
                "CASE WHEN sum(w) >= 0 THEN sum(w) div count(1) "
                "ELSE -((-sum(w) + count(1) - 1) div count(1)) END"
            ).alias("wmean_floor_micro"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "ext_classifier_auc": classifier_auc,
    "t20_ewma_volume_anomalies": ewma_volume_anomalies,
    "t20_quantile_normalize_values": quantile_normalize_values,
    "ext_rolling_origin_splits": rolling_origin_splits,
    "t20_winsorized_mean_by_type": winsorized_mean_by_type,
    "t20_score_calibration": score_calibration,
    "ext_kmeans_clusters": kmeans_clusters,
    "t20_copurchase_bfs": copurchase_bfs,
    "t20_recursive_month_revenue": recursive_month_revenue,
    "t20_scd2_value_asof_midpoint": scd2_value_asof_midpoint,
    "ext_group_split_leakage": group_split_leakage,
    "ext_embedding_jl_projection": embedding_jl_projection,
}

ORACLE = {
    "t20_quantile_normalize_values": """
        WITH ev AS (
            SELECT event_id, event_type,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS v
            FROM events
        ),
        pooled AS (
            SELECT v AS nv,
                   row_number() OVER (ORDER BY v, event_id) AS gr
            FROM ev
        ),
        pos AS (
            SELECT event_type,
                   (row_number() OVER (PARTITION BY event_type
                        ORDER BY v, event_id) * (SELECT count(*) FROM ev)
                    + count(*) OVER (PARTITION BY event_type) - 1)
                   // count(*) OVER (PARTITION BY event_type) AS gr
            FROM ev
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(nv) AS BIGINT) AS sum_norm_micro,
               CAST(max(nv) AS BIGINT) AS max_norm_micro
        FROM pos JOIN pooled USING (gr)
        GROUP BY event_type ORDER BY event_type
    """,
    "ext_rolling_origin_splits": f"""
        WITH ev AS (
            SELECT epoch_us(ts) AS us,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
            FROM events
        ),
        span AS (
            SELECT min(us) AS lo,
                   (max(us) - min(us)) // 5 AS step
            FROM ev
        ),
        folds AS (SELECT unnest(range(1, {_CV_FOLDS + 1})) AS fold),
        tagged AS (
            SELECT f.fold, ev.us, ev.p,
                   CASE WHEN ev.us < span.lo + f.fold * span.step
                       THEN 'train' ELSE 'test' END AS side
            FROM ev, span, folds f
            WHERE ev.us < span.lo + (f.fold + 1) * span.step
        )
        SELECT CAST(fold AS INT) AS fold,
               CAST(sum(CASE WHEN side = 'train' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(sum(CASE WHEN side = 'test' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               (10000 * sum(CASE WHEN side = 'train' THEN p ELSE 0 END))
                   // sum(CASE WHEN side = 'train' THEN 1 ELSE 0 END)
                   AS train_purchase_bp,
               (10000 * sum(CASE WHEN side = 'test' THEN p ELSE 0 END))
                   // sum(CASE WHEN side = 'test' THEN 1 ELSE 0 END)
                   AS test_purchase_bp,
               CAST(max(CASE WHEN side = 'train' THEN us END) AS BIGINT)
                   AS train_last_us,
               CAST(min(CASE WHEN side = 'test' THEN us END) AS BIGINT)
                   AS test_first_us
        FROM tagged GROUP BY fold ORDER BY fold
    """,
    "t20_winsorized_mean_by_type": """
        WITH ev AS (
            SELECT event_type,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS v
            FROM events
        ),
        ranked AS (
            SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type ORDER BY v) AS r,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM ev
        ),
        fences AS (
            SELECT event_type,
                   min(CASE WHEN r * 20 >= n THEN v END) AS lo,
                   min(CASE WHEN r * 20 >= 19 * n THEN v END) AS hi
            FROM ranked GROUP BY event_type
        ),
        cl AS (
            SELECT ev.event_type,
                   greatest(f.lo, least(f.hi, ev.v)) AS w
            FROM ev JOIN fences f USING (event_type)
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(w) AS BIGINT) AS wsum_micro,
               CASE WHEN sum(w) >= 0 THEN sum(w) // count(*)
                    ELSE -((-sum(w) + count(*) - 1) // count(*)) END
                   AS wmean_floor_micro
        FROM cl GROUP BY event_type ORDER BY event_type
    """,
    "t20_ewma_volume_anomalies": f"""
        WITH ev AS (
            SELECT event_type, CAST(ts AS DATE) AS day FROM events
        ),
        daily AS (
            SELECT event_type, day, count(*) AS x FROM ev GROUP BY 1, 2
        ),
        span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        grid AS (
            SELECT t.event_type,
                   CAST(unnest(generate_series(span.lo, span.hi,
                       INTERVAL 1 DAY)) AS DATE) AS day
            FROM (SELECT DISTINCT event_type FROM ev) t, span
        ),
        dense AS (
            SELECT g.event_type, g.day, coalesce(d.x, 0) AS x
            FROM grid g LEFT JOIN daily d
              ON d.event_type = g.event_type AND d.day = g.day
        ),
        hw AS (
            SELECT event_type, x,
                   list(x) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN {_EWMA_W} PRECEDING AND 1 PRECEDING)
                       AS hist
            FROM dense
        ),
        sc AS (
            SELECT event_type, x, len(hist) AS hl,
                   CAST(coalesce(list_sum(list_transform(
                       range(1, len(hist) + 1),
                       i -> hist[i] * (1::BIGINT << (i - 1)))), 0) AS BIGINT)
                       AS s
            FROM hw WHERE len(hist) > 0
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN x * ((1::BIGINT << hl) - 1) > 2 * s
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
               CAST(max(x * ((1::BIGINT << hl) - 1) - 2 * s) AS BIGINT)
                   AS max_excess
        FROM sc GROUP BY event_type ORDER BY event_type
    """,
    "ext_classifier_auc": """
        WITH ev AS (
            SELECT CAST(round(value * 1000000.0, 0) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
            FROM events
        ),
        ps AS (SELECT s, count(*) AS c_all, sum(p) AS c_pos FROM ev GROUP BY s),
        cs AS (
            SELECT c_all, c_pos,
                   sum(c_all) OVER (ORDER BY s) - c_all AS cb
            FROM ps
        ),
        ag AS (
            SELECT CAST(sum(c_pos * (2 * cb + c_all + 1)) AS BIGINT) AS t,
                   CAST(sum(c_pos) AS BIGINT) AS np,
                   CAST(sum(c_all) AS BIGINT) AS na
            FROM cs
        )
        SELECT np AS n_pos, na - np AS n_neg,
               (1000000 * (t - np * (np + 1))) // (2 * np * (na - np))
                   AS auc_micro
        FROM ag
    """,
    "t20_score_calibration": """
        WITH ev AS (
            SELECT event_id,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
            FROM events
        ),
        r AS (
            SELECT s, p,
                   row_number() OVER (ORDER BY s, event_id) AS rn,
                   count(*) OVER () AS n
            FROM ev
        )
        SELECT CAST((rn - 1) * 10 // n AS INT) AS band,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p) AS BIGINT) AS n_pos,
               (10000 * sum(p)) // count(*) AS pos_bp,
               CAST(sum(s) AS BIGINT) // count(*) AS mean_score_micro
        FROM r GROUP BY 1 ORDER BY band
    """,
    "ext_kmeans_clusters": _kmeans_oracle_sql(),
    "t20_copurchase_bfs": f"""
        WITH RECURSIVE op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pr AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b USING (l_orderkey)
            WHERE a.l_partkey < b.l_partkey
        ),
        edges AS (SELECT a, b FROM pr GROUP BY a, b HAVING count(*) >= 2),
        sym AS (
            SELECT a AS src, b AS dst FROM edges
            UNION ALL SELECT b, a FROM edges
        ),
        walk(v, d) AS (
            SELECT (SELECT min(src) FROM sym), 0
            UNION
            SELECT sym.dst, walk.d + 1
            FROM walk JOIN sym ON sym.src = walk.v
            WHERE walk.d < {_BFS_HOPS}
        )
        SELECT CAST(d AS INT) AS hops, count(*) AS n_nodes,
               CAST(sum(v) AS BIGINT) AS sum_nodes
        FROM (SELECT v, min(d) AS d FROM walk GROUP BY v)
        GROUP BY d ORDER BY hops
    """,
    "t20_recursive_month_revenue": """
        WITH RECURSIVE months(m, hi) AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE)
            FROM orders
            UNION ALL
            SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi
            FROM months WHERE m < hi
        )
        SELECT months.m AS month,
               count(o.o_orderkey) AS n_orders,
               coalesce(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)), 0)
                   AS revenue_cents
        FROM months LEFT JOIN orders o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
        GROUP BY months.m
        ORDER BY month
    """,
    "t20_scd2_value_asof_midpoint": """
        WITH ev AS (
            SELECT user_id, ts, event_id, round(value, 2) AS value
            FROM events WHERE event_type = 'purchase' AND user_id < 50
        ),
        hist AS (
            SELECT user_id, value,
                   epoch_us(ts) AS from_us,
                   epoch_us(lead(ts) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC)) AS to_us
            FROM ev
        ),
        mid AS (
            SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS t_us
            FROM ev
        )
        SELECT user_id, value AS value_r2, from_us AS since_micros
        FROM hist, mid
        WHERE from_us <= t_us AND (to_us IS NULL OR to_us > t_us)
        ORDER BY user_id
    """,
    "ext_group_split_leakage": """
        WITH ev AS (
            SELECT user_id,
                   CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                       1, 8))::BIGINT % 100) < 80 THEN 'train' ELSE 'test' END
                       AS split,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS is_purchase
            FROM events
        ),
        pu AS (
            SELECT user_id, count(DISTINCT split) AS n_splits,
                   min(split) AS split, count(*) AS n_ev,
                   sum(is_purchase) AS n_pur
            FROM ev GROUP BY user_id
        )
        SELECT CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train_users,
               CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test_users,
               CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_leaky_users,
               CAST(sum(CASE WHEN split = 'train' THEN n_ev ELSE 0 END) AS BIGINT)
                   AS train_events,
               CAST(sum(CASE WHEN split = 'test' THEN n_ev ELSE 0 END) AS BIGINT)
                   AS test_events,
               (10000 * sum(CASE WHEN split = 'train' THEN n_pur ELSE 0 END))
                   // sum(CASE WHEN split = 'train' THEN n_ev ELSE 0 END)
                   AS train_purchase_bp,
               (10000 * sum(CASE WHEN split = 'test' THEN n_pur ELSE 0 END))
                   // sum(CASE WHEN split = 'test' THEN n_ev ELSE 0 END)
                   AS test_purchase_bp
        FROM pu
    """,
    "ext_embedding_jl_projection": f"""
        WITH signs AS (
            SELECT i.i, j.j,
                   CASE WHEN (('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':'
                       || CAST(i.i AS VARCHAR)), 1, 8))::BIGINT % 2) = 0
                       THEN 1 ELSE -1 END AS s
            FROM (SELECT unnest(range(64)) AS i) i,
                 (SELECT unnest(range({_JL_OUT})) AS j) j
        ),
        comp AS (
            SELECT vec_id,
                   unnest(range(64)) AS i,
                   unnest(list_transform(embedding, x ->
                       CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)))
                       AS q
            FROM embeddings
        ),
        proj AS (
            SELECT comp.vec_id, signs.j, sum(signs.s * comp.q) AS p
            FROM comp JOIN signs ON signs.i = comp.i
            GROUP BY comp.vec_id, signs.j
        ),
        stats AS (
            SELECT j AS out_dim, CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(p) AS BIGINT) AS sum_proj,
                   CAST(sum(p * p) AS BIGINT) AS sumsq_proj
            FROM proj GROUP BY j
        )
        SELECT CAST(out_dim AS INT) AS out_dim, n_vecs, sum_proj, sumsq_proj,
               sum_proj // n_vecs AS mean_milli,
               (n_vecs * sumsq_proj - sum_proj * sum_proj) // (n_vecs * n_vecs)
                   AS var_milli2
        FROM stats ORDER BY out_dim
    """,
}

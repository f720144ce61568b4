"""Counterfactual-evaluation / graph-robustness / IR-statistics pack
(T31): inverse-propensity off-policy evaluation of a majority policy
over logged events, degree assortativity of the co-purchase graph, a
percolation sweep of its largest component against the co-order
support threshold, Church-Gale token burstiness over the document
corpus, and the three Pythagorean means of purchase value in exact
integer arithmetic.

Reference anchors (SURVEY §2): the reference logs user actions and
rewards (events' type/value) and only ever averages them — IPS is the
counterfactual question ("what would the BEST action per context have
earned?") every logged-bandit system asks of exactly such a table;
assortativity/percolation extend the t19-t29 graph family with the
robustness readouts; burstiness extends the tf-idf/PMI token family
(`redis_client.py` text fields, documents fixture).

Scale notes (100 TB):
- IPS: propensities are floored integer micro from ONE (context,
  action) count grid (broadcast); each event's importance-weighted
  reward is a BIGINT term ((r * 1e6) DIV p_micro), so the sum is
  order-free exact arithmetic.
- assortativity: Pearson moments over the edge list with broadcast
  degrees — all n-scaled BIGINTs, r through one shared expression.
- percolation: 3 support thresholds x one star-contraction component
  run each, on a graph that only SHRINKS with the threshold.
- burstiness: cf/df per token from one token aggregate; the ratio is
  an exact micro integer (cf * 1e6 DIV df).
- means: harmonic terms floored to 1e12 DIV x picowide integers,
  geometric via summed floored micro-nat logs — no per-row doubles
  ever aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.cluster import connected_components
from bigdatamanagement_spark.operators.text import tokens

_PERC_THRESHOLDS = (2, 3, 4)
_BURST_TOP_K = 20
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


def ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31a — inverse-propensity-scoring (IPS) off-policy evaluation:
    treat each event as a logged (context = hour-of-day, action =
    event type, reward = value cents) triple; the behavior policy's
    propensities are the empirical action frequencies per hour
    (floored integer micro); the target policy plays each hour's
    majority action (ties -> alphabetical). IPS estimate = mean over
    all logged events of 1{action = policy(hour)} * reward / p(action
    | hour) — the counterfactual "what would the majority policy have
    earned" that a naive matched-average gets wrong. Every term is a
    BIGINT ((r_centi * 1e6) DIV p_micro), so the sum is exact and
    order-free; the naive matched mean is reported for contrast.

    Scale: ONE (hour, action) count grid broadcast back over the
    event scan; no per-event state."""
    ev = _events(spark, sf_dir).select(
        F.hour("ts").cast("long").alias("x"),
        F.col("event_type").alias("a"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("r"),
    )
    grid = ev.groupBy("x", "a").agg(F.count(F.lit(1)).alias("c"))
    prop = grid.select(
        "x",
        "a",
        F.expr(f"({_MICRO} * c) DIV SUM(c) OVER (PARTITION BY x)").alias(
            "p_micro"
        ),
        "c",
    )
    policy = prop.groupBy("x").agg(
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col("a").alias("a"))
        )
        .getField("a")
        .alias("pi_a")
    )
    scored = (
        ev.join(F.broadcast(prop.select("x", "a", "p_micro")), ["x", "a"])
        .join(F.broadcast(policy), "x")
        .select(
            "r",
            (F.col("a") == F.col("pi_a")).alias("m"),
            "p_micro",
        )
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).cast("long").alias("n_matched"),
        F.sum(F.when(F.col("m"), F.col("r")).otherwise(0))
        .cast("long")
        .alias("matched_reward_centi"),
        F.sum(
            F.when(
                F.col("m"),
                F.expr(f"(r * {_MICRO}) DIV p_micro"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("ips_sum_centi"),
    )
    return agg.select(
        "n_events",
        "n_matched",
        "matched_reward_centi",
        "ips_sum_centi",
        F.expr(
            "CAST(ips_sum_centi AS DOUBLE) / CAST(n_events AS DOUBLE)"
        ).alias("ips_value_centi"),
        F.expr(
            "CAST(matched_reward_centi AS DOUBLE) / CAST(n_matched AS DOUBLE)"
        ).alias("naive_matched_centi"),
    )


_ASSORT_R = (
    "(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
    " * CAST(n * syy - sy * sy AS DOUBLE)))"
)


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31b — degree assortativity of the co-purchase graph: the
    Pearson correlation of endpoint degrees over the DIRECTED edge
    list (both orientations, the standard Newman convention) — do
    hub parts co-sell with hubs (assortative, r > 0) or with leaves
    (disassortative, r < 0)? All moments exact n-scaled BIGINTs; r
    evaluates ONE shared expression string.

    Scale: one degree aggregate broadcast onto the edge list, one
    moment reduce."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = bidir.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    joined = (
        bidir.join(
            F.broadcast(deg.select(F.col("v").alias("a"), F.col("d").alias("da"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("v").alias("b"), F.col("d").alias("db"))),
            "b",
        )
        .select("da", "db")
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("da").cast("long").alias("sx"),
        F.sum("db").cast("long").alias("sy"),
        F.sum(F.col("da") * F.col("db")).cast("long").alias("sxy"),
        F.sum(F.col("da") * F.col("da")).cast("long").alias("sxx"),
        F.sum(F.col("db") * F.col("db")).cast("long").alias("syy"),
    )
    return agg.select("n", F.expr(_ASSORT_R).alias("assortativity"))


def percolation_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31c — percolation sweep of the co-purchase graph: for each
    co-order support threshold t in {2, 3, 4}, keep only edges with
    >= t shared orders and report edge count, vertex count, component
    count, and the largest component's size — where the graph's giant
    component collapses as weak ties drop (the robustness twin of the
    k-core peel t25, which prunes vertices instead of edges).

    Scale: the support aggregate runs ONCE; each threshold is a
    filter + one O(log n) star-contraction run on a graph that only
    shrinks."""
    from bigdatamanagement_spark.queries.analytics7 import (
        copurchase_weighted_pairs,
    )

    weighted = copurchase_weighted_pairs(spark, sf_dir)
    outs = []
    for t in _PERC_THRESHOLDS:
        edges = weighted.filter(F.col("c") >= t).select("a", "b")
        comp = connected_components(edges, "a", "b")
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        outs.append(
            sizes.agg(
                F.lit(t).cast("long").alias("threshold"),
                F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("n_vertices"),
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.coalesce(F.max("sz"), F.lit(0))
                .cast("long")
                .alias("largest_component"),
            ).join(
                edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.select(
        "threshold", "n_edges", "n_vertices", "n_components",
        "largest_component",
    ).orderBy("threshold")


def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31d — Church-Gale token burstiness over the document corpus:
    collection frequency / document frequency per token (how hard a
    token clumps into few documents — burstiness 1 = evenly spread),
    kept exact as cf * 1e6 DIV df micro; top-20 among tokens in >= 5
    documents by (burstiness desc, token asc) — the repetition /
    topicality signal tf-idf's df alone misses.

    Scale: one tokenize pass -> one (token) aggregate of two counts;
    the top-k sorts only the df-filtered tail."""
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    agg = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    return (
        agg.filter(F.col("df") >= 5)
        .select(
            "tok",
            "cf",
            "df",
            F.expr(f"(cf * {_MICRO}) DIV df").alias("burstiness_micro"),
        )
        .orderBy(F.desc("burstiness_micro"), "tok")
        .limit(_BURST_TOP_K)
    )


_GEO_MEAN = "exp(CAST(log_sum_micro AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)))"
_HARM_MEAN = (
    "(1000000000000.0 * CAST(n AS DOUBLE) / CAST(inv_sum_pico AS DOUBLE))"
)


def pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T31e — the three Pythagorean means of purchase value (cents)
    per event type (arithmetic from exact sums; geometric from summed
    floored micro-nat logs; harmonic from summed floored 1e12 DIV x
    reciprocals) with the AM >= GM >= HM inequality as the built-in
    sanity invariant. No per-row double ever aggregates — the two
    nonlinear means evaluate shared expression strings over the
    integer moments.

    Scale: one keyed aggregate with three integer accumulators."""
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    x = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    base = ev.select("event_type", x.alias("x")).filter(F.col("x") > 0)
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sum_centi"),
        F.sum(
            F.expr("CAST(floor(1000000.0 * ln(CAST(x AS DOUBLE))) AS BIGINT)")
        )
        .cast("long")
        .alias("log_sum_micro"),
        F.sum(F.expr("1000000000000 DIV x")).cast("long").alias("inv_sum_pico"),
    )
    return agg.select(
        "event_type",
        "n",
        F.expr("CAST(sum_centi AS DOUBLE) / CAST(n AS DOUBLE)").alias(
            "arith_centi"
        ),
        F.expr(_GEO_MEAN).alias("geo_centi"),
        F.expr(_HARM_MEAN).alias("harm_centi"),
    ).orderBy("event_type")


QUERIES = {
    "t31_ips_policy_value": ips_policy_value,
    "t31_degree_assortativity": degree_assortativity,
    "t31_percolation_sweep": percolation_sweep,
    "t31_token_burstiness": token_burstiness,
    "t31_pythagorean_means": pythagorean_means,
}

_PERC_ORACLE_ONE = """
        SELECT CAST({t} AS BIGINT) AS threshold,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e{t}) AS n_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM comp{t}) AS n_vertices,
               (SELECT CAST(COUNT(DISTINCT comp) AS BIGINT) FROM comp{t})
                   AS n_components,
               (SELECT CAST(COALESCE(MAX(c), 0) AS BIGINT) FROM
                    (SELECT COUNT(*) AS c FROM comp{t} GROUP BY comp))
                   AS largest_component
"""

_PERC_ORACLE_CTES = ",".join(
    f"""
    e{t} AS (SELECT a, b FROM weighted WHERE c >= {t}),
    bid{t} AS (SELECT a AS u, b AS v FROM e{t}
               UNION SELECT b, a FROM e{t}),
    reach{t}(n, r) AS (
        SELECT u, u FROM bid{t}
        UNION
        SELECT e.u, reach{t}.r FROM bid{t} e
        JOIN reach{t} ON reach{t}.n = e.v
    ),
    comp{t} AS (SELECT n AS v, MIN(r) AS comp FROM reach{t} GROUP BY n)"""
    for t in _PERC_THRESHOLDS
)

ORACLE = {
    "t31_ips_policy_value": f"""
        WITH ev AS (
            SELECT CAST(hour(ts) AS BIGINT) AS x, event_type AS a,
                   CAST(round(value * 100, 0) AS BIGINT) AS r
            FROM events
        ),
        grid AS (SELECT x, a, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        prop AS (
            SELECT x, a,
                   ({_MICRO} * c) // SUM(c) OVER (PARTITION BY x) AS p_micro,
                   c
            FROM grid
        ),
        policy AS (
            SELECT x, a AS pi_a FROM (
                SELECT x, a, row_number() OVER (PARTITION BY x
                           ORDER BY c DESC, a ASC) AS rn
                FROM prop
            ) WHERE rn = 1
        ),
        scored AS (
            SELECT ev.r, ev.a = policy.pi_a AS m, prop.p_micro
            FROM ev
            JOIN prop ON ev.x = prop.x AND ev.a = prop.a
            JOIN policy ON ev.x = policy.x
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_matched,
                   CAST(SUM(CASE WHEN m THEN r ELSE 0 END) AS BIGINT)
                       AS matched_reward_centi,
                   CAST(SUM(CASE WHEN m THEN (r * {_MICRO}) // p_micro
                            ELSE 0 END) AS BIGINT) AS ips_sum_centi
            FROM scored
        )
        SELECT n_events, n_matched, matched_reward_centi, ips_sum_centi,
               CAST(ips_sum_centi AS DOUBLE) / CAST(n_events AS DOUBLE)
                   AS ips_value_centi,
               CAST(matched_reward_centi AS DOUBLE)
                   / CAST(n_matched AS DOUBLE) AS naive_matched_centi
        FROM agg
    """,
    "t31_degree_assortativity": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        bidir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT a AS v, COUNT(*) AS d FROM bidir GROUP BY 1),
        joined AS (
            SELECT da.d AS da, db.d AS db
            FROM bidir e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(da) AS BIGINT) AS sx,
                   CAST(SUM(db) AS BIGINT) AS sy,
                   CAST(SUM(da * db) AS BIGINT) AS sxy,
                   CAST(SUM(da * da) AS BIGINT) AS sxx,
                   CAST(SUM(db * db) AS BIGINT) AS syy
            FROM joined
        )
        SELECT n, {_ASSORT_R} AS assortativity FROM agg
    """,
    "t31_percolation_sweep": f"""
        WITH RECURSIVE op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        weighted AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS c
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),{_PERC_ORACLE_CTES}
        {" UNION ALL ".join(_PERC_ORACLE_ONE.format(t=t) for t in _PERC_THRESHOLDS)}
        ORDER BY threshold
    """,
    "t31_token_burstiness": f"""
        WITH tok AS (
            SELECT doc_id,
                   UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS tok
            FROM documents
        ),
        agg AS (
            SELECT tok,
                   CAST(COUNT(*) AS BIGINT) AS cf,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok GROUP BY 1
        )
        SELECT tok, cf, df,
               CAST((cf * {_MICRO}) // df AS BIGINT) AS burstiness_micro
        FROM agg WHERE df >= 5
        ORDER BY burstiness_micro DESC, tok ASC LIMIT {_BURST_TOP_K}
    """,
    "t31_pythagorean_means": f"""
        WITH base AS (
            SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x
            FROM events WHERE value > 0
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_centi,
                   CAST(SUM(CAST(floor(1000000.0 * ln(CAST(x AS DOUBLE)))
                            AS BIGINT)) AS BIGINT) AS log_sum_micro,
                   CAST(SUM(1000000000000 // x) AS BIGINT) AS inv_sum_pico
            FROM base WHERE x > 0 GROUP BY 1
        )
        SELECT event_type, n,
               CAST(sum_centi AS DOUBLE) / CAST(n AS DOUBLE) AS arith_centi,
               {_GEO_MEAN} AS geo_centi,
               {_HARM_MEAN} AS harm_centi
        FROM agg ORDER BY event_type
    """,
}

"""Harmonic-centrality / TextRank / Shapley-attribution / feature-
ranking pack (T47): bounded 3-hop harmonic centrality of the
co-purchase graph (the closeness family's robust member — finite on
disconnected graphs), TextRank keyword extraction (weighted PageRank
on the token adjacency graph — the graph-ranking twin of TF-IDF),
exact data-driven Shapley multi-touch attribution over the ≤16-subset
channel lattice (the game-theoretically fair credit the position /
time-decay / Markov entries approximate), and Gini-impurity feature
ranking for the purchase-prediction target (which candidate feature
splits best — the multi-feature upgrade of the t28 decision stump).

Reference anchors (SURVEY §2): all four read the engine's established
substrates — the memoized co-purchase graph (analytics7), the token
adjacency convention (ext PMI / t46 collocations), the per-user event
rollups behind the attribution family (t19/t21/t23/t30), and the
hour/weekday derivations of the seasonality family.

Scale notes (100 TB):
- harmonic: multi-source expansion is bounded to 3 hops on the
  support-pruned edge list; each hop is one edge-keyed join + one
  anti-join against nearer levels (never |V|² — sparsity and the hop
  cap bound the pair fan-out; raise the support threshold to shrink
  further).
- TextRank: the token graph prunes to adjacency count ≥ 3 before any
  iteration; each of the 3 rounds is one edge join + one vertex
  aggregate in exact integer micro (the t37 PPR discipline).
- Shapley: everything past the per-user set aggregate lives on the
  ≤16-row subset lattice; the ⊆-zeta transform is a bitmask join of
  a 16-row table with itself.
- Gini: one (feature, branch, class) count grid; the impurity
  arithmetic folds exact BIGINTs with per-branch floors documented.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_WD_ANCHOR = "1996-01-01"  # Monday anchor (t46 convention)

# Shapley channel lattice: the four non-purchase event types, fixed
# literal bit assignment (alphabetical), conversion = any purchase.
_SHAPLEY_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
# |S'|!(n-1-|S'|)!/n! for n=4 by |S'| (S' = coalition without the player),
# in floored micro: 0!3!/4! = 1/4, 1!2!/4! = 1/12, 2!1!/4! = 1/12,
# 3!0!/4! = 1/4.
_SHAPLEY_W = {0: 250_000, 1: 83_333, 2: 83_333, 3: 250_000}

_TR_DAMP_NUM, _TR_DAMP_DEN = 85, 100
_TR_BASE = _MICRO * (_TR_DAMP_DEN - _TR_DAMP_NUM) // _TR_DAMP_DEN  # 150000
_TR_ROUNDS = 3
_TR_MIN_W = 3


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T47a: bounded harmonic centrality --------------------------------------

# 1e6/1, 1e6/2, floor(1e6/3) — literal per-hop credits shared verbatim.
_HARM = "(n1 * 1000000 + n2 * 500000 + n3 * 333333)"


def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T47a — 3-hop harmonic centrality on the co-purchase graph
    (support ≥ 2): centrality(u) = Σ_v 1/d(u,v) over vertices within
    3 hops, with per-hop credits as the exact integer micros 1e6,
    5e5, 333333 (floor(1e6/3), documented) — finite on disconnected
    graphs where closeness centrality degenerates, and the hop bound
    is the standard large-graph truncation. Top-10 by (centrality
    desc, vertex asc) with the per-hop neighbor counts.

    Scale: three bounded expansions on the memoized support-pruned
    edge list; level k joins level k-1 pairs with the symmetric edges
    and anti-joins everything nearer — pair fan-out is bounded by the
    3-hop ball, not |V|²."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=True)
    )
    d1 = sym
    step = (
        d1.alias("p")
        .join(sym.alias("s"), F.col("p.v") == F.col("s.u"))
        .select(F.col("p.u").alias("u"), F.col("s.v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    d2 = step.join(d1, ["u", "v"], "left_anti").localCheckpoint(eager=True)
    step3 = (
        d2.alias("p")
        .join(sym.alias("s"), F.col("p.v") == F.col("s.u"))
        .select(F.col("p.u").alias("u"), F.col("s.v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    d3 = step3.join(d1, ["u", "v"], "left_anti").join(
        d2, ["u", "v"], "left_anti"
    )
    counts = (
        d1.groupBy("u").agg(F.count(F.lit(1)).alias("n1"))
        .join(d2.groupBy("u").agg(F.count(F.lit(1)).alias("n2")), "u", "left")
        .join(d3.groupBy("u").agg(F.count(F.lit(1)).alias("n3")), "u", "left")
        .select(
            "u",
            F.col("n1").cast("long").alias("n1"),
            F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
            F.coalesce("n3", F.lit(0)).cast("long").alias("n3"),
        )
    )
    # top-10 as orderBy+limit (TakeOrderedAndProject per-partition
    # heaps), THEN rank the <=10 survivors — a row_number-then-filter
    # here is a single-task global sort over the vertex grain (the
    # cast-wrapped rank also defeats InferWindowGroupLimit)
    w = Window.orderBy(F.desc("harmonic_micro"), F.asc("vertex"))
    return (
        counts.select(
            F.col("u").alias("vertex"),
            "n1",
            "n2",
            "n3",
            F.expr(_HARM).cast("long").alias("harmonic_micro"),
        )
        .orderBy(F.desc("harmonic_micro"), F.asc("vertex"))
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vertex", "n1", "n2", "n3", "harmonic_micro")
        .orderBy("rank")
    )


# --- T47b: TextRank keywords -------------------------------------------------


def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T47b — TextRank keyword extraction: weighted PageRank on the
    token adjacency graph (undirected edges = adjacent token pairs
    with count ≥ 3; weight = adjacency count). Scores iterate 3
    rounds of s_i = 0.15e6 + Σ_j (s_j·85·w_ji) DIV (100·wdeg_j) from
    the uniform 1e6 start — all BIGINT (the t37 PPR discipline:
    flooring is deterministic and identical on both engines). Top-15
    tokens by (score desc, token asc); the graph-ranking twin of
    TF-IDF that rewards tokens central to the co-occurrence topology
    rather than merely frequent.

    Scale: one bigram-keyed aggregate builds the graph; each round is
    one edge join + one vertex aggregate; the ≥3 prune bounds the
    vertex set before any iteration."""
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
                    "struct(least(element_at(toks, i),"
                    " element_at(toks, i + 1)) AS a,"
                    " greatest(element_at(toks, i),"
                    " element_at(toks, i + 1)) AS b))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg")
    ).select("bg.a", "bg.b")
    edges = (
        occ.filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= _TR_MIN_W)
        .localCheckpoint(eager=True)
    )
    bidir = edges.unionByName(
        edges.select(
            F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
        )
    )
    wdeg = bidir.groupBy("a").agg(F.sum("w").alias("wdeg"))
    score = wdeg.select(
        F.col("a").alias("v"), F.lit(_MICRO).cast("long").alias("s")
    )
    for _ in range(_TR_ROUNDS):
        contrib = (
            bidir.join(wdeg, "a")
            .join(score, F.col("a") == F.col("v"))
            .select(
                F.col("b").alias("v2"),
                F.expr(
                    f"(s * {_TR_DAMP_NUM} * w)"
                    f" DIV ({_TR_DAMP_DEN} * wdeg)"
                ).alias("m"),
            )
        )
        score = (
            wdeg.select(F.col("a").alias("v"))
            .join(
                contrib.groupBy("v2").agg(F.sum("m").alias("inm")),
                F.col("v") == F.col("v2"),
                "left",
            )
            .select(
                "v",
                (
                    F.lit(_TR_BASE) + F.coalesce("inm", F.lit(0))
                ).cast("long").alias("s"),
            )
        )
    # top-15 via orderBy+limit heaps, then rank the survivors (see
    # harmonic_centrality note: rank-then-filter is a single-task sort)
    w10 = Window.orderBy(F.desc("s"), F.asc("v"))
    return (
        score.orderBy(F.desc("s"), F.asc("v"))
        .limit(15)
        .withColumn("rank", F.row_number().over(w10).cast("long"))
        .select(
            "rank",
            F.col("v").alias("token"),
            F.col("s").alias("score_micro"),
        )
        .orderBy("rank")
    )


# --- T47c: exact Shapley multi-touch attribution ------------------------------


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T47c — exact data-driven Shapley attribution: channels are the
    four non-purchase event types (literal bit assignment); each
    user's touch SET becomes a 4-bit mask; v(S) = number of CONVERTED
    users (≥1 purchase) whose touch set ⊆ S (the monotone coalition
    value, v(∅)=0); Shapley credit per channel i =
    Σ_{S'∌i} w(|S'|)·(v(S'∪i) − v(S')) with the n=4 weights as the
    literal micros 1/4→250000, 1/12→83333 (floored, documented). The
    game-theoretically fair division the first/last-touch, position,
    time-decay and Markov removal-effect entries (t19/t21/t23/t30)
    each approximate differently — completing the attribution family
    with its canonical member.

    Scale: ONE user-keyed aggregate; everything after lives on the
    ≤16-row subset lattice (the ⊆-zeta transform is a bitmask join of
    that table with itself)."""
    ev = _events(spark, sf_dir)
    mask_expr = " + ".join(
        f"MAX(CASE WHEN event_type = '{ch}' THEN {bit} ELSE 0 END)"
        for ch, bit in _SHAPLEY_CHANNELS
    )
    per_user = ev.groupBy("user_id").agg(
        F.expr(mask_expr).alias("mask"),
        F.expr(
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv"),
    )
    exact = (
        per_user.filter(F.col("mask") > 0)
        .groupBy("mask")
        .agg(F.sum("conv").cast("long").alias("conv_users"))
    )
    # v(S) over all 16 masks: zeta transform via bitmask-subset join.
    lattice = spark.createDataFrame(
        [(s,) for s in range(16)], "s int"
    )
    v = (
        lattice.join(exact, F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv_users"), F.lit(0)).cast("long").alias("v"))
        .localCheckpoint(eager=True)
    )
    outs = []
    for ch, bit in _SHAPLEY_CHANNELS:
        wo = v.filter(F.expr(f"(s & {bit}) = 0")).select(
            F.col("s").alias("s0"), F.col("v").alias("v0")
        )
        wi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
        marg = wo.join(wi, F.expr(f"s1 = s0 + {bit}")).select(
            F.expr("bit_count(s0)").alias("k"),
            (F.col("v1") - F.col("v0")).alias("dv"),
        )
        wcase = " ".join(
            f"WHEN k = {k} THEN {wgt}" for k, wgt in _SHAPLEY_W.items()
        )
        outs.append(
            marg.agg(
                F.lit(ch).alias("channel"),
                F.sum(F.expr(f"dv * (CASE {wcase} END)"))
                .cast("long")
                .alias("phi_micro"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    vfull = v.filter(F.col("s") == 15).select(
        F.col("v").alias("converted_reachable")
    )
    return out.join(F.broadcast(vfull)).orderBy("channel")


# --- T47d: Gini-impurity feature ranking --------------------------------------

_GINI_FEATURES = (
    ("hour_bucket", "CAST(hour(ts) AS BIGINT) DIV 6"),
    ("weekday", f"CAST(datediff(CAST(ts AS DATE), DATE '{_WD_ANCHOR}') % 7"
                " AS BIGINT)"),
    ("value_sign", "CASE WHEN value > 0 THEN 1 ELSE 0 END"),
)


def gini_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T47d — Gini-impurity feature ranking for the is-purchase
    target: for each candidate feature (hour-of-day quarter, weekday,
    value sign) the weighted post-split Gini impurity
    Σ_b 2·c_b·(n_b−c_b)/(n_b·n), computed as the per-branch exact
    integer term (c_b·(n_b−c_b)) DIV n_b (floor, documented — error
    < 1 per branch), summed, scaled to micro, divided by n once; gain
    = base impurity − weighted impurity. The multi-feature upgrade of
    the t28 entropy stump, in the Gini currency CART actually uses —
    and with per-branch floors instead of per-branch doubles so both
    engines rank identically.

    Scale: one (feature, branch, class) count grid per feature over
    one events scan (the grids union); everything else folds ≤24-row
    aggregates."""
    ev = _events(spark, sf_dir).select(
        "ts",
        "value",
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        ).alias("y"),
    ).localCheckpoint(eager=True)
    tot = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("c"),
    )
    outs = []
    for fname, fexpr in _GINI_FEATURES:
        branches = (
            ev.groupBy(F.expr(fexpr).alias("b"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("nb"),
                F.sum("y").cast("long").alias("cb"),
            )
            .agg(
                F.sum(F.expr("(cb * (nb - cb)) DIV nb"))
                .cast("long")
                .alias("term_sum"),
                F.count(F.lit(1)).cast("long").alias("n_branches"),
            )
        )
        outs.append(
            branches.join(F.broadcast(tot)).select(
                F.lit(fname).alias("feature"),
                "n_branches",
                F.expr("(2000000 * term_sum) DIV n").alias("weighted_gini_micro"),
                F.expr("(2000000 * ((c * (n - c)) DIV n)) DIV n").alias(
                    "base_gini_micro"
                ),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.select(
        "feature",
        "n_branches",
        "base_gini_micro",
        "weighted_gini_micro",
        (F.col("base_gini_micro") - F.col("weighted_gini_micro")).alias(
            "gain_micro"
        ),
    ).orderBy(F.desc("gain_micro"), F.asc("feature"))


QUERIES = {
    "t47_harmonic_centrality": harmonic_centrality,
    "t47_textrank_keywords": textrank_keywords,
    "t47_shapley_attribution": shapley_attribution,
    "t47_gini_feature_ranking": gini_feature_ranking,
}

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

_EDGES_CTE = """
        op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        sym AS (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0
        )
"""

_TR_CTE_ROUNDS = ",".join(
    f"""
    in{r} AS (
        SELECT e.b AS v,
               CAST(SUM((p.s * {_TR_DAMP_NUM} * e.w)
                        // ({_TR_DAMP_DEN} * d.wdeg)) AS BIGINT) AS inm
        FROM bidir e
        JOIN wdeg d ON d.a = e.a
        JOIN s{r - 1} p ON p.v = e.a
        GROUP BY 1
    ),
    s{r} AS (
        SELECT w.a AS v,
               CAST({_TR_BASE} + COALESCE(i.inm, 0) AS BIGINT) AS s
        FROM wdeg w LEFT JOIN in{r} i ON i.v = w.a
    )"""
    for r in range(1, _TR_ROUNDS + 1)
)

_SHAPLEY_WCASE = " ".join(
    f"WHEN k = {k} THEN {wgt}" for k, wgt in _SHAPLEY_W.items()
)
_SHAPLEY_MASK = " + ".join(
    f"MAX(CASE WHEN event_type = '{ch}' THEN {bit} ELSE 0 END)"
    for ch, bit in _SHAPLEY_CHANNELS
)
_SHAPLEY_PHI_ONE = """
        SELECT '{ch}' AS channel,
               CAST(SUM((v1 - v0) * (CASE {wcase} END)) AS BIGINT)
                   AS phi_micro
        FROM (
            SELECT bit_count(w0.s) AS k, w0.v AS v0, w1.v AS v1
            FROM v w0 JOIN v w1 ON w1.s = w0.s + {bit}
            WHERE (w0.s & {bit}) = 0
        )
"""

_GINI_FEATURE_ONE = """
        SELECT '{fname}' AS feature,
               CAST(COUNT(*) AS BIGINT) AS n_branches,
               CAST(SUM(term) AS BIGINT) AS term_sum
        FROM (
            SELECT (cb * (nb - cb)) // nb AS term
            FROM (
                SELECT {fexpr} AS b,
                       CAST(COUNT(*) AS BIGINT) AS nb,
                       CAST(SUM(y) AS BIGINT) AS cb
                FROM ev GROUP BY 1
            )
        )
"""

ORACLE = {
    "t47_harmonic_centrality": f"""
        WITH {_EDGES_CTE},
        d1 AS (SELECT u, v FROM sym),
        d2 AS (
            SELECT DISTINCT p.u, s.v
            FROM d1 p JOIN sym s ON p.v = s.u
            WHERE p.u <> s.v
              AND NOT EXISTS (SELECT 1 FROM d1
                              WHERE d1.u = p.u AND d1.v = s.v)
        ),
        d3 AS (
            SELECT DISTINCT p.u, s.v
            FROM d2 p JOIN sym s ON p.v = s.u
            WHERE p.u <> s.v
              AND NOT EXISTS (SELECT 1 FROM d1
                              WHERE d1.u = p.u AND d1.v = s.v)
              AND NOT EXISTS (SELECT 1 FROM d2 q
                              WHERE q.u = p.u AND q.v = s.v)
        ),
        counts AS (
            SELECT c1.u,
                   CAST(c1.n1 AS BIGINT) AS n1,
                   CAST(COALESCE(c2.n2, 0) AS BIGINT) AS n2,
                   CAST(COALESCE(c3.n3, 0) AS BIGINT) AS n3
            FROM (SELECT u, COUNT(*) AS n1 FROM d1 GROUP BY 1) c1
            LEFT JOIN (SELECT u, COUNT(*) AS n2 FROM d2 GROUP BY 1) c2
                   ON c1.u = c2.u
            LEFT JOIN (SELECT u, COUNT(*) AS n3 FROM d3 GROUP BY 1) c3
                   ON c1.u = c3.u
        )
        SELECT CAST(row_number() OVER (ORDER BY {_HARM} DESC, u ASC)
                    AS BIGINT) AS rank,
               u AS vertex, n1, n2, n3,
               CAST({_HARM} AS BIGINT) AS harmonic_micro
        FROM counts
        QUALIFY rank <= 10
        ORDER BY rank
    """,
    "t47_textrank_keywords": f"""
        WITH t AS (SELECT {_TOKS} AS toks FROM documents),
        occ AS (
            SELECT least(toks[i], toks[i+1]) AS a,
                   greatest(toks[i], toks[i+1]) AS b
            FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
            WHERE len(toks) >= 2
        ),
        e0 AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w
            FROM occ WHERE a <> b GROUP BY 1, 2
            HAVING COUNT(*) >= {_TR_MIN_W}
        ),
        bidir AS (
            SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0
        ),
        wdeg AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wdeg
                 FROM bidir GROUP BY 1),
        s0 AS (SELECT a AS v, CAST({_MICRO} AS BIGINT) AS s FROM wdeg),
        {_TR_CTE_ROUNDS}
        SELECT CAST(row_number() OVER (ORDER BY s DESC, v ASC) AS BIGINT)
                   AS rank,
               v AS token, s AS score_micro
        FROM s{_TR_ROUNDS}
        QUALIFY rank <= 15
        ORDER BY rank
    """,
    "t47_shapley_attribution": f"""
        WITH per_user AS (
            SELECT user_id,
                   {_SHAPLEY_MASK} AS mask,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY 1
        ),
        exact AS (
            SELECT mask, CAST(SUM(conv) AS BIGINT) AS conv_users
            FROM per_user WHERE mask > 0 GROUP BY 1
        ),
        lattice AS (SELECT UNNEST(generate_series(0, 15)) AS s),
        v AS (
            SELECT s, CAST(COALESCE(SUM(conv_users), 0) AS BIGINT) AS v
            FROM lattice LEFT JOIN exact ON (mask & s) = mask
            GROUP BY 1
        ),
        phi AS (
            {" UNION ALL ".join(
                _SHAPLEY_PHI_ONE.format(
                    ch=ch, bit=bit, wcase=_SHAPLEY_WCASE
                )
                for ch, bit in _SHAPLEY_CHANNELS
            )}
        )
        SELECT channel, phi_micro,
               (SELECT v FROM v WHERE s = 15) AS converted_reachable
        FROM phi ORDER BY channel
    """,
    "t47_gini_feature_ranking": f"""
        WITH ev AS (
            SELECT ts, value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS c
            FROM ev
        ),
        feats AS (
            {" UNION ALL ".join(
                _GINI_FEATURE_ONE.format(
                    fname=fname,
                    fexpr=fexpr.replace(
                        "datediff(CAST(ts AS DATE), DATE '" + _WD_ANCHOR
                        + "')",
                        "datediff('day', DATE '" + _WD_ANCHOR
                        + "', CAST(ts AS DATE))",
                    ).replace(" DIV ", " // "),
                )
                for fname, fexpr in _GINI_FEATURES
            )}
        )
        SELECT feature, n_branches,
               CAST((2000000 * ((c * (n - c)) // n)) // n AS BIGINT)
                   AS base_gini_micro,
               CAST((2000000 * term_sum) // n AS BIGINT)
                   AS weighted_gini_micro,
               CAST((2000000 * ((c * (n - c)) // n)) // n
                    - (2000000 * term_sum) // n AS BIGINT) AS gain_micro
        FROM feats CROSS JOIN tot
        ORDER BY gain_micro DESC, feature ASC
    """,
}

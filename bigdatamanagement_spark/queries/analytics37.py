"""Modularity / transitivity / winsorization-sweep / mix-entropy-trend
pack (T55): Newman modularity Q of the label-propagation communities
(the QUALITY score the t26 community detector was missing — are these
partitions better than chance?), global graph transitivity
(3·triangles/wedges — the whole-graph face of the t44 local
clustering coefficients), a winsorization-level sensitivity sweep
(1%/5%/10% trimmed means from ONE sorted pass — the robustness knob
audit for the t20 winsorized mean), and the weekly brand-mix entropy
trend (is the sales mix concentrating or diversifying — an OLS slope
over per-week floored micro-nat entropies).

Reference anchors (SURVEY §2): modularity/transitivity read the
memoized co-purchase substrate (analytics7); the sweep extends the
t20 winsorized-mean convention; the entropy trend composes the
t19 entropy discipline with the t30 elasticity OLS.

Scale notes (100 TB):
- modularity: 2 LP rounds (the t26 construction) + one same-label
  edge count + one per-community degree aggregate; Q is ONE shared
  expression over three exact BIGINTs (e_in, m, Σ D_c²).
- transitivity: wedges fold from the degree table (Σ d(d−1)/2);
  triangles reuse the oriented wedge-close join; the ratio is one
  shared expression.
- sweep: one value-sorted rank pass; all three levels' fences are
  rank picks on it and the clamped sums are CASE folds over the same
  rows.
- entropy trend: one (week, brand) aggregate; per-week entropies
  floor to micro-nats; the slope is exact-moment OLS on ≤|weeks|
  rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000
_LPA_ROUNDS = 2
_WINS_LEVELS = (1, 5, 10)  # percent, two-sided


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T55a: Newman modularity of the LP communities --------------------------------

_Q_MOD = (
    "(CAST(e_in AS DOUBLE) / CAST(m AS DOUBLE)"
    " - CAST(sum_d2 AS DOUBLE)"
    " / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))"
)


def modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T55a — Newman modularity Q of the 2-round label-propagation
    partition of the co-purchase graph: Q = e_in/m − Σ_c (D_c/2m)²
    from three exact BIGINTs (within-community edge count, edge
    count, Σ of squared community degree totals) through ONE shared
    expression. Q ≈ 0 means the t26 communities are no better than a
    random cut; Q ≳ 0.3 means real modular structure — the acceptance
    test community detection owes its user.

    Scale: the LP rounds are the t26 construction (edge-to-label join
    + argmax per round) on the memoized edge list; the Q moments are
    two keyed aggregates."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = (
        bidir.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
        .localCheckpoint()
    )
    for _ in range(_LPA_ROUNDS):
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
                        (-F.col("cnt")).alias("neg"),
                        F.col("label").alias("l"),
                    )
                )
                .getField("l")
                .alias("label")
            )
            .localCheckpoint()
        )
    la = labels.select(
        F.col("v").alias("a"), F.col("label").alias("la")
    )
    lb = labels.select(F.col("v").alias("b"), F.col("label").alias("lb"))
    e_in = (
        edges.join(la, "a")
        .join(lb, "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(
                F.when(F.col("la") == F.col("lb"), 1).otherwise(0)
            )
            .cast("long")
            .alias("e_in"),
        )
    )
    deg = bidir.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    dsum = (
        deg.join(labels, "v")
        .groupBy("label")
        .agg(F.sum("d").cast("long").alias("dc"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum(F.col("dc") * F.col("dc")).cast("long").alias("sum_d2"),
        )
    )
    return e_in.join(dsum).select(
        "m", "e_in", "n_communities", "sum_d2",
        F.expr(_Q_MOD).alias("modularity_q"),
    )


# --- T55b: global transitivity ------------------------------------------------------

_TRANSITIVITY = (
    "(CASE WHEN n_wedges > 0 THEN"
    " 3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)"
    " ELSE 0.0 END)"
)


def graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T55b — global transitivity of the co-purchase graph:
    3·triangles / wedges — the probability that two co-purchase
    neighbors of the same part are themselves co-purchased, as one
    whole-graph number (the global face of the t44 per-vertex
    clustering coefficients; ≈ their degree-weighted mean). Wedges
    fold from the degree table (Σ d(d−1)/2, exact); triangles via the
    oriented wedge-close join (each counted once).

    Scale: one degree aggregate + the standard two-join triangle
    enumeration on the memoized support-pruned edge list."""
    from bigdatamanagement_spark.queries.analytics7 import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    bidir = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = bidir.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    wedges = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.sum(F.expr("(d * (d - 1)) DIV 2")).cast("long").alias("n_wedges"),
    )
    tri = (
        edges.alias("e1")
        .join(
            edges.alias("e2"), F.col("e1.b") == F.col("e2.a")
        )
        .join(
            edges.alias("e3"),
            (F.col("e1.a") == F.col("e3.a"))
            & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        wedges.join(tri)
        .join(n_edges)
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(_TRANSITIVITY).alias("transitivity"),
        )
    )


# --- T55c: winsorization-level sweep ---------------------------------------------------


def winsorization_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T55c — winsorized-mean sensitivity to the trim level: the
    purchase-value mean winsorized at 1%/5%/10% (two-sided), all
    three from ONE value-sorted rank pass — fences are exact
    ceil(p·n)/floor((1−p)·n)+1-style rank picks (the t20 convention:
    lo fence = value at rank ceil(p·n), hi fence = value at rank
    n+1−ceil(p·n)), and each level's clamped sum folds as a CASE over
    the same rows. A mean that swings across levels is tail-driven;
    a flat sweep certifies the 5% convention.

    Scale: a two-phase distributed global rank (rank.global_row_number
    — range-repartition + broadcast offsets, no single-partition
    window) on the value projection; n is a driver scalar the rank
    pass already produced, so each level's fence ranks are exact
    integer literals; the sweep is one reduce with three CASE folds."""
    from bigdatamanagement_spark.operators.rank import global_row_number

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    vals = ev.select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("x"),
        "event_id",
    )
    ranked_df, n = global_row_number(
        vals, [F.col("x"), F.col("event_id")], "rk"
    )
    ranked = ranked_df.localCheckpoint(eager=True)
    outs = []
    for p in _WINS_LEVELS:
        # exact integer ceil(p * n / 100); the value at a given rank in
        # sorted order is tie-invariant, so tie placement is immaterial
        klo = (p * n + 99) // 100
        fences = ranked.filter(
            (F.col("rk") == klo) | (F.col("rk") == n + 1 - klo)
        ).agg(
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        outs.append(
            ranked.join(F.broadcast(fences))
            .agg(
                F.lit(p).cast("long").alias("level_pct"),
                F.lit(n).cast("long").alias("n"),
                F.min("lo").cast("long").alias("lo_cents"),
                F.min("hi").cast("long").alias("hi_cents"),
                F.sum(
                    F.expr("greatest(least(x, hi), lo)")
                ).cast("long").alias("wins_sum"),
            )
            .select(
                "level_pct",
                "n",
                "lo_cents",
                "hi_cents",
                F.expr("wins_sum DIV n").alias("wins_mean_cents"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("level_pct")


# --- T55d: brand-mix entropy trend -------------------------------------------------------

_ENT_SLOPE = (
    "(CAST(nw * sxy - sx * sy AS DOUBLE)"
    " / CAST(nw * sxx - sx * sx AS DOUBLE))"
)


def brand_mix_entropy_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T55d — weekly brand-mix entropy trend: per week the Shannon
    entropy of the brand quantity shares (per-brand term floored to
    micro-nats from exact counts — the t19 entropy discipline), then
    the OLS slope of entropy over week index (exact BIGINT moments) —
    negative slope = the sales mix is CONCENTRATING (assortment risk
    rising), positive = diversifying. One row: weeks, mean entropy,
    slope (micro-nats/week), plus the first/last week entropies for
    orientation.

    Scale: one (week, brand) aggregate; entropies and the fit live on
    the ≤|weeks| grid."""
    t = load_testdata(
        spark, sf_dir, tables=("lineitem", "part"), register=False
    )
    wb = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.expr("CAST(weekofyear(l_shipdate) AS BIGINT)").alias("wk"),
            "p_brand",
        )
        .agg(F.expr("CAST(SUM(l_quantity) AS BIGINT)").alias("q"))
    )
    wtot = wb.groupBy("wk").agg(F.sum("q").alias("qt"))
    ent = (
        wb.join(F.broadcast(wtot), "wk")
        .select(
            "wk",
            F.expr(
                "CAST(floor(-1000000.0 * (CAST(q AS DOUBLE)"
                " / CAST(qt AS DOUBLE))"
                " * ln(CAST(q AS DOUBLE) / CAST(qt AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("term"),
        )
        .groupBy("wk")
        .agg(F.sum("term").cast("long").alias("h_micro"))
        .localCheckpoint(eager=True)
    )
    mom = ent.agg(
        F.count(F.lit(1)).cast("long").alias("nw"),
        F.sum("wk").cast("long").alias("sx"),
        F.sum("h_micro").cast("long").alias("sy"),
        F.sum(F.col("wk") * F.col("wk")).cast("long").alias("sxx"),
        F.sum(F.col("wk") * F.col("h_micro")).cast("long").alias("sxy"),
    )
    first_last = ent.agg(
        F.min(F.struct("wk", "h_micro")).getField("h_micro").alias(
            "first_week_h"
        ),
        F.max(F.struct("wk", "h_micro")).getField("h_micro").alias(
            "last_week_h"
        ),
    )
    return mom.join(first_last).select(
        "nw",
        F.expr("sy DIV nw").alias("mean_h_micro"),
        F.expr(_ENT_SLOPE).alias("slope_micro_per_week"),
        "first_week_h",
        "last_week_h",
    )


QUERIES = {
    "t55_modularity_score": modularity_score,
    "t55_graph_transitivity": graph_transitivity,
    "t55_winsorization_sweep": winsorization_sweep,
    "t55_brand_mix_entropy_trend": brand_mix_entropy_trend,
}

_EDGES_CTE = """
        op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        bidir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)
"""

_LPA_SQL = ",".join(
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
    )"""
    for r in range(1, _LPA_ROUNDS + 1)
)

_WINS_ONE = """
        SELECT CAST({p} AS BIGINT) AS level_pct,
               MAX(n) AS n,
               MIN(lo) AS lo_cents,
               MIN(hi) AS hi_cents,
               CAST(SUM(greatest(least(x, hi), lo)) AS BIGINT) // MAX(n)
                   AS wins_mean_cents
        FROM ranked CROSS JOIN (
            SELECT MIN(x) AS lo, MAX(x) AS hi
            FROM ranked
            WHERE rk = CAST(ceil({p} * n / 100.0) AS BIGINT)
               OR rk = n + 1 - CAST(ceil({p} * n / 100.0) AS BIGINT)
        )
"""

ORACLE = {
    "t55_modularity_score": f"""
        WITH {_EDGES_CTE},
        l0 AS (SELECT DISTINCT a AS v, a AS label FROM bidir),
        {_LPA_SQL},
        ein AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(CASE WHEN la.label = lb.label THEN 1 ELSE 0
                        END) AS BIGINT) AS e_in
            FROM e0
            JOIN l{_LPA_ROUNDS} la ON la.v = e0.a
            JOIN l{_LPA_ROUNDS} lb ON lb.v = e0.b
        ),
        deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d
                FROM bidir GROUP BY 1),
        dsum AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                   CAST(SUM(dc * dc) AS BIGINT) AS sum_d2
            FROM (
                SELECT l.label, CAST(SUM(deg.d) AS BIGINT) AS dc
                FROM deg JOIN l{_LPA_ROUNDS} l ON l.v = deg.v
                GROUP BY 1
            )
        )
        SELECT m, e_in, n_communities, sum_d2, {_Q_MOD} AS modularity_q
        FROM ein CROSS JOIN dsum
    """,
    "t55_graph_transitivity": f"""
        WITH {_EDGES_CTE},
        deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d
                FROM bidir GROUP BY 1),
        wedges AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
                   CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
            FROM deg
        ),
        tri AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM e0 e1
            JOIN e0 e2 ON e1.b = e2.a
            JOIN e0 e3 ON e1.a = e3.a AND e2.b = e3.b
        ),
        ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e0)
        SELECT n_vertices, n_edges, n_wedges, n_triangles,
               {_TRANSITIVITY} AS transitivity
        FROM wedges CROSS JOIN tri CROSS JOIN ne
    """,
    "t55_winsorization_sweep": f"""
        WITH ranked AS (
            SELECT x,
                   CAST(row_number() OVER (ORDER BY x, event_id)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM (
                SELECT CAST(round(value * 100, 0) AS BIGINT) AS x, event_id
                FROM events WHERE event_type = 'purchase'
            )
        )
        {" UNION ALL ".join(
            _WINS_ONE.format(p=p) for p in _WINS_LEVELS
        )}
        ORDER BY level_pct
    """,
    "t55_brand_mix_entropy_trend": f"""
        WITH wb AS (
            SELECT CAST(weekofyear(l_shipdate) AS BIGINT) AS wk, p_brand,
                   CAST(SUM(l_quantity) AS BIGINT) AS q
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
        ),
        wtot AS (SELECT wk, CAST(SUM(q) AS BIGINT) AS qt
                 FROM wb GROUP BY 1),
        ent AS (
            SELECT wk,
                   CAST(SUM(CAST(floor(-1000000.0
                       * (CAST(q AS DOUBLE) / CAST(qt AS DOUBLE))
                       * ln(CAST(q AS DOUBLE) / CAST(qt AS DOUBLE)))
                       AS BIGINT)) AS BIGINT) AS h_micro
            FROM wb JOIN wtot USING (wk)
            GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nw,
                   CAST(SUM(wk) AS BIGINT) AS sx,
                   CAST(SUM(h_micro) AS BIGINT) AS sy,
                   CAST(SUM(wk * wk) AS BIGINT) AS sxx,
                   CAST(SUM(wk * h_micro) AS BIGINT) AS sxy
            FROM ent
        ),
        fl AS (
            SELECT min_by(h_micro, wk) AS first_week_h,
                   max_by(h_micro, wk) AS last_week_h
            FROM ent
        )
        SELECT nw, sy // nw AS mean_h_micro,
               {_ENT_SLOPE} AS slope_micro_per_week,
               first_week_h, last_week_h
        FROM mom CROSS JOIN fl
    """,
}

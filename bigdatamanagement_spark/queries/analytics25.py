"""Rank-correlation / vocabulary-drift / optimizer-audit /
sensitivity pack (T43): Kendall's tau-b between daily click and
purchase counts (exact concordant/discordant/tie counts), out-of-
vocabulary drift of each document source between history halves, a
join-cardinality-estimator audit (the textbook |A||B|/max(d_A,d_B)
formula vs the true join size, per join), and a windowFunnel
sensitivity sweep across conversion windows.

Reference anchors (SURVEY §2): tau-b completes the correlation family
(Pearson t18/t29, Spearman t21) with the rank-concordance member;
OOV drift is the freshness metric for the documents pipeline the ext
pack curates; the cardinality audit turns the engine's OWN
optimizer-statistics formula on the reference's join shapes
(`AmazonRedshift.java:465-535`); the sweep quantifies how the t28
windowFunnel's answer depends on its one parameter.

Scale notes (100 TB):
- tau-b: pairs enumerate on the DAY grain (435 pairs at 30 days);
  concordance is pure integer sign arithmetic.
- OOV: two half-vocabulary aggregates + one anti-join per source.
- cardinality audit: distinct counts + true sizes are single
  aggregates per join; the estimate is one shared expression.
- sweep: the three conditional-min aggregates run ONCE; the four
  windows evaluate as CASE columns over the same (t1, t2, t3) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata
from bigdatamanagement_spark.operators.text import tokens

_FUNNEL_WINDOWS_US = (
    60_000_000,
    600_000_000,
    3_600_000_000,
    86_400_000_000,
)
_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


_TAU_B = (
    "(CAST(nc - nd AS DOUBLE)"
    " / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)))"
)


def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T43a — Kendall's tau-b between daily click and purchase
    counts: concordant/discordant/tied pair counts over the day-grain
    series (exact integer sign arithmetic on the 435 day pairs), the
    tie-corrected tau-b through ONE shared expression — the rank-
    concordance member of the correlation family that is robust to
    any monotone transform of either series.

    Scale: pairs enumerate the day grain, never events; at 10x the
    days this is still thousands of integer comparisons."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("y"),
        )
        .localCheckpoint()
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        F.signum(F.col("xb") - F.col("xa")).cast("long").alias("sx"),
        F.signum(F.col("yb") - F.col("ya")).cast("long").alias("sy"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("sx") * F.col("sy") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.sum(F.when(F.col("sx") * F.col("sy") == -1, 1).otherwise(0))
        .cast("long")
        .alias("nd"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0))
        .cast("long")
        .alias("tx"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ty"),
    )
    return agg.select(
        "n0", "nc", "nd", "tx", "ty", F.expr(_TAU_B).alias("tau_b")
    )


def oov_vocabulary_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T43b — out-of-vocabulary drift per source: the share of
    second-half token OCCURRENCES whose token never appeared in the
    source's first half (halves by doc_id parity — deterministic,
    documented), in exact micro (oov_tokens * 1e6 DIV total) — the
    training-data freshness metric that says how fast each source's
    language moves.

    Scale: two (source, token) vocabulary aggregates + one anti-join;
    everything stays on the token-type grain until the final count."""
    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    tok = d.select(
        "source",
        (F.col("doc_id") % 2).alias("h"),
        F.explode(tokens(F.col("text"))).alias("t"),
    )
    first_vocab = (
        tok.filter(F.col("h") == 0).select("source", "t").distinct()
    )
    second = tok.filter(F.col("h") == 1).groupBy("source", "t").agg(
        F.count(F.lit(1)).alias("c")
    )
    oov = second.join(first_vocab, ["source", "t"], "left_anti")
    tot = second.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_second_tokens")
    )
    oov_agg = oov.groupBy("source").agg(
        F.sum("c").cast("long").alias("oov_tokens"),
        F.count(F.lit(1)).cast("long").alias("oov_types"),
    )
    return (
        tot.join(oov_agg, "source", "left")
        .select(
            "source",
            "n_second_tokens",
            F.coalesce(F.col("oov_tokens"), F.lit(0)).alias("oov_tokens"),
            F.coalesce(F.col("oov_types"), F.lit(0)).alias("oov_types"),
            F.expr(
                f"(COALESCE(oov_tokens, 0) * {_MICRO})"
                " DIV n_second_tokens"
            ).alias("oov_micro"),
        )
        .orderBy("source")
    )


_CARD_EST = (
    "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    " / CAST(GREATEST(da, db) AS DOUBLE))"
)


def cardinality_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T43c — join-cardinality-estimator audit: for the engine's three
    workhorse equi-joins (lineitem-orders, orders-customer,
    lineitem-part), the textbook estimate |A|*|B|/max(ndv_A, ndv_B)
    vs the TRUE join size, with the signed error ratio — the
    optimizer-statistics sanity check a 100 TB planner lives or dies
    by (a PK-FK join should land exactly; skew shows up as
    under-estimation). Counts exact; estimate/ratio are shared
    expressions.

    Scale: per join two count-distinct aggregates + one true-size
    count — statistics collection, not a data explosion."""
    t = load_testdata(
        spark,
        sf_dir,
        tables=("lineitem", "orders", "customer", "part"),
        register=False,
    )
    specs = [
        ("lineitem_orders", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
        ("orders_customer", t["orders"], "o_custkey", t["customer"], "c_custkey"),
        ("lineitem_part", t["lineitem"], "l_partkey", t["part"], "p_partkey"),
    ]
    outs = []
    for name, ta, ka, tb, kb in specs:
        sa = ta.agg(
            F.count(F.lit(1)).cast("long").alias("na"),
            F.countDistinct(ka).cast("long").alias("da"),
        )
        sb = tb.agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.countDistinct(kb).cast("long").alias("db"),
        )
        true = (
            ta.select(F.col(ka).alias("k"))
            .join(tb.select(F.col(kb).alias("k")), "k")
            .agg(F.count(F.lit(1)).cast("long").alias("true_rows"))
        )
        outs.append(
            sa.join(sb)
            .join(true)
            .select(
                F.lit(name).alias("join_name"),
                "na",
                "nb",
                "da",
                "db",
                "true_rows",
                F.expr(_CARD_EST).alias("est_rows"),
                F.expr(
                    f"({_CARD_EST}) / CAST(true_rows AS DOUBLE)"
                ).alias("est_over_true"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("join_name")


def window_funnel_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T43d — windowFunnel sensitivity sweep: the t28 signup -> click
    -> purchase funnel evaluated at four conversion windows (1m, 10m,
    1h, 1d) — the three conditional-min aggregates run ONCE and the
    four windows read the same (t1, t2, t3) rows as CASE columns, so
    the sweep costs one extra projection, not four funnels. Output:
    per window the users reaching step 2 and step 3 — how much the
    funnel's answer is an artifact of its one parameter.

    Scale: identical exchanges to the single-window funnel."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", us.alias("us")
    )
    t1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    steps = (
        t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
        .localCheckpoint()
    )
    outs = []
    for w_us in _FUNNEL_WINDOWS_US:
        outs.append(
            steps.agg(
                F.lit(w_us // 1_000_000).cast("long").alias("window_s"),
                F.count(F.lit(1)).cast("long").alias("n_step1"),
                F.sum(
                    F.when(
                        F.col("t2").isNotNull()
                        & (F.col("t2") - F.col("t1") <= w_us),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_step2"),
                F.sum(
                    F.when(
                        F.col("t3").isNotNull()
                        & (F.col("t3") - F.col("t1") <= w_us),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_step3"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("window_s")


QUERIES = {
    "t43_kendall_tau_daily": kendall_tau_daily,
    "t43_oov_vocabulary_drift": oov_vocabulary_drift,
    "t43_cardinality_audit": cardinality_estimator_audit,
    "t43_window_funnel_sensitivity": window_funnel_sensitivity,
}

_CARD_ORACLE_ONE = """
        SELECT '{name}' AS join_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {ta}) AS na,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {tb}) AS nb,
               (SELECT CAST(COUNT(DISTINCT {ka}) AS BIGINT) FROM {ta}) AS da,
               (SELECT CAST(COUNT(DISTINCT {kb}) AS BIGINT) FROM {tb}) AS db,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM {ta} JOIN {tb} ON {ka} = {kb}) AS true_rows
"""

ORACLE = {
    "t43_kendall_tau_daily": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS x,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS y
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY 1
        ),
        pairs AS (
            SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sx,
                   CAST(sign(b.y - a.y) AS BIGINT) AS sy
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS nc,
                   CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS nd,
                   CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS tx,
                   CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS ty
            FROM pairs
        )
        SELECT n0, nc, nd, tx, ty, {_TAU_B} AS tau_b FROM agg
    """,
    "t43_oov_vocabulary_drift": f"""
        WITH tok AS (
            SELECT source, doc_id % 2 AS h,
                   UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS t
            FROM documents
        ),
        first_vocab AS (
            SELECT DISTINCT source, t FROM tok WHERE h = 0
        ),
        second AS (
            SELECT source, t, COUNT(*) AS c FROM tok WHERE h = 1
            GROUP BY 1, 2
        ),
        oov AS (
            SELECT s.source, s.t, s.c FROM second s
            WHERE NOT EXISTS (
                SELECT 1 FROM first_vocab f
                WHERE f.source = s.source AND f.t = s.t
            )
        ),
        tot AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_second_tokens
            FROM second GROUP BY 1
        ),
        oa AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS oov_tokens,
                   CAST(COUNT(*) AS BIGINT) AS oov_types
            FROM oov GROUP BY 1
        )
        SELECT t.source, t.n_second_tokens,
               CAST(COALESCE(oa.oov_tokens, 0) AS BIGINT) AS oov_tokens,
               CAST(COALESCE(oa.oov_types, 0) AS BIGINT) AS oov_types,
               CAST((COALESCE(oa.oov_tokens, 0) * {_MICRO})
                    // t.n_second_tokens AS BIGINT) AS oov_micro
        FROM tot t LEFT JOIN oa ON t.source = oa.source
        ORDER BY t.source
    """,
    "t43_cardinality_audit": f"""
        WITH one AS ({_CARD_ORACLE_ONE.format(
            name="lineitem_orders", ta="lineitem", ka="l_orderkey",
            tb="orders", kb="o_orderkey")}),
        two AS ({_CARD_ORACLE_ONE.format(
            name="orders_customer", ta="orders", ka="o_custkey",
            tb="customer", kb="c_custkey")}),
        three AS ({_CARD_ORACLE_ONE.format(
            name="lineitem_part", ta="lineitem", ka="l_partkey",
            tb="part", kb="p_partkey")}),
        allj AS (
            SELECT * FROM one UNION ALL SELECT * FROM two
            UNION ALL SELECT * FROM three
        )
        SELECT join_name, na, nb, da, db, true_rows,
               {_CARD_EST} AS est_rows,
               ({_CARD_EST}) / CAST(true_rows AS DOUBLE) AS est_over_true
        FROM allj ORDER BY join_name
    """,
    "t43_window_funnel_sensitivity": f"""
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        ),
        t1 AS (
            SELECT user_id, MIN(us) AS t1 FROM ev
            WHERE event_type = 'signup' GROUP BY 1
        ),
        t2 AS (
            SELECT e.user_id, MIN(e.us) AS t2
            FROM ev e JOIN t1 USING (user_id)
            WHERE e.event_type = 'click' AND e.us > t1.t1 GROUP BY 1
        ),
        t3 AS (
            SELECT e.user_id, MIN(e.us) AS t3
            FROM ev e JOIN t2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.us > t2.t2 GROUP BY 1
        ),
        steps AS (
            SELECT t1.user_id, t1.t1, t2.t2, t3.t3
            FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
        ),
        windows AS (
            SELECT UNNEST([{", ".join(str(w) for w in _FUNNEL_WINDOWS_US)}])
                       AS w_us
        )
        SELECT CAST(w_us // 1000000 AS BIGINT) AS window_s,
               CAST(COUNT(*) AS BIGINT) AS n_step1,
               CAST(SUM(CASE WHEN t2 IS NOT NULL AND t2 - t1 <= w_us
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_step2,
               CAST(SUM(CASE WHEN t3 IS NOT NULL AND t3 - t1 <= w_us
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_step3
        FROM steps CROSS JOIN windows
        GROUP BY 1 ORDER BY 1
    """,
}

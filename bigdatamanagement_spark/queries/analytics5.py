"""Schema-discovery & BI-rollup pack (T22): functional-dependency
profiling (the schema-inference op a data catalog runs over unknown
tables) and hierarchical percent-of-parent revenue shares (the BI
drill-down classic).

Reference anchors (SURVEY §2): the reference DECLARES its dependencies
in DDL (`Assignment 6/src/AmazonRedshift.java:119-206` PKs/FKs,
`Assignment 3/.../SQLonRDS.java:116-137` composite PK + FK) but never
verifies or discovers them; the FD profiler turns that declared-only
metadata into measured structure. The share rollup generalizes the
grouped SUM + ORDER BY family (`AmazonRedshift.java:499-509`).

Scale notes (100 TB):
- FD profile: each candidate FD costs one determinant-keyed aggregate
  (count_distinct of the dependent with map-side partials); the
  candidates run as a union of tiny (1-row) summaries — no row ever
  leaves its aggregate. At catalog scale you'd run the same shape per
  column pair from a sampled prefix first, then confirm survivors
  exactly.
- hierarchy shares: the region→nation→customer rollup reuses ONE
  bottom-level aggregate; parent totals derive from it (never a
  second fact scan) and join back broadcast (|nations| rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata

_FD_CANDIDATES = (
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_orderkey", "l_shipdate"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
)


def fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22a — functional-dependency profile: for each candidate FD
    det → dep, the determinant-key count, how many keys VIOLATE the
    dependency (map to >1 dependent value), the violation share in bp,
    and the worst key's dependent-value count. o_orderkey →
    o_orderstatus must hold exactly (PK); the rest measure how far
    real data is from the dependencies a schema designer might assume
    — the discovery side of the DDL the reference only declares.

    Scale: one determinant-keyed count_distinct aggregate per
    candidate, folded to a 1-row summary each; the union is
    |candidates| rows."""
    tables = load_testdata(
        spark, sf_dir, tables=("lineitem", "orders"), register=False
    )
    outs = []
    for tbl, det, dep in _FD_CANDIDATES:
        per_key = (
            tables[tbl]
            .groupBy(det)
            .agg(F.count_distinct(dep).alias("nd"))
        )
        outs.append(
            per_key.agg(
                F.lit(f"{tbl}.{det}->{dep}").alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.expr(
                    "(10000 * sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)) div count(1)"
                ).alias("viol_bp"),
                F.max("nd").cast("long").alias("max_dep_values"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.orderBy("fd")


def revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22b — percent-of-parent revenue rollup over the geography
    hierarchy: per nation, its revenue (exact cents), its share of its
    region (bp) and of the world (bp), plus region totals carried on
    the row — the drill-down table a BI layer materializes once and
    slices everywhere.

    Scale: ONE fact aggregate at the finest grain (nation); region and
    world totals re-aggregate the nation-level output, never the fact table;
    dimension joins broadcast."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "customer", "nation", "region"), register=False
    )
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    nat = (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(F.sum(cents).alias("rev_cents"))
        .join(
            F.broadcast(
                t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("r_name", "n_name", "rev_cents")
        # materialized once: reg/world re-aggregate THIS 25-row output,
        # not the fact table (without it each branch re-runs the join)
        .localCheckpoint()
    )
    reg = nat.groupBy("r_name").agg(F.sum("rev_cents").alias("region_cents"))
    world = nat.agg(F.sum("rev_cents").alias("world_cents"))
    return (
        nat.join(F.broadcast(reg), "r_name")
        .join(F.broadcast(world))
        .select(
            "r_name",
            "n_name",
            "rev_cents",
            "region_cents",
            F.expr("(10000 * rev_cents) div region_cents").alias("region_share_bp"),
            F.expr("(10000 * rev_cents) div world_cents").alias("world_share_bp"),
        )
        .orderBy("r_name", "n_name")
    )


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22c — backtest of the seasonal-naive forecaster (predict each
    day's event volume per type as the SAME WEEKDAY's volume one week
    earlier): per type the evaluated days, exact mean absolute error,
    and mean signed bias (both floor-divided). The baseline every real
    forecaster must beat — if a model can't out-predict lag-7, it
    ships nothing. Dense day grid so calendar gaps are forecast (as
    zero) and scored like any other day.

    Scale: daily counts are a tiny (type, day) aggregate; lag-7 rides
    the type-keyed window over |types|·|days| rows."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].select("event_type", F.to_date("ts").alias("day"))
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    span = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = (
        ev.select("event_type")
        .distinct()
        .join(F.broadcast(span))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    dense = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("day")
    scored = dense.select(
        "event_type", "x", F.lag("x", 7).over(w).alias("f")
    ).filter(F.col("f").isNotNull())
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr("sum(abs(x - f)) div count(1)").alias("mae_floor"),
            F.sum(F.col("x") - F.col("f")).cast("long").alias("bias_sum"),
        )
        .orderBy("event_type")
    )


def ltv_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22d — LTV cohort triangle: users cohorted by the month of
    their first event; each (cohort_month, months_since) cell reports
    active users and exact micro revenue (purchase values) — the
    layout every lifetime-value model reads its retention curves
    from.

    Scale: the cohort assignment is one user-keyed min aggregate on
    the shared behavioral exchange, broadcast back onto the fact scan
    (users ≪ events); the triangle is |cohorts|·|ages| rows."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].select(
        "user_id",
        F.trunc(F.to_date("ts"), "MM").alias("m"),
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)"),
        )
        .otherwise(0)
        .alias("rev"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("m").alias("cohort_month"))
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_month",
            F.expr(
                "CAST(months_between(m, cohort_month) AS INT)"
            ).alias("months_since"),
        )
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_active"),
            F.sum("rev").cast("long").alias("rev_micro"),
        )
        .orderBy("cohort_month", "months_since")
    )


def duplicate_charge_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22e — duplicate-charge screen (the idempotency/fraud audit):
    purchases by the same user for the same exact amount within 5
    minutes of each other. One row: suspect pair count, users
    involved, and the tightest repeat interval. Catches both retry
    bugs (double-submit) and card-testing patterns.

    Scale: NO self-join — duplicates are adjacent in the
    (user, amount)-partitioned ts order, so one lag window over that
    composite key finds every pair; the shuffle key is (user, amount),
    bounding each partition to one user's repeats of one amount."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("v"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "v").orderBy("us", "event_id")
    gaps = ev.select(
        "user_id",
        (F.col("us") - F.lag("us").over(w)).alias("gap_us"),
    ).filter(F.col("gap_us") <= 5 * 60 * 1_000_000)
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_suspect_pairs"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.min("gap_us").cast("long").alias("tightest_gap_us"),
    )


def invoice_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22f — cross-table arithmetic reconciliation: per order, the
    header total (o_totalprice) against the recomputed line total
    Σ extendedprice·(1−discount)·(1+tax), both in exact cents; output
    the match/mismatch counts and the mismatch-magnitude profile
    (max and total absolute discrepancy). The invoice audit that
    catches partial loads, double-applied discounts, and drifted
    headers — the arithmetic completion of the key-level FK checks in
    queries/quality.py.

    Scale: one orderkey-keyed aggregate over lineitem joined to the
    header scan on the same key — co-partitioned at ingest
    (bucketing), this reconciliation is shuffle-free."""
    t = load_testdata(spark, sf_dir, tables=("orders", "lineitem"), register=False)
    line = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
                    " * 100, 0) AS BIGINT)"
                )
            ).alias("line_cents")
        )
    )
    j = t["orders"].select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("head_cents"),
    ).join(line, "o_orderkey", "left")
    diff = F.abs(F.col("head_cents") - F.coalesce(F.col("line_cents"), F.lit(0)))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("line_cents").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_without_lines"),
        F.sum(F.when(diff == 0, 1).otherwise(0)).cast("long").alias("n_exact"),
        F.max(diff).cast("long").alias("max_diff_cents"),
        F.sum(diff).cast("long").alias("total_diff_cents"),
    )


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — Zipf's-law slope of the corpus unigram distribution: OLS
    of ln(frequency) on ln(rank) over the full vocabulary, one row
    (n_terms, slope_micro, intercept_micro). Healthy natural text
    slopes near −1; flat slopes flag ID/boilerplate corpora — the
    rank-frequency companion of the Heaps vocabulary-growth curve.

    Scale: one term-count aggregate; ranks come from the two-phase
    global row_number (frequency desc, term asc tiebreak — no global
    window); logs are FLOORED to integer micro-nats per term before
    the moment sums (the same cross-engine discipline as the entropy/
    KL queries), so the OLS closed form runs on exact BIGINT sums."""
    from bigdatamanagement_spark.operators import text as T
    from bigdatamanagement_spark.operators.rank import global_row_number

    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    tc = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked, n = global_row_number(tc, [F.desc("c"), F.asc("term")], "r")
    lx = F.expr("CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT)")
    ly = F.expr("CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)")
    m = ranked.select(lx.alias("x"), ly.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # moments cast to double BEFORE the products: n·sxx in BIGINT wraps
    # once the vocabulary passes a few hundred terms (micro-nat scale)
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return m.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope * 1000000.0, 0).cast("long").alias("slope_micro"),
        F.round(syd / nd - slope * sxd / nd, 0)
        .cast("long")
        .alias("intercept_micro"),
    )


_KWIC_TERM = "spark"


def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — keyword-in-context concordance for the term 'spark':
    the top-10 most frequent (previous word, next word) contexts
    across the corpus, with occurrence counts — the collocation view
    a lexicographer (or a prompt-injection hunter) reads. Adjacency
    extraction is pure array arithmetic inside codegen (position
    filter + element_at, no explode of non-matching tokens).

    Scale: per-document work is bounded by matches of the term; the
    aggregate is context-keyed with map-side partials."""
    from bigdatamanagement_spark.operators import text as T

    d = load_testdata(spark, sf_dir, tables=("documents",), register=False)[
        "documents"
    ]
    toks = d.select(T.tokens(F.col("text")).alias("t"))
    ctx = toks.select(
        F.explode(
            F.expr(
                f"transform(filter(sequence(1, size(t)), "
                f"i -> element_at(t, i) = '{_KWIC_TERM}'), "
                "i -> struct("
                "CASE WHEN i > 1 THEN element_at(t, i - 1) ELSE '^' END AS prev,"
                "CASE WHEN i < size(t) THEN element_at(t, i + 1) ELSE '$' END AS next))"
            )
        ).alias("c")
    )
    return (
        ctx.groupBy(F.col("c.prev").alias("prev_word"), F.col("c.next").alias("next_word"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("prev_word"), F.asc("next_word"))
        .limit(10)
    )


def growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22g — growth accounting: every day's active users decomposed
    into NEW (first day ever), RETAINED (also active yesterday) and
    RESURRECTED (returning after a gap), plus how many of the day's
    actives churn (are absent tomorrow) — the DAU ledger every growth
    team reads, with the identity DAU = new + retained + resurrected
    holding exactly by construction.

    Scale: one (user, day) distinct, then a user-keyed lag/lead
    window (the shared behavioral exchange) and one day-keyed
    aggregate — classification is pure arithmetic on adjacent
    activity days."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].select("user_id", F.to_date("ts").alias("day"))
    da = ev.distinct()
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("day")
    tagged = da.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    ).select(
        "day",
        F.when(F.col("prev_day").isNull(), "new")
        .when(F.expr("datediff(day, prev_day) = 1"), "retained")
        .otherwise("resurrected")
        .alias("cls"),
        F.when(
            F.col("next_day").isNull() | F.expr("datediff(next_day, day) > 1"), 1
        )
        .otherwise(0)
        .alias("churns_after"),
    )
    return (
        tagged.groupBy("day")
        .agg(
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0))
            .cast("long")
            .alias("n_resurrected"),
            F.sum("churns_after").cast("long").alias("n_churning_after"),
        )
        .orderBy("day")
    )


def customer_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22h — customer spend-tier migration matrix: orders split into
    two halves at the time midpoint; each customer gets a spend
    quartile (1 = top) within each half, and the matrix counts every
    (tier_h1 → tier_h2) flow, with 'none' rows for customers active in
    only one half. The churn/upsell picture a CRM reads quarterly.

    Scale: each half's quartile comes from the two-phase global
    row_number (custkey tiebreak — deterministic band edges, no global
    window); the matrix join is custkey-keyed; output is ≤ 5×5 rows."""
    from bigdatamanagement_spark.operators.rank import (
        global_row_number,
        quantile_bucket,
    )

    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    o = o.select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
    ).localCheckpoint()
    mid = o.agg(F.expr("(min(us) + max(us)) div 2").alias("m")).first()["m"]

    def half_tiers(df):
        spend = df.groupBy("o_custkey").agg(F.sum("cents").alias("s"))
        ranked, n = global_row_number(
            spend, [F.desc("s"), F.asc("o_custkey")], "r"
        )
        return ranked.select(
            "o_custkey", quantile_bucket("r", n, 4).alias("tier")
        )
    h1 = half_tiers(o.filter(F.col("us") < mid)).withColumnRenamed("tier", "t1")
    h2 = half_tiers(o.filter(F.col("us") >= mid)).withColumnRenamed("tier", "t2")
    return (
        h1.join(h2, "o_custkey", "full_outer")
        .select(
            F.coalesce(F.col("t1").cast("string"), F.lit("none")).alias("tier_h1"),
            F.coalesce(F.col("t2").cast("string"), F.lit("none")).alias("tier_h2"),
        )
        .groupBy("tier_h1", "tier_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("tier_h1", "tier_h2")
    )


_KM_HORIZONS = (7, 14, 30)


def km_repeat_purchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22i — Kaplan-Meier survival of 'time to SECOND purchase' WITH
    right-censoring: users who never repurchase are censored at the
    corpus end instead of dropped (the bias the naive
    time-to-conversion quantiles carry). Per horizon (7/14/30 days):
    users still at risk past it, repeat events within it, and the KM
    log-survival Σ ln(1 − dᵢ/nᵢ) in floored integer micro-nats (the
    product kept cross-engine exact by flooring each term — the same
    discipline as the entropy/KL family; S(t) = exp(x/1e6)).

    Scale: per-user gap/censor flags ride the shared user-keyed
    window; the risk table is |distinct gap days| rows (bounded by the
    corpus span, independent of user count), so the KM fold is tiny."""
    ev = load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ].filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.to_date("ts").alias("day")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("day", "event_id")
    firsts = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.min("day").alias("d1"),
            F.max(F.when(F.col("rn") == 2, F.col("day"))).alias("d2"),
        )
    )
    end = ev.agg(F.max("day").alias("e"))
    subj = (
        firsts.join(F.broadcast(end))
        .select(
            F.when(F.col("d2").isNotNull(), F.expr("datediff(d2, d1)"))
            .otherwise(F.expr("datediff(e, d1)"))
            .alias("t"),
            F.col("d2").isNotNull().cast("long").alias("ev"),
        )
        # materialized once: the count action and the risk aggregate
        # would otherwise each re-run the purchase scan + window
        .localCheckpoint()
    )
    risk = subj.groupBy("t").agg(
        F.sum("ev").alias("d"),
        F.sum(1 - F.col("ev")).alias("c"),
    )
    wt = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    n_tot = subj.count()
    km = risk.select(
        "t",
        "d",
        (F.lit(n_tot) - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wt), F.lit(0)))
        .alias("n_at_risk"),
    ).select(
        "t",
        "d",
        "n_at_risk",
        # d = n_at_risk drops S to exactly 0 (ln undefined): continuity
        # correction 1/(2n) — a documented convention, identical on both
        # engines; it can only occur at the very tail of the risk table
        F.when(F.col("d") <= 0, F.lit(0))
        .when(
            F.col("d") < F.col("n_at_risk"),
            F.expr(
                "CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))"
                " * 1000000.0) AS BIGINT)"
            ),
        )
        .otherwise(
            F.expr(
                "CAST(floor(ln(0.5 / CAST(n_at_risk AS DOUBLE)) * 1000000.0)"
                " AS BIGINT)"
            )
        )
        .alias("term"),
    )
    horizons = spark.createDataFrame(
        [(h,) for h in _KM_HORIZONS], schema="horizon_days int"
    )
    return (
        km.crossJoin(F.broadcast(horizons))
        .filter(F.col("t") <= F.col("horizon_days"))
        .groupBy("horizon_days")
        .agg(
            F.sum("d").cast("long").alias("repeat_events"),
            F.min("n_at_risk").cast("long").alias("min_at_risk"),
            F.sum("term").cast("long").alias("log_surv_micro"),
        )
        .orderBy("horizon_days")
    )


QUERIES = {
    "t22_km_repeat_purchase_survival": km_repeat_purchase_survival,
    "t22_growth_accounting_daily": growth_accounting_daily,
    "t22_customer_tier_migration": customer_tier_migration,
    "ext_zipf_slope": zipf_slope,
    "ext_kwic_concordance": kwic_concordance,
    "t22_duplicate_charge_screen": duplicate_charge_screen,
    "t22_invoice_reconciliation": invoice_reconciliation,
    "t22_fd_profile": fd_profile,
    "t22_revenue_share_hierarchy": revenue_share_hierarchy,
    "t22_seasonal_naive_backtest": seasonal_naive_backtest,
    "t22_ltv_cohort_triangle": ltv_cohort_triangle,
}

_FD_ORACLE_PARTS = [
    f"""
        SELECT '{tbl}.{det}->{dep}' AS fd,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               (10000 * sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)) // count(*)
                   AS viol_bp,
               CAST(max(nd) AS BIGINT) AS max_dep_values
        FROM (SELECT {det}, count(DISTINCT {dep}) AS nd
              FROM {tbl} GROUP BY {det})
    """
    for tbl, det, dep in _FD_CANDIDATES
]

_TOKS5 = "regexp_split_to_array(lower(trim(text)), '\\s+')"

ORACLE = {
    "t22_km_repeat_purchase_survival": f"""
        WITH p AS (
            SELECT user_id, event_id, CAST(ts AS DATE) AS day
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT user_id, day,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY day, event_id) AS rn
            FROM p
        ),
        firsts AS (
            SELECT user_id, min(day) AS d1,
                   max(CASE WHEN rn = 2 THEN day END) AS d2
            FROM r WHERE rn <= 2 GROUP BY user_id
        ),
        e AS (SELECT max(day) AS e FROM p),
        subj AS (
            SELECT CASE WHEN d2 IS NOT NULL
                       THEN date_diff('day', d1, d2)
                       ELSE date_diff('day', d1, e.e) END AS t,
                   CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM firsts, e
        ),
        risk AS (
            SELECT t, sum(ev) AS d, sum(1 - ev) AS c FROM subj GROUP BY t
        ),
        km AS (
            SELECT t, d,
                   (SELECT count(*) FROM subj)
                   - coalesce(sum(d + c) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_at_risk
            FROM risk
        ),
        terms AS (
            SELECT t, d, n_at_risk,
                   CASE WHEN d <= 0 THEN 0
                        WHEN d < n_at_risk THEN
                            CAST(floor(ln(1.0 - CAST(d AS DOUBLE)
                                / CAST(n_at_risk AS DOUBLE)) * 1000000.0)
                                AS BIGINT)
                        ELSE CAST(floor(ln(0.5 / CAST(n_at_risk AS DOUBLE))
                            * 1000000.0) AS BIGINT) END AS term
            FROM km
        )
        SELECT h.horizon_days, CAST(sum(terms.d) AS BIGINT) AS repeat_events,
               CAST(min(terms.n_at_risk) AS BIGINT) AS min_at_risk,
               CAST(sum(terms.term) AS BIGINT) AS log_surv_micro
        FROM terms,
             (SELECT unnest([{", ".join(str(h) for h in _KM_HORIZONS)}])
                  AS horizon_days) h
        WHERE terms.t <= h.horizon_days
        GROUP BY h.horizon_days ORDER BY horizon_days
    """,
    "t22_growth_accounting_daily": """
        WITH da AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        tagged AS (
            SELECT day,
                   CASE WHEN lag(day) OVER w IS NULL THEN 'new'
                        WHEN date_diff('day', lag(day) OVER w, day) = 1
                            THEN 'retained'
                        ELSE 'resurrected' END AS cls,
                   CASE WHEN lead(day) OVER w IS NULL
                         OR date_diff('day', day, lead(day) OVER w) > 1
                       THEN 1 ELSE 0 END AS churns_after
            FROM da
            WINDOW w AS (PARTITION BY user_id ORDER BY day)
        )
        SELECT day,
               CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
               CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_retained,
               CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_resurrected,
               CAST(sum(churns_after) AS BIGINT) AS n_churning_after
        FROM tagged GROUP BY day ORDER BY day
    """,
    "t22_customer_tier_migration": """
        WITH o AS (
            SELECT o_custkey,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                   epoch_us(o_orderdate) AS us
            FROM orders
        ),
        mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM o),
        h1 AS (
            SELECT o_custkey,
                   1 + (row_number() OVER (ORDER BY s DESC, o_custkey ASC) - 1)
                       * 4 // count(*) OVER () AS tier
            FROM (SELECT o_custkey, sum(cents) AS s FROM o, mid
                  WHERE us < mid.m GROUP BY o_custkey)
        ),
        h2 AS (
            SELECT o_custkey,
                   1 + (row_number() OVER (ORDER BY s DESC, o_custkey ASC) - 1)
                       * 4 // count(*) OVER () AS tier
            FROM (SELECT o_custkey, sum(cents) AS s FROM o, mid
                  WHERE us >= mid.m GROUP BY o_custkey)
        )
        SELECT coalesce(CAST(h1.tier AS VARCHAR), 'none') AS tier_h1,
               coalesce(CAST(h2.tier AS VARCHAR), 'none') AS tier_h2,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM h1 FULL OUTER JOIN h2 USING (o_custkey)
        GROUP BY 1, 2 ORDER BY tier_h1, tier_h2
    """,
    "ext_zipf_slope": f"""
        WITH tc AS (
            SELECT term, count(*) AS c
            FROM (SELECT unnest({_TOKS5}) AS term FROM documents)
            GROUP BY term
        ),
        ranked AS (
            SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS r
            FROM tc
        ),
        xy AS (
            SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
                   CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
            FROM ranked
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM xy
        )
        SELECT n AS n_terms,
               CAST(round(1000000.0
                   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 0) AS BIGINT)
                   AS slope_micro,
               CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                   - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 0) AS BIGINT)
                   AS intercept_micro
        FROM m
    """,
    "ext_kwic_concordance": f"""
        WITH toks AS (SELECT {_TOKS5} AS t FROM documents),
        hits AS (
            SELECT unnest(list_filter(range(1, len(t) + 1),
                       i -> t[i] = '{_KWIC_TERM}')) AS i, t
            FROM toks
        )
        SELECT CASE WHEN i > 1 THEN t[i - 1] ELSE '^' END AS prev_word,
               CASE WHEN i < len(t) THEN t[i + 1] ELSE '$' END AS next_word,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM hits
        GROUP BY 1, 2
        ORDER BY n_occurrences DESC, prev_word ASC, next_word ASC
        LIMIT 10
    """,
    "t22_duplicate_charge_screen": """
        WITH ev AS (
            SELECT user_id, event_id,
                   CAST(round(value * 1000000.0, 0) AS BIGINT) AS v,
                   epoch_us(ts) AS us
            FROM events WHERE event_type = 'purchase'
        ),
        gaps AS (
            SELECT user_id,
                   us - lag(us) OVER (PARTITION BY user_id, v
                       ORDER BY us, event_id) AS gap_us
            FROM ev
        )
        SELECT CAST(count(*) AS BIGINT) AS n_suspect_pairs,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(min(gap_us) AS BIGINT) AS tightest_gap_us
        FROM gaps WHERE gap_us <= 5 * 60 * 1000000
    """,
    "t22_invoice_reconciliation": """
        WITH line AS (
            SELECT l_orderkey AS o_orderkey,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                       * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT)
                       AS line_cents
            FROM lineitem GROUP BY 1
        ),
        j AS (
            SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                       AS head_cents,
                   line.line_cents
            FROM orders o LEFT JOIN line USING (o_orderkey)
        )
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_without_lines,
               CAST(sum(CASE WHEN abs(head_cents - coalesce(line_cents, 0)) = 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(max(abs(head_cents - coalesce(line_cents, 0))) AS BIGINT)
                   AS max_diff_cents,
               CAST(sum(abs(head_cents - coalesce(line_cents, 0))) AS BIGINT)
                   AS total_diff_cents
        FROM j
    """,
    "t22_seasonal_naive_backtest": """
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
        sc AS (
            SELECT event_type, x,
                   lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
            FROM dense
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(x - f)) AS BIGINT) // count(*) AS mae_floor,
               CAST(sum(x - f) AS BIGINT) AS bias_sum
        FROM sc WHERE f IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "t22_ltv_cohort_triangle": """
        WITH ev AS (
            SELECT user_id,
                   CAST(date_trunc('month', ts) AS DATE) AS m,
                   CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 1000000.0, 0) AS BIGINT)
                       ELSE 0 END AS rev
            FROM events
        ),
        cohort AS (
            SELECT user_id, min(m) AS cohort_month FROM ev GROUP BY 1
        )
        SELECT c.cohort_month,
               CAST((year(e.m) - year(c.cohort_month)) * 12
                   + (month(e.m) - month(c.cohort_month)) AS INT)
                   AS months_since,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
               CAST(sum(e.rev) AS BIGINT) AS rev_micro
        FROM ev e JOIN cohort c USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_month, months_since
    """,
    "t22_fd_profile": "SELECT * FROM ("
    + " UNION ALL ".join(_FD_ORACLE_PARTS)
    + ") ORDER BY fd",
    "t22_revenue_share_hierarchy": """
        WITH nat AS (
            SELECT r.r_name, n.n_name,
                   CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS rev_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        ),
        reg AS (
            SELECT r_name, CAST(sum(rev_cents) AS BIGINT) AS region_cents
            FROM nat GROUP BY 1
        ),
        world AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS world_cents FROM nat)
        SELECT nat.r_name, nat.n_name, nat.rev_cents, reg.region_cents,
               (10000 * nat.rev_cents) // reg.region_cents AS region_share_bp,
               (10000 * nat.rev_cents) // world.world_cents AS world_share_bp
        FROM nat JOIN reg USING (r_name), world
        ORDER BY nat.r_name, nat.n_name
    """,
}

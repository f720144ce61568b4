"""Data-forensics & planner-diagnostics pack (T21/ext): Spearman rank
correlation (exact tie-averaged integer ranks), Benford first-digit
audit, exact join-size / pair-cost profiling, segment peer
percentiles, and cart-abandonment sessionization.

Reference anchors (SURVEY §2): extends the statistics family grown
from the reference's aggregate vocabulary (`Assignment 2` docx Q7's
conditional ratio, `Assignment 3/.../SQLonRDS.java:246-255` grouped
multi-aggregates) with the rank-based and forensic diagnostics a
production warehouse runs; the sessionization reuses the behavioral
model built for T17/T18 (events table).

Scale notes (100 TB):
- Spearman: values collapse to distinct-value count tables; exclusive
  prefix sums run through the two-phase distributed operator (never a
  one-task global window); tie-averaged ranks carried as CENTERED
  2×rank integers (Σu = 0 exactly, so no n·Σxy product — the moment
  sums stay within BIGINT to ~2e6 rows; DECIMAL(38) beyond).
- Benford: one value-scan → 9-row aggregate; digit extraction is
  integer string arithmetic (no float formatting, which differs
  across engines).
- join-size profile: the Σc² / Σc(c−1)/2 estimators fold over the
  per-key count table — the exact cost oracle for any self-join /
  pair-enumeration plan, at one aggregate's price.
- peer percentiles: segment is the parallelism unit — ranks ride
  segment-keyed windows; no global order anywhere.
- cart abandonment: the 30-min-gap sessionizer shares the ONE
  user-keyed exchange of every behavioral query; per-session state is
  a bounded fold.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata

_BENFORD_BP = {d: [3010, 1760, 1249, 969, 791, 669, 579, 511, 457][d - 1]
               for d in range(1, 10)}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]


# --- Spearman rank correlation ---------------------------------------------


def spearman_value_vs_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21a — Spearman rank correlation between the event value and the
    JSON prop `k`, one row (n, spearman_r): Pearson on tie-averaged
    ranks — the monotone-association twin of t18's Pearson (captures
    nonlinear but monotone coupling Pearson dilutes). Ranks are exact
    integers: centered 2×average-rank u = 2r̄ − (n+1), whose mean is 0
    EXACTLY (tie-averaging preserves rank sums), so the closed form is
    Σuᵤuᵥ/√(Σuᵤ²·Σuᵥ²) with doubles only at the last division.

    Scale: per-distinct-value count tables + two-phase distributed
    prefix sums give every row's tie-averaged rank without any global
    window; the join back to rows is keyed on the value."""
    from bigdatamanagement_spark.operators.rank import global_running_sum

    # materialized once: the plan reads ev four times (n, both rank
    # tables, final join) — without the checkpoint each read would
    # re-scan and re-parse the JSON
    ev = (
        _events(spark, sf_dir)
        .select(
            F.expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").alias("x"),
            F.get_json_object("props", "$.k").cast("long").alias("y"),
        )
        .filter(F.col("y").isNotNull())
        .localCheckpoint()
    )
    n = ev.count()

    def rank_table(col: str) -> DataFrame:
        f = ev.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        cum = global_running_sum(f, [F.col(col)], "c", "ci")
        # u = 2·r̄ − (n+1) = 2·(ci − c) + c + 1 − (n+1)
        return cum.select(col, F.expr(f"2 * (ci - c) + c - {n}").alias(f"u_{col}"))

    j = ev.join(rank_table("x"), "x").join(rank_table("y"), "y")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u_x") * F.col("u_y")).alias("sxy"),
        F.sum(F.col("u_x") * F.col("u_x")).alias("sxx"),
        F.sum(F.col("u_y") * F.col("u_y")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("sxy").cast("double")
            / F.sqrt(F.col("sxx").cast("double") * F.col("syy").cast("double")),
            6,
        ).alias("spearman_r"),
    )


# --- Benford first-digit audit ---------------------------------------------


def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT — Benford's-law first-significant-digit audit of the order
    totals (the fraud/data-forensics screen): per digit 1–9 the count,
    observed share (bp), Benford's expected share (bp), and the
    absolute deviation. Digit extraction is integer string arithmetic
    on the cent-quantized value — float formatting never touches the
    comparison.

    Scale: one scan → 9-row aggregate with map-side partials."""
    o = load_testdata(spark, sf_dir, tables=("orders",), register=False)["orders"]
    v = o.select(
        F.expr("CAST(round(abs(o_totalprice) * 100, 0) AS BIGINT)").alias("c")
    ).filter(F.col("c") > 0)
    # materialized once so the total and the per-digit aggregate share
    # one scan instead of two
    digits = v.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    ).localCheckpoint()
    tot = digits.count()
    exp_bp = F.create_map(
        *[F.lit(x) for kv in _BENFORD_BP.items() for x in kv]
    )
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "digit",
            "n",
            F.expr(f"(10000 * n) div {tot}").alias("obs_bp"),
            exp_bp[F.col("digit")].alias("benford_bp"),
        )
        .withColumn("dev_bp", F.abs(F.col("obs_bp") - F.col("benford_bp")).cast("long"))
        .orderBy("digit")
    )


# --- exact join-size / pair-cost profile ------------------------------------


def partkey_join_cost_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21b — exact self-join cost profile of lineitem on l_partkey,
    one row: distinct keys, input rows, EXACT self-join output size
    Σc² and unordered-pair count Σc(c−1)/2, the hottest key's
    multiplicity, and its share of the join output in bp. The cost
    oracle a planner (or a dedup pipeline about to pair-enumerate)
    consults before committing to a key — the diagnostic twin of the
    Gini skew profile.

    Scale: everything folds over the per-key count table (one keyed
    aggregate); the profile itself is O(1) rows."""
    li = load_testdata(spark, sf_dir, tables=("lineitem",), register=False)["lineitem"]
    ck = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    return ck.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("join_rows"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("n_pairs"),
        F.max("c").cast("long").alias("max_key_rows"),
    ).select(
        "*",
        F.expr("(10000 * max_key_rows * max_key_rows) div join_rows").alias(
            "top_key_join_bp"
        ),
    )


# --- segment peer percentiles ------------------------------------------------


def segment_spend_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21c — peer benchmarking: every customer's lifetime spend
    percentile WITHIN their market segment, in exact basis points
    (rank·10000 div segment size, ties broken by custkey so the rank is
    engine-exact). The 'how do I compare to my cohort' query.

    Scale: ranks ride segment-keyed windows — the segment is the
    parallelism unit; no global order. The spend base is one
    custkey-keyed aggregate joined to the broadcast customer dim."""
    t = load_testdata(
        spark, sf_dir, tables=("orders", "customer"), register=False
    )
    spend = t["orders"].groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).alias(
            "spend_cents"
        )
    )
    base = t["customer"].select("c_custkey", "c_mktsegment").join(spend, "c_custkey")
    w = Window.partitionBy("c_mktsegment").orderBy("spend_cents", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    return (
        base.select(
            "c_custkey",
            "c_mktsegment",
            "spend_cents",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("cnt"),
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            "spend_cents",
            F.expr("(rn * 10000) div cnt").alias("pct_bp"),
        )
        .orderBy("c_custkey")
    )


# --- cart-abandonment sessionization ----------------------------------------


def cart_abandonment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21d — cart abandonment: 30-min-gap sessions classified by
    whether a purchase occurred; per outcome the session count, mean
    duration (exact floor micros) and mean event count (centi).
    The conversion diagnostic every commerce pipeline tracks.

    Scale: sessionization is one user-keyed lag window (the shared
    behavioral exchange); the per-session reduction and the 2-row
    outcome aggregate are keyed folds with map-side partials."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    )
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(
            F.col("us") - F.lag("us").over(wu) > 30 * 60 * 1_000_000, 1
        ).otherwise(F.when(F.lag("us").over(wu).isNull(), 1).otherwise(0)),
    ).withColumn(
        "sid",
        F.sum("new_s").over(
            Window.partitionBy("user_id").orderBy("us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = marked.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("dur_us"),
        F.max("p").alias("converted"),
    )
    return (
        sessions.groupBy(
            F.when(F.col("converted") == 1, "converted")
            .otherwise("abandoned")
            .alias("outcome")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.expr("sum(dur_us) div count(1)").alias("mean_dur_us"),
            F.expr("(100 * sum(n_ev)) div count(1)").alias("mean_events_centi"),
        )
        .orderBy("outcome")
    )


# --- time-decay multi-touch attribution -------------------------------------


def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21e — time-decay multi-touch attribution: every purchase
    distributes credit over the (up to) 8 user events preceding it —
    a click/view touch at distance i from the conversion earns
    1e6 div 2^(i−1) micro-credits (halving per step back, the dyadic
    weights that stay EXACT integers; non-touch events occupy their
    slot but earn nothing). Per channel: touches credited and total
    credit — the multi-touch companion to last-touch attribution
    (t19), which gives the nearest touch everything.

    Scale: one user-keyed window (the shared behavioral exchange)
    collecting ≤8-element type lists; the explode is bounded by 8× the
    purchase count, not the event count."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-8, -1)
    )
    hist = ev.withColumn("hist", F.collect_list("event_type").over(w)).filter(
        F.col("event_type") == "purchase"
    )
    credits = hist.select(
        F.explode(
            # reverse → index 0 is the nearest preceding event
            F.expr(
                "transform(reverse(hist), (t, i) -> "
                "struct(t AS ch, CAST(1000000 div shiftleft(1L, i) AS BIGINT)"
                " AS credit))"
            )
        ).alias("c")
    ).filter(F.col("c.ch").isin("click", "view"))
    return (
        credits.groupBy(F.col("c.ch").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("c.credit").cast("long").alias("credit_micro"),
        )
        .orderBy("channel")
    )


QUERIES = {
    "t21_spearman_value_vs_prop": spearman_value_vs_prop,
    "t21_time_decay_attribution": time_decay_attribution,
    "ext_benford_first_digit_audit": benford_first_digit_audit,
    "t21_partkey_join_cost_profile": partkey_join_cost_profile,
    "t21_segment_spend_percentiles": segment_spend_percentiles,
    "t21_cart_abandonment_summary": cart_abandonment_summary,
}

ORACLE = {
    "t21_time_decay_attribution": """
        WITH ev AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ),
        h AS (
            SELECT event_type,
                   list(event_type) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS hist
            FROM ev
        ),
        x AS (
            SELECT unnest(hist) AS ch,
                   unnest(range(1, len(hist) + 1)) AS i,
                   len(hist) AS hl
            FROM h WHERE event_type = 'purchase'
        )
        SELECT ch AS channel,
               CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(1000000 // (1::BIGINT << (hl - i))) AS BIGINT)
                   AS credit_micro
        FROM x WHERE ch IN ('click', 'view')
        GROUP BY ch ORDER BY channel
    """,
    "t21_spearman_value_vs_prop": """
        WITH ev AS (
            SELECT CAST(round(value * 1000000.0, 0) AS BIGINT) AS x,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        nn AS (SELECT count(*) AS n FROM ev),
        rx AS (
            SELECT x, 2 * (sum(c) OVER (ORDER BY x) - c) + c - (SELECT n FROM nn)
                       AS u_x
            FROM (SELECT x, count(*) AS c FROM ev GROUP BY x)
        ),
        ry AS (
            SELECT y, 2 * (sum(c) OVER (ORDER BY y) - c) + c - (SELECT n FROM nn)
                       AS u_y
            FROM (SELECT y, count(*) AS c FROM ev GROUP BY y)
        ),
        j AS (SELECT u_x, u_y FROM ev JOIN rx USING (x) JOIN ry USING (y)),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(u_x * u_y) AS BIGINT) AS sxy,
                   CAST(sum(u_x * u_x) AS BIGINT) AS sxx,
                   CAST(sum(u_y * u_y) AS BIGINT) AS syy
            FROM j
        )
        SELECT n, round(CAST(sxy AS DOUBLE)
                   / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6)
                   AS spearman_r
        FROM m
    """,
    "ext_benford_first_digit_audit": f"""
        WITH v AS (
            SELECT CAST(round(abs(o_totalprice) * 100, 0) AS BIGINT) AS c
            FROM orders
        ),
        d AS (
            SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
            FROM v WHERE c > 0
        ),
        tot AS (SELECT count(*) AS t FROM d),
        exp AS (
            SELECT * FROM (VALUES {", ".join(f"({d}, {bp})" for d, bp in _BENFORD_BP.items())})
                AS e(digit, benford_bp)
        )
        SELECT d.digit, CAST(count(*) AS BIGINT) AS n,
               (10000 * count(*)) // (SELECT t FROM tot) AS obs_bp,
               CAST(any_value(e.benford_bp) AS INT) AS benford_bp,
               CAST(abs((10000 * count(*)) // (SELECT t FROM tot)
                   - any_value(e.benford_bp)) AS BIGINT) AS dev_bp
        FROM d JOIN exp e USING (digit)
        GROUP BY d.digit ORDER BY d.digit
    """,
    "t21_partkey_join_cost_profile": """
        WITH ck AS (
            SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1
        ),
        ag AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(c) AS BIGINT) AS n_rows,
                   CAST(sum(c * c) AS BIGINT) AS join_rows,
                   CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_pairs,
                   CAST(max(c) AS BIGINT) AS max_key_rows
            FROM ck
        )
        SELECT *, (10000 * max_key_rows * max_key_rows) // join_rows
                   AS top_key_join_bp
        FROM ag
    """,
    "t21_segment_spend_percentiles": """
        WITH spend AS (
            SELECT o_custkey AS c_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS spend_cents
            FROM orders GROUP BY 1
        ),
        base AS (
            SELECT c.c_custkey, c.c_mktsegment, s.spend_cents
            FROM customer c JOIN spend s USING (c_custkey)
        )
        SELECT c_custkey, c_mktsegment, spend_cents,
               (row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY spend_cents, c_custkey) * 10000)
                   // count(*) OVER (PARTITION BY c_mktsegment)
                   AS pct_bp
        FROM base ORDER BY c_custkey
    """,
    "t21_cart_abandonment_summary": """
        WITH ev AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
            FROM events
        ),
        marked AS (
            SELECT user_id, event_id, us, p,
                   CASE WHEN lag(us) OVER w IS NULL THEN 1
                        WHEN us - lag(us) OVER w > 30 * 60 * 1000000 THEN 1
                        ELSE 0 END AS new_s
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        sid AS (
            SELECT user_id, us, p,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        sess AS (
            SELECT user_id, sid, count(*) AS n_ev,
                   max(us) - min(us) AS dur_us, max(p) AS converted
            FROM sid GROUP BY 1, 2
        )
        SELECT CASE WHEN converted = 1 THEN 'converted'
                    ELSE 'abandoned' END AS outcome,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(dur_us) AS BIGINT) // count(*) AS mean_dur_us,
               (100 * CAST(sum(n_ev) AS BIGINT)) // count(*)
                   AS mean_events_centi
        FROM sess GROUP BY 1 ORDER BY outcome
    """,
}

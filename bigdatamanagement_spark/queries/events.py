"""Events time-series pack (T17): the reference's Bigtable/Redis
time-series idioms re-expressed over the driver's ``events`` table.

- first event per (user, hour): the hourly-downsample idiom
  (Bigtable.java:94-97 "first reading in a hour", Q-A16/Q-W02)
- max value per event_type per month: range-filtered MAX (Q-A17,
  Bigtable.java:129-145)
- top-10 users by summed value: leaderboard top-k (Q-W03/Q-S07,
  redis_client.py:443 ZREVRANGE)
- avg JSON prop per event_type: JSON string field access (F-17)

Scale notes: the window dedup partitions by (user_id, hour) — a single
shuffle keyed exactly like the downstream consumers; at 100 TB this is
the canonical "hypertable rollup" shape, and date_trunc keys keep
partition counts bounded. Top-k is TakeOrderedAndProject (no global
sort). JSON extraction uses get_json_object (JVM-side, codegen'd), not
a Python UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatamanagement_spark.catalog import load_testdata


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)["events"]


def first_event_per_user_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17a — first event per user per hour (tiebreak event_id)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts")))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_ts"),
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
        )
    )


def max_value_by_type_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17b — max event value per event_type per month (Q-A17 shape)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.year("ts").cast("long").alias("yr"),
            F.month("ts").cast("long").alias("mon"),
        )
        .agg(F.round(F.max("value"), 2).alias("max_value"))
        .orderBy("event_type", "yr", "mon")
    )


def top10_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17c — top-10 users by total event value (ZREVRANGE analog),
    tiebreak user_id ASC."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


def avg_json_prop_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17d — JSON field access (F-17): avg of props.k per event_type."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("double"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"))
        .orderBy("event_type")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17e — exact interpolated quantiles (p50/p90/p99) of value per
    event_type. Spark's `percentile` and DuckDB's `quantile_cont` share
    the linear-interpolation definition, so this is oracle-checkable.
    At 100 TB swap in approx_percentile (t-digest, single-pass,
    mergeable) — the exact form needs a per-group sort."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


def hourly_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17f — pivot: total value per hour-of-day × event_type (wide).
    The pivot values are pinned (EVENT_TYPES) so the plan is a single
    pass of conditional aggregates — an unpinned pivot needs an extra
    distinct-values job first, a full scan you don't want at 100 TB."""
    ev = _events(spark, sf_dir)
    out = (
        ev.groupBy(F.hour("ts").cast("long").alias("hour_of_day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
        .orderBy("hour_of_day")
    )
    return out.select(
        "hour_of_day", *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in EVENT_TYPES]
    )


def last_purchase_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17g — as-of join: every event attributed to the user's most
    recent purchase at-or-before it (classic attribution). Uses the
    union+window asof_join operator; DuckDB's native ASOF LEFT JOIN is
    the oracle."""
    from bigdatamanagement_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    ).orderBy("event_id")


def nearby_error_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17h — range join: for every event, how many OTHER error events
    fired within ±5 minutes (incident-blast-radius attribution). Uses
    the bucketized interval_join operator; the oracle is DuckDB's native
    inequality join (IEJoin). Events with no nearby error keep n=0 via
    the left join back."""
    from bigdatamanagement_spark.operators.rangejoin import interval_join

    ev = _events(spark, sf_dir)
    left = ev.select("event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    pairs = interval_join(left, errors, "ts", "err_ts", -300, 300).filter(
        F.col("event_id") != F.col("err_id")
    )
    counts = pairs.groupBy("event_id").agg(F.count("*").alias("n"))
    return (
        ev.select("event_id")
        .join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n", F.lit(0)).alias("n_nearby_errors"))
        .orderBy("event_id")
    )


def daily_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17i — the day level of the hour→day→month rollup cascade
    (computed from hourly partials, not raw). The oracle aggregates raw
    directly, proving partial re-reduction is lossless."""
    from bigdatamanagement_spark.operators.downsample import rollup_cascade

    day = rollup_cascade(_events(spark, sf_dir))["day"]
    return day.select(
        "event_type",
        F.col("bucket_ts").cast("timestamp_ntz").alias("day_ts"),
        "n",
        F.round("sum_v", 2).alias("sum_value"),
        F.round("min_v", 2).alias("min_value"),
        F.round("max_v", 2).alias("max_value"),
        # round(sum)/n, NOT round(avg): the quotient of identically-rounded
        # operands is bit-identical across engines, while rounding the
        # quotient hits half-way points (n=8 → .xxx75) where Spark
        # (HALF_UP on shortest-repr) and DuckDB disagree.
        (F.round("sum_v", 2) / F.col("n")).alias("avg_value"),
    ).orderBy("event_type", "day_ts")


def approx_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17j — HyperLogLog++ distinct users per event_type (rows-only:
    sketch estimates are engine-specific; the accuracy bound vs the exact
    count is asserted in tests). At 100 TB the sketch is the only sane
    answer: single pass, mergeable partials, fixed memory per group."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17k — gap-based sessionization (30-min gap) histogram: how many
    sessions have n events, and their summed duration. One shuffle keyed
    by user_id feeds both windows and the session aggregate (see
    operators/sessionize.py scale notes). Durations are exact integer
    microseconds — engine-portable."""
    from bigdatamanagement_spark.operators.sessionize import session_bounds

    ev = _events(spark, sf_dir)
    b = session_bounds(ev, "user_id", "ts", gap_seconds=1800, order_tiebreak="event_id")
    return (
        b.groupBy("n_events")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("duration_us").alias("total_duration_us"),
        )
        .orderBy("n_events")
    )


def scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17l — SCD2 (type-2 slowly-changing-dimension) history built from
    the purchase change stream: one validity interval per purchase,
    closed by the user's next purchase (bounded to user_id < 50 to keep
    the compare set small; the operator is full-corpus-shaped)."""
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
    return hist.orderBy("user_id", "valid_from")


def approx_value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17 sketch extension — approx_percentile (Greenwald-Khanna sketch,
    single-pass, mergeable) p50/p90/p99 per event_type: the 100 TB
    replacement for the exact interpolated quantiles of
    t17_value_quantiles_by_type (which needs a per-group sort). Driver
    check is rows-only (sketches have no DuckDB twin); the accuracy
    bound vs the exact quantiles is pinned in
    tests/test_events.py::test_approx_quantiles_close_to_exact."""
    ev = _events(spark, sf_dir)
    acc = 10_000  # 1/acc relative rank error
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile_approx("value", F.lit(0.5), F.lit(acc)), 4).alias("p50"),
            F.round(F.percentile_approx("value", F.lit(0.9), F.lit(acc)), 4).alias("p90"),
            F.round(F.percentile_approx("value", F.lit(0.99), F.lit(acc)), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17 analytic-frame extension — per-user running value sum and a
    trailing 3-event moving sum (ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW). One shuffle keyed by user_id serves BOTH frames (same window
    partitioning), so adding the second aggregate is free at any scale.
    Values are rounded per-row before summation parity matters: the
    running sums accumulate ROUND(value,2) operands, which DuckDB
    reproduces exactly (sums of 2-decimal values stay exactly
    representable far beyond this data's magnitude)."""
    ev = _events(spark, sf_dir).withColumn("v", F.round("value", 2))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_value"),
            F.round(F.sum("v").over(w.rowsBetween(-2, 0)), 2).alias("trailing3_value"),
        )
        .orderBy("user_id", "event_id")
    )


def event_gap_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17 lead/lag extension — per-user inter-event gap (seconds) and
    value delta vs previous event (gap in exact integer microseconds); first event per user yields NULLs
    (lag default). Same single user-keyed shuffle as every other T17
    window query."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select(
            "user_id",
            "event_id",
            # Integer microseconds, not epoch-seconds: second-granularity
            # casts round differently across engines (Spark floors,
            # DuckDB rounds); unix_micros/epoch_us are exact integers.
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
            ).alias("gap_us"),
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
        )
        .orderBy("user_id", "event_id")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event transition counts: for each user's time-ordered
    stream, count (prev_type -> next_type) adjacencies, with row-share in
    exact basis points. One user-keyed shuffle (the lag window), then a
    25-row aggregate — the path-analysis primitive behind "what do users
    do after X".
    """
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    row_tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        pairs.join(F.broadcast(row_tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.floor(F.lit(10000) * F.col("n") / F.col("row_n")).cast("long").alias("share_bp"),
        )
        .orderBy("prev_type", "next_type")
    )


def event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary importance of event types: weighted PageRank (5 exact-
    integer power iterations, damping 0.85) over the Markov transition
    graph of per-user event streams (operators/pagerank.py). The edge
    build is the same single user-keyed lag-window shuffle as the
    transition matrix; each iteration is then one tiny dst-keyed
    aggregate over the 25-edge graph."""
    from bigdatamanagement_spark.operators.pagerank import pagerank

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    edges = (
        e.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    return pagerank(edges, iters=5).orderBy(F.desc("rank_micro"), "node")


FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup→view→click→purchase: users reaching each
    step (strictly-increasing timestamps) + basis-point conversion.
    One user-keyed shuffle — the per-user step walk is a single sorted
    array fold, not a per-step join cascade (operators/funnel.py)."""
    from bigdatamanagement_spark.operators.funnel import funnel_counts

    return funnel_counts(_events(spark, sf_dir), FUNNEL_STEPS)


def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention triangle (offsets 0..7): cohort = first
    activity date; retained-at-k = active on cohort_day+k; exact
    integer basis points (operators/funnel.py)."""
    from bigdatamanagement_spark.operators.funnel import cohort_retention

    return cohort_retention(_events(spark, sf_dir), max_offset_days=7)


def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per event_type with LOCF: every hour in each
    type's observed span appears, missing hours get n_events=0 and carry
    the last observed hourly sum forward (operators/gapfill.py) — the
    time_bucket_gapfill/locf capability over the events stream."""
    from bigdatamanagement_spark.operators.gapfill import gapfill_locf_hourly

    return gapfill_locf_hourly(
        _events(spark, sf_dir), ["event_type"], "ts", "value"
    ).orderBy("event_type", "hr")


QUERIES = {
    "t17_event_type_pagerank": event_type_pagerank,
    "t17_hourly_gapfill_locf": hourly_gapfill_locf,
    "t17_event_transition_matrix": event_transition_matrix,
    "t17_funnel_signup_purchase": funnel_signup_purchase,
    "t17_cohort_retention": cohort_retention_daily,
    "t17_approx_value_quantiles_by_type": approx_value_quantiles_by_type,
    "t17_user_running_value": user_running_value,
    "t17_event_gap_deltas": event_gap_deltas,
    "t17_first_event_per_user_hour": first_event_per_user_hour,
    "t17_max_value_by_type_month": max_value_by_type_month,
    "t17_top10_users_by_value": top10_users_by_value,
    "t17_avg_json_prop_by_type": avg_json_prop_by_type,
    "t17_value_quantiles_by_type": value_quantiles_by_type,
    "t17_hourly_type_pivot": hourly_type_pivot,
    "t17_last_purchase_asof": last_purchase_asof,
    "t17_nearby_error_counts": nearby_error_counts,
    "t17_daily_rollup_cascade": daily_rollup_cascade,
    "t17_approx_distinct_users_by_type": approx_distinct_users_by_type,
    "t17_session_stats": session_stats,
    "t17_scd2_purchase_history": scd2_purchase_history,
}

from bigdatamanagement_spark.operators.pagerank import pagerank_oracle_sql as _pr_sql

_PR_EDGES = """edges AS (
    SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
    FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC) AS prev_type, event_type
          FROM events)
    WHERE prev_type IS NOT NULL GROUP BY 1, 2
)"""

ORACLE = {
    "t17_event_type_pagerank": _pr_sql(_PR_EDGES, damping_bp=8500, iters=5),
    "t17_hourly_gapfill_locf": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   COUNT(*) AS n_events,
                   SUM(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS sum_micro
            FROM events GROUP BY 1, 2
        ),
        spans AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
                  FROM hourly GROUP BY 1),
        grid AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                 FROM spans),
        filled AS (
            SELECT g.event_type, g.hr, h.n_events, h.sum_micro
            FROM grid g LEFT JOIN hourly h USING (event_type, hr)
        )
        SELECT event_type, hr,
               CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(sum_micro, 0) AS BIGINT) AS sum_value_micro,
               CAST(last_value(sum_micro IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS locf_value_micro,
               CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM filled ORDER BY event_type, hr
    """,
    "t17_event_transition_matrix": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS prev_type,
                   event_type AS next_type
            FROM events
        ),
        counted AS (
            SELECT prev_type, next_type, COUNT(*) AS n FROM pairs
            WHERE prev_type IS NOT NULL GROUP BY 1, 2
        ),
        tot AS (SELECT prev_type, SUM(n) AS row_n FROM counted GROUP BY 1)
        SELECT prev_type, next_type, n,
               CAST(floor(10000 * n / row_n) AS BIGINT) AS share_bp
        FROM counted JOIN tot USING (prev_type)
        ORDER BY prev_type, next_type
    """,
    "t17_funnel_signup_purchase": """
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
               WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
               WHERE event_type = 'click' AND ts > t2 GROUP BY 1),
        s4 AS (SELECT e.user_id, min(ts) AS t4 FROM events e JOIN s3 USING (user_id)
               WHERE event_type = 'purchase' AND ts > t3 GROUP BY 1),
        n AS (SELECT (SELECT count(*) FROM s1) AS n1, (SELECT count(*) FROM s2) AS n2,
                     (SELECT count(*) FROM s3) AS n3, (SELECT count(*) FROM s4) AS n4)
        SELECT * FROM (
            SELECT 1 AS step_no, 'signup' AS event_type, n1 AS n_users,
                   CAST(floor(10000 * n1 / n1) AS BIGINT) AS conv_bp FROM n
            UNION ALL SELECT 2, 'view', n2, CAST(floor(10000 * n2 / n1) AS BIGINT) FROM n
            UNION ALL SELECT 3, 'click', n3, CAST(floor(10000 * n3 / n1) AS BIGINT) FROM n
            UNION ALL SELECT 4, 'purchase', n4, CAST(floor(10000 * n4 / n1) AS BIGINT) FROM n
        ) ORDER BY step_no
    """,
    "t17_cohort_retention": """
        WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        cohorts AS (SELECT user_id, min(day) AS cohort_day FROM acts GROUP BY 1),
        sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM cohorts GROUP BY 1),
        ret AS (SELECT cohort_day, CAST(day - cohort_day AS INTEGER) AS day_offset, count(*) AS n_active
                FROM acts JOIN cohorts USING (user_id)
                WHERE day - cohort_day BETWEEN 0 AND 7
                GROUP BY 1, 2)
        SELECT r.cohort_day, day_offset, n_active, cohort_size,
               CAST(floor(10000 * n_active / cohort_size) AS BIGINT) AS retention_bp
        FROM ret r JOIN sizes USING (cohort_day)
        ORDER BY cohort_day, day_offset
    """,
    "t17_user_running_value": """
        SELECT user_id, event_id,
               ROUND(SUM(ROUND(value, 2)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
               ROUND(SUM(ROUND(value, 2)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS trailing3_value
        FROM events
        ORDER BY user_id, event_id
    """,
    "t17_event_gap_deltas": """
        SELECT user_id, event_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
               ROUND(value - lag(value) OVER w, 2) AS value_delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ORDER BY user_id, event_id
    """,
    "t17_session_stats": """
        WITH s AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        numbered AS (
            SELECT user_id, us,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
            FROM s
        ),
        bounds AS (
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   MAX(us) - MIN(us) AS duration_us
            FROM numbered GROUP BY 1, 2
        )
        SELECT n_events, COUNT(*) AS n_sessions,
               CAST(SUM(duration_us) AS BIGINT) AS total_duration_us
        FROM bounds GROUP BY 1 ORDER BY 1
    """,
    "t17_scd2_purchase_history": """
        SELECT user_id, ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               (LEAD(ts) OVER w IS NULL) AS is_current,
               ROUND(value, 2) AS value
        FROM events
        WHERE event_type = 'purchase' AND user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ORDER BY user_id, valid_from
    """,
    "t17_first_event_per_user_hour": """
        SELECT user_id, date_trunc('hour', ts) AS hour_ts, event_id,
               event_type, ROUND(value, 2) AS value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, date_trunc('hour', ts)
                ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "t17_max_value_by_type_month": """
        SELECT event_type, CAST(year(ts) AS BIGINT) AS yr,
               CAST(month(ts) AS BIGINT) AS mon,
               ROUND(MAX(value), 2) AS max_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "t17_top10_users_by_value": """
        SELECT user_id, ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY total_value DESC, user_id ASC
        LIMIT 10
    """,
    "t17_avg_json_prop_by_type": """
        SELECT event_type,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "t17_value_quantiles_by_type": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.9), 4) AS p90,
               ROUND(quantile_cont(value, 0.99), 4) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "t17_daily_rollup_cascade": """
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value,
               ROUND(SUM(value), 2) / COUNT(*) AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "t17_nearby_error_counts": """
        SELECT e.event_id, COALESCE(c.n, 0) AS n_nearby_errors
        FROM events e LEFT JOIN (
            SELECT e2.event_id, COUNT(*) AS n
            FROM events e2 JOIN events r
              ON r.event_type = 'error' AND r.event_id != e2.event_id
             AND r.ts BETWEEN e2.ts - INTERVAL 5 MINUTE
                          AND e2.ts + INTERVAL 5 MINUTE
            GROUP BY 1
        ) c USING (event_id)
        ORDER BY e.event_id
    """,
    "t17_last_purchase_asof": """
        SELECT e.event_id, e.user_id, e.event_type, e.ts,
               p.purchase_ts, p.purchase_value
        FROM events e ASOF LEFT JOIN (
            SELECT user_id, ts AS purchase_ts, ROUND(value, 2) AS purchase_value
            FROM events WHERE event_type = 'purchase'
        ) p ON e.user_id = p.user_id AND e.ts >= p.purchase_ts
        ORDER BY e.event_id
    """,
    "t17_hourly_type_pivot": """
        SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
               COALESCE(ROUND(SUM(value) FILTER (event_type = 'click'), 2), 0.0) AS click,
               COALESCE(ROUND(SUM(value) FILTER (event_type = 'error'), 2), 0.0) AS error,
               COALESCE(ROUND(SUM(value) FILTER (event_type = 'purchase'), 2), 0.0) AS purchase,
               COALESCE(ROUND(SUM(value) FILTER (event_type = 'signup'), 2), 0.0) AS signup,
               COALESCE(ROUND(SUM(value) FILTER (event_type = 'view'), 2), 0.0) AS view,
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
}

"""Complex-type surface pack (T61): contract-level certification of
Spark's MAP column type (map_from_entries / transform_values /
map_filter / explode-of-map) and of the array higher-order-function
surface (aggregate / zip_with / filter) — each exercised end-to-end
in a query whose ORACLE checks the same semantics relationally, so
the gate proves the complex-type pipeline produces exactly the
relational answer.

Reference anchors (SURVEY §1.2): the reference's type system has "no
map type proper" (Redis hashes are wide rows) and arrays only as
document fields (`ExampleMongo.java:44`); the engine exposes Spark's
real MAP and array-HOF surfaces — these entries put that exposure
under the oracle contract instead of leaving it an internal idiom.

Scale notes (100 TB):
- both queries do ONE user-keyed aggregate; the map/array values are
  per-user bounded (≤|event types| entries; ≤|days| cells), the
  per-entry lambdas run inside codegen'd expressions, and the final
  rollups are map-side-combined aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatamanagement_spark.catalog import load_testdata

_MICRO = 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, tables=("events",), register=False)[
        "events"
    ]


# --- T61a: MAP column surface ---------------------------------------------------------


def map_column_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T61a — the MAP column pipeline, oracle-certified: per user,
    build map<event_type, count> with map_from_entries, DOUBLE every
    value with transform_values, drop entries below 6 with map_filter
    (i.e., raw count < 3), explode the surviving entries back to rows,
    and roll up per event type (users retaining the type, total kept
    value). The oracle computes the identical answer relationally —
    proving the map surface is semantics-preserving, not just
    syntax-supported (the reference's nearest analog is the Redis
    hash, a wide ROW — `redis_client.py:74-93`).

    Scale: one (user, type) count + one user-keyed map assembly; maps
    are ≤5 entries; everything re-aggregates map-side."""
    ev = _events(spark, sf_dir)
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    maps = per_ut.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "c"))
        ).alias("m")
    )
    kept = maps.select(
        "user_id",
        F.explode(
            F.map_filter(
                F.transform_values(F.col("m"), lambda k, v: v * 2),
                lambda k, v: v >= 6,
            )
        ).alias("event_type", "doubled"),
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users_kept"),
            F.sum("doubled").cast("long").alias("sum_doubled"),
        )
        .orderBy("event_type")
    )


# --- T61b: array higher-order-function surface ------------------------------------------


def array_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T61b — the array higher-order-function pipeline,
    oracle-certified: per user, the day-ordered array of daily
    purchase cents (sort_array over collect_list of (day, cents)
    structs, then a transform projecting the value — the shingle
    idiom), folded three ways INSIDE codegen: aggregate() for the
    total (pinned equal to the plain SUM — the conservation check),
    zip_with(arr, tail) for day-over-day increase counts, and
    filter() for days above the user's own mean (cross-multiplied —
    no division in the lambda). One global rollup row.

    Scale: one user-keyed aggregate; per-user arrays are ≤|days|
    long; the lambdas are JVM expressions, never Python."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x")
    )
    arrs = daily.groupBy("user_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(day, x))),"
            " s -> s.x)"
        ).alias("xs"),
        F.sum("x").cast("long").alias("plain_sum"),
    )
    per_user = arrs.select(
        "user_id",
        "plain_sum",
        F.expr(
            "aggregate(xs, CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("hof_sum"),
        F.expr(
            "size(filter(zip_with(xs, slice(xs, 2, size(xs)),"
            " (a, b) -> CASE WHEN b > a THEN 1 ELSE 0 END),"
            " d -> d = 1))"
        ).cast("long").alias("n_increases"),
        F.expr(
            "size(filter(xs, v -> v * size(xs) >"
            " aggregate(xs, CAST(0 AS BIGINT), (acc, u) -> acc + u)))"
        ).cast("long").alias("n_above_mean"),
        F.size("xs").cast("long").alias("n_days"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_days").cast("long").alias("total_days"),
        F.sum("hof_sum").cast("long").alias("hof_total_cents"),
        F.sum(
            F.when(F.col("hof_sum") == F.col("plain_sum"), 1).otherwise(0)
        )
        .cast("long")
        .alias("conservation_ok"),
        F.sum("n_increases").cast("long").alias("total_increases"),
        F.sum("n_above_mean").cast("long").alias("total_above_mean"),
    )


QUERIES = {
    "t61_map_column_surface": map_column_surface,
    "t61_array_hof_surface": array_hof_surface,
}

ORACLE = {
    "t61_map_column_surface": """
        WITH per_ut AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users_kept,
               CAST(SUM(2 * c) AS BIGINT) AS sum_doubled
        FROM per_ut
        WHERE 2 * c >= 6
        GROUP BY 1 ORDER BY 1
    """,
    "t61_array_hof_surface": """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT user_id, day, x,
                   lag(x) OVER (PARTITION BY user_id ORDER BY day)
                       AS prev_x
            FROM daily
        ),
        per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS total,
                   CAST(SUM(CASE WHEN prev_x IS NOT NULL AND x > prev_x
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_increases
            FROM lagged GROUP BY 1
        ),
        above AS (
            SELECT d.user_id,
                   CAST(SUM(CASE WHEN d.x * p.n_days > p.total
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mean
            FROM daily d JOIN per_user p ON d.user_id = p.user_id
            GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(p.n_days) AS BIGINT) AS total_days,
               CAST(SUM(p.total) AS BIGINT) AS hof_total_cents,
               CAST(COUNT(*) AS BIGINT) AS conservation_ok,
               CAST(SUM(p.n_increases) AS BIGINT) AS total_increases,
               CAST(SUM(a.n_above_mean) AS BIGINT) AS total_above_mean
        FROM per_user p JOIN above a ON p.user_id = a.user_id
    """,
}

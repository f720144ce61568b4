"""First-per-group downsampling — the reference's hourly weather rollup.

Reference: Bigtable.java:94-97 ("Take the first reading in a hour and
ignore any others") — a load-time pre-aggregation into the wide-column
store. Engine-side this is a window dedup (Q-A16/Q-W02/S-02).

Scale notes: one shuffle on the group keys; at 100 TB the raw feed
should be written partitioned by (station, date) so this window runs
within partitions (no cross-partition skew — hours are uniform).
row_number + filter rn=1 lets Spark use a partial top-1 per key within
each task (WindowExec with running rank); no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def first_per_group(
    df: DataFrame,
    group_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Keep the first row per group under ``order_by`` (ties broken by the
    full order key list — callers must pass a deterministic ordering)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def hourly_downsample(weather_raw: DataFrame) -> DataFrame:
    """weather_raw -> weather_hourly: first reading per (station, date,
    hour). The 'H:MM' time string sorts numerically via hour*60+minute.
    Adds an integer ``hour`` column (F-09: split(time,':')[0] cast int).
    """
    df = weather_raw.withColumn(
        "hour", F.split(F.col("time"), ":").getItem(0).cast("int")
    ).withColumn("minute", F.split(F.col("time"), ":").getItem(1).cast("int"))
    return first_per_group(
        df, ["station", "date", "hour"], [F.col("minute").asc()]
    ).drop("minute")


def rollup_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """Multi-resolution continuous aggregates: hour → day → month, each
    level computed FROM THE PREVIOUS level's partials, not from raw.

    count/sum/min/max are decomposable, so day = re-aggregate of 24 hour
    rows and month of ~30 day rows; avg is carried as sum/count and
    finalized per level. At 100 TB this is the difference between one
    raw scan (hour) plus two tiny scans, and three full raw scans — and
    it is exactly how a hypertable/materialized-rollup pipeline stays
    incremental: append new hours, re-reduce only affected days/months.

    Returns {"hour": df, "day": df, "month": df}; each df has key_cols +
    bucket_ts + n/sum_v/min_v/max_v/avg_v.
    """
    import pyspark.sql.functions as F

    def finalize(df: DataFrame) -> DataFrame:
        return df.withColumn("avg_v", F.col("sum_v") / F.col("n"))

    hour = (
        events.groupBy(
            *key_cols, F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )

    def reduce_level(prev: DataFrame, unit: str) -> DataFrame:
        return (
            prev.groupBy(
                *key_cols, F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts")
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )

    day = reduce_level(hour, "day")
    month = reduce_level(day, "month")
    return {"hour": finalize(hour), "day": finalize(day), "month": finalize(month)}

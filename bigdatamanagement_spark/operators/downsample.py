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

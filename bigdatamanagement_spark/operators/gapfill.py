"""Time-bucket gap-filling with last-observation-carried-forward (LOCF) —
the continuous-aggregate companion every time-series store exposes
(TimescaleDB ``time_bucket_gapfill`` + ``locf``, InfluxDB ``fill(previous)``).
The reference's nearest analog is the Bigtable hourly downsample
(`Assignment 4/.../Bigtable.java:94-97`), which keeps the first reading per
hour but leaves missing hours absent; this operator makes the bucket grid
dense so downstream windows/joins see every hour.

Shape (all JVM-side, no UDFs):
1. bucket + aggregate:  one shuffle keyed by (key, bucket) with map-side
   partial aggregation — at 100 TB this is the only data-sized exchange.
2. span per key:        groupBy(key) min/max bucket — reuses the same
   exchange via AQE; output is one tiny row per key.
3. dense grid:          ``sequence(lo, hi, interval 1 hour)`` + ``explode``
   — a *narrow* per-key expansion (hours-in-range rows per key, data-
   independent), never a cross join against a calendar table.
4. fill:                left join grid ⟕ hourly on (key, bucket), then
   ``last(value, ignorenulls=True)`` over (key ORDER BY bucket) — the LOCF
   window rides the same key partitioning as the join output.

Values are carried as integer micro-units (per-row ``round(v*1e6)`` before
the sum) so the hourly sums are associative integers — identical in Spark
and DuckDB regardless of aggregation order.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def gapfill_locf_hourly(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-key hourly grid over each key's observed [min, max] hour
    span: (``*key_cols``, hr, n_events, sum_value_micro, locf_value_micro,
    is_gap). Gap rows have n_events = 0, sum 0, is_gap = 1, and
    locf_value_micro = the most recent observed hourly sum (never NULL:
    each key's grid starts at its own first observation)."""
    keys = list(key_cols)
    micro = F.round(F.col(value_col) * 1000000.0, 0).cast("long")
    hourly = (
        df.select(*keys, F.date_trunc("hour", F.col(ts_col)).alias("hr"), micro.alias("vm"))
        .groupBy(*keys, "hr")
        .agg(F.count("*").alias("n_events"), F.sum("vm").alias("sum_micro"))
    )
    grid = (
        hourly.groupBy(*keys)
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            *keys,
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr"),
        )
    )
    filled = grid.join(hourly, [*keys, "hr"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        *keys,
        # ntz: Arrow export must not carry a UTC offset the SQL oracle
        # side (naive timestamps) doesn't have — session tz is UTC.
        F.col("hr").cast("timestamp_ntz").alias("hr"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_micro", F.lit(0)).cast("long").alias("sum_value_micro"),
        F.last("sum_micro", ignorenulls=True).over(w).alias("locf_value_micro"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
    )

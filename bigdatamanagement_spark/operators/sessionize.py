"""Batch sessionization: gap-based session ids over an event stream.

The batch twin of ``streaming/windows.py``'s session windows (the
reference has neither, but its Bigtable/Redis packs are the time-series
idioms this generalizes — SURVEY §2.10). Classic two-window shape:

1. one shuffle keyed by the entity (``partitionBy(key) orderBy(ts)``),
2. ``lag`` to flag gap-exceeding boundaries,
3. running ``sum`` of boundary flags → per-entity session sequence.

Scale notes (100 TB): both windows share the single (key) partitioning —
Catalyst plans ONE Exchange and two Window ops over it. State is O(1)
per row (no arrays). Per-entity row counts bound the window sort; for
multi-year reprocessing, pre-partition the source by (key, month) and
sessionize per slice, stitching boundary sessions — the streaming
variant with watermarks (``session_window``) is the unbounded-time path.
Timestamps compare as integer microseconds (``unix_micros``) so session
arithmetic is exact and engine-portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """df + ``session_seq`` (1-based per key, ordered by ts): a new session
    starts when the gap since the previous event exceeds ``gap_seconds``."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(gap_seconds) * 1_000_000
    is_new = F.when(
        (micros - F.lag(micros).over(w)) > F.lit(gap_us), 1
    ).otherwise(0)
    # lag is NULL on the first row -> when() yields 0; running sum + 1
    # makes sessions 1-based.
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", (F.sum(is_new).over(run) + 1).cast("long"))


def session_bounds(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """One row per session: (key, session_seq, n_events, start/end micros,
    duration_us). Aggregates the sessionized rows — same single shuffle
    key, so no extra Exchange beyond the group-by."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_tiebreak)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(key_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(micros).alias("start_us"),
            F.max(micros).alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )

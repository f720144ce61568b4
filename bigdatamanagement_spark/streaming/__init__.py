"""Structured Streaming extension (SURVEY §2.10/§7 step 8): streaming
re-expressions of the batch time-series pack over the events table."""

from bigdatamanagement_spark.streaming.windows import (
    dedup_first_per_user_hour_stream,
    hourly_max_stream,
    run_to_memory,
    run_merge_materialized_view,
    run_to_parquet,
    session_window_stream,
    stream_static_enrich,
    stream_stream_interval_join,
    sliding_avg_stream,
    stream_events,
)

__all__ = [
    "stream_events",
    "hourly_max_stream",
    "sliding_avg_stream",
    "session_window_stream",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "dedup_first_per_user_hour_stream",
    "run_to_memory",
    "run_to_parquet",
    "run_merge_materialized_view",
]

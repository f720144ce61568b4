"""Bucketed tables: shuffle-free co-located joins (SURVEY §4's answer to
the reference's denormalization workaround, MongoDB.java:242-301).

``write_bucketed`` persists a table hash-bucketed by the join key; two
tables bucketed the same way join WITHOUT an Exchange on either side —
the repeated-join workload (orders⋈customer per query) pays the shuffle
once at write time instead of per query. At 100 TB this is the standing
layout for fact⋈dim joins too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """``path`` makes the table EXTERNAL at that location (used by the
    cross-session .bdm_cache stores, which re-register the same files
    in later sessions); default is a managed warehouse table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a SortMergeJoin with NO Exchange (verify via plans.plan_report:
    exchanges == 0)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)

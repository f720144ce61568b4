"""Sinks (S-09/S-10): bulk document/KV-style writes as atomic columnar
writes.

The reference's insertMany bulk loads (MongoDB.java:171-173, 228-231,
294-296) and HSET/ZADD loops (redis_client.py:93, 140), plus Redshift's
adaptive multi-row INSERT batching (AmazonRedshift.java:298-387), all
collapse to partitioned parquet/json writes: Spark sizes write tasks by
partition, so the reference's hand-tuned batch tiers are subsumed by
`spark.sql.files.maxRecordsPerFile` / partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_documents(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bulk document sink (insertMany analog). ``partition_by`` gives the
    layout used for partition pruning on read (the engine's substitute
    for row-key range scans, SURVEY §4)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_kv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """KV sink (HSET-mapping analog): one wide row per key as parquet."""
    df.write.mode(mode).parquet(path)


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)

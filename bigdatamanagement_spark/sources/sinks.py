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
    **options: str,
) -> None:
    """Bulk document sink (insertMany analog). ``partition_by`` gives the
    layout used for partition pruning on read (the engine's substitute
    for row-key range scans, SURVEY §4). ``fmt`` is any built-in source
    (parquet/orc/json/csv/text); extra ``options`` pass through to the
    writer (e.g. header=True for csv)."""
    writer = df.write.mode(mode).format(fmt)
    if options:
        writer = writer.options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_kv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """KV sink (HSET-mapping analog): one wide row per key as parquet."""
    df.write.mode(mode).parquet(path)


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_mb: float = 256,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
) -> int:
    """Write parquet with output files sized toward ``target_file_mb``.

    The 100 TB small-files guard: a pipeline stage that ends with many
    shuffle partitions writes one (often tiny) file per partition, and
    downstream scans then pay per-file open/footer/list costs. This sink
    estimates on-disk bytes from a bounded sample (in-memory row size
    scaled by a parquet compression factor), computes the file count, and
    coalesce()s to it — coalesce, not repartition, so sizing adds NO
    shuffle; it only merges existing partitions. Returns the file count.

    Estimation, not measurement, is deliberate: measuring would mean
    writing twice — but the estimate is a REAL parquet encode: the
    bounded sample is written to an in-memory parquet buffer (same
    columnar encoding + compression the full write will use), so
    bytes/row comes from the actual format instead of a guessed
    compression factor (the round-4 sys.getsizeof heuristic was off by
    whatever the string-repr-to-parquet ratio happened to be). Sample
    bias remains (dictionary pages work better at full scale — the
    estimate skews slightly large, i.e. toward more, smaller files);
    for exact sizing at scale use spark.sql.files.maxRecordsPerFile on
    top of this.
    """
    import io

    import pyarrow.parquet as papq

    tbl = df.limit(sample_rows).toArrow()
    if tbl.num_rows == 0:
        df.coalesce(1).write.mode(mode).parquet(path)
        return 1
    buf = io.BytesIO()
    papq.write_table(tbl, buf, compression="snappy")
    est_disk_per_row = buf.getbuffer().nbytes / tbl.num_rows
    total = df.count()
    n_files = max(1, int(total * est_disk_per_row / (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode(mode).parquet(path)
    return n_files


def adaptive_batch_size(n_rows: int) -> int:
    """The reference's adaptive multi-row INSERT tier table
    (AmazonRedshift.java:375-387 getMultiRowBatchSize) — behavior-matched:
    500 rows/statement below 1k rows, 1k to 10k, 2k to 50k, 5k above."""
    if n_rows > 50_000:
        return 5_000
    if n_rows > 10_000:
        return 2_000
    if n_rows > 1_000:
        return 1_000
    return 500


def write_jdbc_batched(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int | None = None,
    **options: str,
):
    """S-05 analog: JDBC bulk insert with the reference's adaptive
    multi-row batching (AmazonRedshift.java:298-387). Spark's JDBC sink
    already batches executeUpdate calls per `batchsize`; this wires the
    reference's row-count-adaptive tier into that option (a count() when
    the caller does not pin one) and returns the CONFIGURED writer so
    tests can assert the plumbing without a live database — call
    ``.save()`` on the result to execute. At scale each partition writes
    its own connection in parallel; batchsize bounds per-round-trip rows
    exactly like the reference's multi-row VALUES lists."""
    if batchsize is None:
        batchsize = adaptive_batch_size(df.count())
    return (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
    )

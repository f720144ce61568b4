"""Exact global ranking without a one-partition window.

``Window.orderBy(...)`` with no partitionBy funnels the entire input
through a single task — the canonical 100 TB anti-pattern. This module
computes exact 1-based global row numbers with the same two-phase shape
as Spark's ``zipWithIndex`` (and traindata.pack_sequences' prefix sum):

1. range-repartition by the order keys + sort within partitions, pin the
   partitioning with ``localCheckpoint`` (the count pass and the window
   pass must see identical partition boundaries);
2. per-partition row counts to the driver (one row per partition — KB at
   any scale) → exclusive prefix over partition ids, broadcast back;
3. within-partition ``row_number`` (parallel across partitions) + the
   partition's offset.

Ties are the caller's responsibility: include a unique tiebreak column in
``order_exprs`` or ranks are partition-placement-dependent.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def global_row_number(
    df: DataFrame, order_exprs: Sequence[Column], rank_col: str = "rank"
) -> tuple[DataFrame, int]:
    """(df + ``rank_col``, total_rows): exact global row_number in
    ``order_exprs`` order, distributed. Returns the total row count for
    free (the driver already saw the per-partition counts)."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(n_parts, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = staged.groupBy("_pid").count().collect()
    acc, offsets = 0, []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
    off = spark.createDataFrame(offsets, schema="_pid int, _poff bigint")
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    out = (
        staged.join(F.broadcast(off), "_pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_poff")).cast("long"))
        .drop("_pid", "_poff")
    )
    return out, acc


def quantile_bucket(rank_col: str, n_rows: int, k: int) -> Column:
    """Bucket 1..k from a 1-based global rank: 1 + floor((rank−1)·k / n).
    Differs from SQL NTILE only in which buckets absorb the remainder
    (NTILE front-loads; this formula back-loads) — chosen because it is
    one integer expression, identical in Spark and DuckDB. Pure integer
    DIV (not double division): (rank−1)·k loses exactness past ~2^53 as
    a double, and the DuckDB oracles use integer ``//``."""
    return F.expr(
        f"CAST(1 + (({rank_col} - 1) * {int(k)}) DIV {int(n_rows)} AS INT)"
    )


def global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_max",
    exclusive: bool = False,
) -> DataFrame:
    """Exact global running max of ``value_col`` in ``order_col`` order,
    distributed — same two-phase shape as global_row_number: range-
    repartition on the order key, per-partition maxima to the driver
    (one row per partition), exclusive prefix max broadcast back,
    within-partition running max + greatest() with the carry-in.
    A bare ``Window.orderBy`` computes this through ONE task.

    ``exclusive=True`` excludes the CURRENT row (frame end −1): the
    result is the max over strictly-earlier rows — NULL for the global
    first row — which is the prefix a dominance/skyline check needs."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    maxima = staged.groupBy("_pid").agg(F.max(value_col).alias("_pmax")).collect()
    carry, offsets = None, []
    for row in sorted(maxima, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], carry))
        # A partition whose value column is all NULL yields _pmax None;
        # max(carry, None) would raise, so skip None maxima (greatest()
        # below is itself NULL-skipping, matching SQL MAX semantics).
        if row["_pmax"] is not None:
            carry = row["_pmax"] if carry is None else max(carry, row["_pmax"])
    vtype = staged.schema[value_col].dataType.simpleString()
    off = spark.createDataFrame(offsets, schema=f"_pid int, _carry {vtype}")
    frame_end = -1 if exclusive else Window.currentRow
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    return (
        staged.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col, F.greatest(F.max(value_col).over(w), F.col("_carry"))
        )
        .drop("_pid", "_carry")
    )


def global_rank_and_running_sum(
    df: DataFrame,
    order_exprs: Sequence[Column],
    value_col: str,
    rank_col: str = "rank",
    sum_col: str = "running_sum",
) -> DataFrame:
    """Fused two-phase pass: exact global row_number AND inclusive
    running SUM of ``value_col`` in ``order_exprs`` order, from ONE
    range-repartition + ONE per-partition metadata collect (counts and
    sums in the same driver roundtrip). Use instead of chaining
    global_row_number -> global_running_sum, which stages and shuffles
    the data twice. Integral ``value_col`` required (exact BIGINT
    carry); include a unique tiebreak in ``order_exprs``."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(n_parts, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    meta = (
        staged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s"))
        .collect()
    )
    acc_n, acc_s, offsets = 0, 0, []
    for row in sorted(meta, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc_n, acc_s))
        acc_n += row["_n"]
        acc_s += row["_s"] or 0
    off = spark.createDataFrame(
        offsets, schema="_pid int, _noff bigint, _soff bigint"
    )
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        staged.join(F.broadcast(off), "_pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_noff")).cast("long"))
        .withColumn(
            sum_col, (F.sum(value_col).over(wsum) + F.col("_soff")).cast("long")
        )
        .drop("_pid", "_noff", "_soff")
    )


def global_running_sum(
    df: DataFrame,
    order_exprs: Sequence[Column],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Exact global running SUM of ``value_col`` in ``order_exprs``
    order, distributed — same two-phase shape as global_row_number:
    range-repartition + in-partition sort (pinned with localCheckpoint),
    per-partition sums to the driver (one row per partition), exclusive
    prefix-sum broadcast back, within-partition cumsum + carry-in.
    Requires an integral value column (the carry is exact BIGINT).
    Ties: include a unique tiebreak in ``order_exprs`` or the prefix is
    partition-placement-dependent."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(n_parts, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = staged.groupBy("_pid").agg(F.sum(value_col).alias("_psum")).collect()
    acc, offsets = 0, []
    for row in sorted(sums, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_psum"] or 0
    off = spark.createDataFrame(offsets, schema="_pid int, _poff bigint")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        staged.join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.sum(value_col).over(w) + F.col("_poff")).cast("long"))
        .drop("_pid", "_poff")
    )

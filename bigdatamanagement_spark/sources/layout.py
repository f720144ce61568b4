"""File-layout optimization for data skipping: Z-order (Morton curve)
clustered parquet writes.

The reference's Bigtable assignment makes layout an explicit design
problem — "avoid reading the entire table. Consider using
readRowRanges()" (``Assignment 4/.../Bigtable.java:178-180``) — solved
there with a (station, date, hour) row key, i.e. range pruning on ONE
composite dimension. Z-ordering is the multi-dimensional generalization:
interleaving the bits of several normalized keys makes every written
file narrow in EVERY dimension, so parquet min/max footer stats prune
scans for predicates on any subset of the clustered columns.

Scale notes (100 TB): the cluster key is a pure JVM expression (shifts,
masks, ORs — whole-stage codegen'd); the write is one
``repartitionByRange`` shuffle on the key (range-sampled, so files come
out balanced) plus an in-partition sort. Pruning then happens at three
levels for free: partition directories (if also ``partitionBy``-ed),
file footers, and row-group stats. Re-cluster periodically as data
drifts; bounds are caller-provided constants so the expression stays
deterministic and fold-able (no hidden two-pass min/max job — compute
bounds once per table, not per write).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _normalized(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map col into [0, 2^bits) as a long, clamping out-of-bounds values."""
    top = (1 << bits) - 1
    scaled = F.floor((col.cast("double") - F.lit(float(lo)))
                     / F.lit(float(hi) - float(lo)) * F.lit(top))
    return F.greatest(F.least(scaled, F.lit(top)), F.lit(0)).cast("long")


def zorder_key(cols: Sequence[tuple[Column, float, float]], bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` bits of each (col, lo, hi):
    bit i of column j lands at position i*d + j. d*bits must be ≤ 63."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed long")
    normed = [_normalized(c, lo, hi, bits) for c, lo, hi in cols]
    terms = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * d + j)
        for j, x in enumerate(normed)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zorder_key")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[Column, float, float]],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write df as ``n_files`` parquet files clustered on the Z-curve of
    ``cols``: range-partition by the Morton key (balanced files), sort
    within each partition (tight row-group stats), drop the key."""
    key = zorder_key(cols, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning — the engine analog of the
    Bigtable row-key PREFIX (station in the (station, date, hour) key):
    a predicate on a partition column prunes whole directories at
    PLANNING time (`PartitionFilters` in the scan, zero I/O for pruned
    values), one level above the footer/row-group stats Z-ordering
    serves.

    At 100 TB: partition by low-cardinality, always-filtered columns
    (date, tenant, event_type); never by high-cardinality keys (one
    directory per value — the small-files failure mode). Combine with
    zorder_write for the within-partition dimensions."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)

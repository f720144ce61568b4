"""Skew-handling utilities for hot-key aggregations and joins.

AQE's skew-join splitting handles most cases at runtime (enabled in
session.py); these helpers cover the two patterns AQE does not:
- ``salted_agg``: two-phase aggregation for hot GROUP BY keys — partial
  aggregate on (key, salt), then final aggregate on key. Turns one
  shuffle with a hot partition into two balanced shuffles. Only
  decomposable aggregates (sum/count/min/max) qualify.
- ``salted_broadcast_left``: replicate-and-salt pattern for joining a
  skewed fact against a dim too large to broadcast whole: the dim is
  exploded ``salt_buckets``-fold so each salted fact key finds its match.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic salt from a stable hash of the whole row's partition
    position — uses spark_partition_id + monotonically_increasing_id so
    repeated runs distribute identically within a partitioning."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % buckets).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name -> (partial_expr,
    final_expr_over_partial). Example::

        salted_agg(ev, ["event_type"],
                   {"total": (F.sum("value"), F.sum(F.col("total"))),
                    "n":     (F.count("*"),   F.sum(F.col("n")))})
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Join a skew-keyed fact to a dim by salting the fact and exploding
    the dim ``buckets``-fold, so no single (key) shuffle partition holds
    a hot key's full row set."""
    salted_fact = with_salt(fact, buckets)
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_fact.join(exploded_dim, [key, "__salt"]).drop("__salt")

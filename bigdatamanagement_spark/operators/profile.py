"""Column-profiling operator — the data-quality audit step a pipeline
runs before trusting a new table or corpus drop: per-column null counts,
distinct cardinality, and value range, in ONE pass over the data.

The reference has no profiling surface (its loaders trust the input
after per-field coercion, e.g. ``Assignment 7/MongoDB.java:150-157``);
this generalizes that load-time validation into a queryable operator.

Plan shape: a single wide aggregate computes every per-column statistic
in one scan, then a ``stack`` unpivots the 1-row result into one row per
column — the unpivot runs on ONE row, so its cost is nil. Exact distinct
counts use Spark's Expand-based multi-distinct rewrite (one shuffle of
the expanded stream); at 100 TB switch ``exact_distinct=False`` for
HLL++ ``approx_count_distinct`` (mergeable sketch, single ordinary
shuffle, ~2% default error) — the structure of the plan is otherwise
identical.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    min/max are computed in the column's native type and cast to string
    AFTER aggregation (so numeric columns order numerically, not
    lexically). NULL-only columns profile to NULL min/max.
    """
    cols = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__{c}_nulls"),
            distinct.alias(f"__{c}_distinct"),
            F.min(F.col(c)).cast("string").alias(f"__{c}_min"),
            F.max(F.col(c)).cast("string").alias(f"__{c}_max"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', `__{c}_nulls`, `__{c}_distinct`, `__{c}_min`, `__{c}_max`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")

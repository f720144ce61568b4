"""Document nesting: parent rows with an array-of-struct child column.

Re-expresses the reference's client-side denormalization that builds the
``custorders`` MongoDB collection (MongoDB.java:242-301: HashMap group of
orders by O_CUSTKEY, then per-customer array attach) as one distributed
plan: ``groupBy(child_key).agg(collect_list(struct(...)))`` + left join.

Scale notes: the child table shuffles ONCE on the join key (the same
shuffle a hash join would need); collect_list is a hash aggregation with
no sort. Parents with no children get an empty array (coalesce), which
preserves the parent count — the reference's $unwind-based consumers drop
those rows, so ``unnest`` offers both modes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def nest(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    as_col: str = "children",
) -> DataFrame:
    """Return ``parent`` with an ``as_col`` array<struct> column of its
    matching ``child`` rows. Empty array (never NULL) for childless parents.
    """
    child_cols = [c for c in child.columns]
    grouped = child.groupBy(F.col(child_key).alias("__nest_key")).agg(
        F.collect_list(F.struct(*child_cols)).alias(as_col)
    )
    joined = parent.join(
        grouped, parent[parent_key] == grouped["__nest_key"], "left"
    ).drop("__nest_key")
    return joined.withColumn(
        as_col, F.coalesce(F.col(as_col), F.array().cast(joined.schema[as_col].dataType))
    )


def unnest(df: DataFrame, array_col: str, keep_empty: bool = False) -> DataFrame:
    """$unwind analog (MongoDB.java:360,405,443,480): one row per array
    element. ``keep_empty=False`` matches Mongo's default $unwind (drops
    rows whose array is empty/NULL — the inner-join semantics trap in
    SURVEY §5.3); ``keep_empty=True`` uses explode_outer.
    """
    exploder = F.explode_outer if keep_empty else F.explode
    other = [c for c in df.columns if c != array_col]
    return df.select(*other, exploder(F.col(array_col)).alias(array_col))

"""Mutation operators over immutable snapshots: MERGE-style upsert and
SCD2 (slowly-changing-dimension) history.

The reference's only mutation is a SQL DELETE re-run before its queries
(``Assignment 3/.../SQLonRDS.java:229-236`` — S-08, implemented as
delete-as-filter in the stock pack). This module completes the
mutation lifecycle the way a columnar lake does it: produce a NEW
snapshot from (base, changes) instead of updating in place.

Scale notes (100 TB): ``merge_upsert`` is one left-anti join keyed by the
merge key — broadcast when the change set is small (the common case:
daily increment vs full history), shuffle-hash otherwise; writing the
result partitioned by the same key family makes the next merge's join
co-located. ``scd2_from_events`` is one window over the entity key —
the same single-Exchange shape as sessionization. Neither op rewrites
rows it doesn't touch logically; pair with partition-overwrite writes so
untouched partitions are not rewritten physically either.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def merge_upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """New snapshot where update rows replace base rows with the same key
    and new keys are inserted (MERGE WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT, with whole-row update semantics)."""
    keys = list(keys)
    kept = base.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates.select(*base.columns))


def apply_deletes(base: DataFrame, deletes: DataFrame, keys: Sequence[str]) -> DataFrame:
    """New snapshot with keyed rows removed (MERGE WHEN MATCHED DELETE)."""
    return base.join(deletes.select(*list(keys)), list(keys), "left_anti")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Dataset-version diff: classify every key across two snapshots as
    ``added`` / ``removed`` / ``modified`` / ``unchanged`` by comparing an
    md5 content hash of ``compare_cols`` over a keyed full outer join —
    the audit step between two corpus releases (what changed since v1?).

    Returns one row per key: ``(*keys, change_type)``. Content equality
    is hash-based so wide payloads compare as one string column; NULLs
    hash via a reserved sentinel so NULL != '' and NULL == NULL.

    Scale notes (100 TB): one shuffle per side on the key — with both
    snapshot generations written bucketed by the key family the join is
    co-located and the diff is a zipper scan; the hash collapses the
    payload to 32 bytes BEFORE the exchange, so the shuffle moves keys +
    digests, not document bodies.
    """
    keys = list(keys)

    def hashed(df: DataFrame, name: str) -> DataFrame:
        digest = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )
        return df.select(*keys, digest.alias(name))

    o = hashed(old, "_old_h")
    n = hashed(new, "_new_h")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*keys, change.alias("change_type"))


def scd2_from_events(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: Sequence[str],
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 history from a change stream: one validity interval per
    change, ``valid_from`` = change ts, ``valid_to`` = next change ts for
    the key (NULL = current), ``is_current`` flag. Point-in-time lookup
    is then ``valid_from <= T AND (valid_to > T OR valid_to IS NULL)`` —
    the as-of join in ``operators/asof.py`` serves the bulk variant."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return df.select(
        F.col(key_col),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), True).otherwise(False).alias("is_current"),
        *[F.col(c) for c in value_cols],
    )

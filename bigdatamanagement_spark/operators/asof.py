"""As-of (backward) join — the time-series operator Spark's DataFrame
API lacks natively (pandas has merge_asof; DuckDB has ASOF JOIN, which
is the test oracle).

For every left row, attach the single right row with the same key and
the greatest right timestamp ≤ the left timestamp.

Scalable construction (no per-key loops, no UDF, no range self-join):
tag and UNION both sides, then one window pass per key ordered by
(timestamp, side) carrying the right-hand payload forward with
``last(..., ignorenulls=True)``. Right rows sort BEFORE left rows at
equal timestamps, so "at or before" includes exact matches. Cost: one
shuffle of left+right keyed by the join key — the same lower bound a
sort-merge join would pay — and the window is a single forward sweep,
which Spark executes as sort + running carry within each partition.

At 100 TB: the shuffle is keyed by the join key alone, so skewed keys
behave like any skewed aggregation (salt or let AQE split); the state
carried per key is one row of right-payload, not a buffered range.

A time-bounded variant (tolerance) filters the carried timestamp
afterwards — the carry is already there, so it costs one comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows keep all columns; right columns
    (except the key) are attached from the latest right row with
    right_ts ≤ left_ts for the same ``on`` key, else NULL (left join
    semantics). ``tolerance`` (an INTERVAL literal, e.g. ``'30 days'``)
    additionally requires left_ts - right_ts ≤ tolerance.

    Right (on, right_ts) pairs should be unique — pre-aggregate
    otherwise; with duplicates the carried row is the last in the
    union's sort, which is not a semantic promise.

    Constraint (same as the forward form): ``right_ts`` must differ
    from ``on`` — the tolerance branch reads the carried timestamp out
    of the payload struct, which excludes the join key.
    """
    if right_ts == on:
        raise ValueError(
            "asof_join: right_ts must differ from the join key 'on' "
            f"({on!r}) — the key is excluded from the carried payload, "
            "so a tolerance check could not read it"
        )
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in rcols]).alias("__r")
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            right.select(payload).schema["__r"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("__l"))
            .schema["__l"]
            .dataType.simpleString()
        ).alias("__l"),
        payload,
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__carry", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__carry",
            F.when(
                F.col("__carry").isNotNull()
                & (
                    F.col("__ts")
                    <= F.col("__carry").getField(right_ts)
                    + F.expr(f"INTERVAL {tolerance}")
                ),
                F.col("__carry"),
            ),
        )
    return out.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__carry").getField(c).alias(c) for c in rcols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row with
    right_ts ≥ left_ts for the same key (else NULL) — the mirror of
    ``asof_join`` (pandas merge_asof direction='forward'); same
    union + single-window construction, with the carry running
    backward (``first(..., ignorenulls=True)`` over the following
    frame). Left rows sort BEFORE right rows at equal timestamps, so
    "at or after" includes exact matches. Same scale properties as the
    backward form: one key-only shuffle, O(1) carried state.

    Right (on, right_ts) pairs should be unique — pre-aggregate
    otherwise (with duplicates the carried payload pick among
    equal-timestamp rights is not a semantic promise).

    Constraint: ``right_ts`` must not equal ``on`` — the join key is
    excluded from the carried payload struct, so the tolerance branch
    (which reads the carried right timestamp via getField(right_ts))
    would have nothing to read. Asserted below rather than left as an
    unstated precondition."""
    if right_ts == on:
        raise ValueError(
            "asof_join_forward: right_ts must differ from the join key "
            f"'on' ({on!r}) — the key is excluded from the carried "
            "payload, so a tolerance check could not read it"
        )
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in rcols]).alias("__r")
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            right.select(payload).schema["__r"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("__l"))
            .schema["__l"]
            .dataType.simpleString()
        ).alias("__l"),
        payload,
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.withColumn("__carry", F.first("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 0)
    if tolerance is not None:
        out = out.withColumn(
            "__carry",
            F.when(
                F.col("__carry").isNotNull()
                & (
                    F.col("__carry").getField(right_ts)
                    <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
                ),
                F.col("__carry"),
            ),
        )
    return out.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__carry").getField(c).alias(c) for c in rcols],
    )

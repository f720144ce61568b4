"""Range (interval) join — pairs a left row with every right row whose
timestamp falls in a window around the left timestamp. Spark's planner
turns a raw inequality join into BroadcastNestedLoopJoin (O(|L|·|R|));
this operator restores an equi-join shape via time bucketization.

Construction: choose bucket width = window span (upper - lower). A left
row's window then overlaps at most TWO buckets, so the left side
explodes ≤2x while the right side maps each row to exactly one bucket.
The bucket equi-join prunes the pair space to adjacent-in-time rows, and
the exact window predicate filters the survivors. No pair can match
through two different buckets (the exploded bucket ids are distinct and
a right row has one bucket), so no dedup pass is needed.

At 100 TB this is a plain shuffle join keyed by (bucket [, extra key]):
linear in data volume + true match count, AQE-skew-splittable, and the
bucket key composes with an equality key (e.g. user_id) by just joining
on both.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    extra_key: str | None = None,
) -> DataFrame:
    """Inner-join pairs where
    ``left.left_ts + lower_s <= right.right_ts <= left.left_ts + upper_s``
    (bounds in seconds, inclusive). Columns: all left columns + all right
    columns (caller disambiguates names). ``extra_key`` adds an equality
    condition (and rides the shuffle key)."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must be > lower_s")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    # unix_micros: exact integer microseconds — a double epoch would round
    # at window boundaries and disagree with the oracle's INTERVAL math.
    lower_us, upper_us = lower_s * 1_000_000, upper_s * 1_000_000
    width = upper_us - lower_us
    # cast: no-op for TIMESTAMP; maps TIMESTAMP_NTZ via the session zone —
    # applied identically to both sides, so window math is unaffected.
    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(right_ts).cast("timestamp"))
    # exact floor-division on longs (a plain `/` is double division and
    # can mis-bucket at exact boundaries): a - pmod(a,w) is a multiple of
    # w, so the quotient is integral and double-exact.
    def idiv(a, w):
        return ((a - F.pmod(a, F.lit(w))) / F.lit(w)).cast("long")

    l_exp = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(F.array(idiv(lus + lower_us, width), idiv(lus + upper_us, width)))
        ),
    )
    r_keyed = right.withColumn("__bucket", idiv(rus, width))
    join_keys = ["__bucket"] + ([extra_key] if extra_key else [])
    pairs = l_exp.join(r_keyed, join_keys)
    in_window = (rus >= lus + lower_us) & (rus <= lus + upper_us)
    return pairs.filter(in_window).drop("__bucket")

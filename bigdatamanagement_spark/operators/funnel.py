"""Behavioral-analytics operators over event streams: ordered funnel
analysis and cohort retention.

These extend the events pack (queries/events.py) past the reference's
single-table time-series idioms (`Assignment 4/.../Bigtable.java:124-184`
range scans + client aggregation) into the multi-step sequence analyses
a production events store answers engine-side.

Design for 100 TB:
- ``funnel_counts`` is ONE user-keyed shuffle: per-user events are
  gathered into a sorted (ts, type) array and a single ``aggregate``
  fold walks it in time order carrying the per-step first-reach
  timestamps — no per-step join cascade (k steps would otherwise cost k
  user-keyed shuffles), no Python UDF, and the final step-count
  unpivot is a 1-row aggregate. Per-user event counts are bounded (a
  user's history fits an array); for pathological users, pre-filter to
  the funnel's event types first — done here, which also shrinks the
  shuffle to exactly the funnel-relevant rows.
- ``cohort_retention`` is two aggregates sharing the user key: first
  activity date per user (cohort assignment), then distinct
  (user, active-day) pairs joined back and counted per (cohort, day
  offset). The join broadcasts the per-user cohort map when small; at
  scale both sides are user-keyed so AQE plans a co-partitioned join.

Cross-engine determinism: step reach is defined on strict timestamp
order (each step's event must be strictly later than the previous
step's reach time); counts and basis-point conversions are exact
integer math.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def funnel_reach(df: DataFrame, steps: list[str], user_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Per-user funnel reach times: (user_id, t1..tk) where t_i is the
    FIRST time the user completed step i strictly after t_{i-1} (the
    classic ordered-funnel semantics), NULL if never reached."""
    k = len(steps)
    relevant = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    per_user = relevant.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "etype"))).alias("evs")
    )
    # One fold in time order. State: array of k reach timestamps (NULL =
    # unreached). An event advances the first unreached step whose
    # predecessor is reached and strictly earlier.
    init = F.array_repeat(F.lit(None).cast("timestamp"), k)

    def step_fold(acc, ev):
        out = acc
        for i, name in enumerate(steps):
            prev_ok = (
                F.lit(True) if i == 0
                else (F.element_at(acc, i).isNotNull() & (ev["ts"] > F.element_at(acc, i)))
            )
            hit = (
                (ev["etype"] == F.lit(name))
                & F.element_at(acc, i + 1).isNull()
                & prev_ok
            )
            out = F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, i),
                    F.array(ev["ts"]),
                    F.slice(acc, i + 2, k - i - 1),
                ),
            ).otherwise(out)
        return out

    reached = per_user.select(
        "user_id", F.aggregate(F.col("evs"), init, step_fold).alias("reach")
    )
    cols = [F.element_at(F.col("reach"), i + 1).alias(f"t{i + 1}") for i in range(k)]
    return reached.select("user_id", *cols)


def funnel_counts(df: DataFrame, steps: list[str], **kw) -> DataFrame:
    """Funnel summary: (step_no, event_type, n_users, conv_bp) — users
    reaching each ordered step and the basis-point conversion vs step 1
    (exact integer math; conv_bp of step 1 is 10000 by construction)."""
    reach = funnel_reach(df, steps, **kw)
    k = len(steps)
    totals = reach.agg(
        *[
            F.sum(F.col(f"t{i + 1}").isNotNull().cast("long")).alias(f"n{i + 1}")
            for i in range(k)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_no"),
                F.lit(steps[i]).alias("event_type"),
                F.col(f"n{i + 1}").alias("n_users"),
                F.floor(F.lit(10000) * F.col(f"n{i + 1}") / F.col("n1"))
                .cast("long")
                .alias("conv_bp"),
            )
            for i in range(k)
        ]
    )
    return (
        totals.select(F.explode(rows).alias("r"))
        .select("r.step_no", "r.event_type", "r.n_users", "r.conv_bp")
        .orderBy("step_no")
    )


def cohort_retention(
    df: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: (cohort_day, day_offset, n_active,
    cohort_size, retention_bp) for offsets 0..max_offset_days.

    Cohort = the user's first-ever activity date; a user is retained at
    offset k if active on cohort_day + k. retention_bp is exact integer
    basis points; offset 0 is 10000 by definition (its own activity).
    """
    acts = df.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("day")
    ).distinct()
    cohorts = acts.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    return (
        acts.join(cohorts, "user_id")
        .select(
            "cohort_day", F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset")
        )
        .filter(F.col("day_offset").between(0, max_offset_days))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.floor(F.lit(10000) * F.col("n_active") / F.col("cohort_size"))
            .cast("long")
            .alias("retention_bp"),
        )
        .orderBy("cohort_day", "day_offset")
    )
